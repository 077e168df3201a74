"""I3D feature extractor + Fréchet Video Distance (FVD).

FVD is half of the BASELINE.json north-star quality metric ("LPIPS/FVD
parity on CLAW test set"). The reference repo does not ship an FVD harness,
so this follows the standard protocol (Unterthiner et al., "Towards Accurate
Generative Models of Video", 2018): features are the 400-d logits of an
Inflated-3D-Inception (I3D) network pretrained on Kinetics-400, videos
resized to 224x224 and scaled to [-1, 1], and the score is the Fréchet
distance between Gaussian fits of the real and generated feature clouds.

The architecture matches the community PyTorch port of DeepMind's I3D
(piergiaj/pytorch-i3d ``InceptionI3d``) so its released
``rgb_imagenet.pt``/``rgb_charades.pt`` state_dicts import directly via
:func:`import_i3d`. Like the LPIPS/PNet metrics (eval/feature_nets.py) the
execution path is weight-gated — this environment has no egress, so
pretrained weights must be supplied as a .pt file; the architecture +
importer are proven by random-weight parity tests
(tests/test_fvd.py) without them.

Layout is NDTHWC (videos as (B, T, H, W, 3)); convs are 3-D
``flax.linen.Conv`` with TF-style SAME padding, which is exactly the manual
same-padding the PyTorch port reimplements.
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

Array = jax.Array


class Unit3D(nn.Module):
    """Conv3D (no bias) + BatchNorm(eps=1e-3, frozen stats) + ReLU."""

    features: int
    kernel: Tuple[int, int, int] = (1, 1, 1)
    stride: Tuple[int, int, int] = (1, 1, 1)
    use_bn: bool = True
    relu: bool = True
    use_bias: bool = False

    @nn.compact
    def __call__(self, x: Array) -> Array:
        x = nn.Conv(self.features, self.kernel, strides=self.stride,
                    padding="SAME", use_bias=self.use_bias,
                    name="conv3d")(x)
        if self.use_bn:
            x = nn.BatchNorm(use_running_average=True, epsilon=1e-3,
                             name="bn")(x)
        if self.relu:
            x = jax.nn.relu(x)
        return x


def _max_pool_same(x: Array, kernel: Sequence[int],
                   stride: Sequence[int]) -> Array:
    return nn.max_pool(x, tuple(kernel), strides=tuple(stride),
                       padding="SAME")


class InceptionModule(nn.Module):
    """Four-branch Inception block; ``out`` = the 6 branch widths."""

    out: Tuple[int, int, int, int, int, int]

    @nn.compact
    def __call__(self, x: Array) -> Array:
        o = self.out
        b0 = Unit3D(o[0], name="b0")(x)
        b1 = Unit3D(o[2], (3, 3, 3), name="b1b")(Unit3D(o[1], name="b1a")(x))
        b2 = Unit3D(o[4], (3, 3, 3), name="b2b")(Unit3D(o[3], name="b2a")(x))
        b3 = Unit3D(o[5], name="b3b")(
            _max_pool_same(x, (3, 3, 3), (1, 1, 1)))
        return jnp.concatenate([b0, b1, b2, b3], axis=-1)


_MIXED = {
    "Mixed_3b": (64, 96, 128, 16, 32, 32),
    "Mixed_3c": (128, 128, 192, 32, 96, 64),
    "Mixed_4b": (192, 96, 208, 16, 48, 64),
    "Mixed_4c": (160, 112, 224, 24, 64, 64),
    "Mixed_4d": (128, 128, 256, 24, 64, 64),
    "Mixed_4e": (112, 144, 288, 32, 64, 64),
    "Mixed_4f": (256, 160, 320, 32, 128, 128),
    "Mixed_5b": (256, 160, 320, 32, 128, 128),
    "Mixed_5c": (384, 192, 384, 48, 128, 128),
}


class InceptionI3D(nn.Module):
    """I3D backbone -> per-video 400-d logits features.

    Input: (B, T, H, W, 3) videos in [-1, 1], T >= 9, H = W = 224 for the
    standard protocol. Output: (B, num_classes) — the logits averaged over
    the temporal axis (the standard FVD feature)."""

    num_classes: int = 400

    @nn.compact
    def __call__(self, x: Array) -> Array:
        x = Unit3D(64, (7, 7, 7), (2, 2, 2), name="Conv3d_1a_7x7")(x)
        x = _max_pool_same(x, (1, 3, 3), (1, 2, 2))
        x = Unit3D(64, name="Conv3d_2b_1x1")(x)
        x = Unit3D(192, (3, 3, 3), name="Conv3d_2c_3x3")(x)
        x = _max_pool_same(x, (1, 3, 3), (1, 2, 2))
        x = InceptionModule(_MIXED["Mixed_3b"], name="Mixed_3b")(x)
        x = InceptionModule(_MIXED["Mixed_3c"], name="Mixed_3c")(x)
        x = _max_pool_same(x, (3, 3, 3), (2, 2, 2))
        for k in ("Mixed_4b", "Mixed_4c", "Mixed_4d", "Mixed_4e", "Mixed_4f"):
            x = InceptionModule(_MIXED[k], name=k)(x)
        x = _max_pool_same(x, (2, 2, 2), (2, 2, 2))
        x = InceptionModule(_MIXED["Mixed_5b"], name="Mixed_5b")(x)
        x = InceptionModule(_MIXED["Mixed_5c"], name="Mixed_5c")(x)
        # Logits head: VALID (2,7,7) average pool, 1x1x1 conv with bias and
        # neither BN nor ReLU, then temporal+spatial mean -> (B, classes).
        x = nn.avg_pool(x, (2, 7, 7), strides=(1, 1, 1), padding="VALID")
        x = Unit3D(self.num_classes, use_bn=False, relu=False, use_bias=True,
                   name="logits")(x)
        return jnp.mean(x, axis=(1, 2, 3))


# ---------------------------------------------------------------------------
# PyTorch state_dict importer
# ---------------------------------------------------------------------------

def _np(t):
    return np.asarray(t.detach().cpu().numpy() if hasattr(t, "detach") else t)


def _conv_w(t) -> np.ndarray:
    # torch (out, in, kT, kH, kW) -> flax (kT, kH, kW, in, out)
    return _np(t).transpose(2, 3, 4, 1, 0)


def import_i3d(sd: Dict) -> Dict:
    """pytorch-i3d ``InceptionI3d`` state_dict -> flax variables
    {'params', 'batch_stats'} for :class:`InceptionI3D`."""
    params: Dict = {}
    stats: Dict = {}

    def unit(dst_params: Dict, dst_stats: Dict, prefix: str,
             bn: bool = True, bias: bool = False):
        conv = {"kernel": _conv_w(sd[prefix + ".conv3d.weight"])}
        if bias:
            conv["bias"] = _np(sd[prefix + ".conv3d.bias"])
        dst_params["conv3d"] = conv
        if bn:
            dst_params["bn"] = {
                "scale": _np(sd[prefix + ".bn.weight"]),
                "bias": _np(sd[prefix + ".bn.bias"]),
            }
            dst_stats["bn"] = {
                "mean": _np(sd[prefix + ".bn.running_mean"]),
                "var": _np(sd[prefix + ".bn.running_var"]),
            }

    for name in ("Conv3d_1a_7x7", "Conv3d_2b_1x1", "Conv3d_2c_3x3"):
        params[name], stats[name] = {}, {}
        unit(params[name], stats[name], name)
    for name in _MIXED:
        params[name], stats[name] = {}, {}
        for b in ("b0", "b1a", "b1b", "b2a", "b2b", "b3b"):
            params[name][b], stats[name][b] = {}, {}
            unit(params[name][b], stats[name][b], f"{name}.{b}")
    params["logits"] = {}
    unit(params["logits"], {}, "logits", bn=False, bias=True)
    return {"params": params, "batch_stats": stats}


# ---------------------------------------------------------------------------
# FVD statistic
# ---------------------------------------------------------------------------

def frechet_distance(feats_a: np.ndarray, feats_b: np.ndarray) -> float:
    """Fréchet distance between Gaussian fits of two feature sets (N, D).

    ``tr sqrt(S_a S_b)`` via scipy sqrtm with an eigenvalue fallback (the
    product of two PSD matrices has real nonnegative spectrum)."""
    feats_a = np.asarray(feats_a, np.float64)
    feats_b = np.asarray(feats_b, np.float64)
    mu_a, mu_b = feats_a.mean(0), feats_b.mean(0)
    s_a = np.cov(feats_a, rowvar=False)
    s_b = np.cov(feats_b, rowvar=False)
    diff = mu_a - mu_b

    def _tr_sqrt(sa, sb):
        prod = sa @ sb
        try:
            from scipy import linalg

            covmean = linalg.sqrtm(prod)
            if not np.isfinite(covmean).all():
                return float("nan")  # caller retries regularized
            if np.iscomplexobj(covmean):
                # a singular product yields complex noise without raising;
                # anything beyond float error means sqrtm silently failed
                if np.abs(covmean.imag).max() > 1e-3:
                    return float("nan")
                covmean = covmean.real
            return float(np.trace(covmean))
        except Exception:
            eig = np.linalg.eigvals(prod)
            return float(np.sqrt(np.clip(eig.real, 0.0, None)).sum())

    tr = _tr_sqrt(s_a, s_b)
    if not np.isfinite(tr):
        # rank-deficient covariances (N scenes << 400 feature dims is the
        # typical CLAW set): sqrtm of the singular product can return
        # NaN/complex noise WITHOUT raising. Standard FID recipe: retry
        # with eps*I added to both covariances.
        eps = 1e-6
        eye = np.eye(s_a.shape[0])
        tr = _tr_sqrt(s_a + eps * eye, s_b + eps * eye)
        if not np.isfinite(tr):  # last resort: clipped eigenvalue path
            eig = np.linalg.eigvals((s_a + eps * eye) @ (s_b + eps * eye))
            tr = float(np.sqrt(np.clip(eig.real, 0.0, None)).sum())
    return float(diff @ diff + np.trace(s_a) + np.trace(s_b) - 2.0 * tr)


def preprocess_video(frames01: np.ndarray, size: int = 224) -> np.ndarray:
    """(T, H, W, 3) float in [0, 1] -> (T, size, size, 3) in [-1, 1]
    (PIL bilinear resize, matching the eval harness's host-side resizes)."""
    from PIL import Image

    out = np.empty((frames01.shape[0], size, size, 3), np.float32)
    for t, f in enumerate(frames01):
        img = Image.fromarray((np.clip(f, 0, 1) * 255).astype(np.uint8))
        out[t] = np.asarray(img.resize((size, size), Image.BILINEAR),
                            np.float32) / 255.0
    return out * 2.0 - 1.0


class FVD:
    """Weight-gated FVD scorer.

    ``i3d_pth``: path to a pytorch-i3d state_dict (.pt). Without it,
    :meth:`available` is False and callers should skip the metric (same
    convention as eval/metrics.py for LPIPS)."""

    def __init__(self, i3d_pth: str = None):
        self.vars = None
        self.model = InceptionI3D()
        if i3d_pth:
            import torch

            sd = torch.load(i3d_pth, map_location="cpu")
            if hasattr(sd, "state_dict"):
                sd = sd.state_dict()
            self.vars = import_i3d(sd)
            self._apply = jax.jit(self.model.apply)

    def available(self) -> bool:
        return self.vars is not None

    def features(self, videos: List[np.ndarray]) -> np.ndarray:
        """videos: list of (T, H, W, 3) float arrays in [0, 1] -> (N, 400)."""
        feats = []
        for v in videos:
            x = jnp.asarray(preprocess_video(v))[None]
            feats.append(np.asarray(self._apply(self.vars, x))[0])
        return np.stack(feats)

    def score(self, real: List[np.ndarray], gen: List[np.ndarray]) -> float:
        return frechet_distance(self.features(real), self.features(gen))
