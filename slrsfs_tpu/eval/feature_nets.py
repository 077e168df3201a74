"""Feature networks for perceptual metrics (VGG16 / AlexNet slices).

JAX ports of the torchvision-backed extractors used by the reference's
evaluation (``models/networks/pretrained_networks.py``): VGG16 sliced at
relu{1_2, 2_2, 3_3, 4_3, 5_3} (PNet 'vgg') and AlexNet's 5 conv-relu stages
(LPIPS 'alex'). Weights import from torchvision-format state_dicts; this
environment has no egress, so pretrained weights must be supplied as files —
the metrics module gates on their presence.
"""

from __future__ import annotations

from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

# (torchvision features index, out_channels); slices end AFTER the relu of
# the listed final conv per slice.
_VGG16_CONVS = [
    (0, 64), (2, 64),
    (5, 128), (7, 128),
    (10, 256), (12, 256), (14, 256),
    (17, 512), (19, 512), (21, 512),
    (24, 512), (26, 512), (28, 512),
]
_VGG16_POOL_BEFORE = {5, 10, 17, 24}
_VGG16_TAPS = {3: 0, 8: 1, 15: 2, 22: 3, 29: 4}  # relu layer index -> slice


class VGG16Features(nn.Module):
    @nn.compact
    def __call__(self, x: jax.Array) -> List[jax.Array]:
        outs: List[jax.Array] = []
        for li, ch in _VGG16_CONVS:
            if li in _VGG16_POOL_BEFORE:
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
            x = nn.Conv(ch, (3, 3), padding=1, name=f"conv_{li}")(x)
            x = jax.nn.relu(x)
            if (li + 1) in _VGG16_TAPS:
                outs.append(x)
        return outs


# AlexNet features: (index, out_ch, kernel, stride, padding)
_ALEX_CONVS = [
    (0, 64, 11, 4, 2),
    (3, 192, 5, 1, 2),
    (6, 384, 3, 1, 1),
    (8, 256, 3, 1, 1),
    (10, 256, 3, 1, 1),
]
_ALEX_POOL_BEFORE = {3, 6}


class AlexNetFeatures(nn.Module):
    @nn.compact
    def __call__(self, x: jax.Array) -> List[jax.Array]:
        outs = []
        for li, ch, k, s, p in _ALEX_CONVS:
            if li in _ALEX_POOL_BEFORE:
                x = nn.max_pool(x, (3, 3), strides=(2, 2))
            x = jax.lax.conv_general_dilated(
                x,
                self.param(f"conv_{li}_kernel", nn.initializers.lecun_normal(),
                           (k, k, x.shape[-1], ch)),
                (s, s), [(p, p), (p, p)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ) + self.param(f"conv_{li}_bias", nn.initializers.zeros, (ch,))
            x = jax.nn.relu(x)
            outs.append(x)
        return outs


def _np(t):
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.array(t, np.float32)


def import_vgg16(sd) -> Dict:
    params = {}
    for li, _ch in _VGG16_CONVS:
        params[f"conv_{li}"] = {
            "kernel": _np(sd[f"features.{li}.weight"]).transpose(2, 3, 1, 0),
            "bias": _np(sd[f"features.{li}.bias"]),
        }
    return {"params": params}


def import_alexnet(sd) -> Dict:
    params = {}
    for li, _c, _k, _s, _p in _ALEX_CONVS:
        params[f"conv_{li}_kernel"] = _np(sd[f"features.{li}.weight"]).transpose(2, 3, 1, 0)
        params[f"conv_{li}_bias"] = _np(sd[f"features.{li}.bias"])
    return {"params": params}


def import_lpips_alex(sd) -> List[np.ndarray]:
    """LPIPS v0.1 'alex' linear layer weights (lins.{i}.model.1.weight,
    (1, C, 1, 1)) → list of (C,) arrays."""
    out = []
    for i in range(5):
        for key in (f"lins.{i}.model.1.weight", f"lin{i}.model.1.weight"):
            if key in sd:
                out.append(_np(sd[key]).reshape(-1))
                break
        else:
            raise KeyError(f"LPIPS linear weight {i} not found")
    return out
