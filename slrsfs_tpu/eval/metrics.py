"""Evaluation metrics matching the reference protocol.

Reference definitions (``evaluation/animation/metrics.py`` and
``models/networks/pretrained_networks.py:34-95``):

* PSNR      — images in [0, 1], MSE over all pixels+channels, 10·log10(1/mse)
* SSIM      — gaussian-window SSIM (losses/ssim.py)
* Perceptual — PNet: sum over VGG16 slices of (1 - cosine similarity), inputs
               scaled to [-1, 1] then LPIPS shift/scale normalization
* LPIPS     — alexnet v0.1: unit-normalized channel features, learned linear
              weights, spatial mean, summed over slices

Perceptual/LPIPS need pretrained weights (no egress here); construct
``PerceptualMetrics`` with the torchvision/lpips .pth paths when available —
PSNR/SSIM always work.
"""

from __future__ import annotations

from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from slrsfs_tpu.eval.feature_nets import (
    AlexNetFeatures,
    VGG16Features,
    import_alexnet,
    import_lpips_alex,
    import_vgg16,
)
from slrsfs_tpu.losses.ssim import ssim as _ssim

# LPIPS input normalization (pretrained_networks.py:45-46)
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


def psnr01(pred: jax.Array, gt: jax.Array,
           mask: Optional[jax.Array] = None) -> jax.Array:
    """metrics.py:11-23; images (B, H, W, 3) in [0, 1]."""
    b = pred.shape[0]
    if mask is not None:
        err = jnp.square(pred - gt) * mask
        mse = err.reshape(b, -1).sum(1) / (
            3 * jnp.clip(mask.reshape(b, -1).sum(1), 1, None))
    else:
        mse = jnp.mean(jnp.square(pred - gt).reshape(b, -1), axis=1)
    return jnp.mean(10.0 * jnp.log10(1.0 / mse))


def ssim01(pred: jax.Array, gt: jax.Array,
           mask: Optional[jax.Array] = None) -> jax.Array:
    return jnp.mean(_ssim(pred, gt, mask=mask))


def _cos_dist(a: jax.Array, b: jax.Array) -> jax.Array:
    """1 - cosine similarity over channels, averaged spatially."""
    an = a / (jnp.linalg.norm(a, axis=-1, keepdims=True) + 1e-10)
    bn = b / (jnp.linalg.norm(b, axis=-1, keepdims=True) + 1e-10)
    return jnp.mean(1.0 - jnp.sum(an * bn, axis=-1))


class PerceptualMetrics:
    """PNet-VGG16 'Perceptual' and LPIPS-alex metrics (weight-gated)."""

    def __init__(self, vgg16_pth: Optional[str] = None,
                 alexnet_pth: Optional[str] = None,
                 lpips_pth: Optional[str] = None):
        self.vgg = None
        self.alex = None
        self.lpips_w: Optional[List[np.ndarray]] = None
        if vgg16_pth:
            import torch

            self.vgg = VGG16Features()
            self.vgg_vars = import_vgg16(
                torch.load(vgg16_pth, map_location="cpu", weights_only=False))
        if alexnet_pth:
            import torch

            self.alex = AlexNetFeatures()
            self.alex_vars = import_alexnet(
                torch.load(alexnet_pth, map_location="cpu", weights_only=False))
            if lpips_pth:
                self.lpips_w = import_lpips_alex(
                    torch.load(lpips_pth, map_location="cpu", weights_only=False))

    @property
    def has_perceptual(self):
        return self.vgg is not None

    @property
    def has_lpips(self):
        return self.alex is not None and self.lpips_w is not None

    def _norm_input(self, img01: jax.Array) -> jax.Array:
        x = img01 * 2.0 - 1.0
        return (x - _SHIFT) / _SCALE

    def perceptual(self, pred01: jax.Array, gt01: jax.Array) -> jax.Array:
        """PNet forward (pretrained_networks.py:68-95)."""
        fa = self.vgg.apply(self.vgg_vars, self._norm_input(pred01))
        fb = self.vgg.apply(self.vgg_vars, self._norm_input(gt01))
        val = 0.0
        for a, b in zip(fa, fb):
            val = val + _cos_dist(a, b)
        return val

    def lpips(self, pred01: jax.Array, gt01: jax.Array) -> jax.Array:
        """LPIPS v0.1 alex: unit-norm features, linear weights, mean."""
        fa = self.alex.apply(self.alex_vars, self._norm_input(pred01))
        fb = self.alex.apply(self.alex_vars, self._norm_input(gt01))
        val = 0.0
        for w, a, b in zip(self.lpips_w, fa, fb):
            an = a / (jnp.linalg.norm(a, axis=-1, keepdims=True) + 1e-10)
            bn = b / (jnp.linalg.norm(b, axis=-1, keepdims=True) + 1e-10)
            d = jnp.square(an - bn) * jnp.asarray(w)
            val = val + jnp.mean(jnp.sum(d, axis=-1))
        return val

    def all_metrics(self, pred01: jax.Array, gt01: jax.Array) -> Dict[str, float]:
        out = {
            "PSNR": float(psnr01(pred01, gt01)),
            "SSIM": float(ssim01(pred01, gt01)),
        }
        if self.has_perceptual:
            out["Perceptual"] = float(self.perceptual(pred01, gt01))
        if self.has_lpips:
            out["LPIPS"] = float(self.lpips(pred01, gt01))
        return out
