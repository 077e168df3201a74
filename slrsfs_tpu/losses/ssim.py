"""Gaussian-window SSIM (reference ``models/losses/ssim.py:31-124``).

Window size 11, sigma 1.5, per-channel depthwise convolution, C1=0.01^2,
C2=0.03^2 (the reference applies these constants to [-1,1]-ranged images).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


def _gaussian_window(window_size: int = 11, sigma: float = 1.5) -> np.ndarray:
    g = np.exp(
        -((np.arange(window_size) - window_size // 2) ** 2) / (2 * sigma**2)
    )
    g = g / g.sum()
    w2d = np.outer(g, g)
    return w2d.astype(np.float32)


def _depthwise_filter(x: Array, w2d: np.ndarray) -> Array:
    """Per-channel 'same' convolution with the gaussian window. NHWC.

    Precision pinned to HIGHEST: on TPU the default conv precision is a
    single bf16 pass, which destroys the variance estimates downstream
    (sigma = E[x²] − mu² cancels ~0.25 down to ~1e-3-scale values, below
    bf16's error at that magnitude — measured SSIM 0.03 for IDENTICAL
    768² images on v5e before the pin). An 11×11 depthwise window is
    negligible FLOPs, so full precision costs nothing."""
    C = x.shape[-1]
    k = jnp.asarray(w2d)[:, :, None, None]  # (kh, kw, 1, 1)
    k = jnp.tile(k, (1, 1, 1, C))  # HWIO with feature_group_count=C
    p = w2d.shape[0] // 2
    return jax.lax.conv_general_dilated(
        x, k, (1, 1), [(p, p), (p, p)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=C,
        precision=jax.lax.Precision.HIGHEST,
    )


def ssim(img1: Array, img2: Array, mask: Array = None,
         window_size: int = 11) -> Array:
    w2d = _gaussian_window(window_size)
    mu1 = _depthwise_filter(img1, w2d)
    mu2 = _depthwise_filter(img2, w2d)
    mu1_sq, mu2_sq, mu1_mu2 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    sigma1_sq = _depthwise_filter(img1 * img1, w2d) - mu1_sq
    sigma2_sq = _depthwise_filter(img2 * img2, w2d) - mu2_sq
    sigma12 = _depthwise_filter(img1 * img2, w2d) - mu1_mu2
    C1, C2 = 0.01**2, 0.03**2
    ssim_map = ((2 * mu1_mu2 + C1) * (2 * sigma12 + C2)) / (
        (mu1_sq + mu2_sq + C1) * (sigma1_sq + sigma2_sq + C2)
    )
    if mask is not None:
        b = mask.shape[0]
        m = jnp.mean(ssim_map, axis=-1, keepdims=True) * mask
        num = m.reshape(b, -1).sum(axis=1)
        den = jnp.maximum(mask.reshape(b, -1).sum(axis=1), 1.0)
        return num / den
    return jnp.mean(ssim_map)
