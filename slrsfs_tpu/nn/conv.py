"""NHWC convolutions: plain, spectrally-normalized, and partial (mask-aware).

Partial convolution follows the NVIDIA reference semantics used by the
decoder (reference ``models/layers/partialconv2d.py:41-81``): the mask is
convolved with an all-ones kernel; outputs are rescaled by
``winsize / sum(mask)`` and re-masked; the propagated mask is
``clamp(sum(mask), 0, 1)``.

TPU-native refinement: the reference computes the mask conv with a full
(outC, inC, k, k) ones kernel, producing ``outC`` identical channels. Here the
mask is kept single-channel — one (k, k, Cm, 1) ones conv gives exactly the
same per-pixel count (the reference's value is channel-constant), saving
outC× of the mask-conv FLOPs and HBM traffic. The first layer's mask may be
genuinely per-channel (``(x != 0)``); its in-channel sum is what the ones
kernel computes, so parity is exact.
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from slrsfs_tpu.nn.norm import SpectralWeight

Array = jax.Array

# read once at import (process-start scope): a trace-time read inside
# library code would silently ignore flips after functions are jit-cached
_STENCIL_UPSAMPLE = os.environ.get("SLRSFS_STENCIL_UPSAMPLE", "0") != "0"


def conv2d(x: Array, kernel: Array, bias: Optional[Array], stride: int, padding: int,
           dilation: int = 1) -> Array:
    """torch.nn.Conv2d-compatible NHWC conv (cross-correlation).

    kernel: (kh, kw, inC, outC) (HWIO).
    """
    out = jax.lax.conv_general_dilated(
        x,
        kernel,
        window_strides=(stride, stride),
        padding=[(padding, padding), (padding, padding)],
        rhs_dilation=(dilation, dilation),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if bias is not None:
        out = out + bias
    return out


class Conv(nn.Module):
    """Plain or spectrally-normalized conv (reference blocks.py:5-11)."""

    features: int
    kernel_size: int = 3
    stride: int = 1
    padding: int = 1
    dilation: int = 1
    use_bias: bool = True
    spectral: bool = False

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        k = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (self.kernel_size, self.kernel_size, x.shape[-1], self.features),
        )
        if self.spectral:
            k = SpectralWeight(name="sn")(k, 3, train)
        b = (
            self.param("bias", nn.initializers.zeros, (self.features,))
            if self.use_bias
            else None
        )
        return conv2d(x, k, b, self.stride, self.padding, self.dilation)


class PartialConv(nn.Module):
    """Mask-aware conv; returns (output, updated_mask(B,H,W,1)).

    Matches reference ``PartialConv2d`` with ``multi_channel=True,
    return_mask=True, bias=True`` (models/layers/partialconv2d.py) — the only
    configuration the reference instantiates (models/layers/blocks.py:14-23).
    """

    features: int
    kernel_size: int = 3
    stride: int = 1
    padding: int = 1
    dilation: int = 1
    spectral: bool = False

    @nn.compact
    def __call__(self, x: Array, mask: Array, train: bool = False) -> Tuple[Array, Array]:
        in_c = x.shape[-1]
        k = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (self.kernel_size, self.kernel_size, in_c, self.features),
        )
        if self.spectral:
            k = SpectralWeight(name="sn")(k, 3, train)
        b = self.param("bias", nn.initializers.zeros, (self.features,))

        # winsize/(sum over in-channels and window of mask); channel-uniform.
        mask = jax.lax.stop_gradient(mask)
        cm = mask.shape[-1]
        if self.dilation == 1:
            # windowed sum via reduce_window: a 1-output-channel conv forces
            # TPU layout churn (T(2,128) copies around every mask op); the
            # reduction stays in the feature layout and fuses.
            m = mask.astype(x.dtype)
            if cm > 1:
                m = jnp.sum(m, axis=-1, keepdims=True)
            p = self.padding
            msum = jax.lax.reduce_window(
                m, jnp.zeros((), x.dtype), jax.lax.add,
                (1, self.kernel_size, self.kernel_size, 1),
                (1, self.stride, self.stride, 1),
                [(0, 0), (p, p), (p, p), (0, 0)],
            )
        else:
            ones = jnp.ones((self.kernel_size, self.kernel_size, cm, 1),
                            x.dtype)
            msum = conv2d(mask.astype(x.dtype), ones, None, self.stride,
                          self.padding, self.dilation)
        if cm == 1:
            msum = msum * in_c
        winsize = in_c * self.kernel_size * self.kernel_size
        ratio = winsize / (msum + 1e-8)
        update_mask = jnp.clip(msum, 0.0, 1.0)
        ratio = ratio * update_mask

        raw = conv2d(x * mask.astype(x.dtype), k, b, self.stride,
                     self.padding, self.dilation)
        out = (raw - b) * ratio + b
        out = out * update_mask
        return out, update_mask


def avg_pool_3x3s2(x: Array) -> Array:
    """torch AvgPool2d(kernel=3, stride=2, padding=1), count_include_pad=True."""
    s = jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, 3, 3, 1), (1, 2, 2, 1),
        [(0, 0), (1, 1), (1, 1), (0, 0)],
    )
    return s / 9.0


def max_pool_3x3s2(x: Array) -> Array:
    """torch MaxPool2d(kernel=3, stride=2, padding=1)."""
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
        [(0, 0), (1, 1), (1, 1), (0, 0)],
    )


def upsample_nearest_2x(x: Array) -> Array:
    """torch Upsample(scale_factor=2, mode='nearest')."""
    return jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)


def _up2_axis(x: Array, axis: int) -> Array:
    """Bilinear 2x along one axis via the closed-form half-pixel stencil:
    out[2j] = 0.25·x[j-1] + 0.75·x[j], out[2j+1] = 0.75·x[j] + 0.25·x[j+1]
    (edges clamped). Elementwise shifts + interleave — no dot_general."""
    idx_lo = [slice(None)] * x.ndim
    idx_hi = [slice(None)] * x.ndim
    idx_first = [slice(None)] * x.ndim
    idx_last = [slice(None)] * x.ndim
    idx_lo[axis] = slice(None, -1)
    idx_hi[axis] = slice(1, None)
    idx_first[axis] = slice(None, 1)
    idx_last[axis] = slice(-1, None)
    xm = jnp.concatenate([x[tuple(idx_first)], x[tuple(idx_lo)]], axis)
    xp = jnp.concatenate([x[tuple(idx_hi)], x[tuple(idx_last)]], axis)
    even = 0.25 * xm + 0.75 * x
    odd = 0.75 * x + 0.25 * xp
    out = jnp.stack([even, odd], axis=axis + 1)
    shape = list(x.shape)
    shape[axis] *= 2
    return out.reshape(shape)


def upsample_bilinear_2x(x: Array) -> Array:
    """torch Upsample(scale_factor=2, mode='bilinear', align_corners=False).

    Two equivalent implementations (unit-tested identical to float
    rounding): jax.image.resize (dot_general lowering) and a separable
    closed-form stencil (elementwise shifts + interleave). Measured at the
    768² rollout shape they are within noise for decode_batch <= 15, but
    the stencil's unfused interleave temps OOM at larger chunks while the
    resize's transposed dot outputs cost relayout copies — selectable via
    SLRSFS_STENCIL_UPSAMPLE (read ONCE at import: flipping it after
    functions are jit-cached would silently have no effect, so the scope
    is process-start by design; default: resize)."""
    if _STENCIL_UPSAMPLE:
        return _up2_axis(_up2_axis(x, 1), 2)
    B, H, W, C = x.shape
    return jax.image.resize(x, (B, 2 * H, 2 * W, C), method="bilinear")


def resize_bilinear(x: Array, h: int, w: int) -> Array:
    """torch F.interpolate(mode='bilinear', align_corners=False,
    antialias=False): 2-tap sampling at half-pixel-centered target coords.

    NOT jax.image.resize — that ANTIALIASES on downscale (scale-aware
    triangle kernel), which diverges from torch exactly where SPADE
    downsizes its segmap to each layer's resolution (256 → 2..128); the
    full-UNet motion parity test caught a 99%-of-pixels mismatch. On
    upscale the two agree (kernel support 1), so upsample_bilinear_2x
    stays on jax.image.resize.
    """
    B, H, W = x.shape[0], x.shape[1], x.shape[2]
    if (h, w) == (H, W):
        return x

    def taps(out_size, in_size):
        i = jnp.arange(out_size, dtype=jnp.float32)
        src = (i + 0.5) * (in_size / out_size) - 0.5
        lo = jnp.clip(jnp.floor(src), 0, in_size - 1)
        frac = jnp.clip(src - lo, 0.0, 1.0)  # edge clamp (src < 0)
        lo_i = lo.astype(jnp.int32)
        return lo_i, jnp.minimum(lo_i + 1, in_size - 1), frac

    ylo, yhi, fy = taps(h, H)
    xlo, xhi, fx = taps(w, W)
    fy = fy[None, :, None, None]
    fx = fx[None, None, :, None]
    top = x[:, ylo] * (1.0 - fy) + x[:, yhi] * fy
    return top[:, :, xlo] * (1.0 - fx) + top[:, :, xhi] * fx
