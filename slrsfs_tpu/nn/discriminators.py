"""pix2pixHD-style multiscale PatchGAN discriminator.

Flax NHWC re-implementation of reference
``models/networks/discriminators.py``: ``NLayerDiscriminator`` (4 layers,
kw=4, spectral-norm + affine-free InstanceNorm per ``--norm_D
spectralinstance``; returns intermediate features) and
``MultiscaleDiscriminator`` (num_D=2 with count_exclude-pad avg-pool
downsampling between scales).
"""

from __future__ import annotations

from typing import List

import jax
import jax.numpy as jnp
from flax import linen as nn

from slrsfs_tpu.config import Options
from slrsfs_tpu.nn.conv import Conv

Array = jax.Array


def instance_norm(x: Array, eps: float = 1e-5) -> Array:
    """torch InstanceNorm2d(affine=False): per-sample per-channel spatial
    normalization with biased variance."""
    m = jnp.mean(x, axis=(1, 2), keepdims=True)
    v = jnp.mean(jnp.square(x - m), axis=(1, 2), keepdims=True)
    return (x - m) * jax.lax.rsqrt(v + eps)


class NLayerDiscriminator(nn.Module):
    """Reference discriminators.py:78-139. Returns the per-group outputs
    (intermediate features + final logit map)."""

    opt: Options

    @nn.compact
    def __call__(self, x: Array, train: bool = True) -> List[Array]:
        opt = self.opt
        kw, padw = 4, 2  # ceil((4-1)/2) = 2
        nf = opt.ndf
        spectral = opt.norm_D.startswith("spectral") if hasattr(opt, "norm_D") else True
        results = []
        # group 0: conv + leaky relu, no norm
        h = Conv(nf, kw, 2, padw, spectral=False, name="model0_conv")(x, train)
        h = jax.nn.leaky_relu(h, 0.2)
        results.append(h)
        for n in range(1, opt.n_layers_D):
            nf = min(nf * 2, 512)
            stride = 1 if n == opt.n_layers_D - 1 else 2
            # norm_D='spectralinstance': spectral conv (bias removed by the
            # norm wrapper) followed by InstanceNorm (normalization.py:95-130)
            h = Conv(nf, kw, stride, padw, use_bias=False, spectral=spectral,
                     name=f"model{n}_conv")(h, train)
            h = instance_norm(h)
            h = jax.nn.leaky_relu(h, 0.2)
            results.append(h)
        h = Conv(1, kw, 1, padw, spectral=False,
                 name=f"model{opt.n_layers_D}_conv")(h, train)
        results.append(h)
        return results


def _downsample_d(x: Array) -> Array:
    """avg_pool2d(3, 2, pad 1, count_include_pad=False)."""
    s = jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, 3, 3, 1), (1, 2, 2, 1),
        [(0, 0), (1, 1), (1, 1), (0, 0)],
    )
    ones = jnp.ones(x.shape[:3] + (1,), x.dtype)
    cnt = jax.lax.reduce_window(
        ones, 0.0, jax.lax.add, (1, 3, 3, 1), (1, 2, 2, 1),
        [(0, 0), (1, 1), (1, 1), (0, 0)],
    )
    return s / cnt


class MultiscaleDiscriminator(nn.Module):
    """Reference discriminators.py:142-207 (num_D scales)."""

    opt: Options

    @nn.compact
    def __call__(self, x: Array, train: bool = True) -> List[List[Array]]:
        out = []
        for i in range(self.opt.num_D):
            out.append(NLayerDiscriminator(self.opt, name=f"discriminator_{i}")(x, train))
            x = _downsample_d(x)
        return out
