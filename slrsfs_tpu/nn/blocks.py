"""BigGAN-style ResNet blocks (plain and partial-conv variants).

Fresh NHWC/flax implementations of reference ``models/layers/blocks.py``:

* ``ResNetBlock`` — blocks.py:47-87: (noise-BN → ReLU → 3x3 conv) ×2 with a
  1x1-conv shortcut when shape changes; Down = AvgPool(3,2,1), Up = bilinear 2x.
* ``ResNetBlockPconv2`` — blocks.py:173-248: partial convs with separate
  feature/mask resampling (Down: AvgPool feat / MaxPool mask; Up: bilinear
  feat / nearest mask), optional mask-aware noise-BN ('pbn'), optional
  bias-free shortcut ('woresbias').
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from slrsfs_tpu.nn.conv import (
    Conv,
    PartialConv,
    avg_pool_3x3s2,
    max_pool_3x3s2,
    upsample_bilinear_2x,
    upsample_nearest_2x,
)
from slrsfs_tpu.nn.norm import NoiseBN, PartialNoiseBN

Array = jax.Array


def _activation(name: Optional[str]):
    if name == "LRelu":
        return lambda x: jax.nn.leaky_relu(x, 0.2)
    if name == "PRelu":  # reference option; PReLU init slope 0.25
        return lambda x: jnp.where(x >= 0, x, 0.25 * x)
    return jax.nn.relu  # 'Relu', None, and unknown all fall back to ReLU


class ResNetBlock(nn.Module):
    features: int
    downsample: object = False  # False | True | "Down" | "Up"
    spectral: bool = True

    def _resample(self, x):
        if self.downsample == "Up":
            return upsample_bilinear_2x(x)
        if self.downsample:  # True or "Down"
            return avg_pool_3x3s2(x)
        return x

    @nn.compact
    def __call__(self, x: Array, train: bool, deterministic: bool) -> Array:
        in_c = x.shape[-1]
        h = NoiseBN(in_c, spectral=self.spectral, name="bn_noise1")(
            x, train, deterministic
        )
        h = jax.nn.relu(h)
        h = Conv(self.features, 3, 1, 1, spectral=self.spectral, name="conv_aa")(
            h, train
        )
        h = NoiseBN(self.features, spectral=self.spectral, name="bn_noise2")(
            h, train, deterministic
        )
        h = jax.nn.relu(h)
        h = Conv(self.features, 3, 1, 1, spectral=self.spectral, name="conv_ab")(
            h, train
        )
        h = self._resample(h)
        if self.downsample or in_c != self.features:
            sc = Conv(self.features, 1, 1, 0, spectral=self.spectral, name="conv_b")(
                x, train
            )
            sc = self._resample(sc)
        else:
            sc = x
        return h + sc


class ResNetBlockPconv2(nn.Module):
    features: int
    downsample: object = False  # False | "Down" | "Up"
    activation: Optional[str] = "Relu"
    spectral: bool = True
    partial_bn: bool = True
    shortcut_bias: bool = False  # 'woresbias' => False

    def _resample_feat(self, x):
        if self.downsample == "Down":
            return avg_pool_3x3s2(x)
        if self.downsample == "Up":
            return upsample_bilinear_2x(x)
        return x

    def _resample_mask(self, m):
        if self.downsample == "Down":
            return max_pool_3x3s2(m)
        if self.downsample == "Up":
            return upsample_nearest_2x(m)
        return m

    @nn.compact
    def __call__(self, x: Array, mask: Array, train: bool, deterministic: bool):
        in_c = x.shape[-1]
        act = _activation(self.activation)

        def bn(feats, name):
            if self.partial_bn:
                return PartialNoiseBN(feats, spectral=self.spectral, name=name)
            return NoiseBN(feats, spectral=self.spectral, name=name)

        if self.partial_bn:
            h, m = bn(in_c, "bn_noise1")(x, mask, train, deterministic)
        else:
            h, m = NoiseBN(in_c, spectral=self.spectral, name="bn_noise1")(
                x, train, deterministic
            ), mask
        h = act(h)
        h, m = PartialConv(self.features, 3, 1, 1, spectral=self.spectral,
                           name="conv_aa")(h, m, train)
        if self.partial_bn:
            h, m = bn(self.features, "bn_noise2")(h, m, train, deterministic)
        else:
            h = NoiseBN(self.features, spectral=self.spectral, name="bn_noise2")(
                h, train, deterministic
            )
        h = act(h)
        h, m = PartialConv(self.features, 3, 1, 1, spectral=self.spectral,
                           name="conv_ab")(h, m, train)
        h = self._resample_feat(h)
        m = self._resample_mask(m)

        if self.downsample or in_c != self.features:
            sc = Conv(self.features, 1, 1, 0, use_bias=self.shortcut_bias,
                      spectral=self.spectral, name="conv_b")(x, train)
            sc = self._resample_feat(sc)
        else:
            sc = x
        return h + sc, m
