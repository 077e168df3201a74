"""Encoders and decoders assembled from the ResNet blocks.

Fresh NHWC/flax equivalents of reference ``models/networks/architectures.py``:

* ``ResNetEncoder`` — architectures.py:121-153
* ``ResNetEncoderWithZ`` — architectures.py:155-197 (last block emits +1
  channel; forward returns (features, Z))
* ``ResNetDecoder`` — architectures.py:209-230
* ``ResNetDecoderPconv2`` — architectures.py:345-375 (partial-conv decoder;
  input mask is ``x != 0``, i.e. splat holes)
* ``ResNetBGDecoder`` — architectures.py:233-260 (mean-video hallucinator)

Wiring (which decoder a model gets) follows the substring conventions of
reference ``models/networks/utilities.py:18-147``.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from slrsfs_tpu.config import Options, partial_bn, spectral, woresbias
from slrsfs_tpu.nn.archs import get_resnet_arch
from slrsfs_tpu.nn.blocks import ResNetBlock, ResNetBlockPconv2

Array = jax.Array


class ResNetEncoder(nn.Module):
    opt: Options
    in_channels: int = 3
    model_type: Optional[str] = None
    downsample: bool = True

    @nn.compact
    def __call__(self, x: Array, train: bool, deterministic: bool) -> Array:
        mt = self.model_type or self.opt.refine_model_type
        arch = get_resnet_arch(mt, self.opt, self.in_channels)
        sp = spectral(self.opt)
        h = x
        for i in range(1, len(arch["layers_enc"])):
            h = ResNetBlock(
                arch["layers_enc"][i],
                downsample=(self.downsample and arch["downsample"][i - 1]),
                spectral=sp,
                name=f"gblock_{i - 1}",
            )(h, train, deterministic)
        return h


class ResNetEncoderWithZ(nn.Module):
    """Encoder whose last block emits one extra channel, returned as Z."""

    opt: Options
    in_channels: int = 3
    model_type: Optional[str] = None
    downsample: bool = True

    @nn.compact
    def __call__(self, x: Array, train: bool, deterministic: bool) -> Tuple[Array, Array]:
        mt = self.model_type or self.opt.refine_model_type
        arch = get_resnet_arch(mt, self.opt, self.in_channels)
        sp = spectral(self.opt)
        layers = list(arch["layers_enc"])
        layers[-1] = layers[-1] + 1  # architectures.py:184-190
        h = x
        for i in range(1, len(layers)):
            h = ResNetBlock(
                layers[i],
                downsample=(self.downsample and arch["downsample"][i - 1]),
                spectral=sp,
                name=f"gblock_{i - 1}",
            )(h, train, deterministic)
        return h[..., :-1], h[..., -1:]


class ResNetDecoder(nn.Module):
    opt: Options
    model_type: Optional[str] = None

    @nn.compact
    def __call__(self, x: Array, train: bool, deterministic: bool) -> Array:
        mt = self.model_type or self.opt.refine_model_type
        arch = get_resnet_arch(mt, self.opt)
        sp = spectral(self.opt)
        h = x
        for i in range(1, len(arch["layers_dec"])):
            h = ResNetBlock(
                arch["layers_dec"][i],
                downsample=arch["upsample"][i - 1],
                spectral=sp,
                name=f"eblock_{i - 1}",
            )(h, train, deterministic)
        return h


class ResNetBGDecoder(nn.Module):
    """Background ('mean video') network: image in, image out.

    Arch comes from ``opt.bg_refine_model_type`` (architectures.py:233-260);
    no output nonlinearity (use_tanh=False in get_net_bg, utilities.py:98-101).
    """

    opt: Options

    @nn.compact
    def __call__(self, x: Array, train: bool, deterministic: bool) -> Array:
        arch = get_resnet_arch(self.opt.bg_refine_model_type, self.opt)
        sp = spectral(self.opt)
        h = x
        for i in range(1, len(arch["layers_dec"])):
            h = ResNetBlock(
                arch["layers_dec"][i],
                downsample=arch["upsample"][i - 1],
                spectral=sp,
                name=f"eblock_{i - 1}",
            )(h, train, deterministic)
        return h


class ResNetDecoderPconv2(nn.Module):
    """Partial-conv decoder; holes are where the splatted input is exactly 0.

    The reference's 'mask1' pconv setting (all-ones mask) is selected by the
    ``pconv`` option string (architectures.py:368-375).
    """

    opt: Options
    model_type: Optional[str] = None

    @nn.compact
    def __call__(self, x: Array, train: bool, deterministic: bool) -> Array:
        mt = self.model_type or self.opt.refine_model_type
        arch = get_resnet_arch(mt, self.opt)
        sp = spectral(self.opt)
        pbn = partial_bn(self.opt)
        sc_bias = not woresbias(self.opt)
        if "mask1" in self.opt.pconv:
            mask = jnp.ones_like(x)
        else:
            mask = (x != 0).astype(x.dtype)
        h = x
        for i in range(1, len(arch["layers_dec"])):
            h, mask = ResNetBlockPconv2(
                arch["layers_dec"][i],
                downsample=arch["upsample"][i - 1],
                activation=arch["activation"][i - 1] if "activation" in arch else "Relu",
                spectral=sp,
                partial_bn=pbn,
                shortcut_bias=sc_bias,
                name=f"eblock_{i - 1}",
            )(h, mask, train, deterministic)
        return h
