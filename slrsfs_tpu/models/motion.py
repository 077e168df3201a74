"""Motion regressors: dense Eulerian motion from image (+ fluid mask + sparse
hints).

Fresh NHWC/flax equivalents of:

* ``SPADEUnet4MaskMotion`` — reference ``models/networks/architectures.py
  :602-743``: 8-down/8-up UNet, SPADE normalization conditioned on the
  6-channel input [RGB, mask, hint] (mask resized nearest, rest bilinear —
  ``models/networks/networks.py:422-463``), and the reference's per-channel
  upsampling quirk (feature channels [:3] bilinear, [3:4] nearest, [4:]
  bilinear) transliterated exactly;
* ``Unet4Motion`` — architectures.py:382-493: same skeleton with plain
  instance/batch norms;
* ``MotionRegressor`` — reference ``models/unet_motion.py`` (UnetMotion /
  SPADEUnetMaskMotion): assembles [image, moving-mask, hint] input, scales
  the prediction by ``div_flow``.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from slrsfs_tpu.config import Options
from slrsfs_tpu.losses.synthesis import MotionLoss, psnr
from slrsfs_tpu.nn.conv import (
    Conv,
    resize_bilinear,
    upsample_bilinear_2x,
    upsample_nearest_2x,
)
from slrsfs_tpu.nn.discriminators import instance_norm

Array = jax.Array


def _resize_nearest(x: Array, h: int, w: int) -> Array:
    """torch F.interpolate(mode='nearest'): src = floor(i · in/out) — the
    legacy asymmetric grid, NOT jax.image.resize's half-pixel rounding
    (they differ on any non-2x scale and on downscale)."""
    H, W = x.shape[1], x.shape[2]
    iy = jnp.minimum((jnp.arange(h) * H) // h, H - 1).astype(jnp.int32)
    ix = jnp.minimum((jnp.arange(w) * W) // w, W - 1).astype(jnp.int32)
    return x[:, iy][:, :, ix]


def _resize_segmap(segmap: Array, h: int, w: int) -> Array:
    """SPADE segmap resize (networks.py:441-454): channel 3 (mask) nearest,
    others bilinear. Supports 1/4/6-channel maps."""
    c = segmap.shape[-1]
    if c == 1:
        return _resize_nearest(segmap, h, w)
    if c in (4, 6):
        parts = [
            resize_bilinear(segmap[..., :3], h, w),
            _resize_nearest(segmap[..., 3:4], h, w),
        ]
        if c == 6:
            parts.append(resize_bilinear(segmap[..., 4:6], h, w))
        return jnp.concatenate(parts, axis=-1)
    return resize_bilinear(segmap, h, w)


class SPADE(nn.Module):
    """networks.py:422-463 (param-free instance norm variant; the shipped
    motion config uses motion_norm_G='sync:spectral_instance')."""

    features: int

    @nn.compact
    def __call__(self, x: Array, segmap: Array, train: bool) -> Array:
        normalized = instance_norm(x)
        seg = _resize_segmap(segmap, x.shape[1], x.shape[2])
        h = Conv(128, 3, 1, 1, spectral=False, name="mlp_shared")(seg, train)
        h = jax.nn.relu(h)
        gamma = Conv(self.features, 3, 1, 1, spectral=False, name="mlp_gamma")(h, train)
        beta = Conv(self.features, 3, 1, 1, spectral=False, name="mlp_beta")(h, train)
        return normalized * (1.0 + gamma) + beta


def _up_split(x: Array) -> Array:
    """The reference's per-channel upsample (architectures.py:698-739):
    channels [:3] bilinear, [3:4] nearest, [4:] bilinear."""
    return jnp.concatenate(
        [
            upsample_bilinear_2x(x[..., :3]),
            upsample_nearest_2x(x[..., 3:4]),
            upsample_bilinear_2x(x[..., 4:]),
        ],
        axis=-1,
    )


def _enc_mults(downs: int) -> Tuple[int, ...]:
    """Channel-multiplier ladder nf·[1, 2, 4, 8, 8, …] of an n-down UNet
    (reference hardcodes downs=8, architectures.py:382-493/602-743; smaller
    depths are a consumed mechanics-test knob like motion_num_filters —
    they shrink the minimum input size from 256² to 2^downs squared)."""
    return tuple(([1, 2, 4] + [8] * max(0, downs - 3))[:downs])


class SPADEUnet4MaskMotion(nn.Module):
    """architectures.py:602-743. channels_in = 6 ([img, mask, hint]).

    Written as a depth-parametrized loop whose module names at downs=8
    reproduce the reference state_dict keys exactly (conv1..conv8,
    dconv1..dconv8, spade_layer2_0/4_0/8_0..8_7/4_1/2_1/spade_layer) —
    pinned by the weight-transfer parity test through the checkpoint
    importer (tests/test_motion.py)."""

    opt: Options
    num_filters: int = 32
    channels_out: int = 2
    downs: int = 8

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        from slrsfs_tpu.config import spectral as _sp

        sp = _sp(self.opt)
        nf = self.num_filters
        d = self.downs
        mults = _enc_mults(d)
        lrelu = lambda t: jax.nn.leaky_relu(t, 0.2)

        def conv(f, k, s, p, name):
            return Conv(f, k, s, p, spectral=sp, name=name)

        # per-multiplier SPADE name counters: encoder first, decoder
        # continues the count; the single nf-wide decoder SPADE is the
        # unsuffixed "spade_layer" (reference naming)
        counts = {}

        def spade(mult, feat, segm):
            i = counts.get(mult, 0)
            counts[mult] = i + 1
            name = "spade_layer" if mult == 1 else f"spade_layer{mult}_{i}"
            return SPADE(nf * mult, name=name)(feat, segm, train)

        segmap = x
        enc = []
        h = x
        for i in range(1, d + 1):
            h = conv(nf * mults[i - 1], 4, 2, 1, f"conv{i}")(
                h if i == 1 else lrelu(h), train)
            if 1 < i < d:
                h = spade(mults[i - 1], h, segmap)
            enc.append(h)

        h = _up_split(jax.nn.relu(enc[-1]))
        for i in range(1, d):
            mult = mults[d - i - 1]
            h = spade(mult, conv(nf * mult, 3, 1, 1, f"dconv{i}")(h, train),
                      segmap)
            h = jax.nn.relu(
                jnp.concatenate([_up_split(h), _up_split(enc[d - i - 1])],
                                -1))
        return conv(self.channels_out, 3, 1, 1, f"dconv{d}")(h, train)


class Unet4Motion(nn.Module):
    """architectures.py:382-493: plain-norm n/n UNet, uniform bilinear up
    (depth-parametrized like SPADEUnet4MaskMotion; names at downs=8 match
    the reference state_dict exactly)."""

    opt: Options
    num_filters: int = 32
    channels_out: int = 2
    downs: int = 8

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        from slrsfs_tpu.config import spectral as _sp

        sp = _sp(self.opt)
        nf = self.num_filters
        d = self.downs
        mults = _enc_mults(d)
        lrelu = lambda t: jax.nn.leaky_relu(t, 0.2)
        up = upsample_bilinear_2x

        def conv(f, k, s, p, name):
            return Conv(f, k, s, p, spectral=sp, name=name)

        norm = instance_norm  # motion_norm_G 'spectral_instance'
        enc = []
        h = x
        for i in range(1, d + 1):
            h = conv(nf * mults[i - 1], 4, 2, 1, f"conv{i}")(
                h if i == 1 else lrelu(h), train)
            if 1 < i < d:
                h = norm(h)
            enc.append(h)

        h = jax.nn.relu(enc[-1])
        for i in range(1, d):
            mult = mults[d - i - 1]
            h = norm(conv(nf * mult, 3, 1, 1, f"dconv{i}")(up(h), train))
            h = jax.nn.relu(jnp.concatenate([h, enc[d - i - 1]], -1))
        return conv(self.channels_out, 3, 1, 1, f"dconv{d}")(up(h), train)


def moving_region_mask(motion: Array) -> Array:
    """speed >= 0.1·mean-speed mask (reference unet_motion.py:57-61). NHWC."""
    speed = jnp.linalg.norm(motion, axis=-1, keepdims=True)
    small = (speed < jnp.mean(speed, axis=(1, 2, 3), keepdims=True) * 0.1)
    return 1.0 - small.astype(motion.dtype)


def resolved_motion_model_type(opt: Options) -> str:
    """The regressor architecture string: ``model_type`` when the model IS a
    motion model, else ``motion_model_type`` — the reference builds the
    embedded regressor from a copy of opts with ``model_type`` swapped to
    ``motion_model_type`` (animating_softmax_splating.py:190-193)."""
    if opt.model_type in ("SPADE_unet_mask_motion", "unet_motion"):
        return opt.model_type
    return opt.motion_model_type


class MotionRegressor(nn.Module):
    """reference models/unet_motion.py (UnetMotion / SPADEUnetMaskMotion)."""

    opt: Options

    def setup(self):
        nf = self.opt.motion_num_filters
        downs = self.opt.motion_unet_downs
        if "SPADE" in resolved_motion_model_type(self.opt):
            self.motion_predictor = SPADEUnet4MaskMotion(
                self.opt, num_filters=nf, downs=downs)
        else:
            self.motion_predictor = Unet4Motion(self.opt, num_filters=nf,
                                                downs=downs)

    def _assemble(self, image, mask, hint):
        parts = [image]
        if self.opt.use_mask_as_motion_input:
            parts.append(mask)
        if self.opt.use_hint_as_motion_input:
            parts.append(hint)
        return jnp.concatenate(parts, axis=-1)

    def predict(self, image: Array, mask: Optional[Array] = None,
                hint: Optional[Array] = None, train: bool = False) -> Array:
        """forward_flow (unet_motion.py:174-190): prediction · div_flow."""
        x = self._assemble(image, mask, hint)
        return self.motion_predictor(x, train) * self.opt.div_flow

    def __call__(self, image: Array, mask: Optional[Array] = None,
                 hint: Optional[Array] = None, train: bool = False) -> Array:
        return self.predict(image, mask, hint, train)

    def forward_train(self, batch, train: bool = True,
                      deterministic: bool = False):
        """Training pass (unet_motion.py:131-172): mask derived from GT
        motion speed; returns (pred_motion·div_flow, pred_dict)."""
        image = batch["images"][0]
        gt_motion = batch["motions"]
        mask = moving_region_mask(gt_motion)
        hint = batch.get("hints")
        pred = self.predict(image, mask, hint, train)
        pred_dict = {
            "PredMotion": pred / self.opt.div_flow,
            "GTMotion": gt_motion,
            "InputImg": image,
            "MovingMask": mask,
        }
        if hint is not None:
            pred_dict["HintMotion"] = hint
        return pred, pred_dict


def motion_losses(opt: Options, pred_scaled: Array, gt_motion: Array
                  ) -> Dict[str, Array]:
    """MotionLoss·div_flow + PSNR metric (unet_motion.py:158-159)."""
    ml = MotionLoss(opt.motion_losses)(pred_scaled, gt_motion)
    ml["PSNR_motion"] = psnr(pred_scaled, gt_motion)
    return ml
