"""SLR two-layer model: warped fluid layer + hallucinated static background,
alpha-composited.

Fresh TPU-native equivalent of reference
``models/animating_softmax_splating_2layers_alpha_seperate.py``
(AnimatingSoftmaxSplatingJoint):

* ``net_bg``            — background "mean video" network (ctor :172-173)
* ``net_alpha_encoder`` — 2-channel alpha head on the input image (:174-176,
                          utilities.py:105-116; channel 0 = background alpha
                          logits, channel 1 = fluid alpha logits)
* ``net_alpha_decoder`` — pconv decoder on [warped features, warped alpha]
                          (utilities.py:118-133: Layers arch, +1 input ch,
                          -2 output ch → 1 channel)
* splat packs ``[fs·e^Z, af_logits·e^C, e^C, e^Z]`` with C the composite
  fluid alpha when ``use_alpha0_as_blending_weight`` (forward_flow :963-976),
  else ``[fs·e^Z, af_logits·e^Z, e^Z]``
* composite ``(σ(a_fluid)·I_fluid + σ(a_bg)·I_bg) / clamp(σ(a_fluid)+σ(a_bg))``
  (:1056-1077), with the per-frame temporal α clamped to [1/600, 599/600]
  (:952).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from slrsfs_tpu.config import Options
from slrsfs_tpu.models.baseline import (
    NORM_EPS,
    pack_splat_input,
    z_for_splat,
    z_normalize,
)
from slrsfs_tpu.nn.resnets import (
    ResNetBGDecoder,
    ResNetDecoderPconv2,
    ResNetEncoder,
    ResNetEncoderWithZ,
)
from slrsfs_tpu.ops import softsplat_sum

Array = jax.Array

ALPHA_MIN, ALPHA_MAX = 1.0 / 600.0, 599.0 / 600.0  # reference :461,952


def _alpha_opt(opt: Options) -> Options:
    """get_alpha_encoder/decoder option surgery (utilities.py:105-133):
    decoder input is [gen_fs, warped_alpha] (+1 ch over ngf) by default;
    the 'decouple' variant takes the warped alpha alone and 'image' takes
    [start_img, warped_alpha] (utilities.py:127-131)."""
    out_channel = 3 if opt.AKLloss > 0.0 else 2
    adi = 1
    if "decouple" in opt.alpha_refine_model_type:
        adi -= opt.ngf
    elif "image" in opt.alpha_refine_model_type:
        adi -= opt.ngf - 3
    return opt.replace(
        refine_model_type=opt.alpha_refine_model_type,
        out_channel=out_channel,
        addtional_decoder_input=adi,
        addtional_decoder_output=-2,
    )


def alpha_in_channels(opt: Options) -> int:
    """Alpha-encoder input width: image + optional [motion(2), mask(1),
    bg_raw(3)] (reference 2layers file :375-385 / forward_flow :930-936)."""
    n = 3
    if opt.use_motion_as_alpha_input:
        n += 2
    if opt.use_mask_as_alpha_input:
        n += 1
    if opt.use_bg_as_alpha_input:
        n += 3
    return n


def split_alpha_output(opt: Options, out: Array) -> Tuple[Array, Array]:
    """Alpha-encoder output → (bg_logits, fluid_logits); see
    SLRModel.alpha_encode for the use_sum1_alpha identity."""
    if opt.use_sum1_alpha:
        a_fl = out[..., 0:1]
        return -a_fl, a_fl
    return out[..., 0:1], out[..., 1:2]


def build_alpha_input(opt: Options, img: Array,
                      motion: Optional[Array] = None,
                      mask_rock: Optional[Array] = None,
                      bg_raw: Optional[Array] = None) -> Array:
    """Concatenate the alpha-encoder inputs in reference order
    (img, +motion, +mask, +bg_raw — :375-385). bg_raw is PRE-Tanh (:371)."""
    parts = [img]
    if opt.use_motion_as_alpha_input:
        assert motion is not None, "use_motion_as_alpha_input needs motion"
        parts.append(motion)
    if opt.use_mask_as_alpha_input:
        assert mask_rock is not None, "use_mask_as_alpha_input needs mask_rock"
        parts.append(mask_rock)
    if opt.use_bg_as_alpha_input:
        assert bg_raw is not None, "use_bg_as_alpha_input needs bg_raw"
        parts.append(bg_raw)
    return parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=-1)


class SLRModel(nn.Module):
    opt: Options

    def setup(self):
        self.encoder = ResNetEncoderWithZ(self.opt, in_channels=3)
        self.projector = ResNetDecoderPconv2(self.opt)
        self.net_bg = ResNetBGDecoder(self.opt)
        a_opt = _alpha_opt(self.opt)
        self.net_alpha_encoder = ResNetEncoder(
            a_opt, in_channels=alpha_in_channels(self.opt))
        self.net_alpha_decoder = ResNetDecoderPconv2(a_opt)

    # ---- pieces ----------------------------------------------------------

    def encode(self, img: Array, train: bool = False,
               deterministic: bool = True) -> Tuple[Array, Array]:
        fs, z = self.encoder(img, train, deterministic)
        if "relu" in self.opt.Z_model:
            z = jax.nn.relu(z)
        return fs, z

    def bg(self, img: Array, train: bool = False,
           deterministic: bool = True) -> Array:
        """Raw (pre-Tanh) background image (reference applies Tanh at use
        sites, forward_flow :925-927)."""
        return self.net_bg(img, train, deterministic)

    def alpha_encode_raw(self, img: Array, train: bool = False,
                         deterministic: bool = True,
                         motion: Optional[Array] = None,
                         mask_rock: Optional[Array] = None,
                         bg_raw: Optional[Array] = None) -> Array:
        """Full alpha-encoder output (2 channels, 3 with AKLloss: channel 2
        is the alpha logsigma, :411-413). Extra inputs per the
        use_{motion,mask,bg}_as_alpha_input flags (:375-385)."""
        x = build_alpha_input(self.opt, img, motion, mask_rock, bg_raw)
        return self.net_alpha_encoder(x, train, deterministic)

    def alpha_encode(self, img: Array, train: bool = False,
                     deterministic: bool = True,
                     motion: Optional[Array] = None,
                     mask_rock: Optional[Array] = None,
                     bg_raw: Optional[Array] = None) -> Tuple[Array, Array]:
        """→ (alpha_bg_logits, alpha_fluid_logits), each (B, W, W, 1)
        (forward_flow :938-946, channel order [bg, fluid]).

        With ``use_sum1_alpha`` channel 0 is the single fluid logit and
        alpha_bg = 1 − σ(fluid) (:939-941); since 1 − σ(x) = σ(−x), the bg
        "logits" returned are −fluid_logits, keeping every downstream
        ``sigmoid(bg_logits)`` exact."""
        out = self.alpha_encode_raw(img, train, deterministic,
                                    motion, mask_rock, bg_raw)
        return split_alpha_output(self.opt, out)

    def decode_fluid(self, gen_fs: Array, train: bool = False,
                     deterministic: bool = True) -> Array:
        return jnp.tanh(self.projector(gen_fs, train, deterministic))

    def decode_alpha(self, gen_fs: Array, alpha_warped: Array,
                     train: bool = False, deterministic: bool = True,
                     img: Optional[Array] = None) -> Array:
        """Refined fluid alpha logits (forward_flow :1052-1054; input
        variants 'decouple'/'image' per reference :600-605)."""
        amt = self.opt.alpha_refine_model_type
        if "decouple" in amt:
            x = alpha_warped
        elif "image" in amt:
            assert img is not None, "'image' alpha decoder needs start_img"
            x = jnp.concatenate([img, alpha_warped], axis=-1)
        else:
            x = jnp.concatenate([gen_fs, alpha_warped], axis=-1)
        return self.net_alpha_decoder(x, train, deterministic)

    def __call__(self, img: Array, train: bool = False,
                 deterministic: bool = True):
        """Parameter-shaping pass (init)."""
        fs, z = self.encode(img, train, deterministic)
        fluid = self.decode_fluid(fs, train, deterministic)
        bg = self.bg(img, train, deterministic)
        B, H, W = img.shape[0], img.shape[1], img.shape[2]
        a_bg, a_fl = self.alpha_encode(
            img, train, deterministic,
            motion=jnp.zeros((B, H, W, 2), img.dtype),
            mask_rock=jnp.zeros((B, H, W, 1), img.dtype),
            bg_raw=bg,
        )
        ga = self.decode_alpha(fs, a_fl, train, deterministic, img=img)
        return fluid, bg, a_bg, ga


def slr_pack_splat_input(opt: Options, fs: Array, zn: Array,
                         alpha_fluid_logits: Array,
                         alpha_bg_sig: Array) -> Tuple[Array, bool]:
    """Packed splat tensor for the SLR model (forward_flow :963-976).

    Returns (packed, use_alpha0): with use_alpha0_as_blending_weight the
    layout is [fs·e^Z (64), af·e^C (1), e^C (1), e^Z (1)]; otherwise
    [fs·e^Z (64), af·e^Z (1), e^Z (1)].
    """
    ez = jnp.exp(zn)
    if opt.use_alpha0_as_blending_weight:
        a_fl_sig = jax.nn.sigmoid(alpha_fluid_logits)
        norm0 = jnp.maximum(a_fl_sig + alpha_bg_sig, 1e-8)
        comp = jnp.exp(a_fl_sig / norm0)
        return (
            jnp.concatenate(
                [fs * ez, alpha_fluid_logits * comp, comp, ez], axis=-1
            ),
            True,
        )
    return (
        jnp.concatenate([fs * ez, alpha_fluid_logits * ez, ez], axis=-1),
        False,
    )


def slr_unpack_splatted(g: Array, use_alpha0: bool
                        ) -> Tuple[Array, Array]:
    """Normalize a summed double-ended SLR splat (forward_flow :992-1045).

    Returns (gen_fs (…, 64), alpha_fluid_warped (…, 1))."""
    if use_alpha0:
        feats = g[..., :-3]
        af = g[..., -3:-2]
        a_norm = jnp.maximum(g[..., -2:-1], NORM_EPS)
        norm = jnp.maximum(g[..., -1:], NORM_EPS)
        return feats / norm, af / a_norm
    feats = g[..., :-2]
    af = g[..., -2:-1]
    norm = jnp.maximum(g[..., -1:], NORM_EPS)
    return feats / norm, af / norm


def slr_composite(gen_fluid_img: Array, gen_fluid_alpha_sig: Array,
                  alpha_bg_sig: Array, bg_img_tanh: Array,
                  alpha_region: Optional[Array] = None,
                  opt: Optional[Options] = None,
                  ga_raw: Optional[Array] = None,
                  a_bg_raw: Optional[Array] = None,
                  train_mode: bool = False) -> Tuple[Array, Array]:
    """Two-layer composite (forward_flow :1056-1088) with the reference's
    variants: use_alpha_softmax (softmax over the two RAW logits,
    :1066-1070), clamp_alpha (fluid weight floored at clamp_alpha —
    training pairs it with bg/norm (:646-651), inference with 1-cf
    (:1071-1075)), use_{fluid,bg}_alpha_only (alpha_norm=1, :1060-1063).

    Returns (gen_img, composite_fluid_alpha)."""
    if (opt is not None and opt.use_alpha_softmax > 0.0
            and ga_raw is not None and a_bg_raw is not None):
        w = jax.nn.softmax(jnp.concatenate([ga_raw, a_bg_raw], axis=-1),
                           axis=-1)
        comp = w[..., 0:1]
        gen = comp * gen_fluid_img + w[..., 1:2] * bg_img_tanh
    elif opt is not None and opt.clamp_alpha > 0.0:
        alpha_norm = jnp.maximum(gen_fluid_alpha_sig + alpha_bg_sig, 1e-8)
        comp = jnp.clip(gen_fluid_alpha_sig / alpha_norm,
                        opt.clamp_alpha, None)
        if train_mode:
            gen = (comp * gen_fluid_img
                   + (alpha_bg_sig / alpha_norm) * bg_img_tanh)
        else:
            gen = comp * gen_fluid_img + (1.0 - comp) * bg_img_tanh
    else:
        if opt is not None and (opt.use_fluid_alpha_only
                                or opt.use_bg_alpha_only):
            alpha_norm = jnp.ones_like(gen_fluid_alpha_sig)
        else:
            alpha_norm = jnp.maximum(gen_fluid_alpha_sig + alpha_bg_sig, 1e-8)
        gen = (gen_fluid_alpha_sig * gen_fluid_img
               + alpha_bg_sig * bg_img_tanh) / alpha_norm
        comp = gen_fluid_alpha_sig / alpha_norm
    if alpha_region is not None:
        gen = gen * alpha_region + gen_fluid_img * (1.0 - alpha_region)
    return gen, comp


class BackgroundModel(nn.Module):
    """Stage-2 background network trainer head (reference
    ``BackgroundNetwork``, 2layers file :1117-1234): net_bg trained to
    reproduce the temporal mean video."""

    opt: Options

    def setup(self):
        self.net_bg = ResNetBGDecoder(self.opt)

    def __call__(self, img: Array, train: bool = False,
                 deterministic: bool = True) -> Array:
        return jnp.tanh(self.net_bg(img, train, deterministic))

    def forward_train(self, batch, train: bool = True,
                      deterministic: bool = False):
        """(reference :1128-1225) — background from the start view, mean
        video as target (the trainer compares against batch['mean_video'])."""
        start_img = batch["images"][0]
        bg_f = jnp.tanh(self.net_bg(start_img, train, deterministic))
        pred = {"PredImg": bg_f, "OutputImg": batch["mean_video"]}
        return bg_f, pred


# ---------------------------------------------------------------------------
# Training
# ---------------------------------------------------------------------------

def smooth_l1(x: Array, y: Array, gamma: float = 0.1) -> Array:
    """Reference SmoothL1Loss (2layers file :63-65), elementwise."""
    t = jnp.abs(x - y)
    return t + gamma * (2.0 * jax.nn.sigmoid(5.0 * t) - 1.0)


def total_variation(img: Array) -> Array:
    """Reference total_variation_loss (:67-71). NHWC."""
    return (
        jnp.mean(jnp.abs(img[:, :, :-1, :] - img[:, :, 1:, :]))
        + jnp.mean(jnp.abs(img[:, :-1, :, :] - img[:, 1:, :, :]))
    )


class SLRTrainable(SLRModel):
    """(start, middle, end) training pass of the joint two-layer model
    (reference forward, 2layers file :256-809). Returns (gen_img, pred) where
    pred carries every tensor the SLR loss set needs."""

    train_max_steps: int = 60

    def forward_train(self, batch, train: bool = True,
                      deterministic: bool = False):
        from slrsfs_tpu.models.baseline import fold_uvm
        from slrsfs_tpu.ops import euler_integrate_phased

        opt = self.opt
        start_img, middle_img, end_img = batch["images"]
        idx = batch["index"]
        flow = fold_uvm(batch["motions"])
        mask_rock = batch["mask_rock"]  # (B, H, W, 1)
        mean_img = batch["mean_video"]
        B = flow.shape[0]

        # moving-region mask from motion speed (reference :334-344)
        speed = jnp.linalg.norm(flow, axis=-1, keepdims=True)
        small_motion_alpha = (
            speed < jnp.mean(speed, axis=(1, 2, 3), keepdims=True) * 0.1
        ).astype(flow.dtype)

        fs_s, z_f = self.encode(start_img, train, deterministic)
        fs_e, z_p = self.encode(end_img, train, deterministic)

        bg_raw = self.bg(start_img, train, deterministic)
        bg_tanh = jnp.tanh(bg_raw)

        # both views share the start view's motion/mask/bg extras (:375-385)
        extras = dict(motion=flow, mask_rock=mask_rock, bg_raw=bg_raw)
        out_f = self.alpha_encode_raw(start_img, train, deterministic,
                                      **extras)
        out_p = self.alpha_encode_raw(end_img, train, deterministic, **extras)
        a_bg_logits_f, a_fl_logits_f = split_alpha_output(opt, out_f)
        a_bg_logits_p, a_fl_logits_p = split_alpha_output(opt, out_p)
        a_bg_sig_f = jax.nn.sigmoid(a_bg_logits_f)

        # composite fluid alpha of frame 0 (reference :420-430)
        a_fl_sig_f = jax.nn.sigmoid(a_fl_logits_f)
        comp_i0 = a_fl_sig_f / jnp.maximum(a_fl_sig_f + a_bg_sig_f, 1e-8)
        if opt.use_fluid_alpha_only:
            comp_i0 = a_fl_sig_f
        if opt.use_bg_alpha_only:
            comp_i0 = a_bg_sig_f
        if opt.use_alpha_softmax > 0.0:
            comp_i0 = jax.nn.softmax(
                jnp.concatenate([a_fl_logits_f, a_bg_logits_f], axis=-1),
                axis=-1)[..., 0:1]

        t_f = (idx[:, 1] - idx[:, 0]).astype(jnp.int32)
        t_p = (idx[:, 2] + 1 - idx[:, 1]).astype(jnp.int32)
        T = self.train_max_steps
        # fused dual scan latching each sample's (t_f, t_p) displacement
        # (see BaselineTrainable.forward_train)
        # joint clip keeps the phased contract t_f + t_p <= T when a config
        # sets train_max_steps below end-start+1 (only toy test configs do;
        # the shipped T=60 bounds the dataset contract exactly)
        tf_c = jnp.clip(t_f, 0, T)
        tp_c = jnp.clip(t_p, 0, T - tf_c)
        from slrsfs_tpu.models.baseline import train_integrate

        flow_f, flow_p = train_integrate(batch, flow, tf_c, tp_c, T)

        # alpha follows the feature dtype so the bf16 training mode's
        # splat outputs are not promoted back to f32 by the blend
        alpha = jnp.clip(
            1.0
            - (idx[:, 1] - idx[:, 0]).astype(fs_s.dtype)
            / (idx[:, 2] - idx[:, 0] + 1).astype(fs_s.dtype),
            ALPHA_MIN, ALPHA_MAX,
        ).reshape(B, 1, 1, 1)

        z_f = z_for_splat(opt, fs_s, z_f)
        z_p = z_for_splat(opt, fs_e, z_p)
        zn_f = z_normalize(opt, z_f, flow_f)
        zn_p = z_normalize(opt, z_p, flow_p)

        # both ends share frame-0's composite alpha as blending weight
        # (reference :480-540)
        u_f, use_alpha0 = slr_pack_splat_input(
            opt, fs_s, zn_f, a_fl_logits_f, a_bg_sig_f)
        if use_alpha0:
            comp_exp = jnp.exp(comp_i0)
            u_p = jnp.concatenate(
                [fs_e * jnp.exp(zn_p), a_fl_logits_p * comp_exp, comp_exp,
                 jnp.exp(zn_p)], axis=-1)
        else:
            u_p = jnp.concatenate(
                [fs_e * jnp.exp(zn_p), a_fl_logits_p * jnp.exp(zn_p),
                 jnp.exp(zn_p)], axis=-1)

        g = (softsplat_sum(u_f, flow_f) * alpha
             + softsplat_sum(u_p, flow_p) * (1.0 - alpha))
        alpha_fluid_mask = jax.lax.stop_gradient(
            (g[..., -1:] > NORM_EPS).astype(g.dtype))
        gen_fs, alpha_fluid_warped = slr_unpack_splatted(g, use_alpha0)
        if "ff_mask" in batch:
            # SLR applies the occlusion mask AFTER normalization (:586-594)
            gen_fs = gen_fs * batch["ff_mask"]

        gen_fluid_img = self.decode_fluid(gen_fs, train, deterministic)
        ga_raw = self.decode_alpha(gen_fs, alpha_fluid_warped, train,
                                   deterministic, img=start_img)
        gen_fluid_alpha = jax.nn.sigmoid(ga_raw)

        gen_img, comp_alpha = slr_composite(
            gen_fluid_img, gen_fluid_alpha, a_bg_sig_f, bg_tanh,
            opt=opt, ga_raw=ga_raw, a_bg_raw=a_bg_logits_f, train_mode=True)

        # 3-way GT alpha (reference :619-621)
        moving = 1.0 - small_motion_alpha
        gt_alpha = (mask_rock * moving * 0.25
                    + (1.0 - mask_rock) * moving * 1.0
                    + small_motion_alpha * 0.5)

        pred = {
            "PredImg": gen_img,
            "OutputImg": middle_img,
            "BGImg_f": bg_tanh,
            "MeanImg": mean_img,
            "FluidImg": gen_fluid_img,
            "AlphaFluid_f": a_fl_sig_f,
            "AlphaBG_f": a_bg_sig_f,
            "AlphaFluidLogits_f": a_fl_logits_f,
            "CompositeFluidAlpha": comp_alpha,
            "CompositeFluidAlpha_I0": comp_i0,
            "AlphaFluidWarped": alpha_fluid_warped,
            "AlphaFluidMask": alpha_fluid_mask,
            "GenFluidAlphaRaw": ga_raw,
            "GTAlpha": gt_alpha,
            "SmallMotionAlpha": small_motion_alpha,
            "RockMask": mask_rock,
            "Z_f": zn_f,
            "GTMotion": flow,
        }
        if opt.AKLloss > 0.0:
            # clamped logsigma channel (:411-413); the KL term itself is
            # commented out in the reference (:609-615) so only the extra
            # encoder channel and this tensor are live
            pred["AlphaLogSigma"] = jnp.clip(out_p[..., 2:3], -50.0, 50.0)
        return gen_img, pred


def decayed_weight(base: float, decay: float, epoch) -> Array:
    """Per-epoch multiplicative loss-weight decay: the shipped stage-3
    drivers do ``w -= w / decay`` after every epoch
    (train_animating_..._L1.py:356-358, ..._MSE.py:356-357), i.e.
    w(e) = w0 · (1 − 1/decay)^e."""
    return base * jnp.power(1.0 - 1.0 / decay, epoch)


def slr_extra_losses(opt: Options, pred: Dict[str, Array],
                     synth_loss_fn=None,
                     rock_weight: Optional[Array] = None,
                     epoch: Optional[Array] = None) -> Dict[str, Array]:
    """The SLR loss set on top of the synthesis loss (reference :658-765).

    rock_weight: optionally overrides opt.RockRegionloss. epoch (a traced
    scalar from the trainer) drives the per-epoch RockRegion/FluidRegion
    decay (opt.RockRegionlossDecay) and AlphaMSE decay (opt.AlphaWeightDecay)
    of the shipped stage-3 drivers. Returns dict including 'Total Extra'.
    """
    out: Dict[str, Array] = {}
    total = 0.0
    small = pred["SmallMotionAlpha"]
    moving = 1.0 - small
    rock = pred["RockMask"]
    comp_i0 = pred["CompositeFluidAlpha_I0"]
    gt_alpha = pred["GTAlpha"]

    alpha_mse_w: Array = opt.AlphaMSEloss
    fluid_w: Array = opt.FluidRegionloss
    rock_decay_on = epoch is not None and opt.RockRegionlossDecay > 0.0
    if epoch is not None and opt.AlphaWeightDecay > 0.0:
        alpha_mse_w = decayed_weight(opt.AlphaMSEloss, opt.AlphaWeightDecay,
                                     epoch)
    if rock_decay_on:
        fluid_w = decayed_weight(opt.FluidRegionloss, opt.RockRegionlossDecay,
                                 epoch)

    if opt.AlphaMSEloss > 0.0:
        v = jnp.mean(jnp.square(comp_i0 * moving - gt_alpha * moving))
        out["AlphaMSEloss"] = v
        total = total + v * alpha_mse_w
    if opt.AlphaL1loss > 0.0:
        v = jnp.mean(smooth_l1(comp_i0 * moving, gt_alpha * moving))
        out["AlphaL1loss"] = v
        total = total + v * opt.AlphaL1loss
    if opt.ATVloss > 0.0:
        v = (total_variation(pred["AlphaFluidLogits_f"])
             + total_variation(pred["AlphaBG_f"]))
        out["AlphaTV"] = v
        total = total + v * opt.ATVloss
    if opt.MVloss > 0.0 and synth_loss_fn is not None:
        bg_losses = synth_loss_fn(pred["BGImg_f"], pred["MeanImg"])
        for k, v in bg_losses.items():
            if "Perceptual" in k or "L1" in k:
                out[k + "_bg"] = v
        total = total + bg_losses["Total Loss"] * opt.MVloss
    if opt.FluidRegionloss > 0.0:
        m = (1.0 - rock) * moving
        v = jnp.mean(smooth_l1(comp_i0 * m, jnp.ones_like(comp_i0) * m))
        out["FluidRegionLoss"] = v
        total = total + v * fluid_w
    rw = opt.RockRegionloss if rock_weight is None else rock_weight
    if rock_weight is None and rock_decay_on:
        rw = decayed_weight(opt.RockRegionloss, opt.RockRegionlossDecay, epoch)
    if (rock_weight is not None) or opt.RockRegionloss > 0.0:
        m = rock * moving
        v = jnp.mean(
            smooth_l1(comp_i0 * m, opt.RockRegionlosstarget * jnp.ones_like(comp_i0) * m)
        )
        out["RockRegionLoss"] = v
        total = total + v * rw
    if opt.ADCloss > 0.0:
        m = pred["AlphaFluidMask"]
        v = jnp.mean(smooth_l1(
            jax.lax.stop_gradient(pred["AlphaFluidWarped"]) * m,
            pred["GenFluidAlphaRaw"] * m))
        out["Alpha Decoder Consistency Loss"] = v
        total = total + v * opt.ADCloss
    if opt.MRADCloss > 0.0:
        m = pred["AlphaFluidMask"]
        v = jnp.mean(smooth_l1(
            jax.lax.stop_gradient(pred["AlphaFluidWarped"]) * m,
            pred["GenFluidAlphaRaw"] * m) * moving)
        out["Moving Region Alpha Decoder Consistency Loss"] = v
        total = total + v * opt.MRADCloss
    out["Total Extra"] = total
    return out
