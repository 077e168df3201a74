"""Single-layer animating model (encoder → symmetric double-ended softmax
splat → partial-conv decoder).

Fresh TPU-native equivalent of reference
``models/animating_softmax_splating.py`` (AnimatingSoftmaxSplating):

* ``encode``     — ResNetEncoder_with_Z on the input image (reference :483-487)
* ``z_norm``     — the Z normalization variants (reference :593-605):
                   v2 = Z - maxwarpnorm(Z, flow); v1 = Z; v3 = 20·sigmoid(Z);
                   default = Z - Z.max(); then clamp to ±20 unless no_clamp_Z
* ``splat_pair`` — manual softmax splat: pack [fs·e^Z·α, e^Z·α], summation
                   splat from both temporal ends, add, divide by the clamped
                   last channel (reference :606-692)
* ``decode``     — pconv ResNet decoder + Tanh (reference :739-744)
* ``forward_train`` — the (start, middle, end) training pass (reference
                   forward, :445-775)

The inference rollout lives in ``engine/rollout.py`` and reuses these pieces;
like reference ``forward_flow`` (:777-981) it feeds the *start* features to
both splat ends.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from slrsfs_tpu.config import Options
from slrsfs_tpu.nn.resnets import ResNetDecoderPconv2, ResNetEncoderWithZ
from slrsfs_tpu.ops import maximum_warp_norm_splat, softsplat_sum

Array = jax.Array

NORM_EPS = 1e-8  # reference animating_softmax_splating.py:691


class BaselineModel(nn.Module):
    opt: Options

    def setup(self):
        self.encoder = ResNetEncoderWithZ(self.opt, in_channels=3)
        self.projector = ResNetDecoderPconv2(self.opt)

    # ---- pieces --------------------------------------------------------

    def encode(self, img: Array, train: bool = False,
               deterministic: bool = True) -> Tuple[Array, Array]:
        """img (B, W, W, 3) → (features (B, W, W, 64), Z (B, W, W, 1))."""
        fs, z = self.encoder(img, train, deterministic)
        if "relu" in self.opt.Z_model:
            z = jax.nn.relu(z)
        return fs, z

    def decode(self, gen_fs: Array, train: bool = False,
               deterministic: bool = True) -> Array:
        return jnp.tanh(self.projector(gen_fs, train, deterministic))

    def __call__(self, img: Array, train: bool = False,
                 deterministic: bool = True):
        """Parameter-shaping pass (init): encode + decode."""
        fs, z = self.encode(img, train, deterministic)
        return self.decode(fs, train, deterministic), z


def z_normalize(opt: Options, z: Array, flow: Optional[Array]) -> Array:
    """Reference Z-norm variants (animating_softmax_splating.py:593-605).

    z: (B, W, W, 1); flow: (B, W, W, 2), needed only for the v2 variant.
    """
    if opt.use_softmax_splatter_v2:
        z_max = maximum_warp_norm_splat(z, flow)
        zn = z - z_max
    elif opt.use_softmax_splatter_v1:
        zn = z
    elif opt.use_softmax_splatter_v3:
        zn = jax.nn.sigmoid(z) * 20.0
    else:
        zn = z - jnp.max(z)
    if not opt.no_clamp_Z:
        zn = jnp.clip(zn, -20.0, 20.0)
    return zn


def pack_splat_input(fs: Array, z_norm: Array) -> Array:
    """[fs·e^Z, e^Z]: the packed tensor whose summation splat implements
    softmax splatting after normalization (reference :606,628-634).

    The per-frame temporal weight α is a scalar; since the splat is linear it
    is applied *after* splatting (exact algebraic identity with the reference,
    which packs fs·e^Z·α)."""
    ez = jnp.exp(z_norm).astype(fs.dtype)  # zn may be f32 (f32 flow path)
    return jnp.concatenate([fs * ez, ez], axis=-1)


def splat_blend(u_f: Array, flow_f: Array, alpha,
                u_p: Array, flow_p: Array) -> Array:
    """Double-ended splat + joint normalization (reference :606-692).

    u_f/u_p: packed [fs·e^Z, e^Z] (B, W, W, C+1); alpha scalar or (B,1,1,1).
    Returns normalized features (B, W, W, C).
    """
    g_f = softsplat_sum(u_f, flow_f) * alpha
    g_p = softsplat_sum(u_p, flow_p) * (1.0 - alpha)
    g = g_f + g_p
    norm = jnp.maximum(g[..., -1:], NORM_EPS)
    return g[..., :-1] / norm


def z_for_splat(opt: Options, fs: Array, z: Array) -> Array:
    """train_Z gate: without it Z is all-ones (reference :588-590)."""
    if opt.train_Z:
        return z
    return jnp.ones_like(fs[..., :1])


def fold_uvm(motion: Array) -> Array:
    """uv·m 3-channel motion → 2-channel flow (reference
    animating_softmax_splating.py:524-543): uvm motion regressors emit unit
    direction (u, v) plus magnitude m; the dense flow is uv·m. 2-channel
    motion passes through unchanged."""
    if motion.shape[-1] == 3:
        return motion[..., :2] * motion[..., 2:3]
    return motion


def train_integrate(batch, flow, tf_c, tp_c, T: int):
    """vmapped phase-switched training integration; rides the compact
    moving-set scan when the batch carries ``mov_pos`` (B, P, 2) int32 /
    ``mov_valid`` (B, P) (host-side bucketed moving sets, cli/train.py) —
    P sequential-gather rows per step instead of H·W, exact under the
    zero-motion invariant."""
    from slrsfs_tpu.ops import (
        euler_integrate_phased,
        euler_integrate_phased_compact,
    )

    if "mov_pos" in batch:
        return jax.vmap(
            lambda m, p, v, tf, tp: euler_integrate_phased_compact(
                m, p, v, tf, tp, T)
        )(flow, batch["mov_pos"], batch["mov_valid"], tf_c, tp_c)
    return jax.vmap(
        lambda m, tf, tp: euler_integrate_phased(m, tf, tp, T)
    )(flow, tf_c, tp_c)


class BaselineTrainable(BaselineModel):
    """Adds the (start, middle, end) training pass (reference
    ``AnimatingSoftmaxSplating.forward``, animating_softmax_splating.py:445-775).

    Per-sample integration step counts are data-dependent; the TPU-native
    formulation runs ONE phase-switched ``lax.scan`` of ``train_max_steps``
    single-gather steps per sample (forward to t_f, reset, backward to t_p —
    their sum is bounded by end−start+1 ≤ N) and latches each sample's
    displacement at step equality. Identical math to indexing the full
    per-step stack, at half the gather rows and none of the stack
    materialization."""

    train_max_steps: int = 60

    def forward_train(self, batch, train: bool = True,
                      deterministic: bool = False):
        from slrsfs_tpu.ops import euler_integrate_phased

        opt = self.opt
        start_img, middle_img, end_img = batch["images"]
        idx = batch["index"]  # (B, 3) int32
        flow = fold_uvm(batch["motions"])  # (B, H, W, 2)
        B = flow.shape[0]

        fs_s, z_f = self.encode(start_img, train, deterministic)
        fs_e, z_p = self.encode(end_img, train, deterministic)

        t_f = (idx[:, 1] - idx[:, 0]).astype(jnp.int32)
        t_p = (idx[:, 2] + 1 - idx[:, 1]).astype(jnp.int32)

        T = self.train_max_steps
        # phase-switched scan latching each sample's (t_f, t_p) displacement
        # — half the gather rows of two stacked scans and no (T+1, H, W, 2)
        # stacks (~46 % of the train step was this integration)
        # joint clip keeps the phased contract t_f + t_p <= T when a config
        # sets train_max_steps below end-start+1 (only toy test configs do;
        # the shipped T=60 bounds the dataset contract exactly)
        tf_c = jnp.clip(t_f, 0, T)
        tp_c = jnp.clip(t_p, 0, T - tf_c)
        flow_f, flow_p = train_integrate(batch, flow, tf_c, tp_c, T)

        # alpha follows the feature dtype so the bf16 training mode's splat
        # outputs are not promoted back to f32 by the blend
        alpha = (
            1.0
            - (idx[:, 1] - idx[:, 0]).astype(fs_s.dtype)
            / (idx[:, 2] - idx[:, 0] + 1).astype(fs_s.dtype)
        ).reshape(B, 1, 1, 1)

        z_f = z_for_splat(opt, fs_s, z_f)
        z_p = z_for_splat(opt, fs_e, z_p)
        # training normalizes each end with its own flow (reference :593-650)
        zn_f = z_normalize(opt, z_f, flow_f)
        zn_p = z_normalize(opt, z_p, flow_p)

        g_f = softsplat_sum(pack_splat_input(fs_s, zn_f), flow_f) * alpha
        g_p = softsplat_sum(pack_splat_input(fs_e, zn_p), flow_p) * (1.0 - alpha)
        g = g_f + g_p
        norm = g[..., -1:]
        feats = g[..., :-1]
        if "ff_mask" in batch:
            # free-form occlusion augmentation: mask features, not the
            # normalizer (reference :680-692)
            feats = feats * batch["ff_mask"]
        gen_fs = feats / jnp.maximum(norm, NORM_EPS)

        gen_img = self.decode(gen_fs, train, deterministic)
        pred = {
            "PredImg": gen_img,
            "OutputImg": middle_img,
            "Z_f": zn_f,
            "GTMotion": flow,
        }
        return gen_img, pred


class BaselineMotionTrainable(BaselineTrainable):
    """Baseline with an embedded motion regressor (reference
    ``train_motion`` branches, animating_softmax_splating.py:514-536):
    the splatting flow comes from the regressor instead of GT, and motion
    losses join the total. Used by the fix-motion finetune and
    joint-IGAN-only stages (train_animating_fixmotion.py /
    train_animating_motion_IGANonly.py); with ``opt.freeze_motion`` the
    trainer zeroes the regressor's updates."""

    def setup(self):
        super().setup()
        from slrsfs_tpu.models.motion import MotionRegressor

        self.motion_regressor = MotionRegressor(self.opt)

    def forward_train(self, batch, train: bool = True,
                      deterministic: bool = False):
        from slrsfs_tpu.models.motion import moving_region_mask

        gt_motion = batch["motions"]
        mask = moving_region_mask(gt_motion)
        pred_scaled = self.motion_regressor.predict(
            batch["images"][0], mask, batch.get("hints"), train)
        if self.opt.freeze_motion:
            pred_scaled = jax.lax.stop_gradient(pred_scaled)
        # train at motionW, splat at W (reference :534-535)
        scale = jnp.asarray(
            [self.opt.W / self.opt.motionW, self.opt.W / self.opt.motionH],
            pred_scaled.dtype)
        batch = dict(batch)
        batch["motions"] = pred_scaled * scale
        # predicted motion is dense — the GT-derived moving set no longer
        # bounds the trajectories, so force the dense integration path
        batch.pop("mov_pos", None)
        batch.pop("mov_valid", None)
        gen_img, pred = super().forward_train(batch, train, deterministic)
        pred["PredMotion"] = pred_scaled
        pred["GTMotionRaw"] = gt_motion
        return gen_img, pred


def baseline_motion_extra_losses(opt, pred, synth_loss_fn=None, epoch=None):
    """Motion losses joining the fluid total (reference :748-754)."""
    from slrsfs_tpu.losses.synthesis import MotionLoss

    ml = MotionLoss(opt.motion_losses)(pred["PredMotion"], pred["GTMotionRaw"])
    out = {k: v for k, v in ml.items() if k != "Total Loss"}
    out["Total Extra"] = (
        jnp.zeros(()) if opt.freeze_motion else ml["Total Loss"]
    )
    return out
