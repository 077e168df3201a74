"""Two-optimizer GAN trainer (optax), data-parallel via pjit over a 1-D mesh.

Reference semantics (``models/base_model.py:9-163``): Adam(lr_g, betas=(0,
0.9)) for the generator, Adam(lr_d) for the discriminator; one generator step
(synthesis loss + GAN-G loss) followed by one discriminator step on the same
fake images (detached); linear LR decay after ``niter`` epochs
(base_model.py:80-93).

TPU-native distribution: the batch is sharded over the mesh's 'data' axis and
parameters are replicated. Because BN statistics are plain ``jnp.mean``
reductions on globally-sharded arrays, XLA inserts the cross-chip all-reduce
automatically — this IS the reference's SyncBN
(models/networks/sync_batchnorm/), with zero custom collectives. Spectral
power iteration runs once per D step (the reference's in-place torch buffers
update on every D forward; we skip the extra G-step update — training-dynamics
-only difference, documented).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from slrsfs_tpu.config import Options
from slrsfs_tpu.losses.gan import discriminator_losses, generator_gan_losses
from slrsfs_tpu.losses.synthesis import SynthesisLoss
from slrsfs_tpu.nn.discriminators import MultiscaleDiscriminator
from slrsfs_tpu.nn.vgg import VGG19Features


class TrainState(struct.PyTreeNode):
    step: jax.Array
    g_params: Any
    g_stats: Any
    g_spectral: Any
    d_params: Any
    d_spectral: Any
    opt_g: Any
    opt_d: Any


def make_lr_schedule(base_lr: float, niter: int, niter_decay: int,
                     steps_per_epoch: int):
    """Linear decay from base_lr to 0 over the decay epochs
    (reference base_model.py:80-93 / train options niter/niter_decay)."""

    def schedule(step):
        epoch = step / steps_per_epoch
        frac = jnp.clip((epoch - niter) / max(niter_decay, 1), 0.0, 1.0)
        return base_lr * (1.0 - frac)

    return schedule


class Trainer:
    def __init__(self, opt: Options, model, steps_per_epoch: int = 500,
                 extra_losses_fn=None, task: str = "synthesis"):
        """extra_losses_fn(opt, pred, synth_loss_fn, epoch=<traced scalar>)
        -> dict with 'Total Extra' — model-specific losses beyond
        synthesis+GAN (the SLR alpha/background set lives in
        models/slr.py:slr_extra_losses). epoch = step // steps_per_epoch
        drives the per-epoch loss-weight decays of the stage-3 drivers.

        task: 'synthesis' (baseline/SLR: recon target = middle image),
        'bg' (stage 2: target = mean video, reference base_model_bg.py),
        'motion' (motion GAN: MotionLoss vs GT motion, 2-channel D,
        reference base_model_motion.py)."""
        self.opt = opt
        self.model = model
        self.steps_per_epoch = steps_per_epoch
        self.extra_losses_fn = extra_losses_fn
        self.task = task
        if opt.discriminator_losses == "pix2pixHDorigin":
            # reference gan_loss.py:127-144: instance-norm pix2pixHD D,
            # ndf=64, n_layers=3, num_D=2, no intermediate features
            from slrsfs_tpu.nn.pix2pixhd import OriginMultiscaleDiscriminator

            self.d_model = OriginMultiscaleDiscriminator(
                ndf=64, n_layers=3, num_D=2)
        else:
            self.d_model = MultiscaleDiscriminator(opt)
        self.vgg = VGG19Features()
        self.vgg_vars = None  # set via load_vgg / init_vgg
        sched_g = make_lr_schedule(opt.lr_g, opt.niter, opt.niter_decay,
                                   steps_per_epoch)
        sched_d = make_lr_schedule(opt.lr_d, opt.niter, opt.niter_decay,
                                   steps_per_epoch)
        self.tx_g = optax.adam(sched_g, b1=opt.beta1, b2=opt.beta2)
        if getattr(opt, "freeze_motion", False):
            # fix-motion finetune: freeze the embedded motion regressor
            # (reference train_animating_fixmotion.py:448-450)
            def label(params):
                return {k: ("freeze" if k == "motion_regressor" else "train")
                        for k in params}

            self.tx_g = optax.multi_transform(
                {"train": self.tx_g, "freeze": optax.set_to_zero()}, label)
        self.tx_d = optax.adam(sched_d, b1=opt.beta1, b2=opt.beta2)
        self.use_discriminator = opt.discriminator_losses != "0"

    # ---- initialization --------------------------------------------------

    def init_vgg(self, rng):
        img = jnp.zeros((1, 32, 32, 3), jnp.float32)
        self.vgg_vars = jax.jit(
            lambda r: self.vgg.init(r, img))(rng)

    def load_vgg(self, vgg_vars):
        self.vgg_vars = vgg_vars

    def init_state(self, rng, example_batch) -> TrainState:
        r1, r2, r3, r4 = jax.random.split(rng, 4)

        # Jitted init: flax's Module.init otherwise executes eagerly,
        # op-by-op — ~100x slower over the axon tunnel and ~10 s of host
        # dispatch per trainer even on CPU (the persistent compile cache
        # makes the jitted version ~free on re-runs).
        @jax.jit
        def _init(r1, r2, r3, batch):
            g_vars = self.model.init(
                {"params": r1, "noise": r2},
                batch, True, False, method=self.model.forward_train,
            )
            d_vars = self.d_model.init(
                {"params": r3}, self._target(batch), True
            )
            return g_vars, d_vars

        g_vars, d_vars = _init(r1, r2, r3, example_batch)
        if self.vgg_vars is None and self.task != "motion":
            # the motion task's recon loss is MotionLoss (EPE/L1 on flow),
            # never the VGG perceptual — skip the VGG init trace entirely
            self.init_vgg(r4)
        return TrainState(
            step=jnp.zeros((), jnp.int32),
            g_params=g_vars["params"],
            g_stats=g_vars.get("batch_stats", {}),
            g_spectral=g_vars.get("spectral", {}),
            d_params=d_vars["params"],
            d_spectral=d_vars.get("spectral", {}),
            opt_g=self.tx_g.init(g_vars["params"]),
            opt_d=self.tx_d.init(d_vars["params"]),
        )

    # ---- the step ---------------------------------------------------------

    def _recon_losses(self, gen, target):
        if self.task == "motion":
            from slrsfs_tpu.losses.synthesis import MotionLoss, psnr

            out = MotionLoss(self.opt.motion_losses)(gen, target)
            out["PSNR_motion"] = psnr(gen, target)
            return out
        synth = SynthesisLoss(self.opt.losses, self.vgg, self.vgg_vars)
        losses = synth(gen, target)
        if self.task == "bg":
            # stage-2: Total is the MV-weighted synthesis loss
            # (reference 2layers BackgroundNetwork :1196-1203)
            losses = {**{k + "_bg": v for k, v in losses.items()
                         if "Perceptual" in k or "L1" in k},
                      "Total Loss": losses["Total Loss"] * self.opt.MVloss,
                      "psnr": losses["psnr"], "ssim": losses["ssim"]}
        return losses

    def _target(self, batch):
        if self.task == "bg":
            return batch["mean_video"]
        if self.task == "motion":
            return batch["motions"]
        return batch["images"][1]

    def make_train_step(self, accum: int = 1):
        """One optimizer step. With ``accum > 1`` (reference
        ``num_accumulations``, base_model.py:95-163) the step takes a LIST of
        ``accum`` micro-batches: generator and discriminator gradients are
        each accumulated across the micro-batches — BN/spectral mutables
        carry sequentially exactly like the reference's per-call in-place
        torch buffers — and each optimizer applies once.

        Gradient scale follows ``opt.accum_scale``: 'mean' (default) weights
        each micro-batch 1/accum; 'reference' reproduces the reference's
        literal semantics — every micro-batch loss divided by
        weight = 1/num_steps (base_model.py:106,129-133), i.e. summed
        gradients x accum = accum^2 x the mean. Logged losses are
        per-micro-batch means in BOTH modes."""
        opt = self.opt
        synth = SynthesisLoss(opt.losses, self.vgg, self.vgg_vars)
        model, d_model = self.model, self.d_model
        tx_g, tx_d = self.tx_g, self.tx_d
        use_d = self.use_discriminator

        # Opt-in mixed precision (opt.train_compute_dtype='bfloat16'): the G
        # forward/backward runs in bf16 — params/stats/spectral and float
        # batch fields cast at the loss-fn boundary, exactly like the
        # inference speed mode (engine/rollout.py:_cast_for_compute) — while
        # master params, Adam state, losses (which promote to f32 against
        # the f32 target/VGG), and the stored mutable state stay f32. The
        # cast sits inside the grad closure, so d(cast)/d(param) hands f32
        # gradients to the optimizer.
        cd = (jnp.bfloat16 if opt.train_compute_dtype == "bfloat16" else None)

        def _cast(tree, dtype):
            if cd is None:
                return tree
            return jax.tree.map(
                lambda a: a.astype(dtype)
                if jnp.issubdtype(a.dtype, jnp.floating) else a, tree)

        def g_value_grad(g_params, g_stats, g_spectral, d_params, d_spectral,
                         batch, rng, step):
            middle = self._target(batch)
            # 'motions' stays f32: Euler integration iterates pixel
            # COORDINATES through the flow field, and bf16's 8-bit mantissa
            # quantizes coordinates >= 128 to whole pixels at the shipped
            # W=256 — the inference speed mode makes the same exception
            # (engine/rollout.py:_cast_for_compute casts params+img only)
            batch_c = {k: (v if k == "motions" else _cast(v, cd))
                       for k, v in batch.items()}

            def g_loss_fn(gp):
                g_vars = {
                    "params": _cast(gp, cd),
                    "batch_stats": _cast(g_stats, cd),
                    "spectral": _cast(g_spectral, cd),
                }
                (gen_img, pred), ups = model.apply(
                    g_vars, batch_c, True, False,
                    method=model.forward_train,
                    mutable=["batch_stats", "spectral"],
                    rngs={"noise": rng},
                )
                ups = _cast(ups, jnp.float32)
                # losses (VGG, D, recon vs f32 targets) run in f32; the
                # cast's VJP hands bf16 cotangents back to the model bwd
                gen_img, pred = _cast((gen_img, pred), jnp.float32)
                t_losses = self._recon_losses(gen_img, middle)
                total = t_losses["Total Loss"]
                logs = dict(t_losses)
                if self.extra_losses_fn is not None:
                    extra = self.extra_losses_fn(
                        opt, pred, synth,
                        epoch=step // self.steps_per_epoch)
                    total = total + extra.pop("Total Extra")
                    logs.update(extra)
                if use_d:
                    d_vars = {"params": d_params, "spectral": d_spectral}
                    g_gan = generator_gan_losses(
                        d_model, d_vars, gen_img, middle,
                        opt.gan_mode, opt.lambda_feat, train=False,
                    )
                    total = total + g_gan["Total Loss"]
                    logs.update({k: v for k, v in g_gan.items()
                                 if k != "Total Loss"})
                logs["Total Loss"] = total
                return total, (ups, logs, gen_img)

            (_, aux), grads = jax.value_and_grad(
                g_loss_fn, has_aux=True)(g_params)
            return grads, aux, middle

        def d_value_grad(d_params, d_spectral, gen_img, middle):
            def d_loss_fn(dp):
                d_vars = {"params": dp, "spectral": d_spectral}
                both = jnp.concatenate(
                    [jax.lax.stop_gradient(gen_img), middle], axis=0
                )
                out, d_ups = d_model.apply(
                    d_vars, both, True, mutable=["spectral"]
                )
                b = gen_img.shape[0]
                pred_fake = [[t[:b] for t in s] for s in out]
                pred_real = [[t[b:] for t in s] for s in out]
                from slrsfs_tpu.losses.gan import gan_loss

                d_fake = gan_loss(pred_fake, False, True, opt.gan_mode)
                d_real = gan_loss(pred_real, True, True, opt.gan_mode)
                return d_fake + d_real, (d_ups, {"D_Fake": d_fake,
                                                 "D_real": d_real})

            (_, (d_ups, d_logs)), d_grads = jax.value_and_grad(
                d_loss_fn, has_aux=True)(d_params)
            return d_grads, d_ups, d_logs

        def train_step(state: TrainState, batch, rng
                       ) -> Tuple[TrainState, Dict[str, jax.Array]]:
            micro = batch if isinstance(batch, (list, tuple)) else [batch]
            assert len(micro) == accum, (len(micro), accum)
            w = (float(accum) if opt.accum_scale == "reference"
                 else 1.0 / float(accum))
            w_log = 1.0 / float(accum)
            # accum == 1 keeps the exact single-step noise stream
            rngs = [rng] if accum == 1 else list(jax.random.split(rng, accum))

            g_stats, g_spectral = state.g_stats, state.g_spectral
            d_spectral = state.d_spectral
            g_sum = d_sum = None
            logs: Dict = {}
            for j, b in enumerate(micro):  # unrolled; accum is small+static
                g_grads, (g_ups, l, gen_img), middle = g_value_grad(
                    state.g_params, g_stats, g_spectral,
                    state.d_params, d_spectral, b, rngs[j], state.step)
                g_stats = g_ups.get("batch_stats", g_stats)
                g_spectral = g_ups.get("spectral", g_spectral)
                if use_d:
                    d_grads, d_ups, d_logs = d_value_grad(
                        state.d_params, d_spectral, gen_img, middle)
                    d_spectral = d_ups.get("spectral", d_spectral)
                    l.update(d_logs)
                    d_sum = d_grads if d_sum is None else jax.tree.map(
                        jnp.add, d_sum, d_grads)
                g_sum = g_grads if g_sum is None else jax.tree.map(
                    jnp.add, g_sum, g_grads)
                logs = l if not logs else {k: logs[k] + l[k] for k in logs}

            g_sum = jax.tree.map(lambda g: g * w, g_sum)
            logs = {k: v * w_log for k, v in logs.items()}
            g_updates, new_opt_g = tx_g.update(g_sum, state.opt_g,
                                               state.g_params)
            new_g_params = optax.apply_updates(state.g_params, g_updates)

            new_d_params, new_opt_d = state.d_params, state.opt_d
            if use_d:
                d_sum = jax.tree.map(lambda g: g * w, d_sum)
                d_updates, new_opt_d = tx_d.update(d_sum, state.opt_d,
                                                   state.d_params)
                new_d_params = optax.apply_updates(state.d_params, d_updates)

            new_state = state.replace(
                step=state.step + 1,
                g_params=new_g_params,
                g_stats=g_stats,
                g_spectral=g_spectral,
                d_params=new_d_params,
                d_spectral=d_spectral,
                opt_g=new_opt_g,
                opt_d=new_opt_d,
            )
            return new_state, logs

        return train_step

    def make_eval_step(self):
        """Validation forward (reference base_model.py:106-116)."""
        model = self.model

        def eval_step(state: TrainState, batch, rng):
            g_vars = {
                "params": state.g_params,
                "batch_stats": state.g_stats,
                "spectral": state.g_spectral,
            }
            gen_img, pred = model.apply(
                g_vars, batch, False, False,
                method=model.forward_train, rngs={"noise": rng},
            )
            return self._recon_losses(gen_img, self._target(batch)), pred

        return eval_step
