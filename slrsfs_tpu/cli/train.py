"""Training driver.

Equivalent of reference ``train_animating.py`` (+ the BG/SLR stage variants):
epochs of ≤``steps_per_epoch`` iterations, validation each epoch on the val
split, tensorboard scalars + image grids, best-checkpoint tracking on the
validation Perceptual loss (train_animating.py:350-357), atomic checkpoints
via orbax, and SLURM-style preemption handling (SIGUSR1 sets a flag polled
every iteration; the driver checkpoints and requeues —
train_animating.py:27-83).

    python -m slrsfs_tpu.cli.train --data-root DATA --out RUNDIR \
        --model-type softmax_splating [--slr-stage3] ...
"""

from __future__ import annotations

import argparse
import os
import signal
import subprocess
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

_SIGNAL_RECEIVED = False


def _handle_preempt(signum, frame):
    global _SIGNAL_RECEIVED
    _SIGNAL_RECEIVED = True
    print("preemption signal received; will checkpoint and requeue",
          file=sys.stderr)


def trigger_job_requeue():
    """scontrol requeue $SLURM_JOB_ID (reference train_animating.py:49-75)."""
    job_id = os.environ.get("SLURM_JOB_ID")
    if job_id and os.environ.get("SLURM_PROCID", "0") == "0":
        subprocess.run(["scontrol", "requeue", job_id], check=False)


def _to_device_batch(batch):
    out = {}
    for k, v in batch.items():
        if k == "images":
            out[k] = [jnp.asarray(x) for x in v]
        elif k == "isval":
            continue
        else:
            out[k] = jnp.asarray(v)
    return out


def attach_moving_sets(batch, max_frac: float = 0.5, state=None,
                       eps: float = 0.0, n_steps: int = None):
    """Host-side moving-pixel sets for the compact training integration
    (models/baseline.py:train_integrate).

    Adds ``mov_pos`` (B, P, 2) int32 [x, y] / ``mov_valid`` (B, P) float32
    with P a geometric ×1.25 bucket. Returns the batch unchanged when the
    largest sample's moving fraction exceeds ``max_frac`` — there the
    dense phased scan is no slower and needs no scatter-back.

    ``eps`` > 0 zeroes sub-threshold motion first (same error-bounded
    sparsifier as the render CLI: a zeroed pixel with speed s drifts
    <= T·s px over the T-step integration, so eps = 0.5/T bounds every
    zeroed trajectory at half a pixel). Training data is ESTIMATED dense
    flow — nowhere exactly zero — so without it the compact path never
    engages (>50 % "moving") and integration stays ~33 % of the step.
    One-step loss parity vs the unsparsified batch is pinned by
    tests/test_trainer.py:test_train_sparsify_eps_loss_parity.

    ``state`` (a dict the caller keeps across batches) makes the decision
    STICKY for a run: the first batch picks sparse-vs-dense and the P
    bucket only ever grows. Without it, data hovering around ``max_frac``
    would alternate batch structures and recompile the full G+D train-step
    graph per combination (each compile is minutes on a cold cache); with
    it the step retraces at most log(H·W/1024)/log(1.25) times (in
    practice a run crosses 1-3 buckets)."""
    m = np.asarray(batch["motions"])
    flow = m[..., :2] * m[..., 2:3] if m.shape[-1] == 3 else m  # uv·m fold
    if eps > 0.0:
        speed = np.sqrt(flow[..., 0] ** 2 + flow[..., 1] ** 2)
        sub = speed < eps
        if sub.any():
            zeroed = sub & (speed > 0)
            if zeroed.any() and not (state or {}).get("eps_logged"):
                # once per run: mirror the render CLI's sparsify print so a
                # training run signals that its GT motion was modified
                T = n_steps if n_steps else round(0.5 / eps)
                print(f"train sparsify eps={eps:g}: zeroed "
                      f"{zeroed.mean():.1%} of pixels (max trajectory drift "
                      f"{speed[zeroed].max() * T:.2f}px over the "
                      f"{T}-step integration)", flush=True)
                if state is not None:
                    state["eps_logged"] = True
            m = np.where(sub[..., None], 0.0, m).astype(m.dtype)
            flow = np.where(sub[..., None], 0.0, flow)
            batch = dict(batch)
            batch["motions"] = m
    moving = np.any(flow != 0.0, axis=-1)  # (B, H, W)
    B, H, W = moving.shape
    counts = moving.reshape(B, -1).sum(1)
    need = int(counts.max())
    if state is not None and "mode" not in state:
        state["mode"] = ("dense" if need > max_frac * H * W else "sparse")
    if state is not None:
        if state["mode"] == "dense":
            return batch
        # sticky sparse: oversized batches ride the compact path at full
        # capacity (cost ≈ dense scan + scatter-back; no structure flip)
    elif need > max_frac * H * W:
        return batch
    # geometric ×1.25 bucket (shared with the inference moving-set prep):
    # the integration scan is row-count-bound (~17 ns/row, GAPS.md), so a
    # power-of-two series wastes up to 2× rows — at the 30 %-moving
    # estimated-data shape (need 19661 at W=256) it pays P=32768 where the
    # 1.25-series pays 20480, ~140 ms of the train step. Worst-case
    # retraces per run stay bounded: the sticky P only ever grows through
    # O(log(H·W/1024)/log(1.25)) buckets.
    from slrsfs_tpu.engine.rollout import geometric_bucket

    P = max(geometric_bucket(need, 1024, 1.25, H * W),
            state.get("P", 0) if state is not None else 0)
    if state is not None:
        state["P"] = P
    pos = np.zeros((B, P, 2), np.int32)
    val = np.zeros((B, P), np.float32)
    for b in range(B):
        ys, xs = np.nonzero(moving[b])
        n = len(xs)
        pos[b, :n, 0] = xs
        pos[b, :n, 1] = ys
        val[b, :n] = 1.0
    out = dict(batch)
    out["mov_pos"] = pos
    out["mov_valid"] = val
    return out


def build(opt, slr: bool, embed_motion: bool = False,
          train_max_steps: int = 60):
    from slrsfs_tpu.engine.trainer import Trainer
    from slrsfs_tpu.models.baseline import (
        BaselineMotionTrainable,
        BaselineTrainable,
        baseline_motion_extra_losses,
    )
    from slrsfs_tpu.models.motion import MotionRegressor
    from slrsfs_tpu.models.slr import (
        BackgroundModel,
        SLRTrainable,
        slr_extra_losses,
    )

    if opt.model_type == "bg":  # stage 2 (train_animating_BG.py)
        model = BackgroundModel(opt)
        return model, Trainer(opt, model, task="bg")
    if opt.model_type in ("SPADE_unet_mask_motion", "unet_motion"):
        model = MotionRegressor(opt)  # motion GAN (train_motion_unet.py)
        return model, Trainer(opt, model, task="motion")
    if slr:  # stage 3 (train_animating_alpha_2layers_joint_*.py)
        model = SLRTrainable(opt, train_max_steps=train_max_steps)
        return model, Trainer(opt, model, extra_losses_fn=slr_extra_losses)
    if embed_motion:
        # fix-motion finetune / joint-IGAN-only stages
        # (train_animating_fixmotion.py / train_animating_motion_IGANonly.py)
        model = BaselineMotionTrainable(opt, train_max_steps=train_max_steps)
        return model, Trainer(opt, model,
                              extra_losses_fn=baseline_motion_extra_losses)
    model = BaselineTrainable(opt, train_max_steps=train_max_steps)
    return model, Trainer(opt, model)  # stage 1 (train_animating.py)


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--data-root", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--model-type", default="softmax_splating")
    p.add_argument("--dataset", default=None)
    p.add_argument("--batch-size", type=int, default=16)
    p.add_argument("--W", type=int, default=256)
    p.add_argument("--ngf", type=int, default=64)
    p.add_argument("--niter", type=int, default=100)
    p.add_argument("--niter-decay", type=int, default=10)
    p.add_argument("--steps-per-epoch", type=int, default=500)
    p.add_argument("--val-steps", type=int, default=8)
    p.add_argument("--lr-g", type=float, default=5e-4 / 2)
    p.add_argument("--lr-d", type=float, default=1e-3 * 2)
    p.add_argument("--resume", action="store_true")
    p.add_argument("--init-from", default=None,
                   help="reference .pth to warm-start from")
    p.add_argument("--init-bg-from", default=None,
                   help="stage-2 BG .pth whose net_bg.* keys overlay "
                        "--init-from for SLR stage 3 (reference "
                        "--load_bg_model, ...joint_finetuneBGFluid_L1.py:454)")
    p.add_argument("--init-motion-from", default=None,
                   help="motion-regressor .pth merged with the "
                        "motion_predictor remap (reference "
                        "--load_motion_regressor, :441-449)")
    p.add_argument("--vgg-pth", default=None,
                   help="torchvision vgg19 state_dict for the content loss")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--random-ff-mask", action="store_true",
                   help="free-form occlusion augmentation "
                        "(reference --random_ff_mask)")
    p.add_argument("--random-ff-mask-rate", type=float, default=0.5)
    p.add_argument("--embed-motion", action="store_true",
                   help="embed the motion regressor in the fluid model: the "
                        "splat flow comes from it instead of GT (reference "
                        "fix-motion / IGAN-only stages)")
    p.add_argument("--freeze-motion", action="store_true",
                   help="freeze the embedded regressor's params (reference "
                        "train_animating_fixmotion.py:448-450)")
    p.add_argument("--num-accumulations", type=int, default=1,
                   help="micro-batches per optimizer step "
                        "(reference base_model.py:95-163)")
    p.add_argument("--motion-losses", nargs="+", default=None,
                   help="motion-stage loss spec (reference --motion_losses; "
                        "shipped config: 10.0_EndPointError, "
                        "train_motion_EPE_MotionGAN.sh:17). The argparse "
                        "default '1.0_l1' is broken in the reference itself "
                        "(MotionLoss.get_loss_from_name returns None for "
                        "it), so motion stages default to the shipped value")
    p.add_argument("--accum-scale", choices=["mean", "reference"],
                   default="mean",
                   help="accumulated-gradient scale: 'mean' averages "
                        "micro-batch gradients; 'reference' reproduces the "
                        "reference's literal loss/weight quirk (each micro "
                        "loss x num_steps, grads summed = accum^2 x mean; "
                        "base_model.py:106,129-133)")
    p.add_argument("--train-compute-dtype",
                   choices=["float32", "bfloat16"], default="float32",
                   help="G forward/backward compute dtype: 'bfloat16' is "
                        "opt-in mixed precision (f32 master params + Adam "
                        "state, bf16 model compute — the same cast as the "
                        "inference speed mode); 'float32' matches the "
                        "reference numerics")
    p.add_argument("--train-sparse-motion", choices=["auto", "off"],
                   default="auto",
                   help="integrate only each sample's moving pixels in the "
                        "training pass (exact for exact-zero static motion; "
                        "auto falls back to the dense scan per batch when "
                        ">50%% of pixels move)")
    p.add_argument("--train-sparsify-eps", type=float, default=None,
                   help="zero training motion below this speed so ESTIMATED "
                        "dense GT flows ride the compact moving-set "
                        "integration. Default auto = 0.5/train_max_steps "
                        "(bounds every zeroed trajectory's drift at half a "
                        "pixel over the clip; loss-parity pinned in "
                        "tests/test_trainer.py); pass 0 to disable")
    p.add_argument("--train-max-steps", type=int, default=60,
                   help="static bound on per-sample Euler integration steps; "
                        "must be >= the sampled end-start+1 span (= clip "
                        "length for the reference datasets). Raise it for "
                        "datasets with longer clips.")
    # architecture overrides (reference --refine_model_type etc.)
    p.add_argument("--refine-model-type", default=None)
    p.add_argument("--alpha-refine-model-type", default=None)
    p.add_argument("--bg-refine-model-type", default=None)
    p.add_argument("--out-channel", type=int, default=None)
    p.add_argument("--ndf", type=int, default=None)
    p.add_argument("--num-D", type=int, default=None)
    p.add_argument("--n-layers-D", type=int, default=None)
    a = p.parse_args(argv)

    from slrsfs_tpu.config import Options
    from slrsfs_tpu.data.datasets import get_dataset
    from slrsfs_tpu.io.checkpoint import restore_native, save_native

    slr = a.model_type == "softmax_splating_2layers_alpha_seperate"
    default_ds = {
        "softmax_splating_2layers_alpha_seperate": "eulerian_data_balanced1_mask",
        "bg": "eulerian_data_bg",
        "SPADE_unet_mask_motion": "eulerian_data_motion_hint",
        "unet_motion": "eulerian_data_motion_hint",
    }.get(a.model_type, "eulerian_data")
    if a.embed_motion and a.dataset is None:
        # fix-motion finetune trains with precomputed sparse hints
        # (train_animating_scripts/train_animating_fixedMotion_*.sh:16)
        default_ds = "eulerian_data_hint"
    opt = Options(
        model_type=a.model_type,
        dataset=a.dataset or default_ds,
        use_online_hint="motion" in a.model_type.lower()
        or "unet" in a.model_type.lower(),
        batch_size=a.batch_size, W=a.W, ngf=a.ngf,
        niter=a.niter, niter_decay=a.niter_decay,
        lr_g=a.lr_g, lr_d=a.lr_d, seed=a.seed,
        MVloss=1.0 if (slr or a.model_type == "bg") else 0.0,
        use_alpha0_as_blending_weight=slr,
        ATVloss=0.3 if slr else 0.0, ADCloss=1.0 if slr else 0.0,
        FluidRegionloss=3.0 if slr else 0.0,
        RockRegionloss=30.0 if slr else 0.0,
        RockRegionlossDecay=20.0 if slr else 0.0,
        random_ff_mask=a.random_ff_mask,
        random_ff_mask_rate=a.random_ff_mask_rate,
        train_motion=a.embed_motion,
        freeze_motion=a.freeze_motion,
        num_accumulations=max(1, a.num_accumulations),
        accum_scale=a.accum_scale,
        train_compute_dtype=a.train_compute_dtype,
    )
    if a.motion_losses:
        opt = opt.replace(motion_losses=tuple(a.motion_losses))
    elif a.model_type in ("SPADE_unet_mask_motion", "unet_motion"):
        # shipped motion-stage config (train_motion_EPE_MotionGAN.sh:17);
        # the reference argparse default '1.0_l1' crashes its own MotionLoss
        opt = opt.replace(motion_losses=("10.0_EndPointError",))
    elif a.embed_motion:
        # embedded-motion fluid training also pays motion losses; the
        # shipped config is 1.0_EndPointError
        # (train_animating_fixedMotion_finetuneFluid_IGANonly.sh:22) — the
        # reference argparse default '1.0_l1' would crash at trace time
        opt = opt.replace(motion_losses=("1.0_EndPointError",))
    if (a.init_bg_from or a.init_motion_from) and not a.init_from:
        p.error("--init-bg-from/--init-motion-from overlay --init-from and "
                "require it")
    if a.init_motion_from and not a.embed_motion:
        p.error("--init-motion-from needs --embed-motion (only the "
                "embedded-motion fluid model has a motion_regressor; "
                "the SLR stage-3 model does not)")
    if a.freeze_motion and not a.embed_motion:
        p.error("--freeze-motion needs --embed-motion")
    arch_overrides = {
        "refine_model_type": a.refine_model_type,
        "alpha_refine_model_type": a.alpha_refine_model_type,
        "bg_refine_model_type": a.bg_refine_model_type,
        "out_channel": a.out_channel,
        "ndf": a.ndf, "num_D": a.num_D, "n_layers_D": a.n_layers_D,
    }
    opt = opt.replace(**{k: v for k, v in arch_overrides.items()
                         if v is not None})
    os.makedirs(a.out, exist_ok=True)
    with open(os.path.join(a.out, "options.json"), "w") as f:
        f.write(opt.to_json())

    signal.signal(signal.SIGUSR1, _handle_preempt)
    halt_file = os.path.join(a.out, "HALT")
    if os.path.exists(halt_file):
        print("HALT marker present; training already finished")
        return

    from tensorboardX import SummaryWriter

    writer = SummaryWriter(os.path.join(a.out, "runs"))

    model, trainer = build(opt, slr, embed_motion=a.embed_motion,
                           train_max_steps=a.train_max_steps)
    if a.vgg_pth:
        import torch

        from slrsfs_tpu.nn.vgg import import_vgg19

        trainer.load_vgg(import_vgg19(
            torch.load(a.vgg_pth, map_location="cpu", weights_only=False)))

    dataset = get_dataset(opt, a.data_root, split="train", seed=a.seed)
    example = next(dataset.batches(a.batch_size, num_batches=1))
    example = _to_device_batch(example)
    state = trainer.init_state(jax.random.PRNGKey(a.seed), example)

    start_epoch = 0
    best_perceptual = float("inf")
    ckpt_dir = os.path.join(a.out, "ckpt")
    # require BOTH meta and data: a crash during an async save may leave
    # meta.json without the (atomically-renamed) orbax dir
    if (a.resume and os.path.exists(ckpt_dir + ".meta.json")
            and os.path.isdir(ckpt_dir)):
        state, meta = restore_native(ckpt_dir, jax.tree.map(np.asarray, state))
        start_epoch = meta.get("epoch", 0) + 1
        best_perceptual = meta.get("best_perceptual", best_perceptual)
        print(f"resumed from epoch {meta.get('epoch')}")
    elif a.init_from:
        from slrsfs_tpu.io.checkpoint import load_torch_checkpoint

        ckpt = load_torch_checkpoint(a.init_from)
        sd = ckpt.get("state_dict", ckpt)
        fallback = {"params": state.g_params, "batch_stats": state.g_stats,
                    "spectral": state.g_spectral}

        def _sd(path):
            c = load_torch_checkpoint(path)
            return c.get("state_dict", c)

        if slr:
            from slrsfs_tpu.io.checkpoint import (
                import_slr_model,
                merge_stage3_state_dict,
            )

            sd = merge_stage3_state_dict(
                sd, sd_bg=_sd(a.init_bg_from) if a.init_bg_from else None)
            variables = import_slr_model(sd, opt, fallback=fallback)
        elif a.embed_motion:
            from slrsfs_tpu.io.checkpoint import (
                import_embedded_baseline,
                merge_stage3_state_dict,
            )

            # fix-motion warm start: baseline ckpt + separate motion ckpt
            # (reference train_animating_fixmotion.py:438-446)
            sd = merge_stage3_state_dict(
                sd, sd_motion=_sd(a.init_motion_from)
                if a.init_motion_from else None)
            variables = import_embedded_baseline(sd, opt, fallback=fallback)
        else:
            from slrsfs_tpu.io.checkpoint import import_baseline_model

            variables = import_baseline_model(sd, opt)
        state = state.replace(
            g_params=variables["params"],
            g_stats=variables["batch_stats"],
            g_spectral=variables["spectral"],
        )
        if any(k.startswith("netD.") for k in sd):
            from slrsfs_tpu.io.checkpoint import import_discriminator

            d_vars = import_discriminator(sd, opt)
            state = state.replace(d_params=d_vars["params"],
                                  d_spectral=d_vars.get("spectral", {}))
        if "optimizerG" in ckpt:
            # exact mid-run resume from a reference checkpoint: restore both
            # Adam states + step (reference train_animating.py:270-288)
            from slrsfs_tpu.io.checkpoint import import_optimizer_states

            try:
                opt_g, opt_d, count = import_optimizer_states(
                    ckpt, opt, trainer.tx_g, state.g_params,
                    tx_d=trainer.tx_d if trainer.use_discriminator else None,
                    d_params=state.d_params)
                state = state.replace(opt_g=opt_g)
                if opt_d is not None:
                    state = state.replace(opt_d=opt_d)
                print(f"restored torch Adam states (step {count})")
            except Exception as e:  # weights-only init is still useful
                print(f"optimizer-state import skipped: {e}")
        from slrsfs_tpu.io.checkpoint import import_vgg_from_checkpoint

        vgg = import_vgg_from_checkpoint(sd)
        if vgg is not None:
            trainer.load_vgg(vgg)
            print("harvested pretrained VGG19 from the init checkpoint")

    # donate the state: params/opt-state buffers are dead after each step,
    # so XLA reuses them in place — halves peak HBM for the training state
    accum = max(1, a.num_accumulations)
    train_step = jax.jit(trainer.make_train_step(accum=accum),
                         donate_argnums=(0,))
    eval_step = jax.jit(trainer.make_eval_step())

    # compact moving-set integration applies when the splat flow comes
    # from the dataset (GT motion with exact zeros); predicted-motion and
    # non-fluid stages integrate dense fields or not at all
    sparse_motion = (a.train_sparse_motion != "off"
                     and a.model_type in
                     ("softmax_splating",
                      "softmax_splating_2layers_alpha_seperate")
                     and not a.embed_motion)

    # sticky across EPOCHS too: one sparse-vs-dense decision + a monotone
    # P bucket for the whole run (see attach_moving_sets)
    mov_state = {}
    sparsify_eps = a.train_sparsify_eps
    if sparsify_eps is None:  # auto: the error-bounded default
        sparsify_eps = 0.5 / a.train_max_steps if sparse_motion else 0.0

    def _micro_batches(it):
        """Group the stream into accum-sized micro-batch lists (reference
        num_accumulations loop, base_model.py:95-163)."""
        group = []
        for b in it:
            if sparse_motion:
                b = attach_moving_sets(b, state=mov_state,
                                       eps=sparsify_eps,
                                       n_steps=a.train_max_steps)
            group.append(_to_device_batch(b))
            if len(group) == accum:
                yield group if accum > 1 else group[0]
                group = []

    rng = jax.random.PRNGKey(a.seed + 1)
    total_epochs = a.niter + a.niter_decay
    for epoch in range(start_epoch, total_epochs):
        dataset.totrain(epoch)
        t0 = time.time()
        running = {}
        for it, batch in enumerate(_micro_batches(
                dataset.batches(a.batch_size,
                                num_batches=a.steps_per_epoch * accum))):
            rng, step_rng = jax.random.split(rng)
            state, logs = train_step(state, batch, step_rng)
            for k, v in logs.items():
                running.setdefault(k, []).append(float(v))
            gstep = epoch * a.steps_per_epoch + it
            if it % 100 == 0:
                msg = " ".join(f"{k}={np.mean(v):.4f}"
                               for k, v in sorted(running.items())
                               if k in ("Total Loss", "L1", "Perceptual",
                                        "psnr", "GAN"))
                print(f"epoch {epoch} it {it}: {msg}", flush=True)
            for k, v in logs.items():
                writer.add_scalar(f"train/{k}", float(v), gstep)
            if _SIGNAL_RECEIVED:
                save_native(ckpt_dir, state, opt, epoch=epoch - 1,
                            extra={"best_perceptual": best_perceptual})
                trigger_job_requeue()
                return

        # validation (reference train loop val(): toval split, same pass)
        dataset.toval(epoch)
        val_logs = {}
        for it, batch in enumerate(
                dataset.batches(a.batch_size, num_batches=a.val_steps)):
            rng, step_rng = jax.random.split(rng)
            losses, pred = eval_step(state, _to_device_batch(batch), step_rng)
            for k, v in losses.items():
                val_logs.setdefault(k, []).append(float(v))
        val_means = {k: float(np.mean(v)) for k, v in val_logs.items()}
        for k, v in val_means.items():
            writer.add_scalar(f"val/{k}", v, epoch)
        # image grids for pred-dict keys (reference train_animating.py:101-138)
        imgs = {k: v for k, v in pred.items()
                if hasattr(v, "ndim") and v.ndim == 4
                and v.shape[-1] in (1, 2, 3)}
        for k, v in imgs.items():
            grid = np.asarray(v[0], np.float32)
            if grid.shape[-1] == 2:
                # 2-channel Motion/flow keys → color-wheel rendering
                # (reference train_animating.py:114-120 via flow2img)
                from slrsfs_tpu.utils.flow_viz import flow_to_image

                grid = flow_to_image(grid).astype(np.float32) / 255.0
            elif opt.normalize_image and "Img" in k:
                # [-1,1] → [0,1] for logging (reference base_model.py:110-113)
                grid = grid * 0.5 + 0.5
            writer.add_image(f"val/{k}", np.clip(grid, 0, 1), epoch,
                             dataformats="HWC")

        # async save: disk write overlaps the next epoch's training; the
        # preemption handler and the final exit wait for durability
        save_native(ckpt_dir, state, opt, epoch=epoch,
                    extra={"best_perceptual": best_perceptual,
                           "val": val_means}, block=False)
        perceptual = val_means.get("Perceptual", val_means.get("Total Loss", 0))
        if perceptual < best_perceptual:
            best_perceptual = perceptual
            save_native(ckpt_dir + "_best", state, opt, epoch=epoch,
                        extra={"best_perceptual": best_perceptual},
                        block=False)
        if epoch % 25 == 0 and epoch >= 50 and os.path.isdir(
                ckpt_dir + "_best"):
            # epoch-numbered snapshot of the best-so-far checkpoint so a
            # late-training regression can't overwrite the only good weights
            # (reference train_animating.py:357-359)
            import shutil

            from slrsfs_tpu.io.checkpoint import wait_for_checkpoints

            wait_for_checkpoints()  # the _best save must be durable first
            snap = ckpt_dir + f"_best{epoch}"
            if os.path.isdir(snap):
                shutil.rmtree(snap)
            shutil.copytree(ckpt_dir + "_best", snap)
            if os.path.exists(ckpt_dir + "_best.meta.json"):
                shutil.copy(ckpt_dir + "_best.meta.json",
                            snap + ".meta.json")
        print(f"epoch {epoch} done in {time.time()-t0:.0f}s; "
              f"val {val_means}", flush=True)

    from slrsfs_tpu.io.checkpoint import wait_for_checkpoints

    wait_for_checkpoints()
    with open(halt_file, "w") as f:
        f.write("done")
    writer.close()


if __name__ == "__main__":
    main()
