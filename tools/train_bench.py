"""Training-step throughput + stage shares on the flagship baseline config.

Measures one optimizer step (G fwd/bwd incl. Euler scan + splat VJP + VGG
perceptual + multiscale GAN, then the D step) at the reference's shipped
training shapes (batch 16, W=256 — train_baseline2_pconv.sh). The reference
publishes no training throughput; this records ours.

``--stages`` additionally measures ablation programs to attribute the step
time (each costs a compile; prefix/ablation differences are the only
trustworthy decomposition through the axon tunnel — GAPS.md):
  * integration share: T=60 vs T=4 step difference (scaled 60/56);
  * discriminator share: step with discriminator_losses='0';
  * VGG share: step with losses=['1.0_l1'] (no content/perceptual term);
  * sparse-motion step: masked motion (50% moving) with host-attached
    moving sets (models/baseline.py:train_integrate compact scan).

Run on the TPU:
  python tools/train_bench.py [B] [W] [--stages] [--runs N]
Prints one JSON line with train_step_s / train_samples_per_s (+ stage
fields with --stages).
"""

import argparse
import json
import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_batch(rng, B, W, moving_frac=1.0):
    def imgs():
        return jnp.asarray(rng.standard_normal((B, W, W, 3)) * 0.25,
                           jnp.float32)

    idx = np.zeros((B, 3), np.int32)
    idx[:, 1] = rng.integers(1, 59, size=B)
    idx[:, 2] = 59
    motions = rng.standard_normal((B, W, W, 2)).astype(np.float32) * 2.0
    if moving_frac < 1.0:
        motions[:, : int(W * (1.0 - moving_frac))] = 0.0
    return {
        "images": [imgs(), imgs(), imgs()],
        "index": jnp.asarray(idx),
        "motions": jnp.asarray(motions),
    }


def time_step(trainer, model_step, state, batch, runs):
    t0 = time.perf_counter()
    s, logs = model_step(state, batch, jax.random.PRNGKey(1))
    float(np.asarray(logs["Total Loss"]))
    compile_s = time.perf_counter() - t0
    times = []
    for i in range(runs):
        t0 = time.perf_counter()
        s, logs = model_step(s, batch, jax.random.PRNGKey(2 + i))
        float(np.asarray(logs["Total Loss"]))
        times.append(time.perf_counter() - t0)
    return min(times), compile_s


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("B", nargs="?", type=int, default=16)
    ap.add_argument("W", nargs="?", type=int, default=256)
    ap.add_argument("--stages", action="store_true")
    ap.add_argument("--runs", type=int, default=4)
    ap.add_argument("--sparse-frac", type=float, default=0.5,
                    help="moving fraction for the --stages sparse-motion "
                         "measurement")
    ap.add_argument("--compute-dtype", choices=["float32", "bfloat16"],
                    default="float32",
                    help="train_compute_dtype: bfloat16 measures the opt-in "
                         "mixed-precision G fwd/bwd")
    a = ap.parse_args()

    from slrsfs_tpu.cli.train import attach_moving_sets
    from slrsfs_tpu.config import Options
    from slrsfs_tpu.engine.init_utils import enable_persistent_cache
    from slrsfs_tpu.engine.trainer import Trainer
    from slrsfs_tpu.models.baseline import BaselineTrainable

    enable_persistent_cache()
    B, W = a.B, a.W
    rng = np.random.default_rng(0)
    batch = make_batch(rng, B, W)
    out = {}

    def measure(name, opt, T=60, use_batch=None):
        model = BaselineTrainable(opt, train_max_steps=T)
        trainer = Trainer(opt, model, steps_per_epoch=500)
        b = use_batch if use_batch is not None else batch
        state = trainer.init_state(jax.random.PRNGKey(0), b)
        step = jax.jit(trainer.make_train_step(), donate_argnums=(0,))
        best, compile_s = time_step(trainer, step, state, b, a.runs)
        print(f"# {name}: {best*1000:.1f}ms ({B/best:.1f} samples/s, "
              f"compile {compile_s:.1f}s)", file=sys.stderr, flush=True)
        return best

    opt = Options(W=W, batch_size=B, train_compute_dtype=a.compute_dtype)
    full = measure("full G+D step (dense integration)", opt)
    out["train_step_s"] = round(full, 4)
    out["train_samples_per_s"] = round(B / full, 2)

    if a.stages:
        t4 = measure("T=4 integration", opt, T=4)
        out["t_integration_s"] = round(max(full - t4, 0.0) * 60.0 / 56.0, 4)
        no_d = measure("no discriminator",
                       opt.replace(discriminator_losses="0"))
        out["t_discriminator_s"] = round(max(full - no_d, 0.0), 4)
        no_vgg = measure("l1-only loss", opt.replace(losses=("1.0_l1",)))
        out["t_vgg_s"] = round(max(full - no_vgg, 0.0), 4)

        sparse_np = {
            k: ([np.asarray(x) for x in v] if isinstance(v, list)
                else np.asarray(v))
            for k, v in make_batch(np.random.default_rng(1), B, W,
                                   moving_frac=a.sparse_frac).items()}
        sparse_b = attach_moving_sets(sparse_np)
        assert "mov_pos" in sparse_b
        sparse_b = {k: ([jnp.asarray(x) for x in v] if isinstance(v, list)
                        else jnp.asarray(v)) for k, v in sparse_b.items()}
        sp = measure(f"sparse-motion step ({a.sparse_frac:.0%} moving)", opt,
                     use_batch=sparse_b)
        out[f"train_step_sparse{int(a.sparse_frac*100)}_s"] = round(sp, 4)

    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
