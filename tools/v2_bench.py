#!/usr/bin/env python
"""SLR-v2 premium microbench: isolate the per-frame max-warp-norm cost.

Rows:
  slr        — bf16 compute + bf16 splat (the bench slr_fps definition)
  v2_f32sp   — v2, bf16 compute, f32 splat (the rounds-1..3 slr_v2_fps
               definition — f32 splat by omission)
  v2_bf16sp  — v2, bf16 compute + bf16 splat (fast mode on the main splat;
               the round-4 slr_v2_fps definition)

Round-4 measurements (v5e, db=60, 50% moving): slr 786.8 ms / v2_f32sp
907.4 / v2_bf16sp 828.6 — the matched-mode v2 premium is ~42 ms/rollout.
bf16 NORM buffers on top of v2_bf16sp measured 834.9 ms (neutral-to-worse;
reverted — see GAPS.md).

Usage: python tools/v2_bench.py [decode_batch]
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from slrsfs_tpu.config import Options
from slrsfs_tpu.engine.init_utils import enable_persistent_cache, jit_init, settle
from slrsfs_tpu.engine.rollout import prepare_scene_sparse, slr_rollout_sparse
from slrsfs_tpu.models.slr import SLRModel

H, W, N = 256, 480, 60


def _force(out):
    _ = float(out["PredImg"][-1, -1, -1, -1])


def time_fn(fn, runs=3):
    t0 = time.perf_counter()
    _force(fn())
    c = time.perf_counter() - t0
    best = min(
        (lambda: (lambda t: (_force(fn()), time.perf_counter() - t)[1])(
            time.perf_counter()))()
        for _ in range(runs)
    )
    return c, best


def main():
    enable_persistent_cache()
    db = int(sys.argv[1]) if len(sys.argv) > 1 else 60
    rng = np.random.default_rng(0)
    opt = Options(use_alpha0_as_blending_weight=True)
    img = jnp.asarray(rng.standard_normal((1, H, W, 3)) * 0.25, jnp.float32)
    flow_np = rng.standard_normal((H, W, 2)).astype(np.float32)
    flow_np[: H // 2] = 0.0
    positions, valid = prepare_scene_sparse(flow_np)
    flow = jnp.asarray(flow_np)
    pos = jnp.asarray(positions)
    val = jnp.asarray(valid)

    img_init = jnp.asarray(rng.standard_normal((1, 64, 64, 3)) * 0.25,
                           jnp.float32)
    slr = SLRModel(opt)
    v = jit_init(slr, {"params": jax.random.PRNGKey(2),
                       "noise": jax.random.PRNGKey(3)}, img_init, False, True)
    v = settle(slr, v, (img_init,), n=2)
    slr_v2 = SLRModel(opt.replace(use_softmax_splatter_v2=True))

    def mk(model, sd):
        run = jax.jit(lambda v_, i, f, p, va: slr_rollout_sparse(
            model, v_, i, f, N, p, va, decode_batch=db,
            compute_dtype=jnp.bfloat16, splat_dtype=sd))
        return lambda: run(v, img, flow, pos, val)

    for name, model, sd in (
        ("slr      ", slr, jnp.bfloat16),
        ("v2_f32sp ", slr_v2, None),
        ("v2_bf16sp", slr_v2, jnp.bfloat16),
    ):
        c, best = time_fn(mk(model, sd))
        print(f"{name} db={db}: {best*1000:7.1f} ms ({N/best:5.1f} fps) "
              f"compile={c:.1f}s", flush=True)


if __name__ == "__main__":
    main()
