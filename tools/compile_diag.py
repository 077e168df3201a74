#!/usr/bin/env python
"""Diagnose the pathological SLR rollout compile (249 s in BENCH_r02).

Times jit trace+lower and XLA compile SEPARATELY for a config matrix around
the slow point (SLR sparse rollout, bf16 compute + bf16 splat accumulation,
decode_batch=60) to find which ingredient blows up compilation.

Usage: python tools/compile_diag.py [--hw 480x256] [--configs all|slr|baseline]
"""

import argparse
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from slrsfs_tpu.config import Options
from slrsfs_tpu.engine.init_utils import jit_init, settle
from slrsfs_tpu.engine.rollout import (
    baseline_rollout_sparse, prepare_scene_sparse, slr_rollout_sparse,
)
from slrsfs_tpu.models.baseline import BaselineModel
from slrsfs_tpu.models.slr import SLRModel

N = 60


def measure(name, fn, args):
    t0 = time.perf_counter()
    lowered = jax.jit(fn).lower(*args)
    t_lower = time.perf_counter() - t0
    hlo_len = len(lowered.as_text())
    t0 = time.perf_counter()
    compiled = lowered.compile()
    t_compile = time.perf_counter() - t0
    print(f"# {name}: lower={t_lower:.1f}s hlo_chars={hlo_len/1e6:.2f}M "
          f"compile={t_compile:.1f}s", flush=True)
    return compiled


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--hw", default="480x256")  # WxH to match bench
    args = ap.parse_args()
    W, H = (int(t) for t in args.hw.split("x"))

    print(f"# device={jax.devices()[0]} {H}x{W}", flush=True)
    rng = np.random.default_rng(0)
    opt = Options()
    img = jnp.asarray(rng.standard_normal((1, H, W, 3)) * 0.25, jnp.float32)
    flow_np = rng.standard_normal((H, W, 2)).astype(np.float32)
    flow_np[: H // 2] = 0.0
    positions, valid = prepare_scene_sparse(flow_np)
    flow = jnp.asarray(flow_np)
    positions = jnp.asarray(positions)
    valid = jnp.asarray(valid)

    slr = SLRModel(opt.replace(use_alpha0_as_blending_weight=True))
    v = jit_init(slr, {"params": jax.random.PRNGKey(2),
                       "noise": jax.random.PRNGKey(3)}, img, False, True)
    v = settle(slr, v, (img,), n=2)

    def slr_fn(cdt, sdt, db):
        return lambda v_, i, f, p, va: slr_rollout_sparse(
            slr, v_, i, f, N, p, va, decode_batch=db,
            compute_dtype=cdt, splat_dtype=sdt)

    A = (v, img, flow, positions, valid)
    # the slow config first, then peel ingredients
    measure("slr bf16+bf16splat db=60", slr_fn(jnp.bfloat16, jnp.bfloat16, 60), A)
    measure("slr bf16+f32splat  db=60", slr_fn(jnp.bfloat16, None, 60), A)
    measure("slr f32+f32splat   db=60", slr_fn(jnp.float32, None, 60), A)
    measure("slr bf16+bf16splat db=20", slr_fn(jnp.bfloat16, jnp.bfloat16, 20), A)

    model = BaselineModel(opt)
    vb = jit_init(model, {"params": jax.random.PRNGKey(0),
                          "noise": jax.random.PRNGKey(1)}, img, False, True)
    vb = settle(model, vb, (img,), n=2)

    def base_fn(cdt, sdt, db):
        return lambda v_, i, f, p, va: baseline_rollout_sparse(
            model, v_, i, f, N, p, va, decode_batch=db,
            compute_dtype=cdt, splat_dtype=sdt)

    measure("baseline bf16+bf16splat db=60",
            base_fn(jnp.bfloat16, jnp.bfloat16, 60), (vb,) + A[1:])


if __name__ == "__main__":
    main()
