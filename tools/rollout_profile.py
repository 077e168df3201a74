#!/usr/bin/env python
"""Stage breakdown of the inference rollout via in-graph prefix differences.

Standalone op timings through the axon tunnel carry ~25 ms dispatch overhead
(GAPS.md), so each stage is measured as the time difference between two jitted
PREFIX programs of the real rollout (encode; encode+integrate;
encode+integrate+splat; full). This reproduces the reference's DEBUG_TIME
stage meters (test_animating/test_baseline_4eval_rawsize.py:187-233) with the
same stage names.

Usage: python tools/rollout_profile.py [--hw 768x768] [--moving 0.5]
       [--decode-batches 5,10,15] [--slr]
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
from slrsfs_tpu.engine.rollout import prepare_scene_sparse
from slrsfs_tpu.models.baseline import (
    BaselineModel, pack_splat_input, z_for_splat, z_normalize,
)
from slrsfs_tpu.ops import euler_integrate_compact_dual
from slrsfs_tpu.ops.splat import softsplat_sum_at_quad_dual

N = 60


def _force(x):
    while isinstance(x, (tuple, list)):
        x = x[0]
    if isinstance(x, dict):
        x = next(iter(x.values()))
    np.asarray(jax.tree.leaves(x)[0]).ravel()[:1]
    return x


def _time(fn, args, runs=3, label=""):
    t0 = time.perf_counter()
    _force(fn(*args))
    compile_s = time.perf_counter() - t0
    best = min(
        (lambda t0=time.perf_counter(): (_force(fn(*args)),
                                         time.perf_counter() - t0)[1])()
        for _ in range(runs)
    )
    print(f"# {label}: {best*1000:.1f}ms (compile {compile_s:.1f}s)",
          flush=True)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--hw", default="768x768")
    ap.add_argument("--moving", type=float, default=0.5)
    ap.add_argument("--decode-batches", default="5")
    ap.add_argument("--dtype", default="bf16", choices=["bf16", "f32"])
    args = ap.parse_args()
    H, W = (int(t) for t in args.hw.split("x"))
    dbs = [int(t) for t in args.decode_batches.split(",")]
    cdt = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    sdt = cdt

    print(f"# device={jax.devices()[0]} shape={H}x{W} moving={args.moving} "
          f"dtype={args.dtype}", flush=True)
    rng = np.random.default_rng(0)
    opt = Options()
    model = BaselineModel(opt)
    img = jnp.asarray(rng.standard_normal((1, H, W, 3)) * 0.25, jnp.float32)
    flow_np = rng.standard_normal((H, W, 2)).astype(np.float32)
    flow_np[: int(H * (1.0 - args.moving))] = 0.0
    positions, valid = prepare_scene_sparse(flow_np)
    flow = jnp.asarray(flow_np)
    positions = jnp.asarray(positions)
    valid = jnp.asarray(valid)

    variables = jit_init(
        model, {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
        img, False, True)
    variables = settle(model, variables, (img,), n=2)
    if cdt != jnp.float32:
        variables = jax.tree.map(
            lambda a: a.astype(cdt)
            if isinstance(a, jax.Array) and a.dtype == jnp.float32 else a,
            variables)
        img = img.astype(cdt)

    # ---- prefix programs -------------------------------------------------
    @jax.jit
    def f_encode(v, i):
        fs, z = model.apply(v, i, method="encode")
        return fs, z_for_splat(opt, fs, z)

    @jax.jit
    def f_integrate(f, p):
        return euler_integrate_compact_dual(f, p, N - 1, N)

    def splat_stack(v, i, f, p, va):
        fs, z = model.apply(v, i, method="encode")
        z = z_for_splat(opt, fs, z)
        zn = z_normalize(opt, z, None)
        u = pack_splat_input(fs, zn)[0].astype(sdt)
        moving_mask = jnp.zeros((H, W), jnp.float32).at[
            p[:, 1], p[:, 0]].max(va)
        u_static = (u * (1.0 - moving_mask)[..., None]).astype(sdt)
        u_mov = (u[p[:, 1], p[:, 0]] * va[:, None]).astype(sdt)
        disp_f, disp_p = euler_integrate_compact_dual(f, p, N - 1, N)

        def frame(_, t):
            alpha = 1.0 - t.astype(jnp.float32) / N
            g = (softsplat_sum_at_quad_dual(
                u_mov, p, disp_f[t], disp_p[N - t],
                alpha, 1.0 - alpha, H, W) + u_static).astype(jnp.float32)
            norm = jnp.maximum(g[..., -1:], 1e-8)
            return None, (g[..., :-1] / norm).astype(cdt)

        _, gen_fs = jax.lax.scan(frame, None, jnp.arange(N))
        return gen_fs

    f_splat = jax.jit(splat_stack)

    def full(v, i, f, p, va, db):
        gen_fs = splat_stack(v, i, f, p, va)

        def dec(_, chunk):
            return None, model.apply(v, chunk, method="decode")

        chunks = gen_fs.reshape(N // db, db, H, W, gen_fs.shape[-1])
        _, frames = jax.lax.scan(dec, None, chunks)
        return frames.reshape(N, H, W, 3)

    t_enc = _time(f_encode, (variables, img), label="prefix encode")
    t_int = _time(f_integrate, (flow, positions), label="prefix integrate")
    t_spl = _time(f_splat, (variables, img, flow, positions, valid),
                  label="prefix encode+integrate+splat")
    for db in dbs:
        t_full = _time(jax.jit(lambda v, i, f, p, va, db=db: full(v, i, f, p, va, db)),
                       (variables, img, flow, positions, valid),
                       label=f"full rollout db={db}")
        print(f"# STAGES db={db}: t_encoder={t_enc*1000:.0f}ms "
              f"t_euler_integration={t_int*1000:.0f}ms "
              f"t_softmax_splating={(t_spl - t_enc - t_int)*1000:.0f}ms "
              f"t_decoder={(t_full - t_spl)*1000:.0f}ms "
              f"total={t_full*1000:.0f}ms fps={N/t_full:.1f}", flush=True)


if __name__ == "__main__":
    main()
