"""Microbench: phased-compact training integration variants on the TPU.

VERDICT r4 #6: the dense-estimated train step measures 1.158 s vs the
1.10 s target at B16/W256 (~30 % moving after the eps sparsifier). Stage
ablations attribute ~1/3 of the dense step to the sequential Euler scan;
this tool times the integration in ISOLATION at the est-batch shape to
see whether the remaining 58 ms is reachable from the scan at all, and
measures two candidate levers against the shipped kernel:

  * ``unroll``: lax.scan unroll=2/4 — amortizes per-step loop overhead
    (each step is ~25 small ops on (P, 2)/(P,) operands; if dispatch
    dominates the gather, unrolling wins).
  * ``soa``: struct-of-arrays carry (dest_x/dest_y as separate (P,)
    vectors, two width-1 gathers) — a (P, 2) operand occupies 2 of 128
    lanes per vreg; SoA runs the elementwise arithmetic at full lane
    occupancy if XLA keeps the minor dim dense.

Run: python tools/phased_microbench.py [B] [W] [P] [T]
"""

import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def phased_compact_variant(motion, positions, valid, t_fwd, t_bwd,
                           n_steps, unroll=1, soa=False):
    """euler_integrate_phased_compact with unroll / SoA knobs (math
    identical to ops/euler.py:euler_integrate_phased_compact)."""
    H, W, _ = motion.shape
    dtype = motion.dtype
    oob_disp = jnp.asarray(max(H, W) + 1, dtype)
    tf = jnp.asarray(t_fwd, jnp.int32)
    tp = jnp.asarray(t_bwd, jnp.int32)

    if not soa:
        coord = positions.astype(dtype)
        motion_flat = motion.reshape(H * W, 2)

        def step(carry, k):
            dest, invalid, out_f, out_p = carry
            reset = k == tf + 1
            dest = jnp.where(reset, coord, dest)
            invalid = jnp.where(reset, False, invalid)
            sign = jnp.where(k <= tf, jnp.asarray(1.0, dtype),
                             jnp.asarray(-1.0, dtype))
            ix = jnp.clip(jnp.round(dest[:, 0]).astype(jnp.int32), 0, W - 1)
            iy = jnp.clip(jnp.round(dest[:, 1]).astype(jnp.int32), 0, H - 1)
            m = jnp.take(motion_flat, iy * W + ix, axis=0) * sign
            dest = dest + m
            oob = ((dest[:, 0] > W - 1) | (dest[:, 0] < 0)
                   | (dest[:, 1] > H - 1) | (dest[:, 1] < 0))
            invalid = invalid | oob
            dest = jnp.where(invalid[:, None], coord, dest)
            disp = jnp.where(invalid[:, None], oob_disp, dest - coord)
            out_f = jnp.where(k == tf, disp, out_f)
            out_p = jnp.where((k == tf + tp) & (tp > 0), disp, out_p)
            return (dest, invalid, out_f, out_p), None

        P = positions.shape[0]
        zeros = jnp.zeros((P, 2), dtype)
        init = (coord, jnp.zeros((P,), bool), zeros, zeros)
        (_, _, out_f, out_p), _ = jax.lax.scan(
            step, init, jnp.arange(1, n_steps + 1), unroll=unroll)
    else:
        cx = positions[:, 0].astype(dtype)
        cy = positions[:, 1].astype(dtype)
        mx = motion[..., 0].reshape(H * W)
        my = motion[..., 1].reshape(H * W)

        def step(carry, k):
            dx, dy, invalid, ofx, ofy, opx, opy = carry
            reset = k == tf + 1
            dx = jnp.where(reset, cx, dx)
            dy = jnp.where(reset, cy, dy)
            invalid = jnp.where(reset, False, invalid)
            sign = jnp.where(k <= tf, jnp.asarray(1.0, dtype),
                             jnp.asarray(-1.0, dtype))
            ix = jnp.clip(jnp.round(dx).astype(jnp.int32), 0, W - 1)
            iy = jnp.clip(jnp.round(dy).astype(jnp.int32), 0, H - 1)
            lin = iy * W + ix
            dx = dx + jnp.take(mx, lin) * sign
            dy = dy + jnp.take(my, lin) * sign
            oob = (dx > W - 1) | (dx < 0) | (dy > H - 1) | (dy < 0)
            invalid = invalid | oob
            dx = jnp.where(invalid, cx, dx)
            dy = jnp.where(invalid, cy, dy)
            fx = jnp.where(invalid, oob_disp, dx - cx)
            fy = jnp.where(invalid, oob_disp, dy - cy)
            ofx = jnp.where(k == tf, fx, ofx)
            ofy = jnp.where(k == tf, fy, ofy)
            latch_p = (k == tf + tp) & (tp > 0)
            opx = jnp.where(latch_p, fx, opx)
            opy = jnp.where(latch_p, fy, opy)
            return (dx, dy, invalid, ofx, ofy, opx, opy), None

        P = positions.shape[0]
        z = jnp.zeros((P,), dtype)
        init = (cx, cy, jnp.zeros((P,), bool), z, z, z, z)
        (_, _, _, ofx, ofy, opx, opy), _ = jax.lax.scan(
            step, init, jnp.arange(1, n_steps + 1), unroll=unroll)
        out_f = jnp.stack([ofx, ofy], axis=-1)
        out_p = jnp.stack([opx, opy], axis=-1)

    grid = jnp.zeros((H, W, 2), dtype)
    v = valid.astype(dtype)[:, None]
    disp_f = grid.at[positions[:, 1], positions[:, 0]].add(out_f * v)
    disp_p = grid.at[positions[:, 1], positions[:, 0]].add(out_p * v)
    return disp_f, disp_p


def main():
    from slrsfs_tpu.engine.init_utils import enable_persistent_cache

    enable_persistent_cache()
    args = [int(x) for x in sys.argv[1:5]] if len(sys.argv) > 1 else []
    B = args[0] if len(args) > 0 else 16
    W = args[1] if len(args) > 1 else 256
    P = args[2] if len(args) > 2 else 20480  # ~30% of 256² bucketed
    T = args[3] if len(args) > 3 else 60
    H = W
    rng = np.random.default_rng(0)

    motion = jnp.asarray(rng.standard_normal((B, H, W, 2)), jnp.float32)
    pos = np.stack([rng.integers(0, W, (B, P)), rng.integers(0, H, (B, P))],
                   axis=-1).astype(np.int32)
    valid = jnp.ones((B, P), jnp.float32)
    pos = jnp.asarray(pos)
    tf = jnp.asarray(rng.integers(10, 30, B), jnp.int32)
    tp = jnp.asarray(rng.integers(20, 31, B), jnp.int32)

    def run(label, **kw):
        fn = jax.jit(lambda m, p, v, a, b: jax.vmap(
            lambda mm, pp, vv, aa, bb: phased_compact_variant(
                mm, pp, vv, aa, bb, T, **kw))(m, p, v, a, b))
        t0 = time.perf_counter()
        o = fn(motion, pos, valid, tf, tp)
        s = float(o[0][-1].sum()) + float(o[1][-1].sum())
        compile_s = time.perf_counter() - t0
        times = []
        for _ in range(6):
            t0 = time.perf_counter()
            o = fn(motion, pos, valid, tf, tp)
            s = float(o[0][-1].sum()) + float(o[1][-1].sum())
            times.append(time.perf_counter() - t0)
        print(f"{label:28s} {min(times)*1000:8.1f} ms  "
              f"(compile {compile_s:.1f}s, checksum {s:.3f})", flush=True)
        return min(times), o

    base_t, base_o = run("AoS unroll=1 (shipped)")
    for u in (2, 4):
        run(f"AoS unroll={u}", unroll=u)
    t_soa, soa_o = run("SoA unroll=1", soa=True)
    run("SoA unroll=2", soa=True, unroll=2)
    run("SoA unroll=4", soa=True, unroll=4)
    d = max(float(jnp.abs(base_o[i] - soa_o[i]).max()) for i in (0, 1))
    print(f"SoA vs AoS max|diff| = {d:g} (must be 0: same math)")


if __name__ == "__main__":
    main()
