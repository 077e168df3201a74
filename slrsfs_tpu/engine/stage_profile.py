"""Per-stage rollout timing via in-graph prefix differences.

Reproduces the reference's DEBUG_TIME stage meters
(``test_animating/test_baseline_4eval_rawsize.py:187-233``: t_encoder,
t_euler_integration, t_softmax_splating, t_decoder) for the FUSED rollout,
where stages are not separable at runtime: each stage is measured as the
time difference between two jitted PREFIX programs of the real rollout.
Standalone op timings through the axon tunnel carry ~25 ms dispatch
overhead (GAPS.md), so prefix differences are the only trustworthy
decomposition. Costs one extra compile per prefix; intended for
``cli.render --profile-stages`` and tools/rollout_profile.py, not steady
-state sweeps.
"""

from __future__ import annotations

import time
from typing import Dict

import numpy as np

import jax
import jax.numpy as jnp

from slrsfs_tpu.engine.rollout import (
    _baseline_pack_fn,
    _cast_for_compute,
)
from slrsfs_tpu.models.baseline import z_for_splat
from slrsfs_tpu.ops import euler_integrate_compact_dual
from slrsfs_tpu.ops.splat import softsplat_sum_at_quad_dual


def _force(x):
    """Force device completion WITHOUT transferring the result: slice one
    element on device, then read 4 bytes. np.asarray on the full output
    would drag gigabytes through the ~20 MB/s axon tunnel and swamp every
    timing (observed: a 4.5 GB prefix output 'measured' 219 s)."""
    while isinstance(x, (tuple, list)):
        x = x[0]
    if isinstance(x, dict):
        x = next(iter(x.values()))
    leaf = jax.tree.leaves(x)[0]
    float(leaf[(0,) * leaf.ndim])
    return x


def _best(fn, args, runs):
    t0 = time.perf_counter()
    _force(fn(*args))
    compile_s = time.perf_counter() - t0
    times = []
    for _ in range(runs):
        t0 = time.perf_counter()
        _force(fn(*args))
        times.append(time.perf_counter() - t0)
    return min(times), compile_s


def profile_baseline_stages(model, variables, img, flow, positions, valid,
                            n_frames: int, decode_batch: int = 5,
                            compute_dtype=jnp.float32, splat_dtype=None,
                            runs: int = 3) -> Dict[str, float]:
    """Stage breakdown of ``baseline_rollout_sparse`` on a real scene.

    Returns reference-named stage seconds: t_encoder, t_euler_integration,
    t_softmax_splating, t_decoder, plus total/fps/compile_s."""
    opt = model.opt
    N = n_frames
    H, W = flow.shape[0], flow.shape[1]
    sdt = jnp.dtype(splat_dtype or jnp.float32)

    variables, img = _cast_for_compute(variables, img, compute_dtype)

    # prefixes return a tiny checksum, not their (up to GB-scale) payload:
    # a huge program OUTPUT both wedges XLA layout assignment (observed
    # 307 s compile for a 4.5 GB-output prefix vs 36 s for the full
    # rollout) and would drag the tunnel. The reduction reads every
    # element, so nothing is dead-code-eliminated; its own cost (~one
    # HBM pass) is charged to every prefix equally.
    @jax.jit
    def f_encode(v, i):
        fs, z = model.apply(v, i, method="encode")
        z = z_for_splat(opt, fs, z)
        return jnp.sum(fs.astype(jnp.float32)) + jnp.sum(z.astype(jnp.float32))

    @jax.jit
    def f_integrate(f, p):
        df, dp = euler_integrate_compact_dual(f, p, N - 1, N)
        return jnp.sum(df) + jnp.sum(dp)

    def splat_stack(v, i, f, p, va):
        fs, z = model.apply(v, i, method="encode")
        z = z_for_splat(opt, fs, z)
        moving_mask = jnp.zeros((H, W), jnp.float32).at[
            p[:, 1], p[:, 0]].max(va)
        pack = _baseline_pack_fn(opt, fs, z, p, va, 1.0 - moving_mask, sdt)
        disp_f, disp_p = euler_integrate_compact_dual(f, p, N - 1, N)

        def frame(_, t):
            alpha = 1.0 - t.astype(jnp.float32) / N
            u_static_t, u_mov_t = pack(disp_f[t])
            g = (softsplat_sum_at_quad_dual(
                u_mov_t, p, disp_f[t], disp_p[N - t],
                alpha, 1.0 - alpha, H, W) + u_static_t).astype(jnp.float32)
            norm = jnp.maximum(g[..., -1:], 1e-8)
            return None, (g[..., :-1] / norm).astype(compute_dtype)

        _, gen_fs = jax.lax.scan(frame, None, jnp.arange(N))
        return gen_fs

    @jax.jit
    def f_splat(v, i, f, p, va):
        return jnp.sum(splat_stack(v, i, f, p, va).astype(jnp.float32))

    @jax.jit
    def f_full(v, i, f, p, va):
        # mirror the real rollout's FUSED chunking (engine/rollout.py).
        # NOTE: p must be TRACED here exactly like in f_splat — baking
        # positions in as a constant would let XLA constant-fold under a
        # different regime and skew the t_decoder = f_full − f_splat
        # prefix difference.
        fs, z = model.apply(v, i, method="encode")
        z = z_for_splat(opt, fs, z)
        moving_mask = jnp.zeros((H, W), jnp.float32).at[
            p[:, 1], p[:, 0]].max(va)
        pack = _baseline_pack_fn(opt, fs, z, p, va,
                                 1.0 - moving_mask, sdt)
        disp_f, disp_p = euler_integrate_compact_dual(f, p, N - 1, N)

        def frame(_, t):
            alpha = 1.0 - t.astype(jnp.float32) / N
            u_static_t, u_mov_t = pack(disp_f[t])
            g = (softsplat_sum_at_quad_dual(
                u_mov_t, p, disp_f[t], disp_p[N - t],
                alpha, 1.0 - alpha, H, W) + u_static_t).astype(jnp.float32)
            norm = jnp.maximum(g[..., -1:], 1e-8)
            return None, (g[..., :-1] / norm).astype(compute_dtype)

        def chunk_body(_, tc):
            _, gen_chunk = jax.lax.scan(frame, None, tc)
            return None, model.apply(v, gen_chunk, method="decode")

        _, frames = jax.lax.scan(
            chunk_body, None,
            jnp.arange(N).reshape(N // decode_batch, decode_batch))
        return jnp.sum(frames.astype(jnp.float32))

    t_enc, c1 = _best(f_encode, (variables, img), runs)
    t_int, c2 = _best(f_integrate, (flow, positions), runs)
    t_spl, c3 = _best(f_splat, (variables, img, flow, positions, valid), runs)
    t_full, c4 = _best(f_full, (variables, img, flow, positions, valid), runs)
    return {
        "t_encoder": t_enc,
        "t_euler_integration": t_int,
        "t_softmax_splating": max(t_spl - t_enc - t_int, 0.0),
        "t_decoder": max(t_full - t_spl, 0.0),
        "total": t_full,
        "fps": N / t_full,
        "compile_s": c1 + c2 + c3 + c4,
    }


def profile_baseline_crop_stages(model, variables, img, flow, positions,
                                 valid, n_frames: int, decode_batch: int = 30,
                                 compute_dtype=jnp.float32, splat_dtype=None,
                                 runs: int = 3,
                                 max_area_frac: float = 0.85
                                 ) -> Dict[str, float]:
    """Stage breakdown of the CROPPED rollout (render CLI --crop-decode
    auto): prepare (integration + target bounds, once per scene) + the crop
    rollout, decomposed by the same prefix-difference technique. Returns
    reference-named stages with t_euler_integration = the prepare step and
    ``total`` the honest end-to-end per-scene time (prepare + rollout).
    Returns None when the scene's crop plan is None (crop disengaged)."""
    import time as _time

    from slrsfs_tpu.engine.rollout import (
        baseline_rollout_sparse,
        prepare_crop,
        softsplat_sum_at_quad_dual as _quad_dual,
        _crop_window,
    )

    opt = model.opt
    N = n_frames
    H, W = flow.shape[0], flow.shape[1]
    sdt = jnp.dtype(splat_dtype or jnp.float32)

    def prep():
        return prepare_crop(opt, False, flow, positions, valid, N,
                            max_area_frac=max_area_frac)

    disp, crop = prep()
    if crop is None:
        return None
    _force(disp[0])
    times = []
    for _ in range(runs):
        t0 = _time.perf_counter()
        d, _c = prep()
        _force(d[0])
        times.append(_time.perf_counter() - t0)
    t_prep = min(times)

    @jax.jit
    def f_encode(v, i):
        v2, i2 = _cast_for_compute(v, i, compute_dtype)
        return jnp.sum(model.apply(v2, i2, method="encode")[0]
                       .astype(jnp.float32))

    @jax.jit
    def f_splat(v, i, p, va, d0, d1):
        v2, i2 = _cast_for_compute(v, i, compute_dtype)
        fs, z = model.apply(v2, i2, method="encode")
        z = z_for_splat(opt, fs, z)
        (cy0, cx0, _py, _px, hc, wc,
         p_c) = _crop_window(crop, None, p, H, W)
        mm = jnp.zeros((hc, wc), jnp.float32).at[p_c[:, 1], p_c[:, 0]
                                                 ].max(va)
        pack = _baseline_pack_fn(opt, fs, z, p, va, 1.0 - mm, sdt,
                                 positions_c=p_c, crop=(cy0, cx0, hc, wc))

        def frame(_, t):
            alpha = 1.0 - t.astype(jnp.float32) / N
            us, um = pack(d0[t])
            g = (_quad_dual(um, p_c, d0[t], d1[N - t], alpha, 1.0 - alpha,
                            hc, wc) + us).astype(jnp.float32)
            return None, (g[..., :1] / jnp.maximum(g[..., -1:], 1e-8)
                          )[0, 0, :4]

        _, out = jax.lax.scan(frame, None, jnp.arange(N))
        return jnp.sum(out)

    @jax.jit
    def f_full(v, i, p, va, d0, d1):
        return jnp.sum(baseline_rollout_sparse(
            model, v, i, flow, N, p, va, decode_batch=decode_batch,
            compute_dtype=compute_dtype, splat_dtype=splat_dtype,
            crop=crop, disp=(d0, d1)).astype(jnp.float32))

    t_enc, c1 = _best(f_encode, (variables, img), runs)
    t_spl, c2 = _best(f_splat, (variables, img, positions, valid,
                                disp[0], disp[1]), runs)
    t_full, c3 = _best(f_full, (variables, img, positions, valid,
                                disp[0], disp[1]), runs)
    total = t_prep + t_full
    return {
        "t_encoder": t_enc,
        "t_euler_integration": t_prep,
        "t_softmax_splating": max(t_spl - t_enc, 0.0),
        "t_decoder": max(t_full - t_spl, 0.0),
        "total": total,
        "fps": N / total,
        "compile_s": c1 + c2 + c3,
        "crop": tuple(crop),
    }


def format_stages(st: Dict[str, float]) -> str:
    return (f"t_encoder={st['t_encoder']*1000:.0f}ms "
            f"t_euler_integration={st['t_euler_integration']*1000:.0f}ms "
            f"t_softmax_splating={st['t_softmax_splating']*1000:.0f}ms "
            f"t_decoder={st['t_decoder']*1000:.0f}ms "
            f"total={st['total']*1000:.0f}ms fps={st['fps']:.1f} "
            f"(compiles {st['compile_s']:.0f}s)")
