"""Fused on-device inference rollout.

The reference inference loop (``test_animating/test_baseline_4eval.py:239``)
re-integrates the motion field from scratch for every output frame (O(N²)
gathers) and round-trips every frame through the host. Here the whole rollout
is ONE jitted XLA program:

  1. encode the still image once;
  2. integrate the motion field once per direction with ``lax.scan``
     (O(N) gathers), keeping the full displacement stack on device;
  3. ``lax.scan`` over frames: symmetric double-ended softmax splat of the
     packed features, joint normalization, pconv decode;
  4. all N frames return as one device array.

Frame math matches reference ``forward_flow``
(``models/animating_softmax_splating.py:777-981``) with the standard driver
indexing ``batch['index'] = [0, t, N-1]`` (``test_baseline_4eval.py:240``):
forward displacement = t steps of M, backward = N-t steps of -M,
α = 1 - t/N, and the *start* features feed both splat ends (:895).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from slrsfs_tpu.config import Options
from slrsfs_tpu.models.baseline import (
    BaselineModel,
    pack_splat_input,
    splat_blend,
    z_for_splat,
    z_normalize,
)
from slrsfs_tpu.ops import euler_integrate_all, softsplat_sum

Array = jax.Array


def baseline_rollout(model: BaselineModel, variables, img: Array, flow: Array,
                     n_frames: int) -> Array:
    """Render ``n_frames`` frames. img (1, H, W, 3) normalized as trained;
    flow (H, W, 2) in output-resolution pixels. Returns (N, H, W, 3) in
    [-1, 1] (Tanh output)."""
    opt = model.opt
    N = n_frames

    fs, z = model.apply(variables, img, method="encode")
    z = z_for_splat(opt, fs, z)

    disp_f, _ = euler_integrate_all(flow, N - 1)  # (N,   H, W, 2): t steps
    disp_p, _ = euler_integrate_all(-flow, N)     # (N+1, H, W, 2): s steps

    per_frame_znorm = opt.use_softmax_splatter_v2
    if not per_frame_znorm:
        zn = z_normalize(opt, z, None)
        u_packed = pack_splat_input(fs, zn)

    def frame(_, t):
        alpha = 1.0 - t.astype(jnp.float32) / N
        ff = disp_f[t][None]
        fp = disp_p[N - t][None]
        if per_frame_znorm:
            # inference uses ONE Z-norm (from the forward flow) for both ends
            # (reference forward_flow :849-895)
            zn_t = z_normalize(opt, z, ff)
            u = pack_splat_input(fs, zn_t)
        else:
            u = u_packed
        gen_fs = splat_blend(u, ff, alpha, u, fp)
        img_t = model.apply(variables, gen_fs, method="decode")
        return None, img_t[0]

    _, frames = jax.lax.scan(frame, None, jnp.arange(N))
    return frames


def make_jit_rollout(model: BaselineModel, n_frames: int):
    """Jitted rollout closure; (variables, img, flow) -> (N, H, W, 3)."""

    @functools.partial(jax.jit, static_argnums=())
    def run(variables, img, flow):
        return baseline_rollout(model, variables, img, flow, n_frames)

    return run


# ---------------------------------------------------------------------------
# Sparse (moving-pixels-only) rollout — the TPU fast path
# ---------------------------------------------------------------------------
#
# TPU scatter cost is per-update-row. Pixels with exactly-zero motion splat
# onto themselves with weight (1,0,0,0) in every frame (their Euler trajectory
# never moves), so their contribution is the identity U·static_mask and only
# the moving set needs scattering. This is exact, not an approximation.
# Not compatible with per-frame v2 Z-norm (which max-splats over the full
# grid); baseline_rollout_sparse falls back to the dense path in that case.

import numpy as np

from slrsfs_tpu.ops import euler_integrate_compact, softsplat_sum_at


def prepare_scene_sparse(flow_np, pad_multiple: int = 1024):
    """Host-side: indices of moving pixels, padded to a static shape.

    flow_np: (H, W, 2) numpy motion field. Returns (positions (P, 2) int32
    [x, y], valid (P,) float32) with P a multiple of ``pad_multiple``.
    """
    flow_np = np.asarray(flow_np)
    moving = np.any(flow_np != 0.0, axis=-1)
    ys, xs = np.nonzero(moving)
    n = len(xs)
    P = max(pad_multiple, -(-n // pad_multiple) * pad_multiple)
    positions = np.zeros((P, 2), np.int32)
    positions[:n, 0] = xs
    positions[:n, 1] = ys
    valid = np.zeros((P,), np.float32)
    valid[:n] = 1.0
    return positions, valid


def baseline_rollout_sparse(model, variables, img, flow, n_frames: int,
                            positions, valid, decode_batch: int = 6,
                            compute_dtype=jnp.float32):
    """Sparse-splat, frame-batched-decode rollout. Exact equivalent of
    ``baseline_rollout`` when the static set truly has zero motion.

    positions/valid: from ``prepare_scene_sparse``. ``decode_batch`` frames
    are decoded per step (BN uses stored stats, so batching does not change
    results). ``compute_dtype``: bfloat16 selects the speed mode (casts
    params + activations; splat accumulation stays float32).
    """
    opt = model.opt
    N = n_frames
    assert N % decode_batch == 0, (N, decode_batch)
    if opt.use_softmax_splatter_v2:
        return baseline_rollout(model, variables, img, flow, N)

    H, W = flow.shape[0], flow.shape[1]

    if compute_dtype != jnp.float32:
        variables = jax.tree.map(
            lambda a: a.astype(compute_dtype)
            if isinstance(a, jax.Array) and a.dtype == jnp.float32 else a,
            variables,
        )
        img = img.astype(compute_dtype)

    fs, z = model.apply(variables, img, method="encode")
    z = z_for_splat(opt, fs, z)
    zn = z_normalize(opt, z, None)
    u = pack_splat_input(fs, zn)[0].astype(jnp.float32)  # (H, W, C+1)

    # static identity contribution: alpha·U + (1-alpha)·U = U on static pixels
    moving_mask = jnp.zeros((H, W), jnp.float32).at[
        positions[:, 1], positions[:, 0]
    ].max(valid)
    u_static = u * (1.0 - moving_mask)[..., None]

    u_mov = u[positions[:, 1], positions[:, 0]] * valid[:, None]  # (P, C+1)

    disp_f, _ = euler_integrate_compact(flow, positions, N - 1)
    disp_p, _ = euler_integrate_compact(-flow, positions, N)

    def frame(_, t):
        alpha = 1.0 - t.astype(jnp.float32) / N
        g_f = softsplat_sum_at(u_mov, positions, disp_f[t], H, W) * alpha
        g_p = softsplat_sum_at(u_mov, positions, disp_p[N - t], H, W) * (1.0 - alpha)
        g = g_f + g_p + u_static
        norm = jnp.maximum(g[..., -1:], 1e-8)
        return None, (g[..., :-1] / norm).astype(compute_dtype)

    _, gen_fs = jax.lax.scan(frame, None, jnp.arange(N))  # (N, H, W, C)

    def decode_chunk(_, chunk):
        out = model.apply(variables, chunk, method="decode")
        return None, out

    chunks = gen_fs.reshape(N // decode_batch, decode_batch, H, W, gen_fs.shape[-1])
    _, frames = jax.lax.scan(decode_chunk, None, chunks)
    return frames.reshape(N, H, W, 3).astype(jnp.float32)
