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
