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
from slrsfs_tpu.ops import euler_integrate_all_dual, softsplat_sum

Array = jax.Array


def _auto_decode_batch(n_frames: int, decode_batch: Optional[int]) -> int:
    """Largest divisor of n_frames ≤ 20 unless explicitly given. Per-frame
    (batch-1) decoding wastes most of the device on dispatch overhead and
    short convs; BN uses stored stats at inference so frame-batching is
    bit-identical."""
    if decode_batch is not None:
        assert n_frames % decode_batch == 0, (n_frames, decode_batch)
        return decode_batch
    db = min(n_frames, 20)
    while n_frames % db:
        db -= 1
    return db


def baseline_rollout(model: BaselineModel, variables, img: Array, flow: Array,
                     n_frames: int, decode_batch: Optional[int] = None) -> Array:
    """Render ``n_frames`` frames. img (1, H, W, 3) normalized as trained;
    flow (H, W, 2) in output-resolution pixels. Returns (N, H, W, 3) in
    [-1, 1] (Tanh output).

    Dense path (every pixel splatted); supports every Z-norm variant
    including the per-frame v2 maximum-warp-norm. The splat scan emits the
    full warped-feature stack, then frames are decoded in batches of
    ``decode_batch`` (auto-picked divisor of N) — identical results to
    per-frame decoding, far better device utilization."""
    opt = model.opt
    N = n_frames

    fs, z = model.apply(variables, img, method="encode")
    z = z_for_splat(opt, fs, z)

    # both directions in one scan (one 2HW-row gather per step)
    disp_f, disp_p = euler_integrate_all_dual(flow, N - 1, N)

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
        return None, gen_fs[0]

    _, gen_all = jax.lax.scan(frame, None, jnp.arange(N))

    db = _auto_decode_batch(N, decode_batch)
    H, W, C = gen_all.shape[1:]

    def dec(_, chunk):
        return None, model.apply(variables, chunk, method="decode")

    _, frames = jax.lax.scan(dec, None, gen_all.reshape(N // db, db, H, W, C))
    return frames.reshape(N, H, W, frames.shape[-1])


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
# The per-frame v2 Z-norm (max-splat over the grid) obeys the same
# invariant: static pixels' max-splat/inverse-gather contributions reduce to
# fixed stencils, so only the moving set scatters
# (ops/splat.py:maximum_warp_norm_sparse).

import numpy as np

from slrsfs_tpu.ops import euler_integrate_compact, euler_integrate_compact_dual

# shared jit wrapper (cached by (P, N) bucket) for scene-prep integration
_integrate_jit = jax.jit(euler_integrate_compact_dual, static_argnums=(2, 3))
# quad-packed scatter: one update row per source pixel (ops/splat.py)
from slrsfs_tpu.ops.splat import (
    softsplat_sum_at_quad as softsplat_sum_at,
    softsplat_sum_at_quad_dual,
)


def geometric_bucket(n: int, pad_multiple: int, bucket_ratio: float,
                     cap: int) -> int:
    """Round ``n`` up onto the geometric series {pad_multiple·⌈ratio^k⌉}
    (quantized to pad_multiple, capped at ``cap``): O(log(cap)/log(ratio))
    distinct sizes, so shape-keyed jit caches see a bounded set of programs
    while padding waste stays ≤ (ratio − 1). Shared by the inference
    moving-set prep (below) and the training moving-set bucketing
    (cli/train.py:attach_moving_sets)."""
    target = max(pad_multiple, -(-n // pad_multiple) * pad_multiple)
    cap = max(pad_multiple, -(-cap // pad_multiple) * pad_multiple)
    b = pad_multiple
    while b < min(target, cap):
        # max(..., b + pad_multiple) forces monotone progress: a ratio
        # in (1.0, 1 + 1/pad_multiple) would otherwise round back to b
        # and loop forever
        b = min(cap, max(b + pad_multiple,
                         -(-int(b * bucket_ratio) // pad_multiple)
                         * pad_multiple))
    return b


def prepare_scene_sparse(flow_np, pad_multiple: int = 1024,
                         bucket_ratio: float = None):
    """Host-side: indices of moving pixels, padded to a static shape.

    flow_np: (H, W, 2) numpy motion field. Returns (positions (P, 2) int32
    [x, y], valid (P,) float32) with P a multiple of ``pad_multiple``.

    ``bucket_ratio`` (e.g. 1.25) additionally rounds P up to a fixed
    geometric series {pad_multiple·⌈ratio^k⌉}, capped at H·W: a multi-scene
    sweep then maps every scene onto O(log(H·W)/log(ratio)) rollout shapes
    instead of one per scene (the jit cache is keyed by P), trading ≤
    (ratio−1) extra padded scatter rows — ~17-27 ns each, GAPS.md cost
    model — for a ~25-50 s compile per otherwise-novel shape."""
    flow_np = np.asarray(flow_np)
    moving = np.any(flow_np != 0.0, axis=-1)
    ys, xs = np.nonzero(moving)
    n = len(xs)
    P = max(pad_multiple, -(-n // pad_multiple) * pad_multiple)
    if bucket_ratio is not None and bucket_ratio > 1.0:
        P = geometric_bucket(n, pad_multiple, bucket_ratio, moving.size)
    positions = np.zeros((P, 2), np.int32)
    positions[:n, 0] = xs
    positions[:n, 1] = ys
    valid = np.zeros((P,), np.float32)
    valid[:n] = 1.0
    return positions, valid


# ---------------------------------------------------------------------------
# Moving-region cropped decode (exact, receptive-field-haloed)
# ---------------------------------------------------------------------------
#
# Splatted features are normalized POINTWISE, so at every pixel no moving
# source can reach, the normalized field equals the encoder features exactly
# (numerator and denominator share the same e^Z factor). The decoders are
# convolutional stacks with a bounded receptive field (two 3x3 convs per
# block, 3x3/s2 pools, bilinear 2x ups — all local), so frames differ from a
# single frame-independent "static decode" only within the splat-target
# bounding box dilated by the receptive radius. The crop rollout exploits
# this: decode the full frame once, then per frame splat+decode only the
# target bbox + a 2-radius halo and paste the bbox + 1-radius interior —
# bit-comparable to the full-frame rollout (same math on the same operands),
# at cost proportional to the moving region, not the frame.

from typing import NamedTuple


class CropSpec(NamedTuple):
    """Static per-scene crop plan. (y0, x0, hc, wc) is the splat+decode
    window; (py0, px0, ph, pw) the pasted interior, both in absolute frame
    coordinates with paste ⊂ crop."""

    y0: int
    x0: int
    hc: int
    wc: int
    py0: int
    px0: int
    ph: int
    pw: int


def decoder_receptive_radius(arch) -> int:
    """Upper bound (full-res pixels) on a ResNet decoder's receptive-field
    radius: two 3x3 convs per block at the block's input scale, +1 for the
    3x3/s2 pool window of Down blocks and the 2-tap bilinear read of Up
    blocks. +2 slack for pooled-edge rounding."""
    scale, r = 1, 0
    for mode in arch["upsample"]:
        r += 2 * scale
        if mode == "Down":
            r += scale
            scale *= 2
        elif mode == "Up":
            r += scale
            scale = max(1, scale // 2)
    return r + 2


def crop_alignment(arch) -> int:
    """Crop offsets/sizes must be multiples of the deepest cumulative
    downsampling factor so the cropped pooling/upsampling grids coincide
    with the full-frame ones."""
    cur = peak = 1
    for mode in arch["upsample"]:
        if mode == "Down":
            cur *= 2
        elif mode == "Up":
            cur = max(1, cur // 2)
        peak = max(peak, cur)
    return peak


def model_crop_params(opt, slr: bool):
    """(receptive radius, alignment) over every decoder the rollout runs."""
    from slrsfs_tpu.nn.archs import get_resnet_arch

    keys = [opt.refine_model_type]
    if slr:
        keys.append(opt.alpha_refine_model_type)
    archs = [get_resnet_arch(k, opt) for k in keys]
    return (max(decoder_receptive_radius(a) for a in archs),
            max(crop_alignment(a) for a in archs))


@functools.partial(jax.jit, static_argnums=(4, 5))
def _target_bounds(positions, valid, disp_f, disp_p, height, width):
    """Device reduction → [xlo, xhi, ylo, yhi]: inclusive bbox of every
    bilinear splat tap of every valid moving pixel over all frames (targets
    clipped to the grid; OOB/invalid-marker displacements contribute
    nothing, exactly like the splat's validity weights)."""
    ok = (valid > 0.5)[None]
    posf = positions.astype(jnp.float32)

    def ax(axis, size):
        t = (jnp.concatenate([disp_f[..., axis], disp_p[..., axis]], axis=0)
             + posf[:, axis][None])
        # a target at t has bilinear taps floor(t), floor(t)+1; it reaches
        # the grid only when t ∈ (-1, size). Fully-OOB targets — including
        # sticky-invalid trajectories, whose disp is the max(H,W)+1 marker —
        # get zero validity weight in the splat, so they must not inflate
        # the bbox (exit-heavy scenes would otherwise lose the crop win).
        m = ok & (t > -1.0) & (t < size)
        t = jnp.clip(t, 0.0, size - 1.0)
        lo = jnp.floor(jnp.min(jnp.where(m, t, size - 1.0)))
        hi = jnp.floor(jnp.max(jnp.where(m, t, 0.0))) + 1.0
        return lo, jnp.minimum(hi, size - 1.0)

    xlo, xhi = ax(0, width)
    ylo, yhi = ax(1, height)
    return jnp.stack([xlo, xhi, ylo, yhi])


def _axis_window(lo_t, hi_t, size, radius, align):
    p_lo = max(0, lo_t - radius)
    p_hi = min(size - 1, hi_t + radius)
    c_lo = max(0, p_lo - radius)
    c_lo -= c_lo % align
    c_hi = min(size, p_hi + radius + 1)
    c_hi = -(-c_hi // align) * align  # size % align == 0 ⇒ c_hi ≤ size
    return c_lo, c_hi - c_lo, p_lo, p_hi - p_lo + 1


def plan_crop(bounds, height, width, radius, align,
              max_area_frac: float = 0.85, bucket: int = 32):
    """CropSpec from `_target_bounds` output, or None when cropping is
    impossible (misaligned frame) or not worth it (crop ≥ max_area_frac of
    the frame).

    ``bucket`` quantizes the target bbox outward to multiples of `bucket`
    before the window math, so nearby scenes share one CropSpec — every
    CropSpec field is a static jit constant, so without bucketing a
    multi-scene sweep would recompile the rollout per scene. A larger crop
    is still exact (the window only ever over-covers the true bbox)."""
    if height % align or width % align:
        return None
    xlo, xhi, ylo, yhi = [int(v) for v in np.asarray(bounds)]
    # no splat tap ever reaches the grid (all-static scene / everything
    # sparsified away): _target_bounds returns inverted sentinels — every
    # frame equals the static decode, crop is pointless (and the window
    # math would go negative)
    if xhi < xlo or yhi < ylo:
        return None
    if bucket > 1:
        xlo, ylo = xlo - xlo % bucket, ylo - ylo % bucket
        xhi = min(width - 1, xhi + (-xhi - 1) % bucket)
        yhi = min(height - 1, yhi + (-yhi - 1) % bucket)
    x0, wc, px0, pw = _axis_window(xlo, xhi, width, radius, align)
    y0, hc, py0, ph = _axis_window(ylo, yhi, height, radius, align)
    if min(hc, wc, ph, pw) <= 0:  # belt-and-suspenders vs degenerate math
        return None
    if hc * wc >= max_area_frac * height * width:
        return None
    return CropSpec(y0, x0, hc, wc, py0, px0, ph, pw)


def prepare_crop(opt, slr, flow, positions, valid, n_frames,
                 max_area_frac: float = 0.85, bucket: int = 32):
    """Integrate the scene once and plan its crop.

    Returns ``(disp, crop)``: ``disp = (disp_f, disp_p)`` device stacks to
    pass to the sparse rollouts (which then skip their own integration) and
    ``crop`` a CropSpec or None. One extra device→host transfer of 4 floats.
    """
    N = n_frames
    H, W = flow.shape[0], flow.shape[1]
    disp_f, disp_p = _integrate_jit(flow, positions, N - 1, N)
    radius, align = model_crop_params(opt, slr)
    bounds = _target_bounds(positions, valid, disp_f, disp_p, H, W)
    crop = plan_crop(bounds, H, W, radius, align,
                     max_area_frac=max_area_frac, bucket=bucket)
    return (disp_f, disp_p), crop



def _static_zn_full(opt, z, positions, valid, height, width):
    """Frame-constant Z-norm of the STATIC field on the full grid.

    non-v2: the global z_normalize (what the pack uses). v2: the
    maximum-warp-norm's static-only stencil — moving rows disabled
    (valid=0, disp=0); exact outside the splat-target bbox, and inside it
    the paste overwrites the static decode anyway."""
    from slrsfs_tpu.models.baseline import z_normalize

    if not opt.use_softmax_splatter_v2:
        return z_normalize(opt, z, None)[0]
    from slrsfs_tpu.ops.splat import maximum_warp_norm_sparse

    z2d = z[0, ..., 0].astype(jnp.float32)
    moving = jnp.zeros((height, width), jnp.float32).at[
        positions[:, 1], positions[:, 0]].max(valid)
    zmax_d, _ = maximum_warp_norm_sparse(
        z2d, 1.0 - moving, z2d[positions[:, 1], positions[:, 0]],
        positions, jnp.zeros_like(valid),
        jnp.zeros((positions.shape[0], 2), jnp.float32), height, width)
    zn = z2d - zmax_d
    if not opt.no_clamp_Z:
        zn = jnp.clip(zn, -20.0, 20.0)
    return zn[..., None]


def _baseline_static_decode_input(opt, fs, z, positions, valid,
                                  height, width, splat_dtype):
    """Full-grid frame-independent NORMALIZED splat field for the crop
    rollout's static decode.

    decode(fs) would be exact only while e^zn stays above NORM_EPS: the Z
    clamp allows zn = −20 < ln(1e-8), where the full-frame path outputs
    fs·e^zn/NORM_EPS — NOT fs. This mirrors the per-frame static math
    bit-for-bit, including the splat_dtype rounding of the packed rows."""
    from slrsfs_tpu.models.baseline import NORM_EPS

    zn = _static_zn_full(opt, z, positions, valid, height, width)
    e = jnp.exp(zn.astype(jnp.float32))
    u = jnp.concatenate([fs[0].astype(jnp.float32) * e, e], axis=-1)
    u = u.astype(splat_dtype).astype(jnp.float32)
    return (u[..., :-1] / jnp.maximum(u[..., -1:], NORM_EPS))[None]


def _cast_for_compute(variables, img, compute_dtype):
    """Cast f32 params/activations to the compute dtype (bf16 speed mode)."""
    if compute_dtype == jnp.float32:
        return variables, img
    variables = jax.tree.map(
        lambda a: a.astype(compute_dtype)
        if hasattr(a, "dtype") and a.dtype == jnp.float32 else a,
        variables,
    )
    return variables, img.astype(compute_dtype)


def _crop_slice(a, crop):
    """Slice leading (H, W) dims of a 2-/3-D array to the crop window
    ``(y0, x0, hc, wc)``. Sizes are static; offsets may be TRACED scalars
    (jax.lax.dynamic_slice), so every same-size window shares one compiled
    program — a sweep's scenes differ in where the moving region sits far
    more often than in its bucketed size."""
    if crop is None:
        return a
    y0, x0, hc, wc = crop
    if a.ndim == 2:
        return jax.lax.dynamic_slice(a, (y0, x0), (hc, wc))
    return jax.lax.dynamic_slice(a, (y0, x0, 0), (hc, wc, a.shape[-1]))


def _crop_scalars(crop: "CropSpec", crop_offsets):
    """(y0, x0, py0, px0) — from the traced ``crop_offsets`` vector when
    given (compile-shared offsets), else the CropSpec's static ints."""
    if crop_offsets is None:
        return crop.y0, crop.x0, crop.py0, crop.px0
    return (crop_offsets[0], crop_offsets[1],
            crop_offsets[2], crop_offsets[3])


def _crop_window(crop, crop_offsets, positions, height, width):
    """Shared crop-window setup for every rollout family.

    Returns (cy0, cx0, cpy0, cpx0, hc, wc, positions_c): window offsets
    (static ints, or traced scalars via ``crop_offsets``), static window
    sizes, and the moving positions shifted into window coordinates."""
    if crop is None:
        return 0, 0, 0, 0, height, width, positions
    hc, wc = crop.hc, crop.wc
    cy0, cx0, cpy0, cpx0 = _crop_scalars(crop, crop_offsets)
    positions_c = positions - jnp.stack(
        [jnp.asarray(cx0, jnp.int32), jnp.asarray(cy0, jnp.int32)])[None]
    return cy0, cx0, cpy0, cpx0, hc, wc, positions_c


def _baseline_pack_fn(opt, fs, z, positions, valid, static_mask, splat_dtype,
                      positions_c=None, crop=None):
    """Per-frame packed-splat-input builder shared by the sparse and
    frame-sharded baseline rollouts.

    Returns ``pack(t_disp) -> (u_static (H, W, C+1), u_mov (P, C+1))``. For
    non-v2 Z-norms the packed rows are frame-constant (t_disp ignored,
    closure constants); with ``use_softmax_splatter_v2`` the per-frame
    maximum-warp-norm runs sparsely from the moving set
    (ops/splat.py:maximum_warp_norm_sparse) — only e^zn changes per frame,
    so the feature gathers are cached and rows are rebuilt per call.

    With ``crop`` (CropSpec-style (y0, x0, hc, wc) prefix), ``static_mask``
    lives on the crop grid and the returned dense halves are cropped; the
    moving-set gathers stay full-grid (true ``positions``) while scatter
    coordinates use ``positions_c`` (crop-shifted). Exact because no moving
    splat tap lands outside the crop by construction (plan_crop)."""
    if positions_c is None:
        positions_c = positions
    H, W = static_mask.shape
    if not opt.use_softmax_splatter_v2:
        zn = z_normalize(opt, z, None)
        u = pack_splat_input(fs, zn)[0]  # (H, W, C+1) full grid
        # static identity: alpha·U + (1-alpha)·U = U on static pixels
        u_static = (_crop_slice(u, crop)
                    * static_mask[..., None]).astype(splat_dtype)
        u_mov = (u[positions[:, 1], positions[:, 0]]
                 * valid[:, None]).astype(splat_dtype)  # (P, C+1)
        return lambda t_disp: (u_static, u_mov)

    from slrsfs_tpu.ops.splat import maximum_warp_norm_sparse

    z2d_full = z[0, ..., 0].astype(jnp.float32)
    z_mov = z2d_full[positions[:, 1], positions[:, 0]]
    z2d = _crop_slice(z2d_full, crop)
    fs_static = (_crop_slice(fs[0], crop).astype(jnp.float32)
                 * static_mask[..., None])
    fs_mov = (fs[0][positions[:, 1], positions[:, 0]]
              .astype(jnp.float32) * valid[:, None])

    def v2_pack(t_disp):
        zmax_d, zmax_m = maximum_warp_norm_sparse(
            z2d, static_mask, z_mov, positions_c, valid, t_disp, H, W)
        zn_d = z2d - zmax_d
        zn_m = z_mov - zmax_m
        if not opt.no_clamp_Z:
            zn_d = jnp.clip(zn_d, -20.0, 20.0)
            zn_m = jnp.clip(zn_m, -20.0, 20.0)
        e_d = (jnp.exp(zn_d) * static_mask)[..., None]
        e_m = (jnp.exp(zn_m) * valid)[:, None]
        u_static_t = jnp.concatenate(
            [fs_static * e_d, e_d], axis=-1).astype(splat_dtype)
        u_mov_t = jnp.concatenate(
            [fs_mov * e_m, e_m], axis=-1).astype(splat_dtype)
        return u_static_t, u_mov_t

    return v2_pack


def baseline_rollout_sparse(model, variables, img, flow, n_frames: int,
                            positions, valid, decode_batch: int = 6,
                            compute_dtype=jnp.float32, splat_dtype=None,
                            crop: Optional[CropSpec] = None, disp=None,
                            crop_offsets=None):
    """Sparse-splat, frame-batched-decode rollout. Exact equivalent of
    ``baseline_rollout`` when the static set truly has zero motion.

    positions/valid: from ``prepare_scene_sparse``. ``decode_batch`` frames
    are decoded per step (BN uses stored stats, so batching does not change
    results). ``compute_dtype``: bfloat16 selects the speed mode (casts
    params + activations; splat accumulation stays float32 unless
    ``splat_dtype`` overrides it). ``splat_dtype=bfloat16`` is the opt-in
    FAST splat mode: the scatter buffer (the per-frame bandwidth hot spot,
    ~390 MB/frame at 480x256 in f32) accumulates in bf16 — bilinear weights
    and the final normalization stay f32. Breaks 1e-5 parity with the dense
    reference path; rendered frames agree to ~1e-2 (tanh [-1,1] scale).

    ``crop`` (from ``prepare_crop``/``plan_crop``): splat+decode only the
    moving-region window and paste onto one full-frame static decode —
    exact (see the crop section header), cost ∝ window area. ``disp``:
    precomputed ``(disp_f, disp_p)`` stacks (skips in-graph integration;
    ``prepare_crop`` already computed them). ``crop_offsets``: optional
    TRACED (4,) int vector [y0, x0, py0, px0] overriding the CropSpec's
    offsets — only the window SIZES stay compile-time constants, so a
    sweep's scenes share one compiled program per bucketed size.
    """
    opt = model.opt
    N = n_frames
    assert N % decode_batch == 0, (N, decode_batch)

    H, W = flow.shape[0], flow.shape[1]

    variables, img = _cast_for_compute(variables, img, compute_dtype)
    splat_dtype = jnp.dtype(splat_dtype or jnp.float32)

    fs, z = model.apply(variables, img, method="encode")
    z = z_for_splat(opt, fs, z)

    (cy0, cx0, cpy0, cpx0, hc, wc,
     positions_c) = _crop_window(crop, crop_offsets, positions, H, W)
    moving_mask = jnp.zeros((hc, wc), jnp.float32).at[
        positions_c[:, 1], positions_c[:, 0]
    ].max(valid)
    static_mask = 1.0 - moving_mask

    pack = _baseline_pack_fn(opt, fs, z, positions, valid, static_mask,
                             splat_dtype, positions_c=positions_c,
                             crop=None if crop is None
                             else (cy0, cx0, hc, wc))

    if disp is None:
        # both directions in one scan (halves the fixed per-step overhead)
        disp_f, disp_p = euler_integrate_compact_dual(flow, positions,
                                                      N - 1, N)
    else:
        disp_f, disp_p = disp

    def frame(_, t):
        alpha = 1.0 - t.astype(jnp.float32) / N
        # v2: one Z-norm from the forward flow feeds both ends (reference
        # forward_flow :849-895)
        u_static_t, u_mov_t = pack(disp_f[t])
        # both ends in ONE scatter op (per-op overhead dominates; splat.py)
        g = (softsplat_sum_at_quad_dual(
            u_mov_t, positions_c, disp_f[t], disp_p[N - t],
            alpha, 1.0 - alpha, hc, wc) + u_static_t).astype(jnp.float32)
        norm = jnp.maximum(g[..., -1:], 1e-8)
        return None, (g[..., :-1] / norm).astype(compute_dtype)

    # fused chunking: splat decode_batch frames (inner scan), decode them,
    # next chunk — the full (N, H, W, C) warped stack (4.5 GB at 768²
    # bf16) never materializes, which is what allowed decode_batch ≥ 20 at
    # 768² (db=20 OOMed with the two-phase stack: 18.5 G needed of 15.75 G)
    def chunk_body(_, tc):
        _, gen_chunk = jax.lax.scan(frame, None, tc)  # (db, hc, wc, C)
        out = model.apply(variables, gen_chunk, method="decode")
        if crop is not None:
            out = jax.lax.dynamic_slice(
                out, (0, cpy0 - cy0, cpx0 - cx0, 0),
                (out.shape[0], crop.ph, crop.pw, out.shape[-1]))
        return None, out

    _, frames = jax.lax.scan(
        chunk_body, None, jnp.arange(N).reshape(N // decode_batch,
                                                decode_batch))
    if crop is None:
        return frames.reshape(N, H, W, 3).astype(jnp.float32)

    # static frame: the normalized splat field is frame-constant wherever
    # no moving tap lands, so ONE full-frame decode covers everything
    # outside the paste window. The field is fs·e^zn/max(e^zn, NORM_EPS) —
    # equal to fs except where the epsilon floor engages (zn < ln(1e-8))
    dec_static = model.apply(
        variables,
        _baseline_static_decode_input(opt, fs, z, positions, valid, H, W,
                                      splat_dtype).astype(compute_dtype),
        method="decode")[0]
    full = jnp.broadcast_to(dec_static.astype(jnp.float32), (N, H, W, 3))
    patch = frames.reshape(N, crop.ph, crop.pw, 3).astype(jnp.float32)
    return jax.lax.dynamic_update_slice(
        full, patch, (0, jnp.asarray(cpy0), jnp.asarray(cpx0), 0))


# ---------------------------------------------------------------------------
# SLR two-layer rollout
# ---------------------------------------------------------------------------

from slrsfs_tpu.models.slr import (
    ALPHA_MAX,
    ALPHA_MIN,
    slr_composite,
    slr_pack_splat_input,
    slr_unpack_splatted,
)


def gaussian_blur_region(mask: jax.Array, W: int) -> jax.Array:
    """Edit-region soft mask (reference 2layers forward_flow :867-906):
    gaussian blur with kernel W//20 (made odd), sigma W//50, replicate pad.
    mask: (B, H, W, 1)."""
    k = W // 20
    if k % 2 == 0:
        k += 1
    sigma = max(W // 50, 1)
    xs = jnp.arange(k, dtype=jnp.float32)
    g2 = jnp.exp(
        -((xs[:, None] - (k - 1) / 2.0) ** 2 + (xs[None, :] - (k - 1) / 2.0) ** 2)
        / (2.0 * sigma**2)
    )
    g2 = g2 / jnp.sum(g2)
    kern = g2[:, :, None, None]
    p = k // 2
    padded = jnp.pad(mask, ((0, 0), (p, p), (p, p), (0, 0)), mode="edge")
    return jax.lax.conv_general_dilated(
        padded, kern, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def _alpha_extras(opt, img, flow, bg_img_raw, mask_rock):
    """kwargs for SLRModel.alpha_encode per the use_*_as_alpha_input flags
    (reference forward_flow :930-936). mask_rock defaults to zeros when a
    checkpoint trained with the flag gets no mask at render time."""
    kw = {}
    if opt.use_motion_as_alpha_input:
        kw["motion"] = flow[None].astype(img.dtype)
    if opt.use_mask_as_alpha_input:
        m = (mask_rock if mask_rock is not None
             else jnp.zeros(flow.shape[:2] + (1,), jnp.float32))
        if m.ndim == 3:
            m = m[None]
        kw["mask_rock"] = m.astype(img.dtype)
    if opt.use_bg_as_alpha_input:
        kw["bg_raw"] = bg_img_raw.astype(img.dtype)
    return kw


def _slr_pack_fn(opt, fs, z, a_fl_logits, a_bg_sig, positions, valid,
                 static_mask, splat_dtype, positions_c=None, crop=None):
    """Per-frame packed-splat-input builder for the two-layer SLR rollouts
    (shared by sparse and frame-sharded paths).

    Returns (``pack(t_disp) -> (u_static, u_mov)``, use_alpha0, u_full):
    ``u_full`` is the full-grid frame-independent packed field (f32), whose
    pointwise-normalized unpack is every frame's exact value wherever no
    moving splat tap lands — the crop rollout decodes it once as the static
    frame. Non-v2: frame-constant closure. v2: per-frame sparse
    maximum-warp-norm — the packed tensor is (base channels)·e^zn on the
    Z-scaled channels only, so base (zn = 0) is cached and rows are rebuilt
    per call. Crop semantics as in ``_baseline_pack_fn``."""
    from slrsfs_tpu.models.baseline import z_normalize

    if positions_c is None:
        positions_c = positions
    H, W = static_mask.shape
    if not opt.use_softmax_splatter_v2:
        zn = z_normalize(opt, z, None)
        u, use_alpha0 = slr_pack_splat_input(
            opt, fs.astype(jnp.float32), zn.astype(jnp.float32),
            a_fl_logits.astype(jnp.float32), a_bg_sig,
        )
        u = u[0]  # (H, W, C) full grid, f32
        u_static = (_crop_slice(u, crop)
                    * static_mask[..., None]).astype(splat_dtype)
        u_mov = (u[positions[:, 1], positions[:, 0]]
                 * valid[:, None]).astype(splat_dtype)
        return (lambda t_disp: (u_static, u_mov)), use_alpha0, u

    from slrsfs_tpu.ops.splat import maximum_warp_norm_sparse

    base, use_alpha0 = slr_pack_splat_input(
        opt, fs.astype(jnp.float32),
        jnp.zeros_like(z, dtype=jnp.float32),
        a_fl_logits.astype(jnp.float32), a_bg_sig,
    )
    base = base[0]  # (H, W, C) full grid
    C = base.shape[-1]
    nfs = C - 3 if use_alpha0 else C - 2
    # channels scaled by e^Z: [fs·e^Z, af·e^C, e^C, e^Z] / [.., af·e^Z, e^Z]
    sel = (jnp.array([1.0] * nfs + [0.0, 0.0, 1.0], jnp.float32)
           if use_alpha0 else jnp.ones((C,), jnp.float32))
    base_static = _crop_slice(base, crop) * static_mask[..., None]
    base_mov = base[positions[:, 1], positions[:, 0]] * valid[:, None]
    z2d_full = z[0, ..., 0].astype(jnp.float32)
    z_mov = z2d_full[positions[:, 1], positions[:, 0]]
    z2d = _crop_slice(z2d_full, crop)

    def v2_pack(t_disp):
        zmax_d, zmax_m = maximum_warp_norm_sparse(
            z2d, static_mask, z_mov, positions_c, valid, t_disp, H, W)
        zn_d = z2d - zmax_d
        zn_m = z_mov - zmax_m
        if not opt.no_clamp_Z:
            zn_d = jnp.clip(zn_d, -20.0, 20.0)
            zn_m = jnp.clip(zn_m, -20.0, 20.0)
        e_d = jnp.exp(zn_d)[..., None] * sel + (1.0 - sel)
        e_m = jnp.exp(zn_m)[:, None] * sel + (1.0 - sel)
        return ((base_static * e_d).astype(splat_dtype),
                (base_mov * e_m).astype(splat_dtype))

    return v2_pack, use_alpha0, base


def slr_rollout_sparse(model, variables, img, flow, n_frames: int,
                       positions, valid, bg_img_raw=None,
                       alpha_region=None, decode_batch: int = 20,
                       compute_dtype=jnp.float32, mask_rock=None,
                       splat_dtype=None, crop: Optional[CropSpec] = None,
                       disp=None, crop_offsets=None):
    """Two-layer SLR rollout (reference test_v1_4eval*.py driver semantics):
    encode + background + alpha head once, per frame symmetric double-ended
    splat of [features, fluid-alpha], decode fluid image and refined alpha,
    composite over the background.

    ``splat_dtype=bfloat16`` is the opt-in FAST splat mode (see
    ``baseline_rollout_sparse``): scatter accumulation in bf16, weights and
    normalization in f32. ``crop``/``disp``/``crop_offsets``:
    moving-region cropped decode, precomputed displacement stacks, and
    traced window offsets — see ``baseline_rollout_sparse``.

    Returns dict of stacked (N, H, W, C) outputs: PredImg, FluidImg,
    CompositeFluidAlpha (+ BGImg (H, W, 3)).
    """
    opt = model.opt
    N = n_frames
    assert N % decode_batch == 0, (N, decode_batch)
    H, W = flow.shape[0], flow.shape[1]

    variables, img = _cast_for_compute(variables, img, compute_dtype)

    fs, z = model.apply(variables, img, method="encode")
    from slrsfs_tpu.models.baseline import z_for_splat

    z = z_for_splat(opt, fs, z)

    if bg_img_raw is None:
        bg_img_raw = model.apply(variables, img, method="bg")
    bg_tanh = jnp.tanh(bg_img_raw.astype(jnp.float32))

    a_bg_logits, a_fl_logits = model.apply(
        variables, img, method="alpha_encode",
        **_alpha_extras(opt, img, flow, bg_img_raw, mask_rock))
    a_bg_logits = a_bg_logits.astype(jnp.float32)
    a_bg_sig = jax.nn.sigmoid(a_bg_logits)

    splat_dtype = jnp.dtype(splat_dtype or jnp.float32)
    (cy0, cx0, cpy0, cpx0, hc, wc,
     positions_c) = _crop_window(crop, crop_offsets, positions, H, W)
    moving_mask = jnp.zeros((hc, wc), jnp.float32).at[
        positions_c[:, 1], positions_c[:, 0]
    ].max(valid)
    static_mask = 1.0 - moving_mask

    pack, use_alpha0, u_full = _slr_pack_fn(
        opt, fs, z, a_fl_logits, a_bg_sig, positions, valid, static_mask,
        splat_dtype, positions_c=positions_c,
        crop=None if crop is None else (cy0, cx0, hc, wc))

    if disp is None:
        # both directions in one scan (halves the fixed per-step overhead)
        disp_f, disp_p = euler_integrate_compact_dual(flow, positions,
                                                      N - 1, N)
    else:
        disp_f, disp_p = disp

    def frame(_, t):
        alpha = jnp.clip(1.0 - t.astype(jnp.float32) / N, ALPHA_MIN, ALPHA_MAX)
        # v2: one Z-norm from the forward flow feeds both ends
        u_static_t, u_mov_t = pack(disp_f[t])
        g = (softsplat_sum_at_quad_dual(
            u_mov_t, positions_c, disp_f[t], disp_p[N - t],
            alpha, 1.0 - alpha, hc, wc) + u_static_t)[None].astype(jnp.float32)
        gen_fs, af_warped = slr_unpack_splatted(g, use_alpha0)
        return None, (gen_fs[0].astype(compute_dtype),
                      af_warped[0].astype(compute_dtype))

    region = None
    if alpha_region is not None:
        region = gaussian_blur_region(alpha_region.astype(jnp.float32), W)

    if crop is None:
        # fused chunking (see baseline_rollout_sparse): splat db frames,
        # decode them, next chunk — no full warped stack in HBM
        img_b = jnp.broadcast_to(img, (decode_batch,) + img.shape[1:])

        def chunk_body(_, tc):
            _, (cf, ca) = jax.lax.scan(frame, None, tc)
            return None, _slr_decode_chunk(model, variables, cf, ca, img_b,
                                           a_bg_sig, a_bg_logits, bg_tanh,
                                           region, opt)

        _, (gen, fluid, comp_alpha) = jax.lax.scan(
            chunk_body, None, jnp.arange(N).reshape(N // decode_batch,
                                                    decode_batch))
        return {
            "PredImg": gen.reshape(N, H, W, 3),
            "FluidImg": fluid.reshape(N, H, W, 3),
            "CompositeFluidAlpha": comp_alpha.reshape(N, H, W, 1),
            "BGImg": bg_tanh[0],
        }

    # --- cropped decode: per-frame work on the crop window only -----------
    def cr(a):  # crop leading spatial dims of a batched (1, H, W, C) array
        return jax.lax.dynamic_slice(
            a, (0, cy0, cx0, 0), (a.shape[0], hc, wc, a.shape[-1]))

    img_c, a_bg_sig_c, a_bg_logits_c, bg_tanh_c = (
        cr(img), cr(a_bg_sig), cr(a_bg_logits), cr(bg_tanh))
    region_c = None if region is None else cr(region)
    img_b = jnp.broadcast_to(img_c, (decode_batch,) + img_c.shape[1:])

    def chunk_body(_, tc):
        _, (cf, ca) = jax.lax.scan(frame, None, tc)
        gen, fluid, comp_alpha = _slr_decode_chunk(
            model, variables, cf, ca, img_b, a_bg_sig_c, a_bg_logits_c,
            bg_tanh_c, region_c, opt)
        oy, ox = cpy0 - cy0, cpx0 - cx0
        return None, tuple(
            jax.lax.dynamic_slice(a, (0, oy, ox, 0),
                                  (a.shape[0], crop.ph, crop.pw, a.shape[-1]))
            for a in (gen, fluid, comp_alpha))

    _, (gen, fluid, comp_alpha) = jax.lax.scan(
        chunk_body, None, jnp.arange(N).reshape(N // decode_batch,
                                                decode_batch))

    # static frame: the frame-independent packed field u_full normalizes
    # pointwise to every frame's exact value outside the paste window —
    # decode + composite it ONCE at full frame. v2 packs u_full with
    # zn = 0, so re-apply the static-stencil e^zn on the Z-scaled channels
    # (sel) — without it the NORM_EPS floor (zn < ln(1e-8), reachable
    # under the ±20 clamp) would diverge from the per-frame path. The
    # splat_dtype round-trip mirrors the per-frame rows bit-for-bit.
    u_st = u_full
    if opt.use_softmax_splatter_v2:
        C = u_full.shape[-1]
        nfs = C - 3 if use_alpha0 else C - 2
        sel = (jnp.array([1.0] * nfs + [0.0, 0.0, 1.0], jnp.float32)
               if use_alpha0 else jnp.ones((C,), jnp.float32))
        zn_st = _static_zn_full(opt, z, positions, valid, H, W)
        e_st = jnp.exp(zn_st.astype(jnp.float32)) * sel + (1.0 - sel)
        u_st = u_full * e_st
    u_st = u_st.astype(splat_dtype).astype(jnp.float32)
    gen_fs_st, af_st = slr_unpack_splatted(u_st[None], use_alpha0)
    gen_st, fluid_st, comp_st = _slr_decode_chunk(
        model, variables, gen_fs_st.astype(compute_dtype),
        af_st.astype(compute_dtype), img, a_bg_sig, a_bg_logits, bg_tanh,
        region, opt)

    def paste(static_im, patches, ch):
        full = jnp.broadcast_to(static_im[0].astype(jnp.float32),
                                (N, H, W, ch))
        p = patches.reshape(N, crop.ph, crop.pw, ch).astype(jnp.float32)
        return jax.lax.dynamic_update_slice(
            full, p, (0, jnp.asarray(cpy0), jnp.asarray(cpx0), 0))

    return {
        "PredImg": paste(gen_st, gen, 3),
        "FluidImg": paste(fluid_st, fluid, 3),
        "CompositeFluidAlpha": paste(comp_st, comp_alpha, 1),
        "BGImg": bg_tanh[0],
    }


def _slr_decode_chunk(model, variables, cf, ca, img_b, a_bg_sig,
                      a_bg_logits, bg_tanh, region, opt):
    """Fluid+alpha decode and composite of one (db, H, W, C) chunk."""
    fluid = model.apply(variables, cf, method="decode_fluid")
    ga_logits = model.apply(variables, cf, ca, method="decode_alpha",
                            img=img_b)
    ga = jax.nn.sigmoid(ga_logits.astype(jnp.float32))
    gen, comp_alpha = slr_composite(
        fluid.astype(jnp.float32), ga, a_bg_sig, bg_tanh,
        alpha_region=region, opt=opt,
        ga_raw=ga_logits.astype(jnp.float32),
        a_bg_raw=a_bg_logits.astype(jnp.float32),
    )
    return gen, fluid.astype(jnp.float32), comp_alpha


def _slr_decode_stack(model, variables, gen_fs_all, af_all, img, a_bg_sig,
                      a_bg_logits, bg_tanh, region, opt, decode_batch):
    """Batched fluid+alpha decode and composite of a stacked (N, H, W, C)
    warped-feature rollout (dense SLR path)."""
    N, H, W = gen_fs_all.shape[:3]
    img_b = jnp.broadcast_to(img, (decode_batch,) + img.shape[1:])

    def decode_chunk(_, chunk):
        cf, ca = chunk
        return None, _slr_decode_chunk(model, variables, cf, ca, img_b,
                                       a_bg_sig, a_bg_logits, bg_tanh,
                                       region, opt)

    nb = N // decode_batch
    chunks = (
        gen_fs_all.reshape(nb, decode_batch, H, W, gen_fs_all.shape[-1]),
        af_all.reshape(nb, decode_batch, H, W, 1),
    )
    _, (gen, fluid, comp_alpha) = jax.lax.scan(decode_chunk, None, chunks)
    return {
        "PredImg": gen.reshape(N, H, W, 3),
        "FluidImg": fluid.reshape(N, H, W, 3),
        "CompositeFluidAlpha": comp_alpha.reshape(N, H, W, 1),
        "BGImg": bg_tanh[0],
    }


# ---------------------------------------------------------------------------
# Frame-sharded inference (multi-chip "sequence parallelism")
# ---------------------------------------------------------------------------

def baseline_rollout_frame_sharded(model, variables, img, flow, n_frames: int,
                                   positions, valid, mesh,
                                   axis: str = "data",
                                   compute_dtype=jnp.float32,
                                   splat_dtype=None,
                                   crop: Optional[CropSpec] = None,
                                   disp=None, crop_offsets=None):
    """Shard the rollout's FRAME axis across a device mesh.

    Frames are independent given the integrated displacement stacks
    (SURVEY.md §5.7), so after the (cheap, replicated) Euler scan each device
    renders N/n_devices frames: the per-frame splat+decode is expressed as a
    vmap over the frame axis with a sharding constraint, and XLA partitions
    it across ICI with no collectives in the hot loop. Supports every
    Z-norm variant including the per-frame v2 maximum-warp-norm (sparse,
    runs inside each device's frame slice), the bf16 compute/splat speed
    modes, and the moving-region cropped decode (``crop``/``disp``/
    ``crop_offsets``) of ``baseline_rollout_sparse`` — each device
    splats+decodes only the crop window of its frames and pastes onto one
    replicated static decode.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    from slrsfs_tpu.models.baseline import z_for_splat

    opt = model.opt
    N = n_frames
    H, W = flow.shape[0], flow.shape[1]

    variables, img = _cast_for_compute(variables, img, compute_dtype)
    splat_dtype = jnp.dtype(splat_dtype or jnp.float32)

    fs, z = model.apply(variables, img, method="encode")
    z = z_for_splat(opt, fs, z)

    (cy0, cx0, cpy0, cpx0, hc, wc,
     positions_c) = _crop_window(crop, crop_offsets, positions, H, W)
    moving_mask = jnp.zeros((hc, wc), jnp.float32).at[
        positions_c[:, 1], positions_c[:, 0]
    ].max(valid)
    pack = _baseline_pack_fn(opt, fs, z, positions, valid,
                             1.0 - moving_mask, splat_dtype,
                             positions_c=positions_c,
                             crop=None if crop is None
                             else (cy0, cx0, hc, wc))

    if disp is None:
        # both directions in one scan (halves the fixed per-step overhead)
        disp_f, disp_p = euler_integrate_compact_dual(flow, positions,
                                                      N - 1, N)
    else:
        disp_f, disp_p = disp

    dec_static = None
    if crop is not None:
        dec_static = model.apply(
            variables,
            _baseline_static_decode_input(opt, fs, z, positions, valid,
                                          H, W, splat_dtype
                                          ).astype(compute_dtype),
            method="decode")[0].astype(jnp.float32)

    sh = NamedSharding(mesh, P(axis))

    def frame(t):
        alpha = 1.0 - t.astype(jnp.float32) / N
        u_static_t, u_mov_t = pack(disp_f[t])
        g = (softsplat_sum_at_quad_dual(
            u_mov_t, positions_c, disp_f[t], disp_p[N - t],
            alpha, 1.0 - alpha, hc, wc) + u_static_t).astype(jnp.float32)
        norm = jnp.maximum(g[..., -1:], 1e-8)
        gen_fs = (g[..., :-1] / norm).astype(compute_dtype)
        out = model.apply(variables, gen_fs[None], method="decode")[0]
        out = out.astype(jnp.float32)
        if crop is None:
            return out
        patch = jax.lax.dynamic_slice(
            out, (cpy0 - cy0, cpx0 - cx0, 0), (crop.ph, crop.pw, 3))
        return jax.lax.dynamic_update_slice(
            dec_static, patch, (jnp.asarray(cpy0), jnp.asarray(cpx0), 0))

    ts = jax.lax.with_sharding_constraint(jnp.arange(N), sh)
    frames = jax.vmap(frame)(ts)
    return jax.lax.with_sharding_constraint(frames, sh)


def slr_rollout_frame_sharded(model, variables, img, flow, n_frames: int,
                              positions, valid, mesh, axis: str = "data",
                              bg_img_raw=None, alpha_region=None,
                              mask_rock=None, compute_dtype=jnp.float32,
                              splat_dtype=None,
                              crop: Optional[CropSpec] = None,
                              disp=None, crop_offsets=None):
    """Frame-axis-sharded SLR inference (two-layer flagship model).

    Same scheme as ``baseline_rollout_frame_sharded``: the per-scene work
    (encode, background, alpha head, Euler scan) is replicated, then each
    device renders N/n_devices frames — splat, fluid decode, alpha decode,
    composite — with no collectives in the hot loop. Supports the v2
    per-frame maximum-warp-norm, the bf16 compute/splat speed modes, and
    the moving-region cropped decode (``crop``/``disp``/``crop_offsets``,
    see ``baseline_rollout_sparse``). Returns the same dict as
    ``slr_rollout_sparse``.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    from slrsfs_tpu.models.baseline import z_for_splat

    opt = model.opt
    N = n_frames
    H, W = flow.shape[0], flow.shape[1]

    variables, img = _cast_for_compute(variables, img, compute_dtype)
    splat_dtype = jnp.dtype(splat_dtype or jnp.float32)

    fs, z = model.apply(variables, img, method="encode")
    z = z_for_splat(opt, fs, z)

    if bg_img_raw is None:
        bg_img_raw = model.apply(variables, img, method="bg")
    bg_tanh = jnp.tanh(bg_img_raw.astype(jnp.float32))
    a_bg_logits, a_fl_logits = model.apply(
        variables, img, method="alpha_encode",
        **_alpha_extras(opt, img, flow, bg_img_raw, mask_rock))
    a_bg_logits = a_bg_logits.astype(jnp.float32)
    a_bg_sig = jax.nn.sigmoid(a_bg_logits)

    (cy0, cx0, cpy0, cpx0, hc, wc,
     positions_c) = _crop_window(crop, crop_offsets, positions, H, W)
    moving_mask = jnp.zeros((hc, wc), jnp.float32).at[
        positions_c[:, 1], positions_c[:, 0]
    ].max(valid)
    pack, use_alpha0, u_full = _slr_pack_fn(
        opt, fs, z, a_fl_logits, a_bg_sig, positions, valid,
        1.0 - moving_mask, splat_dtype, positions_c=positions_c,
        crop=None if crop is None else (cy0, cx0, hc, wc))

    if disp is None:
        disp_f, disp_p = euler_integrate_compact_dual(flow, positions,
                                                      N - 1, N)
    else:
        disp_f, disp_p = disp

    region = None
    if alpha_region is not None:
        region = gaussian_blur_region(alpha_region.astype(jnp.float32), W)

    if crop is None:
        img_c, a_bg_sig_c, a_bg_logits_c, bg_tanh_c, region_c = (
            img, a_bg_sig, a_bg_logits, bg_tanh, region)
        statics = None
    else:
        def cr(a):
            return jax.lax.dynamic_slice(
                a, (0, cy0, cx0, 0), (a.shape[0], hc, wc, a.shape[-1]))

        img_c, a_bg_sig_c, a_bg_logits_c, bg_tanh_c = (
            cr(img), cr(a_bg_sig), cr(a_bg_logits), cr(bg_tanh))
        region_c = None if region is None else cr(region)
        # replicated static frame (see slr_rollout_sparse: v2 re-applies
        # the static-stencil e^zn on the sel channels; splat_dtype
        # round-trip mirrors the per-frame rows)
        u_st = u_full
        if opt.use_softmax_splatter_v2:
            C = u_full.shape[-1]
            nfs = C - 3 if use_alpha0 else C - 2
            sel = (jnp.array([1.0] * nfs + [0.0, 0.0, 1.0], jnp.float32)
                   if use_alpha0 else jnp.ones((C,), jnp.float32))
            zn_st = _static_zn_full(opt, z, positions, valid, H, W)
            e_st = jnp.exp(zn_st.astype(jnp.float32)) * sel + (1.0 - sel)
            u_st = u_full * e_st
        u_st = u_st.astype(splat_dtype).astype(jnp.float32)
        gen_fs_st, af_st = slr_unpack_splatted(u_st[None], use_alpha0)
        statics = _slr_decode_chunk(
            model, variables, gen_fs_st.astype(compute_dtype),
            af_st.astype(compute_dtype), img, a_bg_sig, a_bg_logits,
            bg_tanh, region, opt)
        statics = tuple(a[0].astype(jnp.float32) for a in statics)

    sh = NamedSharding(mesh, P(axis))

    def frame(t):
        alpha = jnp.clip(1.0 - t.astype(jnp.float32) / N, ALPHA_MIN, ALPHA_MAX)
        u_static_t, u_mov_t = pack(disp_f[t])
        g = (softsplat_sum_at_quad_dual(
            u_mov_t, positions_c, disp_f[t], disp_p[N - t],
            alpha, 1.0 - alpha, hc, wc) + u_static_t)[None].astype(jnp.float32)
        gen_fs, af_warped = slr_unpack_splatted(g, use_alpha0)
        gen_fs = gen_fs.astype(compute_dtype)
        af_warped = af_warped.astype(compute_dtype)
        fluid = model.apply(variables, gen_fs, method="decode_fluid")
        ga_logits = model.apply(variables, gen_fs, af_warped,
                                method="decode_alpha", img=img_c)
        ga = jax.nn.sigmoid(ga_logits.astype(jnp.float32))
        gen, comp_alpha = slr_composite(fluid.astype(jnp.float32), ga,
                                        a_bg_sig_c, bg_tanh_c,
                                        alpha_region=region_c, opt=opt,
                                        ga_raw=ga_logits.astype(jnp.float32),
                                        a_bg_raw=a_bg_logits_c)
        outs = (gen[0], fluid[0].astype(jnp.float32), comp_alpha[0])
        if crop is None:
            return outs
        oy, ox = cpy0 - cy0, cpx0 - cx0
        pasted = []
        for static_im, a in zip(statics, outs):
            patch = jax.lax.dynamic_slice(
                a, (oy, ox, 0), (crop.ph, crop.pw, a.shape[-1]))
            pasted.append(jax.lax.dynamic_update_slice(
                static_im, patch.astype(jnp.float32),
                (jnp.asarray(cpy0), jnp.asarray(cpx0), 0)))
        return tuple(pasted)

    ts = jax.lax.with_sharding_constraint(jnp.arange(N), sh)
    gen, fluid, comp = jax.vmap(frame)(ts)
    return {
        "PredImg": jax.lax.with_sharding_constraint(gen, sh),
        "FluidImg": jax.lax.with_sharding_constraint(fluid, sh),
        "CompositeFluidAlpha": jax.lax.with_sharding_constraint(comp, sh),
        "BGImg": bg_tanh[0],
    }


# ---------------------------------------------------------------------------
# GT-motion direct warp (no network)
# ---------------------------------------------------------------------------

def warp_flow_rollout(img, flow, n_frames: int, positions, valid):
    """Warp the raw image with the integrated GT motion — no encoder/decoder
    (reference ``AnimatingSoftmaxSplating.warp_flow``,
    animating_softmax_splating.py:983-1173): symmetric double-ended softmax
    splat of the RGB pixels themselves, useful for GT-warp visualization and
    eval baselines.

    img (1, H, W, 3) in [-1, 1]; returns (N, H, W, 3)."""
    N = n_frames
    H, W = flow.shape[0], flow.shape[1]
    u = jnp.concatenate(
        [img[0], jnp.ones((H, W, 1), img.dtype)], axis=-1)  # Z == 1

    moving_mask = jnp.zeros((H, W), jnp.float32).at[
        positions[:, 1], positions[:, 0]
    ].max(valid)
    u_static = u * (1.0 - moving_mask)[..., None]
    u_mov = u[positions[:, 1], positions[:, 0]] * valid[:, None]

    # both directions in one scan (halves the fixed per-step overhead)
    disp_f, disp_p = euler_integrate_compact_dual(flow, positions, N - 1, N)

    def frame(_, t):
        alpha = 1.0 - t.astype(jnp.float32) / N
        g = softsplat_sum_at_quad_dual(
            u_mov, positions, disp_f[t], disp_p[N - t],
            alpha, 1.0 - alpha, H, W) + u_static
        return None, g[..., :3] / jnp.maximum(g[..., 3:], 1e-8)

    _, frames = jax.lax.scan(frame, None, jnp.arange(N))
    return frames


def slr_rollout_dense(model, variables, img, flow, n_frames: int,
                      bg_img_raw=None, alpha_region=None, mask_rock=None,
                      decode_batch: Optional[int] = None):
    """Dense SLR rollout supporting the per-frame v2 Z-normalization
    (maximum-warp-norm over the full grid, reference 2layers forward_flow
    :955-957) which the sparse path cannot reproduce exactly.
    Returns the same dict as ``slr_rollout_sparse``. Frames are decoded in
    batches (auto-picked divisor of N) after the splat scan — identical
    results, far less per-frame dispatch/utilization waste than the
    per-frame decode this path used previously."""
    from slrsfs_tpu.models.baseline import z_for_splat, z_normalize
    from slrsfs_tpu.ops import euler_integrate_all_dual, softsplat_sum

    opt = model.opt
    N = n_frames
    H, W = flow.shape[0], flow.shape[1]

    fs, z = model.apply(variables, img, method="encode")
    z = z_for_splat(opt, fs, z)

    if bg_img_raw is None:
        bg_img_raw = model.apply(variables, img, method="bg")
    bg_tanh = jnp.tanh(bg_img_raw)
    a_bg_logits, a_fl_logits = model.apply(
        variables, img, method="alpha_encode",
        **_alpha_extras(opt, img, flow, bg_img_raw, mask_rock))
    a_bg_sig = jax.nn.sigmoid(a_bg_logits)

    disp_f, disp_p = euler_integrate_all_dual(flow, N - 1, N)

    per_frame_znorm = opt.use_softmax_splatter_v2
    if not per_frame_znorm:
        zn = z_normalize(opt, z, None)
        u0, use_alpha0 = slr_pack_splat_input(opt, fs, zn, a_fl_logits, a_bg_sig)

    region = None
    if alpha_region is not None:
        region = gaussian_blur_region(alpha_region.astype(jnp.float32), W)

    def frame(_, t):
        alpha = jnp.clip(1.0 - t.astype(jnp.float32) / N, ALPHA_MIN, ALPHA_MAX)
        ff = disp_f[t][None]
        fp = disp_p[N - t][None]
        if per_frame_znorm:
            # inference uses ONE Z-norm from the forward flow for both ends
            zn_t = z_normalize(opt, z, ff)
            u, ua0 = slr_pack_splat_input(opt, fs, zn_t, a_fl_logits, a_bg_sig)
        else:
            u, ua0 = u0, use_alpha0
        g = softsplat_sum(u, ff) * alpha + softsplat_sum(u, fp) * (1.0 - alpha)
        gen_fs, af_warped = slr_unpack_splatted(g, ua0)
        return None, (gen_fs[0], af_warped[0])

    _, (gen_fs_all, af_all) = jax.lax.scan(frame, None, jnp.arange(N))
    db = _auto_decode_batch(N, decode_batch)
    return _slr_decode_stack(model, variables, gen_fs_all, af_all, img,
                             a_bg_sig, a_bg_logits, bg_tanh, region, opt, db)
