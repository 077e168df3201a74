"""Forward-warping (splatting) ops, TPU-native.

Semantics match the reference CUDA kernels embedded in
``models/softsplat.py`` of simon3dv/SLR-SFS (cited per function below), but
the implementation is a fresh JAX/XLA design:

* layout is NHWC (channels on TPU lanes), flow is ``(..., H, W, 2)`` with
  channel 0 = x-displacement (u) and channel 1 = y-displacement (v);
* the forward scatter-add is deterministic (XLA scatter), unlike the
  reference's ``atomicAdd`` float accumulation which is order-nondeterministic
  (reference ``models/softsplat.py:187-199``);
* the backward pass is a ``jax.custom_vjp`` implementing the pure-gather
  gradient kernels (reference ``models/softsplat.py:204-326``) so autodiff
  never differentiates through the scatter.

Every source pixel ``(y, x)`` is moved to ``(x + u, y + v)`` and its value is
bilinearly split over the 4 integer neighbours of the target position;
out-of-bounds corners are dropped (reference ``models/softsplat.py:157-202``).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

Array = jax.Array

_NEG_INIT = -1000.0  # reference max-splat init (models/softsplat.py:590)


def _corners(flow: Array):
    """Per-pixel target corner indices, bilinear weights and validity.

    flow: (H, W, 2). Returns a list of 4 tuples ``(cx, cy, w, valid)``, each
    entry shaped (H, W). Corner order: NW, NE, SW, SE.
    """
    H, W, _ = flow.shape
    ox = jnp.arange(W, dtype=flow.dtype)[None, :] + flow[..., 0]
    oy = jnp.arange(H, dtype=flow.dtype)[:, None] + flow[..., 1]
    x0f = jnp.floor(ox)
    y0f = jnp.floor(oy)
    dx = ox - x0f
    dy = oy - y0f
    x0 = x0f.astype(jnp.int32)
    y0 = y0f.astype(jnp.int32)
    out = []
    for cx, cy, w in (
        (x0, y0, (1.0 - dx) * (1.0 - dy)),
        (x0 + 1, y0, dx * (1.0 - dy)),
        (x0, y0 + 1, (1.0 - dx) * dy),
        (x0 + 1, y0 + 1, dx * dy),
    ):
        valid = (cx >= 0) & (cx < W) & (cy >= 0) & (cy < H)
        out.append((cx, cy, w, valid))
    return out


def _corner_weight_grads(flow: Array):
    """d(weight)/d(ox), d(weight)/d(oy) per corner (NW, NE, SW, SE).

    Math spec: reference ``models/softsplat.py:257-326``
    (kernel_Softsplat_updateGradFlow).
    """
    H, W, _ = flow.shape
    ox = jnp.arange(W, dtype=flow.dtype)[None, :] + flow[..., 0]
    oy = jnp.arange(H, dtype=flow.dtype)[:, None] + flow[..., 1]
    dx = ox - jnp.floor(ox)
    dy = oy - jnp.floor(oy)
    one = jnp.ones_like(dx)
    dwdx = (-(1.0 - dy), (1.0 - dy), -dy, dy)
    dwdy = (-(1.0 - dx), -dx, (1.0 - dx), dx)
    del one
    return dwdx, dwdy


def _splat_sum_single(inp: Array, flow: Array) -> Array:
    """Summation splat of one sample. inp (H, W, C), flow (H, W, 2).

    Quad-packed formulation: TPU scatter cost is dominated by the update-row
    count (width is nearly free), so the 4 corners of each source pixel pack
    into ONE (4C)-wide row at the NW corner's flattened index and the combine
    shifts the NE/SW/SE thirds by +1/+W/+W+1 flat positions — 4x fewer
    scatter rows than the naive per-corner scatter, identical results
    (border wrap-arounds carry validity-zeroed weights)."""
    H, W, C = inp.shape
    HW = H * W
    corners = _corners(flow)
    # weights are computed at flow precision (f32) and cast to inp.dtype:
    # a bf16 inp with f32 flow accumulates in bf16 WITHOUT quantizing the
    # bilinear weight math (mirrors _quad_rows on the sparse path)
    upd = jnp.concatenate(
        [(inp * jnp.where(valid, w, 0.0).astype(inp.dtype)[..., None]
          ).reshape(-1, C)
         for _cx, _cy, w, valid in corners],
        axis=-1,
    )  # (HW, 4C) in corner order NW, NE, SW, SE
    x0, y0 = corners[0][0], corners[0][1]
    pad = W + 1
    q = jnp.clip((y0 * W + x0).reshape(-1) + pad, 0, HW + 2 * pad - 1)
    buf = jnp.zeros((HW + 2 * pad, 4 * C), inp.dtype).at[q].add(upd)
    out = (buf[pad:pad + HW, :C]
           + buf[pad - 1:pad - 1 + HW, C:2 * C]
           + buf[pad - W:pad - W + HW, 2 * C:3 * C]
           + buf[pad - W - 1:pad - W - 1 + HW, 3 * C:])
    return out.reshape(H, W, C)


def _splat_grad_single(inp: Array, flow: Array, g: Array):
    """Backward of the summation splat for one sample (pure gathers).

    Returns (grad_inp, grad_flow). Math spec: reference
    ``models/softsplat.py:204-326``.
    """
    H, W, C = inp.shape
    gflat = g.reshape(H * W, C)
    dwdx, dwdy = _corner_weight_grads(flow)
    # accumulate both cotangents in f32 (weights/inner products at flow
    # precision), cast grad_inp back to inp.dtype at the end — custom_vjp
    # requires cotangent dtypes to match the primals exactly, including
    # the mixed bf16-inp/f32-flow training mode
    grad_inp = jnp.zeros(inp.shape, jnp.float32)
    gfx = jnp.zeros((H, W), flow.dtype)
    gfy = jnp.zeros((H, W), flow.dtype)
    for (cx, cy, w, valid), dwx, dwy in zip(_corners(flow), dwdx, dwdy):
        lin = jnp.clip(cy, 0, H - 1) * W + jnp.clip(cx, 0, W - 1)
        g_at = gflat[lin.reshape(-1)].reshape(H, W, C)
        g_at = jnp.where(valid[..., None], g_at, 0.0).astype(jnp.float32)
        grad_inp = grad_inp + g_at * w.astype(jnp.float32)[..., None]
        inner = jnp.sum(inp.astype(jnp.float32) * g_at, axis=-1)
        gfx = gfx + (inner * dwx).astype(flow.dtype)
        gfy = gfy + (inner * dwy).astype(flow.dtype)
    return grad_inp.astype(inp.dtype), jnp.stack([gfx, gfy], axis=-1)


@jax.custom_vjp
def softsplat_sum(inp: Array, flow: Array) -> Array:
    """Deterministic summation forward-splat. NHWC.

    inp: (B, H, W, C); flow: (B, H, W, 2). Equivalent of the reference
    ``ModuleSoftsplat('summation')`` (models/softsplat.py:665-702).
    """
    return jax.vmap(_splat_sum_single)(inp, flow)


def _softsplat_sum_fwd(inp, flow):
    return softsplat_sum(inp, flow), (inp, flow)


def _softsplat_sum_bwd(res, g):
    inp, flow = res
    return jax.vmap(_splat_grad_single)(inp, flow, g)


softsplat_sum.defvjp(_softsplat_sum_fwd, _softsplat_sum_bwd)


def softsplat(
    inp: Array,
    flow: Array,
    metric: Optional[Array] = None,
    mode: str = "summation",
) -> Array:
    """The four splat modes of reference ``FunctionSoftsplat``
    (models/softsplat.py:665-690).

    inp (B, H, W, C), flow (B, H, W, 2), metric (B, H, W, 1) or None.
    For non-summation modes the splatted last channel normalizes the output,
    with exact zeros replaced by 1 (reference ``softsplat.py:681-688``).
    """
    assert mode in ("summation", "average", "linear", "softmax"), mode
    if mode == "average":
        ones = jnp.ones(inp.shape[:-1] + (1,), inp.dtype)
        inp = jnp.concatenate([inp, ones], axis=-1)
    elif mode == "linear":
        inp = jnp.concatenate([inp * metric, metric], axis=-1)
    elif mode == "softmax":
        m = jnp.exp(metric)
        inp = jnp.concatenate([inp * m, m], axis=-1)

    out = softsplat_sum(inp, flow)
    if mode != "summation":
        norm = out[..., -1:]
        norm = jnp.where(norm == 0.0, 1.0, norm)
        out = out[..., :-1] / norm
    return out


def _max_splat_single(inp: Array, flow: Array) -> Array:
    """Max-splat of one sample: per-target max of ``inp * bilinear_weight``.

    Cells receiving no contribution stay at -1000. Deterministic equivalent of
    reference ``kernel_Maximumsplat_updateOutput`` (models/softsplat.py:12-82,
    init at :590).
    """
    H, W, C = inp.shape
    neg = jnp.asarray(-jnp.inf, inp.dtype)
    idxs = []
    vals = []
    for cx, cy, w, valid in _corners(flow):
        lin = jnp.clip(cy, 0, H - 1) * W + jnp.clip(cx, 0, W - 1)
        idxs.append(lin.reshape(-1))
        v = inp * w[..., None]
        v = jnp.where(valid[..., None], v, neg)
        vals.append(v.reshape(-1, C))
    idx = jnp.concatenate(idxs)
    val = jnp.concatenate(vals)
    out = jnp.full((H * W, C), _NEG_INIT, inp.dtype).at[idx].max(val)
    return out.reshape(H, W, C)


def max_splat(inp: Array, flow: Array) -> Array:
    """Batched max-splat. inp (B, H, W, C), flow (B, H, W, 2)."""
    return jax.vmap(_max_splat_single)(inp, flow)


def _inverse_max_gather_single(maxmap: Array, flow: Array, init: Array) -> Array:
    """For each *source* pixel: max of ``init`` and the 4 target-cell values.

    Equivalent of reference ``kernel_Inversesplat_updateOutput``
    (models/softsplat.py:84-155) with output initialized to ``init``.
    """
    H, W, C = maxmap.shape
    flat = maxmap.reshape(H * W, C)
    out = init
    for cx, cy, _w, valid in _corners(flow):
        lin = jnp.clip(cy, 0, H - 1) * W + jnp.clip(cx, 0, W - 1)
        v = flat[lin.reshape(-1)].reshape(H, W, C)
        v = jnp.where(valid[..., None], v, -jnp.inf)
        out = jnp.maximum(out, v)
    return out


def inverse_max_gather(maxmap: Array, flow: Array, init: Array) -> Array:
    return jax.vmap(_inverse_max_gather_single)(maxmap, flow, init)


def maximum_warp_norm_splat(inp: Array, flow: Array) -> Array:
    """Per-source-pixel numerically-stable max of Z over each splat target.

    Max-splat ``inp`` (init -1000), then inverse-gather the per-target maxima
    back onto each source pixel, starting from ``inp`` itself. Equivalent of
    reference ``_FunctionMaximumWarpNormsplat`` (models/softsplat.py:576-624),
    used for "softmax splatting v2" Z normalization. Not differentiated in the
    reference (applied to a detached Z); gradients are stopped here too.
    """
    inp = jax.lax.stop_gradient(inp)
    flow = jax.lax.stop_gradient(flow)
    mx = max_splat(inp, flow)
    return inverse_max_gather(mx, flow, inp)


def softsplat_sum_at(u: Array, positions: Array, disp: Array, height: int,
                     width: int) -> Array:
    """Summation-splat a compacted pixel set onto a dense grid.

    TPU sparse fast path: scatter cost on TPU is per-update-row, so splatting
    only the moving pixels (static pixels splat onto themselves — an identity
    the caller adds densely) cuts the dominant rollout cost by the static
    fraction. Exact for pixels with zero motion; see engine/rollout.py.

    u: (P, C) packed values (pad rows must be zero);
    positions: (P, 2) int32 (x, y) source coords;
    disp: (P, 2) displacement.
    Returns (height, width, C).
    """
    P, C = u.shape
    ox = positions[:, 0].astype(disp.dtype) + disp[:, 0]
    oy = positions[:, 1].astype(disp.dtype) + disp[:, 1]
    x0f = jnp.floor(ox)
    y0f = jnp.floor(oy)
    dx = ox - x0f
    dy = oy - y0f
    x0 = x0f.astype(jnp.int32)
    y0 = y0f.astype(jnp.int32)
    idxs = []
    upds = []
    for cx, cy, w in (
        (x0, y0, (1.0 - dx) * (1.0 - dy)),
        (x0 + 1, y0, dx * (1.0 - dy)),
        (x0, y0 + 1, (1.0 - dx) * dy),
        (x0 + 1, y0 + 1, dx * dy),
    ):
        valid = (cx >= 0) & (cx < width) & (cy >= 0) & (cy < height)
        lin = jnp.clip(cy, 0, height - 1) * width + jnp.clip(cx, 0, width - 1)
        idxs.append(lin)
        upds.append(u * jnp.where(valid, w, 0.0)[:, None])
    idx = jnp.concatenate(idxs)
    upd = jnp.concatenate(upds)
    out = jnp.zeros((height * width, C), u.dtype).at[idx].add(upd)
    return out.reshape(height, width, C)


def softsplat_sum_at_paired(u: Array, positions: Array, disp: Array,
                            height: int, width: int) -> Array:
    """Row-pair splat: HALF the scatter rows of ``softsplat_sum_at``.

    TPU scatter cost is per-update-row and independent of row width, so the
    two horizontal corners of each source pixel are packed into ONE
    full-width row [left·C | right·C] scattered into an (H·W, 2C) buffer at
    the left corner's flattened index; the final combine shifts the right
    half down one flat position (x+1 with row wrap — exactly flat-index
    arithmetic, so border cases self-resolve via the usual corner-validity
    weight zeroing). 2 rows per source pixel (top pair at ty, bottom pair at
    ty+1) instead of 4. Bit-equivalent to the 4-row formulation up to float
    summation order.
    """
    P, C = u.shape
    HW = height * width
    ox = positions[:, 0].astype(disp.dtype) + disp[:, 0]
    oy = positions[:, 1].astype(disp.dtype) + disp[:, 1]
    x0f = jnp.floor(ox)
    y0f = jnp.floor(oy)
    dx = ox - x0f
    dy = oy - y0f
    x0 = x0f.astype(jnp.int32)
    y0 = y0f.astype(jnp.int32)

    def valid(cx, cy):
        return ((cx >= 0) & (cx < width) & (cy >= 0) & (cy < height)
                ).astype(u.dtype)[:, None]

    w_nw = ((1.0 - dx) * (1.0 - dy))[:, None] * valid(x0, y0)
    w_ne = (dx * (1.0 - dy))[:, None] * valid(x0 + 1, y0)
    w_sw = ((1.0 - dx) * dy)[:, None] * valid(x0, y0 + 1)
    w_se = (dx * dy)[:, None] * valid(x0 + 1, y0 + 1)

    top = jnp.concatenate([u * w_nw, u * w_ne], axis=-1)  # (P, 2C)
    bot = jnp.concatenate([u * w_sw, u * w_se], axis=-1)
    q_top = jnp.clip(y0 * width + x0, 0, HW - 1)
    q_bot = jnp.clip((y0 + 1) * width + x0, 0, HW - 1)
    # rows whose weights are all zero may clip to arbitrary targets: harmless
    idx = jnp.concatenate([q_top, q_bot])
    upd = jnp.concatenate([top, bot])
    buf = jnp.zeros((HW, 2 * C), u.dtype).at[idx].add(upd)
    right_shifted = jnp.concatenate(
        [jnp.zeros((1, C), u.dtype), buf[:-1, C:]], axis=0)
    out = buf[:, :C] + right_shifted
    return out.reshape(height, width, C)


def _quad_rows(u: Array, positions: Array, disp: Array,
               height: int, width: int):
    """Quad-packed scatter rows for one displacement field.

    Returns (q, upd): padded flat indices (P,) and (P, 4C) rows
    [NW·C | NE·C | SW·C | SE·C]; see ``softsplat_sum_at_quad`` for the
    combine. Padding is width+1 rows each side of the flat grid."""
    ox = positions[:, 0].astype(disp.dtype) + disp[:, 0]
    oy = positions[:, 1].astype(disp.dtype) + disp[:, 1]
    x0f = jnp.floor(ox)
    y0f = jnp.floor(oy)
    dx = ox - x0f
    dy = oy - y0f
    x0 = x0f.astype(jnp.int32)
    y0 = y0f.astype(jnp.int32)

    def valid(cx, cy):
        return ((cx >= 0) & (cx < width) & (cy >= 0) & (cy < height)
                ).astype(u.dtype)[:, None]

    w_nw = ((1.0 - dx) * (1.0 - dy))[:, None] * valid(x0, y0)
    w_ne = (dx * (1.0 - dy))[:, None] * valid(x0 + 1, y0)
    w_sw = ((1.0 - dx) * dy)[:, None] * valid(x0, y0 + 1)
    w_se = (dx * dy)[:, None] * valid(x0 + 1, y0 + 1)

    # weights are computed at disp precision (f32) and the rows cast back to
    # u.dtype: with a bfloat16 u (the opt-in fast splat mode) only the
    # scatter ACCUMULATION is bf16, not the bilinear weight math.
    upd = jnp.concatenate(
        [u * w_nw, u * w_ne, u * w_sw, u * w_se], axis=-1).astype(u.dtype)
    pad = width + 1
    HW = height * width
    q = jnp.clip(y0 * width + x0 + pad, 0, HW + 2 * pad - 1)
    return q, upd


def _quad_combine(buf: Array, height: int, width: int, C: int) -> Array:
    pad = width + 1
    HW = height * width
    return (buf[pad:pad + HW, :C]
            + buf[pad - 1:pad - 1 + HW, C:2 * C]
            + buf[pad - width:pad - width + HW, 2 * C:3 * C]
            + buf[pad - width - 1:pad - width - 1 + HW, 3 * C:]
            ).reshape(height, width, C)


def softsplat_sum_at_quad_dual(u: Array, positions: Array,
                               disp_a: Array, disp_b: Array,
                               w_a: Array, w_b: Array,
                               height: int, width: int) -> Array:
    """Double-ended quad-packed splat in ONE scatter op.

    Measured on v5e: XLA scatter-add cost is dominated by a per-op fixed
    overhead (~2-4 ms at these sizes, nearly independent of row count and
    width), so the symmetric double-ended splat — the per-frame hot pair of
    the rollout (reference animating_softmax_splating.py:606-692) — issues
    one scatter with 2P rows instead of two with P. Rows are pre-scaled by
    the temporal blend weights, so the result equals
    ``quad(u, disp_a)·w_a + quad(u, disp_b)·w_b`` up to float summation
    order.
    """
    P, C = u.shape
    HW = height * width
    q_a, upd_a = _quad_rows((u * w_a).astype(u.dtype),
                            positions, disp_a, height, width)
    q_b, upd_b = _quad_rows((u * w_b).astype(u.dtype),
                            positions, disp_b, height, width)
    q = jnp.concatenate([q_a, q_b])
    upd = jnp.concatenate([upd_a, upd_b])
    pad = width + 1
    buf = jnp.zeros((HW + 2 * pad, 4 * C), u.dtype).at[q].add(upd)
    return _quad_combine(buf, height, width, C)


def softsplat_sum_at_quad(u: Array, positions: Array, disp: Array,
                          height: int, width: int) -> Array:
    """Quad-packed splat: ONE scatter row per source pixel.

    All four corners pack into a single (4C)-wide row at the NW corner's
    flattened index; the combine shifts the NE/SW/SE thirds by +1, +W, +W+1
    flat positions (flat-index arithmetic makes border wrap-around land
    exactly where validity-zeroed weights make it a harmless +0).
    """
    P, C = u.shape
    HW = height * width
    ox = positions[:, 0].astype(disp.dtype) + disp[:, 0]
    oy = positions[:, 1].astype(disp.dtype) + disp[:, 1]
    x0f = jnp.floor(ox)
    y0f = jnp.floor(oy)
    dx = ox - x0f
    dy = oy - y0f
    x0 = x0f.astype(jnp.int32)
    y0 = y0f.astype(jnp.int32)

    def valid(cx, cy):
        return ((cx >= 0) & (cx < width) & (cy >= 0) & (cy < height)
                ).astype(u.dtype)[:, None]

    w_nw = ((1.0 - dx) * (1.0 - dy))[:, None] * valid(x0, y0)
    w_ne = (dx * (1.0 - dy))[:, None] * valid(x0 + 1, y0)
    w_sw = ((1.0 - dx) * dy)[:, None] * valid(x0, y0 + 1)
    w_se = (dx * dy)[:, None] * valid(x0 + 1, y0 + 1)

    upd = jnp.concatenate([u * w_nw, u * w_ne, u * w_sw, u * w_se], axis=-1)
    # pad by W+1 rows each side: any partially-valid quad has
    # q = y0*W + x0 in [-(W+1), HW-1], so padding (not clipping) preserves
    # the relative +1/+W/+W+1 offsets; fully-invalid quads clip harmlessly.
    pad = width + 1
    q = jnp.clip(y0 * width + x0 + pad, 0, HW + 2 * pad - 1)
    buf = jnp.zeros((HW + 2 * pad, 4 * C), u.dtype).at[q].add(upd)

    out = (buf[pad:pad + HW, :C]
           + buf[pad - 1:pad - 1 + HW, C:2 * C]
           + buf[pad - width:pad - width + HW, 2 * C:3 * C]
           + buf[pad - width - 1:pad - width - 1 + HW, 3 * C:])
    return out.reshape(height, width, C)


# ---------------------------------------------------------------------------
# Sparse per-frame MaximumWarpNorm (softmax-splatting "v2" Z normalization)
# ---------------------------------------------------------------------------
#
# The v2 variant re-normalizes Z per frame by the maximum-warp-norm of the
# integrated displacement (reference models/softsplat.py:576-624 via
# animating_softmax_splating.py:593-605), which previously forced the dense
# rollout. The sparse equivalent below exploits the same invariant as the
# sum splat: zero-motion pixels keep displacement 0 in every frame, so their
# max-splat contributions are a FIXED 3-tap stencil (value z at their own
# cell, value 0 at the east/south/southeast cells — the dense kernel's
# weighted contributions z·1 and z·0 at the four bilinear corners), and only
# the moving set needs a scatter. The inverse gather similarly splits into a
# fixed 4-tap stencil for static pixels and one 4-wide-row gather for the
# moving set.

_STENCIL_NEG = -jnp.inf


def _shift2d(a: Array, dy: int, dx: int, fill) -> Array:
    """(H, W) array shifted so out[y, x] = a[y+dy, x+dx], `fill` outside."""
    H, W = a.shape
    out = jnp.full_like(a, fill)
    ys = slice(max(dy, 0), H + min(dy, 0))
    yd = slice(max(-dy, 0), H + min(-dy, 0))
    xs = slice(max(dx, 0), W + min(dx, 0))
    xd = slice(max(-dx, 0), W + min(-dx, 0))
    return out.at[yd, xd].set(a[ys, xs])


def maximum_warp_norm_sparse(z: Array, static_mask: Array, z_mov: Array,
                             positions: Array, valid: Array, disp: Array,
                             height: int, width: int):
    """Sparse ``maximum_warp_norm_splat``: → (zmax_dense, zmax_mov).

    z: (H, W) float32 dense Z; static_mask: (H, W) 1.0 where motion is zero;
    z_mov/positions/valid/disp: compacted moving set ((P,), (P,2) int32 xy,
    (P,), (P,2)).

    Returns the per-source-pixel max used by the v2 normalization
    (z - zmax): ``zmax_dense`` (H, W) is exact at STATIC pixels (moving
    entries are a lower bound — callers mask them out), ``zmax_mov`` (P,) is
    exact at the moving set. Equivalent of
    ``maximum_warp_norm_splat(z[None,...,None], disp_dense[None])`` when the
    static set truly has zero displacement.
    """
    H, W = height, width
    HW = H * W
    fdt = z.dtype
    neg = jnp.asarray(_NEG_INIT, fdt)
    is_static = static_mask > 0.5

    # ---- forward max-splat: target-cell max of z·w over the 4 corners ----
    # static contributions: z at own cell (w=1), 0 at E/S/SE cells (w=0,
    # valid whenever in-bounds)
    mx_static = jnp.where(is_static, z, neg)
    zero_contrib = (_shift2d(static_mask, 0, -1, 0.0)
                    + _shift2d(static_mask, -1, 0, 0.0)
                    + _shift2d(static_mask, -1, -1, 0.0)) > 0.5
    mx_init = jnp.maximum(mx_static, jnp.where(zero_contrib, 0.0, neg))

    # moving contributions: quad-packed scatter-max (one 4-wide row/pixel)
    ox = positions[:, 0].astype(disp.dtype) + disp[:, 0]
    oy = positions[:, 1].astype(disp.dtype) + disp[:, 1]
    x0f = jnp.floor(ox)
    y0f = jnp.floor(oy)
    dx = ox - x0f
    dy = oy - y0f
    x0 = x0f.astype(jnp.int32)
    y0 = y0f.astype(jnp.int32)
    ok = valid > 0.5

    def corner_val(w, cx, cy):
        v = jnp.where((cx >= 0) & (cx < W) & (cy >= 0) & (cy < H) & ok,
                      z_mov * w, -jnp.inf)
        return v[:, None]

    upd = jnp.concatenate([
        corner_val((1.0 - dx) * (1.0 - dy), x0, y0),
        corner_val(dx * (1.0 - dy), x0 + 1, y0),
        corner_val((1.0 - dx) * dy, x0, y0 + 1),
        corner_val(dx * dy, x0 + 1, y0 + 1),
    ], axis=-1)
    pad = W + 1
    q = jnp.clip(y0 * W + x0 + pad, 0, HW + 2 * pad - 1)
    # NOTE on layout: a "lane-dense" variant packing 32 quad rows into one
    # 128-lane operand row via lax.scatter_max with 4-wide update windows
    # was measured 12.6x SLOWER end-to-end on the v5e (12.4 s vs 0.97 s for
    # the 60-frame SLR-v2 rollout): the general windowed scatter lowers to
    # a serialized per-update loop, while this row-indexed .at[].max lowers
    # to the same fused one-scatter form as the main quad splat. The 4->128
    # lane padding costs HBM bytes but stays on the fast scatter path.
    buf = jnp.full((HW + 2 * pad, 4), -jnp.inf, fdt).at[q].max(upd)
    mx_mov = jnp.maximum(
        jnp.maximum(buf[pad:pad + HW, 0], buf[pad - 1:pad - 1 + HW, 1]),
        jnp.maximum(buf[pad - W:pad - W + HW, 2],
                    buf[pad - W - 1:pad - W - 1 + HW, 3]),
    ).reshape(H, W)
    mx = jnp.maximum(mx_init, mx_mov)

    # ---- inverse gather: per-source max of init=z and the 4 target cells --
    # static pixels: target = self → fixed [self, E, S, SE] stencil
    mx_e = _shift2d(mx, 0, 1, _STENCIL_NEG)
    mx_s = _shift2d(mx, 1, 0, _STENCIL_NEG)
    mx_se = _shift2d(mx, 1, 1, _STENCIL_NEG)
    zmax_dense = jnp.maximum(
        z,
        jnp.maximum(jnp.maximum(mx, mx_e), jnp.maximum(mx_s, mx_se)),
    )

    # moving pixels: one gather of 4-wide rows from a stacked view of the
    # shifted maps. The lane-padded (HW, 4) materialization looks wasteful
    # but measures FASTER than four separate (P,) gathers (966 vs 1002 ms
    # for the 60-frame SLR-v2 rollout on the v5e): one wide gather
    # amortizes the per-gather fixed cost, same rule as the quad splat.
    view = jnp.stack([mx, mx_e, mx_s, mx_se], axis=-1).reshape(HW, 4)
    cx = jnp.clip(x0, 0, W - 1)
    cy = jnp.clip(y0, 0, H - 1)
    r = view[cy * W + cx]  # (P, 4): [mx(c), E, S, SE] at the clamped corner
    xneg = x0 < 0  # NW column clamped up: E-taps shift into the base column
    yneg = y0 < 0
    inb_x = (x0 >= 0) & (x0 < W)
    inb_x1 = (x0 + 1 >= 0) & (x0 + 1 < W)
    inb_y = (y0 >= 0) & (y0 < H)
    inb_y1 = (y0 + 1 >= 0) & (y0 + 1 < H)
    ninf = -jnp.inf
    t_nw = jnp.where(inb_x & inb_y, r[:, 0], ninf)
    t_ne = jnp.where(inb_x1 & inb_y,
                     jnp.where(xneg, r[:, 0], r[:, 1]), ninf)
    t_sw = jnp.where(inb_x & inb_y1,
                     jnp.where(yneg, r[:, 0], r[:, 2]), ninf)
    t_se = jnp.where(inb_x1 & inb_y1,
                     jnp.where(xneg & yneg, r[:, 0],
                               jnp.where(xneg, r[:, 2],
                                         jnp.where(yneg, r[:, 1], r[:, 3]))),
                     ninf)
    zmax_mov = jnp.maximum(
        z_mov,
        jnp.maximum(jnp.maximum(t_nw, t_ne), jnp.maximum(t_sw, t_se)),
    )
    return zmax_dense, zmax_mov
