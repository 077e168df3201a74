"""Pallas fused conv3x3 -> relu -> conv3x3 prototype — measured and REJECTED.

Verdict (axon v5e, B=60 256x480x128 bf16, 2026-08): XLA's conv engine runs
the same fused chain at 65.6 TFLOP/s (66.3 ms); this kernel reaches 62.1
TFLOP/s (70.1 ms) at TH=8 (TH=16 exceeds the Mosaic compile budget).
Correctness is exact vs the XLA chain (interpret-mode max err = bf16
rounding). Mosaic matmuls do not beat the XLA conv engine on this device,
so the production decoder keeps XLA convs; see GAPS.md "round-2 deep-dive"
for the full measurement story. Kept as working reference for the halo-DMA
/ sublane-alignment / bf16-rotate patterns (pallas_guide.md techniques).

Design: grid over (B, H/TH). Row-slab with halo 2 DMA'd from HBM into a
scratch whose W axis is padded to col offset 8 (sublane alignment) and
width W+16. Column +-1 shifts via pltpu.roll on the sublane axis (rotate is
unimplemented for 16-bit data, so roll a f32 copy and cast back); row
shifts via untiled dim-0 slices. SAME zero-padding enforced by column masks
and first/last-tile row zeroing.

Run: python tools/pallas_conv_prototype.py  (needs the TPU device)
"""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def force(x):
    _ = float(jnp.asarray(x).ravel()[-1])


def timeit(f, *a, n=3):
    r = f(*a)
    force(r)
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        r = f(*a)
        force(r)
        ts.append(time.perf_counter() - t0)
    return min(ts)


def _conv3x3(slab, w_ref, rows_out, WP, C, F, colmask):
    """slab (R, WP, C) -> (rows_out, WP, F); SAME in W via colmask zeroing,
    rows: output row r corresponds to slab row r+1 (caller handles padding).
    """
    acc = jnp.zeros((rows_out * WP, F), jnp.float32)
    for kx in range(3):
        # tpu rotate is unimplemented for 16-bit data: roll a f32 copy and
        # cast back (VPU-cheap, no extra HBM traffic)
        if kx != 1:
            rolled = pltpu.roll(slab.astype(jnp.float32),
                                (1 - kx) % WP, 1).astype(slab.dtype)
        else:
            rolled = slab
        for ky in range(3):
            a = rolled[ky:ky + rows_out].reshape(rows_out * WP, C)
            acc = acc + jnp.dot(a, w_ref[ky, kx],
                                preferred_element_type=jnp.float32)
    out = acc.reshape(rows_out, WP, F)
    return out * colmask


def kernel(x_hbm, waa_ref, wab_ref, out_ref, xs, sem, *, TH, H, W, C, F):
    b = pl.program_id(0)
    i = pl.program_id(1)
    nI = pl.num_programs(1)
    WP = W + 16

    xs[:] = jnp.zeros_like(xs)

    def copy(row0, nrows, dst0):
        dma = pltpu.make_async_copy(
            x_hbm.at[b, pl.ds(row0, nrows), :, :],
            xs.at[pl.ds(dst0, nrows), pl.ds(8, W), :],
            sem,
        )
        dma.start()
        dma.wait()

    @pl.when(jnp.logical_and(i == 0, nI == 1))
    def _():
        copy(0, TH, 2)

    @pl.when(jnp.logical_and(i == 0, nI > 1))
    def _():
        copy(0, TH + 2, 2)

    @pl.when(jnp.logical_and(i > 0, i < nI - 1))
    def _():
        copy(i * TH - 2, TH + 4, 0)

    @pl.when(jnp.logical_and(i == nI - 1, nI > 1))
    def _():
        copy((nI - 1) * TH - 2, TH + 2, 0)

    col = jax.lax.broadcasted_iota(jnp.int32, (1, WP, 1), 1)
    colmask = ((col >= 8) & (col < 8 + W)).astype(jnp.float32)

    xv = xs[:]  # (TH+4, WP, C)
    # conv_aa: h rows 0..TH+2 correspond to slab rows 1..TH+3
    h = _conv3x3(xv, waa_ref, TH + 2, WP, C, F, colmask)
    h = jnp.maximum(h, 0.0)
    # SAME row-padding at the global image border: h row r is global image
    # row i*TH + (r-1); zero rows outside [0, H)
    row = jax.lax.broadcasted_iota(jnp.int32, (TH + 2, 1, 1), 0)
    grow = i * TH + row - 1
    h = jnp.where((grow >= 0) & (grow < H), h, 0.0).astype(jnp.bfloat16)

    out = _conv3x3(h, wab_ref, TH, WP, F, F, colmask)
    out_ref[0] = out[:, 8:8 + W, :].astype(jnp.bfloat16)


def fused(x, waa, wab, TH=16):
    B, H, W, C = x.shape
    F = waa.shape[-1]
    grid = (B, H // TH)
    return pl.pallas_call(
        functools.partial(kernel, TH=TH, H=H, W=W, C=C, F=F),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, TH, W, F), lambda b, i: (b, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, W, F), jnp.bfloat16),
        scratch_shapes=[
            pltpu.VMEM((TH + 4, W + 16, C), jnp.bfloat16),
            pltpu.SemaphoreType.DMA,
        ],
    )(x, waa, wab)


def xla_chain(x, waa, wab):
    conv = lambda a, w: jax.lax.conv_general_dilated(
        a, w, (1, 1), 'SAME', dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
        preferred_element_type=jnp.bfloat16)
    return conv(jnp.maximum(conv(x, waa), 0), wab)


if __name__ == '__main__':
    B, H, W, C = 60, 256, 480, 128
    F = 128
    mk = jax.jit(lambda: (
        ((jnp.arange(B * H * W * C, dtype=jnp.int32).reshape(B, H, W, C)
          % 17) - 8).astype(jnp.bfloat16) * 0.1,
        ((jnp.arange(9 * C * F, dtype=jnp.int32).reshape(3, 3, C, F)
          % 13) - 6).astype(jnp.bfloat16) * 0.01,
        ((jnp.arange(9 * F * F, dtype=jnp.int32).reshape(3, 3, F, F)
          % 11) - 5).astype(jnp.bfloat16) * 0.01,
    ))
    x, waa, wab = mk()
    force(x)

    xj = jax.jit(xla_chain)

    xs_ = x[:2, :32]
    ref = xj(xs_, waa, wab)
    got = jax.jit(functools.partial(fused, TH=16))(xs_, waa, wab)
    ref32 = ref.astype(jnp.float32)
    err = float(jnp.abs(ref32 - got.astype(jnp.float32)).max())
    print('correctness max abs err:', err,
          'ref scale:', float(jnp.abs(ref32).max()))

    t_x = timeit(xj, x, waa, wab)
    fl = 2 * B * H * W * 9 * (C * F + F * F)
    print(f'XLA chain : {t_x*1e3:7.1f} ms ({fl/t_x/1e12:.1f} T/s)')
    for TH in (8, 16, 32):
        t = timeit(jax.jit(functools.partial(fused, TH=TH)), x, waa, wab)
        print(f'Pallas TH={TH}: {t*1e3:7.1f} ms ({fl/t/1e12:.1f} T/s)')
