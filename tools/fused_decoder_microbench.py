"""Micro-benchmark: two separate 64-channel conv chains vs one fused
block-diagonal 128-channel chain, at SLR decode-chunk shapes.

Hypothesis (GAPS.md "Lane padding is physical in HBM"): a 64-channel bf16
tensor pays the full 128-lane padding in HBM traffic and MXU tiles, so
running the SLR fluid and alpha decoders (both 64-wide ResNet pconv decoders)
as ONE 128-wide network with block-diagonal weights should cost about the
same as a SINGLE 64-wide decoder — i.e. the second decoder becomes ~free.

Run on the TPU: python tools/fused_decoder_microbench.py
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

B, H, W = 60, 256, 480
LAYERS = 6


def timeit(fn, *args):
    t0 = time.perf_counter()
    out = fn(*args)
    float(jnp.asarray(out).ravel()[-1])
    compile_s = time.perf_counter() - t0
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        out = fn(*args)
        float(jnp.asarray(out).ravel()[-1])
        best = min(best, time.perf_counter() - t0)
    return compile_s, best


def chain(x, ws):
    for w in ws:
        x = jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        x = jax.nn.relu(x)
    return x


def main():
    rng = np.random.default_rng(0)
    dt = jnp.bfloat16
    xa = jnp.asarray(rng.standard_normal((B, H, W, 64)) * 0.1, dt)
    xb = jnp.asarray(rng.standard_normal((B, H, W, 64)) * 0.1, dt)
    wsa = [jnp.asarray(rng.standard_normal((3, 3, 64, 64)) * 0.05, dt)
           for _ in range(LAYERS)]
    wsb = [jnp.asarray(rng.standard_normal((3, 3, 64, 64)) * 0.05, dt)
           for _ in range(LAYERS)]
    # block-diagonal fused weights (128 -> 128)
    wsf = []
    for wa, wb in zip(wsa, wsb):
        w = np.zeros((3, 3, 128, 128), np.float32)
        w[:, :, :64, :64] = np.asarray(wa, np.float32)
        w[:, :, 64:, 64:] = np.asarray(wb, np.float32)
        wsf.append(jnp.asarray(w, dt))

    one = jax.jit(lambda x, ws: chain(x, ws))
    two = jax.jit(lambda x1, x2, ws1, ws2: (chain(x1, ws1), chain(x2, ws2)))
    fusedcat = jax.jit(
        lambda x1, x2, ws: chain(jnp.concatenate([x1, x2], -1), ws))
    xf = jnp.concatenate([xa, xb], -1)
    fused = jax.jit(lambda x, ws: chain(x, ws))

    c, t1 = timeit(one, xa, wsa)
    print(f"single 64ch chain   : {t1*1000:7.1f} ms (compile {c:.0f}s)",
          file=sys.stderr)
    c, t2 = timeit(lambda a, b: two(a, b, wsa, wsb), xa, xb)
    print(f"two 64ch chains     : {t2*1000:7.1f} ms (compile {c:.0f}s)",
          file=sys.stderr)
    c, t3 = timeit(lambda x: fused(x, wsf), xf)
    print(f"fused 128ch (precat): {t3*1000:7.1f} ms (compile {c:.0f}s)",
          file=sys.stderr)
    c, t4 = timeit(lambda a, b: fusedcat(a, b, wsf), xa, xb)
    print(f"fused 128ch (+cat)  : {t4*1000:7.1f} ms (compile {c:.0f}s)",
          file=sys.stderr)
    print(f"verdict 64ch: fused/two = {t4/t2:.2f} (win if << 1), "
          f"fused/single = {t4/t1:.2f} (free-second-net if ~1)",
          file=sys.stderr)

    # ---- aligned case: two 128ch chains (half res, as decoder blocks 1-2,
    # 5-7 after Down) vs one grouped conv with 2 groups of 128 ----
    Hh, Wh = H // 2, W // 2
    ya = jnp.asarray(rng.standard_normal((B, Hh, Wh, 128)) * 0.1, dt)
    yb = jnp.asarray(rng.standard_normal((B, Hh, Wh, 128)) * 0.1, dt)
    vsa = [jnp.asarray(rng.standard_normal((3, 3, 128, 128)) * 0.05, dt)
           for _ in range(LAYERS)]
    vsb = [jnp.asarray(rng.standard_normal((3, 3, 128, 128)) * 0.05, dt)
           for _ in range(LAYERS)]
    vsg = [jnp.concatenate([wa, wb], -1)  # HWIO with I=group width
           for wa, wb in zip(vsa, vsb)]

    def gchain(x, ws):
        for w in ws:
            x = jax.lax.conv_general_dilated(
                x, w, (1, 1), "SAME", feature_group_count=2,
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            x = jax.nn.relu(x)
        return x

    two128 = jax.jit(lambda x1, x2, w1, w2: (chain(x1, w1), chain(x2, w2)))
    grp = jax.jit(lambda x1, x2, ws: gchain(jnp.concatenate([x1, x2], -1),
                                            ws))
    c, t5 = timeit(lambda a, b: two128(a, b, vsa, vsb), ya, yb)
    print(f"two 128ch chains    : {t5*1000:7.1f} ms (compile {c:.0f}s)",
          file=sys.stderr)
    c, t6 = timeit(lambda a, b: grp(a, b, vsg), ya, yb)
    print(f"grouped 2x128 (+cat): {t6*1000:7.1f} ms (compile {c:.0f}s)",
          file=sys.stderr)
    print(f"verdict aligned: grouped/two = {t6/t5:.2f} "
          f"(usable if <= ~1.0)", file=sys.stderr)


if __name__ == "__main__":
    main()
