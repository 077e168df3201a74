import numpy as np
import jax
import jax.numpy as jnp
import pytest

from slrsfs_tpu.ops import (
    softsplat,
    softsplat_sum,
    max_splat,
    maximum_warp_norm_splat,
)
from oracles import splat_sum_np, splat_grad_np, max_splat_np, maximum_warp_norm_np


def _rand(shape, rng, scale=1.0):
    return (rng.standard_normal(shape) * scale).astype(np.float32)


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def test_splat_sum_matches_oracle(rng):
    H, W, C = 13, 17, 5
    inp = _rand((H, W, C), rng)
    flow = _rand((H, W, 2), rng, scale=4.0)
    got = softsplat_sum(inp[None], flow[None])[0]
    want = splat_sum_np(inp.astype(np.float64), flow.astype(np.float64))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-4)


def test_splat_sum_identity_flow(rng):
    H, W, C = 8, 8, 3
    inp = _rand((H, W, C), rng)
    flow = np.zeros((H, W, 2), np.float32)
    got = softsplat_sum(inp[None], flow[None])[0]
    np.testing.assert_allclose(np.asarray(got), inp, atol=1e-6)


def test_splat_sum_integer_shift(rng):
    H, W, C = 8, 8, 2
    inp = _rand((H, W, C), rng)
    flow = np.zeros((H, W, 2), np.float32)
    flow[..., 0] = 2.0  # shift right by 2
    got = np.asarray(softsplat_sum(inp[None], flow[None])[0])
    np.testing.assert_allclose(got[:, 2:], inp[:, :-2], atol=1e-6)
    np.testing.assert_allclose(got[:, :2], 0.0, atol=1e-6)


def test_splat_grads_match_oracle(rng):
    H, W, C = 9, 11, 4
    inp = _rand((H, W, C), rng)
    flow = _rand((H, W, 2), rng, scale=3.0)
    g = _rand((H, W, C), rng)

    def f(i, fl):
        return jnp.sum(softsplat_sum(i[None], fl[None])[0] * g)

    gi, gf = jax.grad(f, argnums=(0, 1))(jnp.asarray(inp), jnp.asarray(flow))
    wi, wf = splat_grad_np(
        inp.astype(np.float64), flow.astype(np.float64), g.astype(np.float64)
    )
    np.testing.assert_allclose(np.asarray(gi), wi, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gf), wf, rtol=1e-4, atol=1e-4)


def test_splat_grads_finite_difference(rng):
    # Sanity-check the custom VJP against central differences on a tiny case.
    H, W, C = 4, 4, 2
    inp = _rand((H, W, C), rng)
    flow = _rand((H, W, 2), rng, scale=0.7)
    g = _rand((H, W, C), rng)

    def f(fl):
        return jnp.sum(softsplat_sum(jnp.asarray(inp)[None], fl[None])[0] * g)

    gf = np.asarray(jax.grad(f)(jnp.asarray(flow)))
    eps = 1e-3
    for _ in range(10):
        y, x, c = rng.integers(H), rng.integers(W), rng.integers(2)
        fp = flow.copy()
        fp[y, x, c] += eps
        fm = flow.copy()
        fm[y, x, c] -= eps
        num = (float(f(jnp.asarray(fp))) - float(f(jnp.asarray(fm)))) / (2 * eps)
        assert abs(num - gf[y, x, c]) < 5e-2, (num, gf[y, x, c])


def test_softsplat_modes(rng):
    H, W, C = 8, 10, 3
    inp = _rand((H, W, C), rng)
    flow = _rand((H, W, 2), rng, scale=2.0)
    metric = _rand((H, W, 1), rng)

    s = np.asarray(softsplat(inp[None], flow[None], None, "summation")[0])
    np.testing.assert_allclose(
        s, splat_sum_np(inp.astype(np.float64), flow.astype(np.float64)), rtol=1e-4, atol=1e-4
    )

    # softmax mode == splat(inp * e^m, e^m) then divide (zeros -> 1)
    em = np.exp(metric.astype(np.float64))
    packed = np.concatenate([inp.astype(np.float64) * em, em], axis=-1)
    ref = splat_sum_np(packed, flow.astype(np.float64))
    norm = ref[..., -1:].copy()
    norm[norm == 0.0] = 1.0
    want = ref[..., :-1] / norm
    got = np.asarray(softsplat(inp[None], flow[None], metric[None], "softmax")[0])
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


def test_max_splat_matches_oracle(rng):
    H, W, C = 10, 12, 3
    inp = _rand((H, W, C), rng)
    flow = _rand((H, W, 2), rng, scale=3.0)
    got = np.asarray(max_splat(inp[None], flow[None])[0])
    want = max_splat_np(inp.astype(np.float64), flow.astype(np.float64))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_maximum_warp_norm_matches_oracle(rng):
    H, W = 12, 9
    inp = _rand((H, W, 1), rng)
    flow = _rand((H, W, 2), rng, scale=3.0)
    got = np.asarray(maximum_warp_norm_splat(inp[None], flow[None])[0])
    want = maximum_warp_norm_np(inp.astype(np.float64), flow.astype(np.float64))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_splat_jit_and_batch(rng):
    H, W, C = 6, 6, 2
    inp = _rand((3, H, W, C), rng)
    flow = _rand((3, H, W, 2), rng, scale=2.0)
    f = jax.jit(softsplat_sum)
    got = np.asarray(f(inp, flow))
    for b in range(3):
        want = splat_sum_np(inp[b].astype(np.float64), flow[b].astype(np.float64))
        np.testing.assert_allclose(got[b], want, rtol=1e-4, atol=1e-4)


def test_paired_splat_matches_plain(rng):
    from slrsfs_tpu.ops.splat import softsplat_sum_at, softsplat_sum_at_paired

    H, W, C = 14, 18, 5
    P = 64
    pos = np.stack([rng.integers(0, W, P), rng.integers(0, H, P)], 1).astype(np.int32)
    u = _rand((P, C), rng)
    disp = _rand((P, 2), rng, scale=5.0)
    want = np.asarray(softsplat_sum_at(u, pos, disp, H, W))
    got = np.asarray(softsplat_sum_at_paired(u, pos, disp, H, W))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    # border cases: targets exactly on/over every edge
    disp_edge = np.zeros((P, 2), np.float32)
    disp_edge[:, 0] = (W - 1) - pos[:, 0] + rng.random(P).astype(np.float32)  # right edge
    disp_edge[:, 1] = -pos[:, 1].astype(np.float32) - rng.random(P).astype(np.float32)  # top edge
    want = np.asarray(softsplat_sum_at(u, pos, disp_edge, H, W))
    got = np.asarray(softsplat_sum_at_paired(u, pos, disp_edge, H, W))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_quad_splat_matches_plain(rng):
    from slrsfs_tpu.ops.splat import softsplat_sum_at, softsplat_sum_at_quad

    H, W, C = 14, 18, 5
    P = 64
    pos = np.stack([rng.integers(0, W, P), rng.integers(0, H, P)], 1).astype(np.int32)
    u = _rand((P, C), rng)
    for scale, bias in ((5.0, 0.0), (1.0, 0.0)):
        disp = _rand((P, 2), rng, scale=scale) + bias
        want = np.asarray(softsplat_sum_at(u, pos, disp, H, W))
        got = np.asarray(softsplat_sum_at_quad(u, pos, disp, H, W))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
    # all four edges + corners
    for tx, ty in ((-0.5, -0.5), (W - 0.5, H - 0.5), (-0.5, H - 0.5),
                   (W - 0.5, -0.5), (W - 1.0, 3.5)):
        disp = np.zeros((P, 2), np.float32)
        disp[:, 0] = tx - pos[:, 0]
        disp[:, 1] = ty - pos[:, 1]
        want = np.asarray(softsplat_sum_at(u, pos, disp, H, W))
        got = np.asarray(softsplat_sum_at_quad(u, pos, disp, H, W))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
