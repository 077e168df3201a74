import numpy as np
import jax.numpy as jnp
import jax
import pytest

from slrsfs_tpu.ops import euler_integrate, euler_integrate_all
from oracles import euler_integration_np


@pytest.fixture
def rng():
    return np.random.default_rng(1)


def test_euler_zero_motion():
    H, W = 8, 10
    motion = np.zeros((H, W, 2), np.float32)
    disp, vis = euler_integrate(motion, 5)
    np.testing.assert_allclose(np.asarray(disp), 0.0)
    np.testing.assert_allclose(np.asarray(vis), 1.0)


def test_euler_matches_oracle(rng):
    H, W = 16, 14
    motion = (rng.standard_normal((H, W, 2)) * 1.5).astype(np.float32)
    for n in (1, 3, 7):
        disp, vis = euler_integrate(motion, n)
        want_d, want_v = euler_integration_np(motion.astype(np.float64), n)
        np.testing.assert_allclose(np.asarray(disp), want_d, rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(vis), want_v)


def test_euler_all_frames_consistent(rng):
    """The O(N) scan stack must equal per-t re-integration elementwise."""
    H, W, N = 12, 12, 9
    motion = (rng.standard_normal((H, W, 2)) * 2.0).astype(np.float32)
    disps, vis = euler_integrate_all(motion, N)
    assert disps.shape == (N + 1, H, W, 2)
    assert vis.shape == (N + 1, H, W)
    for t in (0, 1, 4, N):
        want_d, want_v = euler_integration_np(motion.astype(np.float64), t)
        np.testing.assert_allclose(np.asarray(disps[t]), want_d, rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(vis[t]), want_v)


def test_euler_oob_semantics():
    """A pixel pushed out of bounds gets displacement max(H,W)+1, sticky."""
    H, W = 6, 6
    motion = np.zeros((H, W, 2), np.float32)
    motion[..., 0] = 2.0  # constant push right: col 4,5 exit after 1 step
    disps, vis = euler_integrate_all(motion, 3)
    d1 = np.asarray(disps[1])
    v1 = np.asarray(vis[1])
    assert np.all(d1[:, 4:, 0] == W + 1)
    assert np.all(v1[:, 4:] == 0.0)
    assert np.all(d1[:, :4, 0] == 2.0)
    # After 3 steps only col 0..? coord x + 2*3 = x+6 > 5 for all x -> all out
    d3 = np.asarray(disps[3])
    assert np.all(d3[..., 0] == W + 1)


def test_euler_jit():
    H, W = 8, 8
    motion = np.ones((H, W, 2), np.float32) * 0.3
    f = jax.jit(lambda m: euler_integrate_all(m, 4))
    disps, _ = f(motion)
    want_d, _ = euler_integration_np(np.asarray(motion, np.float64), 4)
    np.testing.assert_allclose(np.asarray(disps[4]), want_d, rtol=1e-5, atol=1e-5)


def test_compact_dual_matches_two_scans():
    """euler_integrate_compact_dual == two independent compact scans of M and
    -M (one fused scan is the TPU fast path; ops/euler.py)."""
    from slrsfs_tpu.ops import euler_integrate_compact, euler_integrate_compact_dual

    rng = np.random.default_rng(5)
    H, W, N = 24, 30, 7
    motion = (rng.standard_normal((H, W, 2)) * 2.0).astype(np.float32)
    ys, xs = np.mgrid[0:H:2, 0:W:3]
    positions = np.stack([xs.ravel(), ys.ravel()], -1).astype(np.int32)
    m = jnp.asarray(motion)
    p = jnp.asarray(positions)
    ref_f, _ = euler_integrate_compact(m, p, N - 1)
    ref_b, _ = euler_integrate_compact(-m, p, N)
    got_f, got_b = euler_integrate_compact_dual(m, p, N - 1, N)
    np.testing.assert_array_equal(np.asarray(got_f), np.asarray(ref_f))
    np.testing.assert_array_equal(np.asarray(got_b), np.asarray(ref_b))


def test_euler_all_dual_matches_two_scans():
    """euler_integrate_all_dual == two single-direction dense scans."""
    from slrsfs_tpu.ops import euler_integrate_all, euler_integrate_all_dual

    rng = np.random.default_rng(5)
    H, W, N = 20, 24, 7
    motion = (rng.standard_normal((H, W, 2)) * 2.0).astype(np.float32)
    motion[:4] = 0.0
    motion[-2:, :, 1] = 25.0  # drive some pixels out of bounds

    want_f, _ = euler_integrate_all(jnp.asarray(motion), N - 1)
    want_p, _ = euler_integrate_all(jnp.asarray(-motion), N)
    got_f, got_p = euler_integrate_all_dual(jnp.asarray(motion), N - 1, N)
    np.testing.assert_array_equal(np.asarray(got_f), np.asarray(want_f))
    np.testing.assert_array_equal(np.asarray(got_p), np.asarray(want_p))

def test_euler_phased_matches_stack_select():
    """euler_integrate_phased == stack[t] per direction for every (t_f, t_p)
    with t_f + t_p <= T, including the t=0 edges."""
    from slrsfs_tpu.ops import euler_integrate_all, euler_integrate_phased

    rng = np.random.default_rng(8)
    H, W, T = 16, 18, 9
    motion = (rng.standard_normal((H, W, 2)) * 1.5).astype(np.float32)
    motion[:5] = 0.0
    motion[-2:, :, 0] = 20.0  # OOB trajectories

    stack_f, _ = euler_integrate_all(jnp.asarray(motion), T)
    stack_p, _ = euler_integrate_all(jnp.asarray(-motion), T)
    for tf, tp in ((0, 3), (5, 0), (4, 5), (0, T), (T, 0), (2, 7)):
        got_f, got_p = euler_integrate_phased(jnp.asarray(motion), tf, tp, T)
        np.testing.assert_array_equal(
            np.asarray(got_f), np.asarray(stack_f[tf]), err_msg=f"f{tf},{tp}")
        np.testing.assert_array_equal(
            np.asarray(got_p), np.asarray(stack_p[tp]), err_msg=f"p{tf},{tp}")


def test_euler_phased_compact_matches_dense():
    """euler_integrate_phased_compact == euler_integrate_phased on the full
    grid when the tracked set is exactly the nonzero-motion pixels —
    including OOB trajectories, padded rows, and the t=0 edges."""
    from slrsfs_tpu.ops import (
        euler_integrate_phased,
        euler_integrate_phased_compact,
    )

    rng = np.random.default_rng(9)
    H, W, T = 16, 18, 9
    motion = (rng.standard_normal((H, W, 2)) * 1.5).astype(np.float32)
    motion[:5] = 0.0
    motion[-2:, :, 0] = 20.0  # OOB trajectories

    moving = np.any(motion != 0.0, axis=-1)
    ys, xs = np.nonzero(moving)
    P = 256  # padded capacity (> count)
    pos = np.zeros((P, 2), np.int32)
    val = np.zeros((P,), np.float32)
    pos[: len(xs), 0] = xs
    pos[: len(xs), 1] = ys
    val[: len(xs)] = 1.0

    for tf, tp in ((0, 3), (5, 0), (4, 5), (0, T), (T, 0), (2, 7)):
        want_f, want_p = euler_integrate_phased(jnp.asarray(motion), tf, tp, T)
        got_f, got_p = euler_integrate_phased_compact(
            jnp.asarray(motion), jnp.asarray(pos), jnp.asarray(val),
            tf, tp, T)
        np.testing.assert_array_equal(
            np.asarray(got_f), np.asarray(want_f), err_msg=f"f{tf},{tp}")
        np.testing.assert_array_equal(
            np.asarray(got_p), np.asarray(want_p), err_msg=f"p{tf},{tp}")
