"""Sparse (moving-pixels) rollout must equal the dense rollout exactly when
static pixels have exactly-zero motion."""

import numpy as np
import jax
import jax.numpy as jnp

from conftest import tiny_options
from slrsfs_tpu.engine.init_utils import settle
from slrsfs_tpu.engine.rollout import (
    baseline_rollout,
    baseline_rollout_sparse,
    prepare_scene_sparse,
)
from slrsfs_tpu.models.baseline import BaselineModel


def _jit_init(model, img):
    return jax.jit(lambda r, i: model.init(r, i, False, True))(
        {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
        img)


def _run_dense(model, N):
    return jax.jit(lambda v, i, f: baseline_rollout(model, v, i, f, N))


def _run_sparse(model, N, db, sd=None):
    return jax.jit(lambda v, i, f, p, va: baseline_rollout_sparse(
        model, v, i, f, N, p, va, decode_batch=db, splat_dtype=sd))


import pytest


@pytest.fixture(scope="module")
def tiny32_env():
    """Shared settled TinyTest baseline + canonical 32² scene (tracing
    dominates this 1-core suite — VERDICT r4 #5). Params are independent
    of the v2 flag, so the v2 test reuses these variables too."""
    rng = np.random.default_rng(11)
    H = W = 32
    opt = tiny_options(W=W)
    model = BaselineModel(opt)
    img = (rng.standard_normal((1, H, W, 3)) * 0.25).astype(np.float32)
    variables = _jit_init(model, img)
    variables = settle(model, variables, (jnp.asarray(img),), n=2)
    flow = (rng.standard_normal((H, W, 2)) * 1.2).astype(np.float32)
    flow[: H // 2] = 0.0  # top half static
    flow[:, : W // 4] = 0.0
    positions, valid = prepare_scene_sparse(flow, pad_multiple=64)
    return dict(opt=opt, model=model, img=img, variables=variables,
                flow=flow, positions=positions, valid=valid)


def test_sparse_equals_dense_and_bf16_splat_close(tiny32_env, real32_env):
    """(a) The sparse rollout equals the dense rollout exactly on a scene
    with exact-zero static regions — engine-path equality only (parity vs
    torch lives in test_models_parity/test_forward_flow_parity), so
    TinyTest keeps the pconv decode semantics at ~1/30 the CPU cost;
    (b) opt-in bf16 splat accumulation (splat_dtype=bfloat16) stays within
    ~1e-2 of the exact f32-accumulated sparse frames (weights and
    normalization stay f32 — ops/splat.py _quad_rows). The 1e-2 claim is
    arch-dependent (TinyTest's 2-block decoder amplifies the splat noise
    ~4x), so (b) runs the real 8-block ngf=16 arch — but only the two
    sparse rollouts, never the expensive dense one."""
    N = 6
    model = tiny32_env["model"]
    img, flow = tiny32_env["img"], tiny32_env["flow"]
    variables = tiny32_env["variables"]
    positions, valid = tiny32_env["positions"], tiny32_env["valid"]

    dense = _run_dense(model, N)(variables, jnp.asarray(img),
                                 jnp.asarray(flow))
    args = (variables, jnp.asarray(img), jnp.asarray(flow),
            jnp.asarray(positions), jnp.asarray(valid))
    sparse = _run_sparse(model, N, 3)(*args)
    np.testing.assert_allclose(
        np.asarray(sparse), np.asarray(dense), rtol=1e-5, atol=1e-5
    )

    # (b) real arch (session fixture), sparse f32 vs sparse bf16-splat
    N = 4
    model = real32_env["model"]
    args = (real32_env["variables"],) + args[1:]
    sparse = _run_sparse(model, N, 2)(*args)
    fast = _run_sparse(model, N, 2, sd=jnp.bfloat16)(*args)
    assert np.abs(np.asarray(sparse) - np.asarray(fast)).max() < 2e-2


def test_prepare_scene_padding():
    flow = np.zeros((8, 8, 2), np.float32)
    flow[2, 3] = 1.0
    pos, valid = prepare_scene_sparse(flow, pad_multiple=16)
    assert pos.shape == (16, 2)
    assert valid.sum() == 1.0
    assert (pos[0] == [3, 2]).all()


def test_prepare_scene_geometric_buckets():
    """bucket_ratio maps nearby moving-set sizes onto one fixed geometric
    bucket series (round-4 sweep sharing: the jit cache keys on P, so a
    multi-scene sweep recompiles per scene without it), capped at H·W."""
    H = W = 64

    def P_of(n, **kw):
        flow = np.zeros((H, W, 2), np.float32)
        flow.reshape(-1, 2)[:n, 0] = 1.0
        return prepare_scene_sparse(flow, pad_multiple=16, **kw)[0].shape[0]

    # exact padding: one bucket per 16 rows
    assert P_of(33) == 48 and P_of(49) == 64
    # geometric: nearby sizes share a bucket from the fixed series
    ps = {n: P_of(n, bucket_ratio=1.25) for n in (33, 40, 200, 230, 4000)}
    assert ps[33] == ps[40]
    assert ps[200] == ps[230]
    for n, p in ps.items():
        assert p >= n and p <= H * W
    # validity content is unchanged by bucketing
    flow = np.zeros((H, W, 2), np.float32)
    flow.reshape(-1, 2)[:33, 0] = 1.0
    pos, val = prepare_scene_sparse(flow, pad_multiple=16, bucket_ratio=1.25)
    assert val.sum() == 33
    # a ratio in (1.0, 1 + 1/pad_multiple) must terminate (round-4 advisor:
    # int(b*ratio) used to round back to b and loop forever) and still cover n
    assert P_of(33, bucket_ratio=1.01) >= 33
    assert P_of(4000, bucket_ratio=1.0005) >= 4000


def test_maximum_warp_norm_sparse_matches_dense_op():
    """maximum_warp_norm_sparse == maximum_warp_norm_splat at static pixels
    (dense map) and moving pixels (compact vector), including border landings
    and OOB targets."""
    from slrsfs_tpu.ops.splat import (
        maximum_warp_norm_sparse,
        maximum_warp_norm_splat,
    )

    rng = np.random.default_rng(3)
    H, W = 24, 20
    z = rng.standard_normal((H, W)).astype(np.float32) * 2.0
    flow = (rng.standard_normal((H, W, 2)) * 3.0).astype(np.float32)
    flow[: H // 3] = 0.0         # static band
    flow[H - 2 :, :, 1] = 30.0   # push off-grid (OOB targets)
    flow[:, W - 2 :, 0] = -0.7   # fractional border landings

    want = np.asarray(maximum_warp_norm_splat(
        jnp.asarray(z)[None, ..., None], jnp.asarray(flow)[None]))[0, ..., 0]

    positions, valid = prepare_scene_sparse(flow, pad_multiple=64)
    static = (np.all(flow == 0.0, axis=-1)).astype(np.float32)
    z_mov = z[positions[:, 1], positions[:, 0]]
    disp = flow[positions[:, 1], positions[:, 0]]
    got_d, got_m = maximum_warp_norm_sparse(
        jnp.asarray(z), jnp.asarray(static), jnp.asarray(z_mov),
        jnp.asarray(positions), jnp.asarray(valid), jnp.asarray(disp), H, W)

    got_d = np.asarray(got_d)
    np.testing.assert_allclose(got_d[static > 0.5], want[static > 0.5],
                               rtol=1e-6, atol=1e-6)
    got_m = np.asarray(got_m)[valid > 0.5]
    want_m = want[positions[valid > 0.5, 1], positions[valid > 0.5, 0]]
    np.testing.assert_allclose(got_m, want_m, rtol=1e-6, atol=1e-6)


def test_sparse_equals_dense_v2(tiny32_env):
    """The v2 per-frame max-warp-norm rollout runs sparsely and must equal
    the dense rollout exactly (previously a dense fallback). Params are
    v2-independent, so the module fixture's variables serve."""
    N = 4
    opt = tiny32_env["opt"].replace(use_softmax_splatter_v2=True,
                                    use_softmax_splatter=False)
    model = BaselineModel(opt)
    img, flow = tiny32_env["img"], tiny32_env["flow"]
    variables = tiny32_env["variables"]
    positions, valid = tiny32_env["positions"], tiny32_env["valid"]

    dense = _run_dense(model, N)(variables, jnp.asarray(img),
                                 jnp.asarray(flow))
    sparse = _run_sparse(model, N, 2)(
        variables, jnp.asarray(img), jnp.asarray(flow),
        jnp.asarray(positions), jnp.asarray(valid))
    np.testing.assert_allclose(
        np.asarray(sparse), np.asarray(dense), rtol=2e-5, atol=2e-5
    )
