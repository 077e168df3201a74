"""Sparse (moving-pixels) rollout must equal the dense rollout exactly when
static pixels have exactly-zero motion."""

import numpy as np
import jax
import jax.numpy as jnp

from slrsfs_tpu.config import Options
from slrsfs_tpu.engine.init_utils import settle
from slrsfs_tpu.engine.rollout import (
    baseline_rollout,
    baseline_rollout_sparse,
    prepare_scene_sparse,
)
from slrsfs_tpu.models.baseline import BaselineModel


def test_sparse_equals_dense():
    rng = np.random.default_rng(11)
    H = W = 32
    N = 6
    opt = Options(ngf=16, W=W)
    model = BaselineModel(opt)
    img = (rng.standard_normal((1, H, W, 3)) * 0.25).astype(np.float32)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
        img, False, True,
    )
    variables = settle(model, variables, (jnp.asarray(img),), n=8)

    flow = (rng.standard_normal((H, W, 2)) * 1.2).astype(np.float32)
    flow[: H // 2] = 0.0  # top half static
    flow[:, : W // 4] = 0.0

    dense = baseline_rollout(model, variables, jnp.asarray(img), jnp.asarray(flow), N)
    positions, valid = prepare_scene_sparse(flow, pad_multiple=64)
    sparse = baseline_rollout_sparse(
        model, variables, jnp.asarray(img), jnp.asarray(flow), N,
        jnp.asarray(positions), jnp.asarray(valid), decode_batch=3,
    )
    np.testing.assert_allclose(
        np.asarray(sparse), np.asarray(dense), rtol=1e-5, atol=1e-5
    )


def test_fast_bf16_splat_close_to_f32():
    """Opt-in bf16 splat accumulation (splat_dtype=bfloat16) renders frames
    within ~1e-2 of the exact f32-accumulated sparse path (weights and
    normalization stay f32 — ops/splat.py _quad_rows)."""
    rng = np.random.default_rng(7)
    H = W = 32
    N = 4
    opt = Options(ngf=16, W=W)
    model = BaselineModel(opt)
    img = (rng.standard_normal((1, H, W, 3)) * 0.25).astype(np.float32)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
        img, False, True,
    )
    variables = settle(model, variables, (jnp.asarray(img),), n=8)

    flow = (rng.standard_normal((H, W, 2)) * 1.2).astype(np.float32)
    flow[: H // 2] = 0.0
    positions, valid = prepare_scene_sparse(flow, pad_multiple=64)
    args = (model, variables, jnp.asarray(img), jnp.asarray(flow), N,
            jnp.asarray(positions), jnp.asarray(valid))
    exact = baseline_rollout_sparse(*args, decode_batch=2)
    fast = baseline_rollout_sparse(*args, decode_batch=2,
                                   splat_dtype=jnp.bfloat16)
    assert np.abs(np.asarray(exact) - np.asarray(fast)).max() < 2e-2


def test_prepare_scene_padding():
    flow = np.zeros((8, 8, 2), np.float32)
    flow[2, 3] = 1.0
    pos, valid = prepare_scene_sparse(flow, pad_multiple=16)
    assert pos.shape == (16, 2)
    assert valid.sum() == 1.0
    assert (pos[0] == [3, 2]).all()
