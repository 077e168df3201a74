"""Motion regressor: shape/finiteness, hint synthesis, loss wiring."""

import numpy as np
import jax
import jax.numpy as jnp

from slrsfs_tpu.config import Options
from slrsfs_tpu.data.hints import (
    SPEED_THRESHOLD,
    moving_mask_threshold,
    synthesize_hint,
)
from slrsfs_tpu.models.motion import (
    MotionRegressor,
    motion_losses,
    moving_region_mask,
)


def _motion_scene(rng, H=64, W=64):
    motion = np.zeros((H, W, 2), np.float32)
    motion[H // 2 :, :, 0] = 1.5  # bottom half flows right
    motion += rng.standard_normal((H, W, 2)).astype(np.float32) * 0.01
    return motion


def test_spade_motion_regressor_forward():
    # the 8-down UNet needs 256^2 input (bottleneck 1x1), like the reference
    rng = np.random.default_rng(0)
    H = W = 256
    opt = Options(model_type="SPADE_unet_mask_motion", W=H, motionH=H, motionW=W,
                  motion_losses=("10.0_EndPointError",), div_flow=1.0)
    model = MotionRegressor(opt)
    img = jnp.asarray(rng.standard_normal((1, H, W, 3)) * 0.25, jnp.float32)
    motion = jnp.asarray(_motion_scene(rng, H, W))[None]
    mask = moving_region_mask(motion)
    hint = jnp.zeros((1, H, W, 2), jnp.float32)
    # jitted init/apply: eager flax dispatch of the 8-down SPADE UNet costs
    # ~1 min of per-op overhead on this 1-core host
    variables = jax.jit(model.init)(
        {"params": jax.random.PRNGKey(0)}, img, mask, hint)
    pred = jax.jit(model.apply)(variables, img, mask, hint)
    assert pred.shape == (1, H, W, 2)
    assert np.isfinite(np.asarray(pred)).all()

    losses = motion_losses(opt, pred, motion)
    assert "EndPointError" in losses and "Total Loss" in losses
    assert np.isfinite(np.asarray(losses["Total Loss"]))


def test_plain_unet_motion():
    rng = np.random.default_rng(1)
    H = W = 256
    opt = Options(model_type="unet_motion", W=H, motionH=H, motionW=W)
    model = MotionRegressor(opt)
    img = jnp.asarray(rng.standard_normal((1, H, W, 3)) * 0.25, jnp.float32)
    mask = jnp.ones((1, H, W, 1), jnp.float32)
    hint = jnp.zeros((1, H, W, 2), jnp.float32)
    variables = jax.jit(model.init)(
        {"params": jax.random.PRNGKey(0)}, img, mask, hint)
    pred = jax.jit(model.apply)(variables, img, mask, hint)
    assert pred.shape == (1, H, W, 2)


def test_hint_synthesis():
    rng = np.random.default_rng(2)
    motion = _motion_scene(rng)
    mask = moving_mask_threshold(motion)
    assert mask[48, 32] == 1.0 and mask[10, 32] == 0.0

    hint, m = synthesize_hint(motion, n_hints=5)
    assert hint.shape == motion.shape
    # hint is masked to the moving region
    assert np.abs(hint[:32]).max() == 0.0
    # inside the moving region the hint approximates the (constant) motion
    moving_vals = hint[40:, :, 0][m[40:] > 0]
    assert np.abs(moving_vals - 1.5).mean() < 0.2

    # too-few moving pixels -> zero hint
    still = np.zeros((32, 32, 2), np.float32)
    h0, _ = synthesize_hint(still)
    assert np.all(h0 == 0.0)
