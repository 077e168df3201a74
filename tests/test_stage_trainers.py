"""Stage trainers: BG (stage 2) and motion-GAN training steps."""

import numpy as np
import jax
import jax.numpy as jnp

from slrsfs_tpu.config import Options
from slrsfs_tpu.engine.trainer import Trainer
from slrsfs_tpu.models.motion import MotionRegressor
from slrsfs_tpu.models.slr import BackgroundModel


def test_bg_stage_train_step():
    rng = np.random.default_rng(0)
    B, H, W = 2, 32, 32
    opt = Options(ngf=16, W=W, batch_size=B, model_type="bg", MVloss=1.0)
    model = BackgroundModel(opt)
    trainer = Trainer(opt, model, steps_per_epoch=10, task="bg")
    batch = {
        "images": [jnp.asarray(rng.standard_normal((B, H, W, 3)) * 0.25,
                               jnp.float32) for _ in range(2)],
        "index": jnp.zeros((B, 3), jnp.int32),
        "motions": jnp.zeros((B, H, W, 2), jnp.float32),
        "mean_video": jnp.asarray(rng.standard_normal((B, H, W, 3)) * 0.25,
                                  jnp.float32),
    }
    state = trainer.init_state(jax.random.PRNGKey(0), batch)
    step = jax.jit(trainer.make_train_step())
    new_state, logs = step(state, batch, jax.random.PRNGKey(1))
    assert "L1_bg" in logs and "Perceptual_bg" in logs and "GAN" in logs
    for k, v in logs.items():
        assert np.isfinite(np.asarray(v)).all(), k
    g0 = jax.tree.leaves(state.g_params)[0]
    g1 = jax.tree.leaves(new_state.g_params)[0]
    assert not np.allclose(np.asarray(g0), np.asarray(g1))


def test_motion_gan_train_step():
    rng = np.random.default_rng(1)
    B, H = 2, 256
    opt = Options(
        ngf=16, W=H, motionH=H, motionW=H, batch_size=B,
        model_type="SPADE_unet_mask_motion",
        motion_losses=("10.0_EndPointError",), div_flow=1.0,
    )
    model = MotionRegressor(opt)
    trainer = Trainer(opt, model, steps_per_epoch=10, task="motion")
    motion = np.zeros((B, H, H, 2), np.float32)
    motion[:, H // 2 :, :, 0] = 1.0
    batch = {
        "images": [jnp.asarray(rng.standard_normal((B, H, H, 3)) * 0.25,
                               jnp.float32)],
        "motions": jnp.asarray(motion),
        "hints": jnp.zeros((B, H, H, 2), jnp.float32),
    }
    state = trainer.init_state(jax.random.PRNGKey(0), batch)
    step = jax.jit(trainer.make_train_step())
    new_state, logs = step(state, batch, jax.random.PRNGKey(1))
    assert "EndPointError" in logs and "GAN" in logs and "D_Fake" in logs
    for k, v in logs.items():
        assert np.isfinite(np.asarray(v)).all(), k
    g0 = jax.tree.leaves(state.g_params)[0]
    g1 = jax.tree.leaves(new_state.g_params)[0]
    assert not np.allclose(np.asarray(g0), np.asarray(g1))
