"""Stage trainers: BG (stage 2) and motion-GAN training steps."""

import numpy as np
import jax
import jax.numpy as jnp

from conftest import tiny_options
from slrsfs_tpu.engine.trainer import Trainer
from slrsfs_tpu.models.motion import MotionRegressor
from slrsfs_tpu.models.slr import BackgroundModel


def test_bg_stage_train_step(vgg_vars32):
    rng = np.random.default_rng(0)
    B, H, W = 2, 32, 32
    opt = tiny_options(W=W, batch_size=B, model_type="bg", MVloss=1.0)
    model = BackgroundModel(opt)
    trainer = Trainer(opt, model, steps_per_epoch=10, task="bg")
    trainer.load_vgg(vgg_vars32)
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
    """One SPADE-UNet motion GAN step with the pix2pixHDorigin discriminator
    (getIntermFeat=False semantics: GAN_Feat stays 0). This single step also
    stands in for the default-D motion GAN step — the D is config-selected
    and the default multiscale D trains in every baseline/BG trainer test —
    so only one motion train-step graph is compiled by the suite (32² via
    tiny_options' depth-4 motion UNet; parity tests keep depth 8 / 256²)."""
    rng = np.random.default_rng(1)
    B, H = 1, 32
    opt = tiny_options(
        W=H, motionH=H, motionW=H, batch_size=B,
        model_type="SPADE_unet_mask_motion",
        discriminator_losses="pix2pixHDorigin",
        motion_losses=("10.0_EndPointError",), div_flow=1.0,
    )
    model = MotionRegressor(opt)
    trainer = Trainer(opt, model, steps_per_epoch=10, task="motion")
    # the production origin-D is reference-hardcoded ndf=64/n_layers=3
    # (gan_loss.py:127-144 via trainer.py); swap in a width-8 twin for this
    # MECHANICS test — XLA:CPU conv-backward runs ~1 GFLOP/s on the 1-core
    # suite host, so the full-width D alone costs ~21 s/step
    from slrsfs_tpu.nn.pix2pixhd import OriginMultiscaleDiscriminator

    trainer.d_model = OriginMultiscaleDiscriminator(ndf=8, n_layers=2,
                                                    num_D=2)
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
    assert float(logs["GAN_Feat"]) == 0.0  # origin D: no intermediate feats
    for k, v in logs.items():
        assert np.isfinite(np.asarray(v)).all(), k
    g0 = jax.tree.leaves(state.g_params)[0]
    g1 = jax.tree.leaves(new_state.g_params)[0]
    assert not np.allclose(np.asarray(g0), np.asarray(g1))


def test_fixmotion_finetune_step(vgg_vars32):
    """Embedded motion regressor with frozen params: fluid nets train, the
    regressor stays bit-identical (reference train_animating_fixmotion.py)."""
    from slrsfs_tpu.models.baseline import (
        BaselineMotionTrainable,
        baseline_motion_extra_losses,
    )

    rng = np.random.default_rng(2)
    B = 1
    H = 32  # tiny_options' depth-4 motion UNet: min input 16²
    opt = tiny_options(
        W=H, motionH=H, motionW=H, batch_size=B,
        train_motion=True, freeze_motion=True,
        motion_losses=("10.0_EndPointError",), div_flow=1.0,
    )
    model = BaselineMotionTrainable(opt, train_max_steps=2)
    trainer = Trainer(opt, model, steps_per_epoch=10,
                      extra_losses_fn=baseline_motion_extra_losses)
    trainer.load_vgg(vgg_vars32)
    idx = np.zeros((B, 3), np.int32)
    idx[:, 1] = 1
    idx[:, 2] = 2
    motion = np.zeros((B, H, H, 2), np.float32)
    motion[:, H // 2 :, :, 0] = 1.0
    batch = {
        "images": [jnp.asarray(rng.standard_normal((B, H, H, 3)) * 0.25,
                               jnp.float32) for _ in range(3)],
        "index": jnp.asarray(idx),
        "motions": jnp.asarray(motion),
        "hints": jnp.zeros((B, H, H, 2), jnp.float32),
    }
    state = trainer.init_state(jax.random.PRNGKey(0), batch)
    step = jax.jit(trainer.make_train_step())
    new_state, logs = step(state, batch, jax.random.PRNGKey(1))
    assert "EndPointError" in logs
    # motion params frozen bit-exactly; encoder params moved
    m0 = jax.tree.leaves(state.g_params["motion_regressor"])
    m1 = jax.tree.leaves(new_state.g_params["motion_regressor"])
    for a, b in zip(m0, m1):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    e0 = jax.tree.leaves(state.g_params["encoder"])[0]
    e1 = jax.tree.leaves(new_state.g_params["encoder"])[0]
    assert not np.allclose(np.asarray(e0), np.asarray(e1))


def test_attach_moving_sets_sticky_state():
    """With a run-level state dict, the sparse/dense decision and the P
    bucket are sticky: data hovering around max_frac must not alternate
    batch structures (each structure change recompiles the full train-step
    graph — review finding)."""
    from slrsfs_tpu.cli.train import attach_moving_sets

    H = W = 32

    def batch(frac):
        m = np.zeros((1, H, W, 2), np.float32)
        m[:, : int(H * frac)] = 1.0
        return {"motions": m}

    state = {}
    b1 = attach_moving_sets(batch(0.25), max_frac=0.5, state=state)
    assert "mov_pos" in b1 and state["mode"] == "sparse"
    p1 = b1["mov_pos"].shape[1]
    # a later batch OVER the threshold keeps the sparse structure
    b2 = attach_moving_sets(batch(0.9), max_frac=0.5, state=state)
    assert "mov_pos" in b2
    assert b2["mov_pos"].shape[1] >= p1
    # bucket never shrinks back
    b3 = attach_moving_sets(batch(0.1), max_frac=0.5, state=state)
    assert b3["mov_pos"].shape[1] == b2["mov_pos"].shape[1]
    # dense-first run: sticky dense
    state2 = {}
    d1 = attach_moving_sets(batch(0.9), max_frac=0.5, state=state2)
    assert "mov_pos" not in d1 and state2["mode"] == "dense"
    d2 = attach_moving_sets(batch(0.1), max_frac=0.5, state=state2)
    assert "mov_pos" not in d2
    # stateless call keeps the old per-batch behavior (tests/parity use it)
    assert "mov_pos" in attach_moving_sets(batch(0.25), max_frac=0.5)
    assert "mov_pos" not in attach_moving_sets(batch(0.9), max_frac=0.5)
