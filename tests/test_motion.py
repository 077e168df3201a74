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
    # mechanics (loss wiring + finiteness): depth-4/width-4 UNet at 32².
    # The reference's depth-8/256² net is pinned full-output by
    # test_spade_mask_motion_full_parity_vs_reference below.
    rng = np.random.default_rng(0)
    H = W = 32
    opt = Options(model_type="SPADE_unet_mask_motion", W=H, motionH=H, motionW=W,
                  motion_losses=("10.0_EndPointError",), div_flow=1.0,
                  motion_num_filters=4, motion_unet_downs=4)
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
    H = W = 32
    opt = Options(model_type="unet_motion", W=H, motionH=H, motionW=W,
                  motion_num_filters=4, motion_unet_downs=4)
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


def test_spade_mask_motion_full_parity_vs_reference():
    """Full-output weight-transfer parity of the SPADE mask-motion UNet vs
    the ACTUAL reference torch module (architectures.py:602-743), through
    the checkpoint importer — covers the per-channel upsample quirk
    (ch[:3] bilinear / ch[3:4] nearest / ch[4:] bilinear), the SPADE
    segmap-resize quirk, lrelu placement, and all 8 skip concats."""
    import argparse
    import os
    import sys
    import tempfile

    import pytest

    torch = pytest.importorskip("torch")
    sys.path.insert(0, os.path.join(os.path.dirname(__file__)))
    import torch_ref

    torch_ref.install_tv_stub()
    sys.path.insert(0, "/root/reference")
    from models.networks.architectures import SPADEUnet4MaskMotion as RefNet

    nf, H = 8, 256
    torch.manual_seed(3)
    ref_o = torch_ref.ref_opt(norm_G="sync:spectral_instance")
    tm = RefNet(num_filters=nf, channels_in=6, channels_out=2, opt=ref_o)
    x = torch.randn(1, 6, H, H) * 0.3
    torch_ref.settle_spectral(tm, x)
    with torch.no_grad():
        want = tm(x).numpy()

    from slrsfs_tpu.io.checkpoint import import_checkpoint

    sd = {f"motion_predictor.{k}": v for k, v in tm.state_dict().items()}
    ns = argparse.Namespace(
        model_type="SPADE_unet_mask_motion", W=H, motionW=H, motionH=H,
        div_flow=1.0, use_mask_as_motion_input=True,
        use_hint_as_motion_input=True, norm_G="sync:spectral_instance",
        motion_num_filters=nf)
    with tempfile.TemporaryDirectory() as td:
        path = os.path.join(td, "motion.pth")
        torch.save({"state_dict": sd, "opts": ns}, path)
        variables, opt = import_checkpoint(path)
    assert opt.motion_num_filters == nf

    from slrsfs_tpu.models.motion import MotionRegressor

    m = MotionRegressor(opt)
    xn = torch_ref.to_nhwc(x)
    img, mask, hint = xn[..., :3], xn[..., 3:4], xn[..., 4:6]
    got = jax.jit(m.apply)(variables, jnp.asarray(img), jnp.asarray(mask),
                           jnp.asarray(hint))
    torch_ref.assert_close(np.asarray(got), want.transpose(0, 2, 3, 1),
                           rel=3e-4)


def test_plain_unet_motion_full_parity_vs_reference():
    """Full-output weight-transfer parity of the plain motion UNet vs the
    ACTUAL reference torch module (architectures.py:382-493)."""
    import argparse
    import os
    import sys
    import tempfile

    import pytest

    torch = pytest.importorskip("torch")
    sys.path.insert(0, os.path.join(os.path.dirname(__file__)))
    import torch_ref

    torch_ref.install_tv_stub()
    sys.path.insert(0, "/root/reference")
    from models.networks.architectures import Unet4Motion as RefNet

    nf, H = 8, 256
    torch.manual_seed(4)
    ref_o = torch_ref.ref_opt(norm_G="sync:spectral_instance")
    tm = RefNet(num_filters=nf, channels_in=6, channels_out=2, opt=ref_o)
    x = torch.randn(1, 6, H, H) * 0.3
    torch_ref.settle_spectral(tm, x)
    with torch.no_grad():
        want = tm(x).numpy()

    from slrsfs_tpu.io.checkpoint import import_checkpoint

    sd = {f"motion_predictor.{k}": v for k, v in tm.state_dict().items()}
    ns = argparse.Namespace(
        model_type="unet_motion", W=H, motionW=H, motionH=H,
        div_flow=1.0, use_mask_as_motion_input=True,
        use_hint_as_motion_input=True, norm_G="sync:spectral_instance",
        motion_num_filters=nf)
    with tempfile.TemporaryDirectory() as td:
        path = os.path.join(td, "motion.pth")
        torch.save({"state_dict": sd, "opts": ns}, path)
        variables, opt = import_checkpoint(path)

    from slrsfs_tpu.models.motion import MotionRegressor

    m = MotionRegressor(opt)
    xn = torch_ref.to_nhwc(x)
    got = jax.jit(m.apply)(variables, jnp.asarray(xn[..., :3]),
                           jnp.asarray(xn[..., 3:4]),
                           jnp.asarray(xn[..., 4:6]))
    torch_ref.assert_close(np.asarray(got), want.transpose(0, 2, 3, 1),
                           rel=3e-4)
