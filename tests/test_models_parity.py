"""Stack-level parity: our encoder/decoder vs reference blocks assembled per
the arch tables, and rollout-engine invariants."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn

import jax
import jax.numpy as jnp

from slrsfs_tpu.config import Options
from slrsfs_tpu.io.torch_import import (
    KeyReader,
    import_decoder_pconv2,
    import_encoder,
    split_collections,
)
from slrsfs_tpu.models.baseline import BaselineModel
from slrsfs_tpu.nn.archs import get_resnet_arch
from slrsfs_tpu.nn.resnets import ResNetDecoderPconv2, ResNetEncoderWithZ
from torch_ref import ref_opt, to_nchw, to_nhwc

from models.layers.blocks import ResNet_Block, ResNet_Block_Pconv2  # reference

OPT = Options(ngf=16)
RTOL, ATOL = 3e-4, 3e-4


def make_torch_encoder_with_z(arch, topt):
    """Mirror of reference ResNetEncoder_with_Z construction
    (architectures.py:155-197) for parity testing."""
    layers = list(arch["layers_enc"])
    blocks = []
    for i in range(1, len(layers) - 1):
        blocks.append(ResNet_Block(layers[i - 1], layers[i], topt, arch["downsample"][i - 1]))
    blocks.append(ResNet_Block(layers[-2], layers[-1] + 1, topt, arch["downsample"][-1]))
    m = tnn.Module()
    m.gblocks = tnn.Sequential(*blocks)
    return m


def make_torch_decoder_pconv2(arch, topt):
    """Mirror of reference ResNetDecoderPconv2 (architectures.py:345-375)."""
    layers = arch["layers_dec"]
    blocks = []
    for i in range(1, len(layers)):
        blocks.append(
            ResNet_Block_Pconv2(layers[i - 1], layers[i], topt, arch["upsample"][i - 1],
                                3, arch["activation"][i - 1])
        )
    m = tnn.Module()
    m.eblocks = tnn.Sequential(*blocks)
    return m


def _warmup(run_fn, shape, n=8):
    """Settle spectral-norm power iteration + BN running stats so eval-mode
    activations are numerically sane (as in a real trained checkpoint)."""
    with torch.no_grad():
        for i in range(n):
            run_fn(torch.randn(*shape) * 0.5)


def test_encoder_with_z_parity():
    rng = np.random.default_rng(3)
    topt = ref_opt()
    arch = get_resnet_arch(OPT.refine_model_type, OPT, 3)
    tm = make_torch_encoder_with_z(arch, topt)
    tm.train()
    _warmup(tm.gblocks, (2, 3, 32, 32))
    tm.eval()

    x = rng.standard_normal((1, 32, 32, 3)).astype(np.float32)
    r = KeyReader(tm.state_dict())
    tree = split_collections(import_encoder(r, "", OPT, in_channels=3, with_z=True))
    assert all("accumulation_counter" in k for k in r.unused()), r.unused()[:5]

    with torch.no_grad():
        out = tm.gblocks(to_nchw(x))
    want_fs = to_nhwc(out[:, :-1])
    want_z = to_nhwc(out[:, -1:])

    m = ResNetEncoderWithZ(OPT, in_channels=3)
    import jax as _jax
    got_fs, got_z = _jax.jit(lambda v, t: m.apply(v, t, False, True))(tree, x)
    np.testing.assert_allclose(np.asarray(got_fs), want_fs, rtol=RTOL, atol=ATOL)
    np.testing.assert_allclose(np.asarray(got_z), want_z, rtol=RTOL, atol=ATOL)


def test_decoder_pconv2_parity():
    rng = np.random.default_rng(4)
    topt = ref_opt()
    arch = get_resnet_arch(OPT.refine_model_type, OPT)
    tm = make_torch_decoder_pconv2(arch, topt)
    tm.train()

    def run_dec(t):
        h, mk = tm.eblocks[0](t, (t != 0).float())
        for blk in list(tm.eblocks)[1:]:
            h, mk = blk(h, mk)
        return h

    _warmup(run_dec, (2, 64, 32, 32))
    tm.eval()

    # splat-like input: some all-channel holes
    x = rng.standard_normal((1, 32, 32, 64)).astype(np.float32)
    holes = rng.random((1, 32, 32, 1)) < 0.3
    x = np.where(holes, 0.0, x).astype(np.float32)

    with torch.no_grad():
        xt = to_nchw(x)
        mask = (xt != 0).float()
        h, mk = tm.eblocks[0](xt, mask)
        for blk in list(tm.eblocks)[1:]:
            h, mk = blk(h, mk)
    want = to_nhwc(h)

    r = KeyReader(tm.state_dict())
    tree = split_collections(import_decoder_pconv2(r, "", OPT))
    # identity-shaped pconv2 blocks construct a conv_b that forward never uses
    # (reference blocks.py:243-247); its params sit unused in the checkpoint
    assert all("accumulation" in k or ".conv_b." in k for k in r.unused())

    m = ResNetDecoderPconv2(OPT)
    import jax as _jax
    got = _jax.jit(lambda v, t: m.apply(v, t, False, True))(tree, x)
    np.testing.assert_allclose(np.asarray(got), want, rtol=5e-4, atol=5e-4)


def test_rollout_smoke_and_frame0(real32_env):
    from slrsfs_tpu.engine.rollout import baseline_rollout

    rng = np.random.default_rng(5)
    model = real32_env["model"]
    img = real32_env["img"]
    variables = real32_env["variables"]
    flow = (rng.standard_normal((32, 32, 2)) * 0.8).astype(np.float32)
    N = 5
    frames = jax.jit(lambda v, i, f: baseline_rollout(
        model, v, i, f, N))(variables, jnp.asarray(img),
                            jnp.asarray(flow))
    frames = np.asarray(frames)
    assert frames.shape == (N, 32, 32, 3)
    assert np.isfinite(frames).all()
    assert np.abs(frames).max() <= 1.0

    # frame 0: zero displacement, alpha=1 -> decode(encode(img) features)
    fs, z = jax.jit(lambda v, t: model.apply(v, t, method="encode"))(
        variables, jnp.asarray(img))
    want0 = jax.jit(lambda v, t: model.apply(v, t, method="decode"))(
        variables, fs)
    np.testing.assert_allclose(frames[0], np.asarray(want0[0]), rtol=1e-4, atol=1e-4)
