"""Checkpoint import: reference-shaped .pth → flax variables, opts
restoration, orbax roundtrip."""

import argparse
import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn

import jax
import jax.numpy as jnp

from slrsfs_tpu.config import Options
from slrsfs_tpu.io.checkpoint import (
    import_checkpoint,
    import_discriminator,
    opts_from_namespace,
    restore_native,
    save_native,
)
from slrsfs_tpu.models.baseline import BaselineModel
from slrsfs_tpu.nn.archs import get_resnet_arch
from test_models_parity import (
    _warmup,
    make_torch_decoder_pconv2,
    make_torch_encoder_with_z,
)
from torch_ref import ref_opt, to_nchw, to_nhwc

OPT = Options(ngf=16)


def _fake_reference_checkpoint(tmpdir):
    """Assemble a reference-shaped baseline checkpoint from torch modules."""
    topt = ref_opt()
    arch = get_resnet_arch(OPT.refine_model_type, OPT, 3)
    enc = make_torch_encoder_with_z(arch, topt)
    # live decode input = full encoder feature width (65 in the Layers
    # family), which the table understates as 64 — mirror the live model
    dec_arch = dict(arch, layers_dec=[arch["layers_enc"][-1]]
                    + list(arch["layers_dec"])[1:])
    dec = make_torch_decoder_pconv2(dec_arch, topt)
    enc.train(); dec.train()
    _warmup(enc.gblocks, (2, 3, 32, 32))

    def run_dec(t):
        h, mk = dec.eblocks[0](t, (t != 0).float())
        for blk in list(dec.eblocks)[1:]:
            h, mk = blk(h, mk)
        return h

    _warmup(run_dec, (2, 64, 32, 32))
    enc.eval(); dec.eval()

    sd = {}
    for k, v in enc.state_dict().items():
        sd[f"model.module.encoder.{k}"] = v
    for k, v in dec.state_dict().items():
        sd[f"model.module.projector.{k}"] = v
    # vestigial keys the importer must drop (train_animating.py:416-423)
    sd["model.module.xyzs"] = torch.zeros(1, 3, 4)
    sd["model.module.ones"] = torch.ones(1)

    ns = argparse.Namespace(
        model_type="softmax_splating", ngf=16, W=32, out_channel=65,
        refine_model_type=OPT.refine_model_type, train_Z=True,
        use_softmax_splatter=True, norm_G="sync:spectral_batch",
        pconv="pconv_pbn_woresbias", losses=["1.0_l1", "10.0_content"],
        some_unknown_flag=123,
    )
    path = os.path.join(tmpdir, "fake_baseline.pth")
    torch.save({"state_dict": sd, "opts": ns, "epoch": 7}, path)
    return path, enc, dec


def test_import_checkpoint_baseline(tmp_path):
    path, enc, dec = _fake_reference_checkpoint(str(tmp_path))
    variables, opt = import_checkpoint(path)
    assert opt.model_type == "softmax_splating"
    assert opt.ngf == 16 and opt.W == 32
    assert opt.bn_noise_misc  # forced deterministic for inference
    assert opt.losses == ("1.0_l1", "10.0_content")

    rng = np.random.default_rng(0)
    model = BaselineModel(opt)
    img = (rng.standard_normal((1, 32, 32, 3)) * 0.25).astype(np.float32)

    fs, z = jax.jit(lambda v, x: model.apply(v, x, method="encode"))(
        variables, jnp.asarray(img))
    with torch.no_grad():
        out = enc.gblocks(to_nchw(img))
    np.testing.assert_allclose(np.asarray(fs), to_nhwc(out[:, :-1]),
                               rtol=3e-4, atol=3e-4)

    feats = (rng.standard_normal((1, 32, 32, 64)) * 0.3).astype(np.float32)
    got = jax.jit(lambda v, x: model.apply(v, x, method="decode"))(
        variables, jnp.asarray(feats))
    with torch.no_grad():
        xt = to_nchw(feats)
        h, mk = dec.eblocks[0](xt, (xt != 0).float())
        for blk in list(dec.eblocks)[1:]:
            h, mk = blk(h, mk)
        want = torch.tanh(h)
    np.testing.assert_allclose(np.asarray(got), to_nhwc(want),
                               rtol=5e-4, atol=5e-4)


def test_import_discriminator(tmp_path):
    import sys
    sys.path.insert(0, "/root/reference")
    from models.networks.discriminators import MultiscaleDiscriminator as TorchD

    topt = argparse.Namespace(
        ndf=16, norm_D="spectralinstance", output_nc=3, n_layers_D=4,
        no_ganFeat_loss=False, isTrain=False, num_D=2, netD_subarch="n_layer",
        lr=1e-3,
    )
    td = TorchD(topt)
    td.eval()
    rng = np.random.default_rng(1)
    x = (rng.standard_normal((1, 64, 64, 3)) * 0.3).astype(np.float32)
    with torch.no_grad():
        want = td(to_nchw(x))

    sd = {f"netD.netD.{k}": v for k, v in td.state_dict().items()}
    opt = Options(ndf=16)
    variables = import_discriminator(sd, opt)

    from slrsfs_tpu.nn.discriminators import MultiscaleDiscriminator

    m = MultiscaleDiscriminator(opt)
    got = jax.jit(lambda v, t: m.apply(v, t, False))(
        variables, jnp.asarray(x))
    assert len(got) == 2
    for scale in range(2):
        for layer in range(5):
            np.testing.assert_allclose(
                np.asarray(got[scale][layer]),
                to_nhwc(want[scale][layer]),
                rtol=1e-3, atol=1e-3,
            )


def test_opts_namespace_mapping():
    ns = argparse.Namespace(ngf=32, W=768, unknown_thing="x",
                            losses=["2.0_l1"], niter=5)
    opt = opts_from_namespace(ns)
    assert opt.ngf == 32 and opt.W == 768 and opt.niter == 5
    assert opt.losses == ("2.0_l1",)


def test_orbax_roundtrip(tmp_path, base_trainer):
    opt = base_trainer["opt"]
    state = base_trainer["state"]

    path = str(tmp_path / "ckpt1")
    save_native(path, state, opt, epoch=3, extra={"best_loss": 0.5})
    restored, meta = restore_native(path, jax.tree.map(np.asarray, state))
    assert meta["epoch"] == 3 and meta["best_loss"] == 0.5
    assert meta["opts"]["ngf"] == opt.ngf
    l0 = jax.tree.leaves(state.g_params)[0]
    l1 = jax.tree.leaves(restored.g_params)[0]
    np.testing.assert_array_equal(np.asarray(l0), np.asarray(l1))


def test_import_optimizer_state_adam():
    """Torch→optax Adam state import (train_animating.py:270-288 resume
    contract): after importing weights + exp_avg/exp_avg_sq/step, one optax
    step with identical (importer-mapped) grads reproduces torch's next Adam
    step on every parameter."""
    import optax

    from slrsfs_tpu.io.checkpoint import (
        import_adam_moments,
        import_baseline_model,
        restore_adam_state,
    )

    topt = ref_opt()
    arch = get_resnet_arch(OPT.refine_model_type, OPT, 3)
    dec_arch = dict(arch, layers_dec=[arch["layers_enc"][-1]]
                    + list(arch["layers_dec"])[1:])
    m = tnn.Module()
    m.encoder = make_torch_encoder_with_z(arch, topt)
    m.projector = make_torch_decoder_pconv2(dec_arch, topt)

    lr, b1, b2 = 1e-3, 0.0, 0.9
    adam = torch.optim.Adam(m.parameters(), lr=lr, betas=(b1, b2))
    torch.manual_seed(11)
    grads = {k: torch.randn_like(p) * 0.01 for k, p in m.named_parameters()}
    for _ in range(3):
        for k, p in m.named_parameters():
            p.grad = grads[k].clone()
        adam.step()

    raw_sd = {f"model.module.{k}": v.detach().clone()
              for k, v in m.state_dict().items()}
    ckpt = {"state_dict": raw_sd, "optimizerG": adam.state_dict()}

    def g_fn(sd):
        return import_baseline_model(sd, OPT)["params"]

    params = g_fn(raw_sd)
    mu, nu, count = import_adam_moments(
        ckpt["optimizerG"], raw_sd, g_fn, prefix="model.")
    assert count == 3
    tx = optax.adam(lr, b1=b1, b2=b2)
    st = restore_adam_state(tx.init(params), mu, nu, count)

    grad_sd = dict(raw_sd)
    for k in grads:
        grad_sd[f"model.module.{k}"] = grads[k]
    g_tree = g_fn(grad_sd)

    updates, _ = tx.update(g_tree, st, params)
    got = optax.apply_updates(params, updates)

    # torch takes its 4th step with the same grads
    for k, p in m.named_parameters():
        p.grad = grads[k].clone()
    adam.step()
    want = g_fn({f"model.module.{k}": v for k, v in m.state_dict().items()})

    flat_got = jax.tree.leaves(got)
    flat_want = jax.tree.leaves(want)
    assert len(flat_got) == len(flat_want) and flat_got
    for a, b in zip(flat_got, flat_want):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_import_motion_checkpoint(tmp_path):
    """Motion-regressor import: reference-structured SPADE UNet state_dict
    (architectures.py:602-743 layout) → MotionRegressor variables, output
    parity of the first conv stage."""
    import torch.nn as tnn

    nf, cin = 32, 6

    class SpadeT(tnn.Module):
        def __init__(self, c):
            super().__init__()
            self.mlp_shared = tnn.Sequential(tnn.Conv2d(6, 128, 3, 1, 1), tnn.ReLU())
            self.mlp_gamma = tnn.Conv2d(128, c, 3, 1, 1)
            self.mlp_beta = tnn.Conv2d(128, c, 3, 1, 1)

    class MotionT(tnn.Module):
        def __init__(self):
            super().__init__()
            sp = tnn.utils.spectral_norm
            chans_in = [cin, nf, nf * 2, nf * 4] + [nf * 8] * 4
            chans_out = [nf, nf * 2, nf * 4] + [nf * 8] * 5
            for i in range(8):
                setattr(self, f"conv{i+1}",
                        sp(tnn.Conv2d(chans_in[i], chans_out[i], 4, 2, 1)))
            d_in = [nf * 8, nf * 16, nf * 16, nf * 16, nf * 16, nf * 8, nf * 4, nf * 2]
            d_out = [nf * 8, nf * 8, nf * 8, nf * 8, nf * 4, nf * 2, nf, 2]
            for i in range(8):
                setattr(self, f"dconv{i+1}",
                        sp(tnn.Conv2d(d_in[i], d_out[i], 3, 1, 1)))
            self.spade_layer = SpadeT(nf)
            self.spade_layer2_0 = SpadeT(nf * 2)
            self.spade_layer2_1 = SpadeT(nf * 2)
            self.spade_layer4_0 = SpadeT(nf * 4)
            self.spade_layer4_1 = SpadeT(nf * 4)
            for i in range(8):
                setattr(self, f"spade_layer8_{i}", SpadeT(nf * 8))

    tm = MotionT()
    sd = {f"motion_predictor.{k}": v for k, v in tm.state_dict().items()}
    ns = argparse.Namespace(model_type="SPADE_unet_mask_motion", W=256,
                            motionW=256, motionH=256, div_flow=1.0,
                            use_mask_as_motion_input=True,
                            use_hint_as_motion_input=True,
                            norm_G="sync:spectral_batch")
    path = os.path.join(str(tmp_path), "motion.pth")
    torch.save({"state_dict": sd, "opts": ns}, path)

    variables, opt = import_checkpoint(path)
    assert opt.model_type == "SPADE_unet_mask_motion"

    from slrsfs_tpu.models.motion import MotionRegressor

    m = MotionRegressor(opt)
    rng = np.random.default_rng(5)
    img = (rng.standard_normal((1, 256, 256, 3)) * 0.25).astype(np.float32)
    mask = np.ones((1, 256, 256, 1), np.float32)
    hint = np.zeros((1, 256, 256, 2), np.float32)
    pred = jax.jit(m.apply)(variables, jnp.asarray(img), jnp.asarray(mask),
                            jnp.asarray(hint))
    assert pred.shape == (1, 256, 256, 2)
    assert np.isfinite(np.asarray(pred)).all()

    # spot-parity: first conv (spectral, eval) on the concatenated input
    x = np.concatenate([img, mask, hint], -1)
    tm.eval()
    with torch.no_grad():
        want = tm.conv1(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    from slrsfs_tpu.nn.conv import Conv

    c1 = Conv(nf, 4, 2, 1, spectral=True)
    got = c1.apply(
        {"params": variables["params"]["motion_predictor"]["conv1"],
         "spectral": variables["spectral"]["motion_predictor"]["conv1"]},
        jnp.asarray(x), False)
    np.testing.assert_allclose(
        np.asarray(got), want.numpy().transpose(0, 2, 3, 1),
        rtol=3e-4, atol=3e-4)


def test_stage3_merged_init_partial_fallback():
    """SLR stage-3 warm-start: fluid encoder/projector come from a stage-1
    (fluid-only) checkpoint; submodules with no keys — net_bg and both alpha
    nets here — keep the fresh init. Mirrors the reference's
    ``state_dict.update`` warm-start over the model's own init
    (train_animating_alpha_2layers_joint_finetuneBGFluid_L1.py:436-462)."""
    from conftest import tiny_options
    from slrsfs_tpu.io.checkpoint import (
        import_slr_model,
        merge_stage3_state_dict,
    )
    from slrsfs_tpu.models.slr import SLRModel

    opt = tiny_options(
        W=16, model_type="softmax_splating_2layers_alpha_seperate",
        use_alpha0_as_blending_weight=True)
    model = SLRModel(opt)
    img = jnp.zeros((1, 16, 16, 3), jnp.float32)
    from slrsfs_tpu.engine.init_utils import jit_init

    fresh = jit_init(
        model,
        {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
        img, False, True)
    fresh = {k: jax.tree.map(np.asarray, dict(v)) for k, v in fresh.items()}

    arch = get_resnet_arch(opt.refine_model_type, opt, 3)
    enc = make_torch_encoder_with_z(arch, ref_opt())
    # the live SLR fluid decoder's first block sees the full encoder feature
    # width (layers_enc[-1] = out_channel here), not the table's layers_dec[0]
    dec_arch = dict(arch,
                    layers_dec=[arch["layers_enc"][-1]]
                    + list(arch["layers_dec"])[1:])
    dec = make_torch_decoder_pconv2(dec_arch, ref_opt())
    sd = {f"model.module.encoder.{k}": v for k, v in enc.state_dict().items()}
    sd.update({f"model.module.projector.{k}": v
               for k, v in dec.state_dict().items()})

    merged = merge_stage3_state_dict(sd)
    variables = import_slr_model(merged, opt, fallback=fresh)

    # fluid nets came from the checkpoint: compare the encoder's first conv
    w = enc.state_dict()["gblocks.0.ch_a.2.weight_orig"]
    got = variables["params"]["encoder"]["gblock_0"]["conv_aa"]["kernel"]
    np.testing.assert_allclose(np.asarray(got),
                               w.numpy().transpose(2, 3, 1, 0), rtol=1e-6)

    # absent submodules equal the fresh init, leaf for leaf
    for name in ("net_bg", "net_alpha_encoder", "net_alpha_decoder"):
        for col in ("params", "batch_stats", "spectral"):
            if name not in fresh.get(col, {}):
                continue
            a = jax.tree.leaves(variables[col][name])
            b = jax.tree.leaves(fresh[col][name])
            assert len(a) == len(b) and all(
                np.array_equal(x, y) for x, y in zip(a, b)), (name, col)

    # the merged variables must actually APPLY: the fluid decoder's first
    # block takes the full encoder feature width (9 here), which the arch
    # table understates (layers_dec[0]=8) — regression guard for the
    # first_width import override
    out = jax.jit(lambda v, x: model.apply(v, x, method="decode_fluid"))(
        variables, jnp.zeros((1, 16, 16, 9), jnp.float32))
    assert out.shape == (1, 16, 16, 3)
    ga = jax.jit(lambda v, x, a: model.apply(v, x, a, method="decode_alpha"))(
        variables, jnp.zeros((1, 16, 16, 9), jnp.float32),
        jnp.zeros((1, 16, 16, 1), jnp.float32))
    assert ga.shape[-1] == 1

    # without a fallback, a partial state_dict must fail loudly
    with pytest.raises(KeyError):
        import_slr_model(merged, opt)


def test_merge_stage3_overlays():
    """BG overlay takes only net_bg.* keys; motion overlay applies the
    motion_predictor → motion_regressor.motion_predictor remap
    (reference :441-456)."""
    from slrsfs_tpu.io.checkpoint import merge_stage3_state_dict

    base = {"model.module.encoder.w": 1}
    bg = {"model.module.net_bg.w": 2, "model.module.encoder.w": 9,
          "model.module.loss_function.v": 3}
    mo = {"model.module.motion_predictor.conv1.w": 4,
          "model.module.netD.netD.d0.w": 5}
    out = merge_stage3_state_dict(base, sd_bg=bg, sd_motion=mo)
    assert out["encoder.w"] == 1  # bg ckpt must not clobber fluid weights
    assert out["net_bg.w"] == 2
    assert "loss_function.v" not in out
    assert out["motion_regressor.motion_predictor.conv1.w"] == 4
    assert "netD.netD.d0.w" not in out


def test_embedded_baseline_merged_init():
    """Fix-motion warm start (reference train_animating_fixmotion.py:438-450):
    baseline fluid ckpt + separate motion ckpt merged with the
    motion_predictor remap → BaselineMotionTrainable variables; without
    motion keys the fallback's fresh regressor init is kept."""
    import torch.nn as tnn

    from conftest import tiny_options
    from slrsfs_tpu.io.checkpoint import (
        import_embedded_baseline,
        merge_stage3_state_dict,
    )

    opt = tiny_options(W=16)
    arch = get_resnet_arch(opt.refine_model_type, opt, 3)
    dec_arch = dict(arch, layers_dec=[arch["layers_enc"][-1]]
                    + list(arch["layers_dec"])[1:])
    enc = make_torch_encoder_with_z(arch, ref_opt())
    dec = make_torch_decoder_pconv2(dec_arch, ref_opt())
    base_sd = {f"model.module.encoder.{k}": v
               for k, v in enc.state_dict().items()}
    base_sd.update({f"model.module.projector.{k}": v
                    for k, v in dec.state_dict().items()})

    # reference-structured SPADE motion UNet at the tiny width
    nf, cin = opt.ngf, 6

    class SpadeT(tnn.Module):
        def __init__(self, c):
            super().__init__()
            self.mlp_shared = tnn.Sequential(
                tnn.Conv2d(6, 128, 3, 1, 1), tnn.ReLU())
            self.mlp_gamma = tnn.Conv2d(128, c, 3, 1, 1)
            self.mlp_beta = tnn.Conv2d(128, c, 3, 1, 1)

    class MotionT(tnn.Module):
        def __init__(self):
            super().__init__()
            sp = tnn.utils.spectral_norm
            ci = [cin, nf, nf * 2, nf * 4] + [nf * 8] * 4
            co = [nf, nf * 2, nf * 4] + [nf * 8] * 5
            for i in range(8):
                setattr(self, f"conv{i+1}",
                        sp(tnn.Conv2d(ci[i], co[i], 4, 2, 1)))
            di = [nf * 8, nf * 16, nf * 16, nf * 16, nf * 16, nf * 8,
                  nf * 4, nf * 2]
            do = [nf * 8, nf * 8, nf * 8, nf * 8, nf * 4, nf * 2, nf, 2]
            for i in range(8):
                setattr(self, f"dconv{i+1}",
                        sp(tnn.Conv2d(di[i], do[i], 3, 1, 1)))
            self.spade_layer = SpadeT(nf)
            self.spade_layer2_0 = SpadeT(nf * 2)
            self.spade_layer2_1 = SpadeT(nf * 2)
            self.spade_layer4_0 = SpadeT(nf * 4)
            self.spade_layer4_1 = SpadeT(nf * 4)
            for i in range(8):
                setattr(self, f"spade_layer8_{i}", SpadeT(nf * 8))

    tm = MotionT()
    motion_sd = {f"motion_predictor.{k}": v for k, v in tm.state_dict().items()}

    merged = merge_stage3_state_dict(base_sd, sd_motion=motion_sd)
    cols = import_embedded_baseline(merged, opt)
    assert "motion_regressor" in cols["params"]
    got = cols["params"]["motion_regressor"]["motion_predictor"]["conv1"]["kernel"]
    want = tm.conv1.weight_orig.detach().numpy().transpose(2, 3, 1, 0)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-6)
    # fluid nets imported alongside
    assert "encoder" in cols["params"] and "projector" in cols["params"]

    # no motion keys: fallback regressor init is kept; no fallback → loud
    sentinel = {"params": {"motion_regressor": {"x": np.ones(1)}},
                "batch_stats": {}, "spectral": {}}
    cols2 = import_embedded_baseline(base_sd, opt, fallback=sentinel)
    assert cols2["params"]["motion_regressor"] is \
        sentinel["params"]["motion_regressor"]
    with pytest.raises(KeyError):
        import_embedded_baseline(base_sd, opt)

    # CLI build() wires the embedded model type
    from slrsfs_tpu.cli.train import build
    from slrsfs_tpu.models.baseline import BaselineMotionTrainable

    model, trainer = build(opt, slr=False, embed_motion=True,
                           train_max_steps=2)
    assert isinstance(model, BaselineMotionTrainable)
