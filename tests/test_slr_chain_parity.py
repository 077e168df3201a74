"""SLR whole-inference-chain parity: the fused two-layer rollouts vs a
reference-style ``forward_flow`` recomposed from the ACTUAL reference torch
modules (encoder + fluid decoder + bg net + alpha encoder/decoder) and the
pixel-loop numpy oracles (euler + splat + max-warp-norm).

This validates the flagship chain end to end — alpha-head split, alpha0
composite packing (e^C channels), double-ended splat with separate alpha
normalization, fluid decode, alpha decode on [gen_fs, warped alpha],
two-layer composite, and the edit-region blend — against reference
``animating_softmax_splating_2layers_alpha_seperate.py:843-1108`` with the
standard driver indexing ``batch['index'] = [0, t, N-1]``
(test_v1_4eval.py). Config matches the shipped stage-3 script
(train_alpha_finetuneBG_finetuneFluid_v1.sh: 256W8UpDown64 fluid arch,
alpha0 blending) at test scale, plus a use_softmax_splatter_v2 variant."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

import jax
import jax.numpy as jnp  # noqa: E402

from oracles import euler_integration_np, maximum_warp_norm_np, splat_sum_np
from slrsfs_tpu.config import Options
from slrsfs_tpu.engine.rollout import (
    prepare_scene_sparse,
    slr_rollout_dense,
    slr_rollout_sparse,
)
from slrsfs_tpu.io.checkpoint import import_slr_model
from slrsfs_tpu.models.slr import SLRModel, _alpha_opt
from slrsfs_tpu.nn.archs import get_resnet_arch
from test_models_parity import (
    _warmup,
    make_torch_decoder_pconv2,
    make_torch_encoder_with_z,
)
from torch_ref import ref_opt, to_nchw
from models.layers.blocks import ResNet_Block  # reference

H = W = 32
N = 6
NGF = 16


def make_torch_encoder_plain(arch, topt):
    """Reference ResNetEncoder (architectures.py:121-153): plain blocks over
    layers_enc, no Z split."""
    layers = list(arch["layers_enc"])
    blocks = [ResNet_Block(layers[i - 1], layers[i], topt,
                           arch["downsample"][i - 1])
              for i in range(1, len(layers))]
    m = tnn.Module()
    m.gblocks = tnn.Sequential(*blocks)
    return m


def make_torch_decoder_plain(arch, topt):
    """Reference ResNetDecoder/ResNetBGDecoder (architectures.py:209-260):
    plain blocks over layers_dec."""
    layers = arch["layers_dec"]
    blocks = [ResNet_Block(layers[i - 1], layers[i], topt,
                           arch["upsample"][i - 1])
              for i in range(1, len(layers))]
    m = tnn.Module()
    m.eblocks = tnn.Sequential(*blocks)
    return m


def _run_pconv(dec, x_nchw):
    h, mk = dec.eblocks[0](x_nchw, (x_nchw != 0).float())
    for blk in list(dec.eblocks)[1:]:
        h, mk = blk(h, mk)
    return h


def build_torch_slr(opt):
    """All five reference submodules at the shipped stage-3 wiring."""
    topt = ref_opt()
    a_opt = _alpha_opt(opt)
    arch = get_resnet_arch(opt.refine_model_type, opt, 3)
    bg_arch = get_resnet_arch(opt.bg_refine_model_type, opt)
    a_enc_arch = get_resnet_arch(a_opt.refine_model_type, a_opt, 3)
    a_dec_arch = get_resnet_arch(a_opt.refine_model_type, a_opt)

    enc = make_torch_encoder_with_z(arch, topt)
    dec = make_torch_decoder_pconv2(arch, topt)
    bg = make_torch_decoder_plain(bg_arch, topt)
    a_enc = make_torch_encoder_plain(a_enc_arch, topt)
    a_dec = make_torch_decoder_pconv2(a_dec_arch, topt)

    for m in (enc, dec, bg, a_enc, a_dec):
        m.train()
    _warmup(enc.gblocks, (2, 3, W, W))
    _warmup(lambda x: _run_pconv(dec, x), (2, arch["layers_dec"][0], W, W))
    _warmup(bg.eblocks, (2, 3, W, W))
    _warmup(a_enc.gblocks, (2, 3, W, W))
    _warmup(lambda x: _run_pconv(a_dec, x),
            (2, a_dec_arch["layers_dec"][0], W, W))
    for m in (enc, dec, bg, a_enc, a_dec):
        m.eval()
    return enc, dec, bg, a_enc, a_dec


def import_variables(opt, enc, dec, bg, a_enc, a_dec):
    sd = {}
    for prefix, m in (("encoder", enc), ("projector", dec), ("net_bg", bg),
                      ("net_alpha_encoder", a_enc),
                      ("net_alpha_decoder", a_dec)):
        sd.update({f"{prefix}.{k}": v for k, v in m.state_dict().items()})
    return import_slr_model(sd, opt)


def torch_slr_frame(opt, mods, img, flow, t, region=None):
    """Reference SLR forward_flow for one frame (file :843-1108), alpha0
    blending + default composite, with numpy-oracle warping."""
    enc, dec, bg, a_enc, a_dec = mods
    img_t = to_nchw(img)
    with torch.no_grad():
        out = enc.gblocks(img_t)
        fs = out[:, :-1].numpy()[0].transpose(1, 2, 0)  # (H, W, 64)
        z = out[:, -1:].numpy()[0].transpose(1, 2, 0)  # (H, W, 1)
        bg_raw = bg.eblocks(img_t).numpy()[0].transpose(1, 2, 0)
        a_out = a_enc.gblocks(img_t).numpy()[0].transpose(1, 2, 0)  # (H,W,2)
    bg_tanh = np.tanh(bg_raw)
    abg_logits = a_out[..., 0:1]
    af_logits = a_out[..., 1:2]
    abg_sig = 1.0 / (1.0 + np.exp(-abg_logits))
    af_sig = 1.0 / (1.0 + np.exp(-af_logits))

    flow64 = flow.astype(np.float64)
    disp_f, _ = euler_integration_np(flow64, t)
    disp_p, _ = euler_integration_np(-flow64, N - t)
    alpha = float(np.clip(1.0 - t / N, 1.0 / 600.0, 599.0 / 600.0))

    if opt.use_softmax_splatter_v2:
        # per-frame max-warp-norm from the FORWARD flow only (:957)
        zmax = maximum_warp_norm_np(z.astype(np.float64), disp_f)
        zn = np.clip(z - zmax, -20.0, 20.0)
    else:
        zn = np.clip(z - z.max(), -20.0, 20.0)
    ez = np.exp(zn)

    # alpha0 packing (:963-976): [fs·e^Z, af_logits·e^C, e^C, e^Z]
    norm0 = np.maximum(af_sig + abg_sig, 1e-8)
    e_c = np.exp(af_sig / norm0)
    packed = np.concatenate(
        [fs * ez, af_logits * e_c, e_c, ez], axis=-1).astype(np.float64)

    g = (splat_sum_np(packed, disp_f) * alpha
         + splat_sum_np(packed, disp_p) * (1.0 - alpha))
    gen_fs = g[..., :-3] / np.maximum(g[..., -1:], 1e-8)
    af_w = g[..., -3:-2] / np.maximum(g[..., -2:-1], 1e-8)

    with torch.no_grad():
        fluid = np.tanh(_run_pconv(dec, to_nchw(
            gen_fs.astype(np.float32)[None])).numpy()[0].transpose(1, 2, 0))
        ga_logits = _run_pconv(a_dec, to_nchw(np.concatenate(
            [gen_fs, af_w], -1).astype(np.float32)[None]
        )).numpy()[0].transpose(1, 2, 0)
    ga = 1.0 / (1.0 + np.exp(-ga_logits))

    alpha_norm = np.maximum(ga + abg_sig, 1e-8)
    gen = (ga * fluid + abg_sig * bg_tanh) / alpha_norm
    comp = ga / alpha_norm
    if region is not None:
        gen = gen * region + fluid * (1.0 - region)
    return {"PredImg": gen, "FluidImg": fluid, "CompositeFluidAlpha": comp,
            "BGImg": bg_tanh}


def _scene(rng):
    img = (rng.standard_normal((1, H, W, 3)) * 0.25).astype(np.float32)
    flow = (rng.standard_normal((H, W, 2)) * 0.8).astype(np.float32)
    flow[: H // 2] = 0.0
    return img, flow


def _check(frames, opt, mods, img, flow, region=None, ts=(0, 2, N - 1)):
    for t in ts:
        want = torch_slr_frame(opt, mods, img, flow, t, region=region)
        for k in ("PredImg", "FluidImg", "CompositeFluidAlpha"):
            np.testing.assert_allclose(
                np.asarray(frames[k][t]), want[k], rtol=2e-3, atol=2e-3,
                err_msg=f"{k} frame {t}")
    np.testing.assert_allclose(np.asarray(frames["BGImg"]), want["BGImg"],
                               rtol=2e-3, atol=2e-3)


def test_slr_chain_parity_v1_sparse_and_edit_region():
    """Shipped v1-style config (alpha0 blending): sparse rollout vs the
    recomposed reference chain, plus the edit-region blend."""
    rng = np.random.default_rng(21)
    opt = Options(ngf=NGF, W=W, bn_noise_misc=True,
                  model_type="softmax_splating_2layers_alpha_seperate",
                  use_alpha0_as_blending_weight=True)
    mods = build_torch_slr(opt)
    variables = import_variables(opt, *mods)
    img, flow = _scene(rng)
    pos, valid = prepare_scene_sparse(flow, pad_multiple=64)

    model = SLRModel(opt)
    run = jax.jit(lambda v, i, f, rg: slr_rollout_sparse(
        model, v, i, f, N, jnp.asarray(pos), jnp.asarray(valid),
        decode_batch=3, alpha_region=rg), static_argnums=())
    frames = jax.jit(lambda v, i, f: slr_rollout_sparse(
        model, v, i, f, N, jnp.asarray(pos), jnp.asarray(valid),
        decode_batch=3))(variables, jnp.asarray(img), jnp.asarray(flow))
    _check(frames, opt, mods, img, flow)

    # edit-region blend (:1079-1085). At W=32 the gaussian kernel is a
    # single normalized tap (k = W//20 | 1 = 1), i.e. identity — the blend
    # wiring itself is what's under test.
    region = (rng.uniform(0, 1, (H, W, 1)) > 0.5).astype(np.float32)
    frames_r = run(variables, jnp.asarray(img), jnp.asarray(flow),
                   jnp.asarray(region)[None])
    _check(frames_r, opt, mods, img, flow, region=region, ts=(2,))


def test_slr_chain_parity_v2_dense_and_sparse():
    """use_softmax_splatter_v2 (per-frame max-warp Z-norm) through BOTH the
    dense and the sparse rollouts vs the recomposed reference chain."""
    rng = np.random.default_rng(22)
    opt = Options(ngf=NGF, W=W, bn_noise_misc=True,
                  model_type="softmax_splating_2layers_alpha_seperate",
                  use_alpha0_as_blending_weight=True,
                  use_softmax_splatter_v2=True)
    mods = build_torch_slr(opt)
    variables = import_variables(opt, *mods)
    img, flow = _scene(rng)
    pos, valid = prepare_scene_sparse(flow, pad_multiple=64)

    model = SLRModel(opt)
    dense = jax.jit(lambda v, i, f: slr_rollout_dense(
        model, v, i, f, N, decode_batch=3))(
            variables, jnp.asarray(img), jnp.asarray(flow))
    _check(dense, opt, mods, img, flow, ts=(0, N - 1))
    sparse = jax.jit(lambda v, i, f: slr_rollout_sparse(
        model, v, i, f, N, jnp.asarray(pos), jnp.asarray(valid),
        decode_batch=3))(variables, jnp.asarray(img), jnp.asarray(flow))
    _check(sparse, opt, mods, img, flow, ts=(2,))
