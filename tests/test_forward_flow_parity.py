"""Whole-inference-chain parity: our fused rollout vs a reference-style
forward_flow recomposed from the ACTUAL reference torch modules (encoder +
pconv decoder) and the pixel-loop numpy oracles (euler + splat).

This validates the full math chain — Z gating, global-max Z-norm, clamp,
packing, per-frame alpha, double-ended splat, joint normalization, decode —
end to end (reference animating_softmax_splating.py:777-981 with the standard
driver indexing batch['index'] = [0, t, N-1])."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from oracles import euler_integration_np, splat_sum_np
from slrsfs_tpu.config import Options
from slrsfs_tpu.engine.rollout import baseline_rollout
from slrsfs_tpu.io.torch_import import (
    KeyReader,
    import_decoder_pconv2,
    import_encoder,
    split_collections,
)
from slrsfs_tpu.models.baseline import BaselineModel
from slrsfs_tpu.nn.archs import get_resnet_arch
from test_models_parity import (
    _warmup,
    make_torch_decoder_pconv2,
    make_torch_encoder_with_z,
)
from torch_ref import ref_opt, to_nchw, to_nhwc


def torch_forward_flow_frame(enc, dec, img_nchw, flow_hw2, t, N):
    """Reference forward_flow for one frame, with numpy-oracle warping."""
    with torch.no_grad():
        out = enc.gblocks(img_nchw)
        fs = out[:, :-1].numpy()[0].transpose(1, 2, 0)  # (H, W, 64)
        z = out[:, -1:].numpy()[0].transpose(1, 2, 0)  # (H, W, 1)
    # default Z-norm: Z - Z.max(), clamp +-20 (:855-859)
    zn = np.clip(z - z.max(), -20.0, 20.0)
    ez = np.exp(zn)
    packed = np.concatenate([fs * ez, ez], axis=-1).astype(np.float64)

    flow64 = flow_hw2.astype(np.float64)
    disp_f, _ = euler_integration_np(flow64, t)
    disp_p, _ = euler_integration_np(-flow64, N - t)
    alpha = 1.0 - t / N

    g = (splat_sum_np(packed, disp_f) * alpha
         + splat_sum_np(packed, disp_p) * (1.0 - alpha))
    gen_fs = g[..., :-1] / np.maximum(g[..., -1:], 1e-8)

    xt = to_nchw(gen_fs.astype(np.float32)[None])
    with torch.no_grad():
        h, mk = dec.eblocks[0](xt, (xt != 0).float())
        for blk in list(dec.eblocks)[1:]:
            h, mk = blk(h, mk)
        return to_nhwc(torch.tanh(h))[0]


def test_full_inference_chain_parity():
    rng = np.random.default_rng(12)
    H = W = 32
    N = 6
    opt = Options(ngf=16, W=W, bn_noise_misc=True)
    topt = ref_opt()
    arch = get_resnet_arch(opt.refine_model_type, opt, 3)
    enc = make_torch_encoder_with_z(arch, topt)
    dec = make_torch_decoder_pconv2(arch, topt)
    enc.train(); dec.train()
    _warmup(enc.gblocks, (2, 3, W, W))

    def run_dec(x):
        h, mk = dec.eblocks[0](x, (x != 0).float())
        for blk in list(dec.eblocks)[1:]:
            h, mk = blk(h, mk)
        return h

    _warmup(run_dec, (2, 64, W, W))
    enc.eval(); dec.eval()

    r = KeyReader({**{f"encoder.{k}": v for k, v in enc.state_dict().items()},
                   **{f"projector.{k}": v for k, v in dec.state_dict().items()}})
    tree = split_collections({
        "encoder": import_encoder(r, "encoder", opt, 3, with_z=True),
        "projector": import_decoder_pconv2(r, "projector", opt),
    })

    img = (rng.standard_normal((1, H, W, 3)) * 0.25).astype(np.float32)
    flow = (rng.standard_normal((H, W, 2)) * 0.8).astype(np.float32)
    flow[: H // 2] = 0.0

    model = BaselineModel(opt)
    frames = np.asarray(baseline_rollout(
        model, tree, jnp.asarray(img), jnp.asarray(flow), N))

    for t in (0, 2, N - 1):
        want = torch_forward_flow_frame(enc, dec, to_nchw(img), flow, t, N)
        np.testing.assert_allclose(frames[t], want, rtol=2e-3, atol=2e-3)
