"""SLR two-layer model: rollout invariants and a training step smoke."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from conftest import tiny_options
from slrsfs_tpu.engine.init_utils import settle
from slrsfs_tpu.engine.rollout import prepare_scene_sparse, slr_rollout_sparse
from slrsfs_tpu.engine.trainer import Trainer
from slrsfs_tpu.models.slr import SLRModel, SLRTrainable, slr_extra_losses


def _opt(**kw):
    base = dict(
        model_type="softmax_splating_2layers_alpha_seperate",
        use_alpha0_as_blending_weight=True,
        ATVloss=0.3, ADCloss=1.0, FluidRegionloss=3.0,
        RockRegionloss=30.0, MVloss=1.0, AlphaL1loss=1.0,
    )
    base.setdefault("W", 32)
    base.update(kw)
    return tiny_options(**base)


def _init_slr(model, img):
    variables = jax.jit(lambda r, i: model.init(r, i, False, True))(
        {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
        img,
    )
    return settle(model, variables, (img,), n=8)


def _jit_sparse(model, N, db=2):
    """Jitted sparse rollout (eager dispatch costs ~10 s/test on 1 core)."""
    return jax.jit(lambda v, i, f, p, va: slr_rollout_sparse(
        model, v, i, f, N, p, va, decode_batch=db))


@pytest.fixture(scope="module")
def slr_env():
    """Shared settled SLR model + canonical 32² scene + its N=4 sparse
    rollout: each init/settle/rollout is a separate trace of the two-layer
    graph (~2-4 s apiece on this 1-core host), and three tests in this
    module would otherwise re-trace identical programs (VERDICT r4 #5)."""
    rng = np.random.default_rng(21)
    H = W = 32
    opt = _opt()
    model = SLRModel(opt)
    img = (rng.standard_normal((1, H, W, 3)) * 0.25).astype(np.float32)
    variables = _init_slr(model, img)
    flow = (rng.standard_normal((H, W, 2)) * 1.0).astype(np.float32)
    flow[: H // 2] = 0.0
    pos, valid = prepare_scene_sparse(flow, pad_multiple=64)
    out = _jit_sparse(model, 4)(
        variables, jnp.asarray(img), jnp.asarray(flow),
        jnp.asarray(pos), jnp.asarray(valid),
    )
    return dict(opt=opt, model=model, img=img, variables=variables,
                flow=flow, pos=pos, valid=valid, out=out)


def test_slr_rollout_shapes_and_composite(slr_env):
    H = W = 32
    N = 4
    out = slr_env["out"]
    assert out["PredImg"].shape == (N, H, W, 3)
    assert out["FluidImg"].shape == (N, H, W, 3)
    assert out["CompositeFluidAlpha"].shape == (N, H, W, 1)
    assert out["BGImg"].shape == (H, W, 3)
    for k, v in out.items():
        assert np.isfinite(np.asarray(v)).all(), k
    ca = np.asarray(out["CompositeFluidAlpha"])
    assert ca.min() >= 0.0 and ca.max() <= 1.0

    # composite is a convex combination of fluid and bg images
    pred = np.asarray(out["PredImg"])
    fluid = np.asarray(out["FluidImg"])
    bg = np.asarray(out["BGImg"])[None]
    lo = np.minimum(fluid, bg) - 1e-5
    hi = np.maximum(fluid, bg) + 1e-5
    assert (pred >= lo).all() and (pred <= hi).all()


def test_slr_train_step(vgg_vars32):
    rng = np.random.default_rng(22)
    B, H, W = 2, 32, 32
    opt = _opt(batch_size=B)
    model = SLRTrainable(opt, train_max_steps=4)
    trainer = Trainer(opt, model, steps_per_epoch=10,
                      extra_losses_fn=slr_extra_losses)
    trainer.load_vgg(vgg_vars32)
    idx = np.zeros((B, 3), np.int32)
    idx[:, 1] = rng.integers(1, 4, size=B)
    idx[:, 2] = 4
    flow = rng.standard_normal((B, H, W, 2)).astype(np.float32) * 0.5
    flow[:, : H // 2] = 0.0
    batch = {
        "images": [
            jnp.asarray(rng.standard_normal((B, H, W, 3)) * 0.25, jnp.float32)
            for _ in range(3)
        ],
        "index": jnp.asarray(idx),
        "motions": jnp.asarray(flow),
        "mask_rock": jnp.asarray(
            (rng.random((B, H, W, 1)) < 0.2).astype(np.float32)
        ),
        "mean_video": jnp.asarray(
            rng.standard_normal((B, H, W, 3)) * 0.25, jnp.float32
        ),
    }
    state = trainer.init_state(jax.random.PRNGKey(0), batch)
    step = jax.jit(trainer.make_train_step())
    new_state, logs = step(state, batch, jax.random.PRNGKey(1))
    for k in ("AlphaL1loss", "AlphaTV", "FluidRegionLoss", "RockRegionLoss",
              "Alpha Decoder Consistency Loss", "L1_bg", "Perceptual_bg",
              "GAN", "D_Fake", "Total Loss"):
        assert k in logs, sorted(logs)
    for k, v in logs.items():
        assert np.isfinite(np.asarray(v)).all(), (k, v)
    g0 = jax.tree.leaves(state.g_params)[0]
    g1 = jax.tree.leaves(new_state.g_params)[0]
    assert not np.allclose(np.asarray(g0), np.asarray(g1))


def test_slr_dense_matches_sparse_and_v2_runs(slr_env):
    H = W = 32
    N = 4
    model = slr_env["model"]
    img, flow = slr_env["img"], slr_env["flow"]
    pos, valid = slr_env["pos"], slr_env["valid"]
    variables = slr_env["variables"]

    from slrsfs_tpu.engine.rollout import slr_rollout_dense

    sparse = slr_env["out"]
    dense = jax.jit(lambda v, i, f: slr_rollout_dense(model, v, i, f, N))(
        variables, jnp.asarray(img), jnp.asarray(flow))
    np.testing.assert_allclose(np.asarray(sparse["PredImg"]),
                               np.asarray(dense["PredImg"]),
                               rtol=1e-5, atol=1e-5)

    # v2 (per-frame max-warp norm) runs SPARSELY and must exactly match the
    # dense path (which is the oracle for maximum_warp_norm_sparse)
    opt_v2 = _opt(use_softmax_splatter_v2=True, use_softmax_splatter=False)
    model_v2 = SLRModel(opt_v2)
    out = _jit_sparse(model_v2, N)(
        variables, jnp.asarray(img), jnp.asarray(flow),
        jnp.asarray(pos), jnp.asarray(valid))
    dense_v2 = jax.jit(lambda v, i, f: slr_rollout_dense(model_v2, v, i, f, N))(
        variables, jnp.asarray(img), jnp.asarray(flow))
    np.testing.assert_allclose(np.asarray(out["PredImg"]),
                               np.asarray(dense_v2["PredImg"]),
                               rtol=2e-5, atol=2e-5)


def test_alpha_input_variants_and_akl():
    """use_{motion,mask,bg}_as_alpha_input widen the alpha encoder
    (reference 2layers :375-385) and AKLloss>0 adds the clamped logsigma
    channel (:411-413). NOTE the reference's own constructor is broken for
    these flags (get_alpha_encoder hardcodes channels_in=3); we wire the
    channel count correctly — see GAPS.md."""
    from slrsfs_tpu.models.slr import alpha_in_channels

    rng = np.random.default_rng(41)
    B, H, W = 1, 16, 16
    opt = _opt(W=W, use_motion_as_alpha_input=True,
               use_mask_as_alpha_input=True, use_bg_as_alpha_input=True,
               AKLloss=0.1)
    assert alpha_in_channels(opt) == 3 + 2 + 1 + 3
    model = SLRTrainable(opt, train_max_steps=2)
    idx = np.zeros((B, 3), np.int32)
    idx[:, 1], idx[:, 2] = 1, 2
    batch = {
        "images": [jnp.asarray(rng.standard_normal((B, H, W, 3)) * 0.25,
                               jnp.float32) for _ in range(3)],
        "index": jnp.asarray(idx),
        "motions": jnp.asarray(
            rng.standard_normal((B, H, W, 2)) * 0.5, jnp.float32),
        "mask_rock": jnp.zeros((B, H, W, 1), jnp.float32),
        "mean_video": jnp.zeros((B, H, W, 3), jnp.float32),
    }
    # init_with_output: ONE trace yields both the variables and an executed
    # forward (an init + a separate apply would trace the graph twice)
    (gen, pred), variables = jax.jit(
        lambda r, b: model.init_with_output(r, b, True, False,
                                            method=model.forward_train))(
        {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
        batch)
    assert gen.shape == (B, H, W, 3)
    assert pred["AlphaLogSigma"].shape == (B, H, W, 1)
    assert np.abs(np.asarray(pred["AlphaLogSigma"])).max() <= 50.0
    # encoder first conv consumes 9 channels
    k = variables["params"]["net_alpha_encoder"]
    leaf = jax.tree.leaves(k)[0]
    assert any(a.shape[-2] == 9 for a in jax.tree.leaves(k)
               if getattr(a, "ndim", 0) == 4)


def test_per_epoch_loss_weight_decay():
    """Stage-3 per-epoch decay: w(e) = w0·(1−1/D)^e for RockRegion AND
    FluidRegion (L1 driver :356-358), AlphaMSE via AlphaWeightDecay
    (MSE driver :356-357)."""
    from slrsfs_tpu.models.slr import decayed_weight

    np.testing.assert_allclose(float(decayed_weight(30.0, 20.0, 0)), 30.0)
    np.testing.assert_allclose(float(decayed_weight(30.0, 20.0, 1)),
                               30.0 - 30.0 / 20.0)
    w = 30.0
    for _ in range(5):
        w = w - w / 20.0
    np.testing.assert_allclose(float(decayed_weight(30.0, 20.0, 5)), w,
                               rtol=1e-6)

    # wired through slr_extra_losses: the weighted total shrinks with epoch
    B, H, W = 1, 8, 8
    ones = jnp.ones((B, H, W, 1))
    pred = {
        "SmallMotionAlpha": jnp.zeros((B, H, W, 1)),
        "RockMask": ones,
        "CompositeFluidAlpha_I0": ones * 0.9,
        "GTAlpha": ones * 0.25,
        "AlphaFluidLogits_f": jnp.zeros((B, H, W, 1)),
        "AlphaBG_f": jnp.zeros((B, H, W, 1)),
        "AlphaFluidWarped": jnp.zeros((B, H, W, 1)),
        "AlphaFluidMask": ones,
        "GenFluidAlphaRaw": jnp.zeros((B, H, W, 1)),
    }
    opt = _opt(AlphaL1loss=0.0, ATVloss=0.0, ADCloss=0.0, MVloss=0.0,
               FluidRegionloss=0.0, RockRegionloss=30.0,
               RockRegionlossDecay=20.0)
    t0 = float(slr_extra_losses(opt, pred, epoch=jnp.asarray(0))["Total Extra"])
    t5 = float(slr_extra_losses(opt, pred, epoch=jnp.asarray(5))["Total Extra"])
    assert t5 < t0
    np.testing.assert_allclose(t5 / t0, (1 - 1 / 20.0) ** 5, rtol=1e-5)
    # AlphaMSE decay
    opt2 = _opt(AlphaL1loss=0.0, ATVloss=0.0, ADCloss=0.0, MVloss=0.0,
                FluidRegionloss=0.0, RockRegionloss=0.0,
                AlphaMSEloss=5.0, AlphaWeightDecay=10.0)
    m0 = float(slr_extra_losses(opt2, pred, epoch=jnp.asarray(0))["Total Extra"])
    m3 = float(slr_extra_losses(opt2, pred, epoch=jnp.asarray(3))["Total Extra"])
    np.testing.assert_allclose(m3 / m0, (1 - 1 / 10.0) ** 3, rtol=1e-5)


def test_use_sum1_alpha_and_uvm_fold():
    """use_sum1_alpha: σ(bg_logits) == 1 − σ(fluid_logits) exactly
    (forward_flow :939-941 via the logit identity). fold_uvm: 3-channel
    uv·m motion folds to uv*m (animating_softmax_splating.py:524-543)."""
    from slrsfs_tpu.models.baseline import fold_uvm
    from slrsfs_tpu.models.slr import split_alpha_output

    rng = np.random.default_rng(5)
    out = jnp.asarray(rng.standard_normal((1, 8, 8, 2)), jnp.float32)
    opt = _opt(use_sum1_alpha=True)
    bg, fl = split_alpha_output(opt, out)
    np.testing.assert_allclose(
        np.asarray(jax.nn.sigmoid(bg)),
        1.0 - np.asarray(jax.nn.sigmoid(fl)), rtol=1e-6, atol=1e-7)
    np.testing.assert_array_equal(np.asarray(fl), np.asarray(out[..., 0:1]))

    uvm = jnp.asarray(rng.standard_normal((1, 8, 8, 3)), jnp.float32)
    flow = fold_uvm(uvm)
    assert flow.shape == (1, 8, 8, 2)
    np.testing.assert_allclose(np.asarray(flow),
                               np.asarray(uvm[..., :2] * uvm[..., 2:3]))
    two = jnp.asarray(rng.standard_normal((1, 8, 8, 2)), jnp.float32)
    assert fold_uvm(two) is two


def test_composite_variants():
    """use_alpha_softmax (:1066-1070), clamp_alpha (:1071-1075 inference /
    :646-651 train), use_fluid_alpha_only (:1060-1063)."""
    from slrsfs_tpu.models.slr import slr_composite

    rng = np.random.default_rng(6)
    B, H, W = 1, 6, 6
    fluid = jnp.asarray(rng.standard_normal((B, H, W, 3)), jnp.float32)
    bg = jnp.asarray(rng.standard_normal((B, H, W, 3)), jnp.float32)
    ga_raw = jnp.asarray(rng.standard_normal((B, H, W, 1)), jnp.float32)
    ab_raw = jnp.asarray(rng.standard_normal((B, H, W, 1)), jnp.float32)
    ga = jax.nn.sigmoid(ga_raw)
    ab = jax.nn.sigmoid(ab_raw)

    # softmax variant
    opt = _opt(use_alpha_softmax=1.0)
    gen, comp = slr_composite(fluid, ga, ab, bg, opt=opt,
                              ga_raw=ga_raw, a_bg_raw=ab_raw)
    w = jax.nn.softmax(jnp.concatenate([ga_raw, ab_raw], -1), axis=-1)
    np.testing.assert_allclose(np.asarray(gen),
                               np.asarray(w[..., :1] * fluid
                                          + w[..., 1:] * bg), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(comp), np.asarray(w[..., :1]))

    # clamp variant: inference uses (1-cf) for bg, train uses bg/norm
    opt = _opt(clamp_alpha=0.4)
    norm = np.maximum(np.asarray(ga) + np.asarray(ab), 1e-8)
    cf = np.clip(np.asarray(ga) / norm, 0.4, None)
    gen_i, comp_i = slr_composite(fluid, ga, ab, bg, opt=opt,
                                  ga_raw=ga_raw, a_bg_raw=ab_raw)
    np.testing.assert_allclose(
        np.asarray(gen_i), cf * np.asarray(fluid) + (1 - cf) * np.asarray(bg),
        rtol=1e-5)
    gen_t, _ = slr_composite(fluid, ga, ab, bg, opt=opt, ga_raw=ga_raw,
                             a_bg_raw=ab_raw, train_mode=True)
    np.testing.assert_allclose(
        np.asarray(gen_t),
        cf * np.asarray(fluid) + (np.asarray(ab) / norm) * np.asarray(bg),
        rtol=1e-5)
    np.testing.assert_allclose(np.asarray(comp_i), cf)

    # fluid-only: alpha_norm = 1
    opt = _opt(use_fluid_alpha_only=True)
    gen_f, _ = slr_composite(fluid, ga, ab, bg, opt=opt)
    np.testing.assert_allclose(
        np.asarray(gen_f),
        np.asarray(ga) * np.asarray(fluid) + np.asarray(ab) * np.asarray(bg),
        rtol=1e-5)


def test_alpha_decoder_input_variants():
    """'decouple' (warped alpha only) and 'image' ([img, warped alpha])
    alpha-decoder inputs (reference :600-605, utilities.py:127-131)."""
    from slrsfs_tpu.engine.rollout import prepare_scene_sparse

    rng = np.random.default_rng(7)
    H = W = 16
    for variant, in_ch in (("decouple", 1), ("image", 4)):
        opt = _opt(
            W=W,
            alpha_refine_model_type=(
                f"resnet_TinyTest_de_resnet_pconv2_{variant}_nonorm"))
        model = SLRModel(opt)
        img = (rng.standard_normal((1, H, W, 3)) * 0.25).astype(np.float32)
        rngs = {"params": jax.random.PRNGKey(0),
                "noise": jax.random.PRNGKey(1)}
        if variant != "image":
            # channel-plumbing claim only for 'decouple': shape-level init
            # under eval_shape (zero FLOPs, no compile); executing its
            # rollout re-traces a whole program for coverage the 'image'
            # run (the wider input assembly) + the default-variant rollout
            # tests already pin (suite wall-clock)
            shapes = jax.eval_shape(
                lambda r, i: model.init(r, i, False, True), rngs,
                jax.ShapeDtypeStruct(img.shape, img.dtype))
            k = shapes["params"]["net_alpha_decoder"]
            assert any(a.shape[-2] == in_ch for a in jax.tree.leaves(k)
                       if getattr(a, "ndim", 0) == 4), variant
            continue
        variables = jax.jit(lambda r, i: model.init(r, i, False, True))(
            rngs, img)
        k = variables["params"]["net_alpha_decoder"]
        assert any(a.shape[-2] == in_ch for a in jax.tree.leaves(k)
                   if getattr(a, "ndim", 0) == 4), variant
        flow = (rng.standard_normal((H, W, 2))).astype(np.float32)
        flow[: H // 2] = 0.0
        pos, valid = prepare_scene_sparse(flow, pad_multiple=64)
        out = _jit_sparse(model, 2)(
            variables, jnp.asarray(img), jnp.asarray(flow),
            jnp.asarray(pos), jnp.asarray(valid))
        assert np.isfinite(np.asarray(out["PredImg"])).all(), variant
