"""Moving-region cropped decode (engine/rollout.py crop section).

The crop rollout must be EXACT (not approximate): outside the splat-target
bbox the pointwise normalization cancels e^Z, so frames equal one static
decode there, and inside, the receptive-field halo guarantees the cropped
decode reproduces the full-frame conv outputs bit-comparably. These tests
pin (a) the receptive-radius bound empirically, (b) the window math
invariants, and (c) cropped-vs-full equality for every rollout family
(baseline/SLR × non-v2/v2 Z-norm) on the TinyTestUpDown arch, whose Down/Up
pair exercises the pooling-grid alignment."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from conftest import tiny_options
from slrsfs_tpu.engine.init_utils import jit_init, settle
from slrsfs_tpu.engine.rollout import (
    CropSpec,
    baseline_rollout_sparse,
    crop_alignment,
    decoder_receptive_radius,
    plan_crop,
    prepare_crop,
    prepare_scene_sparse,
    slr_rollout_sparse,
)
from slrsfs_tpu.models.baseline import BaselineModel
from slrsfs_tpu.models.slr import SLRModel
from slrsfs_tpu.nn.archs import get_resnet_arch

H, W, N = 64, 96, 6
UPDOWN = "resnet_TinyTestUpDown_de_resnet_pconv2_nonorm"


def _scene(seed=0):
    rng = np.random.default_rng(seed)
    img = jnp.asarray(rng.standard_normal((1, H, W, 3)) * 0.25, jnp.float32)
    flow_np = np.zeros((H, W, 2), np.float32)
    flow_np[40:56, 8:32] = (
        rng.standard_normal((16, 24, 2)).astype(np.float32) * 0.8)
    positions, valid = prepare_scene_sparse(flow_np, pad_multiple=64)
    return (img, jnp.asarray(flow_np), jnp.asarray(positions),
            jnp.asarray(valid))


def _init(model, img):
    v = jit_init(model, {"params": jax.random.PRNGKey(0),
                         "noise": jax.random.PRNGKey(1)}, img, False, True)
    return settle(model, v, (img,), n=3)


@pytest.fixture(scope="module")
def updown_env():
    """Shared settled UPDOWN baseline + canonical scene: three tests in
    this module build the identical model at the (1, H, W, 3) shape, and
    each init+settle pair is two traces (~4-5 s) on this 1-core host
    (VERDICT r4 #5). Tests only need SOME settled variables — every
    assertion is self-consistent (cropped-vs-full with the same v)."""
    img, flow, pos, val = _scene()
    opt = tiny_options(refine_model_type=UPDOWN)
    model = BaselineModel(opt)
    v = _init(model, img)
    return dict(opt=opt, model=model, img=img, flow=flow, pos=pos,
                val=val, v=v)


def test_decoder_radius_bounds_empirical_rf():
    """decoder_receptive_radius must upper-bound the true receptive field:
    perturbing the decoder input OUTSIDE the radius of a probe pixel leaves
    the decoded probe value unchanged (pconv mask (x != 0) included)."""
    opt = tiny_options(refine_model_type=UPDOWN)
    arch = get_resnet_arch(opt.refine_model_type, opt)
    r = decoder_receptive_radius(arch)
    assert r >= 4 and crop_alignment(arch) == 2

    model = BaselineModel(opt)
    rng = np.random.default_rng(1)
    x = rng.standard_normal((1, 64, 64, opt.out_channel)).astype(np.float32)
    cy = cx = 32
    x2 = x.copy()
    far = np.ones((64, 64), bool)
    far[max(0, cy - r):cy + r + 1, max(0, cx - r):cx + r + 1] = False
    x2[0, far] += rng.standard_normal((int(far.sum()),
                                       x.shape[-1])).astype(np.float32)
    # zero a far patch too: flips the pconv (x != 0) hole mask out there
    x2[0, 0:8, 0:8] = 0.0

    model_vars = _init(model, jnp.asarray(
        rng.standard_normal((1, 64, 64, 3)).astype(np.float32)))
    dec = jax.jit(lambda v, a: model.apply(v, a, method="decode"))
    y1 = np.asarray(dec(model_vars, jnp.asarray(x)))
    y2 = np.asarray(dec(model_vars, jnp.asarray(x2)))
    np.testing.assert_allclose(y1[0, cy, cx], y2[0, cy, cx], atol=1e-6)
    # sanity: the perturbation did change the output somewhere
    assert np.abs(y1 - y2).max() > 1e-3


def test_plan_crop_window_invariants():
    radius, align = 10, 4
    bounds = np.array([17.0, 40.0, 9.0, 30.0])  # xlo xhi ylo yhi
    c = plan_crop(bounds, 64, 96, radius, align, max_area_frac=1.01,
                  bucket=1)
    assert isinstance(c, CropSpec)
    # offsets/sizes aligned for the pooling grids
    assert c.y0 % align == 0 and c.x0 % align == 0
    assert c.hc % align == 0 and c.wc % align == 0
    # paste covers bbox + radius (clipped at frame edges), crop covers
    # paste + radius (ditto)
    assert c.py0 == max(0, 9 - radius)
    assert c.py0 + c.ph >= min(64, 30 + radius + 1)
    assert c.px0 == max(0, 17 - radius)
    assert c.px0 + c.pw >= min(96, 40 + radius + 1)
    assert c.y0 <= max(0, c.py0 - radius)
    assert c.y0 + c.hc >= min(64, c.py0 + c.ph + radius)
    assert c.x0 <= max(0, c.px0 - radius)
    assert c.x0 + c.wc >= min(96, c.px0 + c.pw + radius)
    assert c.x0 + c.wc <= 96 and c.y0 + c.hc <= 64
    # not worth it → None
    assert plan_crop(bounds, 64, 96, radius, align,
                     max_area_frac=0.1) is None
    # misaligned frame → None
    assert plan_crop(bounds, 63, 96, radius, align) is None
    # bucketed plan (the default; sweeps share compiled shapes): covers the
    # minimal plan and quantizes — nearby bboxes map to one CropSpec
    cb = plan_crop(bounds, 64, 96, radius, align, max_area_frac=1.01)
    assert cb.py0 <= c.py0 and cb.py0 + cb.ph >= c.py0 + c.ph
    assert cb.px0 <= c.px0 and cb.px0 + cb.pw >= c.px0 + c.pw
    assert cb.y0 <= cb.py0 and cb.y0 + cb.hc >= cb.py0 + cb.ph
    assert cb == plan_crop(bounds + np.array([1.0, 1.0, 1.0, 1.0]),
                           64, 96, radius, align, max_area_frac=1.01)


def test_baseline_crop_exact(updown_env):
    """Cropped == full for the baseline rollout, non-v2 and v2 Z-norm.
    Params are v2-independent, so one init serves both variants."""
    img, flow, pos, val = (updown_env["img"], updown_env["flow"],
                           updown_env["pos"], updown_env["val"])
    base = updown_env["opt"]
    v = updown_env["v"]
    for v2 in (False, True):
        opt = base.replace(use_softmax_splatter_v2=v2)
        model = BaselineModel(opt)
        disp, crop = prepare_crop(opt, False, flow, pos, val, N,
                                  max_area_frac=1.01)
        assert crop is not None and crop.hc < H  # actually cropping
        run = jax.jit(lambda v_, c, d: baseline_rollout_sparse(
            model, v_, img, flow, N, pos, val, decode_batch=3, crop=c,
            disp=d), static_argnums=(1,))
        full = run(v, None, None)
        cropped = run(v, crop, disp)
        np.testing.assert_allclose(np.asarray(cropped), np.asarray(full),
                                   atol=2e-6, err_msg=f"v2={v2}")


def test_slr_crop_exact():
    """Cropped == full for every SLR output key, non-v2 and v2 Z-norm."""
    img, flow, pos, val = _scene(seed=2)
    base = tiny_options(
        refine_model_type=UPDOWN, alpha_refine_model_type=UPDOWN,
        model_type="softmax_splating_2layers_alpha_seperate",
        use_alpha0_as_blending_weight=True)
    v = _init(SLRModel(base), img)
    for v2 in (False, True):
        opt = base.replace(use_softmax_splatter_v2=v2)
        model = SLRModel(opt)
        disp, crop = prepare_crop(opt, True, flow, pos, val, N,
                                  max_area_frac=1.01)
        assert crop is not None and crop.hc < H
        run = jax.jit(lambda v_, c, d: slr_rollout_sparse(
            model, v_, img, flow, N, pos, val, decode_batch=3, crop=c,
            disp=d), static_argnums=(1,))
        full = run(v, None, None)
        cropped = run(v, crop, disp)
        assert set(full) == set(cropped)
        for k in full:
            np.testing.assert_allclose(np.asarray(cropped[k]),
                                       np.asarray(full[k]), atol=2e-6,
                                       err_msg=f"{k} v2={v2}")


def test_target_bounds_excludes_oob_trajectories():
    """Sticky-invalid (frame-exiting) trajectories carry the max(H,W)+1
    displacement marker and zero splat weight — they must not inflate the
    target bbox (engine/rollout.py:_target_bounds)."""
    from slrsfs_tpu.engine.rollout import _target_bounds

    h, w = 32, 48
    pos = jnp.asarray([[10, 12], [11, 12], [40, 20]], jnp.int32)
    val = jnp.ones((3,), jnp.float32)
    nf = 3
    disp = np.zeros((nf, 3, 2), np.float32)
    disp[:, 0] = [2.0, 3.0]     # in-grid target (12, 15)
    disp[:, 1] = [49.0, 49.0]   # the OOB invalid marker (max(h,w)+1)
    disp[:, 2] = [30.0, -25.0]  # genuinely fully-OOB target (70, -5)
    disp_f = jnp.asarray(disp)
    disp_p = jnp.asarray(disp)
    xlo, xhi, ylo, yhi = np.asarray(
        _target_bounds(pos, val, disp_f, disp_p, h, w))
    # bbox = pixel 0's target taps only: x in [12, 13], y in [15, 16]
    assert xlo == 12.0 and xhi == 13.0
    assert ylo == 15.0 and yhi == 16.0


def test_all_static_scene_yields_no_crop(updown_env):
    """Zero-motion scene (or --sparsify-eps zeroing everything): plan_crop
    must return None, not a degenerate negative-size CropSpec (review
    finding: the area gate passed for the product of two negatives and the
    render CLI's default crop path crashed)."""
    flow_np = np.zeros((H, W, 2), np.float32)
    positions, valid = prepare_scene_sparse(flow_np, pad_multiple=64)
    opt = updown_env["opt"]
    disp, crop = prepare_crop(opt, False, jnp.asarray(flow_np),
                              jnp.asarray(positions), jnp.asarray(valid), N)
    assert crop is None
    # and the renderer's fallback (crop=None) still rolls out fine
    model = updown_env["model"]
    img = jnp.zeros((1, H, W, 3), jnp.float32)
    v = updown_env["v"]
    frames = jax.jit(lambda v_: baseline_rollout_sparse(
        model, v_, img, jnp.asarray(flow_np), N, jnp.asarray(positions),
        jnp.asarray(valid), decode_batch=3, crop=crop, disp=disp))(v)
    assert np.isfinite(np.asarray(frames)).all()


def test_traced_offsets_share_one_compile():
    """Same bucketed window SIZES at different locations must reuse ONE
    compiled rollout (offsets ride a traced (4,) vector; review finding:
    static offsets recompiled a sweep per scene) and stay exact."""
    # plain TinyTest (radius 6, align 1): window sizes stay interior so
    # the shifted scene keeps identical bucketed sizes. bucket=8 for the
    # small test frame (the production default of 32 needs CLAW-size
    # frames to leave room between the bbox and the edges).
    base_opt = tiny_options()
    model = BaselineModel(base_opt)
    rng = np.random.default_rng(3)
    img_np = (rng.standard_normal((1, H, W, 3)) * 0.25).astype(np.float32)

    def scene(dy, dx):
        img_s = np.roll(img_np, (dy, dx), axis=(1, 2))
        flow_np = np.zeros((H, W, 2), np.float32)
        flow_np[24 + dy:32 + dy, 24 + dx:40 + dx, 0] = 0.6
        pos, val = prepare_scene_sparse(flow_np, pad_multiple=64)
        return (jnp.asarray(img_s), jnp.asarray(flow_np),
                jnp.asarray(pos), jnp.asarray(val))

    img0, flow0, pos0, val0 = scene(0, 0)
    v = _init(model, img0)
    disp0, crop0 = prepare_crop(base_opt, False, flow0, pos0, val0, N,
                                max_area_frac=1.01, bucket=8)
    assert crop0 is not None

    run = jax.jit(
        lambda v_, i, f, p, va, d, offs: baseline_rollout_sparse(
            model, v_, i, f, N, p, va, decode_batch=3, crop=crop0,
            disp=d, crop_offsets=offs))
    full = jax.jit(lambda v_, i, f, p, va: baseline_rollout_sparse(
        model, v_, i, f, N, p, va, decode_batch=3))

    for dy, dx in ((0, 0), (8, 32)):
        img, flow, pos, val = scene(dy, dx)
        disp, crop = prepare_crop(base_opt, False, flow, pos, val, N,
                                  max_area_frac=1.01, bucket=8)
        assert (crop.hc, crop.wc, crop.ph, crop.pw) == (
            crop0.hc, crop0.wc, crop0.ph, crop0.pw), (crop, crop0)
        offs = jnp.asarray([crop.y0, crop.x0, crop.py0, crop.px0],
                           jnp.int32)
        got = run(v, img, flow, pos, val, disp, offs)
        want = full(v, img, flow, pos, val)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-6, err_msg=str((dy, dx)))
    assert run._cache_size() == 1  # one trace served both locations


@pytest.mark.parametrize("v2", [False, True])
def test_static_decode_input_matches_frame_math_at_eps_floor(v2):
    """The crop rollout's static decode input must equal the per-frame
    static splat math INCLUDING the NORM_EPS floor: with a Z range wider
    than ln(1e-8) ≈ 18.4 (the ±20 clamp allows it), deep-negative-zn
    pixels output fs·e^zn/eps, not fs — decode(fs) was wrong there
    (review finding)."""
    from slrsfs_tpu.engine.rollout import (
        _baseline_pack_fn,
        _baseline_static_decode_input,
    )
    from slrsfs_tpu.models.baseline import NORM_EPS

    rng = np.random.default_rng(7)
    h, w, C = 24, 32, 5
    opt = tiny_options(use_softmax_splatter_v2=v2)
    fs = jnp.asarray(rng.standard_normal((1, h, w, C)), jnp.float32)
    z_np = rng.standard_normal((1, h, w, 1)).astype(np.float32)
    z_np[:, :8] += 30.0    # global max up top: non-v2 zn < -20 elsewhere
    z_np[:, 18:] -= 25.0   # v2's max-warp-norm is LOCAL (own cell vs the
    # 0-contributions of W/N/NW neighbors), so its floor needs z itself
    # below -20 in a static strip
    z = jnp.asarray(z_np)

    flow_np = np.zeros((h, w, 2), np.float32)
    flow_np[10:14, 10:18] = 0.7
    pos, val = prepare_scene_sparse(flow_np, pad_multiple=64)
    pos, val = jnp.asarray(pos), jnp.asarray(val)

    moving = np.zeros((h, w), np.float32)
    p, v = np.asarray(pos), np.asarray(val)
    moving[p[v > 0.5, 1], p[v > 0.5, 0]] = 1.0
    static_mask = jnp.asarray(1.0 - moving)

    # per-frame static half from the real pack fn (zero displacement —
    # static pixels' packed value is frame-constant), normalized the way
    # the frame fn does
    pack = _baseline_pack_fn(opt, fs, z, pos, val, static_mask,
                             jnp.dtype(jnp.float32))
    u_static, _ = pack(jnp.zeros((pos.shape[0], 2), jnp.float32))
    g = jnp.asarray(u_static, jnp.float32)
    want = np.asarray(g[..., :-1] / jnp.maximum(g[..., -1:], NORM_EPS))

    got = np.asarray(_baseline_static_decode_input(
        opt, fs, z, pos, val, h, w, jnp.dtype(jnp.float32))[0])

    static = (1.0 - moving).astype(bool)
    np.testing.assert_allclose(got[static], want[static],
                               rtol=1e-6, atol=1e-6)
    # the floor must actually have engaged somewhere static — and there
    # the field is NOT the raw encoder features
    diff = np.abs(got - np.asarray(fs[0]))[static]
    assert diff.max() > 0.5, "test scene failed to engage the eps floor"


def test_crop_stage_profiler_runs(updown_env):
    """profile_baseline_crop_stages returns the reference-named stages and
    an honest total (prepare + rollout) on a crop-engaging scene."""
    from slrsfs_tpu.engine.stage_profile import profile_baseline_crop_stages

    img, flow, pos, val = (updown_env["img"], updown_env["flow"],
                           updown_env["pos"], updown_env["val"])
    model = updown_env["model"]
    v = updown_env["v"]
    st = profile_baseline_crop_stages(model, v, img, flow, pos, val, N,
                                      decode_batch=3, runs=1,
                                      max_area_frac=1.01)
    assert st is not None
    for k in ("t_encoder", "t_euler_integration", "t_softmax_splating",
              "t_decoder", "total", "fps"):
        assert k in st and np.isfinite(st[k]), k
    assert st["total"] >= st["t_euler_integration"]
