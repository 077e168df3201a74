"""End-to-end CLI tests on the synthetic fixture: render → eval → train."""

import json
import os

import numpy as np
import pytest
from PIL import Image

from conftest import fixture_root  # noqa: F401


def test_render_then_eval(fixture_root, tmp_path):
    from slrsfs_tpu.cli.render import render_scene
    from slrsfs_tpu.eval.eval_claw import eval_claw_dir

    # input image = frame 0 of the GT video; motion from the fixture
    scene = "00001_00000"
    from slrsfs_tpu.data.video import VideoReader

    vr = VideoReader(os.path.join(fixture_root, "train", f"{scene}_gt.mp4"))
    img_path = str(tmp_path / f"{scene}_input.jpg")
    Image.fromarray(vr[0]).save(img_path)
    vr.close()

    save_dir = str(tmp_path / "out")
    tiny = dict(ngf=8, out_channel=9,
                refine_model_type="resnet_TinyTest_de_resnet_pconv2_nonorm")
    out = render_scene(
        img_path,
        os.path.join(fixture_root, "train", f"{scene}_motion.npz"),
        save_dir, ckpt=None, name=scene, W=32, n_frames=12,
        decode_batch=4, opt_overrides=tiny,
    )
    pred_dir = os.path.join(out, "PredImg")
    frames = sorted(os.listdir(pred_dir))
    assert len(frames) == 12 and frames[0] == "000000.png"
    im = np.asarray(Image.open(os.path.join(pred_dir, "000000.png")))
    # output at half the input size (reference non-rawsize convention)
    assert im.shape == (48, 80, 3)

    # CLAW GT layout names videos <scene>.mp4 (eval_CLAW.py:66-69)
    gt_dir = str(tmp_path / "gt")
    os.makedirs(gt_dir)
    os.symlink(os.path.join(fixture_root, "train", f"{scene}_gt.mp4"),
               os.path.join(gt_dir, f"{scene}.mp4"))
    res = eval_claw_dir(save_dir, gt_dir,
                        n_frames=12,
                        out_json=str(tmp_path / "metric.json"))
    assert scene + "_gt" not in res["PSNR"]  # scene key is the plain name
    assert scene in res["PSNR"], res["PSNR"].keys()
    assert np.isfinite(res["TotalPSNR"]) and np.isfinite(res["TotalSSIM"])
    with open(tmp_path / "metric.json") as f:
        on_disk = json.load(f)
    assert on_disk["TotalPSNR"] == res["TotalPSNR"]


def test_render_flow_editing(fixture_root, tmp_path):
    from slrsfs_tpu.cli.render import edit_flow

    flow = np.zeros((4, 4, 2), np.float32)
    flow[..., 0] = 2.0
    rot = edit_flow(flow, rotate_deg=90.0, scale=0.5)
    np.testing.assert_allclose(rot[..., 0], 0.0, atol=1e-6)
    np.testing.assert_allclose(rot[..., 1], 1.0, atol=1e-6)


def test_train_cli_one_epoch(fixture_root, tmp_path):
    from slrsfs_tpu.cli import train as train_cli

    out = str(tmp_path / "run")
    train_cli.main([
        "--data-root", fixture_root, "--out", out,
        "--model-type", "softmax_splating",
        "--batch-size", "2", "--W", "32", "--ngf", "8",
        "--out-channel", "9",
        "--refine-model-type", "resnet_TinyTest_de_resnet_pconv2_nonorm",
        "--bg-refine-model-type", "resnet_TinyTestBG_nonorm",
        "--ndf", "8", "--num-D", "1", "--n-layers-D", "2",
        "--niter", "1", "--niter-decay", "0",
        "--steps-per-epoch", "2", "--val-steps", "1",
    ])
    assert os.path.exists(os.path.join(out, "HALT"))
    assert os.path.exists(os.path.join(out, "ckpt.meta.json"))
    with open(os.path.join(out, "ckpt.meta.json")) as f:
        meta = json.load(f)
    assert meta["epoch"] == 0
    assert "val" in meta and np.isfinite(meta["val"]["Total Loss"])
    assert os.path.exists(os.path.join(out, "options.json"))

    # resume for one more epoch from the (async-written) native checkpoint
    os.remove(os.path.join(out, "HALT"))
    train_cli.main([
        "--data-root", fixture_root, "--out", out,
        "--model-type", "softmax_splating",
        "--batch-size", "2", "--W", "32", "--ngf", "8",
        "--out-channel", "9",
        "--refine-model-type", "resnet_TinyTest_de_resnet_pconv2_nonorm",
        "--bg-refine-model-type", "resnet_TinyTestBG_nonorm",
        "--ndf", "8", "--num-D", "1", "--n-layers-D", "2",
        "--niter", "2", "--niter-decay", "0",
        "--steps-per-epoch", "2", "--val-steps", "1",
        "--resume",
    ])
    with open(os.path.join(out, "ckpt.meta.json")) as f:
        meta = json.load(f)
    assert meta["epoch"] == 1  # continued from epoch 0, not restarted


def test_scene_stats_and_sparsify_eps():
    """tools/scene_stats measures moving fractions + drift bound; the render
    CLI's --sparsify-eps zeroes sub-threshold motion with the documented
    half-pixel bound at eps = 0.5/N."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "scene_stats", os.path.join(os.path.dirname(__file__), "..",
                                    "tools", "scene_stats.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    rng = np.random.default_rng(0)
    flow = rng.standard_normal((32, 32, 2)).astype(np.float32) * 0.001
    flow[:8] = 0.0          # exact-zero block
    flow[16:] *= 1000.0     # fast block
    s = mod.scene_stats(flow, [0.01], n_frames=60)
    assert s["exact_zero_moving_frac"] == 0.75
    # eps = 0.5/60: the slow mid block (speeds ~1e-3) falls below it
    assert s["moving_frac_at_recommended"] < 0.75
    assert s["max_drift_px_if_zeroed"] <= 0.5 + 1e-6

    # the sparsifier math used by cli.render: zeroing below eps keeps all
    # zeroed pixels within eps*N = 0.5 px of their true trajectory end
    eps = 0.5 / 60
    speed = np.sqrt(flow[..., 0] ** 2 + flow[..., 1] ** 2)
    sparsified = np.where((speed < eps)[..., None], 0.0, flow)
    zeroed = (speed > 0) & (speed < eps)
    assert zeroed.any()
    assert float(speed[zeroed].max()) * 60 <= 0.5
    moving_before = float((speed > 0).mean())
    moving_after = float((np.abs(sparsified).sum(-1) > 0).mean())
    assert moving_after < moving_before


def test_render_all_sweep(fixture_root, tmp_path):
    """The scene-loop CLI (reference test_all_*_scenes.py equivalent):
    two scenes through ONE renderer — shared jit cache, crop auto engaged,
    index-range sharding honored, per-scene PredImg dirs + mp4s."""
    from slrsfs_tpu.cli import render_all
    from slrsfs_tpu.data.video import VideoReader

    scenes_dir = str(tmp_path / "scenes")
    os.makedirs(scenes_dir)
    for scene in ("00001_00000", "00002_00000"):
        vr = VideoReader(os.path.join(fixture_root, "train",
                                      f"{scene}_gt.mp4"))
        Image.fromarray(vr[0]).save(
            os.path.join(scenes_dir, f"{scene}_input.jpg"))
        vr.close()
        os.symlink(
            os.path.join(fixture_root, "train", f"{scene}_motion.npz"),
            os.path.join(scenes_dir, f"{scene}_motion.npz"))

    save_dir = str(tmp_path / "out")
    tiny = ('{"ngf": 8, "out_channel": 9, "refine_model_type": '
            '"resnet_TinyTest_de_resnet_pconv2_nonorm"}')
    render_all.main([
        scenes_dir, save_dir, "--W", "32", "--n-frames", "6",
        "--dtype", "float32", "--flow-suffix", "_motion.npz",
        "--opt-overrides", tiny,
    ])
    for scene in ("00001_00000", "00002_00000"):
        frames = sorted(os.listdir(os.path.join(save_dir, scene, "PredImg")))
        assert len(frames) == 6, scene
        assert any(f.endswith(".mp4")
                   for f in os.listdir(os.path.join(save_dir, scene)))

    # index sharding: [1, 2) renders only the second scene
    shard_dir = str(tmp_path / "shard")
    render_all.main([
        scenes_dir, shard_dir, "--W", "32", "--n-frames", "6",
        "--dtype", "float32", "--flow-suffix", "_motion.npz",
        "--opt-overrides", tiny, "--start", "1",
    ])
    assert sorted(os.listdir(shard_dir)) == ["00002_00000"]
