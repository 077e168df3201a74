"""Render CLI driven from an imported reference-style checkpoint (the
reference's deployment path: opts travel inside the .pth and are restored at
inference, test_baseline_4eval.py:124-127)."""

import os

import numpy as np
import pytest
from PIL import Image

torch = pytest.importorskip("torch")

from test_checkpoint import _fake_reference_checkpoint


def test_render_scene_from_checkpoint(tmp_path):
    from slrsfs_tpu.cli.render import render_scene
    from slrsfs_tpu.data.tensors import save_motion

    ckpt_path, enc, dec = _fake_reference_checkpoint(str(tmp_path))

    rng = np.random.default_rng(0)
    img = (rng.random((64, 96, 3)) * 255).astype(np.uint8)
    img_path = str(tmp_path / "scene_input.jpg")
    Image.fromarray(img).save(img_path)
    motion = np.zeros((64, 96, 2), np.float32)
    motion[32:, :, 0] = 1.0
    save_motion(str(tmp_path / "scene_motion.npz"), motion)

    out = render_scene(
        img_path, str(tmp_path / "scene_motion.npz"), str(tmp_path / "out"),
        ckpt=ckpt_path, name="scene", W=32, n_frames=6, decode_batch=3,
    )
    frames = sorted(os.listdir(os.path.join(out, "PredImg")))
    assert len(frames) == 6
    arr = np.asarray(Image.open(os.path.join(out, "PredImg", "000003.png")))
    assert arr.shape == (32, 48, 3)  # half of the 96x64 input
    assert np.isfinite(arr).all()
    # mp4 assembled (cv2 fallback when no ffmpeg)
    assert any(f.endswith(".mp4") for f in os.listdir(out))


def test_scene_renderer_reuses_jit_across_scenes(tmp_path):
    """A scene-loop renderer imports the checkpoint once and compiles each
    rollout shape bucket once — the second same-shaped scene must reuse the
    cached jit (reference scene loops respawn python per scene,
    test_all_CLAW_scenes.py:71-96; this is the framework's batched
    replacement)."""
    from slrsfs_tpu.cli.render import SceneRenderer
    from slrsfs_tpu.data.tensors import save_motion

    ckpt_path, _, _ = _fake_reference_checkpoint(str(tmp_path))
    rng = np.random.default_rng(1)
    motion = np.zeros((64, 96, 2), np.float32)
    motion[32:, :, 0] = 1.0
    scenes = []
    for i in range(2):
        img = (rng.random((64, 96, 3)) * 255).astype(np.uint8)
        ip = str(tmp_path / f"s{i}_input.jpg")
        Image.fromarray(img).save(ip)
        fp = str(tmp_path / f"s{i}_motion.npz")
        save_motion(fp, motion)
        scenes.append((ip, fp))

    r = SceneRenderer(ckpt=ckpt_path, W=32, n_frames=6, decode_batch=3)
    outs = [r.render(ip, fp, str(tmp_path / "out"), name=f"s{i}")
            for i, (ip, fp) in enumerate(scenes)]
    r.finish()
    assert len(r._jit_cache) == 1  # same sparse bucket → one compile
    for i, out in enumerate(outs):
        frames = sorted(os.listdir(os.path.join(out, "PredImg")))
        assert len(frames) == 6, out
    a0 = np.asarray(Image.open(os.path.join(outs[0], "PredImg", "000002.png")))
    a1 = np.asarray(Image.open(os.path.join(outs[1], "PredImg", "000002.png")))
    assert a0.shape == a1.shape and not np.array_equal(a0, a1)


def test_render_shard_frames_matches_single(tmp_path):
    """--shard-frames renders over the 8-device CPU mesh and must match the
    single-device render (PNG-level, allowing 1 quantization step)."""
    from slrsfs_tpu.cli.render import SceneRenderer
    from slrsfs_tpu.data.tensors import save_motion

    ckpt_path, _, _ = _fake_reference_checkpoint(str(tmp_path))
    rng = np.random.default_rng(4)
    img = (rng.random((64, 96, 3)) * 255).astype(np.uint8)
    ip = str(tmp_path / "sc_input.jpg")
    Image.fromarray(img).save(ip)
    motion = np.zeros((64, 96, 2), np.float32)
    motion[32:, :, 0] = 1.0
    fp = str(tmp_path / "sc_motion.npz")
    save_motion(fp, motion)

    r1 = SceneRenderer(ckpt=ckpt_path, W=32, n_frames=8, decode_batch=4)
    o1 = r1.render(ip, fp, str(tmp_path / "single"), name="sc")
    r1.finish()
    r8 = SceneRenderer(ckpt=ckpt_path, W=32, n_frames=8, shard_frames=True)
    o8 = r8.render(ip, fp, str(tmp_path / "sharded"), name="sc")
    r8.finish()

    for t in range(8):
        a = np.asarray(Image.open(os.path.join(o1, "PredImg", f"{t:06d}.png")),
                       np.int16)
        b = np.asarray(Image.open(os.path.join(o8, "PredImg", f"{t:06d}.png")),
                       np.int16)
        assert np.abs(a - b).max() <= 1, t


def test_auto_decode_batch_chooser():
    """Auto decode-batch: largest divisor of n_frames whose chunk fits the
    measured HBM budget (bench.py 768^2 anchors; round-5 sweep OOM repro)."""
    from slrsfs_tpu.cli.render import DECODE_PX_BUDGET, auto_decode_batch

    # 256^2 full frame: whole 60-frame batch fits (bench baseline row)
    assert auto_decode_batch(60, 256 * 256) == 60
    # 768^2 full frame: the v5e-measured safe chunk is 15 frames, not 60
    assert auto_decode_batch(60, 768 * 768) == 15
    # ~50%-moving 768^2 crop window: 30 frames (bench crop row anchor)
    assert auto_decode_batch(60, 768 * 768 // 2) == 30
    # SLR decodes two heads off the shared stack -> half budget
    assert auto_decode_batch(60, 768 * 768, slr=True) <= \
        auto_decode_batch(60, 768 * 768)
    # always a divisor of n_frames, never zero
    for n in (1, 7, 59, 60):
        for area in (1, 10_000, 10**7, 10**9):
            db = auto_decode_batch(n, area)
            assert 1 <= db <= n and n % db == 0
            assert db == 1 or db * area <= DECODE_PX_BUDGET or db == 1
    # pathological area still yields 1 (never div-by-zero / 0 chunk)
    assert auto_decode_batch(60, 10**9) == 1
