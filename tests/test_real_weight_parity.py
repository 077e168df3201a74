"""Smoke test for tools/real_weight_parity.py (round-4 VERDICT #8): the
one-command real-weight pipeline — checkpoint import → rawsize render →
CLAW-protocol eval → metric.json aggregate — must run end to end so the day
pretrained weights become available, quality parity vs the reference table
(README.md:101-107) is a single command. Random weights here (no pretrained
weights in this environment), so only PSNR/SSIM columns score; the LPIPS/
Perceptual columns are exercised separately in tests/test_eval_metrics.py
with random-weight feature nets."""

import json
import os
import sys

import numpy as np
import pytest
from PIL import Image

torch = pytest.importorskip("torch")
cv2 = pytest.importorskip("cv2")

from test_checkpoint import _fake_reference_checkpoint

TOOLS = os.path.join(os.path.dirname(__file__), "..", "tools")
N, W = 6, 32
IMG_W, IMG_H = 96, 64


def test_real_weight_parity_one_command(tmp_path):
    sys.path.insert(0, TOOLS)
    try:
        import real_weight_parity
    finally:
        sys.path.remove(TOOLS)

    d = str(tmp_path)
    ckpt, _, _ = _fake_reference_checkpoint(d)

    rng = np.random.default_rng(5)
    img = (rng.random((IMG_H, IMG_W, 3)) * 255).astype(np.uint8)
    img_path = os.path.join(d, "00001_input.jpg")
    Image.fromarray(img).save(img_path)

    from slrsfs_tpu.data.tensors import save_motion

    motion = np.zeros((IMG_H, IMG_W, 2), np.float32)
    motion[IMG_H // 2:, :, 0] = 1.0
    flow_path = os.path.join(d, "00001_motion.npz")
    save_motion(flow_path, motion)

    gt_dir = os.path.join(d, "gt")
    os.makedirs(gt_dir)
    vw = cv2.VideoWriter(os.path.join(gt_dir, "00001.mp4"),
                         cv2.VideoWriter_fourcc(*"mp4v"), 30, (IMG_W, IMG_H))
    for _ in range(N):
        vw.write((rng.random((IMG_H, IMG_W, 3)) * 255).astype(np.uint8))
    vw.release()

    out = os.path.join(d, "run")
    agg = real_weight_parity.main([
        ckpt, "--scene", img_path, flow_path, "--gt-dir", gt_dir,
        "--out", out, "--W", str(W), "--n-frames", str(N)])

    # rawsize render at the input size, exactly N frames
    pngs = sorted(os.listdir(os.path.join(out, "pred", "00001", "PredImg")))
    assert len(pngs) == N
    fr = np.asarray(Image.open(
        os.path.join(out, "pred", "00001", "PredImg", "000000.png")))
    assert fr.shape == (IMG_H, IMG_W, 3)

    # metric.json in the reference aggregate schema (eval_CLAW.py:83-87)
    with open(os.path.join(out, "metric.json")) as f:
        m = json.load(f)
    for k in ("TotalPSNR", "TotalSSIM", "TotalPSNR_std"):
        assert isinstance(m[k], float), k
    assert m["PSNR"]["00001"] == pytest.approx(m["TotalPSNR"], abs=1e-6)
    assert agg["TotalPSNR"] == m["TotalPSNR"]
    # weight-gated columns stay empty dicts with random weights
    assert m["TotalLPIPS"] == {}
