"""Data pipeline: synthetic fixture scenes through every loader variant."""

import json
import os

import numpy as np
import pytest
from PIL import Image

from slrsfs_tpu.config import Options
from slrsfs_tpu.data.datasets import LiquidDataset, get_dataset
from slrsfs_tpu.data.tensors import load_compressed_tensor, motion_to_hw2, save_motion
from slrsfs_tpu.data.video import VideoReader, compute_mean_video
from slrsfs_tpu.utils.flow_viz import flow_to_image, read_flo, write_flo


from conftest import fixture_root  # noqa: F401


def test_video_reader(fixture_root):
    vr = VideoReader(os.path.join(fixture_root, "train", "00001_00000_gt.mp4"))
    assert len(vr) == 12
    f0 = vr[0]
    f5 = vr[5]
    assert f0.shape == (96, 160, 3) and f0.dtype == np.uint8
    assert not np.array_equal(f0, f5)
    f2 = vr[2]  # backward seek via cache
    assert f2.shape == (96, 160, 3)
    vr.close()

    mean = compute_mean_video(
        os.path.join(fixture_root, "train", "00001_00000_gt.mp4"))
    assert mean.shape == (96, 160, 3)


def test_flo_roundtrip(tmp_path):
    rng = np.random.default_rng(1)
    flow = rng.standard_normal((8, 10, 2)).astype(np.float32)
    p = str(tmp_path / "a.flo")
    write_flo(p, flow)
    np.testing.assert_array_equal(read_flo(p), flow)
    img = flow_to_image(flow)
    assert img.shape == (8, 10, 3) and img.dtype == np.uint8


def test_motion_tensor_formats(tmp_path):
    import torch

    flow = np.random.default_rng(2).standard_normal((1, 2, 8, 10)).astype(np.float32)
    p = str(tmp_path / "m.pth")
    torch.save(torch.from_numpy(flow), p)
    got = motion_to_hw2(load_compressed_tensor(p))
    assert got.shape == (8, 10, 2)
    np.testing.assert_allclose(got[..., 0], flow[0, 0])


def test_motion_tensor_lz4_frame(tmp_path):
    """The reference's actual on-disk format: lz4-frame-compressed pickle of a
    torch tensor (utils/utils.py:111-115), decoded via the native liblz4
    ctypes binding (no Python lz4 package in this image)."""
    import pickle

    import torch

    from slrsfs_tpu.data import lz4f

    if not lz4f.available():
        import pytest

        pytest.skip("liblz4 not present")
    flow = np.random.default_rng(3).standard_normal((1, 2, 8, 10)).astype(np.float32)
    p = str(tmp_path / "scene_motion.pth")
    with open(p, "wb") as f:
        f.write(lz4f.compress(pickle.dumps(torch.from_numpy(flow))))
    got = motion_to_hw2(load_compressed_tensor(p))
    assert got.shape == (8, 10, 2)
    np.testing.assert_allclose(got[..., 0], flow[0, 0])
    # multi-chunk robustness: decompress a large frame (> one 64 KiB block)
    big = np.random.default_rng(4).standard_normal((1 << 18,)).astype(np.float32)
    raw = big.tobytes()
    assert lz4f.decompress(lz4f.compress(raw)) == raw


def test_baseline_dataset(fixture_root):
    opt = Options(W=64, dataset="eulerian_data")
    ds = get_dataset(opt, fixture_root, split="train", seed=3)
    s = ds[0]
    assert len(s["images"]) == 3
    assert s["images"][0].shape == (64, 64, 3)
    assert s["images"][0].min() >= -1.0 and s["images"][0].max() <= 1.0
    assert s["motions"].shape == (64, 64, 2)
    i0, i1, i2 = s["index"]
    assert 0 <= i0 <= i1 <= i2 < 12

    # batching
    b = next(ds.batches(batch_size=2, num_batches=1))
    assert b["images"][0].shape == (2, 64, 64, 3)
    assert b["motions"].shape == (2, 64, 64, 2)

    # val mode: deterministic resize path
    ds.toval(0)
    v = ds[0]
    assert v["images"][0].shape == (64, 64, 3)


def test_mask_dataset(fixture_root):
    opt = Options(W=64, dataset="eulerian_data_balanced1_mask", MVloss=1.0)
    ds = get_dataset(opt, fixture_root, split="train", seed=4)
    s = ds[0]
    assert s["mask_rock"].shape == (64, 64, 1)
    assert s["mean_video"].shape == (64, 64, 3)
    assert set(np.unique(s["mask_rock"])).issubset({0.0, 1.0})


def test_hint_dataset(fixture_root):
    opt = Options(W=64, dataset="eulerian_data_hint")
    ds = get_dataset(opt, fixture_root, split="train", seed=5)
    s = ds[0]
    assert s["hints"].shape == (64, 64, 2)


def test_bg_dataset(fixture_root):
    opt = Options(W=64, dataset="eulerian_data_bg", MVloss=1.0)
    ds = get_dataset(opt, fixture_root, split="train", seed=6)
    s = ds[0]
    assert len(s["images"]) == 2
    assert s["mean_video"].shape == (64, 64, 3)


def test_flow_flip_negates_x(fixture_root):
    """h-flip must negate the flow x channel (eulerian_data.py:92-94)."""
    opt = Options(W=64, dataset="eulerian_data")
    ds = get_dataset(opt, fixture_root, split="train", seed=1)
    flips = set()
    xs = []
    for i in range(8):
        s = ds[i]
        x_mean = s["motions"][..., 0].mean()
        xs.append(x_mean)
    # motion is +1 in the bottom half pre-transform; flipped samples are ~-x
    assert any(x > 0.1 for x in xs) and any(x < -0.1 for x in xs), xs


def test_uvm_motion_fold(tmp_path):
    """3-channel uv*m motion folds to 2 channels (reference use_uvm)."""
    uvm = np.ones((1, 3, 4, 6), np.float32)
    uvm[0, 0] = 2.0  # u
    uvm[0, 2] = 0.5  # m
    got = motion_to_hw2(uvm)
    assert got.shape == (4, 6, 2)
    np.testing.assert_allclose(got[..., 0], 1.0)
    np.testing.assert_allclose(got[..., 1], 0.5)


def test_flow2img_matches_reference():
    """Color-wheel rendering parity vs the reference implementation."""
    import sys
    sys.path.insert(0, "/root/reference")
    from utils.flow_utils import flow2img as ref_flow2img

    rng = np.random.default_rng(3)
    flow = (rng.standard_normal((16, 20, 2)) * 3).astype(np.float32)
    ours = flow_to_image(flow)
    want = ref_flow2img(flow.copy())
    assert ours.shape == want.shape
    diff = np.abs(ours.astype(int) - want.astype(int))
    assert diff.max() <= 2, diff.max()  # rounding-level agreement


def test_model_registry_and_options_roundtrip():
    from slrsfs_tpu.config import Options
    from slrsfs_tpu.models import get_model

    for mt in ("softmax_splating", "softmax_splating_2layers_alpha_seperate",
               "SPADE_unet_mask_motion", "bg"):
        m = get_model(Options(model_type=mt))
        assert m is not None
    opt = Options(ngf=32, losses=("2.0_l1",), use_softmax_splatter_v2=True)
    opt2 = Options.from_json(opt.to_json())
    assert opt2 == opt


def test_dataset_sampling_deterministic(fixture_root):
    """Sampling is a pure function of (seed, split, epoch, index): two
    iterations over the same epoch yield identical batches regardless of
    prefetch timing; a different epoch yields different samples (reference
    per-epoch reseeding contract, eulerian_data.py:136-163)."""
    opt = Options(W=32, dataset="eulerian_data")
    ds = get_dataset(opt, fixture_root, split="train", seed=5)
    ds.totrain(epoch=2)
    a = [ds[i] for i in range(4)]
    b1 = list(ds.batches(batch_size=2, num_batches=2))
    ds.totrain(epoch=2)
    a2 = [ds[i] for i in range(4)]
    b2 = list(ds.batches(batch_size=2, num_batches=2))
    for x, y in zip(a, a2):
        np.testing.assert_array_equal(x["images"][0], y["images"][0])
        np.testing.assert_array_equal(x["motions"], y["motions"])
        np.testing.assert_array_equal(x["index"], y["index"])
    for x, y in zip(b1, b2):
        np.testing.assert_array_equal(x["images"][1], y["images"][1])
    ds.totrain(epoch=3)
    c = [ds[i] for i in range(4)]
    assert any(not np.array_equal(x["images"][0], y["images"][0])
               for x, y in zip(a, c))


def test_dataset_ff_mask(fixture_root):
    """--random_ff_mask wiring: train samples carry a (W, W, 1) keep-mask in
    {0,1}; val samples never do (train_options.py:569-574)."""
    opt = Options(W=32, dataset="eulerian_data", random_ff_mask=True,
                  random_ff_mask_rate=1.0)
    ds = get_dataset(opt, fixture_root, split="train", seed=1)
    s = ds[0]
    m = s["ff_mask"]
    assert m.shape == (32, 32, 1) and m.dtype == np.float32
    assert set(np.unique(m)).issubset({0.0, 1.0})
    assert (m == 0).any()  # rate=1.0 always draws strokes
    b = next(ds.batches(batch_size=2, num_batches=1))
    assert b["ff_mask"].shape == (2, 32, 32, 1)
    ds.toval(0)
    assert "ff_mask" not in ds[0]
    # rate=0 -> all-keep mask is still emitted but trivial? No: reference
    # draws per-sample; with rate 0 the mask is all ones
    opt0 = Options(W=32, dataset="eulerian_data", random_ff_mask=True,
                   random_ff_mask_rate=0.0)
    ds0 = get_dataset(opt0, fixture_root, split="train", seed=1)
    assert (ds0[0]["ff_mask"] == 1.0).all()
