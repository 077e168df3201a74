"""Random-weight parity of the Perceptual (PNet-VGG16) and LPIPS-alex eval
metrics vs the reference implementation.

Pretrained weights cannot be downloaded here, but the metric *code paths* are
proven: torchvision is stubbed with randomly-initialized feature stacks in the
exact torchvision layout, the reference ``models/networks/pretrained_networks
.PNet`` is imported and run against our ``PerceptualMetrics`` with the same
weights. LPIPS-alex v0.1 math (normalize → squared diff → 1x1 linear →
spatial mean → sum over slices) is replicated in torch from its public spec
(``evaluation/animation/eval_CLAW.py:22-24,37`` is the consumer).
"""

import json
import os
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

from torch_ref import assert_close  # noqa: E402


def _vgg16_features():
    """torchvision.models.vgg16().features layout (indices 0..30)."""
    cfg = [(3, 64), (64, 64), "M", (64, 128), (128, 128), "M",
           (128, 256), (256, 256), (256, 256), "M",
           (256, 512), (512, 512), (512, 512), "M",
           (512, 512), (512, 512), (512, 512), "M"]
    layers = []
    for c in cfg:
        if c == "M":
            layers.append(tnn.MaxPool2d(2, 2))
        else:
            layers += [tnn.Conv2d(c[0], c[1], 3, padding=1),
                       tnn.ReLU(inplace=True)]
    return tnn.Sequential(*layers)


def _alexnet_features():
    """torchvision.models.alexnet().features layout (indices 0..12)."""
    return tnn.Sequential(
        tnn.Conv2d(3, 64, 11, 4, 2), tnn.ReLU(inplace=True),
        tnn.MaxPool2d(3, 2),
        tnn.Conv2d(64, 192, 5, padding=2), tnn.ReLU(inplace=True),
        tnn.MaxPool2d(3, 2),
        tnn.Conv2d(192, 384, 3, padding=1), tnn.ReLU(inplace=True),
        tnn.Conv2d(384, 256, 3, padding=1), tnn.ReLU(inplace=True),
        tnn.Conv2d(256, 256, 3, padding=1), tnn.ReLU(inplace=True),
        tnn.MaxPool2d(3, 2),
    )


@pytest.fixture
def tv_stub():
    """Install a torchvision stub so the reference pretrained_networks module
    imports; returns the shared random-weight feature stacks."""
    torch.manual_seed(0)
    vgg_feats = _vgg16_features()
    alex_feats = _alexnet_features()
    models = types.ModuleType("torchvision.models")
    models.vgg16 = lambda pretrained=False, **kw: types.SimpleNamespace(
        features=vgg_feats)
    models.alexnet = lambda pretrained=False, **kw: types.SimpleNamespace(
        features=alex_feats)
    tv = types.ModuleType("torchvision")
    tv.models = models
    saved = {k: sys.modules.get(k) for k in ("torchvision", "torchvision.models")}
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.models"] = models
    yield vgg_feats, alex_feats
    for k, v in saved.items():
        if v is None:
            sys.modules.pop(k, None)
        else:
            sys.modules[k] = v


def _tv_sd(feats):
    return {f"features.{k}": v for k, v in feats.state_dict().items()}


def _metrics_from(tmp_path, vgg_feats=None, alex_feats=None, lpips_w=None):
    from slrsfs_tpu.eval.metrics import PerceptualMetrics

    kw = {}
    if vgg_feats is not None:
        p = str(tmp_path / "vgg16.pth")
        torch.save(_tv_sd(vgg_feats), p)
        kw["vgg16_pth"] = p
    if alex_feats is not None:
        p = str(tmp_path / "alexnet.pth")
        torch.save(_tv_sd(alex_feats), p)
        kw["alexnet_pth"] = p
    if lpips_w is not None:
        p = str(tmp_path / "lpips_alex.pth")
        torch.save(lpips_w, p)
        kw["lpips_pth"] = p
    return PerceptualMetrics(**kw)


def test_perceptual_pnet_parity(tv_stub, tmp_path):
    """Our Perceptual metric equals reference PNet('vgg') with shared random
    weights (pretrained_networks.py:34-95)."""
    vgg_feats, _ = tv_stub
    sys.path.insert(0, "/root/reference")
    from models.networks.pretrained_networks import PNet

    pnet = PNet(pnet_type="vgg", pnet_rand=True, use_gpu=False)
    pnet.eval()

    rng = np.random.default_rng(3)
    a01 = rng.random((2, 64, 64, 3), np.float32)
    b01 = rng.random((2, 64, 64, 3), np.float32)
    ta = torch.from_numpy(a01.transpose(0, 3, 1, 2).copy()) * 2 - 1
    tb = torch.from_numpy(b01.transpose(0, 3, 1, 2).copy()) * 2 - 1
    with torch.no_grad():
        want = pnet(ta, tb).numpy().mean()

    m = _metrics_from(tmp_path, vgg_feats=vgg_feats)
    assert m.has_perceptual
    got = float(m.perceptual(a01, b01))
    assert_close(got, want, rel=1e-4)


def test_lpips_alex_parity(tv_stub, tmp_path):
    """Our LPIPS equals the v0.1 alex math run in torch with shared weights:
    scaling layer → unit-normalize channels → squared diff → 1x1 linear →
    spatial average → sum over the 5 slices."""
    _, alex_feats = tv_stub
    sys.path.insert(0, "/root/reference")
    from models.networks.pretrained_networks import alexnet, normalize_tensor

    net = alexnet(pretrained=False)
    net.eval()

    torch.manual_seed(1)
    chans = [64, 192, 384, 256, 256]
    lins = [torch.rand(1, c, 1, 1) * 0.1 for c in chans]
    lpips_sd = {f"lins.{i}.model.1.weight": w for i, w in enumerate(lins)}

    shift = torch.tensor([-0.030, -0.088, -0.188]).view(1, 3, 1, 1)
    scale = torch.tensor([0.458, 0.448, 0.450]).view(1, 3, 1, 1)

    rng = np.random.default_rng(4)
    a01 = rng.random((2, 64, 64, 3), np.float32)
    b01 = rng.random((2, 64, 64, 3), np.float32)
    ta = torch.from_numpy(a01.transpose(0, 3, 1, 2).copy()) * 2 - 1
    tb = torch.from_numpy(b01.transpose(0, 3, 1, 2).copy()) * 2 - 1
    with torch.no_grad():
        fa = net((ta - shift) / scale)
        fb = net((tb - shift) / scale)
        val = 0.0
        for w, oa, ob in zip(lins, fa, fb):
            d = (normalize_tensor(oa) - normalize_tensor(ob)) ** 2
            val = val + (d * w).sum(1, keepdim=True).mean(dim=[2, 3])
        want = float(val.mean())

    m = _metrics_from(tmp_path, alex_feats=alex_feats, lpips_w=lpips_sd)
    assert m.has_lpips
    got = float(m.lpips(a01, b01))
    assert_close(got, want, rel=1e-4)


def test_eval_claw_all_four_columns(tv_stub, tmp_path):
    """eval_claw_dir produces all four metric columns end-to-end with
    synthetic weights (reference eval_CLAW.py:83-87,150-160 schema)."""
    cv2 = pytest.importorskip("cv2")
    from slrsfs_tpu.eval.eval_claw import eval_claw_dir

    vgg_feats, alex_feats = tv_stub
    torch.manual_seed(2)
    lpips_sd = {f"lins.{i}.model.1.weight": torch.rand(1, c, 1, 1) * 0.1
                for i, c in enumerate([64, 192, 384, 256, 256])}
    metrics = _metrics_from(tmp_path, vgg_feats=vgg_feats,
                            alex_feats=alex_feats, lpips_w=lpips_sd)

    H, W, N = 64, 64, 3
    scene = "sceneA"
    pred_dir = tmp_path / "pred"
    gt_dir = tmp_path / "gt"
    os.makedirs(pred_dir / scene / "PredImg")
    os.makedirs(gt_dir)
    rng = np.random.default_rng(5)
    vw = cv2.VideoWriter(str(gt_dir / f"{scene}.mp4"),
                         cv2.VideoWriter_fourcc(*"mp4v"), 30, (W, H))
    for t in range(N):
        frame = rng.integers(0, 255, (H, W, 3), np.uint8)
        vw.write(cv2.cvtColor(frame, cv2.COLOR_RGB2BGR))
        cv2.imwrite(str(pred_dir / scene / "PredImg" / f"{t:06d}.png"),
                    frame[..., ::-1])
    vw.release()

    out = eval_claw_dir(str(pred_dir), str(gt_dir), metrics=metrics,
                        n_frames=N, out_json=str(tmp_path / "metric.json"))
    for k in ("LPIPS", "Perceptual", "PSNR", "SSIM"):
        assert scene in out[k], (k, out)
        assert np.isfinite(out[k][scene])
        assert np.isfinite(out[f"Total{k}"])
    with open(tmp_path / "metric.json") as f:
        assert json.load(f)["TotalPSNR"] == out["TotalPSNR"]
