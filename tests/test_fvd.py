"""FVD harness tests: I3D architecture/importer parity + Fréchet statistic.

The reference repo ships no FVD harness (BASELINE.json names the metric), so
parity is proven against a faithful torch implementation of the community
pytorch-i3d ``InceptionI3d`` (the network whose released Kinetics
state_dicts the importer targets), built here with random weights — the
same technique as the LPIPS/PNet tests (test_eval_metrics.py).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402
from torch import nn  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from slrsfs_tpu.eval.i3d import (  # noqa: E402
    FVD, InceptionI3D, _MIXED, frechet_distance, import_i3d,
    preprocess_video,
)


# ---------------------------------------------------------------------------
# Torch reference: pytorch-i3d InceptionI3d (TF-style same padding)
# ---------------------------------------------------------------------------

def _same_pad(x, kernel, stride):
    pads = []
    for d in (4, 3, 2):  # W, H, T (F.pad takes last-dim-first pairs)
        s = x.shape[d]
        k, st = kernel[d - 2], stride[d - 2]
        out = -(-s // st)
        total = max((out - 1) * st + k - s, 0)
        pads += [total // 2, total - total // 2]
    return F.pad(x, pads)


class TUnit3D(nn.Module):
    def __init__(self, in_ch, out_ch, kernel=(1, 1, 1), stride=(1, 1, 1),
                 use_bn=True, relu=True, bias=False):
        super().__init__()
        self.kernel, self.stride = kernel, stride
        self.use_bn, self.relu_on = use_bn, relu
        self.conv3d = nn.Conv3d(in_ch, out_ch, kernel, stride, 0, bias=bias)
        if use_bn:
            self.bn = nn.BatchNorm3d(out_ch, eps=1e-3, momentum=0.01)

    def forward(self, x):
        x = self.conv3d(_same_pad(x, self.kernel, self.stride))
        if self.use_bn:
            x = self.bn(x)
        return F.relu(x) if self.relu_on else x


class TMaxPoolSame(nn.Module):
    def __init__(self, kernel, stride):
        super().__init__()
        self.kernel, self.stride = kernel, stride
        self.pool = nn.MaxPool3d(kernel, stride)

    def forward(self, x):
        return self.pool(_same_pad(x, self.kernel, self.stride))


class TInception(nn.Module):
    def __init__(self, in_ch, out):
        super().__init__()
        self.b0 = TUnit3D(in_ch, out[0])
        self.b1a = TUnit3D(in_ch, out[1])
        self.b1b = TUnit3D(out[1], out[2], (3, 3, 3))
        self.b2a = TUnit3D(in_ch, out[3])
        self.b2b = TUnit3D(out[3], out[4], (3, 3, 3))
        self.pool = TMaxPoolSame((3, 3, 3), (1, 1, 1))
        self.b3b = TUnit3D(in_ch, out[5])

    def forward(self, x):
        return torch.cat([
            self.b0(x), self.b1b(self.b1a(x)), self.b2b(self.b2a(x)),
            self.b3b(self.pool(x))], dim=1)


class TInceptionI3d(nn.Module):
    def __init__(self, num_classes=400):
        super().__init__()
        self.Conv3d_1a_7x7 = TUnit3D(3, 64, (7, 7, 7), (2, 2, 2))
        self.pool2a = TMaxPoolSame((1, 3, 3), (1, 2, 2))
        self.Conv3d_2b_1x1 = TUnit3D(64, 64)
        self.Conv3d_2c_3x3 = TUnit3D(64, 192, (3, 3, 3))
        self.pool3a = TMaxPoolSame((1, 3, 3), (1, 2, 2))
        chans = [192, 256, 480, 512, 512, 512, 528, 832, 832]
        names = list(_MIXED)
        self.mixed = nn.ModuleDict()
        for name, in_ch in zip(names, chans):
            self.mixed[name] = TInception(in_ch, _MIXED[name])
        self.pool4a = TMaxPoolSame((3, 3, 3), (2, 2, 2))
        self.pool5a = TMaxPoolSame((2, 2, 2), (2, 2, 2))
        self.logits = TUnit3D(1024, num_classes, use_bn=False, relu=False,
                              bias=True)

    def forward(self, x):
        x = self.Conv3d_1a_7x7(x)
        x = self.pool2a(x)
        x = self.Conv3d_2c_3x3(self.Conv3d_2b_1x1(x))
        x = self.pool3a(x)
        x = self.mixed["Mixed_3b"](x)
        x = self.mixed["Mixed_3c"](x)
        x = self.pool4a(x)
        for k in ("Mixed_4b", "Mixed_4c", "Mixed_4d", "Mixed_4e", "Mixed_4f"):
            x = self.mixed[k](x)
        x = self.pool5a(x)
        x = self.mixed["Mixed_5b"](x)
        x = self.mixed["Mixed_5c"](x)
        x = F.avg_pool3d(x, (2, 7, 7), (1, 1, 1))
        x = self.logits(x)
        return x.mean(dim=(2, 3, 4))

    def flat_state_dict(self):
        sd = {}
        for k, v in self.state_dict().items():
            sd[k.replace("mixed.", "")] = v
        return sd


def test_i3d_random_weight_parity():
    """Random-weight torch InceptionI3d == flax InceptionI3D through the
    importer, on a [-1,1] video at the standard 224x224 protocol shape."""
    torch.manual_seed(0)
    tm = TInceptionI3d().eval()
    # randomize BN stats so frozen-stats handling is actually exercised
    with torch.no_grad():
        for m in tm.modules():
            if isinstance(m, nn.BatchNorm3d):
                m.running_mean.normal_(0, 0.05)
                m.running_var.uniform_(0.5, 1.5)

    rng = np.random.default_rng(0)
    video = rng.uniform(-1, 1, (1, 9, 224, 224, 3)).astype(np.float32)
    with torch.no_grad():
        want = tm(torch.from_numpy(video.transpose(0, 4, 1, 2, 3))).numpy()

    variables = import_i3d(tm.flat_state_dict())
    apply = jax.jit(InceptionI3D().apply)  # eager 3D convs are ~3x slower
    got = np.asarray(apply(variables, jnp.asarray(video)))
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)


def test_frechet_distance():
    rng = np.random.default_rng(0)
    a = rng.standard_normal((600, 8))
    b = rng.standard_normal((600, 8))
    d_same = frechet_distance(a, a)
    assert abs(d_same) < 1e-8
    # identical distributions: small; shifted: ~ ||shift||^2
    assert frechet_distance(a, b) < 0.5
    shift = b + np.array([2.0] + [0.0] * 7)
    d_shift = frechet_distance(a, shift)
    assert 3.0 < d_shift < 5.5


def test_frechet_distance_closed_form():
    """Two exact Gaussians with diagonal covariance: FD = |mu|^2 +
    sum (sqrt(s1) - sqrt(s2))^2."""
    rng = np.random.default_rng(1)
    n = 200_000
    a = rng.standard_normal((n, 2)) * np.array([1.0, 2.0])
    b = rng.standard_normal((n, 2)) * np.array([2.0, 1.0]) + np.array([1.0, 0.0])
    want = 1.0 + (1.0 - 2.0) ** 2 + (2.0 - 1.0) ** 2
    assert abs(frechet_distance(a, b) - want) < 0.1


def test_fvd_weight_gating_and_preprocess():
    fvd = FVD(None)
    assert not fvd.available()
    v = preprocess_video(np.random.default_rng(0).uniform(0, 1, (4, 32, 48, 3)))
    assert v.shape == (4, 224, 224, 3)
    assert v.min() >= -1.0 and v.max() <= 1.0
