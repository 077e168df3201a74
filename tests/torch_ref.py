"""Helpers to instantiate *reference* torch modules (read-only import from
/root/reference) for weight-transfer parity tests, and to run flax modules
with imported weights."""

import argparse
import sys

import numpy as np

sys.path.insert(0, "/root/reference")


def assert_close(got, want, rel=2e-4):
    """Allclose with atol scaled to the output magnitude.

    Freshly-initialized spectral norm can leave activations at magnitude
    ~1e3 (sigma estimated from a random u), where a fixed atol of 2e-4 is
    meaningless and near-zero elements (ReLU crossings) fail pure rtol.
    """
    got = np.asarray(got)
    want = np.asarray(want)
    scale = float(max(np.abs(want).max(), 1.0))
    np.testing.assert_allclose(got, want, rtol=rel, atol=rel * scale)


def settle_spectral(module, *args, iters=8):
    """Run a torch module a few train-mode steps so spectral-norm power
    iteration converges (sigma becomes a real spectral norm) before the
    eval-mode parity comparison."""
    import torch

    module.train()
    with torch.no_grad():
        for _ in range(iters):
            module(*args)
    module.eval()


def install_tv_stub():
    """Install a minimal torchvision stub so reference modules that do
    ``from torchvision import models`` at import time (networks.py,
    pretrained_networks.py) can be imported; tests that need real feature
    stacks add their own factories."""
    import types

    if "torchvision" in sys.modules:
        return sys.modules["torchvision"]
    models = types.ModuleType("torchvision.models")
    tv = types.ModuleType("torchvision")
    tv.models = models
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.models"] = models
    return tv


def ref_opt(**kw):
    d = dict(norm_G="sync:spectral_batch", pconv="pconv_pbn_woresbias", bn_noise_misc=True)
    d.update(kw)
    return argparse.Namespace(**d)


def to_nhwc(t):
    return np.asarray(t.detach().numpy()).transpose(0, 2, 3, 1)


def to_nchw(a):
    import torch

    return torch.from_numpy(np.asarray(a).transpose(0, 3, 1, 2).copy())
