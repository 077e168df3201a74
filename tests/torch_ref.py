"""Helpers to instantiate *reference* torch modules (read-only import from
/root/reference) for weight-transfer parity tests, and to run flax modules
with imported weights."""

import argparse
import sys

import numpy as np

sys.path.insert(0, "/root/reference")


def ref_opt(**kw):
    d = dict(norm_G="sync:spectral_batch", pconv="pconv_pbn_woresbias", bn_noise_misc=True)
    d.update(kw)
    return argparse.Namespace(**d)


def to_nhwc(t):
    return np.asarray(t.detach().numpy()).transpose(0, 2, 3, 1)


def to_nchw(a):
    import torch

    return torch.from_numpy(np.asarray(a).transpose(0, 3, 1, 2).copy())
