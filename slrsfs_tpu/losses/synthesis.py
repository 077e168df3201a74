"""Reconstruction/perceptual losses (reference ``models/losses/synthesis.py``).

``SynthesisLoss`` parses the reference's ``--losses '1.0_l1' '10.0_content'``
strings, auto-appends PSNR/SSIM metrics (synthesis.py:61-109), and returns a
loss dict with "Total Loss" — functional style: the VGG features module and
its params are passed in, keeping everything jit-friendly.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from slrsfs_tpu.losses.ssim import ssim
from slrsfs_tpu.nn.vgg import VGG19Features

Array = jax.Array

PERCEPTUAL_WEIGHTS = (1.0 / 32, 1.0 / 16, 1.0 / 8, 1.0 / 4, 1.0)


def l1(pred: Array, gt: Array) -> Array:
    return jnp.mean(jnp.abs(pred - gt))


def psnr(pred: Array, gt: Array) -> Array:
    """Reference PSNR (synthesis.py:113-122): MSE summed over channels."""
    bs = pred.shape[0]
    mse = jnp.mean(
        jnp.sum(jnp.square(pred - gt), axis=-1).reshape(bs, -1), axis=1
    )
    return jnp.mean(10.0 * jnp.log10(1.0 / mse))


def perceptual(vgg: VGG19Features, vgg_vars, pred: Array, gt: Array) -> Array:
    """VGG19 5-slice weighted L1 (synthesis.py:166-185)."""
    pf = vgg.apply(vgg_vars, pred)
    gf = vgg.apply(vgg_vars, jax.lax.stop_gradient(gt))
    loss = 0.0
    for w, p, g in zip(PERCEPTUAL_WEIGHTS, pf, gf):
        loss = loss + w * jnp.mean(jnp.abs(p - g))
    return loss


def _gram(x: Array) -> Array:
    b, h, w, c = x.shape
    f = x.reshape(b, h * w, c)
    return jnp.einsum("bnc,bnd->bcd", f, f) / (c * h * w)


def style(vgg: VGG19Features, vgg_vars, pred: Array, gt: Array) -> Array:
    """Gram-matrix MSE (synthesis.py:187-233)."""
    pf = vgg.apply(vgg_vars, pred)
    gf = vgg.apply(vgg_vars, jax.lax.stop_gradient(gt))
    loss = 0.0
    for w, p, g in zip(PERCEPTUAL_WEIGHTS, pf, gf):
        loss = loss + w * jnp.mean(jnp.square(_gram(p) - jax.lax.stop_gradient(_gram(g))))
    return loss


class SynthesisLoss:
    """Combiner for '--losses λ_name' strings + PSNR/SSIM metrics."""

    def __init__(self, losses: Sequence[str], vgg: Optional[VGG19Features] = None,
                 vgg_vars=None, subname: str = ""):
        self.pairs: list[Tuple[float, str]] = []
        for s in losses:
            lam, name = s.split("_")
            self.pairs.append((float(lam), name))
        self.vgg = vgg
        self.vgg_vars = vgg_vars
        self.subname = subname

    def __call__(self, pred: Array, gt: Array) -> Dict[str, Array]:
        out: Dict[str, Array] = {}
        total = None
        for lam, name in self.pairs:
            if name == "l1":
                v = l1(pred, gt)
                out["L1" + self.subname] = v
            elif name == "content":
                v = perceptual(self.vgg, self.vgg_vars, pred, gt)
                out["Perceptual" + self.subname] = v
            elif name == "style":
                v = style(self.vgg, self.vgg_vars, pred, gt)
                out["Style" + self.subname] = v
            else:
                raise ValueError(f"unknown synthesis loss: {name}")
            # reference quirk preserved: the FIRST contributing loss enters
            # Total without its lambda (synthesis.py:98-105)
            total = v if total is None else total + lam * v
        if total is None:
            total = jnp.asarray(0.0)
        out["psnr" + self.subname] = psnr(pred, gt)
        out["ssim" + self.subname] = ssim(pred, gt)
        out["Total Loss"] = total
        return out


def end_point_error(pred_motion: Array, gt_motion: Array) -> Array:
    """Mean L2 norm; 3-channel uv·m motion folded (synthesis.py:147-160).
    NHWC: channels last."""

    def fold(m):
        if m.shape[-1] == 3:
            return m[..., :2] * m[..., 2:3]
        return m

    d = fold(pred_motion) - fold(gt_motion)
    return jnp.mean(jnp.linalg.norm(d, axis=-1))


class MotionLoss:
    """Reference MotionLoss (synthesis.py:11-58): 'λ_MotionL1' / 'λ_EndPointError'."""

    def __init__(self, losses: Sequence[str]):
        self.pairs = [(float(s.split("_")[0]), s.split("_")[1]) for s in losses]

    def __call__(self, pred_motion: Array, gt_motion: Array) -> Dict[str, Array]:
        out: Dict[str, Array] = {}
        total = 0.0
        for lam, name in self.pairs:
            if name == "MotionL1":
                v = l1(pred_motion, gt_motion)
                out["MotionL1"] = v
            elif name == "EndPointError":
                v = end_point_error(pred_motion, gt_motion)
                out["EndPointError"] = v
            else:
                raise ValueError(f"unknown motion loss: {name}")
            total = total + lam * v
        out["Total Loss"] = total
        return out
