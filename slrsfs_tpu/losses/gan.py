"""GAN objectives + discriminator loss wrappers.

Reference ``models/losses/gan_loss.py``: GANLoss (hinge/ls/original/wgan,
:20-118), BaseDiscriminator feeding fake+real in ONE batch (:160-172) with
generator loss = GAN + feature-matching · lambda_feat / num_D (:208-235).
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp

Array = jax.Array


def _gan_scalar(x: Array, target_is_real: bool, for_discriminator: bool,
                mode: str) -> Array:
    if mode == "original":
        t = 1.0 if target_is_real else 0.0
        # binary_cross_entropy_with_logits
        return jnp.mean(
            jnp.maximum(x, 0) - x * t + jnp.log1p(jnp.exp(-jnp.abs(x)))
        )
    if mode == "ls":
        t = 1.0 if target_is_real else 0.0
        return jnp.mean(jnp.square(x - t))
    if mode == "hinge":
        if for_discriminator:
            if target_is_real:
                return -jnp.mean(jnp.minimum(x - 1.0, 0.0))
            return -jnp.mean(jnp.minimum(-x - 1.0, 0.0))
        assert target_is_real, "generator hinge loss aims for real"
        return -jnp.mean(x)
    # wgan
    return -jnp.mean(x) if target_is_real else jnp.mean(x)


def gan_loss(pred, target_is_real: bool, for_discriminator: bool,
             mode: str = "hinge") -> Array:
    """Handles multiscale list-of-lists input (gan_loss.py:102-118):
    per-scale loss on the LAST output, averaged over scales."""
    if isinstance(pred, (list, tuple)):
        total = 0.0
        for p in pred:
            if isinstance(p, (list, tuple)):
                p = p[-1]
            total = total + _gan_scalar(p, target_is_real, for_discriminator, mode)
        return total / len(pred)
    return _gan_scalar(pred, target_is_real, for_discriminator, mode)


def discriminate(d_model, d_vars, fake: Array, real: Array, train: bool
                 ) -> Tuple[List[List[Array]], List[List[Array]]]:
    """Concatenate fake+real in one batch (shared BN-style statistics,
    gan_loss.py:160-172) and split predictions."""
    both = jnp.concatenate([fake, real], axis=0)
    out = d_model.apply(d_vars, both, train)
    b = fake.shape[0]
    pred_fake = [[t[:b] for t in scale] for scale in out]
    pred_real = [[t[b:] for t in scale] for scale in out]
    return pred_fake, pred_real


def generator_gan_losses(d_model, d_vars, fake: Array, real: Array,
                         gan_mode: str, lambda_feat: float,
                         feat_matching: bool = True,
                         train: bool = True) -> Dict[str, Array]:
    """gan_loss.py:208-235."""
    pred_fake, pred_real = discriminate(d_model, d_vars, fake, real, train)
    out: Dict[str, Array] = {}
    out["GAN"] = gan_loss(pred_fake, True, False, gan_mode)
    total = out["GAN"]
    if feat_matching:
        num_d = len(pred_fake)
        feat = 0.0
        for i in range(num_d):
            for j in range(len(pred_fake[i]) - 1):
                feat = feat + jnp.mean(
                    jnp.abs(pred_fake[i][j] - jax.lax.stop_gradient(pred_real[i][j]))
                ) * lambda_feat / num_d
        out["GAN_Feat"] = feat
        total = total + feat
    out["Total Loss"] = total
    return out


def discriminator_losses(d_model, d_vars, fake: Array, real: Array,
                         gan_mode: str, train: bool = True) -> Dict[str, Array]:
    """gan_loss.py:190-206 (fake is detached by the caller via stop_gradient)."""
    fake = jax.lax.stop_gradient(fake)
    pred_fake, pred_real = discriminate(d_model, d_vars, fake, real, train)
    out: Dict[str, Array] = {}
    out["D_Fake"] = gan_loss(pred_fake, False, True, gan_mode)
    out["D_real"] = gan_loss(pred_real, True, True, gan_mode)
    out["Total Loss"] = out["D_Fake"] + out["D_real"]
    return out
