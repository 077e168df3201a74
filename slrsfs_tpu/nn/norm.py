"""Normalization layers: BigGAN-style noise-conditioned BN and spectral norm.

Fresh flax.linen implementations of the semantics in reference
``models/layers/normalization.py`` (manual_bn / fused_bn / partial_manual_bn,
LinearNoiseLayer, PartialLinearNoiseLayer). Layout is NHWC; batch statistics
live in the ``batch_stats`` collection; the BigGAN noise vector is drawn from
the ``noise`` RNG stream during training and is all-zero when
``deterministic`` (the reference's ``bn_noise_misc`` flag,
``normalization.py:39-42,75-78``).

SyncBN note: the reference ships a master-slave synchronized BatchNorm
(``models/networks/sync_batchnorm/``) to all-reduce batch statistics across
GPUs. Here batch statistics are plain ``jnp.mean`` reductions — under ``pjit``
over a data-sharded mesh XLA turns these into global (cross-chip) means
automatically, which reproduces SyncBN exactly with zero extra code.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

Array = jax.Array

BN_EPS = 1e-5
BN_MOMENTUM = 0.1


def fused_bn(x, mean, var, gain=None, bias=None, eps=BN_EPS):
    """Reference ``fused_bn`` (normalization.py:219-231): out = x*scale - shift
    with scale = rsqrt(var+eps)*gain, shift = mean*scale - bias."""
    scale = jax.lax.rsqrt(var + eps)
    if gain is not None:
        scale = scale * gain
    shift = mean * scale
    if bias is not None:
        shift = shift - bias
    return x * scale - shift


class ManualBN(nn.Module):
    """BN with manual moments (biased variance) and running stats.

    Equivalent of reference ``bn`` (normalization.py:157-215): training uses
    batch moments computed as E[x^2]-E[x]^2 in float32 and updates running
    stats with momentum 0.1; eval uses the stored stats.
    """

    features: int

    @nn.compact
    def __call__(self, x, gain, bias, train: bool, counts: Optional[Array] = None):
        stored_mean = self.variable(
            "batch_stats", "stored_mean", lambda: jnp.zeros((self.features,))
        )
        stored_var = self.variable(
            "batch_stats", "stored_var", lambda: jnp.ones((self.features,))
        )
        if train:
            xf = x.astype(jnp.float32)
            if counts is None:
                m = jnp.mean(xf, axis=(0, 1, 2))
                m2 = jnp.mean(jnp.square(xf), axis=(0, 1, 2))
            else:
                # partial (mask-aware) moments: sums normalized by mask counts
                # (reference partial_manual_bn, normalization.py:319-340)
                m = jnp.sum(xf, axis=(0, 1, 2)) / (counts + BN_EPS)
                m2 = jnp.sum(jnp.square(xf), axis=(0, 1, 2)) / (counts + BN_EPS)
            var = m2 - jnp.square(m)
            m = m.astype(x.dtype)
            var = var.astype(x.dtype)
            if not self.is_initializing():
                stored_mean.value = stored_mean.value * (1 - BN_MOMENTUM) + m * BN_MOMENTUM
                stored_var.value = stored_var.value * (1 - BN_MOMENTUM) + var * BN_MOMENTUM
            mean_b, var_b = m, var
        else:
            mean_b, var_b = stored_mean.value, stored_var.value
        return fused_bn(x, mean_b, var_b, gain, bias)


class NoiseBN(nn.Module):
    """Reference ``LinearNoiseLayer`` (normalization.py:55-90): per-channel
    BN gain/bias are linear maps of a 20-dim noise vector; gain = 1 + Wg.n,
    bias = Wb.n. With ``deterministic`` the noise is zero so gain=1, bias=0.
    """

    features: int
    noise_sz: int = 20
    spectral: bool = True

    @nn.compact
    def __call__(self, x, train: bool, deterministic: bool,
                 mask_counts: Optional[Array] = None):
        dense = SpectralDense if self.spectral else PlainDense
        gain_l = dense(self.features, name="gain")
        bias_l = dense(self.features, name="bias")
        if deterministic:
            noise = jnp.zeros((x.shape[0], self.noise_sz), x.dtype)
        else:
            noise = jax.random.normal(
                self.make_rng("noise"), (x.shape[0], self.noise_sz), x.dtype
            )
        gain = (1.0 + gain_l(noise, train))[:, None, None, :]
        bias = bias_l(noise, train)[:, None, None, :]
        return ManualBN(self.features, name="bn")(x, gain, bias, train, mask_counts)


class PartialNoiseBN(nn.Module):
    """Reference ``PartialLinearNoiseLayer`` (normalization.py:19-52):
    NoiseBN whose moments are normalized by the valid-mask pixel count.

    ``mask`` is (B, H, W, Cm) with Cm == features or Cm == 1 (channel-uniform
    masks are stored single-channel; the per-channel count is identical).
    """

    features: int
    noise_sz: int = 20
    spectral: bool = True

    @nn.compact
    def __call__(self, x, mask, train: bool, deterministic: bool):
        counts = jnp.sum(mask.astype(jnp.float32), axis=(0, 1, 2))
        if mask.shape[-1] == 1:
            counts = jnp.broadcast_to(counts, (self.features,))
        noise_bn = NoiseBN(self.features, self.noise_sz, self.spectral, name="nbn")
        return noise_bn(x, train, deterministic, mask_counts=counts), mask


def _l2_normalize(v, eps=1e-12):
    return v / (jnp.linalg.norm(v) + eps)


class SpectralWeight(nn.Module):
    """Spectral normalization of an arbitrary-shaped weight.

    Torch-compatible (``torch.nn.utils.spectral_norm``): the weight is
    reshaped to (out, -1) with ``out`` given by ``out_axis``; one power
    iteration per training step updates (u, v) stored in the ``spectral``
    collection; sigma = u^T W v. At eval the stored vectors are reused
    without update, matching torch eval semantics. The .pth importer loads
    torch's ``weight_orig`` / ``weight_u`` / ``weight_v`` directly into this.
    """

    @nn.compact
    def __call__(self, w: Array, out_axis: int, train: bool) -> Array:
        shape = w.shape
        perm = (out_axis,) + tuple(i for i in range(len(shape)) if i != out_axis)
        w_mat = jnp.transpose(w, perm).reshape(shape[out_axis], -1)
        out_dim, in_dim = w_mat.shape
        u_var = self.variable(
            "spectral", "u",
            lambda: _l2_normalize(jax.random.normal(self.make_rng("params"), (out_dim,))),
        )
        v_var = self.variable(
            "spectral", "v",
            lambda: _l2_normalize(jax.random.normal(self.make_rng("params"), (in_dim,))),
        )
        u, v = u_var.value, v_var.value
        if train:
            v = _l2_normalize(jax.lax.stop_gradient(w_mat).T @ u)
            u = _l2_normalize(jax.lax.stop_gradient(w_mat) @ v)
            if not self.is_initializing():
                u_var.value = u
                v_var.value = v
        sigma = jnp.dot(u, w_mat @ v)
        return w / sigma


class PlainDense(nn.Module):
    """Bias-free linear layer (reference get_linear_layer, bias=False)."""

    features: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        k = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (x.shape[-1], self.features),
        )
        return x @ k


class SpectralDense(nn.Module):
    """Spectrally-normalized bias-free linear layer.

    Torch Linear weight is (out, in); ours is (in, out) — the importer
    transposes. ``out_axis=1`` makes sigma match torch's (out, in) reshape.
    """

    features: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        k = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (x.shape[-1], self.features),
        )
        k = SpectralWeight(name="sn")(k, 1, train)
        return x @ k
