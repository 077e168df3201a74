"""pix2pixHD networks: GlobalGenerator, LocalEnhancer, and the 'origin'
multiscale discriminator.

Fresh NHWC/flax equivalents of reference ``models/networks/networks.py``:

* ``GlobalGenerator``  — :186-215 (reflect-pad 7x7 stem, strided downs,
  9 residual blocks, transposed-conv ups, 7x7 Tanh head; InstanceNorm
  affine=False)
* ``LocalEnhancer``    — :132-184 (global trunk minus its 3 head layers on a
  2x-downsampled pyramid + per-level local enhancer branches)
* ``OriginMultiscaleDiscriminator`` — :295-335 + NLayerDiscriminator
  :337-383 with getIntermFeat=False (one output per scale; feature matching
  is naturally skipped by the loss because no intermediates are returned)

Selected by ``--discriminator_losses pix2pixHDorigin``
(models/losses/gan_loss.py:127-144, input_nc=2 motion fields, num_D=2,
n_layers=3, instance norm). No shipped script trains with these, but they are
live code in the reference registry, so they are available here.
"""

from __future__ import annotations

from typing import List, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

Array = jax.Array


def reflect_pad(x: Array, p: int) -> Array:
    return jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)), mode="reflect")


def instance_norm(x: Array, eps: float = 1e-5) -> Array:
    """torch InstanceNorm2d(affine=False, track_running_stats=False):
    per-sample, per-channel spatial moments in train AND eval."""
    m = jnp.mean(x, axis=(1, 2), keepdims=True)
    v = jnp.mean(jnp.square(x - m), axis=(1, 2), keepdims=True)
    return (x - m) * jax.lax.rsqrt(v + eps)


class ConvHD(nn.Module):
    """Plain conv, torch-initialization-agnostic (weights_init N(0, 0.02) is
    an init-time detail; importers overwrite params anyway)."""

    features: int
    kernel: int
    stride: int = 1
    padding: int = 0

    @nn.compact
    def __call__(self, x: Array) -> Array:
        k = self.param(
            "kernel",
            nn.initializers.normal(0.02),
            (self.kernel, self.kernel, x.shape[-1], self.features),
        )
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        return jax.lax.conv_general_dilated(
            x, k, (self.stride, self.stride),
            [(self.padding, self.padding)] * 2,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + b


class ConvTransposeHD(nn.Module):
    """torch ConvTranspose2d(kernel=3, stride=2, padding=1,
    output_padding=1): expressed as an input-dilated conv with the flipped
    kernel — pad (k-1-p)=1 before, (k-1-p+op)=2 after, lhs_dilation=s."""

    features: int
    kernel: int = 3
    stride: int = 2
    padding: int = 1
    output_padding: int = 1

    @nn.compact
    def __call__(self, x: Array) -> Array:
        k = self.param(
            "kernel",
            nn.initializers.normal(0.02),
            (self.kernel, self.kernel, x.shape[-1], self.features),
        )
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        lo = self.kernel - 1 - self.padding
        hi = lo + self.output_padding
        kf = jnp.flip(k, axis=(0, 1))
        return jax.lax.conv_general_dilated(
            x, kf, (1, 1), [(lo, hi), (lo, hi)],
            lhs_dilation=(self.stride, self.stride),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + b


class ResnetBlockHD(nn.Module):
    """networks.py:217-257, padding_type='reflect', no dropout."""

    dim: int

    @nn.compact
    def __call__(self, x: Array) -> Array:
        h = reflect_pad(x, 1)
        h = ConvHD(self.dim, 3, name="conv1")(h)
        h = jax.nn.relu(instance_norm(h))
        h = reflect_pad(h, 1)
        h = ConvHD(self.dim, 3, name="conv2")(h)
        h = instance_norm(h)
        return x + h


class _GlobalTrunk(nn.Module):
    """GlobalGenerator body up to (but excluding) the final
    [reflect-pad, 7x7 conv, tanh] head (used whole by GlobalGenerator,
    headless by LocalEnhancer, networks.py:139-141)."""

    ngf: int
    n_downsampling: int = 3
    n_blocks: int = 9

    @nn.compact
    def __call__(self, x: Array) -> Array:
        h = reflect_pad(x, 3)
        h = jax.nn.relu(instance_norm(ConvHD(self.ngf, 7, name="stem")(h)))
        for i in range(self.n_downsampling):
            mult = 2 ** i
            h = ConvHD(self.ngf * mult * 2, 3, 2, 1, name=f"down{i}")(h)
            h = jax.nn.relu(instance_norm(h))
        for i in range(self.n_blocks):
            h = ResnetBlockHD(self.ngf * 2 ** self.n_downsampling,
                              name=f"block{i}")(h)
        for i in range(self.n_downsampling):
            mult = 2 ** (self.n_downsampling - i)
            h = ConvTransposeHD(self.ngf * mult // 2, name=f"up{i}")(h)
            h = jax.nn.relu(instance_norm(h))
        return h


class GlobalGenerator(nn.Module):
    """networks.py:186-215."""

    out_channels: int = 3
    ngf: int = 64
    n_downsampling: int = 3
    n_blocks: int = 9

    @nn.compact
    def __call__(self, x: Array) -> Array:
        h = _GlobalTrunk(self.ngf, self.n_downsampling, self.n_blocks,
                         name="trunk")(x)
        h = reflect_pad(h, 3)
        return jnp.tanh(ConvHD(self.out_channels, 7, name="head")(h))


def _avgpool_3x3s2_nopad_count(x: Array) -> Array:
    """torch AvgPool2d(3, stride=2, padding=1, count_include_pad=False)."""
    s = jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, 3, 3, 1), (1, 2, 2, 1),
        [(0, 0), (1, 1), (1, 1), (0, 0)],
    )
    ones = jnp.ones(x.shape[:3] + (1,), x.dtype)
    cnt = jax.lax.reduce_window(
        ones, 0.0, jax.lax.add, (1, 3, 3, 1), (1, 2, 2, 1),
        [(0, 0), (1, 1), (1, 1), (0, 0)],
    )
    return s / cnt


class LocalEnhancer(nn.Module):
    """networks.py:132-184 with n_local_enhancers=1."""

    out_channels: int = 3
    ngf: int = 32
    n_downsample_global: int = 3
    n_blocks_global: int = 9
    n_blocks_local: int = 3

    @nn.compact
    def __call__(self, x: Array) -> Array:
        x_down = _avgpool_3x3s2_nopad_count(x)
        # coarsest level: headless global trunk at 2x ngf
        prev = _GlobalTrunk(self.ngf * 2, self.n_downsample_global,
                            self.n_blocks_global, name="global")(x_down)
        # local enhancer branch at full resolution
        h = reflect_pad(x, 3)
        h = jax.nn.relu(instance_norm(ConvHD(self.ngf, 7, name="l_stem")(h)))
        h = ConvHD(self.ngf * 2, 3, 2, 1, name="l_down")(h)
        h = jax.nn.relu(instance_norm(h))
        h = h + prev
        for i in range(self.n_blocks_local):
            h = ResnetBlockHD(self.ngf * 2, name=f"l_block{i}")(h)
        h = ConvTransposeHD(self.ngf, name="l_up")(h)
        h = jax.nn.relu(instance_norm(h))
        h = reflect_pad(h, 3)
        return jnp.tanh(ConvHD(self.out_channels, 7, name="l_head")(h))


class _OriginNLayerD(nn.Module):
    """networks.py:337-383, getIntermFeat=False, instance norm."""

    ndf: int = 64
    n_layers: int = 3

    @nn.compact
    def __call__(self, x: Array) -> Array:
        h = ConvHD(self.ndf, 4, 2, 2, name="conv0")(x)
        h = jax.nn.leaky_relu(h, 0.2)
        nf = self.ndf
        for n in range(1, self.n_layers):
            nf = min(nf * 2, 512)
            h = ConvHD(nf, 4, 2, 2, name=f"conv{n}")(h)
            h = jax.nn.leaky_relu(instance_norm(h), 0.2)
        nf = min(nf * 2, 512)
        h = ConvHD(nf, 4, 1, 2, name=f"conv{self.n_layers}")(h)
        h = jax.nn.leaky_relu(instance_norm(h), 0.2)
        return ConvHD(1, 4, 1, 2, name=f"conv{self.n_layers + 1}")(h)


# ---------------------------------------------------------------------------
# Torch importers (positional: InstanceNorm affine=False has no params, so
# the conv parameters appear in state_dict in exactly forward order)
# ---------------------------------------------------------------------------

def _np32(t):
    import numpy as np

    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t, np.float32)


def _conv_prefixes_in_order(sd, root: str) -> List[str]:
    seen: List[str] = []
    for k in sd:
        if k.startswith(root) and k.endswith(".weight"):
            p = k[: -len(".weight")]
            if p not in seen:
                seen.append(p)
    return seen


def _conv_entry(sd, p: str, transposed: bool = False):
    w = _np32(sd[p + ".weight"])
    if transposed:  # torch ConvTranspose2d (in, out, kh, kw) -> HWIO
        k = w.transpose(2, 3, 0, 1)
    else:  # torch Conv2d (out, in, kh, kw) -> HWIO
        k = w.transpose(2, 3, 1, 0)
    return {"kernel": k, "bias": _np32(sd[p + ".bias"])}


def _trunk_names(n_downsampling: int, n_blocks: int):
    names = [("stem", False)]
    names += [(f"down{i}", False) for i in range(n_downsampling)]
    for i in range(n_blocks):
        names += [(f"block{i}/conv1", False), (f"block{i}/conv2", False)]
    names += [(f"up{i}", True) for i in range(n_downsampling)]
    return names


def _fill(tree, name, entry):
    if "/" in name:
        b, c = name.split("/")
        tree.setdefault(b, {})[c] = entry
    else:
        tree[name] = entry


def import_global_generator(sd, root: str = "model",
                            n_downsampling: int = 3, n_blocks: int = 9):
    """torch GlobalGenerator state_dict -> GlobalGenerator variables."""
    ps = _conv_prefixes_in_order(sd, root + ".")
    names = _trunk_names(n_downsampling, n_blocks) + [("head", False)]
    assert len(ps) == len(names), (len(ps), len(names))
    trunk: dict = {}
    out: dict = {"trunk": trunk}
    for p, (name, tr) in zip(ps, names):
        e = _conv_entry(sd, p, tr)
        if name == "head":
            out["head"] = e
        else:
            _fill(trunk, name, e)
    return {"params": out}


def import_local_enhancer(sd, n_downsample_global: int = 3,
                          n_blocks_global: int = 9, n_blocks_local: int = 3):
    """torch LocalEnhancer (n_local_enhancers=1) -> LocalEnhancer variables.

    Torch subtrees: ``model`` (headless global trunk), ``model1_1``
    (downsample branch), ``model1_2`` (local blocks + up + head)."""
    g: dict = {}
    for p, (name, tr) in zip(
        _conv_prefixes_in_order(sd, "model."),
        _trunk_names(n_downsample_global, n_blocks_global),
    ):
        _fill(g, name, _conv_entry(sd, p, tr))
    params: dict = {"global": g}

    d_ps = _conv_prefixes_in_order(sd, "model1_1.")
    assert len(d_ps) == 2, d_ps
    params["l_stem"] = _conv_entry(sd, d_ps[0])
    params["l_down"] = _conv_entry(sd, d_ps[1])

    u_ps = _conv_prefixes_in_order(sd, "model1_2.")
    names = []
    for i in range(n_blocks_local):
        names += [(f"l_block{i}/conv1", False), (f"l_block{i}/conv2", False)]
    names += [("l_up", True), ("l_head", False)]
    assert len(u_ps) == len(names), (u_ps, names)
    for p, (name, tr) in zip(u_ps, names):
        _fill(params, name, _conv_entry(sd, p, tr))
    return {"params": params}


def import_origin_discriminator(sd, num_D: int = 2, n_layers: int = 3):
    """torch MultiscaleDiscriminator (getIntermFeat=False) ->
    OriginMultiscaleDiscriminator variables (torch subtrees layer{i}.model)."""
    params: dict = {}
    for i in range(num_D):
        sub: dict = {}
        ps = _conv_prefixes_in_order(sd, f"layer{i}.")
        assert len(ps) == n_layers + 2, ps
        for n, p in enumerate(ps):
            sub[f"conv{n}"] = _conv_entry(sd, p)
        params[f"layer{i}"] = sub
    return {"params": params}


class OriginMultiscaleDiscriminator(nn.Module):
    """networks.py:295-335; returns [[out_scale_i]] so the shared GAN-loss
    protocol applies (no intermediate features -> feature matching is a
    no-op, matching getIntermFeat=False)."""

    ndf: int = 64
    n_layers: int = 3
    num_D: int = 2

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> List[List[Array]]:
        outs = []
        h = x
        # reference applies layer{num_D-1-i} to progressively downsampled
        # input (finest discriminator first on the full-res input)
        for i in range(self.num_D):
            d = _OriginNLayerD(self.ndf, self.n_layers,
                               name=f"layer{self.num_D - 1 - i}")
            outs.append([d(h)])
            if i != self.num_D - 1:
                h = _avgpool_3x3s2_nopad_count(h)
        return outs
