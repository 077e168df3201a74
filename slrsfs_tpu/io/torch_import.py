"""PyTorch .pth → flax parameter importer.

Converts reference SLR-SFS checkpoints (state_dict trees described in
SURVEY.md §5.4; written by ``train_animating.py:243-261``) into this
framework's flax variable collections:

* ``params``       — conv kernels (OIHW → HWIO), linear weights ((out,in) →
                     (in,out)), biases;
* ``batch_stats``  — BN ``stored_mean`` / ``stored_var``;
* ``spectral``     — spectral-norm power-iteration vectors ``u`` / ``v``
                     (torch buffers ``weight_u`` / ``weight_v``). The v vector
                     of a conv is reordered from torch's (I·kh·kw) flattening
                     to our (kh·kw·I) flattening; sigma is identical.

Arrays arriving as torch tensors or numpy are normalized to numpy float32.
"""

from __future__ import annotations

from typing import Dict, Mapping, Optional

import numpy as np


def _np(x) -> np.ndarray:
    if hasattr(x, "detach"):
        x = x.detach().cpu().numpy()
    # Always copy: torch buffers (running stats, spectral u/v) are updated
    # in place by later torch forwards and must not alias imported arrays.
    return np.array(x, dtype=np.float32, copy=True)


class KeyReader:
    """Reads a flat torch state_dict with a running record of consumed keys."""

    def __init__(self, sd: Mapping[str, object]):
        self.sd = dict(sd)
        self.used = set()

    def has(self, key: str) -> bool:
        return key in self.sd

    def get(self, key: str) -> np.ndarray:
        self.used.add(key)
        return _np(self.sd[key])

    def unused(self):
        return sorted(set(self.sd) - self.used)


def _j(prefix: str, name: str) -> str:
    return f"{prefix}.{name}" if prefix else name


def conv_params(r: KeyReader, prefix: str, spectral: bool, bias: bool = True) -> Dict:
    """Torch Conv2d (optionally spectral-normalized) → flax Conv subtree."""
    out: Dict = {}
    if spectral:
        w = r.get(_j(prefix, "weight_orig"))  # (O, I, kh, kw)
        u = r.get(_j(prefix, "weight_u"))  # (O,)
        v = r.get(_j(prefix, "weight_v"))  # (I*kh*kw,)
        O, I, kh, kw = w.shape
        out["kernel"] = w.transpose(2, 3, 1, 0)  # HWIO
        out["_sn"] = {"u": u, "v": v.reshape(I, kh, kw).transpose(1, 2, 0).reshape(-1)}
    else:
        w = r.get(_j(prefix, "weight"))
        out["kernel"] = w.transpose(2, 3, 1, 0)
    if bias:
        out["bias"] = r.get(_j(prefix, "bias"))
    return out


def dense_params(r: KeyReader, prefix: str, spectral: bool) -> Dict:
    """Torch Linear (bias-free, optionally spectral) → flax Dense subtree."""
    out: Dict = {}
    if spectral:
        w = r.get(_j(prefix, "weight_orig"))  # (out, in)
        out["kernel"] = w.T
        out["_sn"] = {
            "u": r.get(_j(prefix, "weight_u")),
            "v": r.get(_j(prefix, "weight_v")),
        }
    else:
        out["kernel"] = r.get(_j(prefix, "weight")).T
    return out


def noise_bn(r: KeyReader, prefix: str, spectral: bool, partial: bool) -> Dict:
    """LinearNoiseLayer / PartialLinearNoiseLayer → NoiseBN / PartialNoiseBN."""
    bn_prefix = _j(prefix, "pbn" if partial else "bn")
    sub = {
        "gain": dense_params(r, _j(prefix, "gain"), spectral),
        "bias": dense_params(r, _j(prefix, "bias"), spectral),
        "bn": {
            "stored_mean": r.get(f"{bn_prefix}.stored_mean"),
            "stored_var": r.get(f"{bn_prefix}.stored_var"),
        },
    }
    return {"nbn": sub} if partial else sub


def resnet_block(r: KeyReader, prefix: str, spectral: bool,
                 has_shortcut: bool) -> Dict:
    """Reference ResNet_Block (blocks.py:47-87). ch_a Sequential indices:
    0=bn_noise1, 2=conv_aa, 3=bn_noise2, 5=conv_ab; ch_b.0=conv_b."""
    out = {
        "bn_noise1": noise_bn(r, _j(prefix, "ch_a.0"), spectral, partial=False),
        "conv_aa": conv_params(r, _j(prefix, "ch_a.2"), spectral),
        "bn_noise2": noise_bn(r, _j(prefix, "ch_a.3"), spectral, partial=False),
        "conv_ab": conv_params(r, _j(prefix, "ch_a.5"), spectral),
    }
    if has_shortcut:
        out["conv_b"] = conv_params(r, _j(prefix, "ch_b.0"), spectral)
    return out


def resnet_block_pconv2(r: KeyReader, prefix: str, spectral: bool, partial: bool,
                        has_shortcut: bool, shortcut_bias: bool) -> Dict:
    """Reference ResNet_Block_Pconv2 (blocks.py:173-248); named submodules."""
    out = {
        "bn_noise1": noise_bn(r, _j(prefix, "bn_noise1"), spectral, partial),
        "conv_aa": conv_params(r, _j(prefix, "conv_aa"), spectral),
        "conv_ab": conv_params(r, _j(prefix, "conv_ab"), spectral),
        "bn_noise2": noise_bn(r, _j(prefix, "bn_noise2"), spectral, partial),
    }
    if has_shortcut:
        out["conv_b"] = conv_params(r, _j(prefix, "conv_b"), spectral, bias=shortcut_bias)
    return out


def split_collections(tree: Dict) -> Dict[str, Dict]:
    """Split a mixed tree (with '_sn' and 'bn' leaves) into flax collections.

    Returns {'params': ..., 'batch_stats': ..., 'spectral': ...} matching the
    module structure: '_sn' subtrees become <parent>/sn/{u,v} in 'spectral';
    'bn' stats subtrees land in 'batch_stats' under <parent>/bn/.
    """
    params: Dict = {}
    stats: Dict = {}
    spec: Dict = {}

    def rec(node: Dict, pp: Dict, ps: Dict, pc: Dict):
        for k, v in node.items():
            if k == "_sn":
                pc["sn"] = {"u": v["u"], "v": v["v"]}
            elif k == "bn" and set(v) == {"stored_mean", "stored_var"}:
                ps["bn"] = dict(v)
            elif isinstance(v, dict):
                cp, cs, cc = {}, {}, {}
                rec(v, cp, cs, cc)
                if cp:
                    pp[k] = cp
                if cs:
                    ps[k] = cs
                if cc:
                    pc[k] = cc
            else:
                pp[k] = v

    rec(tree, params, stats, spec)
    return {"params": params, "batch_stats": stats, "spectral": spec}


def strip_module_prefix(sd: Mapping[str, object], prefixes=("module.", "model.")) -> Dict:
    """Drop DataParallel-style prefixes from state_dict keys."""
    out = {}
    for k, v in sd.items():
        for p in prefixes:
            while k.startswith(p):
                k = k[len(p):]
        out[k] = v
    return out


# ---------------------------------------------------------------------------
# Module-level importers (encoder / decoder stacks)
# ---------------------------------------------------------------------------

def _block_shortcut(c_in: int, c_out: int, resample) -> bool:
    return bool(resample) or (c_in != c_out)


def import_encoder(r: KeyReader, prefix: str, opt, in_channels: int = 3,
                   with_z: bool = True, model_type: Optional[str] = None) -> Dict:
    """ResNetEncoder(_with_Z) ``<prefix>.gblocks.{i}`` → flax ``gblock_{i}``.

    Reference: models/networks/architectures.py:121-197.
    """
    from slrsfs_tpu.config import spectral as _sp
    from slrsfs_tpu.nn.archs import get_resnet_arch

    arch = get_resnet_arch(model_type or opt.refine_model_type, opt, in_channels)
    sp = _sp(opt)
    layers = list(arch["layers_enc"])
    if with_z:
        layers[-1] += 1
    tree: Dict = {}
    for i in range(1, len(layers)):
        has_sc = _block_shortcut(layers[i - 1], layers[i], arch["downsample"][i - 1])
        tree[f"gblock_{i - 1}"] = resnet_block(
            r, _j(prefix, f"gblocks.{i - 1}"), sp, has_sc
        )
    return tree


def import_decoder_pconv2(r: KeyReader, prefix: str, opt,
                          model_type: Optional[str] = None,
                          first_width: Optional[int] = None) -> Dict:
    """ResNetDecoderPconv2 ``<prefix>.eblocks.{i}`` → flax ``eblock_{i}``.

    Reference: models/networks/architectures.py:345-375.

    ``first_width`` overrides ``layers_dec[0]`` (the first block's input
    width). The flax decoders infer their input width from the actual tensor,
    which for the SLR fluid decoder is the encoder's feature width
    (``layers_enc[-1]`` = ``out_channel`` in the Layers arch family) rather
    than the table's ``64 + addtional_decoder_input`` — the override keeps the
    block-0 shortcut decision consistent with the live model.
    """
    from slrsfs_tpu.config import partial_bn as _pbn
    from slrsfs_tpu.config import spectral as _sp
    from slrsfs_tpu.config import woresbias as _wrb
    from slrsfs_tpu.nn.archs import get_resnet_arch

    arch = get_resnet_arch(model_type or opt.refine_model_type, opt)
    sp, pbn, wrb = _sp(opt), _pbn(opt), _wrb(opt)
    layers = list(arch["layers_dec"])
    if first_width is not None:
        layers[0] = first_width
    tree: Dict = {}
    for i in range(1, len(layers)):
        has_sc = _block_shortcut(layers[i - 1], layers[i], arch["upsample"][i - 1])
        tree[f"eblock_{i - 1}"] = resnet_block_pconv2(
            r, _j(prefix, f"eblocks.{i - 1}"), sp, pbn, has_sc, shortcut_bias=not wrb
        )
    return tree


def import_decoder_plain(r: KeyReader, prefix: str, opt,
                         model_type: Optional[str] = None,
                         arch_key: str = "refine_model_type") -> Dict:
    """ResNetDecoder / ResNetBGDecoder ``<prefix>.eblocks.{i}`` → ``eblock_{i}``.

    Reference: models/networks/architectures.py:209-260.
    """
    from slrsfs_tpu.config import spectral as _sp
    from slrsfs_tpu.nn.archs import get_resnet_arch

    mt = model_type or getattr(opt, arch_key)
    arch = get_resnet_arch(mt, opt)
    sp = _sp(opt)
    layers = arch["layers_dec"]
    tree: Dict = {}
    for i in range(1, len(layers)):
        has_sc = _block_shortcut(layers[i - 1], layers[i], arch["upsample"][i - 1])
        tree[f"eblock_{i - 1}"] = resnet_block(
            r, _j(prefix, f"eblocks.{i - 1}"), sp, has_sc
        )
    return tree
