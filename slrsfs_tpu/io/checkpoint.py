"""Checkpoint I/O: reference .pth import + native orbax checkpoints.

Reference checkpoint layout (SURVEY.md §5.4; ``train_animating.py:243-261``):
``{state_dict, optimizerG, [optimizerD], epoch, opts}`` where state_dict keys
carry ``model.module.`` (BaseModel + DataParallel) prefixes; hyperparameters
travel INSIDE the checkpoint as a pickled argparse namespace and are restored
at inference (``test_baseline_4eval.py:124-127``).

Import surgery supported (reference key maps):
* ``xyzs`` / ``ones`` / ``Z_predictor`` keys dropped (train_animating.py:416-423)
* ``motion_predictor`` → ``motion_regressor.motion_predictor``
  (train_animating_fixmotion.py:438-446)
* the pretrained VGG19 of the loss function is harvested from
  ``loss_function.losses.*.model.slice*`` so perceptual loss/eval run at
  parity without torchvision.

Native checkpoints use orbax (atomic finalization replaces the reference's
tmp-file + os.rename dance) and store the Options dataclass as JSON alongside.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, Dict, Mapping, Optional

import numpy as np

from slrsfs_tpu.config import Options
from slrsfs_tpu.io.torch_import import (
    KeyReader,
    conv_params,
    import_decoder_plain,
    import_decoder_pconv2,
    import_encoder,
    split_collections,
    strip_module_prefix,
)


# ---------------------------------------------------------------------------
# Reference .pth → flax
# ---------------------------------------------------------------------------

def load_torch_checkpoint(path: str) -> Dict[str, Any]:
    import torch

    return torch.load(path, map_location="cpu", weights_only=False)


def opts_from_namespace(ns) -> Options:
    """argparse.Namespace (pickled in the checkpoint) → typed Options."""
    known = {f.name for f in dataclasses.fields(Options)}
    kw = {}
    for k, v in vars(ns).items():
        if k in known:
            if isinstance(v, list):
                v = tuple(v)
            kw[k] = v
    return Options(**kw)


_DROP_KEYS = ("xyzs", "ones", "Z_predictor", "min_z", "max_z", "discretized_zs")


def _clean_state_dict(sd: Mapping) -> Dict:
    sd = strip_module_prefix(sd, prefixes=("model.", "module."))
    out = {}
    for k, v in sd.items():
        if any(part in _DROP_KEYS for part in k.split(".")):
            continue
        # fix-motion stage remap (train_animating_fixmotion.py:438-446)
        if k.startswith("motion_predictor."):
            k = "motion_regressor." + k
        out[k] = v
    return out


def import_baseline_model(sd: Mapping, opt: Options) -> Dict[str, Dict]:
    """state_dict → BaselineModel variables ({'params','batch_stats','spectral'})."""
    from slrsfs_tpu.nn.archs import get_resnet_arch

    r = KeyReader(_clean_state_dict(sd))
    # live decode input = full encoder feature width (== layers_dec[0] for
    # every reference-shipped config; differs in the Layers family, where the
    # table understates it as 64 + addtional_decoder_input)
    fs_w = get_resnet_arch(opt.refine_model_type, opt, 3)["layers_enc"][-1]
    tree = {
        "encoder": import_encoder(r, "encoder", opt, in_channels=3, with_z=True),
        "projector": import_decoder_pconv2(r, "projector", opt,
                                           first_width=fs_w),
    }
    return split_collections(tree)


def merge_stage3_state_dict(sd_baseline: Mapping, sd_bg: Mapping = None,
                            sd_motion: Mapping = None) -> Dict:
    """Assemble the SLR stage-3 warm-start state_dict the way the reference
    joint driver does (train_animating_alpha_2layers_joint_finetuneBGFluid_L1
    .py:430-462): start from the stage-1 fluid checkpoint, overlay the
    stage-2 BG checkpoint's ``net_bg.*`` keys, and optionally a motion
    checkpoint with the ``motion_predictor`` →
    ``motion_regressor.motion_predictor`` remap (:445-449). Submodules with
    no keys in any source — the fresh alpha nets — are simply absent; pass
    the trainer's random init as ``fallback`` to :func:`import_slr_model`
    (reference equivalent: ``state_dict.update(pretrained_dict)`` over the
    model's own init)."""
    out = dict(strip_module_prefix(sd_baseline, prefixes=("model.", "module.")))
    if sd_bg is not None:
        bg = strip_module_prefix(sd_bg, prefixes=("model.", "module."))
        out.update({k: v for k, v in bg.items() if "net_bg" in k})
    if sd_motion is not None:
        mo = strip_module_prefix(sd_motion, prefixes=("model.", "module."))
        for k, v in mo.items():
            if "motion_predictor" in k and "motion_regressor" not in k:
                out["motion_regressor." + k] = v
    return out


def import_slr_model(sd: Mapping, opt: Options,
                     fallback: Dict[str, Dict] = None) -> Dict[str, Dict]:
    """state_dict → SLRModel variables.

    With ``fallback`` (freshly initialized SLR variables), submodules whose
    keys are absent from ``sd`` keep the fallback values — this is how the
    reference stage-3 driver warm-starts: the alpha nets stay at random init
    while fluid/bg come from earlier stages (``state_dict.update``,
    train_animating_alpha_2layers_joint_finetuneBGFluid_L1.py:436-462)."""
    from slrsfs_tpu.models.slr import _alpha_opt, alpha_in_channels
    from slrsfs_tpu.nn.archs import get_resnet_arch

    r = KeyReader(_clean_state_dict(sd))
    a_opt = _alpha_opt(opt)

    # The live SLR packs the FULL encoder feature tensor through the splat,
    # so the fluid decoder's first block sees layers_enc[-1] channels
    # (= out_channel in the Layers family, = 64 in the reference's shipped
    # 8UpDown64 SLR configs where the two coincide); the alpha decoder sees
    # [gen_fs, warped_alpha] (slr.py decode_alpha input variants).
    fs_w = get_resnet_arch(opt.refine_model_type, opt, 3)["layers_enc"][-1]
    amt = opt.alpha_refine_model_type
    alpha_in = 1 if "decouple" in amt else (4 if "image" in amt else fs_w + 1)

    def have(prefix):
        return any(k.startswith(prefix + ".") for k in r.sd)

    builders = {
        "encoder": lambda: import_encoder(r, "encoder", opt, in_channels=3,
                                          with_z=True),
        "projector": lambda: import_decoder_pconv2(r, "projector", opt,
                                                   first_width=fs_w),
        "net_bg": lambda: import_decoder_plain(
            r, "net_bg", opt, model_type=opt.bg_refine_model_type),
        "net_alpha_encoder": lambda: import_encoder(
            r, "net_alpha_encoder", a_opt,
            in_channels=alpha_in_channels(opt), with_z=False),
        "net_alpha_decoder": lambda: import_decoder_pconv2(
            r, "net_alpha_decoder", a_opt, first_width=alpha_in),
    }
    missing = [name for name in builders if not have(name)]
    if missing and fallback is None:
        raise KeyError(f"state_dict lacks submodules {missing} and no "
                       "fallback init was provided")
    cols = split_collections({name: fn() for name, fn in builders.items()
                              if name not in missing})
    for name in missing:
        for col in ("params", "batch_stats", "spectral"):
            sub = fallback.get(col, {})
            if name in sub:
                cols.setdefault(col, {})[name] = sub[name]
    return cols


def import_embedded_baseline(sd: Mapping, opt: Options,
                             fallback: Dict[str, Dict] = None
                             ) -> Dict[str, Dict]:
    """state_dict → BaselineMotionTrainable variables (baseline encoder/
    projector + embedded ``motion_regressor``).

    Mirrors the reference fix-motion warm-start
    (train_animating_fixmotion.py:438-450): the fluid nets come from the
    baseline checkpoint; the motion subtree comes from merged
    ``motion_regressor.*`` keys when present, else keeps ``fallback``'s
    fresh init."""
    from slrsfs_tpu.models.motion import resolved_motion_model_type

    cols = import_baseline_model(sd, opt)
    clean = _clean_state_dict(sd)
    if any(k.startswith("motion_regressor.") for k in clean):
        m_opt = opt.replace(model_type=resolved_motion_model_type(opt))
        mcols = import_motion_model(sd, m_opt)
        for col in ("params", "batch_stats", "spectral"):
            if mcols.get(col):
                cols.setdefault(col, {})["motion_regressor"] = mcols[col]
    elif fallback is not None:
        for col in ("params", "batch_stats", "spectral"):
            sub = fallback.get(col, {})
            if "motion_regressor" in sub:
                cols.setdefault(col, {})["motion_regressor"] = \
                    sub["motion_regressor"]
    else:
        raise KeyError("state_dict lacks motion_regressor keys and no "
                       "fallback init was provided")
    return cols


def import_bg_model(sd: Mapping, opt: Options) -> Dict[str, Dict]:
    r = KeyReader(_clean_state_dict(sd))
    tree = {"net_bg": import_decoder_plain(r, "net_bg", opt,
                                           model_type=opt.bg_refine_model_type)}
    return split_collections(tree)


def _import_nlayer_d(r: KeyReader, prefix: str, opt: Options) -> Dict:
    out = {
        "model0_conv": conv_params(r, f"{prefix}.model0.0", spectral=False),
    }
    for n in range(1, opt.n_layers_D):
        out[f"model{n}_conv"] = conv_params(
            r, f"{prefix}.model{n}.0.0", spectral=True, bias=False)
    out[f"model{opt.n_layers_D}_conv"] = conv_params(
        r, f"{prefix}.model{opt.n_layers_D}.0", spectral=False)
    return out


def import_discriminator(sd: Mapping, opt: Options,
                         prefix: str = "netD.netD") -> Dict[str, Dict]:
    """MultiscaleDiscriminator import (reference keys
    ``netD.netD.discriminator_{i}.model{n}...``; the norm wrapper nests the
    spectral conv as ``.0.0``)."""
    r = KeyReader(strip_module_prefix(sd, prefixes=("model.", "module.")))
    tree = {}
    for i in range(opt.num_D):
        tree[f"discriminator_{i}"] = _import_nlayer_d(
            r, f"{prefix}.discriminator_{i}", opt)
    return split_collections(tree)


def import_vgg_from_checkpoint(sd: Mapping) -> Optional[Dict]:
    """Harvest the pretrained VGG19 from the checkpoint's loss-function keys
    (``loss_function.losses.{i}.model.slice{s}.{j}.weight``) → VGG19Features
    params. Returns None if absent."""
    from slrsfs_tpu.nn.vgg import _CONVS

    sd = strip_module_prefix(sd, prefixes=("model.", "module."))
    # find any loss_function prefix that has VGG slices
    cand = [k for k in sd if "slice1.0.weight" in k]
    if not cand:
        return None
    base = cand[0].rsplit("slice1.0.weight", 1)[0]
    # torchvision layer index -> (slice number, in-slice index)
    slice_ranges = [(1, 0, 2), (2, 2, 7), (3, 7, 12), (4, 12, 21), (5, 21, 30)]
    params = {}
    for li, _ch in _CONVS:
        for s, lo, hi in slice_ranges:
            if lo <= li < hi:
                key = f"{base}slice{s}.{li}.weight"
                w = sd[key]
                b = sd[f"{base}slice{s}.{li}.bias"]
                if hasattr(w, "detach"):
                    w = w.detach().cpu().numpy()
                    b = b.detach().cpu().numpy()
                params[f"conv_{li}"] = {
                    "kernel": np.array(w, np.float32).transpose(2, 3, 1, 0),
                    "bias": np.array(b, np.float32),
                }
                break
    return {"params": params}


def import_motion_model(sd: Mapping, opt: Options) -> Dict[str, Dict]:
    """SPADEUnetMaskMotion / UnetMotion state_dict → MotionRegressor variables."""
    r = KeyReader(_clean_state_dict(sd))
    p = "motion_regressor.motion_predictor" if any(
        k.startswith("motion_regressor.") for k in r.sd
    ) else "motion_predictor"
    spade = "SPADE" in opt.model_type
    tree: Dict = {}
    for i in range(1, 9):
        tree[f"conv{i}"] = conv_params(r, f"{p}.conv{i}", spectral=True)
        tree[f"dconv{i}"] = conv_params(r, f"{p}.dconv{i}", spectral=True)
    if spade:
        names = (["spade_layer", "spade_layer2_0", "spade_layer2_1",
                  "spade_layer4_0", "spade_layer4_1"]
                 + [f"spade_layer8_{i}" for i in range(8)])
        for n in names:
            tree[n] = {
                "mlp_shared": conv_params(r, f"{p}.{n}.mlp_shared.0", spectral=False),
                "mlp_gamma": conv_params(r, f"{p}.{n}.mlp_gamma", spectral=False),
                "mlp_beta": conv_params(r, f"{p}.{n}.mlp_beta", spectral=False),
            }
    cols = split_collections({"motion_predictor": tree})
    return cols


def import_checkpoint(path: str, model_type: Optional[str] = None):
    """Full import: returns (variables, Options) for the checkpointed model.

    model_type override follows the reference pattern of reading opts from
    the checkpoint then adjusting (test_baseline_4eval.py:124-127)."""
    ckpt = load_torch_checkpoint(path)
    opt = opts_from_namespace(ckpt["opts"]) if "opts" in ckpt else Options()
    opt = opt.replace(bn_noise_misc=True)
    if model_type:
        opt = opt.replace(model_type=model_type)
    sd = ckpt["state_dict"] if "state_dict" in ckpt else ckpt
    if opt.model_type == "softmax_splating":
        variables = import_baseline_model(sd, opt)
    elif opt.model_type == "softmax_splating_2layers_alpha_seperate":
        variables = import_slr_model(sd, opt)
    elif opt.model_type in ("SPADE_unet_mask_motion", "unet_motion"):
        variables = import_motion_model(sd, opt)
    elif opt.model_type == "bg":
        variables = import_bg_model(sd, opt)
    else:
        raise ValueError(opt.model_type)
    return variables, opt


# ---------------------------------------------------------------------------
# Torch optimizer-state import (Adam exp_avg / exp_avg_sq / step)
# ---------------------------------------------------------------------------
#
# The reference restores BOTH optimizer states on --resume
# (train_animating.py:270-288). Torch's Adam state_dict keys parameters by
# their position in the ``parameters()`` list, which follows state_dict
# registration order minus buffers — so the name list is recoverable from the
# checkpoint's state_dict alone. Each moment tensor is mapped into the flax
# param tree by substituting it for its weight in a synthetic state_dict and
# re-running the SAME weight importer (identical key surgery + transposes).

_BUFFER_SUFFIXES = (
    "stored_mean", "stored_var", "accumulation_counter",
    "weight_u", "weight_v", "num_batches_tracked",
    "running_mean", "running_var",
)


def ordered_param_names(raw_sd: Mapping, prefix: str = "") -> list:
    """Torch parameter names in ``parameters()`` order (buffers excluded)."""
    return [k for k in raw_sd
            if k.startswith(prefix)
            and k.split(".")[-1] not in _BUFFER_SUFFIXES]


def _moment_state_dict(raw_sd: Mapping, opt_sd: Mapping, prefix: str,
                       field: str) -> Dict:
    """Synthetic state_dict with each param replaced by its Adam moment
    (zeros for params the optimizer never stepped, e.g. frozen VGG)."""
    import torch

    state = opt_sd["state"]
    names = ordered_param_names(raw_sd, prefix)
    out = dict(raw_sd)
    for i, name in enumerate(names):
        ent = state.get(i, state.get(str(i)))
        if ent is not None and field in ent:
            out[name] = ent[field]
        else:
            v = raw_sd[name]
            out[name] = torch.zeros_like(v) if hasattr(v, "detach") else (
                np.zeros_like(v))
    return out


def adam_step_count(opt_sd: Mapping) -> int:
    for ent in opt_sd["state"].values():
        s = ent.get("step", 0)
        return int(s.item() if hasattr(s, "item") else s)
    return 0


def import_adam_moments(opt_sd: Mapping, raw_sd: Mapping,
                        import_params_fn, prefix: str = ""):
    """→ (mu, nu, count): Adam first/second moments as flax param trees.

    import_params_fn(state_dict) must return the ``params`` tree exactly as
    the weight import does (e.g. ``lambda sd: import_baseline_model(sd, opt)
    ["params"]``)."""
    mu = import_params_fn(_moment_state_dict(raw_sd, opt_sd, prefix, "exp_avg"))
    nu = import_params_fn(
        _moment_state_dict(raw_sd, opt_sd, prefix, "exp_avg_sq"))
    return mu, nu, adam_step_count(opt_sd)


def restore_adam_state(tx_state, mu, nu, count: int):
    """Graft imported moments into a fresh ``tx.init(params)`` state. All
    ``count`` fields (Adam bias correction AND any LR-schedule counters) are
    advanced to ``count`` so resumed dynamics continue mid-schedule."""
    import jax.numpy as jnp
    import optax

    c = jnp.asarray(count, jnp.int32)

    def walk(st):
        if isinstance(st, optax.ScaleByAdamState):
            return st._replace(count=c, mu=mu, nu=nu)
        if type(st) is tuple:
            return tuple(walk(s) for s in st)
        if hasattr(st, "_fields") and "count" in st._fields:
            return st._replace(count=c)
        return st

    return walk(tx_state)


def import_optimizer_states(ckpt: Mapping, opt: Options,
                            tx_g, g_params, tx_d=None, d_params=None):
    """Reference checkpoint → (opt_g_state, opt_d_state_or_None, step).

    optimizerG covers ``model.module.*`` params (base_model.py:20-37);
    optimizerD covers ``netD.*``. Moments pass through the model-type's
    weight importer so key surgery and layout transposes match exactly."""
    raw_sd = ckpt["state_dict"]

    if opt.model_type == "softmax_splating":
        g_fn = lambda sd: import_baseline_model(sd, opt)["params"]  # noqa: E731
    elif opt.model_type == "softmax_splating_2layers_alpha_seperate":
        g_fn = lambda sd: import_slr_model(sd, opt)["params"]  # noqa: E731
    elif opt.model_type in ("SPADE_unet_mask_motion", "unet_motion"):
        g_fn = lambda sd: import_motion_model(sd, opt)["params"]  # noqa: E731
    elif opt.model_type == "bg":
        g_fn = lambda sd: import_bg_model(sd, opt)["params"]  # noqa: E731
    else:
        raise ValueError(opt.model_type)

    # G params live under the BaseModel's self.model (DataParallel) subtree
    g_prefix = "model." if any(k.startswith("model.") for k in raw_sd) else ""
    mu, nu, count = import_adam_moments(
        ckpt["optimizerG"], raw_sd, g_fn, prefix=g_prefix)
    opt_g = restore_adam_state(tx_g.init(g_params), mu, nu, count)

    opt_d = None
    if tx_d is not None and "optimizerD" in ckpt:
        d_fn = lambda sd: import_discriminator(sd, opt)["params"]  # noqa: E731
        mu_d, nu_d, count_d = import_adam_moments(
            ckpt["optimizerD"], raw_sd, d_fn, prefix="netD.")
        opt_d = restore_adam_state(tx_d.init(d_params), mu_d, nu_d, count_d)
    return opt_g, opt_d, count


# ---------------------------------------------------------------------------
# Native (orbax) checkpoints
# ---------------------------------------------------------------------------

_CKPTR = None
_PENDING_META = []


def _join_meta(t):
    """Join a pending meta-writer thread, re-raising anything it caught.

    A swallowed failure here (orbax wait_until_finished or the meta write)
    would surface only as a silent one-epoch rollback on --resume."""
    t.join()
    exc = getattr(t, "exc", None)
    if exc is not None:
        raise RuntimeError(
            f"async checkpoint save failed: {exc!r}") from exc


def _checkpointer():
    import orbax.checkpoint as ocp

    global _CKPTR
    if _CKPTR is None:
        _CKPTR = ocp.StandardCheckpointer()
    return _CKPTR


def _write_meta(path: str, meta: Dict):
    # atomic meta write; restore_native treats meta-without-data (a crash
    # during an async save) as no checkpoint
    tmp = path + ".meta.json.tmp"
    with open(tmp, "w") as f:
        json.dump(meta, f, indent=2)
    os.replace(tmp, path + ".meta.json")


def save_native(path: str, state, opt: Options, epoch: int = 0,
                extra: Optional[Dict] = None, block: bool = True):
    """Atomic orbax save of a TrainState (+ Options JSON + metadata).

    ``block=False`` returns as soon as the on-device state is snapshotted
    and lets orbax write to disk in the background, overlapping the next
    epoch's training (reference saves synchronously each epoch,
    train_animating.py:243-263). Call :func:`wait_for_checkpoints` (or the
    next blocking save) before reading the checkpoint back.

    meta.json is only written once the orbax commit for THIS save is
    durable (a waiter thread for async saves): writing it eagerly would let
    a crash pair epoch-E meta with still-epoch-(E-1) data, and --resume
    would then silently skip an epoch."""
    import threading

    path = os.path.abspath(path)
    ckptr = _checkpointer()
    ckptr.wait_until_finished()  # serialize with any still-pending save
    # older meta writers must land before a newer save starts, or a slow
    # thread could overwrite a newer meta with a stale epoch
    while _PENDING_META:
        _join_meta(_PENDING_META.pop())
    ckptr.save(path, state, force=True)
    meta = {"opts": json.loads(opt.to_json()), "epoch": epoch}
    if extra:
        meta.update(extra)
    if block:
        ckptr.wait_until_finished()
        _write_meta(path, meta)
    else:
        def _wait_and_write():
            try:
                ckptr.wait_until_finished()
                _write_meta(path, meta)
            except BaseException as e:  # re-raised at the next join
                t.exc = e

        t = threading.Thread(target=_wait_and_write)
        t.start()
        _PENDING_META.append(t)


def wait_for_checkpoints():
    """Block until all pending async saves (data AND meta) are durable."""
    if _CKPTR is not None:
        _CKPTR.wait_until_finished()
    while _PENDING_META:
        _join_meta(_PENDING_META.pop())


def restore_native(path: str, abstract_state):
    """Restore a TrainState saved by save_native; returns (state, meta)."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    state = ckptr.restore(path, abstract_state)
    meta = {}
    if os.path.exists(path + ".meta.json"):
        with open(path + ".meta.json") as f:
            meta = json.load(f)
    return state, meta
