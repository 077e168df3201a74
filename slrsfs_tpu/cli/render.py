"""Render an animated video from a still image + motion field.

Equivalent of the reference inference drivers
(``test_animating/test_baseline_4eval*.py``, ``test_v1_4eval*.py``) with the
whole rollout fused into one on-device program:

    python -m slrsfs_tpu.cli.render IMAGE FLOW SAVE_DIR [--ckpt CKPT] ...

Protocol parity: input resized to W² (PIL bilinear) and normalized to [-1,1];
flow scaled by W/source · speed and nearest-resized (test_baseline_4eval.py:
161-184); optional align.json speed alignment (flow · frame/N, :198-202);
frames written to <save_dir>/<name>/PredImg/%06d.png at the output size (raw
or half of the input image, :159-161) and assembled to mp4 via ffmpeg.
Flow editing: --speed scalar, --rotate (degrees) and --flow-scale applied to
the motion vectors.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess

import numpy as np
from PIL import Image

import jax
import jax.numpy as jnp


def _load_flow(path: str) -> np.ndarray:
    from slrsfs_tpu.data.tensors import load_compressed_tensor, motion_to_hw2
    from slrsfs_tpu.utils.flow_viz import read_flo

    if path.endswith(".flo"):
        return read_flo(path)
    return motion_to_hw2(load_compressed_tensor(path))


def edit_flow(flow: np.ndarray, rotate_deg: float = 0.0,
              scale: float = 1.0) -> np.ndarray:
    """Rotate motion vectors by an angle and scale their magnitude."""
    if rotate_deg:
        th = np.deg2rad(rotate_deg)
        c, s = np.cos(th), np.sin(th)
        u = flow[..., 0] * c - flow[..., 1] * s
        v = flow[..., 0] * s + flow[..., 1] * c
        flow = np.stack([u, v], -1).astype(np.float32)
    return flow * scale


# HBM budget for one batched-decode chunk, in decoded pixels x frames.
# The decoder's live activations scale ~linearly with decode_batch x window
# area, so the auto chooser caps their product. Measured v5e-16G anchors
# (bench.py 768^2 rows): 768^2 nocrop db=15 = 8.85M OK; ~50%-moving crop
# window db=30 ~= 9.5M OK; same crop db=60 ~= 19M compiles to 26.65G and
# OOMs (round-5 sweep repro). SLR decodes two heads (fluid + alpha) off the
# shared splat stack, so it gets half the budget (its measured anchor:
# slr_fps 256^2 db=60 = 3.9M OK).
DECODE_PX_BUDGET = 9_000_000


def auto_decode_batch(n_frames: int, area: int, slr: bool = False,
                      cap: int = 60) -> int:
    """Largest divisor of ``n_frames`` (<= cap) whose decode chunk fits the
    measured HBM budget for a decode window of ``area`` pixels."""
    budget = DECODE_PX_BUDGET // (2 if slr else 1)
    db = max(1, min(cap, n_frames, budget // max(1, area)))
    while n_frames % db:
        db -= 1
    return db


class SceneRenderer:
    """Checkpoint + jit state shared across scenes.

    The reference scene loops (``test_all_CLAW_scenes.py:71-96``) spawn a
    fresh ``python test_animating/...`` per scene, reloading the checkpoint
    and re-building the model every time. Here one renderer holds the
    imported variables, the motion regressor, and a jit cache keyed by the
    sparse-set size bucket, so a 135-scene CLAW sweep compiles each rollout
    shape once and pays only device time afterwards. Frame saving (PNG + mp4,
    the dominant host cost) runs on a background thread, overlapping the next
    scene's render; call ``finish()`` (or use one-shot ``render_scene``) to
    join."""

    def __init__(self, ckpt: str = None, W: int = 256, n_frames: int = 60,
                 dtype: str = "float32", decode_batch: int = None,
                 seed: int = 0, motion_ckpt: str = None,
                 opt_overrides: dict = None, shard_frames: bool = False,
                 sparsify_eps: float = None, crop_decode: str = "auto",
                 p_bucket_ratio: float = None):
        from concurrent.futures import ThreadPoolExecutor

        from slrsfs_tpu.config import Options
        from slrsfs_tpu.models.baseline import BaselineModel
        from slrsfs_tpu.models.slr import SLRModel

        if ckpt:
            from slrsfs_tpu.io.checkpoint import import_checkpoint

            self.variables, opt = import_checkpoint(ckpt)
            opt = opt.replace(W=W)
        else:  # random weights (smoke/benchmark mode)
            opt = Options(W=W, bn_noise_misc=True, **(opt_overrides or {}))
            self.variables = None  # lazy jit_init on first render
        self.opt = opt
        self.slr = opt.model_type == "softmax_splating_2layers_alpha_seperate"
        self.model = (SLRModel if self.slr else BaselineModel)(opt)
        self.W, self.n_frames, self.seed = W, n_frames, seed
        # 'bfloat16' = bf16 decode, f32 splat; 'bfloat16-fast' additionally
        # accumulates the splat scatter in bf16 (frames agree to ~4e-3)
        self.compute_dtype = (jnp.bfloat16 if dtype.startswith("bfloat16")
                              else jnp.float32)
        self.splat_dtype = jnp.bfloat16 if dtype == "bfloat16-fast" else None
        # decode_batch None = auto: chosen per scene from the actual decode
        # window area (crop or full frame) against DECODE_PX_BUDGET, so a
        # 768² rawsize sweep doesn't compile 60-frame decode chunks that
        # exceed HBM (26.65G at 768² — round-5 sweep OOM) while 256² renders
        # keep the full 60-frame batch. An explicit int pins it.
        if decode_batch is None:
            self.decode_batch = None
        else:
            db = decode_batch
            while n_frames % db:
                db -= 1
            self.decode_batch = db
        self._db_logged = set()
        # Sparsifier: zero sub-threshold motion so estimated (dense) GT
        # flows ride the sparse fast path. A zeroed pixel with speed s
        # drifts <= N*s px over the rollout, so eps = 0.5/N bounds the
        # position error of every zeroed pixel at half a pixel. None =
        # auto: the error-bounded default engages for --rawsize renders
        # (the CLAW eval protocol, where the crop win matters most —
        # measured quality-neutral, GAPS.md eps table); pass 0.0 to
        # disable explicitly.
        self.sparsify_eps = sparsify_eps
        # 'auto': splat+decode only the moving-region window when its area
        # is < 85% of the frame and paste onto one full-frame static decode
        # — exact (engine/rollout.py crop section), cost ∝ window area
        self.crop_decode = crop_decode
        # geometric moving-set size buckets (prepare_scene_sparse): sweeps
        # set ~1.25 so scenes share compiled rollout shapes; None = exact
        # 1024-padding (best per-scene speed)
        self.p_bucket_ratio = p_bucket_ratio

        self.regressor = self.m_vars = None
        if motion_ckpt:
            from slrsfs_tpu.io.checkpoint import import_checkpoint
            from slrsfs_tpu.models.motion import MotionRegressor

            self.m_vars, m_opt = import_checkpoint(motion_ckpt)
            m_opt = m_opt.replace(W=W, motionW=W, motionH=W)
            self.regressor = MotionRegressor(m_opt)
            self._predict_motion = jax.jit(
                lambda v, i, m, h: self.regressor.apply(v, i, m, h))

        self.mesh = None
        if shard_frames:
            # frame-axis sharding over all visible chips (ICI "sequence
            # parallelism"; engine/rollout.py *_frame_sharded); dtype modes
            # and v2 checkpoints ride the sharded path too (round 3)
            from slrsfs_tpu.parallel.mesh import make_mesh

            self.mesh = make_mesh()
            assert n_frames % self.mesh.devices.size == 0, (
                f"n_frames={n_frames} must divide over "
                f"{self.mesh.devices.size} devices")

        self._jit_cache = {}
        self._save_pool = ThreadPoolExecutor(max_workers=1)
        self._pending = []

    def _ensure_variables(self, img):
        if self.variables is None:
            from slrsfs_tpu.engine.init_utils import jit_init, settle

            # init/settle at 64² regardless of render size: parameter
            # shapes are resolution-independent and the full-res init graph
            # compiles for minutes (at 768² it wedged the remote compile
            # service for 20+ min — GAPS.md)
            small = jax.random.normal(
                jax.random.PRNGKey(self.seed + 2), (1, 64, 64, 3),
                jnp.float32) * 0.25
            v = jit_init(
                self.model,
                {"params": jax.random.PRNGKey(self.seed),
                 "noise": jax.random.PRNGKey(self.seed + 1)}, small, False,
                True)
            self.variables = settle(self.model, v, (small,), n=6)
        return self.variables

    def _decode_batch_for(self, area: int) -> int:
        """Per-scene decode batch: the explicit setting, or the auto chooser
        over the actual decode-window area (see DECODE_PX_BUDGET)."""
        if self.decode_batch is not None:
            return self.decode_batch
        db = auto_decode_batch(self.n_frames, area, slr=self.slr)
        if db not in self._db_logged:
            self._db_logged.add(db)
            if db < min(60, self.n_frames):
                print(f"decode_batch auto: {db} frames/chunk "
                      f"({area}px decode window)")
        return db

    def _rollout(self, P: int, has_region: bool, crop=None, with_disp=False,
                 db: int = None):
        """Jitted rollout for one sparse-set size bucket (and crop SIZES).

        Only the crop window sizes key the cache — offsets are passed as a
        traced (4,) vector at call time, so a sweep's scenes share one
        compiled program per bucketed window size no matter where the
        moving region sits."""
        if db is None:
            db = self._decode_batch_for(self.W * self.W)
        key = (P, has_region,
               None if crop is None else (crop.hc, crop.wc, crop.ph,
                                          crop.pw), with_disp, db)
        if key not in self._jit_cache:
            from slrsfs_tpu.engine.rollout import (
                baseline_rollout_frame_sharded,
                baseline_rollout_sparse,
                slr_rollout_frame_sharded,
                slr_rollout_sparse,
            )

            def to_u8(outs):
                """On-device uint8 quantization of every output: the PNG
                writer wants uint8 anyway, and device→host transfer is the
                sweep's bandwidth tax (4x fewer bytes than f32 — the axon
                tunnel moves ~20-40 MB/s, a real host's PCIe also thanks
                us). [-1,1] Img keys → [0,255]; alpha maps → [0,255]."""
                q = {}
                for k, v in outs.items():
                    v = v.astype(jnp.float32)
                    v = (v * 0.5 + 0.5) if "Img" in k else v
                    q[k] = (jnp.clip(v, 0.0, 1.0) * 255.0 + 0.5).astype(
                        jnp.uint8)
                return q

            if self.mesh is not None:
                mesh = self.mesh
                if self.slr:
                    fn = jax.jit(lambda v, i, f, p, va, rg, disp=None,
                                 offs=None: to_u8(
                        slr_rollout_frame_sharded(
                            self.model, v, i, f, self.n_frames, p,
                            va, mesh,
                            compute_dtype=self.compute_dtype,
                            splat_dtype=self.splat_dtype,
                            alpha_region=rg if has_region else None,
                            crop=crop, disp=disp, crop_offsets=offs)))
                else:
                    fn = jax.jit(lambda v, i, f, p, va, rg, disp=None,
                                 offs=None: to_u8({
                        "PredImg": baseline_rollout_frame_sharded(
                            self.model, v, i, f, self.n_frames, p, va,
                            mesh, compute_dtype=self.compute_dtype,
                            splat_dtype=self.splat_dtype,
                            crop=crop, disp=disp, crop_offsets=offs)}))
            elif self.slr:
                fn = jax.jit(lambda v, i, f, p, va, rg, disp=None,
                             offs=None: to_u8(
                    slr_rollout_sparse(
                        self.model, v, i, f, self.n_frames, p, va,
                        decode_batch=db,
                        compute_dtype=self.compute_dtype,
                        splat_dtype=self.splat_dtype,
                        alpha_region=rg if has_region else None,
                        crop=crop, disp=disp, crop_offsets=offs)))
            else:
                fn = jax.jit(lambda v, i, f, p, va, rg, disp=None,
                             offs=None: to_u8({
                    "PredImg": baseline_rollout_sparse(
                        self.model, v, i, f, self.n_frames, p, va,
                        decode_batch=db,
                        compute_dtype=self.compute_dtype,
                        splat_dtype=self.splat_dtype,
                        crop=crop, disp=disp, crop_offsets=offs)}))
            self._jit_cache[key] = fn
        return self._jit_cache[key]

    def render(self, image_path: str, flow_path: str, save_dir: str,
               name: str = None, speed: float = 1.0,
               align_json: str = "None", rawsize: bool = False,
               rotate: float = 0.0, flow_scale: float = 1.0,
               alpha_region_path: str = None):
        from slrsfs_tpu.data.transforms import transform_flow
        from slrsfs_tpu.engine.rollout import prepare_scene_sparse

        W, n_frames = self.W, self.n_frames
        name = name or os.path.splitext(os.path.basename(image_path))[0]
        out_dir = os.path.join(save_dir, name)
        os.makedirs(out_dir, exist_ok=True)

        img_pil = Image.open(image_path).convert("RGB")
        out_w, out_h = img_pil.size if rawsize else (img_pil.size[0] // 2,
                                                     img_pil.size[1] // 2)
        img = np.asarray(img_pil.resize((W, W), Image.BILINEAR), np.float32)
        img = jnp.asarray(((img / 255.0 - 0.5) / 0.5)[None])
        variables = self._ensure_variables(img)
        if self.mesh is not None and not getattr(self, "_replicated", False):
            from slrsfs_tpu.parallel.mesh import replicate

            self.variables = replicate(self.variables, self.mesh)
            self._replicated = True
            variables = self.variables

        # --- flow ----------------------------------------------------------
        flow = _load_flow(flow_path)
        flow = edit_flow(flow, rotate, flow_scale)
        flow = transform_flow(flow, W, None, mode="nearest", speed=speed)
        if self.regressor is not None:
            # motion-from-hints mode (reference
            # test_motion_4eval_rawsize_threshold.py:163-219): the provided
            # flow only seeds the moving mask + KMeans/RBF hints; the dense
            # motion comes from the SPADE regressor.
            from slrsfs_tpu.data.hints import synthesize_hint

            hint, mask = synthesize_hint(flow, n_hints=5)
            pred = self._predict_motion(
                self.m_vars, img, jnp.asarray(mask)[None, ..., None],
                jnp.asarray(hint)[None])
            flow = np.asarray(pred[0])
        if align_json and align_json != "None":
            with open(align_json) as f:
                align = json.load(f)
            if name in align:
                flow = flow * (align[name] / float(n_frames))
        eps = self.sparsify_eps
        if eps is None:  # auto: error-bounded default for rawsize renders
            eps = 0.5 / n_frames if rawsize else 0.0
        if eps > 0.0:
            speed = np.sqrt(flow[..., 0] ** 2 + flow[..., 1] ** 2)
            sub = speed < eps
            zeroed = sub & (speed > 0)
            if zeroed.any():
                print(f"sparsify eps={eps:g}: zeroed "
                      f"{zeroed.mean():.1%} of pixels (max trajectory drift "
                      f"{speed[zeroed].max() * n_frames:.2f}px over "
                      f"{n_frames} frames)")
            flow = np.where(sub[..., None], 0.0, flow).astype(np.float32)
        positions, valid = prepare_scene_sparse(
            flow, bucket_ratio=self.p_bucket_ratio)

        region = jnp.zeros((1, W, W, 1), jnp.float32)
        if alpha_region_path:
            r = Image.open(alpha_region_path).convert("L").resize((W, W))
            region = jnp.asarray(
                np.asarray(r, np.float32)[None, ..., None] / 255.0)

        if getattr(self, "profile_stages", False) and not self.slr \
                and self.mesh is None:
            # reference DEBUG_TIME stage meters for the fused rollout
            # (prefix-difference programs; engine/stage_profile.py)
            from slrsfs_tpu.engine.stage_profile import (
                format_stages,
                profile_baseline_crop_stages,
                profile_baseline_stages,
            )

            db_full = self._decode_batch_for(W * W)
            st = profile_baseline_stages(
                self.model, variables, img, jnp.asarray(flow),
                jnp.asarray(positions), jnp.asarray(valid), n_frames,
                decode_batch=db_full,
                compute_dtype=self.compute_dtype,
                splat_dtype=self.splat_dtype)
            print(f"[profile {name}] {format_stages(st)}")
            if self.crop_decode == "auto":
                stc = profile_baseline_crop_stages(
                    self.model, variables, img, jnp.asarray(flow),
                    jnp.asarray(positions), jnp.asarray(valid), n_frames,
                    decode_batch=db_full,
                    compute_dtype=self.compute_dtype,
                    splat_dtype=self.splat_dtype)
                if stc is None:
                    print(f"[profile {name}] crop: disengaged (plan None)")
                else:
                    print(f"[profile {name}] crop "
                          f"(t_euler_integration = prepare_crop): "
                          f"{format_stages(stc)}")
            self.profile_stages = False  # once per process is plenty

        flow_d, pos_d, val_d = (jnp.asarray(flow), jnp.asarray(positions),
                                jnp.asarray(valid))
        crop = disp = None
        if self.crop_decode == "auto":
            from slrsfs_tpu.engine.rollout import prepare_crop

            disp, crop = prepare_crop(self.opt, self.slr, flow_d, pos_d,
                                      val_d, n_frames)
        run = self._rollout(positions.shape[0],
                            has_region=alpha_region_path is not None,
                            crop=crop, with_disp=disp is not None,
                            db=self._decode_batch_for(
                                crop.hc * crop.wc if crop is not None
                                else W * W))
        if disp is not None and crop is not None:
            offs = jnp.asarray([crop.y0, crop.x0, crop.py0, crop.px0],
                               jnp.int32)
            outs = run(variables, img, flow_d, pos_d, val_d, region, disp,
                       offs)
        elif disp is not None:
            outs = run(variables, img, flow_d, pos_d, val_d, region, disp)
        else:
            outs = run(variables, img, flow_d, pos_d, val_d, region)
        outs = {k: np.asarray(v) for k, v in outs.items()}
        # backpressure: saving is the dominant host cost, so cap the queue —
        # each pending entry holds a full scene's output stack in host memory
        while len(self._pending) >= 2:
            self._pending.pop(0).result()
        self._pending.append(self._save_pool.submit(
            _save_outputs, outs, out_dir, name, out_w, out_h))
        return out_dir

    def finish(self):
        """Join pending background saves, re-raising any save error."""
        pending, self._pending = self._pending, []
        for f in pending:
            f.result()


def render_scene(image_path: str, flow_path: str, save_dir: str,
                 ckpt: str = None, name: str = None, W: int = 256,
                 n_frames: int = 60, speed: float = 1.0,
                 align_json: str = "None", rawsize: bool = False,
                 rotate: float = 0.0, flow_scale: float = 1.0,
                 dtype: str = "float32", decode_batch: int = None,
                 alpha_region_path: str = None, seed: int = 0,
                 motion_ckpt: str = None, opt_overrides: dict = None,
                 shard_frames: bool = False, sparsify_eps: float = 0.0,
                 crop_decode: str = "auto"):
    """One-shot render (reference single-scene driver equivalent).

    Scene loops should build one :class:`SceneRenderer` and call
    ``render()`` per scene instead — it reuses the checkpoint import and the
    compiled rollout across scenes."""
    r = SceneRenderer(ckpt=ckpt, W=W, n_frames=n_frames, dtype=dtype,
                      decode_batch=decode_batch, seed=seed,
                      motion_ckpt=motion_ckpt, opt_overrides=opt_overrides,
                      shard_frames=shard_frames, sparsify_eps=sparsify_eps,
                      crop_decode=crop_decode)
    out_dir = r.render(image_path, flow_path, save_dir, name=name,
                       speed=speed, align_json=align_json, rawsize=rawsize,
                       rotate=rotate, flow_scale=flow_scale,
                       alpha_region_path=alpha_region_path)
    r.finish()
    return out_dir


def _to_u8_np(fr, key):
    """Host-side fallback quantization for float outputs (the jitted
    rollouts already emit uint8 on device)."""
    if fr.dtype == np.uint8:
        return fr
    if "Img" in key:
        fr = fr * 0.5 + 0.5
    return (fr.clip(0, 1) * 255 + 0.5).astype(np.uint8)  # round like device


def _save_outputs(outs, out_dir, name, out_w, out_h):
    import cv2

    for key, arr in outs.items():
        arr = np.asarray(arr)
        if arr.ndim == 3:  # e.g. BGImg: single image
            im = cv2.resize(_to_u8_np(arr, key), (out_w, out_h),
                            interpolation=cv2.INTER_LINEAR)
            cv2.imwrite(os.path.join(out_dir, f"{key}.png"),
                        cv2.cvtColor(im, cv2.COLOR_RGB2BGR))
            continue
        kdir = os.path.join(out_dir, key)
        os.makedirs(kdir, exist_ok=True)
        for t in range(arr.shape[0]):
            fr = _to_u8_np(arr[t], key)
            if fr.shape[-1] == 1:  # alpha maps
                fr = np.repeat(fr, 3, -1)
            im = cv2.resize(fr, (out_w, out_h), interpolation=cv2.INTER_LINEAR)
            cv2.imwrite(os.path.join(kdir, f"{t:06d}.png"),
                        cv2.cvtColor(im, cv2.COLOR_RGB2BGR))
        mp4 = os.path.join(out_dir, f"{key}_{name}.mp4")
        try:
            subprocess.run(
                ["ffmpeg", "-loglevel", "quiet", "-framerate", "30", "-i",
                 os.path.join(kdir, "%06d.png"), "-y", mp4], check=True)
        except (FileNotFoundError, subprocess.CalledProcessError):
            # no ffmpeg in this environment: cv2 VideoWriter fallback
            vw = cv2.VideoWriter(mp4, cv2.VideoWriter_fourcc(*"mp4v"), 30,
                                 (out_w, out_h))
            for t in range(arr.shape[0]):
                vw.write(cv2.imread(os.path.join(kdir, f"{t:06d}.png")))
            vw.release()
    return out_dir


def main(argv=None):
    from slrsfs_tpu.engine.init_utils import enable_persistent_cache

    enable_persistent_cache()  # sweeps/re-runs skip recompiles
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("image")
    p.add_argument("flow")
    p.add_argument("save_dir")
    p.add_argument("--ckpt", default=None)
    p.add_argument("--name", default=None)
    p.add_argument("--W", type=int, default=256)
    p.add_argument("--n-frames", type=int, default=60)
    p.add_argument("--speed", type=float, default=1.0)
    p.add_argument("--align", default="None")
    p.add_argument("--rawsize", action="store_true")
    p.add_argument("--rotate", type=float, default=0.0)
    p.add_argument("--flow-scale", type=float, default=1.0)
    p.add_argument("--dtype", default="float32",
                   choices=["float32", "bfloat16", "bfloat16-fast"])
    p.add_argument("--alpha-region", default=None)
    p.add_argument("--motion-ckpt", default=None,
                   help="predict dense motion from sparse hints with this "
                        "motion-regressor checkpoint (threshold driver mode)")
    p.add_argument("--shard-frames", action="store_true",
                   help="shard the frame axis over all visible chips "
                        "(multi-chip inference; n-frames must divide the "
                        "device count)")
    p.add_argument("--sparsify-eps", type=float, default=None,
                   help="zero motion below this speed so dense estimated "
                        "flows ride the sparse fast path; eps = 0.5/N "
                        "bounds every zeroed pixel's trajectory drift at "
                        "half a pixel (tools/scene_stats.py measures "
                        "per-scene impact). Default: auto — 0.5/N for "
                        "--rawsize renders (measured quality-neutral, "
                        "GAPS.md), 0 otherwise; pass 0 to disable")
    p.add_argument("--crop-decode", choices=["auto", "off"], default="auto",
                   help="'auto': per frame, splat+decode only the moving-"
                        "region window (receptive-field-haloed — exact) and "
                        "paste onto one full-frame static decode; engages "
                        "when the window is < 85%% of the frame")
    p.add_argument("--profile-stages", action="store_true",
                   help="print reference-style per-stage timings (t_encoder/"
                        "t_euler_integration/t_softmax_splating/t_decoder) "
                        "for this scene's shape; costs extra compiles")
    p.add_argument("--decode-batch", type=int, default=None,
                   help="frames per decode chunk; default auto-sizes to the "
                        "decode window so large-W renders stay inside HBM")
    a = p.parse_args(argv)
    r = SceneRenderer(ckpt=a.ckpt, W=a.W, n_frames=a.n_frames, dtype=a.dtype,
                      motion_ckpt=a.motion_ckpt,
                      decode_batch=a.decode_batch,
                      shard_frames=a.shard_frames,
                      sparsify_eps=a.sparsify_eps,
                      crop_decode=a.crop_decode)
    r.profile_stages = a.profile_stages
    out = r.render(a.image, a.flow, a.save_dir, name=a.name, speed=a.speed,
                   align_json=a.align, rawsize=a.rawsize, rotate=a.rotate,
                   flow_scale=a.flow_scale, alpha_region_path=a.alpha_region)
    r.finish()
    print(f"rendered to {out}")


if __name__ == "__main__":
    main()
