"""CLAW-style directory evaluation → metric.json (schema-compatible).

Reference harness (``evaluation/animation/eval_CLAW.py``): scans
``<pred_dir>/<scene>/PredImg/%06d.png`` (exactly 60 frames required), loads
the GT ``<gt_dir>/<scene>.mp4`` frames, resizes GT to the prediction size with
PIL bilinear, scores LPIPS/Perceptual/PSNR/SSIM per frame, and writes
per-video mean/std plus aggregate Total* keys. The fluid variant
(``eval_CLAW_fluid.py:88-112``) composites the prediction over the input
image outside the moving region (speed >= 0.1·mean) before scoring.
"""

from __future__ import annotations

import json
import os
from typing import Dict, Optional

import numpy as np
from PIL import Image

from slrsfs_tpu.data.video import VideoReader
from slrsfs_tpu.eval.metrics import PerceptualMetrics
from slrsfs_tpu.utils.flow_viz import read_flo

N_FRAMES = 60


def _img01(path: str) -> np.ndarray:
    return np.asarray(Image.open(path).convert("RGB"), np.float32)[None] / 255.0


def _gt01(frame: np.ndarray, size_hw) -> np.ndarray:
    img = Image.fromarray(frame).resize((size_hw[1], size_hw[0]), Image.BILINEAR)
    return np.asarray(img, np.float32)[None] / 255.0


def eval_claw_dir(pred_dir: str, gt_dir: str,
                  metrics: Optional[PerceptualMetrics] = None,
                  fluid: bool = False,
                  flow_dir: Optional[str] = None,
                  input_dir: Optional[str] = None,
                  n_frames: int = N_FRAMES,
                  out_json: Optional[str] = None,
                  gt_suffix: str = ".mp4") -> Dict:
    """gt_suffix: ".mp4" for the CLAW layout, "_gt.mp4" for the
    eulerian_data layout (reference eval_eulerian_data.py:84)."""
    metrics = metrics or PerceptualMetrics()
    scenes = sorted(
        x for x in os.listdir(pred_dir)
        if os.path.exists(os.path.join(pred_dir, x, "PredImg", "000000.png"))
        and os.path.exists(os.path.join(gt_dir, x + gt_suffix))
        and len(os.listdir(os.path.join(pred_dir, x, "PredImg"))) == n_frames
    )
    skipped = [x for x in os.listdir(pred_dir)
               if os.path.isdir(os.path.join(pred_dir, x)) and x not in scenes]
    for s in skipped:
        print(f"do not eval {s}")

    keys = ["LPIPS", "Perceptual", "PSNR", "SSIM"]
    results: Dict = {}
    for k in keys:
        results[f"Total{k}"] = {}
        results[f"Total{k}_std"] = {}
        results[k] = {}
        results[f"{k}_std"] = {}
    all_vals: Dict[str, list] = {k: [] for k in keys}

    for scene in scenes:
        vr = VideoReader(os.path.join(gt_dir, scene + gt_suffix))
        vid_vals: Dict[str, list] = {k: [] for k in keys}
        mask = None
        input_img = None
        if fluid:
            flo_path = os.path.join(flow_dir, scene + "_motion.flo")
            if os.path.exists(flo_path):
                flow = read_flo(flo_path)
            else:  # eulerian-layout lz4 motion tensors
                from slrsfs_tpu.data.tensors import (
                    load_compressed_tensor, motion_to_hw2,
                )

                for suf in ("_motion.pth", "_motion.npz"):
                    cand = os.path.join(flow_dir, scene + suf)
                    if os.path.exists(cand):
                        flow = motion_to_hw2(load_compressed_tensor(cand))
                        break
                else:
                    raise FileNotFoundError(
                        f"no motion file for {scene} under {flow_dir}")
            p0 = _img01(os.path.join(pred_dir, scene, "PredImg", "000000.png"))
            import cv2

            fl = cv2.resize(flow, (p0.shape[2], p0.shape[1]),
                            interpolation=cv2.INTER_LINEAR)
            speed = np.sqrt(fl[..., 0] ** 2 + fl[..., 1] ** 2)
            mask = (speed > speed.mean() * 0.1).astype(np.float32)[None, ..., None]
            inp = Image.open(os.path.join(input_dir, scene + "_input.jpg"))
            inp = inp.resize((p0.shape[2], p0.shape[1]), Image.BILINEAR)
            input_img = np.asarray(inp, np.float32)[None] / 255.0

        for t in range(n_frames):
            pred = _img01(os.path.join(pred_dir, scene, "PredImg", f"{t:06d}.png"))
            gt = _gt01(vr[t], pred.shape[1:3])
            if fluid:
                pred = pred * mask + input_img * (1.0 - mask)
            m = metrics.all_metrics(pred, gt)
            for k in keys:
                if k in m:
                    vid_vals[k].append(m[k])
                    all_vals[k].append(m[k])
        vr.close()
        for k in keys:
            if vid_vals[k]:
                results[k][scene] = float(np.mean(vid_vals[k]))
                results[f"{k}_std"][scene] = float(np.std(vid_vals[k]))

    for k in keys:
        if all_vals[k]:
            results[f"Total{k}"] = float(np.mean(all_vals[k]))
            results[f"Total{k}_std"] = float(np.std(all_vals[k]))

    if out_json is None:
        out_json = os.path.join(pred_dir, "..",
                                "metric_fluid.json" if fluid else "metric.json")
    with open(out_json, "w") as f:
        json.dump(results, f)
    return results


def eval_fvd_dir(pred_dir: str, gt_dir: str, fvd,
                 n_frames: int = N_FRAMES, gt_suffix: str = ".mp4") -> float:
    """FVD over the scene set: one 60-frame video per scene, generated
    (PredImg stacks) vs ground truth (GT mp4 frames resized to pred size).
    ``fvd``: an available :class:`slrsfs_tpu.eval.i3d.FVD` scorer."""
    scenes = sorted(
        x for x in os.listdir(pred_dir)
        if os.path.exists(os.path.join(pred_dir, x, "PredImg", "000000.png"))
        and os.path.exists(os.path.join(gt_dir, x + gt_suffix))
        and len(os.listdir(os.path.join(pred_dir, x, "PredImg"))) == n_frames
    )
    real, gen = [], []
    for scene in scenes:
        vr = VideoReader(os.path.join(gt_dir, scene + gt_suffix))
        pred = np.concatenate([
            _img01(os.path.join(pred_dir, scene, "PredImg", f"{t:06d}.png"))
            for t in range(n_frames)])
        gt = np.concatenate([_gt01(vr[t], pred.shape[1:3])
                             for t in range(n_frames)])
        vr.close()
        gen.append(pred)
        real.append(gt)
    return fvd.score(real, gen)


def compare_metrics(json_a: str, json_b: str, key: str = "LPIPS") -> Dict:
    """Per-scene diff of two metric.json files
    (reference evaluation/animation/compare_metric.py)."""
    with open(json_a) as f:
        a = json.load(f)
    with open(json_b) as f:
        b = json.load(f)
    out = {}
    for scene in a.get(key, {}):
        if scene in b.get(key, {}):
            out[scene] = a[key][scene] - b[key][scene]
    return dict(sorted(out.items(), key=lambda kv: kv[1]))
