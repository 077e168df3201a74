#!/usr/bin/env python
"""Measure the 768² dense-estimated-flow row (render-CLI default flags).

The CLAW eval protocol's real inputs are ESTIMATED dense flows
(`*_motion.pth`, reference test_baseline_4eval_rawsize.py:173-184): nowhere
exactly zero, so without sparsification the sparse fast path and the
moving-region cropped decode never engage. The render CLI's default is now
eps = 0.5/N for --rawsize renders (error-bounded: every zeroed pixel
drifts < 0.5 px over the rollout). This tool times that default path
end-to-end on a synthetic dense-estimate scene:

* moving region: a rows×cols band covering ~30 % of the frame (typical of
  CLAW waterfall scenes — fluid rarely fills the frame; the 50 %-rows
  variant is the floor-bound `rawsize768_fps` row, GAPS.md cost model),
  flow ~ N(0,1) px/frame;
* everywhere else: estimation noise, |v| ~ U(0, eps) with random direction
  — dense, nothing exactly zero, all sub-threshold.

Timed per call: host eps-sparsify + prepare_scene_sparse + prepare_crop
(integration; the rollout reuses its displacement stacks) + crop rollout.

Usage: python tools/dense768_bench.py [--moving-frac 0.3] [--runs 3]
"""

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def make_dense_scene(rng, h, w, n_frames, band_frac=0.30):
    """(img, flow) with a centered moving band covering band_frac of the
    frame and sub-eps estimation noise everywhere else."""
    img = (rng.standard_normal((1, h, w, 3)) * 0.25).astype(np.float32)
    eps = 0.5 / n_frames
    # dense estimation noise: random direction, speed ~ U(0, 0.9*eps)
    theta = rng.uniform(0, 2 * np.pi, (h, w)).astype(np.float32)
    speed = rng.uniform(0.0, 0.9 * eps, (h, w)).astype(np.float32)
    flow = np.stack([speed * np.cos(theta), speed * np.sin(theta)], -1)
    # moving band over cols [0.15W, 0.85W), placed low in the frame
    # (waterfall-like) but shifted up when taller than the space below
    cols = 0.70
    rows = min(band_frac / cols, 0.95)
    r0 = int(min(0.55, 1.0 - rows) * h)
    r1 = min(h, r0 + int(rows * h))
    c0, c1 = int(0.15 * w), int(0.85 * w)
    flow[r0:r1, c0:c1] = rng.standard_normal(
        (r1 - r0, c1 - c0, 2)).astype(np.float32)
    assert (np.abs(flow).sum(-1) > 0).all(), "flow must be dense"
    return img, flow


def run(moving_frac=0.30, runs=3, h=768, w=768, n_frames=60):
    import jax
    import jax.numpy as jnp

    from slrsfs_tpu.config import Options
    from slrsfs_tpu.engine.init_utils import (
        enable_persistent_cache,
        jit_init,
        settle,
    )
    from slrsfs_tpu.engine.rollout import (
        baseline_rollout_sparse,
        prepare_crop,
        prepare_scene_sparse,
    )
    from slrsfs_tpu.models.baseline import BaselineModel

    enable_persistent_cache()
    rng = np.random.default_rng(0)
    opt = Options()
    model = BaselineModel(opt)
    img_np, flow_np = make_dense_scene(rng, h, w, n_frames,
                                       band_frac=moving_frac)
    img = jnp.asarray(img_np)

    img_init = jnp.asarray(rng.standard_normal((1, 64, 64, 3)) * 0.25,
                           jnp.float32)
    variables = jit_init(
        model, {"params": jax.random.PRNGKey(0),
                "noise": jax.random.PRNGKey(1)}, img_init, False, True)
    variables = settle(model, variables, (img_init,), n=6)

    eps = 0.5 / n_frames
    jit_cache = {}

    def e2e():
        # the render CLI's default path, from raw dense flow to frames
        speed = np.sqrt(flow_np[..., 0] ** 2 + flow_np[..., 1] ** 2)
        fl = np.where((speed < eps)[..., None], 0.0, flow_np).astype(
            np.float32)
        positions, valid = prepare_scene_sparse(fl)
        fl_d, pos_d, val_d = (jnp.asarray(fl), jnp.asarray(positions),
                              jnp.asarray(valid))
        disp, crop = prepare_crop(opt, False, fl_d, pos_d, val_d, n_frames)
        key = (positions.shape[0],
               None if crop is None else (crop.hc, crop.wc))
        if key not in jit_cache:
            jit_cache[key] = jax.jit(
                lambda v, i, f, p, va, d, offs: baseline_rollout_sparse(
                    model, v, i, f, n_frames, p, va, decode_batch=30,
                    compute_dtype=jnp.bfloat16, splat_dtype=jnp.bfloat16,
                    crop=crop, disp=d, crop_offsets=offs))
            print(f"# crop plan: {crop} "
                  f"(window {0 if crop is None else crop.hc * crop.wc / (h * w):.1%}"
                  f" of frame), P={positions.shape[0]}")
        offs = (None if crop is None else
                jnp.asarray([crop.y0, crop.x0, crop.py0, crop.px0],
                            jnp.int32))
        return jit_cache[key](variables, img, fl_d, pos_d, val_d, disp, offs)

    def force(frames):
        _ = float(frames[-1, -1, -1, -1])
        return frames

    t0 = time.perf_counter()
    force(e2e())
    compile_s = time.perf_counter() - t0
    times = []
    for _ in range(runs):
        t0 = time.perf_counter()
        force(e2e())
        times.append(time.perf_counter() - t0)
    best = min(times)
    print(f"dense768 band={moving_frac:.0%}: e2e {best * 1000:.1f} ms "
          f"({n_frames / best:.1f} fps), compile {compile_s:.1f}s, "
          f"runs {[f'{t * 1000:.0f}' for t in times]}")
    return n_frames / best


if __name__ == "__main__":
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--moving-frac", type=float, default=0.30)
    ap.add_argument("--runs", type=int, default=3)
    a = ap.parse_args()
    run(moving_frac=a.moving_frac, runs=a.runs)
