#!/usr/bin/env python
"""Quality neutrality of the eps sparsifier: render ±eps, diff the frames.

The render CLI's default for --rawsize renders is now eps = 0.5/N
(cli/render.py): motion below that speed is zeroed so dense ESTIMATED
flows (`*_motion.pth`, nowhere exactly zero) ride the sparse fast path and
the moving-region cropped decode. The bound says any zeroed pixel's
trajectory drifts < 0.5 px over the whole rollout; this tool measures what
that does to the rendered frames: for a ladder of scenes it renders the
full rollout with eps = 0 (dense path, no crop possible) and with
eps = 0.5/N (default path), then reports per-scene PSNR / SSIM between the
two frame stacks, plus each stack's self-consistency floor (f32 vs bf16 —
the noise already accepted by the speed mode).

Scenes are synthetic dense estimates (moving band with real flow +
sub-threshold estimation noise elsewhere), random model weights — the
measurement is numeric neutrality of the zeroing through the real model
graph, which does not depend on trained weights.

Usage: python tools/eps_quality.py [--size 768] [--n-frames 60]
Prints one line per scene + a JSON summary line.
"""

import argparse
import json
import sys

import numpy as np

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--size", type=int, default=768)
    ap.add_argument("--n-frames", type=int, default=60)
    ap.add_argument("--fracs", default="0.15,0.30,0.50")
    a = ap.parse_args()

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
        prepare_scene_sparse,
    )
    from slrsfs_tpu.eval.metrics import psnr01, ssim01
    from slrsfs_tpu.models.baseline import BaselineModel
    from tools.dense768_bench import make_dense_scene

    enable_persistent_cache()
    h = w = a.size
    N = a.n_frames
    eps = 0.5 / N
    opt = Options()
    model = BaselineModel(opt)
    rng = np.random.default_rng(0)
    img_init = jnp.asarray(rng.standard_normal((1, 64, 64, 3)) * 0.25,
                           jnp.float32)
    variables = jit_init(
        model, {"params": jax.random.PRNGKey(0),
                "noise": jax.random.PRNGKey(1)}, img_init, False, True)
    variables = settle(model, variables, (img_init,), n=6)

    jit_cache = {}

    def rollout(img, flow_np, f32=False):
        positions, valid = prepare_scene_sparse(flow_np)
        P = (positions.shape[0], f32)
        if P not in jit_cache:
            cd = jnp.float32 if f32 else jnp.bfloat16
            sd = None if f32 else jnp.bfloat16
            # f32 decode activations are 2x bf16: db=15 at 768² OOMs
            # (16.3 of 15.75 G HBM, f32[15,768,768,128] decode temps)
            db = 5 if f32 else 15
            jit_cache[P] = jax.jit(
                lambda v, i, f, p, va: baseline_rollout_sparse(
                    model, v, i, f, N, p, va, decode_batch=db,
                    compute_dtype=cd, splat_dtype=sd))
        return np.asarray(jit_cache[P](
            variables, img, jnp.asarray(flow_np), jnp.asarray(positions),
            jnp.asarray(valid)).astype(jnp.float32))

    def score(x, y):
        # frames are [-1, 1]; metrics on [0, 1] like the eval harness.
        # PSNR from the GLOBAL MSE over every frame (a sampled per-frame
        # mean can read inf when the sampled frames happen to agree
        # bitwise while off-sample frames differ)
        x01 = np.clip(x.astype(np.float64) * 0.5 + 0.5, 0, 1)
        y01 = np.clip(y.astype(np.float64) * 0.5 + 0.5, 0, 1)
        mse = float(np.mean((x01 - y01) ** 2))
        ps = float("inf") if mse == 0.0 else float(10 * np.log10(1.0 / mse))
        ss = float(np.mean([float(ssim01(jnp.asarray(x01[t:t + 1]),
                                         jnp.asarray(y01[t:t + 1])))
                            for t in range(0, N, 6)]))
        return ps, ss

    rows = []
    for k, frac in enumerate(float(f) for f in a.fracs.split(",")):
        for f32 in ([False, True] if k == 1 else [False]):
            srng = np.random.default_rng(100 + k)
            img_np, flow_np = make_dense_scene(srng, h, w, N, band_frac=frac)
            img = jnp.asarray(img_np)
            frames_dense = rollout(img, flow_np, f32=f32)
            speed = np.sqrt(flow_np[..., 0] ** 2 + flow_np[..., 1] ** 2)
            flow_eps = np.where((speed < eps)[..., None], 0.0,
                                flow_np).astype(np.float32)
            frames_eps = rollout(img, flow_eps, f32=f32)
            tag = "f32" if f32 else "bf16"
            identical = bool(np.array_equal(frames_dense, frames_eps))
            maxabs = float(np.max(np.abs(frames_dense - frames_eps)))
            ps, ss = score(frames_dense, frames_eps)
            rows.append({"moving_frac": frac, "dtype": tag,
                         "bitwise_identical": identical,
                         "max_abs_diff": maxabs,
                         "psnr_eps_vs_dense": round(ps, 2),
                         "ssim_eps_vs_dense": round(ss, 5)})
            print(f"band={frac:.0%} [{tag}]: eps-vs-dense "
                  f"{'BITWISE IDENTICAL' if identical else ''} "
                  f"max|d|={maxabs:.2e} PSNR {ps:.2f} dB, SSIM {ss:.5f}",
                  flush=True)

    print(json.dumps({"eps": eps, "size": a.size, "rows": rows}))


if __name__ == "__main__":
    main()
