#!/usr/bin/env python
"""End-to-end benchmark: 60-frame 480x256 CLAW-style rollout on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline (BASELINE.json north star): the full rollout — motion integration,
symmetric double-ended softmax splat, pconv decode, all frames on device —
in < 1 s, i.e. >= 60 frames/sec. vs_baseline is achieved_fps / 60.

Scene: CLAW-like fluid scene at 480x256 — half the image is moving fluid
(dense per-pixel motion), half static (zero motion), which is what the
reference's masked eulerian motion fields look like. The engine's sparse
fast path exploits the static region *exactly* (static pixels splat onto
themselves; see slrsfs_tpu/engine/rollout.py). Speed mode: bfloat16 decode
with float32 splat accumulation.
"""

import json
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

from slrsfs_tpu.config import Options
from slrsfs_tpu.engine.init_utils import settle
from slrsfs_tpu.engine.rollout import (
    baseline_rollout_sparse,
    prepare_scene_sparse,
)
from slrsfs_tpu.models.baseline import BaselineModel

H, W, N = 256, 480, 60
DECODE_BATCH = 60


def main():
    dev = jax.devices()[0]
    opt = Options()  # flagship baseline2 config: ngf=64, 65ch, pconv decoder
    model = BaselineModel(opt)
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.standard_normal((1, H, W, 3)) * 0.25, jnp.float32)
    flow_np = rng.standard_normal((H, W, 2)).astype(np.float32)
    flow_np[: H // 2] = 0.0  # static top half (sky/rocks)

    from slrsfs_tpu.engine.init_utils import jit_init

    variables = jit_init(
        model,
        {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
        img, False, True,
    )
    variables = settle(model, variables, (img,), n=6)
    positions, valid = prepare_scene_sparse(flow_np)
    flow = jnp.asarray(flow_np)
    positions = jnp.asarray(positions)
    valid = jnp.asarray(valid)

    run = jax.jit(
        lambda v, i, f, p, va: baseline_rollout_sparse(
            model, v, i, f, N, p, va,
            decode_batch=DECODE_BATCH, compute_dtype=jnp.bfloat16,
        )
    )

    # NOTE: on the axon-tunneled TPU platform, block_until_ready returns
    # before device execution finishes; reading one scalar of the last frame
    # forces completion while transferring only 4 bytes.
    def run_blocking():
        frames = run(variables, img, flow, positions, valid)
        _ = float(frames[-1, -1, -1, -1])
        return frames

    t0 = time.perf_counter()
    frames = run_blocking()
    compile_s = time.perf_counter() - t0

    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        frames = run_blocking()
        times.append(time.perf_counter() - t0)
    best = min(times)
    fps = N / best

    print(
        f"# device={dev} compile={compile_s:.1f}s best={best*1000:.1f}ms "
        f"runs={[f'{t*1000:.1f}' for t in times]} frames_shape={frames.shape} "
        f"moving_frac={float(np.asarray(valid).sum()) / (H * W):.2f} "
        f"mode=sparse+bf16 decode_batch={DECODE_BATCH}",
        file=sys.stderr,
    )
    print(json.dumps({
        "metric": "rollout_fps_60f_480x256",
        "value": round(fps, 2),
        "unit": "frames/sec",
        "vs_baseline": round(fps / 60.0, 3),
    }))


if __name__ == "__main__":
    main()
