#!/usr/bin/env python
"""End-to-end benchmark: 60-frame 480x256 CLAW-style rollout on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline (BASELINE.json north star): the full rollout — motion integration,
symmetric double-ended softmax splat, pconv decode, all frames on device —
in < 1 s, i.e. >= 60 frames/sec. vs_baseline is achieved_fps / 60.
"""

import json
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

from slrsfs_tpu.config import Options
from slrsfs_tpu.engine.init_utils import settle
from slrsfs_tpu.engine.rollout import baseline_rollout
from slrsfs_tpu.models.baseline import BaselineModel

H, W, N = 256, 480, 60


def main():
    dev = jax.devices()[0]
    opt = Options()  # flagship baseline2 config: ngf=64, 65ch, pconv decoder
    model = BaselineModel(opt)
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.standard_normal((1, H, W, 3)) * 0.25, jnp.float32)
    flow = jnp.asarray(rng.standard_normal((H, W, 2)) * 1.0, jnp.float32)

    variables = model.init(
        {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
        img, False, True,
    )
    variables = settle(model, variables, (img,), n=6)

    # NOTE: on the axon-tunneled TPU platform, block_until_ready returns
    # before device execution finishes; reading one scalar of the last frame
    # forces completion (verified empirically) while transferring only 4 bytes.
    def run_blocking(v, i, f):
        frames = run(v, i, f)
        _ = float(frames[-1, -1, -1, -1])
        return frames

    run = jax.jit(lambda v, i, f: baseline_rollout(model, v, i, f, N))
    t0 = time.perf_counter()
    frames = run_blocking(variables, img, flow)
    compile_s = time.perf_counter() - t0

    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        frames = run_blocking(variables, img, flow)
        times.append(time.perf_counter() - t0)
    best = min(times)
    fps = N / best

    print(
        f"# device={dev} compile={compile_s:.1f}s best={best*1000:.1f}ms "
        f"runs={[f'{t*1000:.1f}' for t in times]} frames_shape={frames.shape}",
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
