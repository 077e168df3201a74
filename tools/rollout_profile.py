#!/usr/bin/env python
"""Stage breakdown of the inference rollout via in-graph prefix differences.

Thin CLI over ``slrsfs_tpu.engine.stage_profile`` (the same code path as
``cli.render --profile-stages``), reproducing the reference's DEBUG_TIME
stage meters (test_baseline_4eval_rawsize.py:187-233) with the same stage
names.

Usage: python tools/rollout_profile.py [--hw 768x768] [--moving 0.5]
       [--decode-batches 5,10,15] [--dtype bf16]
"""

import argparse
import sys

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from slrsfs_tpu.config import Options
from slrsfs_tpu.engine.init_utils import (
    enable_persistent_cache, jit_init, settle,
)
from slrsfs_tpu.engine.rollout import prepare_scene_sparse
from slrsfs_tpu.engine.stage_profile import (
    format_stages,
    profile_baseline_crop_stages,
    profile_baseline_stages,
)
from slrsfs_tpu.models.baseline import BaselineModel

N = 60


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--hw", default="768x768")  # HxW
    ap.add_argument("--moving", type=float, default=0.5)
    ap.add_argument("--decode-batches", default="5")
    ap.add_argument("--dtype", default="bf16", choices=["bf16", "f32"])
    ap.add_argument("--crop", action="store_true",
                    help="also profile the cropped-decode path (the render "
                         "CLI default): prepare + crop rollout stages")
    args = ap.parse_args()
    H, W = (int(t) for t in args.hw.split("x"))
    dbs = [int(t) for t in args.decode_batches.split(",")]
    cdt = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32

    enable_persistent_cache()
    print(f"# device={jax.devices()[0]} shape={H}x{W} moving={args.moving} "
          f"dtype={args.dtype}", flush=True)
    rng = np.random.default_rng(0)
    opt = Options()
    model = BaselineModel(opt)
    img = jnp.asarray(rng.standard_normal((1, H, W, 3)) * 0.25, jnp.float32)
    flow_np = rng.standard_normal((H, W, 2)).astype(np.float32)
    flow_np[: int(H * (1.0 - args.moving))] = 0.0
    positions, valid = prepare_scene_sparse(flow_np)

    # init/settle at the bench shape (the conv params are resolution-
    # independent): jit_init at 768x768 wedges the remote compile service
    # for 20+ minutes, while the 480x256 init graph is known-good.
    img_init = jnp.asarray(rng.standard_normal((1, 256, 480, 3)) * 0.25,
                           jnp.float32)
    variables = jit_init(
        model,
        {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
        img_init, False, True)
    variables = settle(model, variables, (img_init,), n=2)

    for db in dbs:
        st = profile_baseline_stages(
            model, variables, img, jnp.asarray(flow_np),
            jnp.asarray(positions), jnp.asarray(valid), N,
            decode_batch=db, compute_dtype=cdt, splat_dtype=cdt)
        print(f"# STAGES db={db}: {format_stages(st)}", flush=True)

    if args.crop:
        st = profile_baseline_crop_stages(
            model, variables, img, jnp.asarray(flow_np),
            jnp.asarray(positions), jnp.asarray(valid), N,
            decode_batch=30, compute_dtype=cdt, splat_dtype=cdt)
        if st is None:
            print("# CROP: plan is None (crop disengaged on this scene)",
                  flush=True)
        else:
            print(f"# CROP STAGES (t_euler_integration = prepare_crop): "
                  f"{format_stages(st)} crop={st['crop']}", flush=True)


if __name__ == "__main__":
    main()
