"""Scene-loop renderer (reference ``test_animating/*/test_all_*_scenes.py``).

Iterates ``<scene>_input.jpg`` files in a directory, renders each with the
paired motion file, with optional [start, end) index-range sharding for
embarrassingly-parallel multi-job inference (reference
test_all_CLAW_scenes.py:58-96 / test_sbatch_2.sh):

    python -m slrsfs_tpu.cli.render_all SCENES_DIR SAVE_DIR \
        [--ckpt C] [--start 0] [--end -1] [--align align.json] ...
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import time


def main(argv=None):
    from slrsfs_tpu.engine.init_utils import enable_persistent_cache

    enable_persistent_cache()  # sweeps/re-runs skip recompiles
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("scenes_dir")
    p.add_argument("save_dir")
    p.add_argument("--ckpt", default=None)
    p.add_argument("--W", type=int, default=768)
    p.add_argument("--n-frames", type=int, default=60)
    p.add_argument("--speed", type=float, default=1.0)
    p.add_argument("--align", default="None")
    p.add_argument("--rawsize", action="store_true")
    p.add_argument("--dtype", default="bfloat16",
                   choices=["float32", "bfloat16", "bfloat16-fast"])
    p.add_argument("--start", type=int, default=0,
                   help="scene index range start (multi-job sharding)")
    p.add_argument("--end", type=int, default=-1)
    p.add_argument("--flow-suffix", default="_motion.flo",
                   help="motion file suffix paired with _input.jpg")
    p.add_argument("--shard-frames", action="store_true",
                   help="shard the frame axis over all visible chips")
    p.add_argument("--sparsify-eps", type=float, default=None,
                   help="zero motion below this speed (see cli.render; "
                        "default auto = 0.5/N for --rawsize, 0 otherwise)")
    p.add_argument("--opt-overrides", default=None,
                   help="JSON dict of Options fields overriding the "
                        "checkpoint/default config (tests + ablations)")
    p.add_argument("--crop-decode", choices=["auto", "off"], default="auto",
                   help="moving-region cropped decode (see cli.render); "
                        "crop plans are bucket-quantized so scenes share "
                        "compiled rollout shapes across the sweep")
    p.add_argument("--p-bucket-ratio", type=float, default=1.25,
                   help="geometric moving-set size buckets: scenes whose "
                        "moving-pixel counts fall in the same bucket share "
                        "one compiled rollout (<= (ratio-1) padded scatter "
                        "rows of overhead); 1.0 = exact padding")
    a = p.parse_args(argv)

    from slrsfs_tpu.cli.render import SceneRenderer

    inputs = sorted(glob.glob(os.path.join(a.scenes_dir, "*_input.jpg")))
    end = len(inputs) if a.end < 0 else a.end
    inputs = inputs[a.start:end]
    print(f"rendering {len(inputs)} scenes [{a.start}:{end})")
    # one renderer for the whole sweep: the checkpoint imports once and each
    # rollout shape bucket compiles once; PNG/mp4 saving overlaps the next
    # scene's device work on a background thread
    renderer = SceneRenderer(ckpt=a.ckpt, W=a.W, n_frames=a.n_frames,
                             dtype=a.dtype, shard_frames=a.shard_frames,
                             sparsify_eps=a.sparsify_eps,
                             crop_decode=a.crop_decode,
                             p_bucket_ratio=(a.p_bucket_ratio
                                             if a.p_bucket_ratio > 1.0
                                             else None),
                             opt_overrides=(json.loads(a.opt_overrides)
                                            if a.opt_overrides else None))
    done, skipped = 0, []
    t0 = time.perf_counter()
    for img_path in inputs:
        name = os.path.basename(img_path)[: -len("_input.jpg")]
        flow_path = os.path.join(a.scenes_dir, name + a.flow_suffix)
        if not os.path.exists(flow_path):
            for alt in ("_motion.pth", "_motion.npz", "_motion.flo"):
                cand = os.path.join(a.scenes_dir, name + alt)
                if os.path.exists(cand):
                    flow_path = cand
                    break
            else:
                skipped.append(name)
                continue
        renderer.render(img_path, flow_path, a.save_dir, name=name,
                        speed=a.speed, align_json=a.align, rawsize=a.rawsize)
        done += 1
        print(f"[{done}/{len(inputs)}] {name} "
              f"({time.perf_counter() - t0:.1f}s elapsed)", flush=True)
    renderer.finish()
    elapsed = time.perf_counter() - t0
    if skipped:
        print(f"skipped (no motion file): {skipped}")
    if done:
        # sweep economics: the reference spawns a fresh python + checkpoint
        # load per scene (test_all_CLAW_scenes.py:71-96); here one renderer
        # compiles each (P-bucket × crop-size-bucket) rollout shape once
        print(f"sweep: {done} scenes in {elapsed:.1f}s "
              f"({done / elapsed * 3600:.0f} scenes/hour incl. compiles + "
              f"saves), {len(renderer._jit_cache)} compiled rollout "
              f"program(s)")
    return {"done": done, "elapsed_s": elapsed,
            "compiled_programs": len(renderer._jit_cache)}


if __name__ == "__main__":
    main()
