#!/usr/bin/env python
"""Generate synthetic CLAW-style scene files for sweep benchmarking.

Writes ``sceneNN_input.jpg`` + ``sceneNN_motion.flo`` pairs shaped like the
reference CLAW eval set (`test_animating/CLAW/test_all_CLAW_scenes.py`
iterates `*_input.jpg`): each scene is a random image with a DENSE
ESTIMATED motion field — a moving band of varied position/size (the fluid
region, flow ~ N(0,1) px/frame) over sub-threshold estimation noise
(nothing exactly zero), so a sweep exercises the render CLI's default
eps-sparsify + bucket-quantized cropped-decode path across varied moving
fractions and crop windows.

Usage: python tools/make_scenes.py OUT_DIR [--n 8] [--size 768]
"""

import argparse
import os
import sys

import numpy as np
from PIL import Image

sys.path.insert(0, ".")


def make_scene_files(out_dir, n=8, size=768, n_frames=60, seed=42,
                     verbose=True):
    """Write ``sceneNN_input.jpg`` + ``sceneNN_motion.flo`` pairs (see
    module docstring); importable so bench.py can stage a sweep."""
    from slrsfs_tpu.utils.flow_viz import write_flo

    os.makedirs(out_dir, exist_ok=True)
    h = w = size
    eps = 0.5 / n_frames
    rng = np.random.default_rng(seed)
    # varied moving fractions: band area ~ U(0.10, 0.60) of the frame
    for i in range(n):
        img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        Image.fromarray(img).save(
            os.path.join(out_dir, f"scene{i:02d}_input.jpg"), quality=92)

        theta = rng.uniform(0, 2 * np.pi, (h, w)).astype(np.float32)
        spd = rng.uniform(0, 0.9 * eps, (h, w)).astype(np.float32)
        flow = np.stack([spd * np.cos(theta), spd * np.sin(theta)], -1)
        area = rng.uniform(0.10, 0.60)
        cols = rng.uniform(0.5, 0.9)
        rows = min(0.95, area / cols)
        r0 = int(rng.uniform(0.0, 1.0 - rows) * h)
        c0 = int(rng.uniform(0.0, 1.0 - cols) * w)
        r1, c1 = r0 + int(rows * h), c0 + int(cols * w)
        flow[r0:r1, c0:c1] = rng.standard_normal(
            (r1 - r0, c1 - c0, 2)).astype(np.float32)
        write_flo(os.path.join(out_dir, f"scene{i:02d}_motion.flo"),
                  flow.astype(np.float32))
        if verbose:
            print(f"scene{i:02d}: moving band {rows:.0%}x{cols:.0%} "
                  f"= {rows * cols:.0%} of frame at ({r0},{c0})")


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("out_dir")
    ap.add_argument("--n", type=int, default=8)
    ap.add_argument("--size", type=int, default=768)
    ap.add_argument("--n-frames", type=int, default=60,
                    help="sets the estimation-noise floor (0.9 · 0.5/N)")
    a = ap.parse_args()
    make_scene_files(a.out_dir, n=a.n, size=a.size, n_frames=a.n_frames)


if __name__ == "__main__":
    main()
