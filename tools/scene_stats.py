#!/usr/bin/env python
"""Motion-sparsity statistics over a scene directory.

The sparse fast path's win scales with the *exactly-zero* motion fraction
(engine/rollout.py:prepare_scene_sparse). Estimated GT flow is dense —
nowhere exactly zero — so real `_motion.pth` scenes ride the worst-case
path unless sub-threshold motion is zeroed. This tool measures, per scene:

* moving fraction at exact zero (what the fast path sees today);
* moving fraction at |v| < eps for a ladder of thresholds;
* the frame-error bound of zeroing sub-eps motion: a pixel with speed s
  drifts at most N·s pixels over an N-frame rollout, so eps = 0.5/N keeps
  every zeroed pixel within half a pixel of its true trajectory end.

Usage:
  python tools/scene_stats.py DATA_DIR [--glob '*_motion.*'] [--n-frames 60]
Prints one line per scene + an aggregate summary (JSON on the last line).
"""

import argparse
import glob as globmod
import json
import os
import sys

import numpy as np

sys.path.insert(0, ".")


def scene_stats(flow: np.ndarray, eps_ladder, n_frames: int):
    speed = np.sqrt(flow[..., 0] ** 2 + flow[..., 1] ** 2)
    n = speed.size
    out = {
        "exact_zero_moving_frac": float((speed > 0).mean()),
        "mean_speed": float(speed.mean()),
        "max_speed": float(speed.max()),
    }
    for eps in eps_ladder:
        out[f"moving_frac_eps_{eps:g}"] = float((speed >= eps).mean())
    # error bound for the recommended eps = 0.5 / N
    eps_rec = 0.5 / n_frames
    out["recommended_eps"] = eps_rec
    out["moving_frac_at_recommended"] = float((speed >= eps_rec).mean())
    sub = speed[speed < eps_rec]
    out["max_drift_px_if_zeroed"] = float(sub.max() * n_frames) if sub.size else 0.0
    return out


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("data_dir")
    ap.add_argument("--glob", default="*_motion.*")
    ap.add_argument("--n-frames", type=int, default=60)
    ap.add_argument("--eps", default="0.001,0.005,0.01,0.05,0.1")
    a = ap.parse_args()

    from slrsfs_tpu.data.tensors import load_compressed_tensor, motion_to_hw2
    from slrsfs_tpu.utils.flow_viz import read_flo

    ladder = [float(t) for t in a.eps.split(",")]
    files = sorted(globmod.glob(os.path.join(a.data_dir, a.glob)))
    if not files:
        print(f"no motion files matching {a.glob} under {a.data_dir}",
              file=sys.stderr)
        sys.exit(1)
    agg = []
    for f in files:
        if f.endswith(".flo"):
            flow = read_flo(f)
        else:
            flow = motion_to_hw2(load_compressed_tensor(f))
        s = scene_stats(np.asarray(flow, np.float32), ladder, a.n_frames)
        agg.append(s)
        print(f"{os.path.basename(f)}: exact-zero moving "
              f"{s['exact_zero_moving_frac']:.3f}, at eps=0.5/N "
              f"{s['moving_frac_at_recommended']:.3f}, max drift if zeroed "
              f"{s['max_drift_px_if_zeroed']:.2f}px")
    keys = [k for k in agg[0] if isinstance(agg[0][k], float)]
    summary = {k: float(np.mean([s[k] for s in agg])) for k in keys}
    summary["n_scenes"] = len(agg)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
