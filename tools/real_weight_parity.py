#!/usr/bin/env python
"""One-command real-weight quality parity: import a reference checkpoint,
render CLAW scene(s) through the flagship driver path, evaluate, print the
metric.json aggregate.

The reference's defining artifact is its CLAW LPIPS table
(``/root/reference/README.md:101-107``, protocol
``/root/reference/evaluation/animation/eval_CLAW.py:97-114``). This
environment has no pretrained weights and no egress, so that comparison has
never been runnable here — this tool makes it a single command the day
weights appear:

    python tools/real_weight_parity.py model_epoch.pth \\
        --scene data/CLAW/test/00001_input.jpg data/CLAW/test/00001_motion.pth \\
        --gt-dir data/CLAW/test_gt --out runs/parity \\
        --vgg16 vgg16-397923af.pth --alexnet alexnet-owt-7be5be79.pth \\
        --lpips lpips_alex_v0.1.pth --align data/CLAW/CLAW_align_*.json

Protocol defaults match the published numbers: W=768, 60 frames, rawsize
output, speed 1, align.json scaling (``test_animating/CLAW/test_v1.sh:19``).
The sparsifier is OFF by default here (quality measurement must see the
exact driver output; pass ``--sparsify-eps -1`` for the render CLI's auto
default). Without ``--vgg16``/``--alexnet``/``--lpips`` the harness still
scores PSNR/SSIM, so the pipeline is smoke-testable with random weights
(tests/test_real_weight_parity.py).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main(argv=None):
    p = argparse.ArgumentParser(
        description=__doc__, formatter_class=argparse.RawDescriptionHelpFormatter)
    p.add_argument("ckpt", help="reference .pth (or orbax dir) checkpoint")
    p.add_argument("--scene", nargs=2, action="append", required=True,
                   metavar=("IMAGE", "FLOW"),
                   help="scene input image + motion (.pth/.flo); repeatable")
    p.add_argument("--gt-dir", required=True,
                   help="directory of GT videos (<scene>.mp4)")
    p.add_argument("--out", required=True, help="render/eval output dir")
    p.add_argument("--W", type=int, default=768)
    p.add_argument("--n-frames", type=int, default=60)
    p.add_argument("--speed", type=float, default=1.0)
    p.add_argument("--align", default="None")
    p.add_argument("--gt-suffix", default=".mp4",
                   help='".mp4" CLAW layout, "_gt.mp4" eulerian layout')
    p.add_argument("--vgg16", default=None, help="torchvision vgg16 .pth "
                   "(enables the PNet Perceptual column)")
    p.add_argument("--alexnet", default=None,
                   help="torchvision alexnet .pth")
    p.add_argument("--lpips", default=None,
                   help="lpips alex v0.1 linear weights .pth "
                        "(with --alexnet, enables the LPIPS column)")
    p.add_argument("--sparsify-eps", type=float, default=0.0,
                   help="0 = exact driver output (default for quality "
                        "measurement); -1 = the render CLI's auto default")
    p.add_argument("--dtype", default="float32",
                   choices=["float32", "bfloat16", "bfloat16-fast"])
    p.add_argument("--fluid", action="store_true",
                   help="also compute the fluid-region variant "
                        "(metric_fluid.json; needs --flow-dir/--input-dir)")
    p.add_argument("--flow-dir", default=None)
    p.add_argument("--input-dir", default=None)
    a = p.parse_args(argv)

    from slrsfs_tpu.cli.render import SceneRenderer
    from slrsfs_tpu.eval.eval_claw import eval_claw_dir
    from slrsfs_tpu.eval.metrics import PerceptualMetrics

    eps = None if a.sparsify_eps < 0 else a.sparsify_eps
    renderer = SceneRenderer(ckpt=a.ckpt, W=a.W, n_frames=a.n_frames,
                             dtype=a.dtype, sparsify_eps=eps)
    pred_dir = os.path.join(a.out, "pred")
    os.makedirs(pred_dir, exist_ok=True)
    for image, flow in a.scene:
        base = os.path.splitext(os.path.basename(image))[0]
        name = base[:-len("_input")] if base.endswith("_input") else base
        print(f"rendering {name} ({a.W}x{a.W}, {a.n_frames} frames, "
              f"rawsize)")
        renderer.render(image, flow, pred_dir, name=name, speed=a.speed,
                        align_json=a.align, rawsize=True)
    renderer.finish()

    metrics = PerceptualMetrics(vgg16_pth=a.vgg16, alexnet_pth=a.alexnet,
                                lpips_pth=a.lpips)
    results = eval_claw_dir(
        pred_dir, a.gt_dir, metrics=metrics, n_frames=a.n_frames,
        gt_suffix=a.gt_suffix,
        out_json=os.path.join(a.out, "metric.json"))
    if a.fluid:
        eval_claw_dir(pred_dir, a.gt_dir, metrics=metrics, fluid=True,
                      flow_dir=a.flow_dir, input_dir=a.input_dir,
                      n_frames=a.n_frames, gt_suffix=a.gt_suffix,
                      out_json=os.path.join(a.out, "metric_fluid.json"))

    agg = {k: v for k, v in results.items()
           if k.startswith("Total") and not isinstance(v, dict)}
    print(json.dumps(agg))
    if not metrics.has_lpips:
        print("note: LPIPS column absent (pass --alexnet + --lpips); "
              "reference table to beat: README.md:101-107 "
              "(Ours_v1 LPIPS All 0.2040 / Fluid 0.1975)")
    return agg


if __name__ == "__main__":
    main()
