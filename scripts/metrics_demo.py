"""Aggregate metrics demo — the reference ``metrics/demo.py`` equivalent.

Runs all four video metrics (FVD / SSIM / PSNR / LPIPS) over a pair of
dummy video batches (zeros vs ones, like the reference) or two .npy files
of shape (N, T, H, W, C) in [0, 1], and prints one JSON document.

Reference: ``metrics/demo.py:1-27`` (8 videos x 30 frames x 64px, pixel
values in [0, 1]).  FVD/LPIPS backbones run random-init unless converted
weights are passed (see ``scripts/convert_checkpoint.py``); the output
flags that loudly because random-feature FVD/LPIPS numbers are not
comparable to published values.

Usage:
  python scripts/metrics_demo.py                       # dummy zeros-vs-ones
  python scripts/metrics_demo.py --videos1 a.npy --videos2 b.npy \
      [--i3d_params i3d.msgpack] [--lpips_params lpips.msgpack]
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--videos1", default=None, help=".npy (N,T,H,W,C) in [0,1]")
    ap.add_argument("--videos2", default=None, help=".npy (N,T,H,W,C) in [0,1]")
    ap.add_argument("--num_videos", type=int, default=8)
    ap.add_argument("--video_length", type=int, default=30)
    ap.add_argument("--size", type=int, default=64)
    ap.add_argument("--i3d_params", default=None,
                    help="converted I3D params (msgpack); random-init otherwise")
    ap.add_argument("--lpips_params", default=None,
                    help="converted LPIPS-AlexNet params (msgpack); random-init otherwise")
    ap.add_argument("--batch", type=int, default=8)
    args = ap.parse_args()

    from extdm_tpu.metrics import (
        I3DExtractor, LPIPSMetric,
        calculate_fvd1, calculate_psnr1, calculate_ssim1,
    )
    from extdm_tpu.train.checkpoint import load_checkpoint

    if args.videos1:
        videos1 = np.load(args.videos1).astype(np.float32)
        videos2 = np.load(args.videos2).astype(np.float32)
    else:
        shape = (args.num_videos, args.video_length, args.size, args.size, 3)
        videos1 = np.zeros(shape, np.float32)
        videos2 = np.ones(shape, np.float32)

    i3d = I3DExtractor(load_checkpoint(args.i3d_params) if args.i3d_params else None)
    lpips = LPIPSMetric(load_checkpoint(args.lpips_params) if args.lpips_params else None)

    # FVD/LPIPS take channels-last (B, T, H, W, C); PSNR/SSIM take the
    # reference channels-first layout (B, T, C, H, W).
    tchw = lambda v: v.transpose(0, 1, 4, 2, 3)
    result = {}
    result["fvd"] = float(calculate_fvd1(videos1, videos2, i3d, bs=args.batch))
    result["fvd_backbone_pretrained"] = i3d.pretrained
    psnr, psnr_std = calculate_psnr1(tchw(videos1), tchw(videos2))
    ssim, ssim_std = calculate_ssim1(tchw(videos1), tchw(videos2))
    lp, lp_std = lpips.calculate_lpips1(videos1, videos2)
    for name, (mean, std) in (("psnr", (psnr, psnr_std)),
                              ("ssim", (ssim, ssim_std)),
                              ("lpips", (lp, lp_std))):
        result[name] = float(mean[name])
        result[f"{name}_std"] = float(std[name])
        result[f"{name}_per_frame"] = [float(v) for v in mean[f"{name}_per_frame"]]
    result["lpips_backbone_pretrained"] = lpips.pretrained

    if not i3d.pretrained or not lpips.pretrained:
        print("WARNING: random-init I3D/LPIPS backbones — FVD/LPIPS values are "
              "NOT comparable to published numbers (pass --i3d_params / "
              "--lpips_params with converted weights).", file=sys.stderr)
    print(json.dumps(result, indent=4))


if __name__ == "__main__":
    main()
