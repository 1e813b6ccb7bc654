"""Post-hoc analysis of evaluation dumps (the reference's ad-hoc vis/ layer).

Covers:
- vis/save_new.py — load origin/result (+flow) dumps, render the
  origin/result/flow/diff gif grid, recompute full-suite metrics -> json.
- vis/save_visualization_and_metrics_one_by_one.py:66-120 — per-video
  metric CSVs.

Dumps are produced by ``scripts/valid_dm.py --dump_arrays`` (npz/npy with
origin (N,T,H,W,3), result (N,T,H,W,3) in [0,1], optional origin_flows /
result_flows (N,T,h,w,2) backward-warp grids).

Usage:
  python scripts/analyze_dumps.py --dump_dir logs/dm_valid \
      --cond_frames 10 [--per_video] [--render] [--i3d_params ...]
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def _load(dump_dir: str, name: str):
    for ext in (".npy", ".npz"):
        path = os.path.join(dump_dir, name + ext)
        if os.path.exists(path):
            arr = np.load(path)
            if ext == ".npz":
                arr = arr[list(arr.keys())[0]]
            return np.asarray(arr, np.float32)
    return None


def _flow_frames(grids: np.ndarray, H: int, W: int) -> np.ndarray:
    """(N, T, h, w, 2) warp grids -> (N, T, H, W, 3) color frames in [0,1]."""
    from extdm_tpu.utils.flow_viz import flow2fig

    N, T = grids.shape[:2]
    out = np.zeros((N, T, H, W, 3), np.float32)
    for i in range(N):
        for t in range(T):
            img = flow2fig(grids[i, t]).astype(np.float32) / 255.0
            ry, rx = H // img.shape[0], W // img.shape[1]
            out[i, t] = np.kron(img, np.ones((ry, rx, 1), np.float32)) if ry > 1 else img[:H, :W]
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--dump_dir", required=True)
    p.add_argument("--cond_frames", type=int, default=10)
    p.add_argument("--out_dir", default=None, help="default: <dump_dir>/analysis")
    p.add_argument("--metrics", default="psnr,ssim,lpips,fvd")
    p.add_argument("--per_video", action="store_true",
                   help="write metrics_per_video.csv (ref one_by_one:66-120)")
    p.add_argument("--render", action="store_true",
                   help="render origin/result/flow/diff gif grid (ref save_new.py)")
    p.add_argument("--max_render", type=int, default=16)
    p.add_argument("--i3d_params", default="")
    args = p.parse_args()

    from extdm_tpu.metrics import calculate_psnr1, calculate_psnr3, calculate_ssim1

    out_dir = args.out_dir or os.path.join(args.dump_dir, "analysis")
    os.makedirs(out_dir, exist_ok=True)

    origin = _load(args.dump_dir, "origin")
    result = _load(args.dump_dir, "result")
    if origin is None or result is None:
        sys.exit(f"origin/result dumps not found in {args.dump_dir} "
                 "(run valid_dm.py --dump_arrays first)")
    oflow = _load(args.dump_dir, "origin_flows")
    rflow = _load(args.dump_dir, "result_flows")
    tc = args.cond_frames
    N = origin.shape[0]
    print(f"loaded {N} videos, T={origin.shape[1]} (cond {tc})")

    def tchw(v):
        return v.transpose(0, 1, 4, 2, 3)

    o_pred, r_pred = tchw(origin[:, tc:]), tchw(result[:, tc:])
    wanted = set(args.metrics.split(","))
    metrics = {}
    if "psnr" in wanted:
        m, s = calculate_psnr1(o_pred, r_pred)
        metrics["psnr"] = {"mean": float(m["psnr"]), "std": float(s["psnr"])}
    if "ssim" in wanted:
        m, s = calculate_ssim1(o_pred, r_pred)
        metrics["ssim"] = {"mean": float(m["ssim"]), "std": float(s["ssim"])}
    if "lpips" in wanted:
        from extdm_tpu.metrics import LPIPSMetric

        lp = LPIPSMetric()
        m, s = lp.calculate_lpips1(origin[:, tc:], result[:, tc:])
        metrics["lpips"] = {"mean": float(m["lpips"]), "std": float(s["lpips"]),
                            "pretrained": lp.pretrained}
    if "fvd" in wanted:
        from extdm_tpu.metrics import I3DExtractor, calculate_fvd2
        from extdm_tpu.train import load_checkpoint

        i3d = None
        if args.i3d_params and os.path.exists(args.i3d_params):
            i3d = load_checkpoint(args.i3d_params)
        ex = I3DExtractor(params=i3d)
        # full video incl. cond frames, as the reference computes FVD
        metrics["fvd"] = {"value": calculate_fvd2(ex.get_feats(result), ex.get_feats(origin)),
                          "pretrained": ex.pretrained}
    with open(os.path.join(out_dir, "metrics.json"), "w") as f:
        json.dump(metrics, f, indent=2)
    print(json.dumps(metrics, indent=2))

    if args.per_video:
        # per-video psnr/ssim rows (ref one_by_one metrics_by_video)
        psnr_mat = calculate_psnr3(o_pred, r_pred)  # (N, T) per-frame
        per_video_psnr = psnr_mat.mean(axis=1)
        with open(os.path.join(out_dir, "metrics_per_video.csv"), "w") as f:
            f.write("id,psnr\n")
            for i in range(N):
                f.write(f"{i},{per_video_psnr[i]:.4f}\n")
        print(f"per-video CSV -> {out_dir}/metrics_per_video.csv")

    if args.render:
        from extdm_tpu.utils.visualize import visualize_ori_pre_flow_diff

        n = min(N, args.max_render)
        H, W = origin.shape[2:4]
        if oflow is not None and rflow is not None:
            of = _flow_frames(oflow[:n], H, W)
            rf = _flow_frames(rflow[:n], H, W)
            if of.shape[1] < origin.shape[1]:  # pred-only flows: pad cond white
                pad = np.ones((n, origin.shape[1] - of.shape[1], H, W, 3), np.float32)
                of = np.concatenate([pad, of], axis=1)
                rf = np.concatenate([pad.copy(), rf], axis=1)
        else:
            of = np.zeros_like(origin[:n])
            rf = np.zeros_like(result[:n])
        paths = visualize_ori_pre_flow_diff(
            out_dir, origin[:n], result[:n], of, rf,
            cond_frame_num=tc,
        )
        print(f"rendered {len(paths)} gif grids -> {os.path.dirname(paths[0])}")


if __name__ == "__main__":
    main()
