"""Stage-1 standalone evaluation CLI.

Mirrors scripts/AE/valid.py: one reference frame warped to each future
frame via the full LFAE, FPS measurement, FVD/SSIM/PSNR/LPIPS, L1 out/warp
losses, metric json dump.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from extdm_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()
import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--config", required=True)
    p.add_argument("--checkpoint", default="")
    p.add_argument("--root_dir", default=None)
    p.add_argument("--log_dir", default="logs/ae_valid")
    p.add_argument("--total_videos", type=int, default=None)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--seed", type=int, default=1234)
    args = p.parse_args()

    from extdm_tpu.config import load_config
    from extdm_tpu.data import DataLoader, VideoDataset, to_rgb_video
    from extdm_tpu.metrics import I3DExtractor, calculate_fvd2, calculate_psnr1, calculate_ssim1
    from extdm_tpu.models.dm.flow_diffusion import LFAE
    from extdm_tpu.train import load_checkpoint, restore_like
    from extdm_tpu.utils import setup_seed
    from scripts.train_dm import load_lfae_variables  # reuse loader logic

    cfg_raw = load_config(args.config)
    if args.root_dir:
        cfg_raw["dataset_params"]["root_dir"] = args.root_dir
    dp = cfg_raw["dataset_params"]
    vp = dp["valid_params"]
    tc, tp = vp["cond_frames"], vp["pred_frames"]
    os.makedirs(args.log_dir, exist_ok=True)
    setup_seed(args.seed)

    lfae = LFAE(flow_params=cfg_raw["flow_params"]["model_params"])
    video0 = jnp.zeros((1, tc + tp, dp["frame_shape"], dp["frame_shape"], 3))
    variables = lfae.init(jax.random.PRNGKey(0), video0, tc)
    if args.checkpoint:
        ckpt = load_checkpoint(args.checkpoint)
        if "state" in ckpt:
            new = {
                "params": {k: ckpt["state"]["params"][k]
                           for k in ("region_predictor", "bg_predictor", "generator")},
                "batch_stats": {k: ckpt["state"]["batch_stats"].get(k, {})
                                for k in ("region_predictor", "bg_predictor", "generator")},
            }
            variables = restore_like(variables, new)
        else:
            variables = restore_like(variables, ckpt)
        print(f"loaded {args.checkpoint}")
    # commit restored (host-numpy) weights to the device once; otherwise
    # every encode call re-uploads them through the tunnel.
    variables = jax.device_put(variables)

    total_videos = args.total_videos or vp.get("total_videos", 256)
    dataset = VideoDataset(dp["root_dir"], type=vp["type"], total_videos=total_videos,
                           num_frames=tc + tp, image_size=dp["frame_shape"],
                           random_time=False, seed=args.seed)
    loader = DataLoader(dataset, args.batch_size, shuffle=False, num_workers=8,
                        drop_last=False, seed=args.seed)

    # variables as jit argument (not closure capture): captured arrays are
    # inlined into the HLO and overflow the remote compile service.
    encode_fn = jax.jit(
        lambda vars_, v: lfae.apply(vars_, v, tc, True, method=LFAE.encode_video)
    )

    reals, recons, warps = [], [], []
    t0 = time.perf_counter()
    n_frames = 0
    for clips, _ in loader:
        video = jnp.asarray(np.stack([to_rgb_video(c) for c in clips]))
        out = encode_fn(variables, video)
        jax.block_until_ready(out["out_vid"])
        n_frames += video.shape[0] * video.shape[1]
        reals.append(np.asarray(video))
        recons.append(np.asarray(out["out_vid"]))
        warps.append(np.asarray(out["warped_vid"]))
    elapsed = time.perf_counter() - t0
    fps = n_frames / elapsed
    print(f"reconstruction throughput: {fps:.1f} frames/s")

    real = np.concatenate(reals)
    recon = np.concatenate(recons)
    warped = np.concatenate(warps)

    def tchw(v):
        return v.transpose(0, 1, 4, 2, 3)

    psnr, _ = calculate_psnr1(tchw(recon), tchw(real))
    ssim, _ = calculate_ssim1(tchw(recon), tchw(real))
    extractor = I3DExtractor()
    fvd = calculate_fvd2(extractor.get_feats(recon), extractor.get_feats(real))
    out_loss = float(np.abs(real * 10 - recon * 10).mean())
    warp_loss = float(np.abs(real * 10 - warped * 10).mean())

    results = {
        "fvd": fvd,
        "psnr": float(psnr["psnr"]),
        "ssim": float(ssim["ssim"]),
        "l1_out_loss": out_loss,
        "l1_warp_loss": warp_loss,
        "fps": fps,
        "i3d_pretrained": extractor.pretrained,
    }
    print(json.dumps(results, indent=2))
    with open(os.path.join(args.log_dir, "metrics.json"), "w") as f:
        json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()
