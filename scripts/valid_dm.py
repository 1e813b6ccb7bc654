"""Stage-2 standalone evaluation CLI.

Mirrors scripts/DM/valid.py: multi-trajectory sampling (num_sample_video),
autoregressive chunked rollout (NUM_AUTOREG), FVD per trajectory +
best-trajectory selection by I3D-feature L1 distance, best-of-n
psnr2/ssim2/lpips2, 95% CI, metrics.txt + artifact dumps.

TPU-first: trajectories ride the batch axis of one compiled sampler
(vs the reference's python repeat loop); the autoregressive rollout reuses
the same compiled program each round.
"""
from __future__ import annotations

import argparse
import math
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from extdm_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()
import numpy as np


def metric_stuff(values: np.ndarray):
    """mean, std, conf95 (ref scripts/DM/valid.py:24-27)."""
    from scipy import stats

    mean, std = float(np.mean(values)), float(np.std(values))
    conf = std * float(stats.t.ppf((1 + 0.95) / 2.0, len(values) - 1)) / math.sqrt(
        max(len(values), 2)
    )
    return mean, std, conf


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--config", required=True)
    p.add_argument("--checkpoint", default="")
    p.add_argument("--flowae_checkpoint", default="")
    p.add_argument("--arch", default="w_ref_u22/ada_u22")
    p.add_argument("--root_dir", default=None)
    p.add_argument("--log_dir", default="logs/dm_valid")
    p.add_argument("--num_sample_video", type=int, default=4)
    p.add_argument("--total_videos", type=int, default=None)
    p.add_argument("--batch_size", type=int, default=4)
    p.add_argument("--seed", type=int, default=1234)
    p.add_argument("--i3d_params", default="", help="converted I3D weights (msgpack)")
    p.add_argument("--lpips_params", default="",
                   help="converted LPIPS-AlexNet weights (msgpack)")
    p.add_argument("--metrics", default="fvd,psnr,ssim,lpips",
                   help="comma-separated subset of fvd,psnr,ssim,lpips")
    p.add_argument("--dump_flow", action="store_true",
                   help="save GT-vs-predicted flow/conf visualizations "
                        "(ref valid_with_generate_flow_and_conf.py)")
    p.add_argument("--mesh_data", type=int, default=1,
                   help="shard the (videos x trajectories) batch axis over "
                        "this many devices (data-parallel eval; batch_size *"
                        " num_sample_video must divide it)")
    p.add_argument("--mesh_model", type=int, default=1,
                   help="additionally shard the latent H axis of the DDIM "
                        "denoise stage over this many devices (spatial/"
                        "sequence parallelism via GSPMD; for configs whose "
                        "UNet state exceeds one chip's HBM). Total devices "
                        "used = mesh_data * mesh_model.")
    p.add_argument("--dump_arrays", action="store_true",
                   help="save origin/result (+ flows, with --dump_flow) arrays "
                        "for scripts/analyze_dumps.py (ref origin.pt/result.pt dumps)")
    args = p.parse_args()

    from extdm_tpu.config import dm_config_from_yaml, load_config
    from extdm_tpu.data import DataLoader, VideoDataset, to_rgb_video
    from extdm_tpu.metrics import (
        I3DExtractor,
        LPIPSMetric,
        best_trajectory_by_feature_distance,
        calculate_fvd2,
        calculate_psnr2,
        calculate_ssim2,
    )
    from extdm_tpu.models.dm import FlowDiffusion
    from extdm_tpu.train import load_checkpoint, restore_like
    from extdm_tpu.utils import setup_seed
    from scripts.train_dm import load_lfae_variables

    cfg_raw = load_config(args.config)
    if args.root_dir:
        cfg_raw["dataset_params"]["root_dir"] = args.root_dir
    dp = cfg_raw["dataset_params"]
    vp = dp["valid_params"]
    tc = vp["cond_frames"]
    total_pred = vp["pred_frames"]
    root_key = setup_seed(args.seed)
    os.makedirs(args.log_dir, exist_ok=True)

    fd_cfg = dm_config_from_yaml(cfg_raw, arch=args.arch)
    fd = FlowDiffusion(fd_cfg)
    lfae_vars, unet_vars = load_lfae_variables(fd, args.flowae_checkpoint, root_key)
    if args.checkpoint:
        ckpt = load_checkpoint(args.checkpoint)
        unet_vars = {"params": restore_like(unet_vars["params"], ckpt["state"]["unet_params"])}
        print(f"loaded diffusion from {args.checkpoint}")
    # commit restored (host-numpy) weights to the device once; otherwise
    # every sampler call re-uploads them through the tunnel.
    lfae_vars = jax.device_put(lfae_vars)
    unet_vars = jax.device_put(unet_vars)

    num_autoreg = math.ceil(total_pred / fd_cfg.pred_frames)
    print(f"autoregressive rounds: {num_autoreg} x {fd_cfg.pred_frames} frames")

    total_videos = args.total_videos or vp.get("total_videos", 256)
    dataset = VideoDataset(dp["root_dir"], type=vp["type"], total_videos=total_videos,
                           num_frames=tc + total_pred, image_size=dp["frame_shape"],
                           random_time=False, seed=args.seed)
    loader = DataLoader(dataset, args.batch_size, shuffle=False, num_workers=8,
                        drop_last=False, seed=args.seed)

    if args.mesh_model > 1:
        from extdm_tpu.parallel import make_mesh

        n_dev = args.mesh_data * args.mesh_model
        mesh = make_mesh(data=args.mesh_data, model=args.mesh_model,
                         devices=jax.devices()[:n_dev])
        sample_fn = fd.make_spatial_sampler(lfae_vars, unet_vars, mesh)
        print(f"spatial-parallel eval: batch over {args.mesh_data} x "
              f"latent-H over {args.mesh_model} devices")
    elif args.mesh_data > 1:
        from extdm_tpu.parallel import make_mesh

        mesh = make_mesh(model=1, devices=jax.devices()[: args.mesh_data])
        sample_fn = fd.make_sharded_sampler(lfae_vars, unet_vars, mesh)
        print(f"data-parallel eval over {args.mesh_data} devices")
    else:
        sample_fn = fd.make_sampler(lfae_vars, unet_vars)

    n_traj = args.num_sample_video
    real_all, sample_all = [], []
    flow_dump = None
    pred_flows_all = []  # trajectory-0 predicted warp grids per video
    # sampling throughput, measured on this hardware during the eval so
    # accuracy parity and the frames/s/chip north star land in one
    # artifact (first call excluded: compile)
    import time as _time
    sample_calls, sample_secs, sample_frames = 0, 0.0, 0
    for clips, _ in loader:
        video = np.stack([to_rgb_video(c) for c in clips])  # (B, T, H, W, 3)
        B = video.shape[0]
        # trajectories ride the batch axis
        video_rep = np.repeat(video, n_traj, axis=0)
        cond = video_rep[:, :tc]
        preds, pred_grids = [], []
        for r in range(num_autoreg):
            key = jax.random.fold_in(root_key, len(real_all) * 1000 + r)
            _t0 = _time.perf_counter()
            out = sample_fn(key, jnp.asarray(cond))
            pred_pixels = np.asarray(out["sample_out_vid"][:, tc:])
            _dt = _time.perf_counter() - _t0  # asarray above = true host sync
            sample_calls += 1
            if sample_calls > 1:  # first call pays the compile
                sample_secs += _dt
                sample_frames += int(np.prod(pred_pixels.shape[:2]))
            preds.append(pred_pixels)
            if args.dump_arrays and args.dump_flow:
                pred_grids.append(np.asarray(out["sample_vid_grid"][::n_traj, tc:]))
            cond = pred_pixels[:, -tc:] if pred_pixels.shape[1] >= tc else np.concatenate(
                [np.asarray(cond)[:, pred_pixels.shape[1]:], pred_pixels], axis=1
            )
        pred_full = np.concatenate(preds, axis=1)[:, :total_pred]
        if pred_grids:
            pred_flows_all.append(np.concatenate(pred_grids, axis=1)[:, :total_pred])
        sample_vid = np.concatenate([video_rep[:, :tc], pred_full], axis=1)
        real_all.append(video)
        sample_all.append(sample_vid)
        if args.dump_flow and flow_dump is None:
            flow_dump = {k: np.asarray(v) for k, v in out.items()
                         if v is not None and k.endswith(("grid", "conf"))}

    if sample_calls == 1:
        # only one sampler call happened (tiny evals) and it paid the
        # compile — re-run it warm so the throughput line still lands
        _t0 = _time.perf_counter()
        _out = sample_fn(jax.random.fold_in(root_key, 10**6), jnp.asarray(cond))
        _pred = np.asarray(_out["sample_out_vid"][:, tc:])
        sample_secs = _time.perf_counter() - _t0
        sample_frames = int(np.prod(_pred.shape[:2]))

    real = np.concatenate(real_all)  # (N, tc+tp, H, W, 3)
    samples = np.concatenate(sample_all)  # (N*n_traj, tc+tp, H, W, 3)
    N = real.shape[0]
    print(f"evaluated {N} videos x {n_traj} trajectories")

    # --- metrics (reference protocol) -------------------------------------------
    wanted = set(args.metrics.split(","))
    lines = []
    best = samples.reshape(N, n_traj, *samples.shape[1:])[:, 0]

    if "fvd" in wanted:
        i3d_params = None
        if args.i3d_params and os.path.exists(args.i3d_params):
            from extdm_tpu.train import load_checkpoint as _lc

            i3d_params = _lc(args.i3d_params)
        extractor = I3DExtractor(params=i3d_params)
        real_feats = extractor.get_feats(real)
        traj_feats = extractor.get_feats(samples)
        fvd_traj = [
            calculate_fvd2(traj_feats[i::n_traj], real_feats) for i in range(n_traj)
        ]
        best_idx = best_trajectory_by_feature_distance(real_feats, traj_feats, n_traj)
        best = samples.reshape(N, n_traj, *samples.shape[1:])[np.arange(N), best_idx]
        fvd_best = calculate_fvd2(
            traj_feats.reshape(N, n_traj, -1)[np.arange(N), best_idx], real_feats
        )
        fvd_mean, fvd_std, fvd_conf = metric_stuff(np.asarray(fvd_traj))
        lines += [
            f"fvd_traj mean/std/conf95: {fvd_mean:.3f} / {fvd_std:.3f} / {fvd_conf:.3f}",
            f"fvd_best: {fvd_best:.3f}",
            f"i3d_pretrained: {extractor.pretrained}",
        ]

    def tchw(v):  # metrics expect (B, T, C, H, W)
        return v.transpose(0, 1, 4, 2, 3)

    real_rep = np.repeat(real, n_traj, axis=0)
    if "psnr" in wanted:
        psnr2 = calculate_psnr2(tchw(samples), tchw(real_rep), n_traj)
        lines.append(f"psnr2 (best-of-{n_traj}): {psnr2:.3f}")
    if "ssim" in wanted:
        ssim2 = calculate_ssim2(tchw(samples), tchw(real_rep), n_traj)
        lines.append(f"ssim2 (best-of-{n_traj}): {ssim2:.4f}")
    if "lpips" in wanted:
        lpips_params = None
        if args.lpips_params and os.path.exists(args.lpips_params):
            from extdm_tpu.train import load_checkpoint as _lc

            lpips_params = _lc(args.lpips_params)
        lpips_m = LPIPSMetric(params=lpips_params)
        lpips2 = lpips_m.calculate_lpips2(samples, real_rep, n_traj)
        lines += [
            f"lpips2 (best-of-{n_traj}): {lpips2:.4f}",
            f"lpips_pretrained: {lpips_m.pretrained}",
        ]
    if sample_secs > 0:
        lines.append(
            f"sampling_frames_per_sec: {sample_frames / sample_secs:.2f}")
    print("\n".join(lines))
    with open(os.path.join(args.log_dir, "metrics.txt"), "w") as f:
        f.write("\n".join(lines) + "\n")

    # artifact dump: comparison gif of the first video's best trajectory
    from extdm_tpu.utils.visualize import visualize_comparison_gif

    visualize_comparison_gif(
        os.path.join(args.log_dir, "sample0.gif"), real[0], best[0], tc
    )

    if args.dump_arrays:
        # analysis dumps for scripts/analyze_dumps.py (ref origin.pt/result.pt)
        np.save(os.path.join(args.log_dir, "origin.npy"), real)
        traj0 = samples.reshape(N, n_traj, *samples.shape[1:])[:, 0]
        np.save(os.path.join(args.log_dir, "result.npy"), traj0)
        if pred_flows_all:
            # GT warp grids: LFAE encode of the full real video (one compile)
            enc_fn = jax.jit(
                lambda vars_, v: fd.lfae.apply(
                    vars_, v, tc, False, method=type(fd.lfae).encode_video
                )
            )
            gt_flows = []
            bs = max(1, args.batch_size)
            for i in range(0, N, bs):
                enc = enc_fn(lfae_vars, jnp.asarray(real[i : i + bs]))
                gt_flows.append(np.asarray(enc["flow"][:, tc:]))
            np.save(os.path.join(args.log_dir, "origin_flows.npy"),
                    np.concatenate(gt_flows))
            np.save(os.path.join(args.log_dir, "result_flows.npy"),
                    np.concatenate(pred_flows_all))
        print(f"analysis arrays -> {args.log_dir}")

    if args.dump_flow and flow_dump is not None:
        from extdm_tpu.utils.flow_viz import conf2fig, flow2fig
        from extdm_tpu.utils.visualize import save_image

        fdir = os.path.join(args.log_dir, "flow_vis")
        for t in range(flow_dump["sample_vid_grid"].shape[1]):
            save_image(os.path.join(fdir, f"flow_t{t:03d}.png"),
                       flow2fig(flow_dump["sample_vid_grid"][0, t]))
            if flow_dump.get("sample_vid_conf") is not None:
                save_image(os.path.join(fdir, f"conf_t{t:03d}.png"),
                           conf2fig(flow_dump["sample_vid_conf"][0, t]))
        print(f"flow/conf visualizations -> {fdir}")


if __name__ == "__main__":
    main()
