"""Stage-1 (LFAE) training CLI.

Mirrors scripts/AE/run.py + train.py of the reference: config-driven,
TwoFramesDataset, Adam(0.5, 0.999) + MultiStepLR, periodic validation with
FVD-gated best checkpointing, imgshot artifacts, resume with example/epoch
counters.

Usage:
  python scripts/train_ae.py --config configs/AE/kth.yaml \
      [--root_dir DATA] [--log_dir logs/ae_kth] [--max_steps N] \
      [--checkpoint ckpt] [--set_start] [--seed 1234] [--device_batch N]
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from extdm_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()
import numpy as np


def run_ae_validation(cfg, state, seed, num_videos, batch_size, cache):
    """Periodic stage-1 validation (ref scripts/AE/train.py:361-371,
    397-545): the last cond frame is warped to every frame of held-out
    videos via the full LFAE; FVD/PSNR/SSIM/LPIPS on the reconstructions.
    `cache` persists the jitted encode fn, metric backbones, and loader
    across calls. Returns a metrics dict incl. i3d_pretrained."""
    import numpy as np

    from extdm_tpu.data import DataLoader, VideoDataset, to_rgb_video
    from extdm_tpu.metrics import (
        I3DExtractor, LPIPSMetric, calculate_fvd2, calculate_psnr1, calculate_ssim1,
    )
    from extdm_tpu.models.dm.flow_diffusion import LFAE
    from extdm_tpu.train import restore_like

    dp = cfg["dataset_params"]
    vp = dp["valid_params"]
    tc = vp["cond_frames"]
    nf = tc + vp["pred_frames"]
    if "lfae" not in cache:
        lfae = LFAE(flow_params=cfg["flow_params"]["model_params"])
        video0 = jnp.zeros((1, nf, dp["frame_shape"], dp["frame_shape"], 3))
        cache["lfae"] = lfae
        cache["template"] = jax.jit(lfae.init, static_argnums=(2,))(
            jax.random.PRNGKey(0), video0, tc)
        cache["encode"] = jax.jit(
            lambda v, vid: lfae.apply(v, vid, tc, True, method=LFAE.encode_video))
        cache["extractor"] = I3DExtractor()
        cache["lpips"] = LPIPSMetric()
        ds = VideoDataset(dp["root_dir"], type=vp["type"], total_videos=num_videos,
                          num_frames=nf, image_size=dp["frame_shape"],
                          random_time=False, seed=seed)
        cache["loader"] = DataLoader(ds, batch_size, shuffle=False, num_workers=4,
                                     drop_last=False, seed=seed)
    keys = ("region_predictor", "bg_predictor", "generator")
    variables = restore_like(cache["template"], {
        "params": {k: state.params[k] for k in keys},
        "batch_stats": {k: state.batch_stats.get(k, {}) for k in keys},
    })
    reals, recons = [], []
    for clips, _ in cache["loader"]:
        video = jnp.asarray(np.stack([to_rgb_video(c) for c in clips]))
        out = cache["encode"](variables, video)
        reals.append(np.asarray(video))
        recons.append(np.asarray(out["out_vid"], np.float32))
    real = np.concatenate(reals)
    recon = np.concatenate(recons)

    def tchw(v):
        return v.transpose(0, 1, 4, 2, 3)

    psnr, _ = calculate_psnr1(tchw(recon), tchw(real))
    ssim, _ = calculate_ssim1(tchw(recon), tchw(real))
    fvd = calculate_fvd2(cache["extractor"].get_feats(recon),
                         cache["extractor"].get_feats(real))
    lp, _ = cache["lpips"].calculate_lpips1(recon, real)
    return {"valid_fvd": fvd, "valid_psnr": float(psnr["psnr"]),
            "valid_ssim": float(ssim["ssim"]), "valid_lpips": float(lp["lpips"]),
            "i3d_pretrained": float(cache["extractor"].pretrained),
            "lpips_pretrained": float(cache["lpips"].pretrained)}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--config", required=True)
    p.add_argument("--root_dir", default=None)
    p.add_argument("--log_dir", default="logs/ae")
    p.add_argument("--max_steps", type=int, default=None)
    p.add_argument("--checkpoint", default="")
    p.add_argument("--set_start", action="store_true")
    p.add_argument("--seed", type=int, default=1234)
    p.add_argument("--batch_size", type=int, default=None)
    p.add_argument("--valid_every", type=int, default=None,
                   help="validate every N steps with FVD-gated best ckpt "
                        "(default: the config's update_ckpt_freq, matching "
                        "ref scripts/AE/train.py:361-371; 0 = off)")
    p.add_argument("--valid_videos", type=int, default=16)
    p.add_argument("--valid_batch_size", type=int, default=8)
    p.add_argument("--learnable_loss_weights", action="store_true")
    p.add_argument("--bf16", action="store_true",
                   help="bf16 compute policy (params/BN stats stay f32; "
                        "default f32 matches the reference numerics; "
                        "measured +14%% step throughput on v5e)")
    p.add_argument("--nan_guard", type=int, default=0,
                   help="skip non-finite update steps in-graph; error after "
                        "N consecutive bad steps (0 = off)")
    p.add_argument("--shard_map", action="store_true",
                   help="explicit shard_map DP step with cross-replica "
                        "SyncBN instead of the GSPMD/pjit path")
    p.add_argument("--loader", default="thread", choices=["thread", "process"],
                   help="worker type: 'process' forks one worker per batch "
                        "(wins on multi-core hosts where cv2 augmentation "
                        "is GIL-bound; neutral on single-core)")
    p.add_argument("--device_augment", action="store_true",
                   help="ship RAW uint8 pairs and run the flip/jitter "
                        "augmentation in-graph (1/12th the host->device "
                        "bytes; requires a geometry-preserving pipeline — "
                        "see train/device_augment.py)")
    args = p.parse_args()

    from extdm_tpu.config import ae_model_kwargs, load_config
    from extdm_tpu.data import DataLoader, DatasetRepeater, TwoFramesDataset
    from extdm_tpu.models.lfae import ReconstructionModel
    from extdm_tpu.parallel import make_data_mesh, shard_batch
    from extdm_tpu.train import AETrainer, load_checkpoint, save_checkpoint, start_step_from_example
    from extdm_tpu.train.ae_trainer import make_optimizer
    from extdm_tpu.utils import Logger, MetricLogger, StepTimer, setup_seed

    cfg = load_config(args.config)
    if args.root_dir:
        cfg["dataset_params"]["root_dir"] = args.root_dir
    dp = cfg["dataset_params"]
    tp = cfg["flow_params"]["train_params"]
    batch_size = args.batch_size or tp["batch_size"]

    os.makedirs(args.log_dir, exist_ok=True)
    sys.stdout = Logger(os.path.join(args.log_dir, "train.log"))
    metrics_log = MetricLogger(os.path.join(args.log_dir, "metrics.jsonl"))
    root_key = setup_seed(args.seed)

    aug_params = dp.get("augmentation_params")
    device_aug = None
    if args.device_augment:
        known = {"flip_param", "jitter_param", "resize_param",
                 "rotation_param", "crop_param"}
        extra = set(aug_params or ()) - known
        if extra:
            raise SystemExit(f"--device_augment supports {sorted(known)}; "
                             f"config also has {sorted(extra)}")
        device_aug = {k: (aug_params or {}).get(k) for k in known}
    dataset = TwoFramesDataset(
        dp["root_dir"],
        type=dp["train_params"]["type"],
        frame_shape=dp["frame_shape"],
        min_frame_distance=dp.get("min_frame_distance", 0),
        max_frame_distance=dp.get("max_frame_distance", 50),
        augmentation_params=None if args.device_augment else aug_params,
        seed=args.seed,
        raw_uint8=args.device_augment,
    )
    dataset = DatasetRepeater(dataset, tp.get("num_repeats", 1))
    if int(os.environ.get("EXTDM_CLIP_CACHE_MB", "0")):
        import time as _time
        _t0 = _time.perf_counter()
        _n = dataset.prefill_cache()
        print(f"clip cache prefilled: {_n} videos in "
              f"{_time.perf_counter() - _t0:.1f}s")
    mesh = make_data_mesh(batch_size)
    print(f"mesh: {dict(mesh.shape)}")

    def _to_device(batch):
        """Producer-thread collate->device: the transfer overlaps the
        previous device step (round-2 AE runs spent 55% of step time in
        host-side data work serialized after each step)."""
        return {k: shard_batch(jnp.asarray(v), mesh)
                for k, v in batch.items() if k in ("source", "driving")}

    loader = DataLoader(dataset, batch_size, num_workers=tp.get("dataloader_workers", 8),
                        seed=args.seed, worker_type=args.loader,
                        prefetch=3, device_put=_to_device)

    model = ReconstructionModel(train=True,
                                dtype=jnp.bfloat16 if args.bf16 else None,
                                **ae_model_kwargs(cfg))

    init_batch = {
        "source": jnp.zeros((2, dp["frame_shape"], dp["frame_shape"], 3)),
        "driving": jnp.zeros((2, dp["frame_shape"], dp["frame_shape"], 3)),
    }
    # jit the init: eager init dispatches thousands of tiny ops one by one
    # — through the tunneled TPU that is minutes of RTT before training
    # even starts (observed 10+ min for the 78M-param LFAE).
    variables = jax.jit(model.init)(
        {"params": root_key, "tps": jax.random.PRNGKey(0)}, init_batch)
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(variables["params"]))
    print(f"LFAE parameters: {n_params/1e6:.2f}M")

    sched = tp["scheduler_param"]
    trainer = AETrainer(model, make_optimizer(tp["lr"], sched["milestones"], sched["gamma"],
                                              nan_guard=args.nan_guard),
                        learnable_loss_weights=args.learnable_loss_weights,
                        device_augment=device_aug)
    state = trainer.init_state(variables)

    start_step = 0
    if args.checkpoint:
        ckpt = load_checkpoint(args.checkpoint)
        from extdm_tpu.train import restore_like

        state = restore_like(state, ckpt["state"])
        if args.set_start:
            start_step = start_step_from_example(ckpt["example"], batch_size)
        print(f"resumed from {args.checkpoint} at step {start_step}")

    if args.shard_map:
        step_fn = trainer.shard_mapped_train_step(mesh)
        print("explicit shard_map DP train step (SyncBN over 'data')")
    else:
        step_fn = trainer.jitted_train_step()
    timer = StepTimer()
    step = start_step
    max_steps = args.max_steps or (tp["max_epochs"] * max(len(loader), 1))
    print_freq = tp.get("print_freq", 100)
    save_freq = tp.get("update_ckpt_freq", 2500)
    valid_every = save_freq if args.valid_every is None else args.valid_every
    best_fvd = float("inf")
    valid_cache = {}
    img_freq = tp.get("save_img_freq", 0)
    imgshot_dir = os.path.join(args.log_dir, "imgshots")

    from extdm_tpu.train.device_augment import canonicalize_images

    imgshot_apply = jax.jit(lambda v, b: model.apply(
        v, {k: canonicalize_images(x) for k, x in b.items()},
        rngs={"tps": jax.random.PRNGKey(0)}, mutable=["batch_stats"]))

    def save_imgshot(state, batch, step):
        """Region diagnostics grid (reference imgshot, scripts/AE/train.py:324).
        The apply MUST be jitted: eager dispatch of the full LFAE forward
        through the tunneled TPU is minutes of RTT per imgshot (measured
        stalling the round-4 evidence run ~8 min at step 2500)."""
        from extdm_tpu.utils.visualize import RegionVisualizer, save_image

        (_, generated), _ = imgshot_apply(
            {"params": state.params, "batch_stats": state.batch_stats}, batch)
        out = {k: np.asarray(v) if not isinstance(v, dict)
               else {kk: np.asarray(vv) for kk, vv in v.items()}
               for k, v in generated.items()
               if k in ("prediction", "deformed", "occlusion_map",
                        "source_region_params", "driving_region_params")}
        grid = RegionVisualizer(kp_size=2).visualize(
            np.asarray(canonicalize_images(jnp.asarray(batch["source"]))),
            np.asarray(canonicalize_images(jnp.asarray(batch["driving"]))),
            out)
        save_image(os.path.join(imgshot_dir, f"step{step:07d}.png"), grid)

    with mesh:
        while step < max_steps:
            for batch in loader:
                if step >= max_steps:
                    break
                timer.mark_data()
                key = jax.random.fold_in(root_key, step)
                state, aux = step_fn(state, key, batch)
                if step % 8 == 7:
                    # real device->host read: bounds async-dispatch
                    # run-ahead (see scripts/train_dm.py)
                    float(aux["loss_total"])
                timer.mark_step()
                if step % print_freq == 0:
                    vals = {k: float(v) for k, v in aux.items()}
                    from extdm_tpu.train.dm_trainer import notfinite_count
                    nf = notfinite_count(state.opt_state)
                    if nf is not None:
                        vals["skipped_nonfinite"] = float(nf)
                    metrics_log.log(step, **vals, batch_time=timer.batch_time.avg,
                                    data_time=timer.data_time.avg)
                    print(f"step {step}: " + " ".join(f"{k}={v:.4f}" for k, v in vals.items()))
                    # per-WINDOW averages: each jsonl record covers only
                    # the steps since the previous print
                    timer.reset()
                if step > 0 and step % save_freq == 0:
                    save_checkpoint(
                        os.path.join(args.log_dir, "RegionMM.ckpt"),
                        {"example": step * batch_size, "step": step, "state": state},
                    )
                if img_freq and step > 0 and step % img_freq == 0:
                    save_imgshot(state, batch, step)
                if valid_every and step > 0 and step % valid_every == 0:
                    vm = run_ae_validation(cfg, state, args.seed, args.valid_videos,
                                           args.valid_batch_size, valid_cache)
                    metrics_log.log(step, **vm)
                    print(f"valid @ {step}: " + " ".join(f"{k}={v:.4f}" for k, v in vm.items()))
                    if not vm["i3d_pretrained"]:
                        print("WARNING: FVD computed with a RANDOM-INIT I3D: "
                              "the random feature space is degenerate (FVD ~0 "
                              "for every checkpoint), so best-ckpt gating "
                              "falls back to SSIM.")
                    from extdm_tpu.train import gate_best, select_gate_metric
                    sort_val, disp_val, crit = select_gate_metric(vm)
                    if sort_val < best_fvd:
                        best_fvd = sort_val
                        ck = os.path.join(args.log_dir, "RegionMM.ckpt")
                        save_checkpoint(ck, {"example": step * batch_size,
                                             "step": step, "state": state})
                        prefix = "RegionMM" if crit == "fvd" else f"RegionMM_{crit}"
                        gate_best(ck, args.log_dir, disp_val, prefix)
                # periodic valid/ckpt/imgshot time is not loader wait —
                # re-anchor so it can't land in the next data_time sample
                timer.skip()
                step += 1

    save_checkpoint(os.path.join(args.log_dir, "RegionMM.ckpt"),
                    {"example": step * batch_size, "step": step, "state": state})
    print(f"done at step {step}")


if __name__ == "__main__":
    main()
