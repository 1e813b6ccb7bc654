"""Training-step benchmark: DM train step (frozen-LFAE encode + UNet
fwd/bwd + AdamW) on the KTH-shaped flagship config.

Usage:
    python scripts/bench_train.py [--batch 8] [--iters 5]
Env:
    EXTDM_PALLAS_STW=0   disable fused attention kernels entirely
    EXTDM_PALLAS_BWD=0   fused forward only, XLA-recompute backward

Prints one JSON line {"metric", "value", "unit", "frames_per_sec"}.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

_CACHE = os.environ.get(
    "EXTDM_JAX_CACHE",
    os.path.join(os.path.expanduser("~"), ".cache", "extdm_jax"))
os.makedirs(_CACHE, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _CACHE)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np


def bench_ae(args):
    """Stage-1 (LFAE) train step: region/bg predictors + generator fwd,
    VGG19 multi-scale perceptual + TPS equivariance + recon losses,
    Adam update — the full scripts/AE/train.py iteration."""
    import yaml

    from extdm_tpu.config import ae_model_kwargs
    from extdm_tpu.models.lfae.recon_model import ReconstructionModel
    from extdm_tpu.train.ae_trainer import AETrainer, make_optimizer

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, "configs/AE/kth.yaml")) as f:
        cfg = yaml.safe_load(f)
    model = ReconstructionModel(
        train=True, dtype=jnp.bfloat16 if args.bf16 else None,
        **ae_model_kwargs(cfg))
    hw = cfg["dataset_params"]["frame_shape"]
    init_batch = {"source": jnp.zeros((2, hw, hw, 3)),
                  "driving": jnp.zeros((2, hw, hw, 3))}
    variables = model.init({"params": jax.random.PRNGKey(0),
                            "tps": jax.random.PRNGKey(1)}, init_batch)
    tp = cfg["flow_params"]["train_params"]
    sched = tp["scheduler_param"]
    trainer = AETrainer(model, make_optimizer(tp["lr"], sched["milestones"],
                                              sched["gamma"]))
    state = trainer.init_state(variables)
    step_fn = jax.jit(trainer.train_step)

    rs = np.random.RandomState(0)
    batch = {"source": jnp.asarray(rs.rand(args.batch, hw, hw, 3), jnp.float32),
             "driving": jnp.asarray(rs.rand(args.batch, hw, hw, 3), jnp.float32)}
    state, aux = step_fn(state, jax.random.PRNGKey(2), batch)
    float(np.asarray(aux["loss_total"] if "loss_total" in aux else
                     list(aux.values())[0]))
    times = []
    for i in range(args.iters):
        t0 = time.perf_counter()
        state, aux = step_fn(state, jax.random.fold_in(jax.random.PRNGKey(3), i), batch)
        float(np.asarray(list(aux.values())[0]))
        times.append(time.perf_counter() - t0)
    print("per-iter seconds:", [round(t, 3) for t in times], file=sys.stderr)
    ms = float(np.median(times)) * 1000.0
    print(json.dumps({
        "metric": "kth_ae_train_step",
        "value": round(ms, 1),
        "unit": "ms/step",
        "pairs_per_sec": round(args.batch / (ms / 1000.0), 1),
        "batch": args.batch,
        "bf16": args.bf16,
        "loss_total": round(float(np.asarray(aux["loss_total"])), 4),
    }))


def main():
    ap = argparse.ArgumentParser()
    # batch 16 is the single-chip throughput sweet spot (measured: b8 694,
    # b16 751 (remat) / 775 (no-remat) frames/s; b32 OOMs HBM)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--no-remat", action="store_true")
    ap.add_argument("--donate", action="store_true",
                    help="donate the train state like the real trainer loop")
    ap.add_argument("--stage", default="dm", choices=["dm", "ae"])
    ap.add_argument("--bf16", action="store_true",
                    help="AE stage only: bf16 compute policy (f32 matches the reference)")
    args = ap.parse_args()

    if args.stage == "ae":
        bench_ae(args)
        return

    from bench import KTH_FLOW_PARAMS
    from extdm_tpu.models.dm import FlowDiffusion, FlowDiffusionConfig
    from extdm_tpu.train.dm_trainer import DMTrainer, make_optimizer

    cfg = FlowDiffusionConfig(
        flow_params=KTH_FLOW_PARAMS,
        cond_frames=10,
        pred_frames=20,
        frame_shape=64,
        timesteps=1000,
        sampling_timesteps=10,
        dim=64,
        dim_mults=(1, 2, 4, 4),
        attn_heads=8,
        attn_dim_head=32,
        remat=not args.no_remat,
        dtype=jnp.bfloat16,
    )
    fd = FlowDiffusion(cfg)
    lfae_vars, unet_vars = fd.init_variables(jax.random.PRNGKey(0))

    trainer = DMTrainer(fd, make_optimizer(2e-4, (500000,), 0.5))
    state = trainer.init_state(unet_vars)
    step_fn = trainer.jitted_train_step(donate=args.donate)

    T = cfg.cond_frames + cfg.pred_frames
    video = jnp.asarray(
        np.random.RandomState(0).rand(args.batch, T, 64, 64, 3), jnp.float32)

    state, aux = step_fn(state, lfae_vars, jax.random.PRNGKey(1), video)
    float(np.asarray(aux["loss"]))  # true host sync (tunneled device)

    times = []
    for i in range(args.iters):
        t0 = time.perf_counter()
        state, aux = step_fn(state, lfae_vars, jax.random.fold_in(jax.random.PRNGKey(2), i), video)
        float(np.asarray(aux["loss"]))
        times.append(time.perf_counter() - t0)
    print("per-iter seconds:", [round(t, 3) for t in times], file=sys.stderr)
    ms = float(np.median(times)) * 1000.0
    fps = args.batch * T / (ms / 1000.0)
    print(json.dumps({
        "metric": "kth_dm_train_step",
        "value": round(ms, 1),
        "unit": "ms/step",
        "frames_per_sec": round(fps, 1),
        "batch": args.batch,
        "pallas_stw": os.environ.get("EXTDM_PALLAS_STW", "1"),
        "pallas_bwd": os.environ.get("EXTDM_PALLAS_BWD", "1"),
        "remat": not args.no_remat,
        "donate": args.donate,
    }))


if __name__ == "__main__":
    main()
