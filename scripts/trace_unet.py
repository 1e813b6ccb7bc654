"""Capture a device trace of the flagship UNet forward (and optionally the
train step) on the real chip, for op-level analysis.

Produces a TensorBoard xplane trace under --logdir; parse it with
scripts/parse_trace.py (host-side, no TPU needed).

Usage: python scripts/trace_unet.py [--batch 32] [--logdir /tmp/unet_trace]
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax

_CACHE = os.environ.get(
    "EXTDM_JAX_CACHE",
    os.path.join(os.path.expanduser("~"), ".cache", "extdm_jax"))
os.makedirs(_CACHE, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _CACHE)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--logdir", default="/tmp/unet_trace")
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--stage", default="unet", choices=["unet", "encode", "decode"])
    args = ap.parse_args()

    from bench import KTH_FLOW_PARAMS
    from extdm_tpu.models.dm import FlowDiffusion, FlowDiffusionConfig

    cfg = FlowDiffusionConfig(
        flow_params=KTH_FLOW_PARAMS, cond_frames=10, pred_frames=20,
        frame_shape=64, timesteps=1000, sampling_timesteps=10,
        dim=64, dim_mults=(1, 2, 4, 4), attn_heads=8, attn_dim_head=32,
        dtype=jnp.bfloat16,
    )
    fd = FlowDiffusion(cfg)
    lv, uv = fd.init_variables(jax.random.PRNGKey(0))
    tc, tp = cfg.cond_frames, cfg.pred_frames
    B = args.batch

    cond = jnp.asarray(np.random.RandomState(0).rand(B, tc, 64, 64, 3), jnp.float32)
    encode = jax.jit(lambda lv, c: fd.lfae.apply(
        lv, c, tc, method=type(fd.lfae).encode_video))
    enc = encode(lv, cond)
    reffeat = jax.jit(lambda lv, c: fd.lfae.apply(
        lv, c, tc, tp, method=type(fd.lfae).ref_features))
    fea = reffeat(lv, cond)
    x_cond = jax.jit(fd.latents_from_encode)(enc)
    x = jnp.asarray(np.random.RandomState(1).rand(B, tp, 32, 32, 3), jnp.float32)

    if args.stage == "unet":
        @jax.jit
        def fn(uv, x, x_cond, fea):
            t = jnp.zeros((x.shape[0],), jnp.int32)
            return fd.unet.apply(uv, x, t, x_cond, fea, path=cfg.path)
        fargs = (uv, x, x_cond, fea)
        sync = lambda o: float(np.asarray(o[0, 0, 0, 0, 0]))
    elif args.stage == "encode":
        fn = encode
        fargs = (lv, cond)
        sync = lambda o: float(np.asarray(o["flow"][0, 0, 0, 0, 0]))
    elif args.stage == "decode":
        @jax.jit
        def fn(lv, cond, flow, conf):
            return fd.lfae.apply(lv, cond[:, tc - 1], flow, conf,
                                 method=type(fd.lfae).decode_flows)
        flow = jnp.asarray(np.random.RandomState(2).rand(B, tp, 32, 32, 2) * 2 - 1,
                           jnp.float32)
        conf = jnp.asarray(np.random.RandomState(3).rand(B, tp, 32, 32, 1),
                           jnp.float32)
        fargs = (lv, cond, flow, conf)
        sync = lambda o: float(np.asarray(o["out_vid"][0, 0, 0, 0, 0]))
    else:
        sys.exit(f"unknown stage {args.stage}")

    sync(fn(*fargs))  # compile + settle
    sync(fn(*fargs))

    jax.profiler.start_trace(args.logdir)
    for _ in range(args.iters):
        sync(fn(*fargs))
    jax.profiler.stop_trace()
    print("trace written to", args.logdir)


if __name__ == "__main__":
    main()
