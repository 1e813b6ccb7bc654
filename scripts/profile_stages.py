"""Stage-level profiler for the flagship KTH pipeline on the real chip.

Times each separately-jitted stage of the sampler (LFAE encode / DDIM scan /
finalize+decode), one bare UNet forward, and the train step's forward-only
vs forward+backward split. All timings force a device->host element read
(the tunneled runtime's block_until_ready returns optimistically) and report
the median over --iters calls; subtract ~32 ms tunnel round-trip per call
when comparing stages.

Usage: python scripts/profile_stages.py [--batch 32] [--train_batch 8] [--iters 5]
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


def timed(label, fn, *args, iters=5, sync=None):
    """Median wall time of fn; sync extracts one element of the output."""
    out = fn(*args)
    if sync is None:
        sync = lambda o: jax.tree_util.tree_leaves(o)[0]
    float(np.asarray(sync(out)).ravel()[0])  # compile + settle
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        float(np.asarray(sync(out)).ravel()[0])
        ts.append(time.perf_counter() - t0)
    med = float(np.median(ts)) * 1e3
    print(f"{label:34s} {med:9.1f} ms   (raw: {[round(t*1e3) for t in ts]})")
    return med


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--train_batch", type=int, default=8)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--skip_train", action="store_true")
    ap.add_argument("--skip_sample", action="store_true")
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

    if not args.skip_sample:
        B = args.batch
        cond = jnp.asarray(np.random.RandomState(0).rand(B, tc, 64, 64, 3), jnp.float32)
        key = jax.random.PRNGKey(1)

        encode = jax.jit(lambda lv, c: fd.lfae.apply(
            lv, c, tc, method=type(fd.lfae).encode_video))
        enc = encode(lv, cond)
        timed("sample/encode", encode, lv, cond, iters=args.iters,
              sync=lambda o: o["flow"][0, 0, 0, 0, 0])

        reffeat = jax.jit(lambda lv, c: fd.lfae.apply(
            lv, c, tc, tp, method=type(fd.lfae).ref_features))
        fea = reffeat(lv, cond)
        timed("sample/ref_features", reffeat, lv, cond, iters=args.iters,
              sync=lambda o: o[0, 0, 0, 0, 0])

        x_cond = jax.jit(fd.latents_from_encode)(enc)

        @jax.jit
        def ddim(uv, key, x_cond, fea):
            cache = fd.cond_cache(uv, x_cond, fea)
            return fd.diffusion.sample(fd.denoise_fn(uv, cache), key, x_cond, tp, fea)
        pred = ddim(uv, key, x_cond, fea)
        timed("sample/ddim_x10", ddim, uv, key, x_cond, fea, iters=args.iters,
              sync=lambda o: o[0, 0, 0, 0, 0])

        @jax.jit
        def unet_fwd(uv, x, x_cond, fea):
            t = jnp.zeros((x.shape[0],), jnp.int32)
            return fd.unet.apply(uv, x, t, x_cond, fea, path=cfg.path)
        timed("sample/unet_fwd_x1", unet_fwd, uv, pred, x_cond, fea,
              iters=args.iters, sync=lambda o: o[0, 0, 0, 0, 0])

        @jax.jit
        def decode(lv, cond_video, flow, conf):
            return fd.lfae.apply(lv, cond_video[:, tc - 1], flow, conf,
                                 method=type(fd.lfae).decode_flows)
        conf = jnp.asarray(np.random.RandomState(2).rand(B, tp, 32, 32, 1), jnp.float32)
        timed("sample/decode_pred_frames", decode, lv, cond,
              fd.flow_from_pred(pred), conf, iters=args.iters,
              sync=lambda o: o["out_vid"][0, 0, 0, 0, 0])

    if not args.skip_train:
        from extdm_tpu.train.dm_trainer import DMTrainer, make_optimizer
        B = args.train_batch
        video = jnp.asarray(
            np.random.RandomState(3).rand(B, tc + tp, 64, 64, 3), jnp.float32)
        key = jax.random.PRNGKey(4)

        loss_fwd = jax.jit(lambda uv, lv, k, v: fd.loss(lv, uv, k, v)[0])
        timed("train/loss_fwd_only", loss_fwd, uv, lv, key, video,
              iters=args.iters, sync=lambda o: o)

        grad_fn = jax.jit(lambda uv, lv, k, v: jax.grad(
            lambda u: fd.loss(lv, u, k, v)[0])(uv))
        timed("train/loss_fwd_bwd", grad_fn, uv, lv, key, video,
              iters=args.iters,
              sync=lambda g: jax.tree_util.tree_leaves(g)[0])

        tx = make_optimizer(1e-4, milestones=[100000], gamma=0.5)
        trainer = DMTrainer(fd, tx)
        state = trainer.init_state(uv)
        step = trainer.jitted_train_step(donate=False)
        timed("train/full_step", step, state, lv, key, video, iters=args.iters,
              sync=lambda o: o[1]["loss"])


if __name__ == "__main__":
    main()
