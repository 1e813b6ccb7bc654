"""Dump the compiled HLO of the flagship UNet forward and locate a named
op (default: the largest fusions) for layout/fusion forensics.

Usage: python scripts/dump_hlo.py [--batch 32] [--grep fusion.61]
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
    ap.add_argument("--grep", default=None)
    ap.add_argument("--out", default="/tmp/unet_fwd.hlo")
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
    enc = jax.jit(lambda lv, c: fd.lfae.apply(
        lv, c, tc, method=type(fd.lfae).encode_video))(lv, cond)
    fea = jax.jit(lambda lv, c: fd.lfae.apply(
        lv, c, tc, tp, method=type(fd.lfae).ref_features))(lv, cond)
    x_cond = jax.jit(fd.latents_from_encode)(enc)
    x = jnp.asarray(np.random.RandomState(1).rand(B, tp, 32, 32, 3), jnp.float32)

    @jax.jit
    def fn(uv, x, x_cond, fea):
        t = jnp.zeros((x.shape[0],), jnp.int32)
        return fd.unet.apply(uv, x, t, x_cond, fea, path=cfg.path)

    txt = fn.lower(uv, x, x_cond, fea).compile().as_text()
    with open(args.out, "w") as f:
        f.write(txt)
    print(f"wrote {len(txt)} bytes to {args.out}")
    if args.grep:
        import re
        pat = re.escape(args.grep)
        for i, line in enumerate(txt.splitlines()):
            if re.search(pat + r"\b", line):
                print(line[:400])


if __name__ == "__main__":
    main()
