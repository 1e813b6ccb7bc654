"""Chained-scan microbenchmark of the fused UNet layers on the real chip.

`profile_unet_layers.py` times ONE jitted call per measurement and
subtracts a fixed ~32 ms tunnel round trip — sub-10 ms layers drown in
RTT variance (observed: the same-shape temporal layer reading 0.66 ms at
C=128 and 8.59 ms at C=256). Here each layer runs K times INSIDE one jit
via `lax.scan` chaining (the output feeds the next iteration's input, so
XLA cannot CSE the repeats), amortizing the RTT 1/K and yielding
per-layer times stable to ~0.1 ms.

Usage: python scripts/ubench_layers.py [--batch 32] [--chain 16]
       [--iters 3] [--only stw|temporal|resnet|adaptor]
"""
from __future__ import annotations

import argparse
import functools
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

HEADS, DIM_HEAD = 8, 32
T = 30
TC, TP = 10, 20
WINDOW = (4, 4, 4)
SHIFT = (2, 2, 2)
TIME_DIM = 256


def _sync(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    return float(np.asarray(leaf[tuple(0 for _ in leaf.shape)]))


def chain_timed_ms(layer_fn, x, chain, iters):
    """Median per-application ms of layer_fn chained `chain` times in-jit."""

    @jax.jit
    def run(x0):
        def body(c, _):
            return layer_fn(c), None
        return jax.lax.scan(body, x0, None, length=chain)[0]

    _sync(run(x))  # compile + warm
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        _sync(run(x))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)) * 1e3 / chain


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--chain", type=int, default=16)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--only", default=None,
                    choices=[None, "stw", "temporal", "resnet", "adaptor"])
    args = ap.parse_args()
    B = args.batch

    from extdm_tpu.ops import pallas_stw
    from extdm_tpu.models.dm.unet3d import ResnetBlock3d
    from extdm_tpu.models.dm.adaptor import MotionAdaptor

    rng = np.random.RandomState(0)

    def arr(*shape, dtype=jnp.bfloat16):
        return jnp.asarray(rng.randn(*shape).astype(np.float32), dtype=dtype)

    hidden = HEADS * DIM_HEAD
    # layer inventory of the flagship KTH UNet (see profile_unet_layers.py)
    stw_pairs = {(32, 64): 2, (16, 128): 1, (16, 64): 1,
                 (8, 256): 1, (8, 128): 1, (4, 256): 3}
    tattn = {(32, 64): 3, (16, 128): 1, (16, 64): 1,
             (8, 256): 1, (8, 128): 1, (4, 256): 2}
    res = {
        (32, 64, 64): 3, (16, 128, 128): 1, (8, 256, 256): 1,
        (4, 256, 256): 4, (4, 512, 256): 2, (8, 128, 128): 1,
        (16, 64, 64): 1, (32, 128, 64): 3,
        # non-square in/out need a wrapper to chain; approximate with the
        # square instances (the 1x1 res_conv adds <10% of block FLOPs):
        (16, 64, 128): 1, (8, 128, 256): 1, (8, 512, 128): 1,
        (16, 256, 64): 1,
    }
    ada = {(32, 64): 2, (16, 64): 1, (16, 128): 1, (8, 256): 1, (4, 256): 2}

    cat_ms = {}

    def record(cat, ms, count, label):
        cat_ms.setdefault(cat, 0.0)
        cat_ms[cat] += ms * count
        print(f"  {label:34s} {ms:7.2f} ms x{count}", flush=True)

    print(f"batch={B} T={T} chain={args.chain} heads={HEADS} dim_head={DIM_HEAD}")

    if args.only in (None, "stw"):
        for (S, C), count in sorted(stw_pairs.items()):
            x = arr(B, T, S, S, C)
            gamma = arr(C, dtype=jnp.float32)
            w_qkv = arr(C, 3 * hidden, dtype=jnp.float32) * 0.05
            w_proj = arr(hidden, C, dtype=jnp.float32) * 0.02
            b_proj = arr(C, dtype=jnp.float32) * 0.01
            wd = (min(WINDOW[0], T), min(WINDOW[1], S), min(WINDOW[2], S))
            N = wd[0] * wd[1] * wd[2]
            bias = arr(HEADS, N, N, dtype=jnp.float32) * 0.01
            for shift, tag in ((SHIFT, "shift"), ((0, 0, 0), "plain")):
                sh = tuple(min(s, w // 2) for s, w in zip(shift, wd))
                f = functools.partial(
                    pallas_stw.fused_stw_layer, gamma=gamma, w_qkv=w_qkv,
                    w_proj=w_proj, b_proj=b_proj, bias_hnn=bias, window=wd,
                    shift=sh, heads=HEADS, dim_head=DIM_HEAD)
                ms = chain_timed_ms(f, x, args.chain, args.iters)
                record("stw", ms, count, f"stw/{tag} S={S} C={C}")

    if args.only in (None, "temporal"):
        for (S, C), count in sorted(tattn.items()):
            x = arr(B, T, S, S, C)
            f = functools.partial(
                pallas_stw.fused_temporal_layer,
                gamma_cln=arr(C, dtype=jnp.float32),
                ln_scale=arr(C, dtype=jnp.float32),
                ln_bias=arr(C, dtype=jnp.float32) * 0.01,
                w_qkv=arr(C, 3 * hidden, dtype=jnp.float32) * 0.05,
                w_proj=arr(hidden, C, dtype=jnp.float32) * 0.02,
                bias_hnn=arr(HEADS, T, T, dtype=jnp.float32) * 0.01,
                heads=HEADS, dim_head=DIM_HEAD)
            ms = chain_timed_ms(f, x, args.chain, args.iters)
            record("temporal", ms, count, f"tattn S={S} C={C}")

    if args.only in (None, "resnet"):
        t_emb = arr(B, TIME_DIM)
        merged = {}
        for (S, Cin, Cout), count in sorted(res.items()):
            merged[(S, max(Cin, Cout))] = merged.get((S, max(Cin, Cout)), 0) + count
        for (S, C), count in sorted(merged.items()):
            mod = ResnetBlock3d(C, 8, jnp.bfloat16)
            params = mod.init(jax.random.PRNGKey(0),
                              jnp.zeros((1, 1, 4, 4, C), jnp.bfloat16),
                              jnp.zeros((1, TIME_DIM), jnp.bfloat16))
            x = arr(B, T, S, S, C)
            f = lambda a, p=params, m=mod: m.apply(p, a, t_emb)
            ms = chain_timed_ms(f, x, args.chain, args.iters)
            record("resnet", ms, count, f"res S={S} C={C}")

    if args.only in (None, "adaptor"):
        for (S, C), count in sorted(ada.items()):
            mod = MotionAdaptor(TC, TP, jnp.bfloat16)
            params = mod.init(jax.random.PRNGKey(0),
                              jnp.zeros((1, T, 4, 4, C), jnp.bfloat16))
            x = arr(B, T, S, S, C)
            f = lambda a, p=params, m=mod: m.apply(p, a)
            ms = chain_timed_ms(f, x, args.chain, args.iters)
            record("adaptor", ms, count, f"ada S={S} C={C}")

    print("\ncategory totals (per UNet forward):")
    total = 0.0
    for cat, ms in sorted(cat_ms.items(), key=lambda kv: -kv[1]):
        print(f"  {cat:10s} {ms:8.1f} ms")
        total += ms
    print(f"  {'SUM':10s} {total:8.1f} ms   (+ convs/biases/glue not modeled)")


if __name__ == "__main__":
    main()
