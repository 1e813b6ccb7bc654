"""Chained-scan fwd+bwd microbenchmark of the fused temporal layer at the
flagship hot shape — the A/B harness for the temporal-backward block-size
probe (round-5 queue item: "the temporal backward's 3.4x fwd/bwd ratio").

Chains K layer applications inside one jit (output feeds the next input,
so XLA cannot CSE), takes grad of a scalar of the chain w.r.t. x and all
layer params — K forwards + K backwards per measured call, amortizing the
~32 ms tunnel RTT 1/K.

Arms are selected via env, e.g.:
    python scripts/ubench_temporal_bwd.py                      # default
    EXTDM_TEMPORAL_BWD_TOKENS=2048 EXTDM_TEMPORAL_BWD_MULT=2 \
    EXTDM_PALLAS_VMEM_MB=128 python scripts/ubench_temporal_bwd.py

stdout: one JSON object {"arm": ..., "fwdbwd_ms": ..., "fwd_ms": ...}.
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

HEADS, DIM_HEAD = 8, 32


def _read(out):
    """Force a device->host scalar read — the tunnel's block_until_ready
    returns optimistically, so only a host read really syncs."""
    leaf = jax.tree_util.tree_leaves(out)[0]
    return float(np.asarray(leaf[tuple(0 for _ in leaf.shape)]))


def timed(fn, args_, iters):
    _read(fn(*args_))  # compile + warm
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        _read(fn(*args_))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)) * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=24)
    ap.add_argument("--size", type=int, default=32)
    ap.add_argument("--channels", type=int, default=64)
    ap.add_argument("--frames", type=int, default=30)
    ap.add_argument("--chain", type=int, default=8)
    ap.add_argument("--iters", type=int, default=5)
    args = ap.parse_args()
    B, S, C, T = args.batch, args.size, args.channels, args.frames

    from extdm_tpu.ops import pallas_stw

    rng = np.random.RandomState(0)

    def arr(*shape, dtype=jnp.float32):
        return jnp.asarray(rng.randn(*shape).astype(np.float32) * 0.05, dtype)

    x = jnp.asarray(rng.randn(B, T, S, S, C).astype(np.float32), jnp.bfloat16)
    params = (arr(C), arr(C), arr(C), arr(C, 3 * HEADS * DIM_HEAD),
              arr(HEADS * DIM_HEAD, C), arr(HEADS, T, T))

    def apply_chain(x0, p):
        def body(c, _):
            o = pallas_stw.fused_temporal_layer(
                c, *p, heads=HEADS, dim_head=DIM_HEAD)
            return o, None
        return jax.lax.scan(body, x0, None, length=args.chain)[0]

    fwd = jax.jit(apply_chain)

    def loss(x0, p):
        return (apply_chain(x0, p).astype(jnp.float32) ** 2).mean()

    grad = jax.jit(jax.grad(loss, argnums=(0, 1)))

    fwd_ms = timed(fwd, (x, params), args.iters) / args.chain
    fb_ms = timed(grad, (x, params), args.iters) / args.chain
    arm = {k: os.environ.get(k) for k in
           ("EXTDM_TEMPORAL_BWD_TOKENS", "EXTDM_BWD_VMEM_MULT",
            "EXTDM_PALLAS_VMEM_MB", "EXTDM_PALLAS_BWD") if k in os.environ}
    print(json.dumps({
        "arm": arm or "default",
        "shape": [B, T, S, S, C],
        "chain": args.chain,
        "fwd_ms": round(fwd_ms, 2),
        "fwdbwd_ms": round(fb_ms, 2),
        "bwd_ms": round(fb_ms - fwd_ms, 2),
    }), flush=True)


if __name__ == "__main__":
    main()
