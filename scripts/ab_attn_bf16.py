"""A/B the attention-operand dtype casts (EXTDM_ATTN_BF16) on the
dominant S=32 C=64 STW + temporal layers (batch 32 KTH flagship shapes).

Usage: EXTDM_ATTN_BF16={0,1} python scripts/ab_attn_bf16.py
"""
from __future__ import annotations

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

RTT_MS = 32.0
HEADS, DIM_HEAD = 8, 32
T = 30


def _sync(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    return float(np.asarray(leaf[tuple(0 for _ in leaf.shape)]))


def timed_ms(fn, *args, iters=7):
    _sync(fn(*args))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        _sync(fn(*args))
        ts.append(time.perf_counter() - t0)
    return max(0.0, float(np.median(ts)) * 1e3 - RTT_MS)


def main():
    from extdm_tpu.ops import pallas_stw

    B, S, C = 32, 32, 64
    rng = np.random.RandomState(0)

    def arr(*shape, dtype=jnp.bfloat16):
        return jnp.asarray(rng.randn(*shape).astype(np.float32), dtype=dtype)

    hidden = HEADS * DIM_HEAD
    x = arr(B, T, S, S, C)
    gamma = arr(C, dtype=jnp.float32)
    w_qkv = arr(C, 3 * hidden, dtype=jnp.float32) * 0.05
    w_proj = arr(hidden, C, dtype=jnp.float32) * 0.05
    b_proj = arr(C, dtype=jnp.float32) * 0.01
    wd = (4, 4, 4)
    N = 64
    bias = arr(HEADS, N, N, dtype=jnp.float32) * 0.01

    print(f"EXTDM_ATTN_BF16={os.environ.get('EXTDM_ATTN_BF16', '1')}")
    for shift, tag in (((2, 2, 2), "shift"), ((0, 0, 0), "plain")):
        f = jax.jit(functools.partial(
            pallas_stw.fused_stw_layer, window=wd, shift=shift,
            heads=HEADS, dim_head=DIM_HEAD))
        ms = timed_ms(f, x, gamma, w_qkv, w_proj, b_proj, bias)
        print(f"  stw/{tag} S={S} C={C}: {ms:7.2f} ms")

    lns = arr(C, dtype=jnp.float32)
    lnb = arr(C, dtype=jnp.float32) * 0.01
    bias_t = arr(HEADS, T, T, dtype=jnp.float32) * 0.01
    f = jax.jit(functools.partial(pallas_stw.fused_temporal_layer,
                                  heads=HEADS, dim_head=DIM_HEAD))
    ms = timed_ms(f, x, gamma, lns, lnb, w_qkv, w_proj, bias_t)
    print(f"  tattn     S={S} C={C}: {ms:7.2f} ms")


if __name__ == "__main__":
    main()
