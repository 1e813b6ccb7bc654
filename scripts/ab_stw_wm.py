"""A/B the window-major STW forward kernel vs the slab kernel on the chip.

Times fused_stw_layer at the flagship-dominant shapes (plain + shifted)
with EXTDM_STW_WINDOW_MAJOR toggled via subprocess env.

Usage: python scripts/ab_stw_wm.py            # run both arms
       EXTDM_STW_WINDOW_MAJOR=0 python scripts/ab_stw_wm.py --arm
"""
from __future__ import annotations

import argparse
import functools
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_arm():
    import jax
    _CACHE = os.environ.get(
    "EXTDM_JAX_CACHE",
    os.path.join(os.path.expanduser("~"), ".cache", "extdm_jax"))
    jax.config.update("jax_compilation_cache_dir", _CACHE)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import numpy as np
    from extdm_tpu.ops import pallas_stw

    RTT_MS = 32.0
    HEADS, DIM_HEAD = 8, 32
    T, WINDOW, SHIFT = 30, (4, 4, 4), (2, 2, 2)

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

    key = jax.random.PRNGKey(0)
    B = 32
    for (S, C) in [(32, 64), (16, 128), (8, 256)]:
        hidden = HEADS * DIM_HEAD
        N = WINDOW[0] * WINDOW[1] * WINDOW[2]
        ks = jax.random.split(key, 6)
        x = jax.random.normal(ks[0], (B, T, S, S, C), jnp.bfloat16)
        gamma = jax.random.normal(ks[1], (C,), jnp.float32)
        w_qkv = jax.random.normal(ks[2], (C, 3 * hidden), jnp.float32) * 0.02
        w_proj = jax.random.normal(ks[3], (hidden, C), jnp.float32) * 0.02
        b_proj = jax.random.normal(ks[4], (C,), jnp.float32)
        bias = jax.random.normal(ks[5], (HEADS, N, N), jnp.float32)
        for tag, sh in [("plain", (0, 0, 0)), ("shifted", SHIFT)]:
            f = jax.jit(functools.partial(
                pallas_stw.fused_stw_layer, window=WINDOW, shift=sh,
                heads=HEADS, dim_head=DIM_HEAD))
            ms = timed_ms(f, x, gamma, w_qkv, w_proj, b_proj, bias)
            print(f"  S={S} C={C} {tag}: {ms:.1f} ms", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--arm", action="store_true")
    args = ap.parse_args()
    if args.arm:
        run_arm()
        return
    for wm in ("0", "auto", "1"):
        print(f"EXTDM_STW_WINDOW_MAJOR={wm}", flush=True)
        env = dict(os.environ, EXTDM_STW_WINDOW_MAJOR=wm)
        subprocess.run([sys.executable, __file__, "--arm"], env=env, check=True)


if __name__ == "__main__":
    main()
