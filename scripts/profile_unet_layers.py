"""Per-layer cost model of the flagship UNet forward on the real chip.

Enumerates every layer instance of the KTH flagship UNet (dim 64, mults
(1,2,4,4), T=30, 32x32 latents, batch 32), times one jitted rep of each
unique (kind, shape) config, multiplies by instance count, and prints a
category breakdown to compare against the measured end-to-end forward
(scripts/profile_stages.py `sample/unet_fwd_x1`).

All timings force a device->host element read (tunneled runtime) and
report medians minus the ~32 ms tunnel round trip.

Usage: python scripts/profile_unet_layers.py [--batch 32] [--iters 5]
"""
from __future__ import annotations

import argparse
import functools
import os
import sys
import time

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

RTT_MS = 32.0  # tunnel round trip per host-synced call

HEADS, DIM_HEAD = 8, 32
T = 30
TC, TP = 10, 20
WINDOW = (4, 4, 4)
SHIFT = (2, 2, 2)
TIME_DIM = 256  # dim * 4


def _sync(out):
    # index ON DEVICE so only one element crosses the (slow) tunnel
    leaf = jax.tree_util.tree_leaves(out)[0]
    return float(np.asarray(leaf[tuple(0 for _ in leaf.shape)]))


def timed_ms(fn, *args, iters=5):
    _sync(fn(*args))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        _sync(fn(*args))
        ts.append(time.perf_counter() - t0)
    return max(0.0, float(np.median(ts)) * 1e3 - RTT_MS)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--iters", type=int, default=5)
    args = ap.parse_args()
    B = args.batch

    from extdm_tpu.ops import pallas_stw
    from extdm_tpu.models.dm.unet3d import ResnetBlock3d
    from extdm_tpu.models.dm.adaptor import MotionAdaptor

    rng = np.random.RandomState(0)

    def arr(*shape, dtype=jnp.bfloat16):
        return jnp.asarray(rng.randn(*shape).astype(np.float32), dtype=dtype)

    hidden = HEADS * DIM_HEAD

    # ---- layer instance inventory (see unet3d.py __call__) -------------
    # (S, C) -> count of shifted+plain STW *pairs*
    stw_pairs = {(32, 64): 2, (16, 128): 1, (16, 64): 1,
                 (8, 256): 1, (8, 128): 1, (4, 256): 3}
    # temporal attention instances (S, C) -> count (init + per level down/up)
    tattn = {(32, 64): 3, (16, 128): 1, (16, 64): 1,
             (8, 256): 1, (8, 128): 1, (4, 256): 2}
    # cond_temporal_attn + cond_adaptor run once per *sampling* (cached) —
    # excluded: this models the per-DDIM-step forward.
    # resnet instances (S, Cin, Cout) -> count
    res = {
        (32, 64, 64): 3,            # down0 x2 + up3 block2
        (16, 64, 128): 1, (16, 128, 128): 1,    # down1
        (8, 128, 256): 1, (8, 256, 256): 1,     # down2
        (4, 256, 256): 4,           # down3 x2 + mid x2
        (4, 512, 256): 2,           # up0
        (8, 512, 128): 1, (8, 128, 128): 1,     # up1
        (16, 256, 64): 1, (16, 64, 64): 1,      # up2
        (32, 128, 64): 3,           # up3 block1 + final/occlusion blocks
    }
    # adaptor instances (S, C) -> count
    ada = {(32, 64): 2, (16, 64): 1, (16, 128): 1, (8, 256): 1, (4, 256): 2}

    cat_ms = {}

    def record(cat, ms, count, label):
        cat_ms.setdefault(cat, 0.0)
        cat_ms[cat] += ms * count
        print(f"  {label:34s} {ms:7.2f} ms x{count}")

    print(f"batch={B} T={T} heads={HEADS} dim_head={DIM_HEAD}")

    # ---- STW layers ----------------------------------------------------
    for (S, C), count in sorted(stw_pairs.items()):
        x = arr(B, T, S, S, C)
        gamma = arr(C, dtype=jnp.float32)
        w_qkv = arr(C, 3 * hidden, dtype=jnp.float32) * 0.05
        w_proj = arr(hidden, C, dtype=jnp.float32) * 0.05
        b_proj = arr(C, dtype=jnp.float32) * 0.01
        wd = (min(WINDOW[0], T), min(WINDOW[1], S), min(WINDOW[2], S))
        N = wd[0] * wd[1] * wd[2]
        bias = arr(HEADS, N, N, dtype=jnp.float32) * 0.01

        for shift, tag in ((SHIFT, "shift"), ((0, 0, 0), "plain")):
            sh = tuple(min(s, w // 2) for s, w in zip(shift, wd))
            f = jax.jit(functools.partial(
                pallas_stw.fused_stw_layer, window=wd, shift=sh,
                heads=HEADS, dim_head=DIM_HEAD))
            ms = timed_ms(f, x, gamma, w_qkv, w_proj, b_proj, bias,
                          iters=args.iters)
            record("stw", ms, count, f"stw/{tag} S={S} C={C}")

    # ---- temporal layers -----------------------------------------------
    for (S, C), count in sorted(tattn.items()):
        x = arr(B, T, S, S, C)
        gamma = arr(C, dtype=jnp.float32)
        lns = arr(C, dtype=jnp.float32)
        lnb = arr(C, dtype=jnp.float32) * 0.01
        w_qkv = arr(C, 3 * hidden, dtype=jnp.float32) * 0.05
        w_proj = arr(hidden, C, dtype=jnp.float32) * 0.05
        bias = arr(HEADS, T, T, dtype=jnp.float32) * 0.01
        f = jax.jit(functools.partial(pallas_stw.fused_temporal_layer,
                                      heads=HEADS, dim_head=DIM_HEAD))
        ms = timed_ms(f, x, gamma, lns, lnb, w_qkv, w_proj, bias,
                      iters=args.iters)
        record("temporal", ms, count, f"tattn S={S} C={C}")

    # ---- resnet blocks -------------------------------------------------
    t_emb = arr(B, TIME_DIM)
    for (S, Cin, Cout), count in sorted(res.items()):
        if count == 0:
            continue
        mod = ResnetBlock3d(Cout, 8, jnp.bfloat16)
        params = mod.init(jax.random.PRNGKey(0),
                          jnp.zeros((1, 1, 4, 4, Cin), jnp.bfloat16),
                          jnp.zeros((1, TIME_DIM), jnp.bfloat16))
        x = arr(B, T, S, S, Cin)
        f = jax.jit(lambda p, a, te, m=mod: m.apply(p, a, te))
        ms = timed_ms(f, params, x, t_emb, iters=args.iters)
        record("resnet", ms, count, f"res S={S} {Cin}->{Cout}")

    # ---- adaptors ------------------------------------------------------
    for (S, C), count in sorted(ada.items()):
        mod = MotionAdaptor(TC, TP, jnp.bfloat16)
        params = mod.init(jax.random.PRNGKey(0),
                          jnp.zeros((1, T, 4, 4, C), jnp.bfloat16))
        x = arr(B, T, S, S, C)
        f = jax.jit(lambda p, a, m=mod: m.apply(p, a))
        ms = timed_ms(f, params, x, iters=args.iters)
        record("adaptor", ms, count, f"ada S={S} C={C}")

    print("\ncategory totals (per UNet forward):")
    total = 0.0
    for cat, ms in sorted(cat_ms.items(), key=lambda kv: -kv[1]):
        print(f"  {cat:10s} {ms:8.1f} ms")
        total += ms
    print(f"  {'SUM':10s} {total:8.1f} ms   (+ convs/biases/glue not modeled)")


if __name__ == "__main__":
    main()
