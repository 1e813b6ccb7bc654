"""A/B the fused ResnetBlock3d pallas kernel vs the XLA module path on
the real chip, over the flagship UNet's resnet instance inventory.

Usage: python scripts/ab_resnet.py [--batch 32] [--iters 5]
"""
from __future__ import annotations

import argparse
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
T = 30
TIME_DIM = 256

RES = [
    (32, 64, 64, 3), (16, 64, 128, 1), (16, 128, 128, 1),
    (8, 128, 256, 1), (8, 256, 256, 1), (4, 256, 256, 4),
    (4, 512, 256, 2), (8, 512, 128, 1), (8, 128, 128, 0),
    (16, 256, 64, 1), (16, 64, 64, 1), (32, 128, 64, 3),
]


def _sync(out):
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

    from extdm_tpu.models.dm.unet3d import ResnetBlock3d
    from extdm_tpu.ops import pallas_resnet

    rng = np.random.RandomState(0)
    t_emb = jnp.asarray(rng.randn(B, TIME_DIM).astype(np.float32),
                        jnp.bfloat16)

    tot_xla = tot_pal = 0.0
    for S, cin, cout, count in RES:
        mod = ResnetBlock3d(cout, 8, jnp.bfloat16)
        params = mod.init(jax.random.PRNGKey(0),
                          jnp.zeros((1, 1, 8, 8, cin), jnp.bfloat16),
                          jnp.zeros((1, TIME_DIM), jnp.bfloat16))
        x = jnp.asarray(rng.randn(B, T, S, S, cin).astype(np.float32),
                        jnp.bfloat16)

        # NOTE: each jit below wraps a FRESH lambda — jax caches traces by
        # function identity, so reusing one function object would silently
        # reuse the first trace and ignore the env toggle.
        os.environ["EXTDM_PALLAS_RESNET"] = "0"
        ms_x = timed_ms(jax.jit(lambda p, a, te, m=mod: m.apply(p, a, te)),
                        params, x, t_emb, iters=args.iters)
        os.environ["EXTDM_PALLAS_RESNET"] = "1"
        ok = pallas_resnet.supported(x.shape, cin, cout, 8)
        if ok:
            ms_p = timed_ms(jax.jit(lambda p, a, te, m=mod: m.apply(p, a, te)),
                            params, x, t_emb, iters=args.iters)
            # numeric check on device
            os.environ["EXTDM_PALLAS_RESNET"] = "0"
            ref = jax.jit(lambda p, a, te, m=mod: m.apply(p, a, te))(
                params, x, t_emb)
            os.environ["EXTDM_PALLAS_RESNET"] = "1"
            got = jax.jit(lambda p, a, te, m=mod: m.apply(p, a, te))(
                params, x, t_emb)
            err = float(jnp.max(jnp.abs(got.astype(jnp.float32)
                                        - ref.astype(jnp.float32))))
        else:
            ms_p, err = float("nan"), float("nan")
        print(f"res S={S:3d} {cin:3d}->{cout:3d} x{count}: "
              f"xla {ms_x:7.2f}  pallas {ms_p:7.2f}  maxerr {err:.2e}"
              f"{'' if ok else '  (UNSUPPORTED)'}")
        tot_xla += ms_x * count
        tot_pal += (ms_p if ok else ms_x) * count

    print(f"\nweighted totals: xla {tot_xla:.1f} ms  pallas {tot_pal:.1f} ms")


if __name__ == "__main__":
    main()
