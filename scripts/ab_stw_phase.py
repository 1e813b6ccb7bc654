"""Per-phase in-kernel attribution of the dominant STW shape (S=32 C=64).

Sweeps EXTDM_STW_ABLATE (timing-only kernel ablations, see
ops/pallas_stw._ablate) in subprocesses (the env is read at trace time)
and prints the ms each phase accounts for, shift and plain arms.

Usage: python scripts/ab_stw_phase.py [--spatial 32] [--chan 64]
"""
from __future__ import annotations

import argparse
import os
import subprocess
import sys

ARMS = [
    ("", "full"),
    ("softmax_max", "-rowmax"),
    ("softmax", "-softmax"),
    ("rope", "-rope"),
    ("regroup", "-regroup"),
    ("attn", "-attn(score/att mms)"),
    ("attn,rope,softmax", "-attn-rope-softmax"),
    ("attn,rope,softmax,regroup", "qkv/proj/LN only"),
]

CHILD = r"""
import functools, os, sys, time
sys.path.insert(0, {repo!r})
import jax
_CACHE = os.environ.get("EXTDM_JAX_CACHE",
    os.path.join(os.path.expanduser("~"), ".cache", "extdm_jax"))
jax.config.update("jax_compilation_cache_dir", _CACHE)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np
from extdm_tpu.ops import pallas_stw

B, T, S, C = 32, 30, {S}, {C}
HEADS, DIM_HEAD = 8, 32
hidden = HEADS * DIM_HEAD
rng = np.random.RandomState(0)
arr = lambda *sh, dtype=jnp.bfloat16: jnp.asarray(
    rng.randn(*sh).astype(np.float32), dtype=dtype)
x = arr(B, T, S, S, C)
wd = (4, min(4, S), min(4, S))
N = wd[0] * wd[1] * wd[2]
kw = dict(gamma=arr(C, dtype=jnp.float32),
          w_qkv=arr(C, 3 * hidden, dtype=jnp.float32) * 0.05,
          w_proj=arr(hidden, C, dtype=jnp.float32) * 0.02,
          b_proj=arr(C, dtype=jnp.float32) * 0.01,
          bias_hnn=arr(HEADS, N, N, dtype=jnp.float32) * 0.01,
          window=wd, heads=HEADS, dim_head=DIM_HEAD)

def timed(shift):
    f = functools.partial(pallas_stw.fused_stw_layer, shift=shift, **kw)
    @jax.jit
    def run(x0):
        def body(c, _):
            return f(c), None
        return jax.lax.scan(body, x0, None, length=16)[0]
    out = run(x)
    float(np.asarray(out[0, 0, 0, 0, 0]))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = run(x)
        float(np.asarray(out[0, 0, 0, 0, 0]))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)) * 1e3 / 16

sh = tuple(min(2, w // 2) for w in wd)
print("RESULT %.3f %.3f" % (timed(sh), timed((0, 0, 0))))
"""


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--spatial", type=int, default=32)
    ap.add_argument("--chan", type=int, default=64)
    args = ap.parse_args()
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    code = CHILD.format(repo=repo, S=args.spatial, C=args.chan)
    base = None
    for ablate, label in ARMS:
        env = dict(os.environ, EXTDM_STW_ABLATE=ablate)
        r = subprocess.run([sys.executable, "-c", code], env=env,
                           capture_output=True, text=True, timeout=900)
        line = [l for l in r.stdout.splitlines() if l.startswith("RESULT")]
        if not line:
            print(f"{label:24s} FAILED\n{r.stderr[-2000:]}")
            continue
        sh_ms, pl_ms = map(float, line[0].split()[1:])
        if base is None:
            base = (sh_ms, pl_ms)
            print(f"{label:24s} shift {sh_ms:7.3f} ms   plain {pl_ms:7.3f} ms")
        else:
            print(f"{label:24s} shift {sh_ms:7.3f} ms (-{base[0]-sh_ms:6.3f})"
                  f"   plain {pl_ms:7.3f} ms (-{base[1]-pl_ms:6.3f})")


if __name__ == "__main__":
    main()
