"""Mosaic batched-matmul floor at the attention kernels' exact shapes.

The round-3 SOL dossier claims the STW kernels' score/att matmuls run
"within ~2x of the batched-matmul floor Mosaic achieves" — this ubench
makes that floor a committed, reproducible measurement (VERDICT r3 #1).

Three measurements at the flagship S=32 STW shapes (N=64 tokens/window,
dim_head=32, pair-packed -> per window-pair matmuls (N, 2dh) x (2dh, 2N)
and (N, 2N) x (2N, 2dh)):

1. pallas floor  — a kernel whose body is ONLY the pair-packed score +
   att batched matmuls on VMEM-resident operands (same grid/block sizes
   as the real kernel, no LN/qkv/rope/softmax/regroup/mask): the best
   Mosaic does for these batched shapes including operand DMA.
2. XLA floor     — jnp.einsum batched matmuls of the same problem.
3. compute SOL   — 197 TFLOP/s bf16 (v5e) line for the same FLOPs.

Compare "pallas floor" with scripts/ab_stw_phase.py's "-attn" delta (the
score/att phase inside the real kernel, measured 3.8 ms at the ubench
scale) to audit the within-~2x claim.

Usage: python scripts/ubench_mxu.py [--windows 16384] [--chunk 128]
Prints one JSON line.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

from extdm_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()
import jax.numpy as jnp
import numpy as np

from extdm_tpu.ops import pallas_stw


def _sync(x):
    return float(np.asarray(x.reshape(-1)[0]))


SCAN_REPS = 16


def time_fn(fn, q, *args, iters=5):
    """Median ms per fn application. fn is applied SCAN_REPS times inside
    ONE jitted scan (iterations chained through q so nothing is CSE'd/
    cached) and the wall time divided — a single device->host sync per
    measurement amortizes the tunneled device's ~32 ms RTT, which would
    otherwise dominate ubench-scale kernels."""

    @jax.jit
    def run(q, *args):
        def body(c, _):
            o = fn(c, *args)
            # couple iterations (defeats CSE) at negligible cost
            return (c + o[..., :1] * 1e-6).astype(c.dtype), None
        return jax.lax.scan(body, q, None, length=SCAN_REPS)[0]

    out = run(q, *args)
    _sync(out)
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = run(q, *args)
        _sync(out)
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)) * 1e3 / SCAN_REPS


def pallas_floor(nW, N, dh, pairs, chunk, dtype=jnp.bfloat16, loops=1):
    """Grid over window chunks; body = the pair-packed score+att matmuls
    exactly as the STW kernel issues them (same dimension_numbers, f32
    accumulate), operands DMA'd per block like the real kernel's slabs.

    loops>1 repeats the matmul chain on the SAME VMEM-resident block
    (small additive perturbation defeats CSE) — dividing by loops isolates
    the MXU-issue floor from the HBM streaming cost."""
    pallas_stw._ensure_pallas()
    pl = pallas_stw.pl
    pltpu = pallas_stw.pltpu
    f32 = jnp.float32

    def kernel(q_ref, kbd_ref, vbd_ref, o_ref):
        for p in range(pairs):
            acc = None
            for l in range(loops):
                s = jax.lax.dot_general(
                    q_ref[p] if l == 0 else q_ref[p] + jnp.asarray(
                        l, q_ref.dtype),
                    kbd_ref[p],
                    dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=f32,
                )  # (chunk, N, 2N)
                o = jax.lax.dot_general(
                    s.astype(q_ref.dtype), vbd_ref[p],
                    dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=f32,
                )  # (chunk, N, 2dh)
                acc = o if acc is None else acc + o
            o_ref[p] = acc.astype(o_ref.dtype)

    # operands generated ON DEVICE: host-side randn for these ~0.5 GB
    # arrays would stream minutes through the tunneled transfer path
    key = jax.random.PRNGKey(0)
    q = jax.random.normal(key, (pairs, nW, N, 2 * dh), dtype)
    kbd = jax.random.normal(key, (pairs, nW, 2 * dh, 2 * N), dtype)
    vbd = jax.random.normal(key, (pairs, nW, 2 * N, 2 * dh), dtype)
    jax.block_until_ready(vbd)

    spec = lambda last2a, last2b: pl.BlockSpec(
        (1, chunk, last2a, last2b), lambda p, c: (p, c, 0, 0))
    fn = pl.pallas_call(
        kernel,
        grid=(pairs, nW // chunk),
        in_specs=[spec(N, 2 * dh), spec(2 * dh, 2 * N), spec(2 * N, 2 * dh)],
        out_specs=spec(N, 2 * dh),
        out_shape=jax.ShapeDtypeStruct((pairs, nW, N, 2 * dh), dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            vmem_limit_bytes=pallas_stw._vmem_limit_bytes()),
    )
    return time_fn(fn, q, kbd, vbd)


def xla_floor(nW, N, dh, pairs, dtype=jnp.bfloat16):
    key = jax.random.PRNGKey(0)
    q = jax.random.normal(key, (pairs, nW, N, 2 * dh), dtype)
    kbd = jax.random.normal(key, (pairs, nW, 2 * dh, 2 * N), dtype)
    vbd = jax.random.normal(key, (pairs, nW, 2 * N, 2 * dh), dtype)
    jax.block_until_ready(vbd)

    def fn(q, kbd, vbd):
        s = jnp.einsum("pwnd,pwdm->pwnm", q, kbd,
                       preferred_element_type=jnp.float32)
        return jnp.einsum("pwnm,pwmd->pwnd", s.astype(q.dtype), vbd,
                          preferred_element_type=jnp.float32).astype(q.dtype)

    return time_fn(fn, q, kbd, vbd)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--windows", type=int, default=16384,
                    help="total windows (flagship S=32 b32: 8*8*8*32)")
    ap.add_argument("--chunk", type=int, default=128,
                    help="windows per pallas program")
    ap.add_argument("--dim_head", type=int, default=32)
    ap.add_argument("--tokens", type=int, default=64, help="N per window")
    ap.add_argument("--pairs", type=int, default=4, help="head pairs")
    args = ap.parse_args()

    nW, N, dh, pairs = args.windows, args.tokens, args.dim_head, args.pairs
    flops = pairs * nW * 2 * (2 * N * 2 * dh * 2 * N)  # score + att
    sol_ms = flops / 197e12 * 1e3

    pallas_ms = pallas_floor(nW, N, dh, pairs, args.chunk)
    # VMEM-resident issue floor: 8 chained repeats per block amortize the
    # HBM streaming; per-volume cost = measured / 8.
    vmem_ms = pallas_floor(nW, N, dh, pairs, args.chunk, loops=8) / 8.0
    xla_ms = xla_floor(nW, N, dh, pairs)
    print(json.dumps({
        "metric": "stw_scoreatt_matmul_floor",
        "windows": nW, "tokens": N, "dim_head": dh, "pairs": pairs,
        "chunk": args.chunk,
        "gflop": round(flops / 1e9, 1),
        "compute_sol_ms": round(sol_ms, 3),
        "pallas_hbm_floor_ms": round(pallas_ms, 3),
        "pallas_vmem_floor_ms": round(vmem_ms, 3),
        "xla_floor_ms": round(xla_ms, 3),
        "vmem_floor_vs_sol": round(vmem_ms / sol_ms, 2),
    }))


if __name__ == "__main__":
    main()
