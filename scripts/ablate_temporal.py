"""Ablation bench of the fused temporal-attention kernel at the hot shape
(32,30,32,32,64) to localize per-program cost (VPU vs MXU vs softmax vs
rope). Variants strip one piece each; differences vs 'full' attribute time.

Usage: python scripts/ablate_temporal.py [--batch 32] [--iters 7]

stdout: one JSON object per variant ({"variant": ..., "ms": ...}) — the
machine-readable artifact format. Human-readable table on stderr.
"""
from __future__ import annotations

import argparse
import functools
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

from extdm_tpu.ops import pallas_stw as ps

RTT_MS = 32.0


def make_kernel(T, HR, Wd, C, heads, dim_head, rot, eps, G, Tp, ablate):
    """Copy of ps._make_temporal_kernel with ablation switches."""
    ps._ensure_pallas()
    pl, pltpu = ps.pl, ps.pltpu
    P = HR * Wd
    hidden = heads * dim_head
    R = G * Tp
    f32 = jnp.float32

    def kernel(x_ref, gcln_ref, lns_ref, lnb_ref, wqkv_ref, wproj_ref,
               bias_ref, cos_ref, sin_ref, o_ref):
        xb = x_ref[0].astype(f32)
        mean = xb.mean(-1, keepdims=True)
        var = ((xb - mean) ** 2).mean(-1, keepdims=True)
        a = (xb - mean) * jax.lax.rsqrt(var + eps) * gcln_ref[0].astype(f32)
        h = a.transpose(1, 2, 0, 3).reshape(P, T, C)
        mean2 = h.mean(-1, keepdims=True)
        var2 = ((h - mean2) ** 2).mean(-1, keepdims=True)
        hn = (h - mean2) * jax.lax.rsqrt(var2 + eps) * lns_ref[0].astype(f32) \
            + lnb_ref[0].astype(f32)
        if ablate == "ln_only":
            o = hn.reshape(HR, Wd, T, C).transpose(2, 0, 1, 3)
            o_ref[0] = (o + xb).astype(o_ref.dtype)
            return
        qkv = jax.lax.dot_general(
            hn.reshape(P * T, C).astype(x_ref.dtype), wqkv_ref[:],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=f32,
        )
        q = qkv[:, :hidden].reshape(P, T, hidden) * (dim_head ** -0.5)
        k = qkv[:, hidden:2 * hidden].reshape(P, T, hidden)
        v = qkv[:, 2 * hidden:].reshape(P, T, hidden)
        if rot and ablate != "no_rope":
            cos = cos_ref[:].astype(f32)[None]
            sin = sin_ref[:].astype(f32)[None]
            lane = jax.lax.broadcasted_iota(jnp.int32, (1, T, hidden), 2)
            even = (lane % 2) == 0

            def rope(z):
                up = pltpu.roll(z, hidden - 1, axis=2)
                down = pltpu.roll(z, 1, axis=2)
                return z * cos + jnp.where(even, -up, down) * sin

            q, k = rope(q), rope(k)
        if G > 1:
            pad = Tp - T
            q = jnp.pad(q, ((0, 0), (0, pad), (0, 0))).reshape(P // G, R, hidden)
            k = jnp.pad(k, ((0, 0), (0, pad), (0, 0))).reshape(P // G, R, hidden)
            v = jnp.pad(v, ((0, 0), (0, pad), (0, 0))).reshape(P // G, R, hidden)
        if ablate == "no_attn":
            o = v.astype(f32)
            o = o.reshape(P, Tp, hidden)[:, :T] if G > 1 else o
        else:
            nheads = 1 if ablate == "one_head" else heads
            outs = []
            for hd in range(nheads):
                sl = slice(hd * dim_head, (hd + 1) * dim_head)
                s = jax.lax.dot_general(
                    q[:, :, sl], k[:, :, sl],
                    dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                    preferred_element_type=f32,
                )
                if ablate != "no_softmax":
                    s = s + bias_ref[hd].astype(f32)[None]
                    s = s - jax.lax.stop_gradient(s.max(axis=-1, keepdims=True))
                    e = jnp.exp(s)
                    s = e / e.sum(axis=-1, keepdims=True)
                outs.append(jax.lax.dot_general(
                    s, v[:, :, sl],
                    dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=f32,
                ))
            outs = outs * (heads // len(outs))
            o = jnp.concatenate(outs, axis=-1)
            if G > 1:
                o = o.reshape(P, Tp, hidden)[:, :T]
        o = o.reshape(P * T, hidden)
        o = jax.lax.dot_general(
            o.astype(x_ref.dtype), wproj_ref[:],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=f32,
        )
        o = o.reshape(P, T, C) + h
        o = o.reshape(HR, Wd, T, C).transpose(2, 0, 1, 3)
        o_ref[0] = (o + xb).astype(o_ref.dtype)

    return kernel


def run_variant(x, args_np, ablate, G_override=None):
    ps._ensure_pallas()
    pl, pltpu = ps.pl, ps.pltpu
    B, T, H, W, C = x.shape
    heads, dim_head = 8, 32
    hidden = heads * dim_head
    eps = 1e-5
    rot = 32
    gamma_cln, lns, lnb, w_qkv, w_proj, bias_hnn = args_np
    cos_np = np.ones((T, hidden), np.float32)
    sin_np = np.zeros((T, hidden), np.float32)
    c, s = ps.rotary_tables(T, rot)
    for hd in range(heads):
        cos_np[:, hd * dim_head: hd * dim_head + rot] = c
        sin_np[:, hd * dim_head: hd * dim_head + rot] = s
    HR = ps._pick_hr(H, W, T, C, hidden=hidden)
    G, Tp = ps._pick_seq_pack(HR * W, T)
    if G_override is not None:
        G, Tp = G_override, -(-T // 8) * 8
    if G > 1:
        R = G * Tp
        bias_pad = jnp.pad(jnp.asarray(bias_hnn, jnp.float32),
                           ((0, 0), (0, Tp - T), (0, Tp - T)))
        tiled = jnp.einsum("ab,hij->haibj", jnp.eye(G, dtype=jnp.float32),
                           bias_pad).reshape(heads, R, R)
        rb = np.arange(R)[:, None] // Tp
        cb = np.arange(R)[None, :] // Tp
        cpos = np.arange(R)[None, :] % Tp
        neg = np.where((rb != cb) | (cpos >= T), -1e9, 0.0).astype(np.float32)
        bias_in = tiled + jnp.asarray(neg)[None]
        NB = R
    else:
        bias_in = jnp.asarray(bias_hnn, jnp.float32)
        NB = T

    x_spec = pl.BlockSpec((1, T, HR, W, C), lambda b, ih: (b, 0, ih, 0, 0))
    const = lambda shape: pl.BlockSpec(shape, lambda b, ih: tuple(0 for _ in shape))
    grid_spec = pl.GridSpec(
        grid=(B, H // HR),
        in_specs=[x_spec, const((1, C)), const((1, C)), const((1, C)),
                  const((C, 3 * hidden)), const((hidden, C)),
                  const((heads, NB, NB)), const((T, hidden)), const((T, hidden))],
        out_specs=x_spec,
    )
    kernel = make_kernel(T, HR, W, C, heads, dim_head, rot, eps, G, Tp, ablate)
    f = pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            vmem_limit_bytes=ps._vmem_limit_bytes()),
    )
    call_args = (
        x, jnp.asarray(gamma_cln).reshape(1, C).astype(x.dtype),
        jnp.asarray(lns).reshape(1, C).astype(jnp.float32),
        jnp.asarray(lnb).reshape(1, C).astype(jnp.float32),
        jnp.asarray(w_qkv).astype(x.dtype), jnp.asarray(w_proj).astype(x.dtype),
        bias_in, jnp.asarray(cos_np, x.dtype), jnp.asarray(sin_np, x.dtype))
    return jax.jit(lambda *a: f(*a)), call_args


def timed(make, iters):
    fn, call_args = make()
    out = fn(*call_args)
    float(np.asarray(out[tuple(0 for _ in out.shape)]))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*call_args)
        float(np.asarray(out[tuple(0 for _ in out.shape)]))
        ts.append(time.perf_counter() - t0)
    return max(0.0, float(np.median(ts)) * 1e3 - RTT_MS)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--iters", type=int, default=7)
    args = ap.parse_args()
    B, T, H, W, C = args.batch, 30, 32, 32, 64
    heads, dim_head = 8, 32
    hidden = heads * dim_head
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(B, T, H, W, C).astype(np.float32), jnp.bfloat16)
    args_np = (rng.randn(C).astype(np.float32),
               rng.randn(C).astype(np.float32),
               rng.randn(C).astype(np.float32) * 0.01,
               rng.randn(C, 3 * hidden).astype(np.float32) * 0.05,
               rng.randn(hidden, C).astype(np.float32) * 0.05,
               rng.randn(heads, T, T).astype(np.float32) * 0.01)

    for name, abl, g in [("full", "none", None),
                         ("ln_only", "ln_only", None),
                         ("no_attn(qkv+rope+proj)", "no_attn", None),
                         ("no_rope", "no_rope", None),
                         ("no_softmax", "no_softmax", None),
                         ("one_head", "one_head", None),
                         ("full_G4", "none", 4),
                         ("full_G1", "none", 1)]:
        ms = timed(functools.partial(run_variant, x, args_np, abl, g),
                   args.iters)
        # stdout is the machine-readable artifact (one JSON object per
        # line); the human-readable table goes to stderr.
        print(json.dumps({"variant": name, "ms": round(ms, 2)}), flush=True)
        print(f"{name:26s} {ms:8.2f} ms", file=sys.stderr)


if __name__ == "__main__":
    main()
