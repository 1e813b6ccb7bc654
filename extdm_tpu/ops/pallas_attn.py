"""Pallas TPU kernel: fused small-sequence attention (3D-window + temporal).

Both attention families in the UNet operate on tiny sequences (window
N=64, temporal N=T~30) with huge batch counts. XLA materializes the
(batch*heads, N, N) score tensors through HBM — measured at ~80% of the
UNet forward wall time. This kernel packs P sequences into one program:
scores for all P are ONE (P*N, P*N) MXU matmul; a -inf block-off-diagonal
makes a single full-row softmax equal the per-sequence softmax; the AV
product is one (P*N, D) matmul. Scores never touch HBM.

HBM traffic design:
- bias (H, N, N) and the deduplicated masks (M, N, N) are whole-array VMEM
  residents (fetched once, ~128 KB each), NOT per-program blocks;
- per-window mask ids arrive via scalar prefetch (SMEM);
- the only streaming traffic is q/k/v/o blocks.

Autodiff: custom_vjp — Pallas forward, XLA-recompute backward.
Parity: tests/test_pallas.py (interpret mode on CPU).
"""
from __future__ import annotations

import functools
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def enabled() -> bool:
    flag = os.environ.get("EXTDM_PALLAS", "0") == "1"  # opt-in: XLA path currently faster end-to-end
    try:
        backend = jax.default_backend()
    except Exception:  # pragma: no cover
        return False
    return flag and backend not in ("cpu",)


def _make_kernel(P: int, N: int, D: int, M: int):
    R = P * N

    def kernel(ids_ref, q_ref, k_ref, v_ref, bias_ref, mask_ref, o_ref):
        j = jax.lax.convert_element_type(_pid(1), jnp.int32)
        q = q_ref[:, 0].reshape(R, D).astype(jnp.float32)
        k = k_ref[:, 0].reshape(R, D).astype(jnp.float32)
        v = v_ref[:, 0].reshape(R, D).astype(jnp.float32)
        s = jax.lax.dot_general(
            q, k, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (R, R)

        # additive = -inf off block-diagonal + bias + per-window mask, built
        # row-block-wise from VMEM residents (no HBM traffic).
        bias_j = bias_ref[j].astype(jnp.float32)  # (N, N)
        i = _pid(0)
        rows = []
        for p in range(P):
            add = bias_j
            if M > 1:
                mid = ids_ref[i * P + p]
                add = add + mask_ref[mid].astype(jnp.float32)
            elif M == 1:
                add = add + mask_ref[0].astype(jnp.float32)
            left = p * N
            right = R - (p + 1) * N
            rows.append(jnp.pad(add, ((0, 0), (left, right)), constant_values=0.0))
        additive = jnp.concatenate(rows, axis=0)  # (R, R)

        rb = jax.lax.broadcasted_iota(jnp.int32, (R, R), 0) // N
        cb = jax.lax.broadcasted_iota(jnp.int32, (R, R), 1) // N
        s = s + additive + jnp.where(rb == cb, 0.0, -1e9)

        s = s - jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s)
        p_attn = e / jnp.sum(e, axis=-1, keepdims=True)
        o = jax.lax.dot_general(
            p_attn, v, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        o_ref[:, 0] = o.reshape(P, N, D).astype(o_ref.dtype)

    return kernel


def _pid(axis):
    from jax.experimental import pallas as pl

    return pl.program_id(axis)


def _pack_factor(BW: int, N: int) -> int:
    """Sequences per program: fill >=256 score rows and divide BW."""
    for p in (8, 4, 2):
        if BW % p == 0 and p * N >= 128:
            return p
    return 1


def dedupe_masks(mask: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """(nW, N, N) -> (unique (M, N, N), ids (nW,)). Swin shift masks have
    only ~8 distinct patterns regardless of nW."""
    flat = mask.reshape(mask.shape[0], -1)
    uniq, ids = np.unique(flat, axis=0, return_inverse=True)
    return uniq.reshape(-1, mask.shape[1], mask.shape[2]), ids.astype(np.int32)


def _attention_pallas(q, k, v, bias, mask_unique, mask_ids, interpret: bool):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    BW, H, N, D = q.shape
    P = _pack_factor(BW, N)
    if P == 1:
        return _attention_reference(q, k, v, bias, mask_unique, mask_ids)
    M = 0 if mask_unique is None else mask_unique.shape[0]

    qkv_spec = pl.BlockSpec((P, 1, N, D), lambda i, j, *_: (i, j, 0, 0))
    # whole-array VMEM residents: index_map constant -> fetched once.
    bias_spec = pl.BlockSpec((H, N, N), lambda i, j, *_: (0, 0, 0))
    if M:
        mask_spec = pl.BlockSpec((M, N, N), lambda i, j, *_: (0, 0, 0))
        mask_arg = (mask_unique,)
    else:
        mask_spec = pl.BlockSpec((1, N, N), lambda i, j, *_: (0, 0, 0))
        mask_arg = (jnp.zeros((1, N, N), jnp.float32),)
        M = 1

    ids = mask_ids if mask_ids is not None else jnp.zeros((BW,), jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(BW // P, H),
        in_specs=[qkv_spec, qkv_spec, qkv_spec, bias_spec, mask_spec],
        out_specs=qkv_spec,
    )
    return pl.pallas_call(
        _make_kernel(P, N, D, M if mask_ids is not None else 1),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        interpret=interpret,
    )(ids, q, k, v, bias.astype(jnp.float32), *[m.astype(jnp.float32) for m in mask_arg])


def _attention_reference(q, k, v, bias, mask_unique, mask_ids):
    """XLA einsum path — backward pass and CPU fallback."""
    BW, H, N, D = q.shape
    attn = jnp.einsum("bhid,bhjd->bhij", q.astype(jnp.float32), k.astype(jnp.float32))
    attn = attn + bias.astype(jnp.float32)[None]
    if mask_unique is not None and mask_ids is not None:
        attn = attn + jnp.take(mask_unique.astype(jnp.float32), mask_ids, axis=0)[:, None]
    attn = jax.nn.softmax(attn, axis=-1)
    out = jnp.einsum("bhij,bhjd->bhid", attn, v.astype(jnp.float32))
    return out.astype(q.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6,))
def _fused(q, k, v, bias, mask_unique, mask_ids, interpret):
    return _attention_pallas(q, k, v, bias, mask_unique, mask_ids, interpret)


def _fused_fwd(q, k, v, bias, mask_unique, mask_ids, interpret):
    out = _attention_pallas(q, k, v, bias, mask_unique, mask_ids, interpret)
    return out, (q, k, v, bias, mask_unique, mask_ids)


def _fused_bwd(interpret, res, g):
    q, k, v, bias, mask_unique, mask_ids = res

    def ref(q, k, v, bias):
        return _attention_reference(q, k, v, bias, mask_unique, mask_ids)

    _, vjp = jax.vjp(ref, q, k, v, bias)
    dq, dk, dv, dbias = vjp(g)
    return dq, dk, dv, dbias, None, None


_fused.defvjp(_fused_fwd, _fused_bwd)


def fused_window_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    bias: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """q/k/v: (BW, H, N, D) — BW = batch*sequences, H heads, N tokens.
    bias: (H, N, N) additive. mask: (nW, N, N) additive, numpy or jnp;
    sequence i uses mask[i % nW] (None = no mask). q pre-scaled/rotated.
    Returns (BW, H, N, D)."""
    BW, H, N, D = q.shape
    if mask is None:
        return _fused(q, k, v, bias, None, None, interpret)
    mask_np = np.asarray(mask)
    uniq, ids = dedupe_masks(mask_np)
    nW = mask_np.shape[0]
    all_ids = jnp.asarray(np.tile(ids, BW // nW + 1)[:BW])
    return _fused(q, k, v, bias, jnp.asarray(uniq), all_ids, interpret)
