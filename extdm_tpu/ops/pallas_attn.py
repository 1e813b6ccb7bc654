"""Pallas TPU kernel: fused 3D window attention.

The UNet's shifted-window attention produces, per layer, a
(B*nW*heads, N, N) score tensor (N = prod(window) = 64). XLA materializes
scores + softmax + weighted sum through HBM; this kernel keeps the whole
(scores -> +bias -> +mask -> softmax -> @V) pipeline in VMEM, one grid
program per (window, head).

Autodiff: pallas_call has no built-in VJP, so the op carries a custom_vjp —
Pallas forward, XLA-recompute backward (the standard pattern: the backward
re-derives the softmax weights with the einsum path and differentiates
that). Training therefore works through the fused kernel; sampling gets the
full fusion win.

Used by nn.attention.WindowAttention3D when `enabled()` (env EXTDM_PALLAS,
TPU backend only); falls back to the XLA einsum path otherwise. Parity is
pinned by tests/test_pallas.py (interpret mode on CPU).
"""
from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp


def enabled() -> bool:
    flag = os.environ.get("EXTDM_PALLAS", "1") != "0"
    try:
        backend = jax.default_backend()
    except Exception:  # pragma: no cover
        return False
    return flag and backend not in ("cpu",)


def _make_kernel(P: int, N: int, D: int):
    """Kernel over P packed windows, one head per program.

    Scores for all P windows are ONE (P*N, P*N) MXU matmul; the additive
    `extra` input (precomputed in XLA: relative-position bias tiled onto the
    diagonal blocks + shift mask + -inf off-diagonal) makes a single
    full-row softmax equal the per-window softmax. Scores never leave VMEM.
    """
    R = P * N

    def kernel(q_ref, k_ref, v_ref, extra_ref, o_ref):
        q = q_ref[:, 0].reshape(R, D).astype(jnp.float32)
        k = k_ref[:, 0].reshape(R, D).astype(jnp.float32)
        v = v_ref[:, 0].reshape(R, D).astype(jnp.float32)
        s = jax.lax.dot_general(
            q, k, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (R, R)
        s = s + extra_ref[0, 0].astype(jnp.float32)
        s = s - jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s)
        p_attn = e / jnp.sum(e, axis=-1, keepdims=True)
        o = jax.lax.dot_general(
            p_attn, v, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        o_ref[:, 0] = o.reshape(P, N, D).astype(o_ref.dtype)

    return kernel


def _pack_factor(BW: int, nW: int, N: int) -> int:
    """Windows per program: fill >=512 score rows, divide BW, keep the
    shift-mask index pattern contiguous (nW % P == 0 or nW == 1)."""
    for p in (8, 4, 2):
        if BW % p == 0 and p * N >= 128 and (nW % p == 0 or nW == 1):
            return p
    return 1


def _tiled_extra(bias, mask, P: int):
    """Precompute (in XLA) the additive score matrix per (mask-group, head):
    (G, H, R, R) = -inf off-diagonal + diag-tiled bias + diag-placed masks."""
    H, N, _ = bias.shape
    nW = mask.shape[0]
    R = P * N
    rb = jnp.arange(R)[:, None] // N
    cb = jnp.arange(R)[None, :] // N
    same = rb == cb
    off = jnp.where(same, 0.0, -1e9).astype(jnp.float32)
    bias_t = jnp.where(same, jnp.tile(bias.astype(jnp.float32), (1, P, P)), 0.0)  # (H,R,R)
    if nW == 1:
        groups = jnp.tile(mask.astype(jnp.float32), (1, P, P)) * same  # (1,R,R)
    else:
        # group g holds masks [gP ... gP+P-1]; place mask p on diagonal block p
        G = nW // P
        m = mask.astype(jnp.float32).reshape(G, P, N, N)
        eye = jnp.eye(P, dtype=jnp.float32)
        m4 = eye[None, :, None, :, None] * m[:, :, :, None, :]  # (G,P,N,P,N)
        groups = m4.reshape(G, R, R) * same
    return off[None, None] + bias_t[None] + groups[:, None]  # (G,H,R,R)


def _attention_pallas(q, k, v, bias, mask, interpret: bool):
    from jax.experimental import pallas as pl

    BW, H, N, D = q.shape
    nW = mask.shape[0]
    P = _pack_factor(BW, nW, N)
    if P == 1 or (BW // P) * H < 256:
        # packing impossible or grid too small to be worth it — XLA path
        return _attention_reference(q, k, v, bias, mask)
    extra = _tiled_extra(bias, mask, P)  # (G, H, R, R)
    G = extra.shape[0]
    R = P * N

    qkv_spec = pl.BlockSpec((P, 1, N, D), lambda i, j: (i, j, 0, 0))
    extra_spec = pl.BlockSpec((1, 1, R, R), lambda i, j: (i % G, j, 0, 0))

    return pl.pallas_call(
        _make_kernel(P, N, D),
        grid=(BW // P, H),
        in_specs=[qkv_spec, qkv_spec, qkv_spec, extra_spec],
        out_specs=qkv_spec,
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        interpret=interpret,
    )(q, k, v, extra)


def _attention_reference(q, k, v, bias, mask):
    """XLA einsum path — used for the backward pass and CPU fallback."""
    BW, H, N, D = q.shape
    nW = mask.shape[0]
    attn = jnp.einsum("bhid,bhjd->bhij", q.astype(jnp.float32), k.astype(jnp.float32))
    attn = attn + bias.astype(jnp.float32)[None]
    attn = attn.reshape(BW // nW, nW, H, N, N) + mask.astype(jnp.float32)[None, :, None]
    attn = attn.reshape(BW, H, N, N)
    attn = jax.nn.softmax(attn, axis=-1)
    out = jnp.einsum("bhij,bhjd->bhid", attn, v.astype(jnp.float32))
    return out.astype(q.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def _fused(q, k, v, bias, mask, interpret):
    return _attention_pallas(q, k, v, bias, mask, interpret)


def _fused_fwd(q, k, v, bias, mask, interpret):
    return _attention_pallas(q, k, v, bias, mask, interpret), (q, k, v, bias, mask)


def _fused_bwd(interpret, res, g):
    q, k, v, bias, mask = res
    _, vjp = jax.vjp(_attention_reference, q, k, v, bias, mask)
    return vjp(g)


_fused.defvjp(_fused_fwd, _fused_bwd)


def fused_window_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    bias: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """q/k/v: (BW, H, N, D) — BW = batch*windows, H heads, N tokens.
    bias: (H, N, N) additive (relative position bias).
    mask: (nW, N, N) additive or None; window i uses mask[i % nW].
    q must already be scaled (and rotary applied). Returns (BW, H, N, D)."""
    if mask is None:
        mask = jnp.zeros((1, q.shape[2], q.shape[2]), q.dtype)
    return _fused(q, k, v, bias, mask, interpret)
