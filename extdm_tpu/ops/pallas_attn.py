"""Pallas TPU kernel: fused 3D window attention.

The UNet's shifted-window attention produces, per layer, a
(B*nW*heads, N, N) score tensor (N = prod(window) = 64). XLA materializes
scores + softmax + weighted sum through HBM; this kernel keeps the whole
(scores -> +bias -> +mask -> softmax -> @V) pipeline in VMEM, one grid
program per (window, head).

Used by nn.attention.WindowAttention3D when `extdm_tpu.ops.pallas_attn.
enabled()` (env EXTDM_PALLAS=1, TPU backend only); falls back to the XLA
einsum path otherwise. Parity is pinned by tests/test_pallas.py (interpret
mode on CPU).
"""
from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def enabled() -> bool:
    flag = os.environ.get("EXTDM_PALLAS", "1") != "0"
    try:
        backend = jax.default_backend()
    except Exception:  # pragma: no cover
        return False
    return flag and backend not in ("cpu",)


def _kernel(q_ref, k_ref, v_ref, bias_ref, mask_ref, o_ref):
    q = q_ref[0, 0].astype(jnp.float32)  # (N, D)
    k = k_ref[0, 0].astype(jnp.float32)
    v = v_ref[0, 0].astype(jnp.float32)
    s = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (N, N)
    s = s + bias_ref[0].astype(jnp.float32) + mask_ref[0].astype(jnp.float32)
    s = s - jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s)
    p = p / jnp.sum(p, axis=-1, keepdims=True)
    o = jax.lax.dot_general(
        p, v, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[0, 0] = o.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
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
    q must already be scaled (and rotary applied). Returns (BW, H, N, D).
    """
    from jax.experimental import pallas as pl

    BW, H, N, D = q.shape
    if mask is None:
        mask = jnp.zeros((1, N, N), q.dtype)
    nW = mask.shape[0]

    grid = (BW, H)
    qkv_spec = pl.BlockSpec((1, 1, N, D), lambda i, j: (i, j, 0, 0))
    bias_spec = pl.BlockSpec((1, N, N), lambda i, j: (j, 0, 0))
    mask_spec = pl.BlockSpec((1, N, N), lambda i, j: (i % nW, 0, 0))

    return pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[qkv_spec, qkv_spec, qkv_spec, bias_spec, mask_spec],
        out_specs=qkv_spec,
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        interpret=interpret,
    )(q, k, v, bias, mask)
