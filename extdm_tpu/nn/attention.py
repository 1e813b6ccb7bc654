"""Attention primitives for the 3D diffusion UNet.

Covers the reference denoiser's attention zoo
(/root/reference/model/BaseDM_adaptor/DenoiseNet_..._ada_u22.py):
- rotary position embedding (rotary_embedding_torch semantics, :1046),
- T5-style relative position bias (:100-155) and the THW variant (:41-96),
- temporal attention over (h w)-batched sequences (:328-450),
- 3D shifted-window attention (Swin-style, :467-682).

All layouts are channels-last (B, T, H, W, C). Window masks and relative
position indices are computed with numpy at trace time — shapes are static
under jit, so they become compile-time constants (replacing the reference's
`@lru_cache` device-tensor hack).
"""
from __future__ import annotations

import math
from functools import lru_cache
from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from extdm_tpu.nn.initializers import torch_bias_init, torch_kernel_init

Dtype = Any


# --- rotary -----------------------------------------------------------------
def rotary_angles(n: int, rot_dim: int, dtype=jnp.float32) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """cos/sin tables (n, rot_dim) with interleaved pair layout."""
    inv_freq = 1.0 / (10000 ** (np.arange(0, rot_dim, 2) / rot_dim))
    t = np.arange(n)
    freqs = np.einsum("i,j->ij", t, inv_freq)  # (n, rot_dim/2)
    freqs = np.repeat(freqs, 2, axis=-1)  # interleave-duplicate
    return jnp.asarray(np.cos(freqs), dtype), jnp.asarray(np.sin(freqs), dtype)


def _rotate_half_interleaved(x: jnp.ndarray) -> jnp.ndarray:
    x1 = x[..., 0::2]
    x2 = x[..., 1::2]
    out = jnp.stack([-x2, x1], axis=-1)
    return out.reshape(x.shape)


def apply_rotary(x: jnp.ndarray, rot_dim: int) -> jnp.ndarray:
    """Apply rotary embedding along the sequence axis of (..., n, d).

    Rotates only the first `rot_dim` features, as rotary_embedding_torch
    does when the rotation dim is smaller than the head dim.
    """
    n, d = x.shape[-2], x.shape[-1]
    rot_dim = min(rot_dim, d)
    cos, sin = rotary_angles(n, rot_dim, dtype=x.dtype)
    x_rot, x_pass = x[..., :rot_dim], x[..., rot_dim:]
    x_rot = x_rot * cos + _rotate_half_interleaved(x_rot) * sin
    return jnp.concatenate([x_rot, x_pass], axis=-1) if rot_dim < d else x_rot


# --- T5 relative position bias ------------------------------------------------
def _relative_position_bucket(rel_pos: np.ndarray, num_buckets: int = 32, max_distance: int = 128) -> np.ndarray:
    """Reference bucket scheme (:112-139), computed in numpy."""
    ret = np.zeros_like(rel_pos)
    n = -rel_pos
    num_buckets //= 2
    ret += (n < 0).astype(np.int64) * num_buckets
    n = np.abs(n)
    max_exact = num_buckets // 2
    is_small = n < max_exact
    val_if_large = max_exact + (
        np.log(np.maximum(n, 1).astype(np.float64) / max_exact)
        / math.log(max_distance / max_exact)
        * (num_buckets - max_exact)
    ).astype(np.int64)
    val_if_large = np.minimum(val_if_large, num_buckets - 1)
    ret += np.where(is_small, n, val_if_large)
    return ret


@lru_cache(maxsize=None)
def _rel_bucket_matrix(n: int, num_buckets: int, max_distance: int) -> np.ndarray:
    pos = np.arange(n)
    rel = pos[None, :] - pos[:, None]  # k_pos - q_pos
    return _relative_position_bucket(rel, num_buckets, max_distance)


class RelativePositionBias(nn.Module):
    """bias(n) -> (heads, n, n)."""

    heads: int = 8
    num_buckets: int = 32
    max_distance: int = 128

    @nn.compact
    def __call__(self, n: int) -> jnp.ndarray:
        table = self.param(
            "relative_attention_bias",
            nn.initializers.normal(1.0),
            (self.num_buckets, self.heads),
        )
        buckets = jnp.asarray(_rel_bucket_matrix(n, self.num_buckets, self.max_distance))
        values = jnp.take(table, buckets, axis=0)  # (n, n, heads)
        return jnp.transpose(values, (2, 0, 1))


class RelativePositionBiasTHW(nn.Module):
    """Per-axis T/H/W biases sharing one bucket table (repro addition, :41-96).

    Returns three (heads, n, n) biases for n in {t, h, w}.
    """

    heads: int = 8
    num_buckets: int = 32
    max_distance: int = 128

    @nn.compact
    def __call__(self, t: int, h: int, w: int):
        table = self.param(
            "relative_attention_bias",
            nn.initializers.normal(1.0),
            (self.num_buckets, self.heads),
        )

        def bias(n):
            buckets = jnp.asarray(_rel_bucket_matrix(n, self.num_buckets, self.max_distance))
            return jnp.transpose(jnp.take(table, buckets, axis=0), (2, 0, 1))

        return bias(t), bias(h), bias(w)


# --- temporal attention ---------------------------------------------------------
class TemporalAttention(nn.Module):
    """Multi-head attention over the time axis of (B, M, T, C) sequences.

    Matches reference `Attention` (:328-422): rotary on q/k, additive
    pos_bias of shape (heads, T, T) — or the repro's 4-D THW-combined bias,
    which is reduced to a per-query bias exactly as the reference does
    (:401-407).
    """

    heads: int = 4
    dim_head: int = 32
    rotary: bool = True
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x, pos_bias: Optional[jnp.ndarray] = None):
        B, M, T, C = x.shape
        hidden = self.heads * self.dim_head
        qkv = nn.Dense(hidden * 3, use_bias=False, kernel_init=torch_kernel_init,
                       dtype=self.dtype, name="to_qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def heads_split(a):  # (B, M, T, h*d) -> (B, M, h, T, d)
            return a.reshape(B, M, T, self.heads, self.dim_head).transpose(0, 1, 3, 2, 4)

        q, k, v = heads_split(q), heads_split(k), heads_split(v)
        q = q * (self.dim_head**-0.5)
        if self.rotary:
            rot = min(32, self.dim_head)
            q = apply_rotary(q, rot)
            k = apply_rotary(k, rot)

        sim = jnp.einsum("bmhid,bmhjd->bmhij", q, k)
        if pos_bias is not None:
            if pos_bias.ndim == 4:  # (heads, T, T, T) combined THW bias
                pb = pos_bias.mean(axis=(-2, -1))  # (heads, T)
                pb = pb[None, None, :, :, None]  # broadcast over batch, m, keys
                sim = sim + pb
            else:  # (heads, T, T)
                sim = sim + pos_bias[None, None]
        sim = sim - jax.lax.stop_gradient(sim.max(axis=-1, keepdims=True))
        attn = nn.softmax(sim.astype(jnp.float32), axis=-1).astype(sim.dtype)
        out = jnp.einsum("bmhij,bmhjd->bmhid", attn, v)
        out = out.transpose(0, 1, 3, 2, 4).reshape(B, M, T, hidden)
        return nn.Dense(C, use_bias=False, kernel_init=torch_kernel_init,
                        dtype=self.dtype, name="to_out")(out)


class TemporalAttentionLayer(nn.Module):
    """LayerNorm -> TemporalAttention -> +residual (reference AttentionLayer :426-450)."""

    heads: int = 4
    dim_head: int = 32
    rotary: bool = True
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x, pos_bias=None):
        # dtype=self.dtype: flax computes the statistics in f32 and casts the
        # output back — without it the f32 scale/bias params promote the
        # whole stream to f32 downstream.
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(x)
        h = TemporalAttention(self.heads, self.dim_head, self.rotary, self.dtype, name="attn")(h, pos_bias)
        return x + h


# --- window attention -------------------------------------------------------------
def get_window_size(x_size: Sequence[int], window_size: Sequence[int],
                    shift_size: Optional[Sequence[int]] = None):
    """Clamp window to the tensor size; zero the shift where clamped (:515-528)."""
    ws = list(window_size)
    ss = list(shift_size) if shift_size is not None else None
    for i, s in enumerate(x_size):
        if s <= window_size[i]:
            ws[i] = s
            if ss is not None:
                ss[i] = 0
    return (tuple(ws), tuple(ss)) if ss is not None else tuple(ws)


def window_partition(x: jnp.ndarray, window: Tuple[int, int, int]) -> jnp.ndarray:
    """(B, D, H, W, C) -> (B*nW, wd*wh*ww, C)."""
    B, D, H, W, C = x.shape
    wd, wh, ww = window
    x = x.reshape(B, D // wd, wd, H // wh, wh, W // ww, ww, C)
    x = x.transpose(0, 1, 3, 5, 2, 4, 6, 7)
    return x.reshape(-1, wd * wh * ww, C)


def window_reverse(windows: jnp.ndarray, window: Tuple[int, int, int], B: int, D: int, H: int, W: int) -> jnp.ndarray:
    wd, wh, ww = window
    x = windows.reshape(B, D // wd, H // wh, W // ww, wd, wh, ww, -1)
    x = x.transpose(0, 1, 4, 2, 5, 3, 6, 7)
    return x.reshape(B, D, H, W, -1)


@lru_cache(maxsize=None)
def _shifted_window_mask(D: int, H: int, W: int, window: Tuple[int, int, int],
                         shift: Tuple[int, int, int]) -> np.ndarray:
    """(nW, N, N) additive mask (0 / -100) — Swin compute_mask (:499-512)."""
    img = np.zeros((D, H, W), dtype=np.int32)
    cnt = 0
    for d in (slice(0, -window[0]), slice(-window[0], -shift[0]), slice(-shift[0], None)):
        for h in (slice(0, -window[1]), slice(-window[1], -shift[1]), slice(-shift[1], None)):
            for w in (slice(0, -window[2]), slice(-window[2], -shift[2]), slice(-shift[2], None)):
                img[d, h, w] = cnt
                cnt += 1
    wd, wh, ww = window
    img = img.reshape(D // wd, wd, H // wh, wh, W // ww, ww)
    img = img.transpose(0, 2, 4, 1, 3, 5).reshape(-1, wd * wh * ww)
    diff = img[:, None, :] - img[:, :, None]
    return np.where(diff != 0, -100.0, 0.0).astype(np.float32)


@lru_cache(maxsize=None)
def _relative_position_index(window: Tuple[int, int, int]) -> np.ndarray:
    """(N, N) index into the (2wd-1)(2wh-1)(2ww-1) bias table (:559-573)."""
    wd, wh, ww = window
    coords = np.stack(np.meshgrid(np.arange(wd), np.arange(wh), np.arange(ww), indexing="ij"))
    flat = coords.reshape(3, -1)
    rel = flat[:, :, None] - flat[:, None, :]  # (3, N, N)
    rel = rel.transpose(1, 2, 0)
    rel[:, :, 0] += wd - 1
    rel[:, :, 1] += wh - 1
    rel[:, :, 2] += ww - 1
    rel[:, :, 0] *= (2 * wh - 1) * (2 * ww - 1)
    rel[:, :, 1] *= 2 * ww - 1
    return rel.sum(-1)


class Dense_(nn.Module):
    """Dense with torch-default init (bias included)."""

    features: int
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x):
        return nn.Dense(self.features, kernel_init=torch_kernel_init,
                        bias_init=torch_bias_init(x.shape[-1]), dtype=self.dtype)(x)


class WindowAttention3D(nn.Module):
    """W-MSA over (B*nW, N, C) windows with learned relative position bias
    and rotary q/k (reference WindowAttention3D :531-619).

    `table_window` fixes the bias-table size (the constructor window), while
    the call may use a clamped `window` (get_window_size) — the reference
    slices the index matrix to N in that case (:601)."""

    table_window: Tuple[int, int, int]
    heads: int = 8
    dim_head: int = 32
    qkv_bias: bool = False
    rotary: bool = True
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x, window: Tuple[int, int, int], mask: Optional[jnp.ndarray] = None):
        Bn, N, C = x.shape
        hidden = self.heads * self.dim_head
        wd, wh, ww = self.table_window
        table = self.param(
            "relative_position_bias_table",
            nn.initializers.truncated_normal(0.02),
            ((2 * wd - 1) * (2 * wh - 1) * (2 * ww - 1), self.heads),
        )
        qkv = nn.Dense(hidden * 3, use_bias=self.qkv_bias, kernel_init=torch_kernel_init,
                       dtype=self.dtype, name="qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def heads_split(a):  # (Bn, N, h*d) -> (Bn, h, N, d)
            return a.reshape(Bn, N, self.heads, self.dim_head).transpose(0, 2, 1, 3)

        q, k, v = heads_split(q), heads_split(k), heads_split(v)
        q = q * (self.dim_head**-0.5)
        if self.rotary:
            rot = min(32, self.dim_head)
            q = apply_rotary(q, rot)
            k = apply_rotary(k, rot)

        rel_idx = jnp.asarray(_relative_position_index(self.table_window)[:N, :N])
        bias = jnp.take(table, rel_idx.reshape(-1), axis=0).reshape(N, N, self.heads)
        bias_hnn = jnp.transpose(bias, (2, 0, 1))  # (H, N, N)

        from extdm_tpu.ops import pallas_attn

        if pallas_attn.enabled():
            # fused scores+bias+mask+softmax+AV in VMEM (P windows x head
            # per program); q is pre-scaled and rotary-rotated above.
            out = pallas_attn.fused_window_attention(q, k, v, bias_hnn, mask)
        else:
            attn = jnp.einsum("bhid,bhjd->bhij", q, k)
            attn = attn + bias_hnn[None]
            if mask is not None:
                nW = mask.shape[0]
                mask_j = jnp.asarray(mask, attn.dtype)
                attn = attn.reshape(Bn // nW, nW, self.heads, N, N) + mask_j[None, :, None]
                attn = attn.reshape(Bn, self.heads, N, N)
            attn = nn.softmax(attn.astype(jnp.float32), axis=-1).astype(attn.dtype)
            out = jnp.einsum("bhij,bhjd->bhid", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(Bn, N, hidden)
        return Dense_(C, dtype=self.dtype, name="proj")(out)



class STWAttentionLayer(nn.Module):
    """Shifted/plain 3D window attention over (B, T, H, W, C) (ref :621-682)."""

    window_size: Tuple[int, int, int] = (2, 4, 4)
    shift_size: Tuple[int, int, int] = (0, 0, 0)
    heads: int = 8
    dim_head: int = 32
    rotary: bool = True
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x, gamma=None):
        """gamma != None selects the fused whole-layer path: the caller
        (PreNormSTW) passes its ChanLayerNorm scale and this returns
        x + attn(LN(x)) in one pallas pass (ops/pallas_stw.py)."""
        B, D, H, W, C = x.shape
        window, shift = get_window_size((D, H, W), self.window_size, self.shift_size)

        if gamma is not None:
            from extdm_tpu.ops import pallas_stw

            attn_mod = WindowAttention3D(
                table_window=tuple(self.window_size), heads=self.heads,
                dim_head=self.dim_head, rotary=self.rotary, dtype=self.dtype,
                name="attn",
            )
            N = window[0] * window[1] * window[2]
            # materialize the child's params (result is dead code — DCE'd)
            _ = attn_mod(jnp.zeros((1, N, C), x.dtype), window, None)
            p = attn_mod.variables["params"]
            rel_idx = _relative_position_index(tuple(self.window_size))[:N, :N]
            table = p["relative_position_bias_table"]
            bias = jnp.take(table, jnp.asarray(rel_idx.reshape(-1)), axis=0)
            bias_hnn = jnp.transpose(bias.reshape(N, N, self.heads), (2, 0, 1))
            return pallas_stw.fused_stw_layer(
                x, gamma, p["qkv"]["kernel"],
                p["proj"]["Dense_0"]["kernel"], p["proj"]["Dense_0"]["bias"],
                bias_hnn, window=window, shift=shift, heads=self.heads,
                dim_head=self.dim_head, rotary=self.rotary,
            )

        pad_d = (window[0] - D % window[0]) % window[0]
        pad_h = (window[1] - H % window[1]) % window[1]
        pad_w = (window[2] - W % window[2]) % window[2]
        if pad_d or pad_h or pad_w:
            x = jnp.pad(x, ((0, 0), (0, pad_d), (0, pad_h), (0, pad_w), (0, 0)))
        _, Dp, Hp, Wp, _ = x.shape

        if any(s > 0 for s in shift):
            shifted = jnp.roll(x, shift=(-shift[0], -shift[1], -shift[2]), axis=(1, 2, 3))
            # keep the mask as a numpy constant: under nn.remat, jnp
            # constants become tracers, but the pallas path needs the host
            # value for mask deduplication.
            mask = _shifted_window_mask(Dp, Hp, Wp, window, shift)
        else:
            shifted = x
            mask = None

        windows = window_partition(shifted, window)
        attn_windows = WindowAttention3D(
            table_window=tuple(self.window_size), heads=self.heads, dim_head=self.dim_head,
            rotary=self.rotary, dtype=self.dtype, name="attn",
        )(windows, window, mask)
        shifted = window_reverse(attn_windows, window, B, Dp, Hp, Wp)

        if any(s > 0 for s in shift):
            x = jnp.roll(shifted, shift=shift, axis=(1, 2, 3))
        else:
            x = shifted
        if pad_d or pad_h or pad_w:
            x = x[:, :D, :H, :W]
        return x
