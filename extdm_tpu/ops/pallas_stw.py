"""Pallas TPU mega-kernel: one fused pass for a whole PreNormSTW layer.

The UNet's shifted-window attention layers are HBM-bound: the XLA path
makes ~8 full-activation passes per layer (ChanLayerNorm, qkv projection,
window partition copy, attention, window reverse copy, output projection,
residual add). This kernel does the entire layer

    x + proj(window_attn(rotary(qkv(layernorm(x)))))

in ONE read + ONE write of the activation. Window partitioning costs
nothing: the BlockSpec hands each program a (wd*kt, wh, Wp, C) slab whose
windows are regrouped in VMEM; weights / rotary tables / position bias /
deduplicated shift masks are VMEM residents (constant index_map => fetched
once). Shift handling (jnp.roll) and edge padding stay in XLA — two cheap
fusions — because rolled windows wrap block boundaries.

Autodiff: custom_vjp, XLA-recompute backward (`stw_layer_reference`), so
training works and `nn.remat` composes. Parity: tests/test_pallas_stw.py
(interpret mode on CPU vs the module path).

Reference semantics: /root/reference/model/BaseDM_adaptor/
DenoiseNet_STWAtt_w_w_ref_adaptor_cross_multi_traj_ada_u22.py:621-682
(STWAttentionLayer) and :531-619 (WindowAttention3D).
"""
from __future__ import annotations

import functools
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from extdm_tpu.nn import attention as attn_lib


_TRACE_DISABLED = False


def enabled() -> bool:
    """Fused layers are the default on TPU; EXTDM_PALLAS_STW=0 disables."""
    if _TRACE_DISABLED:
        return False
    if os.environ.get("EXTDM_PALLAS_STW", "1") != "1":
        return False
    try:
        return jax.default_backend() not in ("cpu",)
    except Exception:  # pragma: no cover
        return False


def backward_kernels_enabled() -> bool:
    """Dedicated pallas backward kernels (default on). EXTDM_PALLAS_BWD=0
    falls back to the XLA-recompute custom-vjp backward."""
    return os.environ.get("EXTDM_PALLAS_BWD", "1") == "1"


def _window_major(shifted: bool, spatial: int) -> bool:
    """Window-major STW forward: window partition/reverse as one XLA copy
    each (fused with the pad/roll copies), kernel operates on a
    pre-windowed (B, nW, N, C) layout with a trivial BlockSpec — no
    in-VMEM regroup transposes.

    Measured on-chip (B=32, T=30): in ISOLATION wins on unshifted layers
    at spatial >= 32 (15.2 -> 9.9 ms at S=32 C=64) and loses elsewhere,
    but END-TO-END it never pays: all-WM sampling 243.1 f/s, the
    shape-gated 'auto' 253.5, slab 255.1 — inside the full UNet program
    the partition/reverse copies stop fusing with the pad/roll and eat
    the kernel win. Default off; EXTDM_STW_WINDOW_MAJOR=1 forces WM,
    'auto' applies the isolated-win shape gate, for future A/B."""
    mode = os.environ.get("EXTDM_STW_WINDOW_MAJOR", "0")
    if mode == "0":
        return False
    if mode == "1":
        return True
    return (not shifted) and spatial >= 32


def _ablate() -> frozenset:
    """TIMING-ONLY kernel ablations (EXTDM_STW_ABLATE, comma list) to
    attribute in-kernel microseconds per phase on the real chip:
      'softmax_max'  skip the row-max subtraction (numerically equivalent
                     when scores stay < ~88; still exact softmax)
      'softmax'      raw scores, no exp/normalize        (WRONG RESULTS)
                     (softmax_max additionally casts UNNORMALIZED exp(s)
                     to the v dtype before the att matmul — can overflow
                     bf16 to inf; fine for timing, never for values)
      'regroup'      identity window regroup             (WRONG RESULTS)
      'rope'         skip rotary                          (WRONG RESULTS)
      'attn'         skip score/att matmuls, use v        (WRONG RESULTS)
    Never set outside scripts/ubench_layers.py A/Bs."""
    v = os.environ.get("EXTDM_STW_ABLATE", "")
    return frozenset(x for x in v.split(",") if x)


def _attn_io_dtype_casts() -> bool:
    """Cast attention-matmul operands (q/k/v/probs) to the kernel IO dtype.

    The unfused module/XLA path already runs these matmuls on bf16
    operands (f32 accumulate); keeping the kernel's operands in f32 costs
    multiple MXU passes per matmul for no semantic gain. Default on;
    EXTDM_ATTN_BF16=0 restores full-f32 operands for A/B."""
    return os.environ.get("EXTDM_ATTN_BF16", "1") == "1"


def _headpack_ok(heads: int, dim_head: int) -> bool:
    """Pairwise head packing for the in-kernel attention matmuls.

    The per-head score/att matmuls are (N, dh)x(dh, N) with N=64, dh=32
    at the flagship config — MXU passes that stream only 64 rows against
    a quarter-depth, half-width weight tile (~12.5% utilization; the
    measured ~16x-off-compute-SOL of round 1). Packing head pairs as

        scores: (N, 2dh) @ block_diag(k_h1, k_h2): (2dh, 2N) -> (N, 2N)
        att:    (N, 2N) @ block_diag(v_h1, v_h2): (2N, 2dh) -> (N, 2dh)

    halves the number of MXU passes: the q lane-slice widens for free
    (contiguous), the (N, 2dh) output IS the contiguous output layout,
    and only k/v need a masked block-diagonal build (2 VPU selects + a
    sublane concat each). Softmax normalizes per lane-half. 2x the
    nominal FLOPs of the per-head form, but each pass streams the same
    rows against a full-width tile. EXTDM_STW_HEADPACK=0 for A/B."""
    if os.environ.get("EXTDM_STW_HEADPACK", "1") != "1":
        return False
    return heads % 2 == 0 and dim_head <= 64


def _block_diag2(a, dh: int):
    """(B, N, 2*dh) head-pair slab -> (B, 2N, 2*dh) block-diagonal: rows
    0..N-1 keep lanes < dh (head 1), rows N.. keep lanes >= dh (head 2),
    zeros elsewhere."""
    lane = jax.lax.broadcasted_iota(jnp.int32, a.shape, a.ndim - 1)
    zero = jnp.zeros((), a.dtype)
    return jnp.concatenate([jnp.where(lane < dh, a, zero),
                            jnp.where(lane >= dh, a, zero)], axis=a.ndim - 2)


def _softmax_scalar_max() -> bool:
    """Subtract ONE program-scalar max (jnp.max over the whole score
    block) instead of per-row / per-lane-half maxes before exp. Exact
    softmax: any constant shift that is uniform within a row cancels in
    the normalization, and a block scalar is uniform within every row.
    Kills the two masked row-max passes + the per-row broadcast subtract
    (measured 1.7 ms of the 13.7 ms plain S=32 STW layer,
    scripts/ab_stw_phase.py '-rowmax'). exp can't overflow (s - m <= 0);
    shifted scores are clamped at _SOFTMAX_CLAMP so a row sitting far
    below the block max (e.g. a transient training logit spike) loses
    precision instead of underflowing its denominator to a 0/0 NaN.
    EXTDM_SOFTMAX_SCALAR=0 restores the per-row maxes."""
    return os.environ.get("EXTDM_SOFTMAX_SCALAR", "1") == "1"


# Floor for the scalar-max shifted scores: a row whose own max sits this
# far below the BLOCK max would otherwise underflow its entire f32
# denominator to 0 (inf/NaN out) on a transient logit spike — the per-row
# max guaranteed a 1.0 entry per row, the program scalar does not.
# exp(-80) ~= 1.8e-35 is still a normal f32, so clamping keeps every
# denominator nonzero: such rows lose precision (toward uniform) instead
# of NaN-ing the step, and in the backward kernels their (near-zero)
# probabilities contribute ~nothing to the weight grads.
_SOFTMAX_CLAMP = -80.0


def _scalar_shift(s):
    """Shift scores by the program-scalar max, clamped (see above)."""
    return jnp.maximum(s - jax.lax.stop_gradient(jnp.max(s)), _SOFTMAX_CLAMP)


def _shifted(s):
    """Score shift before exp: clamped program-scalar max (fast path) or
    exact per-row max (EXTDM_SOFTMAX_SCALAR=0)."""
    if _softmax_scalar_max():
        return _scalar_shift(s)
    return s - jax.lax.stop_gradient(s.max(axis=-1, keepdims=True))


def _softmax_lane_halves_parts(s, n: int, ablate):
    """Softmax over each lane-half of s (..., 2n) independently — the
    packed score layout holds two heads' rows side by side — deferring
    the normalization: returns
    (e, r1, r2) with e the per-half exp'd scores and r1/r2 the per-half
    reciprocal denominators ((..., 1) each). The caller multiplies the
    ATT OUTPUT lane-halves by r1/r2 — 2*dh elements per row instead of
    2*N score elements (the forward kernels' measured ~1 ms/layer divide).
    r1/r2 are None when softmax is ablated."""
    if "softmax" in ablate:
        return s, None, None
    half = jax.lax.broadcasted_iota(jnp.int32, s.shape, s.ndim - 1) < n
    if "softmax_max" not in ablate:
        if _softmax_scalar_max():
            s = _scalar_shift(s)
        else:
            m1 = jnp.max(jnp.where(half, s, -1e30), axis=-1, keepdims=True)
            m2 = jnp.max(jnp.where(half, -1e30, s), axis=-1, keepdims=True)
            s = s - jax.lax.stop_gradient(jnp.where(half, m1, m2))
    e = jnp.exp(s)
    d1 = jnp.sum(jnp.where(half, e, 0.0), axis=-1, keepdims=True)
    d2 = jnp.sum(jnp.where(half, 0.0, e), axis=-1, keepdims=True)
    return e, 1.0 / d1, 1.0 / d2


def _apply_half_recip(o, r1, r2, dh: int):
    """Scale the packed att output's lane halves ((..., 2*dh)) by the
    deferred softmax reciprocals; no-op when softmax was ablated."""
    if r1 is None:
        return o
    lane = jax.lax.broadcasted_iota(jnp.int32, o.shape, o.ndim - 1)
    return o * jnp.where(lane < dh, r1, r2)


def _pack_bias_pairs(bias_hnn):
    """(heads, N, N) -> (heads//2, N, 2N): lane-concat each head pair's
    bias to match the packed score layout (host-side, hoisted)."""
    return jnp.concatenate([bias_hnn[0::2], bias_hnn[1::2]], axis=-1)


import contextlib


@contextlib.contextmanager
def inference_only_scope():
    """Trace-time gate: code traced inside this scope uses the XLA module
    path instead of the fused kernels (used by training-loss tracing)."""
    global _TRACE_DISABLED
    prev = _TRACE_DISABLED
    _TRACE_DISABLED = True
    try:
        yield
    finally:
        _TRACE_DISABLED = prev


# ---------------------------------------------------------------- reference
def rotary_tables(n: int, rot_dim: int) -> Tuple[np.ndarray, np.ndarray]:
    inv_freq = 1.0 / (10000 ** (np.arange(0, rot_dim, 2) / rot_dim))
    freqs = np.einsum("i,j->ij", np.arange(n), inv_freq)
    freqs = np.repeat(freqs, 2, axis=-1)
    return np.cos(freqs).astype(np.float32), np.sin(freqs).astype(np.float32)


def _rotate_half(x):
    x1, x2 = x[..., 0::2], x[..., 1::2]
    return jnp.stack([-x2, x1], axis=-1).reshape(x.shape)


def stw_layer_reference(x, gamma, w_qkv, w_proj, b_proj, bias_hnn, masks,
                        mask_ids, *, window, shift, heads, dim_head, rotary,
                        eps=1e-5):
    """Pure-jnp whole layer (backward recompute + CPU fallback + parity).

    x: (B, T, H, W, C) unpadded/unrolled. Returns x + attn_out. Numerics
    mirror the module path (nn/attention.py): qkv/proj matmuls in x.dtype,
    softmax in float32.
    """
    B, T, H, W, C = x.shape
    wd, wh, ww = window
    N = wd * wh * ww
    dtype = x.dtype

    x32 = x.astype(jnp.float32)
    mean = x32.mean(-1, keepdims=True)
    var = x32.var(-1, keepdims=True)
    h = ((x32 - mean) * jax.lax.rsqrt(var + eps) * gamma).astype(dtype)

    pad_d = (wd - T % wd) % wd
    pad_h = (wh - H % wh) % wh
    pad_w = (ww - W % ww) % ww
    if pad_d or pad_h or pad_w:
        h = jnp.pad(h, ((0, 0), (0, pad_d), (0, pad_h), (0, pad_w), (0, 0)))
    if any(s > 0 for s in shift):
        h = jnp.roll(h, shift=(-shift[0], -shift[1], -shift[2]), axis=(1, 2, 3))
    _, Tp, Hp, Wp, _ = h.shape

    windows = attn_lib.window_partition(h, window)  # (B*nW, N, C)
    qkv = windows @ w_qkv.astype(dtype)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    Bn = q.shape[0]

    def heads_split(a):
        return a.reshape(Bn, N, heads, dim_head).transpose(0, 2, 1, 3)

    q, k, v = heads_split(q), heads_split(k), heads_split(v)
    q = q * (dim_head ** -0.5)
    if rotary:
        rot = min(32, dim_head)
        cos, sin = rotary_tables(N, rot)
        cos, sin = jnp.asarray(cos, dtype), jnp.asarray(sin, dtype)

        def rope(a):
            a_r, a_p = a[..., :rot], a[..., rot:]
            a_r = a_r * cos + _rotate_half(a_r) * sin
            return jnp.concatenate([a_r, a_p], -1) if rot < dim_head else a_r

        q, k = rope(q), rope(k)

    s = jnp.einsum("bhid,bhjd->bhij", q, k)
    s = s + bias_hnn[None].astype(s.dtype)
    if masks is not None:
        add = jnp.take(masks, mask_ids, axis=0)  # (nW, N, N)
        nW = add.shape[0]
        s = s.reshape(Bn // nW, nW, heads, N, N) + add[None, :, None].astype(s.dtype)
        s = s.reshape(Bn, heads, N, N)
    s = jax.nn.softmax(s.astype(jnp.float32), axis=-1).astype(s.dtype)
    o = jnp.einsum("bhij,bhjd->bhid", s, v)
    o = o.transpose(0, 2, 1, 3).reshape(Bn, N, heads * dim_head)
    o = o.astype(dtype) @ w_proj.astype(dtype) + b_proj.astype(dtype)

    out = attn_lib.window_reverse(o, window, B, Tp, Hp, Wp)
    if any(sh > 0 for sh in shift):
        out = jnp.roll(out, shift=shift, axis=(1, 2, 3))
    out = out[:, :T, :H, :W]
    return (x32 + out.astype(jnp.float32)).astype(dtype)


# ---------------------------------------------------------------- kernel
def _vmem_limit_bytes() -> int:
    """Per-kernel Mosaic VMEM limit passed via CompilerParams.

    v5e has 128 MB physical VMEM; the compiler's default scoped limit is
    16 MB. Raising it admits larger programs than the default would —
    measured (round 1, pre-head-packing): the forward optimum was the
    1024-token budget. Post-packing (round 3) the balance flipped
    slightly: 2048-token forwards win ~1.5% end-to-end (512: -1%,
    sampling 293.3 / 296.1 / 300.6 f/s at 512/1024/2048) — 2048 is the
    default now. The BACKWARD kernels (~4x live intermediates) gain
    headroom beyond the 256 tokens the 16 MB limit forced."""
    return int(os.environ.get("EXTDM_PALLAS_VMEM_MB", "96")) * 1024 * 1024


def _scoped_cap() -> int:
    # Leave 30% of the declared limit for IO double-buffering + slop in
    # the per-token model below.
    return int(0.7 * _vmem_limit_bytes())


def _scoped_bytes_per_token(hidden: int, c: int) -> int:
    """Estimated Mosaic scoped-VMEM bytes per token (forward kernels).

    Calibrated against compiler scoped-allocation reports on the temporal
    kernel at hidden=256: ~11.5 KB/token (960 tokens -> ~11 MB scoped,
    1920 -> ~22 MB). Dominated by f32 q/k/v + rotary/score transients
    (the hidden term); the C term (f32 slab + output) is smaller."""
    return hidden * 46 + 8 * c


def _bwd_vmem_mult() -> float:
    """Scoped-VMEM calibration factor for the backward kernels' live set
    relative to the forward per-token model (_scoped_bytes_per_token).
    Default 4 = the round-1 "~4x the forward's intermediates" observation;
    EXTDM_BWD_VMEM_MULT lowers it to admit larger backward blocks for
    block-size A/B probes (Mosaic errors loudly if a block then does not
    actually fit the declared VMEM limit)."""
    return float(os.environ.get("EXTDM_BWD_VMEM_MULT", "4"))


def _pick_kt(n_tw: int, wh_rows: int, wd: int, wp: int, c: int,
             max_tokens: int = None, hidden: int = None,
             mult: int = 1) -> int:
    """T-window rows per program: bounded tokens/VMEM per program.

    Default budget 2048 tokens for forwards (round-3 measured optimum
    post-head-packing; round 1's 1024 optimum predates it; 4096 still
    loses DMA/compute overlap). The byte cap keeps adventurous env
    budgets within the declared VMEM limit; `mult` scales the estimate
    for the backward kernels (~4x the forward's intermediates).
    """
    if max_tokens is None:
        max_tokens = int(os.environ.get("EXTDM_STW_FWD_TOKENS", "2048"))
    best = 1
    for kt in range(1, n_tw + 1):
        if n_tw % kt:
            continue
        tokens = kt * wd * wh_rows * wp
        if tokens > max_tokens:
            continue
        if hidden is not None:
            if tokens * mult * _scoped_bytes_per_token(hidden, c) \
                    > _scoped_cap():
                continue
        elif tokens * c * 4 > 2 * 1024 * 1024:
            continue
        best = kt
    return best


def _make_kernel(KT: int, wd: int, wh: int, ww: int, Wp: int, C: int,
                 heads: int, dim_head: int, M: int, n_hw: int, n_ww: int,
                 rot: int, eps: float):
    N = wd * wh * ww
    nww = Wp // ww
    W8 = KT * nww  # windows per program
    hidden = heads * dim_head
    f32 = jnp.float32
    ablate = _ablate()
    pack2 = _headpack_ok(heads, dim_head)

    def kernel(x_ref, wqkv_ref, wproj_ref, bproj_ref,
               bias_ref, cos_ref, sin_ref, *rest):
        # NOTE on Mosaic layout limits: the lane (minor) dim must never be
        # reshaped. q/k/v and heads are extracted with lane *slices*; the
        # rotary tables are pre-tiled across heads so RoPE runs full-width;
        # window regrouping only permutes non-lane dims.
        mask_ref, o_ref = (rest if M else (None, rest[0]))
        xb = x_ref[0].astype(f32)  # (KT*wd, wh, Wp, C)
        # --- channel LayerNorm (gamma only, biased var) ---------------
        mean = xb.mean(-1, keepdims=True)
        var = ((xb - mean) ** 2).mean(-1, keepdims=True)
        # gamma is folded into wqkv_ref host-side (_fused_padded)
        h = (xb - mean) * jax.lax.rsqrt(var + eps)
        # --- regroup into windows: token order (t, h, w) per window ---
        if "regroup" in ablate:
            h = h.reshape(W8 * N, C)
        else:
            h = h.reshape(KT, wd, wh, nww, ww, C)
            h = h.transpose(0, 3, 1, 2, 4, 5).reshape(W8 * N, C)
        # --- qkv ------------------------------------------------------
        # when rot, wqkv_ref is AUGMENTED host-side (_fused_padded) with
        # two signed pair-swapped column blocks so RoPE's rotate-half
        # comes off the MXU (rot(z) = z*cos + R(z)*sin) — no lane rolls;
        # the q 1/sqrt(d) scale is folded into the weights too.
        qkv = jax.lax.dot_general(
            h.astype(x_ref.dtype), wqkv_ref[:],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=f32,
        )  # (W8*N, (3 or 5)*hidden)
        q = qkv[:, :hidden].reshape(W8, N, hidden)
        k = qkv[:, hidden:2 * hidden].reshape(W8, N, hidden)
        v = qkv[:, 2 * hidden:3 * hidden].reshape(W8, N, hidden)
        # --- rotary (interleaved pairs, head-tiled tables) -------------
        if rot and "rope" not in ablate:
            cos = cos_ref[:].astype(f32)[None]  # (1, N, hidden) pre-tiled
            sin = sin_ref[:].astype(f32)[None]
            qr = qkv[:, 3 * hidden:4 * hidden].reshape(W8, N, hidden)
            kr = qkv[:, 4 * hidden:].reshape(W8, N, hidden)
            q = q * cos + qr * sin
            k = k * cos + kr * sin
        # --- per-program shift-mask block --------------------------------
        if M:
            # pre-expanded in XLA (scan-invariant -> hoisted out of the
            # DDIM loop) and DMA'd per program by the BlockSpec: the old
            # in-kernel W8-gather + concat cost ~18 ms/fwd at 32x32.
            mask_add = mask_ref[:].reshape(W8, N, N)  # (KT,1,nww,N,N) view
        # --- attention, one head at a time (lane slices) ---------------
        if _attn_io_dtype_casts():
            # match the module path: bf16 operands, f32 accumulate
            q = q.astype(x_ref.dtype)
            k = k.astype(x_ref.dtype)
            v = v.astype(x_ref.dtype)
        if "attn" in ablate:
            o = v.astype(f32).reshape(W8 * N, hidden)
        elif pack2:
            # pairwise head packing (see _headpack_ok): scores for heads
            # (2p, 2p+1) come out of ONE (N, 2dh)x(2dh, 2N) pass, att out
            # of ONE (N, 2N)x(2N, 2dh) pass whose result is already the
            # contiguous output lane block.
            if M:
                mask2 = jnp.concatenate([mask_add, mask_add], axis=-1)
            outs = []
            for p2 in range(heads // 2):
                sl2 = slice(2 * p2 * dim_head, (2 * p2 + 2) * dim_head)
                k_bd = _block_diag2(k[:, :, sl2], dim_head)
                s = jax.lax.dot_general(
                    q[:, :, sl2], k_bd,
                    dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                    preferred_element_type=f32,
                )  # (W8, N, 2N)
                s = s + bias_ref[p2].astype(f32)[None]
                if M:
                    s = s + mask2
                e, r1, r2 = _softmax_lane_halves_parts(s, N, ablate)
                v_bd = _block_diag2(v[:, :, sl2], dim_head)
                op = jax.lax.dot_general(
                    e.astype(v.dtype), v_bd,
                    dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=f32,
                )  # (W8, N, 2*dim_head)
                outs.append(_apply_half_recip(op, r1, r2, dim_head))
            o = jnp.concatenate(outs, axis=-1).reshape(W8 * N, hidden)
        else:
            outs = []
            for hd in range(heads):
                sl = slice(hd * dim_head, (hd + 1) * dim_head)
                s = jax.lax.dot_general(
                    q[:, :, sl], k[:, :, sl],
                    dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                    preferred_element_type=f32,
                )  # (W8, N, N)
                s = s + bias_ref[hd].astype(f32)[None]
                if M:
                    s = s + mask_add
                recip = None
                if "softmax" not in ablate:
                    if "softmax_max" not in ablate:
                        s = _shifted(s)
                    s = jnp.exp(s)
                    recip = 1.0 / s.sum(axis=-1, keepdims=True)
                op = jax.lax.dot_general(
                    s.astype(v.dtype), v[:, :, sl],
                    dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=f32,
                )  # (W8, N, dim_head)
                outs.append(op if recip is None else op * recip)
            o = jnp.concatenate(outs, axis=-1).reshape(W8 * N, hidden)
        # --- output projection + residual -------------------------------
        o = jax.lax.dot_general(
            o.astype(x_ref.dtype), wproj_ref[:],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=f32,
        ) + bproj_ref[0].astype(f32)
        # --- back to slab layout ---------------------------------------
        o = o.reshape(KT, nww, wd, wh, ww, C)
        o = o.transpose(0, 2, 3, 1, 4, 5).reshape(KT * wd, wh, Wp, C)
        o_ref[0] = (o + xb).astype(o_ref.dtype)

    return kernel


# imports deferred so CPU-only envs never touch pallas at module import
pl = None
pltpu = None


def _ensure_pallas():
    global pl, pltpu
    if pl is None:
        from jax.experimental import pallas as _pl
        from jax.experimental.pallas import tpu as _pltpu

        globals()["pl"] = _pl
        globals()["pltpu"] = _pltpu


def _fused_padded(x, gamma, w_qkv, w_proj, b_proj, bias_hnn, cos, sin,
                  masks, mask_ids, *, window, heads, dim_head, rot, eps,
                  interpret, masks_exp=None):
    """Kernel launch on the padded+rolled tensor x: (B, Tp, Hp, Wp, C).

    masks_exp: optional pre-expanded (n_tw, n_hw, n_ww, N, N) mask block
    (the H-sharded spatial path passes each shard's slice directly)."""
    _ensure_pallas()
    B, Tp, Hp, Wp, C = x.shape
    wd, wh, ww = window
    N = wd * wh * ww
    n_tw, n_hw, n_ww = Tp // wd, Hp // wh, Wp // ww
    KT = _pick_kt(n_tw, wh, wd, Wp, C, hidden=heads * dim_head)
    M = 1 if masks_exp is not None else (0 if masks is None else masks.shape[0])

    x_spec = pl.BlockSpec((1, KT * wd, wh, Wp, C),
                          lambda b, it, ih: (b, it, ih, 0, 0))
    const = lambda shape: pl.BlockSpec(shape,
                                       lambda b, it, ih: tuple(0 for _ in shape))
    hidden = heads * dim_head

    pack2 = _headpack_ok(heads, dim_head)
    bias_spec = (heads // 2, N, 2 * N) if pack2 else (heads, N, N)
    bias_in = (_pack_bias_pairs(bias_hnn) if pack2 else bias_hnn)
    # gamma-folded qkv weights, q pre-scaled by 1/sqrt(d); when rot, two
    # signed pair-swapped column blocks are appended so the kernel's RoPE
    # rotate-half comes off the MXU (see _temporal_impl for the original).
    w_f = gamma.astype(jnp.float32)[:, None] * w_qkv.astype(jnp.float32)
    wq = w_f[:, :hidden] * (dim_head ** -0.5)
    wk = w_f[:, hidden:2 * hidden]
    wv = w_f[:, 2 * hidden:]
    if rot:
        w_in = jnp.concatenate(
            [wq, wk, wv, _pair_swap_neg(wq), _pair_swap_neg(wk)], axis=1)
    else:
        w_in = jnp.concatenate([wq, wk, wv], axis=1)
    n_aug = w_in.shape[1]
    in_specs = [
        x_spec,
        const((C, n_aug)),          # w_qkv (gamma folded, rope-augmented)
        const((hidden, C)),         # w_proj
        const((1, C)),              # b_proj
        const(bias_spec),           # bias (pair-packed when pack2)
        const((N, hidden)),         # cos (head-tiled)
        const((N, hidden)),         # sin (head-tiled)
    ]
    inputs = [
        x,
        w_in.astype(x.dtype),
        w_proj.astype(x.dtype),
        b_proj.reshape(1, C).astype(jnp.float32),
        bias_in.astype(jnp.float32), cos, sin,
    ]
    if M:
        in_specs.append(_mask_spec(pl, KT, n_ww, N))
        inputs.append(masks_exp if masks_exp is not None else
                      _expand_masks(masks, mask_ids, n_tw, n_hw, n_ww, N))

    grid_spec = pl.GridSpec(
        grid=(B, n_tw // KT, n_hw),
        in_specs=in_specs,
        out_specs=x_spec,
    )
    kernel = _make_kernel(KT, wd, wh, ww, Wp, C, heads, dim_head,
                          M, n_hw, n_ww, rot, eps)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        compiler_params=pltpu.CompilerParams(
            # forward has no cross-program accumulation -> parallel grid
            # (the backward kernels revisit constant-index output blocks
            # and must stay sequential/arbitrary)
            dimension_semantics=("parallel", "parallel", "parallel"),
            vmem_limit_bytes=_vmem_limit_bytes()),
        interpret=interpret,
    )(*inputs)


def _expand_masks(masks, mask_ids, n_tw, n_hw, n_ww, N):
    """(M, N, N) unique masks + per-window ids -> (n_tw, n_hw, n_ww, N, N).

    Runs in XLA at the call site: masks/ids are trace-time constants, so
    the gather is loop-invariant and hoisted out of the DDIM scan — the
    kernels' BlockSpecs then DMA the per-program block instead of doing
    W8 dynamic gathers + a concat in VMEM (~18 ms/UNet-fwd at 32x32)."""
    exp = jnp.take(masks.astype(jnp.float32), mask_ids, axis=0)
    return exp.reshape(n_tw, n_hw, n_ww, N, N)


def _mask_spec(pl, KT, n_ww, N):
    return pl.BlockSpec((KT, 1, n_ww, N, N),
                        lambda b, it, ih: (it, ih, 0, 0, 0))


# ----------------------------------------------- window-major forward
def _wm_partition(xp, window):
    """(B, Tp, Hp, Wp, C) -> (B, nW, N, C), token order (t, h, w) per
    window, window order (tw, hw, ww) — matches attn_lib.window_partition.
    One XLA transpose-copy (fused with the preceding pad/roll)."""
    B, Tp, Hp, Wp, C = xp.shape
    wd, wh, ww = window
    n_tw, n_hw, n_ww = Tp // wd, Hp // wh, Wp // ww
    xw = xp.reshape(B, n_tw, wd, n_hw, wh, n_ww, ww, C)
    xw = xw.transpose(0, 1, 3, 5, 2, 4, 6, 7)
    return xw.reshape(B, n_tw * n_hw * n_ww, wd * wh * ww, C)


def _wm_reverse(ow, window, padded_shape):
    """Inverse of _wm_partition."""
    B, Tp, Hp, Wp, C = padded_shape
    wd, wh, ww = window
    n_tw, n_hw, n_ww = Tp // wd, Hp // wh, Wp // ww
    o = ow.reshape(B, n_tw, n_hw, n_ww, wd, wh, ww, C)
    o = o.transpose(0, 1, 4, 2, 5, 3, 6, 7)
    return o.reshape(B, Tp, Hp, Wp, C)


def _pick_g(nW: int, N: int, C: int, hidden: int, mult: int = 1) -> int:
    """Windows per program for the window-major kernel: largest divisor
    of nW within the token budget and scoped-VMEM cap."""
    max_tokens = int(os.environ.get("EXTDM_STW_FWD_TOKENS", "2048"))
    best = 1
    for g in range(1, nW + 1):
        if nW % g:
            continue
        tokens = g * N
        if tokens > max_tokens:
            break
        if tokens * mult * _scoped_bytes_per_token(hidden, C) > _scoped_cap():
            break
        best = g
    return best


def _make_kernel_wm(G: int, N: int, C: int, heads: int, dim_head: int,
                    M: int, rot: int, eps: float):
    """Same math as _make_kernel on a pre-windowed (G, N, C) block: no
    in-VMEM window regroup/ungroup transposes."""
    hidden = heads * dim_head
    f32 = jnp.float32

    def kernel(x_ref, wqkv_ref, wproj_ref, bproj_ref,
               bias_ref, cos_ref, sin_ref, *rest):
        mask_ref, o_ref = (rest if M else (None, rest[0]))
        xb = x_ref[0].astype(f32)  # (G, N, C)
        mean = xb.mean(-1, keepdims=True)
        var = ((xb - mean) ** 2).mean(-1, keepdims=True)
        # gamma is folded into wqkv_ref host-side
        h = ((xb - mean) * jax.lax.rsqrt(var + eps)).reshape(G * N, C)
        qkv = jax.lax.dot_general(
            h.astype(x_ref.dtype), wqkv_ref[:],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=f32,
        )  # (G*N, 3*hidden)
        q = qkv[:, :hidden].reshape(G, N, hidden) * (dim_head ** -0.5)
        k = qkv[:, hidden:2 * hidden].reshape(G, N, hidden)
        v = qkv[:, 2 * hidden:].reshape(G, N, hidden)
        if rot:
            cos = cos_ref[:].astype(f32)[None]
            sin = sin_ref[:].astype(f32)[None]
            lane = jax.lax.broadcasted_iota(jnp.int32, (1, N, hidden), 2)
            even = (lane % 2) == 0

            def rope(a):
                up = pltpu.roll(a, hidden - 1, axis=2)
                down = pltpu.roll(a, 1, axis=2)
                half = jnp.where(even, -up, down)
                return a * cos + half * sin

            q, k = rope(q), rope(k)
        if M:
            mask_add = mask_ref[:]  # (G, N, N)
        if _attn_io_dtype_casts():
            q = q.astype(x_ref.dtype)
            k = k.astype(x_ref.dtype)
            v = v.astype(x_ref.dtype)
        outs = []
        for hd in range(heads):
            sl = slice(hd * dim_head, (hd + 1) * dim_head)
            s = jax.lax.dot_general(
                q[:, :, sl], k[:, :, sl],
                dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                preferred_element_type=f32,
            )  # (G, N, N)
            s = s + bias_ref[hd].astype(f32)[None]
            if M:
                s = s + mask_add
            s = _shifted(s)
            e = jnp.exp(s)
            s = e / e.sum(axis=-1, keepdims=True)
            outs.append(jax.lax.dot_general(
                s.astype(v.dtype), v[:, :, sl],
                dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                preferred_element_type=f32,
            ))  # (G, N, dim_head)
        o = jnp.concatenate(outs, axis=-1).reshape(G * N, hidden)
        o = jax.lax.dot_general(
            o.astype(x_ref.dtype), wproj_ref[:],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=f32,
        ) + bproj_ref[0].astype(f32)
        o_ref[0] = (o.reshape(G, N, C) + xb).astype(o_ref.dtype)

    return kernel


def _fused_padded_wm(xw, gamma, w_qkv, w_proj, b_proj, bias_hnn, cos, sin,
                     masks_exp, *, heads, dim_head, rot, eps, interpret):
    """Window-major kernel launch. xw: (B, nW, N, C) pre-windowed;
    masks_exp: (nW, N, N) pre-expanded shift masks or None."""
    _ensure_pallas()
    B, nW, N, C = xw.shape
    hidden = heads * dim_head
    G = _pick_g(nW, N, C, hidden)
    M = 0 if masks_exp is None else 1

    x_spec = pl.BlockSpec((1, G, N, C), lambda b, iw: (b, iw, 0, 0))
    const = lambda shape: pl.BlockSpec(shape,
                                       lambda b, iw: tuple(0 for _ in shape))
    in_specs = [
        x_spec,
        const((C, 3 * hidden)),
        const((hidden, C)),
        const((1, C)),
        const((heads, N, N)),
        const((N, hidden)),
        const((N, hidden)),
    ]
    inputs = [
        xw,
        (gamma.astype(jnp.float32)[:, None]
         * w_qkv.astype(jnp.float32)).astype(xw.dtype),
        w_proj.astype(xw.dtype),
        b_proj.reshape(1, C).astype(jnp.float32),
        bias_hnn.astype(jnp.float32), cos, sin,
    ]
    if M:
        in_specs.append(pl.BlockSpec((G, N, N), lambda b, iw: (iw, 0, 0)))
        inputs.append(masks_exp)

    grid_spec = pl.GridSpec(
        grid=(B, nW // G),
        in_specs=in_specs,
        out_specs=x_spec,
    )
    kernel = _make_kernel_wm(G, N, C, heads, dim_head, M, rot, eps)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(xw.shape, xw.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            vmem_limit_bytes=_vmem_limit_bytes()),
        interpret=interpret,
    )(*inputs)


# ------------------------------------------------------------- STW backward
def _make_stw_bwd_kernel(KT: int, wd: int, wh: int, ww: int, Wp: int, C: int,
                         heads: int, dim_head: int, M: int, n_hw: int,
                         n_ww: int, rot: int, eps: float):
    """One fused backward pass: reads (x, g) slabs once, recomputes the
    forward intermediates in VMEM, writes dx and accumulates all weight
    grads across the sequential TPU grid (revisited const-index outputs)."""
    N = wd * wh * ww
    nww = Wp // ww
    W8 = KT * nww
    hidden = heads * dim_head
    f32 = jnp.float32
    pack2 = _headpack_ok(heads, dim_head)

    def kernel(x_ref, g_ref, gamma_ref, wqkv_ref, wproj_ref,
               bias_ref, cos_ref, sin_ref, *rest):
        if M:
            (mask_ref, dx_ref, dgamma_ref, dwqkv_ref, dwproj_ref,
             dbproj_ref, dbias_ref) = rest
        else:
            mask_ref = None
            (dx_ref, dgamma_ref, dwqkv_ref, dwproj_ref,
             dbproj_ref, dbias_ref) = rest
        b = pl.program_id(0)
        it = pl.program_id(1)
        ih = pl.program_id(2)

        @pl.when(jnp.logical_and(b == 0, jnp.logical_and(it == 0, ih == 0)))
        def _init():
            dgamma_ref[:] = jnp.zeros_like(dgamma_ref)
            dwqkv_ref[:] = jnp.zeros_like(dwqkv_ref)
            dwproj_ref[:] = jnp.zeros_like(dwproj_ref)
            dbproj_ref[:] = jnp.zeros_like(dbproj_ref)
            dbias_ref[:] = jnp.zeros_like(dbias_ref)

        dtype = x_ref.dtype
        xb = x_ref[0].astype(f32)   # (KT*wd, wh, Wp, C)
        gb = g_ref[0].astype(f32)
        gamma = gamma_ref[0].astype(f32)

        # ---- recompute forward ----------------------------------------
        mean = xb.mean(-1, keepdims=True)
        var = ((xb - mean) ** 2).mean(-1, keepdims=True)
        rstd = jax.lax.rsqrt(var + eps)
        xhat = (xb - mean) * rstd
        h_slab = xhat * gamma

        def regroup(a):  # slab -> (W8*N, C); only non-lane dims move
            a = a.reshape(KT, wd, wh, nww, ww, C)
            return a.transpose(0, 3, 1, 2, 4, 5).reshape(W8 * N, C)

        def ungroup(a):  # (W8*N, C) -> slab
            a = a.reshape(KT, nww, wd, wh, ww, C)
            return a.transpose(0, 2, 3, 1, 4, 5).reshape(KT * wd, wh, Wp, C)

        hw = regroup(h_slab)
        go = regroup(gb)
        qkv = jax.lax.dot_general(
            hw.astype(dtype), wqkv_ref[:],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=f32,
        )
        q0 = qkv[:, :hidden].reshape(W8, N, hidden) * (dim_head ** -0.5)
        k0 = qkv[:, hidden:2 * hidden].reshape(W8, N, hidden)
        v = qkv[:, 2 * hidden:].reshape(W8, N, hidden)
        if rot:
            cos = cos_ref[:].astype(f32)[None]
            sin = sin_ref[:].astype(f32)[None]
            lane = jax.lax.broadcasted_iota(jnp.int32, (1, N, hidden), 2)
            even = (lane % 2) == 0

            def half(a):
                up = pltpu.roll(a, hidden - 1, axis=2)
                down = pltpu.roll(a, 1, axis=2)
                return jnp.where(even, -up, down)

            q = q0 * cos + half(q0) * sin
            k = k0 * cos + half(k0) * sin
        else:
            q, k = q0, k0
        if M:
            mask_add = mask_ref[:].reshape(W8, N, N)  # pre-expanded block

        dbproj_ref[0] += go.sum(axis=0).astype(dbproj_ref.dtype)
        do = jax.lax.dot_general(
            go.astype(dtype), wproj_ref[:],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=f32,
        ).reshape(W8, N, hidden)

        if pack2:
            # merged recompute + backward per HEAD PAIR (see _headpack_ok):
            # one live (W8, N, 2N) probability matrix instead of all
            # heads', and every matmul streams against a full-width tile.
            # Matmul operands cast to the IO dtype (f32 accumulate) like
            # the forward and the module path's autodiff; softmax and dS
            # algebra stay f32. EXTDM_ATTN_BF16=0 keeps f32 operands.
            cdt = dtype if _attn_io_dtype_casts() else f32
            if M:
                mask2 = jnp.concatenate([mask_add, mask_add], axis=-1)
            half_m = None
            outs, dqs, dks, dvs = [], [], [], []
            for p2 in range(heads // 2):
                sl2 = slice(2 * p2 * dim_head, (2 * p2 + 2) * dim_head)
                q_c = q[:, :, sl2].astype(cdt)
                k_bd = _block_diag2(k[:, :, sl2].astype(cdt), dim_head)
                v_bd = _block_diag2(v[:, :, sl2].astype(cdt), dim_head)
                s = jax.lax.dot_general(
                    q_c, k_bd,
                    dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                    preferred_element_type=f32,
                )  # (W8, N, 2N)
                s = s + bias_ref[p2].astype(f32)[None]
                if M:
                    s = s + mask2
                if half_m is None:
                    half_m = jax.lax.broadcasted_iota(
                        jnp.int32, s.shape, s.ndim - 1) < N
                    lane = jax.lax.broadcasted_iota(
                        jnp.int32, (W8, N, 2 * dim_head), 2)
                if _softmax_scalar_max():
                    e = jnp.exp(_scalar_shift(s))
                else:
                    m1 = jnp.max(jnp.where(half_m, s, -1e30), -1,
                                 keepdims=True)
                    m2 = jnp.max(jnp.where(half_m, -1e30, s), -1,
                                 keepdims=True)
                    e = jnp.exp(s - jnp.where(half_m, m1, m2))
                d1 = jnp.sum(jnp.where(half_m, e, 0.0), -1, keepdims=True)
                d2 = jnp.sum(jnp.where(half_m, 0.0, e), -1, keepdims=True)
                p = e / jnp.where(half_m, d1, d2)
                p_c = p.astype(cdt)
                outs.append(jax.lax.dot_general(
                    p_c, v_bd,
                    dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=f32,
                ))  # (W8, N, 2dh) — contiguous output lane block
                dO = do[:, :, sl2].astype(cdt)
                dP = jax.lax.dot_general(
                    dO, v_bd,
                    dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                    preferred_element_type=f32,
                )  # (W8, N, 2N)
                dv_bd = jax.lax.dot_general(
                    p_c, dO,
                    dimension_numbers=(((1,), (1,)), ((0,), (0,))),
                    preferred_element_type=f32,
                )  # (W8, 2N, 2dh): diagonal blocks are the head grads
                dvs.append(jnp.where(lane < dim_head,
                                     dv_bd[:, :N], dv_bd[:, N:]))
                pdp = dP * p
                r1 = jnp.sum(jnp.where(half_m, pdp, 0.0), -1, keepdims=True)
                r2 = jnp.sum(jnp.where(half_m, 0.0, pdp), -1, keepdims=True)
                dS = (p * (dP - jnp.where(half_m, r1, r2)))
                dbias_ref[p2] += dS.sum(axis=0).astype(dbias_ref.dtype)
                dS_c = dS.astype(cdt)
                dqs.append(jax.lax.dot_general(
                    dS_c, k_bd,
                    dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=f32,
                ))  # (W8, N, 2dh)
                dk_bd = jax.lax.dot_general(
                    dS_c, q_c,
                    dimension_numbers=(((1,), (1,)), ((0,), (0,))),
                    preferred_element_type=f32,
                )  # (W8, 2N, 2dh)
                dks.append(jnp.where(lane < dim_head,
                                     dk_bd[:, :N], dk_bd[:, N:]))
        else:
            ps = []
            outs = []
            for hd in range(heads):
                sl = slice(hd * dim_head, (hd + 1) * dim_head)
                s = jax.lax.dot_general(
                    q[:, :, sl], k[:, :, sl],
                    dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                    preferred_element_type=f32,
                )
                s = s + bias_ref[hd].astype(f32)[None]
                if M:
                    s = s + mask_add
                s = _shifted(s)
                e = jnp.exp(s)
                p = e / e.sum(axis=-1, keepdims=True)
                ps.append(p)
                outs.append(jax.lax.dot_general(
                    p, v[:, :, sl],
                    dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=f32,
                ))

            dqs, dks, dvs = [], [], []
            for hd in range(heads):
                sl = slice(hd * dim_head, (hd + 1) * dim_head)
                p = ps[hd]
                dO = do[:, :, sl]
                dP = jax.lax.dot_general(
                    dO, v[:, :, sl],
                    dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                    preferred_element_type=f32,
                )  # (W8, N, N)
                dvs.append(jax.lax.dot_general(
                    p, dO,
                    dimension_numbers=(((1,), (1,)), ((0,), (0,))),
                    preferred_element_type=f32,
                ))  # (W8, N, dh)
                dS = p * (dP - (dP * p).sum(axis=-1, keepdims=True))
                dbias_ref[hd] += dS.sum(axis=0).astype(dbias_ref.dtype)
                dqs.append(jax.lax.dot_general(
                    dS, k[:, :, sl],
                    dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=f32,
                ))
                dks.append(jax.lax.dot_general(
                    dS, q[:, :, sl],
                    dimension_numbers=(((1,), (1,)), ((0,), (0,))),
                    preferred_element_type=f32,
                ))

        # ---- backward: output projection ------------------------------
        o = jnp.concatenate(outs, axis=-1).reshape(W8 * N, hidden)
        dwproj_ref[:] += jax.lax.dot_general(
            o.astype(dtype), go.astype(dtype),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=f32,
        ).astype(dwproj_ref.dtype)
        dq_r = jnp.concatenate(dqs, axis=-1)  # grads wrt roped q
        dk_r = jnp.concatenate(dks, axis=-1)
        dv = jnp.concatenate(dvs, axis=-1)
        if rot:
            # rope backward: rh^T = -rh and sin is pair-constant, so
            # d = dy*cos + rh(dy)*(-sin)
            dq0 = dq_r * cos + half(dq_r) * (-sin)
            dk0 = dk_r * cos + half(dk_r) * (-sin)
        else:
            dq0, dk0 = dq_r, dk_r
        dq0 = dq0 * (dim_head ** -0.5)
        dqkv = jnp.concatenate(
            [dq0.reshape(W8 * N, hidden), dk0.reshape(W8 * N, hidden),
             dv.reshape(W8 * N, hidden)], axis=-1)

        # ---- backward: qkv projection ----------------------------------
        dwqkv_ref[:] += jax.lax.dot_general(
            hw.astype(dtype), dqkv.astype(dtype),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=f32,
        ).astype(dwqkv_ref.dtype)
        dh = jax.lax.dot_general(
            dqkv.astype(dtype), wqkv_ref[:],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=f32,
        )
        dh_slab = ungroup(dh)

        # ---- backward: channel LayerNorm --------------------------------
        dgamma_ref[0] += (dh_slab * xhat).sum(axis=(0, 1, 2)).astype(
            dgamma_ref.dtype)
        dxhat = dh_slab * gamma
        m1 = dxhat.mean(axis=-1, keepdims=True)
        m2 = (dxhat * xhat).mean(axis=-1, keepdims=True)
        dx_ln = rstd * (dxhat - m1 - xhat * m2)
        dx_ref[0] = (gb + dx_ln).astype(dx_ref.dtype)

    return kernel


def _stw_bwd_padded(x, g, gamma, w_qkv, w_proj, bias_hnn, cos, sin, masks,
                    mask_ids, *, window, heads, dim_head, rot, eps,
                    interpret):
    """Backward kernel launch on padded+rolled tensors x, g."""
    _ensure_pallas()
    B, Tp, Hp, Wp, C = x.shape
    wd, wh, ww = window
    N = wd * wh * ww
    n_tw, n_hw, n_ww = Tp // wd, Hp // wh, Wp // ww
    KT = _pick_kt(n_tw, wh, wd, Wp, C,
                  max_tokens=int(os.environ.get("EXTDM_STW_BWD_TOKENS",
                                                "1024")),
                  hidden=heads * dim_head, mult=_bwd_vmem_mult())
    M = 0 if masks is None else masks.shape[0]
    hidden = heads * dim_head
    pack2 = _headpack_ok(heads, dim_head)
    bias_shape = (heads // 2, N, 2 * N) if pack2 else (heads, N, N)
    bias_in = (_pack_bias_pairs(bias_hnn) if pack2 else bias_hnn)

    x_spec = pl.BlockSpec((1, KT * wd, wh, Wp, C),
                          lambda b, it, ih: (b, it, ih, 0, 0))
    const = lambda shape: pl.BlockSpec(
        shape, lambda b, it, ih: tuple(0 for _ in shape))

    in_specs = [
        x_spec,                     # x
        x_spec,                     # g
        const((1, C)),              # gamma
        const((C, 3 * hidden)),     # w_qkv
        const((hidden, C)),         # w_proj
        const(bias_shape),          # bias (pair-packed when pack2)
        const((N, hidden)),         # cos
        const((N, hidden)),         # sin
    ]
    if M:
        in_specs.append(_mask_spec(pl, KT, n_ww, N))

    grid_spec = pl.GridSpec(
        grid=(B, n_tw // KT, n_hw),
        in_specs=in_specs,
        out_specs=[
            x_spec,                     # dx
            const((1, C)),              # dgamma
            const((C, 3 * hidden)),     # dwqkv
            const((hidden, C)),         # dwproj
            const((1, C)),              # dbproj
            const(bias_shape),          # dbias (packed form)
        ],
    )
    kernel = _make_stw_bwd_kernel(KT, wd, wh, ww, Wp, C, heads, dim_head,
                                  M, n_hw, n_ww, rot, eps)
    f32 = jnp.float32
    out_shapes = [
        jax.ShapeDtypeStruct(x.shape, x.dtype),
        jax.ShapeDtypeStruct((1, C), f32),
        jax.ShapeDtypeStruct((C, 3 * hidden), f32),
        jax.ShapeDtypeStruct((hidden, C), f32),
        jax.ShapeDtypeStruct((1, C), f32),
        jax.ShapeDtypeStruct(bias_shape, f32),
    ]
    inputs = [x, g, gamma.reshape(1, C).astype(jnp.float32),
              w_qkv.astype(x.dtype), w_proj.astype(x.dtype),
              bias_in.astype(jnp.float32), cos, sin]
    if M:
        inputs.append(_expand_masks(masks, mask_ids, n_tw, n_hw, n_ww, N))
    outs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shapes,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_vmem_limit_bytes()),
        interpret=interpret,
    )(*inputs)
    if pack2:
        outs = list(outs)
        dbias_p = outs[-1]  # (heads//2, N, 2N) -> interleave back
        outs[-1] = jnp.stack([dbias_p[:, :, :N], dbias_p[:, :, N:]],
                             axis=1).reshape(heads, N, N)
    return outs


def _stw_bwd_impl(x, gamma, w_qkv, w_proj, b_proj, bias_hnn, masks, mask_ids,
                  g, *, window, shift, heads, dim_head, rotary, eps,
                  interpret):
    """Pad/roll bookkeeping around the backward kernel (mirrors forward)."""
    B, T, H, W, C = x.shape
    wd, wh, ww = window
    N = wd * wh * ww
    rot = min(32, dim_head) if rotary else 0
    hidden = heads * dim_head
    cos_np = np.ones((N, hidden), np.float32)
    sin_np = np.zeros((N, hidden), np.float32)
    if rot:
        c, s = rotary_tables(N, rot)
        for hd in range(heads):
            cos_np[:, hd * dim_head : hd * dim_head + rot] = c
            sin_np[:, hd * dim_head : hd * dim_head + rot] = s

    pad_d = (wd - T % wd) % wd
    pad_h = (wh - H % wh) % wh
    pad_w = (ww - W % ww) % ww
    xp, gp = x, g
    if pad_d or pad_h or pad_w:
        pads = ((0, 0), (0, pad_d), (0, pad_h), (0, pad_w), (0, 0))
        xp = jnp.pad(x, pads)
        gp = jnp.pad(g, pads)
    shifted = any(s > 0 for s in shift)
    if shifted:
        neg = (-shift[0], -shift[1], -shift[2])
        xp = jnp.roll(xp, shift=neg, axis=(1, 2, 3))
        gp = jnp.roll(gp, shift=neg, axis=(1, 2, 3))
    dxp, dgamma, dwqkv, dwproj, dbproj, dbias = _stw_bwd_padded(
        xp, gp, gamma, w_qkv, w_proj, bias_hnn,
        jnp.asarray(cos_np, x.dtype), jnp.asarray(sin_np, x.dtype),
        masks, mask_ids, window=window, heads=heads, dim_head=dim_head,
        rot=rot, eps=eps, interpret=interpret)
    if shifted:
        dxp = jnp.roll(dxp, shift=shift, axis=(1, 2, 3))
    if pad_d or pad_h or pad_w:
        dxp = dxp[:, :T, :H, :W]
    return (dxp, dgamma.reshape(C).astype(gamma.dtype),
            dwqkv.astype(w_qkv.dtype), dwproj.astype(w_proj.dtype),
            dbproj.reshape(C).astype(b_proj.dtype),
            dbias.astype(bias_hnn.dtype))


def _layer_impl(x, gamma, w_qkv, w_proj, b_proj, bias_hnn, masks, mask_ids,
                window, shift, heads, dim_head, rotary, eps, interpret,
                masks_exp=None):
    B, T, H, W, C = x.shape
    wd, wh, ww = window
    N = wd * wh * ww
    rot = min(32, dim_head) if rotary else 0
    # head-tiled full-width tables: pass-through lanes get cos=1, sin=0
    hidden = heads * dim_head
    cos_np = np.ones((N, hidden), np.float32)
    sin_np = np.zeros((N, hidden), np.float32)
    if rot:
        c, s = rotary_tables(N, rot)
        for hd in range(heads):
            cos_np[:, hd * dim_head : hd * dim_head + rot] = c
            sin_np[:, hd * dim_head : hd * dim_head + rot] = s

    pad_d = (wd - T % wd) % wd
    pad_h = (wh - H % wh) % wh
    pad_w = (ww - W % ww) % ww
    xp = x
    if pad_d or pad_h or pad_w:
        xp = jnp.pad(x, ((0, 0), (0, pad_d), (0, pad_h), (0, pad_w), (0, 0)))
    shifted = any(s > 0 for s in shift)
    if shifted:
        xp = jnp.roll(xp, shift=(-shift[0], -shift[1], -shift[2]), axis=(1, 2, 3))
    if masks_exp is None and _window_major(shifted, min(xp.shape[2], xp.shape[3])):
        Bp, Tp2, Hp2, Wp2, _ = xp.shape
        n_tw, n_hw, n_ww = Tp2 // wd, Hp2 // window[1], Wp2 // window[2]
        masks_exp = None
        if masks is not None:
            masks_exp = _expand_masks(masks, mask_ids, n_tw, n_hw, n_ww,
                                      N).reshape(n_tw * n_hw * n_ww, N, N)
        xw = _wm_partition(xp, window)
        ow = _fused_padded_wm(
            xw, gamma, w_qkv, w_proj, b_proj, bias_hnn,
            jnp.asarray(cos_np, x.dtype), jnp.asarray(sin_np, x.dtype),
            masks_exp, heads=heads, dim_head=dim_head,
            rot=rot, eps=eps, interpret=interpret)
        out = _wm_reverse(ow, window, xp.shape)
    else:
        out = _fused_padded(
            xp, gamma, w_qkv, w_proj, b_proj, bias_hnn,
            jnp.asarray(cos_np, x.dtype), jnp.asarray(sin_np, x.dtype),
            masks, mask_ids, window=window, heads=heads, dim_head=dim_head,
            rot=rot, eps=eps, interpret=interpret, masks_exp=masks_exp,
        )
    if shifted:
        out = jnp.roll(out, shift=shift, axis=(1, 2, 3))
    if pad_d or pad_h or pad_w:
        # pad tokens carry (pad + attn) values; crop them away. The
        # residual base inside the kernel is the rolled tensor, whose
        # roll-back restores original positions, so cropping yields
        # exactly x + unroll(attn).
        out = out[:, :T, :H, :W]
    return out


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9, 10, 11, 12, 13, 14))
def _fused_layer(x, gamma, w_qkv, w_proj, b_proj, bias_hnn, masks, mask_ids,
                 window, shift, heads, dim_head, rotary, eps, interpret):
    return _layer_impl(x, gamma, w_qkv, w_proj, b_proj, bias_hnn, masks,
                       mask_ids, window, shift, heads, dim_head, rotary,
                       eps, interpret)


def _fused_layer_fwd(x, gamma, w_qkv, w_proj, b_proj, bias_hnn, masks,
                     mask_ids, window, shift, heads, dim_head, rotary, eps,
                     interpret):
    out = _layer_impl(x, gamma, w_qkv, w_proj, b_proj, bias_hnn, masks,
                      mask_ids, window, shift, heads, dim_head, rotary,
                      eps, interpret)
    return out, (x, gamma, w_qkv, w_proj, b_proj, bias_hnn, masks, mask_ids)


def _fused_layer_bwd(window, shift, heads, dim_head, rotary, eps, interpret,
                     res, g):
    x, gamma, w_qkv, w_proj, b_proj, bias_hnn, masks, mask_ids = res

    if backward_kernels_enabled():
        dx, dgamma, dwqkv, dwproj, dbproj, dbias = _stw_bwd_impl(
            x, gamma, w_qkv, w_proj, b_proj, bias_hnn, masks, mask_ids, g,
            window=window, shift=shift, heads=heads, dim_head=dim_head,
            rotary=rotary, eps=eps, interpret=interpret)
        return dx, dgamma, dwqkv, dwproj, dbproj, dbias, None, None

    def ref(x, gamma, w_qkv, w_proj, b_proj, bias_hnn):
        return stw_layer_reference(
            x, gamma, w_qkv, w_proj, b_proj, bias_hnn, masks, mask_ids,
            window=window, shift=shift, heads=heads, dim_head=dim_head,
            rotary=rotary, eps=eps,
        )

    _, vjp = jax.vjp(ref, x, gamma, w_qkv, w_proj, b_proj, bias_hnn)
    dx, dgamma, dwqkv, dwproj, dbproj, dbias = vjp(g)
    return dx, dgamma, dwqkv, dwproj, dbproj, dbias, None, None


_fused_layer.defvjp(_fused_layer_fwd, _fused_layer_bwd)


def fused_stw_layer(x, gamma, w_qkv, w_proj, b_proj, bias_hnn, *, window,
                    shift, heads, dim_head, rotary=True, eps=1e-5,
                    interpret=False):
    """Whole PreNormSTW layer: x + proj(attn(rope(qkv(LN(x))))).

    x: (B, T, H, W, C). gamma: (C,) ChanLayerNorm scale. w_qkv: (C, 3*h*d).
    w_proj: (h*d, C), b_proj: (C,). bias_hnn: (heads, N, N) relative
    position bias for the (possibly clamped) call window. The Swin shift
    mask is computed here (trace-time numpy, deduplicated).
    """
    B, T, H, W, C = x.shape
    wd, wh, ww = window
    Tp, Hp, Wp = (-(-T // wd)) * wd, (-(-H // wh)) * wh, (-(-W // ww)) * ww
    if any(s > 0 for s in shift):
        mask_np = attn_lib._shifted_window_mask(Tp, Hp, Wp, tuple(window),
                                                tuple(shift))
        flat = mask_np.reshape(mask_np.shape[0], -1)
        uniq, ids = np.unique(flat, axis=0, return_inverse=True)
        masks = jnp.asarray(uniq.reshape(-1, mask_np.shape[1], mask_np.shape[2]))
        mask_ids = jnp.asarray(ids.astype(np.int32))
    else:
        masks, mask_ids = None, None
    if spatial_scope_active():
        return _spatial_stw_layer(
            x, gamma, w_qkv, w_proj, b_proj, bias_hnn, masks, mask_ids,
            window=tuple(window), shift=tuple(shift), heads=heads,
            dim_head=dim_head, rotary=rotary, eps=eps)
    return _fused_layer(x, gamma, w_qkv, w_proj, b_proj, bias_hnn, masks,
                        mask_ids, tuple(window), tuple(shift), heads,
                        dim_head, rotary, eps, interpret)


# ===================================================================
# Fused temporal-attention layer (PreNormTemporalAttn, unet3d.py)
# ===================================================================
def temporal_layer_reference(x, gamma_cln, ln_scale, ln_bias, w_qkv, w_proj,
                             bias_hnn, *, heads, dim_head, rotary, eps=1e-5):
    """Pure-jnp whole layer: x + CLN(x) contribution + temporal attention.

    Computes out = x + undo_T(h + attn(LN(h))) with h = T(ChanLN(x)) and
    T = (B,T,H,W,C)->(B,HW,T,C) — exactly PreNormTemporalAttn +
    TemporalAttentionLayer (models/dm/unet3d.py / nn/attention.py), ref
    DenoiseNet_..._ada_u22.py:328-450. bias_hnn: (heads, T, T) additive
    (4-D THW biases are reduced to this form by the caller).
    """
    B, T, H, W, C = x.shape
    dtype = x.dtype
    x32 = x.astype(jnp.float32)

    mean = x32.mean(-1, keepdims=True)
    var = x32.var(-1, keepdims=True)
    a = ((x32 - mean) * jax.lax.rsqrt(var + eps) * gamma_cln).astype(dtype)

    h = a.transpose(0, 2, 3, 1, 4).reshape(B, H * W, T, C)
    h32 = h.astype(jnp.float32)
    mean2 = h32.mean(-1, keepdims=True)
    var2 = h32.var(-1, keepdims=True)
    hn = ((h32 - mean2) * jax.lax.rsqrt(var2 + eps) * ln_scale + ln_bias).astype(dtype)

    qkv = hn @ w_qkv.astype(dtype)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    M = H * W

    def heads_split(z):
        return z.reshape(B, M, T, heads, dim_head).transpose(0, 1, 3, 2, 4)

    q, k, v = heads_split(q), heads_split(k), heads_split(v)
    q = q * (dim_head ** -0.5)
    if rotary:
        rot = min(32, dim_head)
        cos, sin = rotary_tables(T, rot)
        cos, sin = jnp.asarray(cos, dtype), jnp.asarray(sin, dtype)

        def rope(z):
            z_r, z_p = z[..., :rot], z[..., rot:]
            z_r = z_r * cos + _rotate_half(z_r) * sin
            return jnp.concatenate([z_r, z_p], -1) if rot < dim_head else z_r

        q, k = rope(q), rope(k)
    s = jnp.einsum("bmhid,bmhjd->bmhij", q, k)
    s = s + bias_hnn[None, None].astype(s.dtype)
    s = s - jax.lax.stop_gradient(s.max(axis=-1, keepdims=True))
    s = jax.nn.softmax(s.astype(jnp.float32), axis=-1).astype(s.dtype)
    o = jnp.einsum("bmhij,bmhjd->bmhid", s, v)
    o = o.transpose(0, 1, 3, 2, 4).reshape(B, M, T, heads * dim_head)
    o = o.astype(dtype) @ w_proj.astype(dtype)
    attn = (h32 + o.astype(jnp.float32)).reshape(B, H, W, T, C)
    attn = attn.transpose(0, 3, 1, 2, 4)
    return (x32 + attn).astype(dtype)


def _pick_seq_pack(P: int, T: int):
    """(G sequences per score block, padded length Tp): short-T sequences
    are packed into one ~64-row block-diagonal score matrix so the MXU
    sees 64x64 matmuls instead of G x (T x T) ones (measured ~2x)."""
    Tp = -(-T // 8) * 8
    for g in (8, 4, 2):
        if P % g == 0 and g * Tp <= 64:
            return g, Tp
    for g in (4, 2):
        if P % g == 0 and g * Tp <= 128:
            return g, Tp
    return 1, T


def _make_temporal_kernel(T: int, HR: int, Wd: int, C: int, heads: int,
                          dim_head: int, rot: int, eps: float, G: int):
    """T here is the IN-KERNEL sequence length: when G-packing needs padding
    to a multiple of 8, the caller pads the slab in XLA (in-kernel jnp.pad
    hits a Mosaic concat-layout bug at small T/hidden) and crops after."""
    P = HR * Wd
    hidden = heads * dim_head
    R = G * T
    f32 = jnp.float32
    ablate = _ablate()
    pack2 = _headpack_ok(heads, dim_head)

    def kernel(x_ref, gcln_ref, wqkv_ref, bqkv_ref, wproj_ref,
               bias_ref, cos_ref, sin_ref, o_ref):
        # wqkv_ref/bqkv_ref are the AUGMENTED projections prepared in
        # _temporal_impl: the inner LayerNorm's scale/bias and the
        # 1/sqrt(d) q scale are folded into the weights, and (when rot)
        # two extra column blocks hold the signed pair-swapped q/k
        # projections so RoPE's rotate-half needs no lane rolls here —
        # rot(q) = q*cos + R(q)*sin with R(q) coming off the MXU.
        xb = x_ref[0].astype(f32)  # (T, HR, Wd, C)
        mean = xb.mean(-1, keepdims=True)
        var = ((xb - mean) ** 2).mean(-1, keepdims=True)
        a = (xb - mean) * jax.lax.rsqrt(var + eps) * gcln_ref[0].astype(f32)
        # (T, HR, Wd, C) -> (P, T, C): sequences along T per spatial position
        if "regroup" in ablate:
            h = a.reshape(P, T, C)
        else:
            h = a.transpose(1, 2, 0, 3).reshape(P, T, C)
        mean2 = h.mean(-1, keepdims=True)
        var2 = ((h - mean2) ** 2).mean(-1, keepdims=True)
        hn = (h - mean2) * jax.lax.rsqrt(var2 + eps)
        qkv = jax.lax.dot_general(
            hn.reshape(P * T, C).astype(x_ref.dtype), wqkv_ref[:],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=f32,
        ) + bqkv_ref[0]
        q = qkv[:, :hidden].reshape(P, T, hidden)
        k = qkv[:, hidden:2 * hidden].reshape(P, T, hidden)
        v = qkv[:, 2 * hidden:3 * hidden].reshape(P, T, hidden)
        if rot:
            cos = cos_ref[:].astype(f32)[None]
            sin = sin_ref[:].astype(f32)[None]
            qr = qkv[:, 3 * hidden:4 * hidden].reshape(P, T, hidden)
            kr = qkv[:, 4 * hidden:].reshape(P, T, hidden)
            q = q * cos + qr * sin
            k = k * cos + kr * sin
        if G > 1:
            # block-diagonal sequence packing: G sequences share one
            # (R, R) score matrix; bias_ref is pre-tiled with -1e9 on
            # the off-diagonal / pad-key entries. T is already padded
            # to a multiple of 8 by the caller, so this is a pure view.
            q = q.reshape(P // G, R, hidden)
            k = k.reshape(P // G, R, hidden)
            v = v.reshape(P // G, R, hidden)
        if _attn_io_dtype_casts():
            # match the module path: bf16 operands, f32 accumulate
            q = q.astype(x_ref.dtype)
            k = k.astype(x_ref.dtype)
            v = v.astype(x_ref.dtype)
        if "attn" in ablate:
            o = v.astype(f32)
        elif pack2:
            # pairwise head packing (see _headpack_ok); NB = packed row
            # count (R when G-packed else T), scores (NB, 2NB) per pair.
            NB = q.shape[1]
            outs = []
            for p2 in range(heads // 2):
                sl2 = slice(2 * p2 * dim_head, (2 * p2 + 2) * dim_head)
                k_bd = _block_diag2(k[:, :, sl2], dim_head)
                s = jax.lax.dot_general(
                    q[:, :, sl2], k_bd,
                    dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                    preferred_element_type=f32,
                )  # (P/G, NB, 2NB)
                s = s + bias_ref[p2].astype(f32)[None]
                e, r1, r2 = _softmax_lane_halves_parts(s, NB, ablate)
                v_bd = _block_diag2(v[:, :, sl2], dim_head)
                op = jax.lax.dot_general(
                    e.astype(v.dtype), v_bd,
                    dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=f32,
                )
                outs.append(_apply_half_recip(op, r1, r2, dim_head))
            o = jnp.concatenate(outs, axis=-1)
        else:
            outs = []
            for hd in range(heads):
                sl = slice(hd * dim_head, (hd + 1) * dim_head)
                s = jax.lax.dot_general(
                    q[:, :, sl], k[:, :, sl],
                    dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                    preferred_element_type=f32,
                )  # (P/G, R, R) or (P, T, T)
                s = s + bias_ref[hd].astype(f32)[None]
                recip = None
                if "softmax" not in ablate:
                    if "softmax_max" not in ablate:
                        s = _shifted(s)
                    s = jnp.exp(s)
                    recip = 1.0 / s.sum(axis=-1, keepdims=True)
                op = jax.lax.dot_general(
                    s.astype(v.dtype), v[:, :, sl],
                    dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=f32,
                )
                outs.append(op if recip is None else op * recip)
            o = jnp.concatenate(outs, axis=-1)
        o = o.reshape(P * T, hidden)
        o = jax.lax.dot_general(
            o.astype(x_ref.dtype), wproj_ref[:],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=f32,
        )
        o = o.reshape(P, T, C) + h  # inner residual (TemporalAttentionLayer)
        o = o.reshape(HR, Wd, T, C).transpose(2, 0, 1, 3)
        o_ref[0] = (o + xb).astype(o_ref.dtype)

    return kernel


def _pick_hr(Hp: int, Wd: int, T: int, c: int, max_tokens: int = None,
             hidden: int = None, mult: int = 1) -> int:
    if max_tokens is None:
        max_tokens = int(os.environ.get("EXTDM_TEMPORAL_FWD_TOKENS", "2048"))
    best = 1
    for hr in range(1, Hp + 1):
        if Hp % hr:
            continue
        tokens = hr * Wd * T
        if tokens > max_tokens:
            continue
        if hidden is not None:
            # scoped-VMEM model: see _scoped_bytes_per_token (calibrated
            # on THIS kernel's compiler reports).
            if tokens * mult * _scoped_bytes_per_token(hidden, c) \
                    > _scoped_cap():
                continue
        elif tokens * c * 4 > 1024 * 1024:
            continue
        best = hr
    return best


def _pair_swap_neg(w):
    """Signed pair swap on the LAST axis: out[..., 2i] = -w[..., 2i+1],
    out[..., 2i+1] = w[..., 2i] — the linear map R with rot(z) =
    z*cos + R(z)*sin (RoPE rotate-half, interleaved pairs)."""
    w2 = w.reshape(w.shape[:-1] + (w.shape[-1] // 2, 2))
    return jnp.stack([-w2[..., 1], w2[..., 0]], axis=-1).reshape(w.shape)


def _build_packed_bias(bias_hnn, heads, T, Tp, G):
    """Block-diagonal bias for G packed sequences: -1e9 on off-diagonal
    blocks and pad-key columns (pad-query rows yield garbage that the
    caller crops)."""
    R = G * Tp
    bias_pad = jnp.pad(bias_hnn.astype(jnp.float32),
                       ((0, 0), (0, Tp - T), (0, Tp - T)))
    tiled = jnp.einsum("ab,hij->haibj", jnp.eye(G, dtype=jnp.float32),
                       bias_pad).reshape(heads, R, R)
    rb = np.arange(R)[:, None] // Tp
    cb = np.arange(R)[None, :] // Tp
    cpos = np.arange(R)[None, :] % Tp
    neg = np.where((rb != cb) | (cpos >= T), -1e9, 0.0).astype(np.float32)
    return tiled + jnp.asarray(neg)[None]


def _rope_tables_tiled(Tk, heads, dim_head, rot):
    hidden = heads * dim_head
    cos_np = np.ones((Tk, hidden), np.float32)
    sin_np = np.zeros((Tk, hidden), np.float32)
    if rot:
        c, s = rotary_tables(Tk, rot)
        for hd in range(heads):
            cos_np[:, hd * dim_head : hd * dim_head + rot] = c
            sin_np[:, hd * dim_head : hd * dim_head + rot] = s
    return cos_np, sin_np


def _temporal_impl(x, gamma_cln, ln_scale, ln_bias, w_qkv, w_proj, bias_hnn,
                   heads, dim_head, rotary, eps, interpret):
    _ensure_pallas()
    B, T, H, W, C = x.shape
    hidden = heads * dim_head
    rot = min(32, dim_head) if rotary else 0

    # Fold the inner LayerNorm's scale/bias and the q 1/sqrt(d) scale into
    # the qkv projection, and append signed pair-swapped q/k column blocks
    # (RoPE's rotate-half as extra MXU columns — no lane rolls in-kernel).
    w_qkv = w_qkv.astype(jnp.float32)
    w_eff = ln_scale.astype(jnp.float32)[:, None] * w_qkv
    b_eff = ln_bias.astype(jnp.float32) @ w_qkv  # (3*hidden,)
    scale = dim_head ** -0.5
    wq = w_eff[:, :hidden] * scale
    bq = b_eff[:hidden] * scale
    wkv, bkv = w_eff[:, hidden:], b_eff[hidden:]
    if rot:
        wk = w_eff[:, hidden:2 * hidden]
        bk = b_eff[hidden:2 * hidden]
        w_aug = jnp.concatenate(
            [wq, wkv, _pair_swap_neg(wq), _pair_swap_neg(wk)], axis=1)
        b_aug = jnp.concatenate(
            [bq, bkv, _pair_swap_neg(bq), _pair_swap_neg(bk)])
    else:
        w_aug = jnp.concatenate([wq, wkv], axis=1)
        b_aug = jnp.concatenate([bq, bkv])
    n_aug = w_aug.shape[1]
    HR = _pick_hr(H, W, T, C, hidden=hidden)
    G, Tp = _pick_seq_pack(HR * W, T)
    if G > 1:
        bias_in = _build_packed_bias(bias_hnn, heads, T, Tp, G)
        NB = G * Tp
    else:
        Tp = T
        bias_in = bias_hnn.astype(jnp.float32)
        NB = T
    if _headpack_ok(heads, dim_head):
        bias_in = _pack_bias_pairs(bias_in)
    bias_shape = bias_in.shape
    xp = x if Tp == T else jnp.pad(
        x, ((0, 0), (0, Tp - T), (0, 0), (0, 0), (0, 0)))
    cos_np, sin_np = _rope_tables_tiled(Tp, heads, dim_head, rot)

    x_spec = pl.BlockSpec((1, Tp, HR, W, C), lambda b, ih: (b, 0, ih, 0, 0))
    const = lambda shape: pl.BlockSpec(shape, lambda b, ih: tuple(0 for _ in shape))
    grid_spec = pl.GridSpec(
        grid=(B, H // HR),
        in_specs=[
            x_spec,
            const((1, C)),            # cln gamma
            const((C, n_aug)),        # augmented w_qkv (LN folded, +R blocks)
            const((1, n_aug)),        # augmented qkv bias (f32)
            const((hidden, C)),       # w_proj
            const(bias_shape),        # bias (seq-packed / pair-packed)
            const((Tp, hidden)),      # cos
            const((Tp, hidden)),      # sin
        ],
        out_specs=x_spec,
    )
    kernel = _make_temporal_kernel(Tp, HR, W, C, heads, dim_head, rot, eps, G)
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(xp.shape, x.dtype),
        compiler_params=pltpu.CompilerParams(
            # no cross-program accumulation in the forward (see STW note)
            dimension_semantics=("parallel", "parallel"),
            vmem_limit_bytes=_vmem_limit_bytes()),
        interpret=interpret,
    )(xp, gamma_cln.reshape(1, C).astype(x.dtype),
      w_aug.astype(x.dtype), b_aug.reshape(1, n_aug),
      w_proj.astype(x.dtype),
      bias_in,
      jnp.asarray(cos_np, x.dtype), jnp.asarray(sin_np, x.dtype))
    return out if Tp == T else out[:, :T]


# -------------------------------------------------------- temporal backward
def _pick_hw(H: int, W: int, T: int, c: int, max_tokens: int,
             hidden: int = None):
    """(HR, WR) block for the temporal bwd kernel: prefer whole-W rows,
    split W when even one H-row exceeds the token budget (the backward
    holds ~4x the forward's intermediates in VMEM)."""
    if T * W <= max_tokens:
        return _pick_hr(H, W, T, c, max_tokens=max_tokens, hidden=hidden,
                        mult=_bwd_vmem_mult()), W
    wr = 1
    for cand in range(1, W + 1):
        if W % cand == 0 and T * cand <= max_tokens:
            wr = cand
    return 1, wr


def _make_temporal_bwd_kernel(T: int, HR: int, Wd: int, C: int, heads: int,
                              dim_head: int, rot: int, eps: float, G: int):
    """T is the IN-KERNEL (caller-padded) length — see _make_temporal_kernel.
    Pad rows of g are zero, so every weight-grad accumulation over pad
    tokens vanishes; dx pad rows are cropped by the caller."""
    P = HR * Wd
    hidden = heads * dim_head
    R = G * T
    f32 = jnp.float32
    # per-head dWproj accumulation stores to a sublane-dim slice of the
    # output ref (dwproj_ref[sl, :] +=), which requires the slice offset to
    # be sublane-tile aligned (8 rows for f32). Make the assumption loud
    # instead of failing inside Mosaic lowering on odd configs.
    if dim_head % 8 != 0:
        raise ValueError(
            f"temporal backward kernel requires dim_head % 8 == 0 "
            f"(sublane-aligned per-head dWproj slices); got {dim_head}. "
            f"Set EXTDM_PALLAS_BWD=0 to use the XLA-recompute backward.")
    pack2 = _headpack_ok(heads, dim_head)

    def kernel(x_ref, g_ref, gcln_ref, lns_ref, lnb_ref, wqkv_ref, wproj_ref,
               bias_ref, cos_ref, sin_ref,
               dx_ref, dgcln_ref, dlns_ref, dlnb_ref, dwqkv_ref, dwproj_ref,
               dbias_ref):
        b = pl.program_id(0)
        ih = pl.program_id(1)
        iw = pl.program_id(2)

        @pl.when((b == 0) & (ih == 0) & (iw == 0))
        def _init():
            dgcln_ref[:] = jnp.zeros_like(dgcln_ref)
            dlns_ref[:] = jnp.zeros_like(dlns_ref)
            dlnb_ref[:] = jnp.zeros_like(dlnb_ref)
            dwqkv_ref[:] = jnp.zeros_like(dwqkv_ref)
            dwproj_ref[:] = jnp.zeros_like(dwproj_ref)
            dbias_ref[:] = jnp.zeros_like(dbias_ref)

        dtype = x_ref.dtype
        xb = x_ref[0].astype(f32)  # (T, HR, Wd, C)
        gb = g_ref[0].astype(f32)
        gcln = gcln_ref[0].astype(f32)
        lns = lns_ref[0].astype(f32)

        # ---- recompute forward -----------------------------------------
        mean = xb.mean(-1, keepdims=True)
        var = ((xb - mean) ** 2).mean(-1, keepdims=True)
        rstd = jax.lax.rsqrt(var + eps)
        xhat = (xb - mean) * rstd
        a = xhat * gcln
        h = a.transpose(1, 2, 0, 3).reshape(P, T, C)
        ga = gb.transpose(1, 2, 0, 3).reshape(P, T, C)
        mean2 = h.mean(-1, keepdims=True)
        var2 = ((h - mean2) ** 2).mean(-1, keepdims=True)
        rstd2 = jax.lax.rsqrt(var2 + eps)
        hhat = (h - mean2) * rstd2
        hn = hhat * lns + lnb_ref[0].astype(f32)
        hn_flat = hn.reshape(P * T, C)
        qkv = jax.lax.dot_general(
            hn_flat.astype(dtype), wqkv_ref[:],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=f32,
        )
        q0 = qkv[:, :hidden].reshape(P, T, hidden) * (dim_head ** -0.5)
        k0 = qkv[:, hidden:2 * hidden].reshape(P, T, hidden)
        v = qkv[:, 2 * hidden:].reshape(P, T, hidden)
        if rot:
            cos = cos_ref[:].astype(f32)[None]
            sin = sin_ref[:].astype(f32)[None]
            lane = jax.lax.broadcasted_iota(jnp.int32, (1, T, hidden), 2)
            even = (lane % 2) == 0

            def half(z):
                up = pltpu.roll(z, hidden - 1, axis=2)
                down = pltpu.roll(z, 1, axis=2)
                return jnp.where(even, -up, down)

            q = q0 * cos + half(q0) * sin
            k = k0 * cos + half(k0) * sin
        else:
            q, k = q0, k0

        def pack(z):  # T is pre-padded by the caller -> pure views
            if G > 1:
                return z.reshape(P // G, R, hidden)
            return z

        def unpack(z):
            if G > 1:
                return z.reshape(P, T, hidden)
            return z

        qp, kp, vp = pack(q), pack(k), pack(v)

        def softmax_h(hd):
            # p lives only for one head-iteration of the merged loop
            # below — a single (Pg, R, R) buffer of peak VMEM, computed
            # exactly once per head.
            sl = slice(hd * dim_head, (hd + 1) * dim_head)
            s = jax.lax.dot_general(
                qp[:, :, sl], kp[:, :, sl],
                dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                preferred_element_type=f32,
            )
            s = s + bias_ref[hd].astype(f32)[None]
            s = _shifted(s)
            e = jnp.exp(s)
            return e / e.sum(axis=-1, keepdims=True)

        # do is independent of o, so it can precede the merged head loop
        ga_flat = ga.reshape(P * T, C)
        do = jax.lax.dot_general(
            ga_flat.astype(dtype), wproj_ref[:],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=f32,
        ).reshape(P, T, hidden)
        dop = pack(do)

        # ---- merged recompute + backward per head ------------------------
        # One softmax per head serves both the o_h recompute (for the
        # dwproj row-slice) and the attention backward.
        dqs, dks, dvs = [], [], []
        if pack2:
            NB = qp.shape[1]
            # operand casts: see the STW backward's packed branch.
            cdt = dtype if _attn_io_dtype_casts() else f32
            half_m = lane_m = None
            for p2 in range(heads // 2):
                sl2 = slice(2 * p2 * dim_head, (2 * p2 + 2) * dim_head)
                q_c = qp[:, :, sl2].astype(cdt)
                k_bd = _block_diag2(kp[:, :, sl2].astype(cdt), dim_head)
                v_bd = _block_diag2(vp[:, :, sl2].astype(cdt), dim_head)
                s = jax.lax.dot_general(
                    q_c, k_bd,
                    dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                    preferred_element_type=f32,
                )  # (Pg, NB, 2NB)
                s = s + bias_ref[p2].astype(f32)[None]
                if half_m is None:
                    half_m = jax.lax.broadcasted_iota(
                        jnp.int32, s.shape, s.ndim - 1) < NB
                    lane_m = jax.lax.broadcasted_iota(
                        jnp.int32, (s.shape[0], NB, 2 * dim_head), 2)
                if _softmax_scalar_max():
                    e = jnp.exp(_scalar_shift(s))
                else:
                    m1 = jnp.max(jnp.where(half_m, s, -1e30), -1,
                                 keepdims=True)
                    m2 = jnp.max(jnp.where(half_m, -1e30, s), -1,
                                 keepdims=True)
                    e = jnp.exp(s - jnp.where(half_m, m1, m2))
                d1 = jnp.sum(jnp.where(half_m, e, 0.0), -1, keepdims=True)
                d2 = jnp.sum(jnp.where(half_m, 0.0, e), -1, keepdims=True)
                p = e / jnp.where(half_m, d1, d2)
                p_c = p.astype(cdt)
                o_h = jax.lax.dot_general(
                    p_c, v_bd,
                    dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=f32,
                ).reshape(P * T, 2 * dim_head)
                dwproj_ref[sl2, :] += jax.lax.dot_general(
                    o_h.astype(dtype), ga_flat.astype(dtype),
                    dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=f32,
                ).astype(dwproj_ref.dtype)
                dO = dop[:, :, sl2].astype(cdt)
                dP = jax.lax.dot_general(
                    dO, v_bd,
                    dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                    preferred_element_type=f32,
                )  # (Pg, NB, 2NB)
                dv_bd = jax.lax.dot_general(
                    p_c, dO,
                    dimension_numbers=(((1,), (1,)), ((0,), (0,))),
                    preferred_element_type=f32,
                )  # (Pg, 2NB, 2dh)
                dvs.append(jnp.where(lane_m < dim_head,
                                     dv_bd[:, :NB], dv_bd[:, NB:]))
                pdp = dP * p
                r1 = jnp.sum(jnp.where(half_m, pdp, 0.0), -1, keepdims=True)
                r2 = jnp.sum(jnp.where(half_m, 0.0, pdp), -1, keepdims=True)
                dS = p * (dP - jnp.where(half_m, r1, r2))
                dbias_ref[p2] += dS.sum(axis=0).astype(dbias_ref.dtype)
                dS_c = dS.astype(cdt)
                dqs.append(jax.lax.dot_general(
                    dS_c, k_bd,
                    dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=f32,
                ))
                dk_bd = jax.lax.dot_general(
                    dS_c, q_c,
                    dimension_numbers=(((1,), (1,)), ((0,), (0,))),
                    preferred_element_type=f32,
                )
                dks.append(jnp.where(lane_m < dim_head,
                                     dk_bd[:, :NB], dk_bd[:, NB:]))
        else:
            for hd in range(heads):
                sl = slice(hd * dim_head, (hd + 1) * dim_head)
                p = softmax_h(hd)
                # pack/unpack are pure reshapes, so (Pg, R, dh) flattens
                # straight to (P*T, dh)
                o_h = jax.lax.dot_general(
                    p, vp[:, :, sl],
                    dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=f32,
                ).reshape(P * T, dim_head)
                dwproj_ref[sl, :] += jax.lax.dot_general(
                    o_h.astype(dtype), ga_flat.astype(dtype),
                    dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=f32,
                ).astype(dwproj_ref.dtype)
                dO = dop[:, :, sl]
                dP = jax.lax.dot_general(
                    dO, vp[:, :, sl],
                    dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                    preferred_element_type=f32,
                )
                dvs.append(jax.lax.dot_general(
                    p, dO,
                    dimension_numbers=(((1,), (1,)), ((0,), (0,))),
                    preferred_element_type=f32,
                ))
                dS = p * (dP - (dP * p).sum(axis=-1, keepdims=True))
                dbias_ref[hd] += dS.sum(axis=0).astype(dbias_ref.dtype)
                dqs.append(jax.lax.dot_general(
                    dS, kp[:, :, sl],
                    dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=f32,
                ))
                dks.append(jax.lax.dot_general(
                    dS, qp[:, :, sl],
                    dimension_numbers=(((1,), (1,)), ((0,), (0,))),
                    preferred_element_type=f32,
                ))
        dq_r = unpack(jnp.concatenate(dqs, axis=-1))
        dk_r = unpack(jnp.concatenate(dks, axis=-1))
        dv = unpack(jnp.concatenate(dvs, axis=-1))
        if rot:
            dq0 = dq_r * cos + half(dq_r) * (-sin)
            dk0 = dk_r * cos + half(dk_r) * (-sin)
        else:
            dq0, dk0 = dq_r, dk_r
        dq0 = dq0 * (dim_head ** -0.5)
        dqkv = jnp.concatenate(
            [dq0.reshape(P * T, hidden), dk0.reshape(P * T, hidden),
             dv.reshape(P * T, hidden)], axis=-1)

        # ---- backward: qkv projection ------------------------------------
        dwqkv_ref[:] += jax.lax.dot_general(
            hn_flat.astype(dtype), dqkv.astype(dtype),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=f32,
        ).astype(dwqkv_ref.dtype)
        dhn = jax.lax.dot_general(
            dqkv.astype(dtype), wqkv_ref[:],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=f32,
        ).reshape(P, T, C)

        # ---- backward: inner LayerNorm (scale + bias) ---------------------
        dlns_ref[0] += (dhn * hhat).sum(axis=(0, 1)).astype(dlns_ref.dtype)
        dlnb_ref[0] += dhn.sum(axis=(0, 1)).astype(dlnb_ref.dtype)
        dxh = dhn * lns
        m1 = dxh.mean(axis=-1, keepdims=True)
        m2 = (dxh * hhat).mean(axis=-1, keepdims=True)
        dh = rstd2 * (dxh - m1 - hhat * m2)
        dh = dh + ga  # inner residual: out = h + proj(attn(LN(h)))

        # ---- backward: channel LayerNorm -----------------------------------
        da = dh.reshape(HR, Wd, T, C).transpose(2, 0, 1, 3)  # slab layout
        dgcln_ref[0] += (da * xhat).sum(axis=(0, 1, 2)).astype(dgcln_ref.dtype)
        dxhat = da * gcln
        m1c = dxhat.mean(axis=-1, keepdims=True)
        m2c = (dxhat * xhat).mean(axis=-1, keepdims=True)
        dx_ln = rstd * (dxhat - m1c - xhat * m2c)
        dx_ref[0] = (gb + dx_ln).astype(dx_ref.dtype)

    return kernel


def _temporal_bwd_impl(x, gamma_cln, ln_scale, ln_bias, w_qkv, w_proj,
                       bias_hnn, g, *, heads, dim_head, rotary, eps,
                       interpret):
    _ensure_pallas()
    B, T, H, W, C = x.shape
    hidden = heads * dim_head
    rot = min(32, dim_head) if rotary else 0
    HR, WR = _pick_hw(H, W, T, C,
                      max_tokens=int(os.environ.get(
                          "EXTDM_TEMPORAL_BWD_TOKENS", "1024")),
                      hidden=hidden)
    G, Tp = _pick_seq_pack(HR * WR, T)
    if G > 1:
        bias_in = _build_packed_bias(bias_hnn, heads, T, Tp, G)
        NB = G * Tp
    else:
        Tp = T
        bias_in = bias_hnn.astype(jnp.float32)
        NB = T
    pack2 = _headpack_ok(heads, dim_head)
    if pack2:
        bias_in = _pack_bias_pairs(bias_in)
    bias_shape = tuple(bias_in.shape)
    if Tp != T:
        pads = ((0, 0), (0, Tp - T), (0, 0), (0, 0), (0, 0))
        x = jnp.pad(x, pads)
        g = jnp.pad(g, pads)
    cos_np, sin_np = _rope_tables_tiled(Tp, heads, dim_head, rot)

    x_spec = pl.BlockSpec((1, Tp, HR, WR, C),
                          lambda b, ih, iw: (b, 0, ih, iw, 0))
    const = lambda shape: pl.BlockSpec(
        shape, lambda b, ih, iw: tuple(0 for _ in shape))
    grid_spec = pl.GridSpec(
        grid=(B, H // HR, W // WR),
        in_specs=[
            x_spec,                   # x
            x_spec,                   # g
            const((1, C)),            # cln gamma
            const((1, C)),            # ln scale
            const((1, C)),            # ln bias
            const((C, 3 * hidden)),   # w_qkv
            const((hidden, C)),       # w_proj
            const(bias_shape),        # bias (seq/pair-packed)
            const((Tp, hidden)),      # cos
            const((Tp, hidden)),      # sin
        ],
        out_specs=[
            x_spec,                   # dx
            const((1, C)),            # dgamma_cln
            const((1, C)),            # dln_scale
            const((1, C)),            # dln_bias
            const((C, 3 * hidden)),   # dwqkv
            const((hidden, C)),       # dwproj
            const(bias_shape),        # dbias (same packing)
        ],
    )
    kernel = _make_temporal_bwd_kernel(Tp, HR, WR, C, heads, dim_head, rot,
                                       eps, G)
    f32 = jnp.float32
    out_shapes = [
        jax.ShapeDtypeStruct(x.shape, x.dtype),
        jax.ShapeDtypeStruct((1, C), f32),
        jax.ShapeDtypeStruct((1, C), f32),
        jax.ShapeDtypeStruct((1, C), f32),
        jax.ShapeDtypeStruct((C, 3 * hidden), f32),
        jax.ShapeDtypeStruct((hidden, C), f32),
        jax.ShapeDtypeStruct(bias_shape, f32),
    ]
    outs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shapes,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_vmem_limit_bytes()),
        interpret=interpret,
    )(x, g, gamma_cln.reshape(1, C).astype(jnp.float32),
      ln_scale.reshape(1, C).astype(jnp.float32),
      ln_bias.reshape(1, C).astype(jnp.float32),
      w_qkv.astype(x.dtype), w_proj.astype(x.dtype),
      bias_in, jnp.asarray(cos_np, x.dtype), jnp.asarray(sin_np, x.dtype))
    dx, dgcln, dlns, dlnb, dwqkv, dwproj, dbias_p = outs
    if Tp != T:
        dx = dx[:, :T]

    if pack2:  # (heads//2, NB, 2NB) -> interleave head pairs back
        dbias_p = jnp.stack([dbias_p[:, :, :NB], dbias_p[:, :, NB:]],
                            axis=1).reshape(heads, NB, NB)
    if G > 1:
        db = dbias_p.reshape(heads, G, Tp, G, Tp)
        dbias = sum(db[:, gi, :T, gi, :T] for gi in range(G))
    else:
        dbias = dbias_p
    return (dx, dgcln.reshape(C).astype(gamma_cln.dtype),
            dlns.reshape(C).astype(ln_scale.dtype),
            dlnb.reshape(C).astype(ln_bias.dtype),
            dwqkv.astype(w_qkv.dtype), dwproj.astype(w_proj.dtype),
            dbias.astype(bias_hnn.dtype))


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9, 10, 11))
def _fused_temporal(x, gamma_cln, ln_scale, ln_bias, w_qkv, w_proj, bias_hnn,
                    heads, dim_head, rotary, eps, interpret):
    return _temporal_impl(x, gamma_cln, ln_scale, ln_bias, w_qkv, w_proj,
                          bias_hnn, heads, dim_head, rotary, eps, interpret)


def _fused_temporal_fwd(x, gamma_cln, ln_scale, ln_bias, w_qkv, w_proj,
                        bias_hnn, heads, dim_head, rotary, eps, interpret):
    out = _temporal_impl(x, gamma_cln, ln_scale, ln_bias, w_qkv, w_proj,
                         bias_hnn, heads, dim_head, rotary, eps, interpret)
    return out, (x, gamma_cln, ln_scale, ln_bias, w_qkv, w_proj, bias_hnn)


def _fused_temporal_bwd(heads, dim_head, rotary, eps, interpret, res, g):
    if backward_kernels_enabled():
        x, gamma_cln, ln_scale, ln_bias, w_qkv, w_proj, bias_hnn = res
        return _temporal_bwd_impl(
            x, gamma_cln, ln_scale, ln_bias, w_qkv, w_proj, bias_hnn, g,
            heads=heads, dim_head=dim_head, rotary=rotary, eps=eps,
            interpret=interpret)

    def ref(*args):
        return temporal_layer_reference(*args, heads=heads, dim_head=dim_head,
                                        rotary=rotary, eps=eps)

    _, vjp = jax.vjp(ref, *res)
    return vjp(g)


_fused_temporal.defvjp(_fused_temporal_fwd, _fused_temporal_bwd)


def fused_temporal_layer(x, gamma_cln, ln_scale, ln_bias, w_qkv, w_proj,
                         bias_hnn, *, heads, dim_head, rotary=True, eps=1e-5,
                         interpret=False):
    """Whole PreNormTemporalAttn layer in one pallas pass.

    x: (B, T, H, W, C); bias_hnn: (heads, T, T) — pass the reduced form
    for 4-D THW biases (mean over the last two axes, broadcast over keys,
    matching TemporalAttention's handling).
    """
    if spatial_scope_active():
        return _spatial_temporal_layer(
            x, gamma_cln, ln_scale, ln_bias, w_qkv, w_proj, bias_hnn,
            heads=heads, dim_head=dim_head, rotary=rotary, eps=eps)
    return _fused_temporal(x, gamma_cln, ln_scale, ln_bias, w_qkv, w_proj,
                           bias_hnn, heads, dim_head, rotary, eps, interpret)


# ===================================================================
# Spatially-partitioned (H-sharded) fused layers: shard_map + halo
# ===================================================================
_SPATIAL_SCOPE = None


@contextlib.contextmanager
def spatial_shard_scope(mesh, data_axis="data", spatial_axis="model", *,
                        interpret=False, force=False):
    """Trace-time gate: fused STW/temporal layers traced inside this scope
    run as shard_map programs over `mesh` — batch on `data_axis`, the
    activation H axis on `spatial_axis` — so the spatial (sequence-
    parallel) sampler keeps kernel fusion instead of falling back to the
    XLA module path (a pallas_call is a single-device program GSPMD
    cannot partition, but under shard_map each shard launches its own).

    Cross-shard coupling is handled manually:
      - plain windows, shard-aligned (H_local % window_h == 0): fully
        local — window attention never crosses an H boundary;
      - shifted windows, shard-aligned: the global jnp.roll along H
        becomes a `shift_h`-row halo exchange (ppermute) before and after
        the local kernel; the Swin masks are expanded globally (trace-
        time constants) and passed as a shard_map operand sharded over
        the H-window axis, so every shard applies exactly its windows'
        masks;
      - any non-aligned shape: all_gather(H) -> full local kernel ->
        slice (correct for every shape; costs one gathered activation).

    INFERENCE ONLY: weight gradients under shard_map would need psum;
    only samplers set this scope. `force=True` activates the gate even
    where `enabled()` is False (CPU tests use it with interpret=True).
    """
    global _SPATIAL_SCOPE
    prev = _SPATIAL_SCOPE
    _SPATIAL_SCOPE = dict(mesh=mesh, data=data_axis, sp=spatial_axis,
                          interpret=interpret, force=force)
    try:
        yield
    finally:
        _SPATIAL_SCOPE = prev


def spatial_scope_active() -> bool:
    if _SPATIAL_SCOPE is None:
        return False
    if os.environ.get("EXTDM_SPATIAL_FUSED", "1") != "1":
        return False
    return bool(_SPATIAL_SCOPE["force"]) or enabled()


def _spatial_specs(mesh, data_axis, B, n_extra_dims):
    """(x_spec, rep) PartitionSpecs for a (B, T, H, W, C) activation."""
    from jax.sharding import PartitionSpec as P

    sc = _SPATIAL_SCOPE
    n_data = mesh.shape.get(data_axis, 1)
    batch = data_axis if (n_data > 1 and B % n_data == 0) else None
    x_spec = P(batch, None, sc["sp"], *([None] * n_extra_dims))
    return x_spec, P()


def _spatial_stw_layer(x, gamma, w_qkv, w_proj, b_proj, bias_hnn, masks,
                       mask_ids, *, window, shift, heads, dim_head, rotary,
                       eps):
    """H-sharded fused STW layer. See spatial_shard_scope for the halo
    protocol. x: GLOBAL (B, T, H, W, C) traced under jit/GSPMD."""
    sc = _SPATIAL_SCOPE
    mesh, sp_axis, data_axis = sc["mesh"], sc["sp"], sc["data"]
    interpret = sc["interpret"]
    n_sp = mesh.shape.get(sp_axis, 1)
    B, T, H, W, C = x.shape
    wd, wh, ww = window
    if n_sp == 1 or H % n_sp != 0:
        # H not evenly shardable -> plain single-program kernel; GSPMD
        # replicates around it exactly as the non-spatial sampler does.
        return _fused_layer(x, gamma, w_qkv, w_proj, b_proj, bias_hnn,
                            masks, mask_ids, tuple(window), tuple(shift),
                            heads, dim_head, rotary, eps, interpret)
    HL = H // n_sp
    pad_h = (wh - H % wh) % wh
    aligned = (HL % wh == 0) and pad_h == 0
    x_spec, rep = _spatial_specs(mesh, data_axis, B, 2)
    perm_up = [(i, (i - 1) % n_sp) for i in range(n_sp)]    # send to prev
    perm_down = [(i, (i + 1) % n_sp) for i in range(n_sp)]  # send to next

    if not aligned:
        def gather_body(x_l, gamma, w_qkv, w_proj, b_proj, bias_hnn):
            xg = jax.lax.all_gather(x_l, sp_axis, axis=2, tiled=True)
            out = _fused_layer(xg, gamma, w_qkv, w_proj, b_proj, bias_hnn,
                               masks, mask_ids, tuple(window), tuple(shift),
                               heads, dim_head, rotary, eps, interpret)
            i = jax.lax.axis_index(sp_axis)
            return jax.lax.dynamic_slice_in_dim(out, i * HL, HL, axis=2)

        fn = jax.shard_map(
            gather_body, mesh=mesh,
            in_specs=(x_spec, rep, rep, rep, rep, rep), out_specs=x_spec,
            check_vma=False)
        return fn(x, gamma, w_qkv, w_proj, b_proj, bias_hnn)

    sh = shift[1]
    shifted = any(s > 0 for s in shift)
    masks_exp_sharded = None
    if shifted:
        # expand the global masks once (trace-time constants, hoisted out
        # of the DDIM scan) and shard them over the H-window axis so each
        # shard reads exactly its windows' mask blocks.
        n_tw = -(-T // wd)
        n_hw = H // wh
        n_ww = (-(-W // ww) * ww) // ww
        N = wd * wh * ww
        masks_exp_sharded = _expand_masks(masks, mask_ids,
                                          n_tw, n_hw, n_ww, N)

    def body(x_l, gamma, w_qkv, w_proj, b_proj, bias_hnn, masks_l):
        # ---- global roll by -shift along H == halo exchange -------------
        if sh:
            head_rows = x_l[:, :, :sh]
            recv = jax.lax.ppermute(head_rows, sp_axis, perm_up)
            x_r = jnp.concatenate([x_l[:, :, sh:], recv], axis=2)
        else:
            x_r = x_l
        # local kernel: T/W pad+roll handled inside (_layer_impl), the H
        # roll is already materialized, per-shard masks supplied.
        out = _layer_impl(x_r, gamma, w_qkv, w_proj, b_proj, bias_hnn,
                          None, None, tuple(window),
                          (shift[0], 0, shift[2]), heads, dim_head, rotary,
                          eps, interpret,
                          masks_exp=masks_l if shifted else None)
        # ---- roll back (+shift along H) ---------------------------------
        if sh:
            tail_rows = out[:, :, HL - sh:]
            recv = jax.lax.ppermute(tail_rows, sp_axis, perm_down)
            out = jnp.concatenate([recv, out[:, :, :HL - sh]], axis=2)
        return out

    from jax.sharding import PartitionSpec as P

    mask_spec = P(None, sp_axis, None, None, None) if shifted else P()
    if masks_exp_sharded is None:
        masks_exp_sharded = jnp.zeros((), x.dtype)  # unused placeholder
    fn = jax.shard_map(
        body, mesh=mesh,
        in_specs=(x_spec, rep, rep, rep, rep, rep, mask_spec),
        out_specs=x_spec, check_vma=False)
    return fn(x, gamma, w_qkv, w_proj, b_proj, bias_hnn, masks_exp_sharded)


def _spatial_temporal_layer(x, gamma_cln, ln_scale, ln_bias, w_qkv, w_proj,
                            bias_hnn, *, heads, dim_head, rotary, eps):
    """H-sharded fused temporal layer: attention runs along T per (h, w)
    position, so under H sharding every shard is fully local."""
    sc = _SPATIAL_SCOPE
    mesh, sp_axis, data_axis = sc["mesh"], sc["sp"], sc["data"]
    interpret = sc["interpret"]
    n_sp = mesh.shape.get(sp_axis, 1)
    B, T, H, W, C = x.shape
    if n_sp == 1 or H % n_sp != 0:
        return _fused_temporal(x, gamma_cln, ln_scale, ln_bias, w_qkv,
                               w_proj, bias_hnn, heads, dim_head, rotary,
                               eps, interpret)
    x_spec, rep = _spatial_specs(mesh, data_axis, B, 2)

    def body(x_l, gamma_cln, ln_scale, ln_bias, w_qkv, w_proj, bias_hnn):
        return _fused_temporal(x_l, gamma_cln, ln_scale, ln_bias, w_qkv,
                               w_proj, bias_hnn, heads, dim_head, rotary,
                               eps, interpret)

    fn = jax.shard_map(
        body, mesh=mesh,
        in_specs=(x_spec, rep, rep, rep, rep, rep, rep),
        out_specs=x_spec, check_vma=False)
    return fn(x, gamma_cln, ln_scale, ln_bias, w_qkv, w_proj, bias_hnn)
