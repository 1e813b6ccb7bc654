"""Fused bilinear grid-sample as a one-hot-matmul pallas kernel.

Why: XLA lowers `take_along_axis`-style gathers to per-pixel row loads on
TPU — measured ~73 ms for the LFAE's K+1 sparse warps (2640x32x32x3) and
~148 ms for one 640x64x64x64 decode warp, dominating both the frozen-LFAE
encode inside DM training and the pixel decode inside sampling.

Idea: for a chunk of output pixels, build the (chunk, H*W) bilinear weight
matrix in VMEM with pure VPU ops (two integer compares per corner against a
lane iota — no gather at all) and contract it against the flattened source
image on the MXU:

    out[p, c] = sum_s M[p, s] * img[s, c],
    M[p, y*W + x] = wy(p, y) * wx(p, x)   (4 nonzeros per row)

`padding_mode="zeros"` falls out for free: out-of-range corners match no
lane and contribute exactly 0 (torch zeros semantics, align_corners=True).
border/reflection clamp/reflect the continuous coords first, like
`ops/warp.py`.

Gradients: custom_vjp. Small-S/small-C warps (the K+1 sparse-warp family
AE training differentiates through) take a fused pallas backward: d_image
is the transposed one-hot matmul M^T @ d_out accumulated into a revisited
(S, C) block across the sequential pixel-chunk grid, and d_grid reuses
the in-VMEM corner-indicator build (dm = d_out @ img^T on the MXU) —
6.5x over XLA's 3-wide scatter rows at S=1024 C=3. Everything else
recomputes the XLA reference path's VJP (see _bwd_supported for the
measured win region). EXTDM_PALLAS_WARP_BWD=0 restores XLA everywhere.

Reference semantics: torch.nn.functional.grid_sample(align_corners=True),
/root/reference/model/LFAE/generator.py:63-71.
"""
from __future__ import annotations

import contextlib
import functools
import os
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

# deferred pallas imports (CPU-only envs never touch pallas at module import)
pl = None
pltpu = None


def _ensure_pallas():
    global pl, pltpu
    if pl is None:
        from jax.experimental import pallas as _pl
        from jax.experimental.pallas import tpu as _pltpu

        globals()["pl"] = _pl
        globals()["pltpu"] = _pltpu


_TRACE_DISABLED = False


@contextlib.contextmanager
def xla_path_scope():
    """Trace-time gate: code traced inside uses the XLA gather path.

    Used by SPMD-partitioned programs (e.g. the spatial-parallel sampler):
    a pallas_call is a single-device program GSPMD cannot partition, so
    stages whose operands may arrive sharded trace the pure-XLA path."""
    global _TRACE_DISABLED
    prev = _TRACE_DISABLED
    _TRACE_DISABLED = True
    try:
        yield
    finally:
        _TRACE_DISABLED = prev


def enabled() -> bool:
    if _TRACE_DISABLED:
        return False
    if os.environ.get("EXTDM_PALLAS", "1") != "1":
        return False
    if os.environ.get("EXTDM_PALLAS_WARP", "1") != "1":
        return False
    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except Exception:  # pragma: no cover - no backend at all
        return False


def supported(image_shape: Tuple[int, ...], grid_shape: Tuple[int, ...]) -> bool:
    """Tileability gate: S = H*W must fill whole lane tiles and the chunk
    math assumes power-of-two W (shift/mask index split)."""
    B, H, W, C = image_shape
    _, Ho, Wo, _ = grid_shape
    S = H * W
    P = Ho * Wo
    return (
        S % 128 == 0
        and S >= 512  # at S=256 the per-image matmuls are overhead-bound
        # and the XLA gather is already cheap (measured 16x16x256: fused
        # 15 ms vs XLA 9 ms net; 32x32+: fused wins 2.5-7x)
        and P % 8 == 0
        and (W & (W - 1)) == 0
        and S * 4 <= 8 * 1024 * 1024  # full source rows fit VMEM comfortably
    )


def _pick_chunk(P: int, S: int) -> int:
    """Output-pixel rows per program: M chunk (chunk, S) f32 <= ~4 MB."""
    budget = int(os.environ.get("EXTDM_WARP_CHUNK_BYTES", str(4 * 1024 * 1024)))
    best = 8
    for chunk in (8, 16, 32, 64, 128, 256, 512, 1024, 2048):
        if P % chunk:
            continue
        if chunk * S * 4 <= budget:
            best = chunk
    return best


def _make_kernel(CH: int, H: int, W: int, C: int, mode: str, out_dtype):
    S = H * W
    shift = int(np.log2(W))
    f32 = jnp.float32

    def kernel(g_ref, img_ref, o_ref):
        # g_ref: (1, CH, 2) normalized grid chunk; img_ref: (1, S, C)
        gx = g_ref[0, :, 0:1].astype(f32)  # (CH, 1)
        gy = g_ref[0, :, 1:2].astype(f32)
        x = (gx + 1.0) * 0.5 * (W - 1)
        y = (gy + 1.0) * 0.5 * (H - 1)
        if mode == "border":
            x = jnp.clip(x, 0.0, W - 1)
            y = jnp.clip(y, 0.0, H - 1)
        elif mode == "reflection":
            if W > 1:
                spanx = 2.0 * (W - 1)
                x = jnp.mod(x, spanx)
                x = jnp.minimum(x, spanx - x)
            else:
                x = jnp.zeros_like(x)
            if H > 1:
                spany = 2.0 * (H - 1)
                y = jnp.mod(y, spany)
                y = jnp.minimum(y, spany - y)
            else:
                y = jnp.zeros_like(y)
        else:  # zeros: clamp far-out coords so int32 floor is safe; any
            # coord <= -2 or >= size keeps both corners unmatched -> 0.
            x = jnp.clip(x, -2.0, float(W))
            y = jnp.clip(y, -2.0, float(H))
        x0 = jnp.floor(x)
        y0 = jnp.floor(y)
        fx = x - x0
        fy = y - y0
        x0i = x0.astype(jnp.int32)  # (CH, 1)
        y0i = y0.astype(jnp.int32)

        k = jax.lax.broadcasted_iota(jnp.int32, (CH, S), 1)
        yk = jax.lax.shift_right_logical(k, shift)
        xk = jax.lax.bitwise_and(k, W - 1)

        wy = jnp.where(yk == y0i, 1.0 - fy, 0.0) + jnp.where(yk == y0i + 1, fy, 0.0)
        wx = jnp.where(xk == x0i, 1.0 - fx, 0.0) + jnp.where(xk == x0i + 1, fx, 0.0)
        m = (wy * wx).astype(img_ref.dtype)  # (CH, S)

        # f32 inputs get a full-precision contraction (the MXU's default
        # bf16 passes cost ~4e-3 abs error on [0,1] pixels); bf16 inputs
        # take the fast path — the rounding is already in the data.
        prec = None if img_ref.dtype == jnp.bfloat16 else jax.lax.Precision.HIGHEST
        o = jax.lax.dot_general(
            m, img_ref[0],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=f32,
            precision=prec,
        )  # (CH, C)
        o_ref[0] = o.astype(out_dtype)

    return kernel


def _grid_sample_impl(image: jnp.ndarray, grid: jnp.ndarray,
                      padding_mode: str, interpret: bool) -> jnp.ndarray:
    _ensure_pallas()
    B, H, W, C = image.shape
    _, Ho, Wo, _ = grid.shape
    S = H * W
    P = Ho * Wo
    CH = _pick_chunk(P, S)

    img_flat = image.reshape(B, S, C)
    grid_flat = grid.reshape(B, P, 2)

    kernel = _make_kernel(CH, H, W, C, padding_mode, image.dtype)
    out = pl.pallas_call(
        kernel,
        grid=(B, P // CH),
        in_specs=[
            pl.BlockSpec((1, CH, 2), lambda b, p: (b, p, 0)),
            pl.BlockSpec((1, S, C), lambda b, p: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, CH, C), lambda b, p: (b, p, 0)),
        out_shape=jax.ShapeDtypeStruct((B, P, C), image.dtype),
        interpret=interpret,
    )(grid_flat, img_flat)
    return out.reshape(B, Ho, Wo, C)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _grid_sample_fused(image, grid, padding_mode, interpret):
    return _grid_sample_impl(image, grid, padding_mode, interpret)


def _fused_fwd(image, grid, padding_mode, interpret):
    return _grid_sample_impl(image, grid, padding_mode, interpret), (image, grid)


def bwd_enabled() -> bool:
    """Fused pallas backward for AE training (which differentiates through
    every warp). EXTDM_PALLAS_WARP_BWD=0 restores the XLA vjp."""
    return os.environ.get("EXTDM_PALLAS_WARP_BWD", "1") == "1"


def _bwd_supported(S: int, C: int) -> bool:
    """Measured win region (f32, on-chip, isolated vjp): the kernel beats
    XLA's gather/scatter only where the scatter rows are nearly empty AND
    the O(CH*S) in-VMEM weight rebuild stays small —
      S=1024 C=3:  pallas 42 ms  vs XLA 274 ms  (6.5x win — the K+1
                   sparse-warp family, XLA scatters 3-wide rows)
      S=1024 C=128: 11.6 vs 5.6   (lose: full scatter rows are fine)
      S=4096 C=3:  161 vs 101     (lose: weight rebuild scales with S)
      S=4096 C=67: 159 vs 53      (lose)
    """
    return (S <= int(os.environ.get("EXTDM_WARP_BWD_MAX_S", "1024"))
            and C <= int(os.environ.get("EXTDM_WARP_BWD_MAX_C", "8")))


def _make_bwd_kernel(CH: int, H: int, W: int, C: int, mode: str, io_dtype):
    """d_image = M^T @ d_out (MXU scatter), d_grid via the same in-VMEM
    corner-indicator build as the forward:

        m[p, s]   = wy(p, s) * wx(p, s)
        dm        = d_out @ img^T                       (CH, S)
        d_fx[p]   = sum_s dm*wy*(1[xk==x0+1] - 1[xk==x0])
        d_gx      = d_fx * d(coord transform)/d_gx

    Out-of-range corners match no lane, so their weight AND gradient are
    exactly 0 (zeros-padding torch semantics; the floor has zero grad)."""
    S = H * W
    shift = int(np.log2(W))
    f32 = jnp.float32

    def kernel(g_ref, img_ref, do_ref, dimg_ref, dg_ref):
        gx = g_ref[0, :, 0:1].astype(f32)  # (CH, 1)
        gy = g_ref[0, :, 1:2].astype(f32)
        sx = 0.5 * (W - 1)
        sy = 0.5 * (H - 1)
        x = (gx + 1.0) * sx
        y = (gy + 1.0) * sy
        if mode == "border":
            dcx = ((x > 0.0) & (x < W - 1.0)).astype(f32)
            dcy = ((y > 0.0) & (y < H - 1.0)).astype(f32)
            x = jnp.clip(x, 0.0, W - 1.0)
            y = jnp.clip(y, 0.0, H - 1.0)
        elif mode == "reflection":
            if W > 1:
                spanx = 2.0 * (W - 1)
                xm = jnp.mod(x, spanx)
                dcx = jnp.where(xm < spanx - xm, 1.0, -1.0)
                x = jnp.minimum(xm, spanx - xm)
            else:
                dcx = jnp.zeros_like(x)
                x = jnp.zeros_like(x)
            if H > 1:
                spany = 2.0 * (H - 1)
                ym = jnp.mod(y, spany)
                dcy = jnp.where(ym < spany - ym, 1.0, -1.0)
                y = jnp.minimum(ym, spany - ym)
            else:
                dcy = jnp.zeros_like(y)
                y = jnp.zeros_like(y)
        else:  # zeros: int32-safety clamp only — unmatched corners already
            # zero both the value and the gradient, matching the XLA vjp.
            dcx = jnp.ones_like(x)
            dcy = jnp.ones_like(y)
            x = jnp.clip(x, -2.0, float(W))
            y = jnp.clip(y, -2.0, float(H))
        x0 = jnp.floor(x)
        y0 = jnp.floor(y)
        fx = x - x0
        fy = y - y0
        x0i = x0.astype(jnp.int32)
        y0i = y0.astype(jnp.int32)

        k = jax.lax.broadcasted_iota(jnp.int32, (CH, S), 1)
        yk = jax.lax.shift_right_logical(k, shift)
        xk = jax.lax.bitwise_and(k, W - 1)
        ix0 = (xk == x0i).astype(f32)
        ix1 = (xk == x0i + 1).astype(f32)
        iy0 = (yk == y0i).astype(f32)
        iy1 = (yk == y0i + 1).astype(f32)
        wx = ix0 * (1.0 - fx) + ix1 * fx
        wy = iy0 * (1.0 - fy) + iy1 * fy
        m = wy * wx

        prec = None if io_dtype == jnp.bfloat16 else jax.lax.Precision.HIGHEST
        do_blk = do_ref[0]  # (CH, C)
        # d_image: accumulate M^T @ d_out into the revisited (S, C) block
        part = jax.lax.dot_general(
            m.astype(io_dtype), do_blk,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=f32, precision=prec,
        )  # (S, C)

        @pl.when(pl.program_id(1) == 0)
        def _init():
            dimg_ref[0] = jnp.zeros_like(dimg_ref[0])

        dimg_ref[0] += part

        # d_grid
        dm = jax.lax.dot_general(
            do_blk, img_ref[0],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=f32, precision=prec,
        )  # (CH, S)
        dfx = (dm * wy * (ix1 - ix0)).sum(axis=1, keepdims=True)
        dfy = (dm * wx * (iy1 - iy0)).sum(axis=1, keepdims=True)
        dg_ref[0] = jnp.concatenate(
            [dfx * dcx * sx, dfy * dcy * sy], axis=1)

    return kernel


def _grid_sample_bwd_impl(image, grid, dout, padding_mode, interpret):
    _ensure_pallas()
    B, H, W, C = image.shape
    _, Ho, Wo, _ = grid.shape
    S = H * W
    P = Ho * Wo
    # the backward holds ~8 (CH, S) f32 temporaries (indicator pairs, wx/wy,
    # m, dm, iotas) vs the forward's ~2 — Mosaic's scoped-VMEM estimate hit
    # 18.1M (>16M limit) at CH=64, S=4096; 512K (CH=32 there) fits.
    budget = int(os.environ.get("EXTDM_WARP_BWD_CHUNK_BYTES",
                                str(512 * 1024)))
    CH = 8
    for c in (8, 16, 32, 64, 128, 256, 512, 1024, 2048):
        if P % c == 0 and c * S * 4 <= budget:
            CH = c

    img_flat = image.reshape(B, S, C)
    grid_flat = grid.reshape(B, P, 2)
    do_flat = dout.reshape(B, P, C).astype(image.dtype)

    kernel = _make_bwd_kernel(CH, H, W, C, padding_mode, image.dtype)
    dimg, dgrid = pl.pallas_call(
        kernel,
        grid=(B, P // CH),
        in_specs=[
            pl.BlockSpec((1, CH, 2), lambda b, p: (b, p, 0)),
            pl.BlockSpec((1, S, C), lambda b, p: (b, 0, 0)),
            pl.BlockSpec((1, CH, C), lambda b, p: (b, p, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, S, C), lambda b, p: (b, 0, 0)),
            pl.BlockSpec((1, CH, 2), lambda b, p: (b, p, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, S, C), jnp.float32),
            jax.ShapeDtypeStruct((B, P, 2), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=interpret,
    )(grid_flat, img_flat, do_flat)
    return (dimg.reshape(image.shape).astype(image.dtype),
            dgrid.reshape(grid.shape).astype(grid.dtype))


def _fused_bwd(padding_mode, interpret, res, g):
    from extdm_tpu.ops import warp as warp_mod

    image, grid = res
    B, H, W, C = image.shape
    if bwd_enabled() and (interpret or _bwd_supported(H * W, C)):
        return _grid_sample_bwd_impl(image, grid, g, padding_mode, interpret)
    _, vjp = jax.vjp(
        lambda im, gr: warp_mod.grid_sample_xla(im, gr, padding_mode), image, grid
    )
    return vjp(g)


_grid_sample_fused.defvjp(_fused_fwd, _fused_bwd)


def grid_sample(image: jnp.ndarray, grid: jnp.ndarray,
                padding_mode: str = "zeros",
                interpret: bool = False) -> jnp.ndarray:
    """Drop-in fused bilinear sampler; caller must check supported()."""
    return _grid_sample_fused(image, grid, padding_mode, interpret)
