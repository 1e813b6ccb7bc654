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

Gradients: wrapped in custom_vjp whose backward runs the XLA reference
path's VJP (recompute). The hot callers (DM training's frozen LFAE, the
sampler) never differentiate through it; AE training does, rarely.

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


def _fused_bwd(padding_mode, interpret, res, g):
    from extdm_tpu.ops import warp as warp_mod

    image, grid = res
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
