"""Bilinear grid-sample (backward warp) — the LFAE workhorse.

Matches `torch.nn.functional.grid_sample(..., align_corners=True)` with
`padding_mode` in {"zeros", "reflection", "border"}; reference call sites:
/root/reference/model/LFAE/generator.py:71 (zeros) and
/root/reference/model/LFAE/model.py:106 (reflection, TPS equivariance).

TPU design notes: the op is a 4-point gather + weighted sum. We flatten the
spatial dims and use `take_along_axis` so XLA lowers it to a single dynamic
gather per corner; all masking is element-wise VPU work that fuses with the
gather's consumers. Layout is NHWC (channels-last), the TPU-native layout.
"""
from __future__ import annotations

import jax.numpy as jnp


def _reflect_coords(x: jnp.ndarray, size: int) -> jnp.ndarray:
    """Reflect continuous pixel coords into [0, size-1].

    Matches torch's reflection for align_corners=True: reflect around the
    border pixel centers 0 and size-1 with period 2*(size-1).
    """
    if size == 1:
        return jnp.zeros_like(x)
    span = 2.0 * (size - 1)
    x = jnp.mod(x, span)
    return jnp.minimum(x, span - x)


def grid_sample(
    image: jnp.ndarray,
    grid: jnp.ndarray,
    padding_mode: str = "zeros",
) -> jnp.ndarray:
    """Sample `image` at normalized `grid` locations (align_corners=True).

    image: (B, H, W, C)
    grid:  (B, Ho, Wo, 2) with (x, y) in [-1, 1].
    Returns (B, Ho, Wo, C).

    On TPU, tileable shapes dispatch to the fused one-hot-matmul pallas
    kernel (ops/pallas_warp.py) — XLA lowers the gather formulation below
    to per-pixel row loads, which dominate the LFAE encode/decode cost.
    """
    from extdm_tpu.ops import pallas_warp

    if pallas_warp.enabled() and pallas_warp.supported(image.shape, grid.shape):
        return pallas_warp.grid_sample(image, grid, padding_mode)
    return grid_sample_xla(image, grid, padding_mode)


def grid_sample_xla(
    image: jnp.ndarray,
    grid: jnp.ndarray,
    padding_mode: str = "zeros",
) -> jnp.ndarray:
    """Gather-based reference implementation (always used on CPU/GPU, and
    as the VJP recompute path of the fused kernel)."""
    B, H, W, C = image.shape
    _, Ho, Wo, _ = grid.shape
    compute_dtype = jnp.promote_types(image.dtype, jnp.float32)
    gx = grid[..., 0].astype(compute_dtype)
    gy = grid[..., 1].astype(compute_dtype)

    # align_corners=True: -1 -> 0, +1 -> S-1.
    x = (gx + 1.0) * 0.5 * (W - 1)
    y = (gy + 1.0) * 0.5 * (H - 1)

    if padding_mode == "reflection":
        x = _reflect_coords(x, W)
        y = _reflect_coords(y, H)
    elif padding_mode == "border":
        x = jnp.clip(x, 0.0, W - 1)
        y = jnp.clip(y, 0.0, H - 1)
    elif padding_mode != "zeros":
        raise ValueError(f"unknown padding_mode: {padding_mode}")

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = (x - x0)[..., None]
    wy = (y - y0)[..., None]

    # gather in the image's own dtype (a gather never changes values, so
    # converting AFTER is bit-identical to converting before — and for
    # bf16 images it halves the gather's HBM traffic); lerp in f32.
    img_flat = image.reshape(B, H * W, C)

    def corner(xi, yi):
        if padding_mode == "zeros":
            valid = ((xi >= 0) & (xi <= W - 1) & (yi >= 0) & (yi <= H - 1))
            mask = valid.astype(compute_dtype)[..., None]
        else:
            mask = None
        xi_c = jnp.clip(xi, 0, W - 1).astype(jnp.int32)
        yi_c = jnp.clip(yi, 0, H - 1).astype(jnp.int32)
        idx = (yi_c * W + xi_c).reshape(B, Ho * Wo, 1)
        vals = jnp.take_along_axis(img_flat, idx, axis=1).reshape(B, Ho, Wo, C)
        vals = vals.astype(compute_dtype)
        return vals if mask is None else vals * mask

    v00 = corner(x0, y0)
    v01 = corner(x0 + 1, y0)
    v10 = corner(x0, y0 + 1)
    v11 = corner(x0 + 1, y0 + 1)

    top = v00 * (1 - wx) + v01 * wx
    bot = v10 * (1 - wx) + v11 * wx
    out = top * (1 - wy) + bot * wy
    return out.astype(image.dtype)
