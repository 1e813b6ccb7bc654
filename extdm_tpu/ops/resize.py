"""Resize ops with torch-equivalent semantics, channels-last.

- `interpolate_bilinear(..., align_corners=False)` matches
  `torch.nn.functional.interpolate(mode="bilinear")` (half-pixel centers,
  no antialias) used throughout the reference (e.g. generator.py:69,
  pixelwise occlusion upsample, UNet cond-feature upsample).
- `upsample_nearest` matches `F.interpolate(scale_factor=k)` (nearest).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def interpolate_bilinear(x: jnp.ndarray, size, align_corners: bool = False) -> jnp.ndarray:
    """x: (..., H, W, C) -> (..., size[0], size[1], C)."""
    h, w = size
    *lead, H, W, C = x.shape
    if (H, W) == (h, w):
        return x
    if not align_corners:
        out_shape = tuple(lead) + (h, w, C)
        return jax.image.resize(x, out_shape, method="bilinear", antialias=False)
    # align_corners=True: source coord = i * (S-1)/(s-1)
    compute_dtype = jnp.promote_types(x.dtype, jnp.float32)
    ys = jnp.linspace(0.0, H - 1, h, dtype=compute_dtype) if h > 1 else jnp.zeros((1,), compute_dtype)
    xs = jnp.linspace(0.0, W - 1, w, dtype=compute_dtype) if w > 1 else jnp.zeros((1,), compute_dtype)

    def gather_axis(arr, coords, axis):
        i0 = jnp.floor(coords).astype(jnp.int32)
        i1 = jnp.minimum(i0 + 1, arr.shape[axis] - 1)
        frac = (coords - i0).astype(compute_dtype)
        a0 = jnp.take(arr, i0, axis=axis)
        a1 = jnp.take(arr, i1, axis=axis)
        shape = [1] * arr.ndim
        shape[axis] = -1
        frac = frac.reshape(shape)
        return a0.astype(compute_dtype) * (1 - frac) + a1.astype(compute_dtype) * frac

    out = gather_axis(x, ys, x.ndim - 3)
    out = gather_axis(out, xs, x.ndim - 2)
    return out.astype(x.dtype)


def upsample_nearest(x: jnp.ndarray, scale: int = 2) -> jnp.ndarray:
    """x: (..., H, W, C) -> (..., H*scale, W*scale, C) by pixel duplication."""
    x = jnp.repeat(x, scale, axis=-3)
    x = jnp.repeat(x, scale, axis=-2)
    return x


def avg_pool_2x2(x: jnp.ndarray) -> jnp.ndarray:
    """2x2 average pool, stride 2 (torch nn.AvgPool2d((2,2))). (..., H, W, C)."""
    *lead, H, W, C = x.shape
    x = x.reshape(*lead, H // 2, 2, W // 2, 2, C)
    return x.mean(axis=(-4, -2))
