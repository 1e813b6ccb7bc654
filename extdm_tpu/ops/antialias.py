"""Band-limited (gaussian) downsampling.

Mirrors the reference `AntiAliasInterpolation2d`
(/root/reference/model/LFAE/util.py:224-271): a fixed depthwise gaussian
blur followed by integer-stride subsampling. Implemented as a single
strided depthwise convolution (blur+subsample fused) — the strided conv
touches only the kept pixels, so it does 1/s^2 of the reference's FLOPs
and maps directly onto the TPU convolution unit.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np
from jax import lax


def gaussian_kernel_1d(scale: float) -> np.ndarray:
    sigma = (1.0 / scale - 1.0) / 2.0
    ksize = 2 * round(sigma * 4) + 1
    xs = np.arange(ksize, dtype=np.float64)
    mean = (ksize - 1) / 2.0
    k = np.exp(-((xs - mean) ** 2) / (2.0 * sigma**2))
    return k


def antialias_downsample(x: jnp.ndarray, scale: float) -> jnp.ndarray:
    """x: (B, H, W, C) -> (B, H*scale, W*scale, C) with gaussian prefilter.

    `scale` must be 1/int (e.g. 0.5, 0.25) or 1.0 (identity).
    """
    if scale == 1.0:
        return x
    inv = 1.0 / scale
    stride = int(round(inv))
    assert abs(inv - stride) < 1e-6, f"scale must be 1/int, got {scale}"

    k1 = gaussian_kernel_1d(scale)
    k2 = np.outer(k1, k1)
    k2 = k2 / k2.sum()
    ksize = k2.shape[0]
    ka = ksize // 2
    kb = ka - 1 if ksize % 2 == 0 else ka

    C = x.shape[-1]
    # depthwise kernel: (kh, kw, 1, C) with feature_group_count=C
    kernel = jnp.asarray(k2, dtype=x.dtype)[..., None, None]
    kernel = jnp.tile(kernel, (1, 1, 1, C))

    out = lax.conv_general_dilated(
        x,
        kernel,
        window_strides=(stride, stride),
        padding=((ka, kb), (ka, kb)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=C,
    )
    return out
