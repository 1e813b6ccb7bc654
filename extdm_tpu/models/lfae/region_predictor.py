"""Region predictor: hourglass -> K region heatmaps -> affine params.

Semantics match /root/reference/model/LFAE/region_predictor.py:28-150 with
two TPU-native changes:
- the per-region 2x2 SVD uses the closed-form symmetric eigendecomposition
  (`ops.sqrt_symmetric_2x2`) instead of LAPACK `torch.svd` — exact for the
  PSD covariances produced here and fully batched on the VPU;
- layout is channels-last and the whole module is shape-static/jittable.
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from extdm_tpu.nn.layers import Conv, Hourglass
from extdm_tpu.ops.antialias import antialias_downsample
from extdm_tpu.ops.coords import make_coordinate_grid
from extdm_tpu.ops.eigh2x2 import eigh_2x2, sqrt_symmetric_2x2


class RegionPredictor(nn.Module):
    num_regions: int
    block_expansion: int = 32
    max_features: int = 1024
    num_blocks: int = 5
    temperature: float = 0.1
    scale_factor: float = 1.0
    pca_based: bool = True
    estimate_affine: bool = True
    pad: int = 0
    train: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        """x: (B, H, W, C) image in [0, 1]. Returns dict with
        shift (B, K, 2), covar (B, K, 2, 2), affine (B, K, 2, 2),
        heatmap (B, h, w, K)."""
        if self.scale_factor != 1.0:
            x = antialias_downsample(x, self.scale_factor)

        feature_map = Hourglass(
            self.block_expansion,
            num_blocks=self.num_blocks,
            max_features=self.max_features,
            train=self.train,
            dtype=self.dtype,
            name="predictor",
        )(x)
        prediction = Conv(
            self.num_regions, (7, 7), padding=(self.pad, self.pad), dtype=self.dtype, name="regions"
        )(feature_map)

        B, h, w, K = prediction.shape
        region = prediction.reshape(B, h * w, K)
        region = nn.softmax(region.astype(jnp.float32) / self.temperature, axis=1)
        region = region.reshape(B, h, w, K)

        grid = make_coordinate_grid(h, w, dtype=region.dtype)  # (h, w, 2)
        # shift: heatmap-weighted grid mean (region2affine, ref :60-77)
        shift = jnp.einsum("bhwk,hwc->bkc", region, grid)  # (B, K, 2)

        params = {"shift": shift, "heatmap": region}

        if self.pca_based:
            diff = grid[None, :, :, None, :] - shift[:, None, None, :, :]  # (B,h,w,K,2)
            covar = jnp.einsum("bhwki,bhwkj,bhwk->bkij", diff, diff, region)
            params["covar"] = covar
            affine = sqrt_symmetric_2x2(covar)
            u, s = eigh_2x2(covar)
            params["affine"] = affine
            params["u"] = u
            params["d"] = jnp.sqrt(jnp.maximum(s, 0.0))
        elif self.estimate_affine:
            # FOMM-style regressed jacobian (ref :44-48,120-132); conv init
            # zero weights, bias = identity.
            jac_map = nn.Conv(
                4,
                (7, 7),
                padding=((self.pad, self.pad), (self.pad, self.pad)),
                kernel_init=nn.initializers.zeros,
                bias_init=lambda key, shape, dtype=jnp.float32: jnp.asarray(
                    [1.0, 0.0, 0.0, 1.0], dtype
                ),
                dtype=self.dtype,
                name="jacobian",
            )(feature_map)
            jac = jnp.einsum("bhwk,bhwj->bkj", region, jac_map)  # (B, K, 4)
            jac = jac.reshape(B, K, 2, 2)
            params["affine"] = jac
            params["covar"] = jac @ jnp.swapaxes(jac, -1, -2)

        return params
