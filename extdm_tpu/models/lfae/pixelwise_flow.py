"""Dense pixelwise flow from sparse region motions.

Semantics match /root/reference/model/LFAE/pixelwise_flow_predictor.py:17-153:
Gaussian heatmap differences (Eq. 6), K+1 sparse affine motions, K+1 warped
copies of the source, hourglass -> softmax mask -> weighted flow combine,
optional occlusion head.

TPU notes: the K+1 warped copies are produced by a single `grid_sample`
with the regions folded into the batch dimension; the hourglass sees one
big NHWC conv stack. All shapes static.
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import flax.linen as nn
import jax.numpy as jnp

from extdm_tpu.nn.layers import Conv, Hourglass
from extdm_tpu.ops.antialias import antialias_downsample
from extdm_tpu.ops.coords import (
    from_homogeneous,
    make_coordinate_grid,
    region2gaussian,
    to_homogeneous,
)
from extdm_tpu.ops.eigh2x2 import inv_2x2
from extdm_tpu.ops.warp import grid_sample


class PixelwiseFlowPredictor(nn.Module):
    num_regions: int
    num_channels: int = 3
    block_expansion: int = 64
    max_features: int = 1024
    num_blocks: int = 5
    estimate_occlusion_map: bool = False
    scale_factor: float = 1.0
    region_var: float = 0.01
    use_covar_heatmap: bool = False
    use_deformed_source: bool = True
    revert_axis_swap: bool = False
    train: bool = True
    dtype: Any = None

    def heatmap_representations(self, source, driving_params, source_params):
        h, w = source.shape[1:3]
        covar_d = driving_params["covar"] if self.use_covar_heatmap else self.region_var
        covar_s = source_params["covar"] if self.use_covar_heatmap else self.region_var
        g_driving = region2gaussian(driving_params["shift"], covar_d, (h, w))  # (B,K,h,w)
        g_source = region2gaussian(source_params["shift"], covar_s, (h, w))
        heatmap = g_driving - g_source
        zeros = jnp.zeros_like(heatmap[:, :1])
        return jnp.concatenate([zeros, heatmap], axis=1)  # (B, K+1, h, w)

    def sparse_motions(self, source, driving_params, source_params, bg_params=None):
        """(B, K+1, h, w, 2) backward-warp grids: bg grid first, then regions."""
        B = source.shape[0]
        h, w = source.shape[1:3]
        K = self.num_regions
        identity = make_coordinate_grid(h, w, dtype=source_params["shift"].dtype)  # (h,w,2)
        identity = identity[None, None]  # (1,1,h,w,2)
        coord = identity - driving_params["shift"][:, :, None, None, :]
        if "affine" in driving_params:
            affine = source_params["affine"] @ inv_2x2(driving_params["affine"])  # (B,K,2,2)
            if self.revert_axis_swap:
                affine = affine * jnp.sign(affine[:, :, 0:1, 0:1])
            coord = jnp.einsum("bkij,bkhwj->bkhwi", affine, coord)
        driving_to_source = coord + source_params["shift"][:, :, None, None, :]

        bg_grid = jnp.broadcast_to(identity, (B, 1, h, w, 2))
        if bg_params is not None:
            homo = to_homogeneous(bg_grid)
            homo = jnp.einsum("bij,bkhwj->bkhwi", bg_params, homo)
            bg_grid = from_homogeneous(homo)
        return jnp.concatenate([bg_grid, driving_to_source], axis=1)

    def deformed_source(self, source, sparse_motions):
        """Warp source by each of the K+1 grids: (B, K+1, h, w, C)."""
        B, h, w, C = source.shape
        K1 = self.num_regions + 1
        src = jnp.broadcast_to(source[:, None], (B, K1, h, w, C)).reshape(B * K1, h, w, C)
        grids = sparse_motions.reshape(B * K1, h, w, 2)
        out = grid_sample(src, grids)
        return out.reshape(B, K1, h, w, C)

    @nn.compact
    def __call__(self, source, driving_params, source_params, bg_params=None) -> Dict[str, jnp.ndarray]:
        if self.scale_factor != 1.0:
            source = antialias_downsample(source, self.scale_factor)
        if self.dtype is not None:
            # bf16 source for the K+1 warps (see Generator.__call__ note)
            source = source.astype(self.dtype)
        B, h, w, C = source.shape
        K1 = self.num_regions + 1

        heatmap = self.heatmap_representations(source, driving_params, source_params)  # (B,K+1,h,w)
        sparse = self.sparse_motions(source, driving_params, source_params, bg_params)  # (B,K+1,h,w,2)

        if self.use_deformed_source:
            deformed = self.deformed_source(source, sparse)  # (B,K+1,h,w,C)
            # channel layout mirrors the reference concat([heatmap, deformed], dim=2)
            # flattened per region: [heat_k, deformed_k(C)] for each k.
            inp = jnp.concatenate([heatmap[..., None].transpose(0, 2, 3, 1, 4),
                                   deformed.transpose(0, 2, 3, 1, 4)], axis=-1)
        else:
            inp = heatmap[..., None].transpose(0, 2, 3, 1, 4)
        inp = inp.reshape(B, h, w, -1)  # (B, h, w, (K+1)*(1+C))

        prediction = Hourglass(
            self.block_expansion,
            num_blocks=self.num_blocks,
            max_features=self.max_features,
            train=self.train,
            dtype=self.dtype,
            name="hourglass",
        )(inp)

        mask = Conv(K1, (7, 7), dtype=self.dtype, name="mask")(prediction)
        mask = nn.softmax(mask.astype(jnp.float32), axis=-1)  # (B, h, w, K+1)
        flow = jnp.einsum("bkhwc,bhwk->bhwc", sparse, mask)  # (B, h, w, 2)

        out: Dict[str, jnp.ndarray] = {"optical_flow": flow}
        if self.estimate_occlusion_map:
            occ = Conv(1, (7, 7), dtype=self.dtype, name="occlusion")(prediction)
            out["occlusion_map"] = nn.sigmoid(occ.astype(jnp.float32))  # (B, h, w, 1)
        return out
