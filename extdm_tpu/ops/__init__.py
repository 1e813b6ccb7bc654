from extdm_tpu.ops.antialias import antialias_downsample, gaussian_kernel_1d
from extdm_tpu.ops.coords import (
    from_homogeneous,
    make_coordinate_grid,
    region2gaussian,
    to_homogeneous,
)
from extdm_tpu.ops.eigh2x2 import eigh_2x2, inv_2x2, sqrt_symmetric_2x2
from extdm_tpu.ops.resize import avg_pool_2x2, interpolate_bilinear, upsample_nearest
from extdm_tpu.ops.warp import grid_sample

__all__ = [
    "antialias_downsample",
    "gaussian_kernel_1d",
    "make_coordinate_grid",
    "region2gaussian",
    "to_homogeneous",
    "from_homogeneous",
    "eigh_2x2",
    "inv_2x2",
    "sqrt_symmetric_2x2",
    "interpolate_bilinear",
    "upsample_nearest",
    "avg_pool_2x2",
    "grid_sample",
]
