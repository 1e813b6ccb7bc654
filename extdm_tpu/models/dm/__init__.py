from extdm_tpu.models.dm.adaptor import MotionAdaptor, TrajWarp, compute_layer
from extdm_tpu.models.dm.diffusion import (
    DiffusionSchedule,
    GaussianDiffusion,
    cosine_beta_schedule,
    ddim_time_pairs,
    dynamic_threshold,
)
from extdm_tpu.models.dm.flow_diffusion import LFAE, FlowDiffusion, FlowDiffusionConfig
from extdm_tpu.models.dm.unet3d import Unet3D

__all__ = [
    "MotionAdaptor",
    "TrajWarp",
    "compute_layer",
    "DiffusionSchedule",
    "GaussianDiffusion",
    "cosine_beta_schedule",
    "ddim_time_pairs",
    "dynamic_threshold",
    "LFAE",
    "FlowDiffusion",
    "FlowDiffusionConfig",
    "Unet3D",
]
