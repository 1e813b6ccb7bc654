"""Config loading — same YAML schema as the reference
(config/{AE,DM}/*.yaml: dataset_params / flow_params / diffusion_params /
visualizer_params sections, see /root/reference/config/DM/kth.yaml), so a
user's existing configs work unchanged. Builders map the raw dicts onto the
framework's model configs.
"""
from __future__ import annotations

from typing import Any, Dict

import yaml

from extdm_tpu.models.dm.flow_diffusion import FlowDiffusionConfig

# --DM_arch / --Unet3D_arch combinations of scripts/DM/valid.py:83-92 ->
# framework config fields. (wrapper, denoiser) -> overrides.
ARCH_PRESETS: Dict[str, Dict[str, Any]] = {
    # VideoFlowDiffusion_multi + wo_ref denoiser
    "multi/wo_ref": dict(use_ref_features=False, conditioning="adaptor",
                         dim_mults=(1, 2, 4, 4)),
    # VideoFlowDiffusion_multi1248
    "multi1248/ada": dict(use_ref_features=True, conditioning="adaptor",
                          dim_mults=(1, 2, 4, 8)),
    # VideoFlowDiffusion_multi_w_ref + traj_u12/u22 denoisers
    "w_ref/traj": dict(use_ref_features=True, conditioning="trajwarp",
                       down_adaptor_from_level=2, window_size=(2, 4, 4),
                       dim_mults=(1, 2, 4, 4)),
    # VideoFlowDiffusion_multi_w_ref + traj_ada
    "w_ref/ada": dict(use_ref_features=True, conditioning="adaptor",
                      dim_mults=(1, 2, 4, 4)),
    # VideoFlowDiffusion_multi_w_ref_u22 + traj_ada_u22 — the trained config
    "w_ref_u22/ada_u22": dict(use_ref_features=True, conditioning="adaptor",
                              dim_mults=(1, 2, 4, 4), window_size=(4, 4, 4)),
}


def load_config(path: str) -> Dict[str, Any]:
    with open(path) as f:
        return yaml.safe_load(f)


def dm_config_from_yaml(cfg: Dict[str, Any], arch: str = "w_ref_u22/ada_u22",
                        **overrides) -> FlowDiffusionConfig:
    dp = cfg["dataset_params"]
    flow = cfg["flow_params"]["model_params"]
    diff = cfg["diffusion_params"]["model_params"]
    kwargs = dict(
        flow_params=flow,
        cond_frames=dp["train_params"]["cond_frames"],
        pred_frames=dp["train_params"]["pred_frames"],
        frame_shape=dp["frame_shape"],
        sampling_timesteps=diff.get("sampling_timesteps", 10),
        loss_type=diff.get("loss_type", "l2"),
        use_residual_flow=diff.get("use_residual_flow", False),
    )
    kwargs.update(ARCH_PRESETS[arch])
    kwargs.update(overrides)  # explicit overrides win over yaml + preset
    return FlowDiffusionConfig(**kwargs)


def ae_model_kwargs(cfg: Dict[str, Any]) -> Dict[str, Any]:
    """kwargs for models.lfae.ReconstructionModel from an AE yaml."""
    flow = cfg["flow_params"]["model_params"]
    tp = cfg["flow_params"]["train_params"]
    rp = {k: v for k, v in flow["region_predictor_params"].items() if k != "fast_svd"}
    return dict(
        region_predictor_cfg={**rp, "estimate_affine": flow.get("estimate_affine", True)},
        bg_predictor_cfg=flow["bg_predictor_params"],
        generator_cfg={
            **flow["generator_params"],
            "revert_axis_swap": flow.get("revert_axis_swap", True),
        },
        num_regions=flow["num_regions"],
        num_channels=flow["num_channels"],
        scales=tuple(tp.get("scales", (1.0, 0.5, 0.25))),
        loss_weights={**tp["loss_weights"], "reconstruction": tp["loss_weights"].get("reconstruction", 10)},
        transform_params=tp.get("transform_params"),
    )
