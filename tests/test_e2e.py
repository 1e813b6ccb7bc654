"""Minimum end-to-end slice (SURVEY §7): synthetic shapes dataset ->
stage-1 train steps -> freeze -> stage-2 train steps -> DDIM sample ->
metrics -> checkpoint round-trip. Exercises config, data, both models,
diffusion scan, metrics and checkpointing on the CPU mesh.
"""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from extdm_tpu.config import ae_model_kwargs, dm_config_from_yaml, load_config
from extdm_tpu.data import DataLoader, TwoFramesDataset, VideoDataset, make_moving_shapes_dataset, to_rgb_video
from extdm_tpu.models.dm import FlowDiffusion
from extdm_tpu.models.lfae import ReconstructionModel
from extdm_tpu.train import (
    AETrainer,
    DMTrainer,
    load_checkpoint,
    restore_like,
    save_checkpoint,
)
from extdm_tpu.train.ae_trainer import make_optimizer as ae_opt
from extdm_tpu.train.dm_trainer import make_optimizer as dm_opt

TINY_OVERRIDES = dict(
    dim=16, dim_mults=(1, 2), attn_heads=2, attn_dim_head=8,
    timesteps=20, sampling_timesteps=2,
)


def _shrink_flow_params(fp):
    fp = {k: (dict(v) if isinstance(v, dict) else v) for k, v in fp.items()}
    fp["num_regions"] = 3
    fp["region_predictor_params"].update(block_expansion=8, max_features=16, num_blocks=2)
    fp["bg_predictor_params"].update(block_expansion=8, max_features=16, num_blocks=2)
    fp["generator_params"].update(block_expansion=8, max_features=32,
                                  num_bottleneck_blocks=1)
    fp["generator_params"]["pixelwise_flow_predictor_params"].update(
        block_expansion=8, max_features=16, num_blocks=2)
    return fp


@pytest.fixture(scope="module")
def shapes_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("e2e_shapes")
    make_moving_shapes_dataset(str(root), num_train=8, num_valid=4, num_frames=12,
                               image_size=32, seed=0)
    return str(root)


@pytest.fixture(scope="module")
def cfg(shapes_root):
    cfg = load_config("configs/DM/shapes.yaml")
    cfg["dataset_params"]["root_dir"] = shapes_root
    cfg["dataset_params"]["frame_shape"] = 32
    cfg["dataset_params"]["train_params"].update(cond_frames=2, pred_frames=2)
    cfg["dataset_params"]["valid_params"].update(cond_frames=2, pred_frames=4, type="valid")
    cfg["flow_params"]["model_params"] = _shrink_flow_params(cfg["flow_params"]["model_params"])
    # stage-1 train section for the AE model kwargs
    cfg["flow_params"]["train_params"] = dict(
        scales=[1, 0.5], loss_weights=dict(perceptual=[1, 1, 1, 1, 1],
                                           equivariance_shift=10,
                                           equivariance_affine=10, reconstruction=10),
        transform_params=dict(sigma_affine=0.05, sigma_tps=0.005, points_tps=5),
    )
    return cfg


def test_end_to_end(cfg, shapes_root, tmp_path):
    key = jax.random.PRNGKey(0)

    # ---- stage 1: a couple of LFAE train steps --------------------------------
    ae_model = ReconstructionModel(train=True, **ae_model_kwargs(cfg))
    pair_ds = TwoFramesDataset(shapes_root, "train", frame_shape=32,
                               max_frame_distance=8)
    pair_loader = DataLoader(pair_ds, batch_size=4, num_workers=0, seed=0)
    batch0 = next(iter(pair_loader))
    batch0 = {k: jnp.asarray(v) for k, v in batch0.items() if k in ("source", "driving")}
    variables = ae_model.init({"params": key, "tps": jax.random.PRNGKey(1)}, batch0)
    ae_trainer = AETrainer(ae_model, ae_opt(2e-4, [1000], 0.5))
    ae_state = ae_trainer.init_state(variables)
    ae_step = ae_trainer.jitted_train_step(donate=False)
    losses = []
    for i in range(2):
        ae_state, aux = ae_step(ae_state, jax.random.fold_in(key, i), batch0)
        losses.append(float(aux["loss_total"]))
    assert all(np.isfinite(losses))

    # checkpoint round-trip
    ckpt_path = str(tmp_path / "RegionMM.ckpt")
    save_checkpoint(ckpt_path, {"example": 8, "step": 2, "state": ae_state})
    restored = load_checkpoint(ckpt_path)
    ae_state2 = restore_like(ae_state, restored["state"])
    np.testing.assert_allclose(
        np.asarray(jax.tree_util.tree_leaves(ae_state2.params)[0]),
        np.asarray(jax.tree_util.tree_leaves(ae_state.params)[0]),
    )

    # ---- stage 2: freeze LFAE, train the diffusion UNet -------------------------
    fd_cfg = dm_config_from_yaml(cfg, **TINY_OVERRIDES)
    fd = FlowDiffusion(fd_cfg)
    lfae_vars, unet_vars = fd.init_variables(jax.random.PRNGKey(2))
    # transplant the trained stage-1 weights (the scripts' loading path)
    lfae_vars = restore_like(
        lfae_vars,
        {
            "params": {k: ae_state.params[k]
                       for k in ("region_predictor", "bg_predictor", "generator")},
            "batch_stats": {k: ae_state.batch_stats.get(k, {})
                            for k in ("region_predictor", "bg_predictor", "generator")},
        },
    )

    video_ds = VideoDataset(shapes_root, "train", num_frames=4, image_size=32, seed=0)
    loader = DataLoader(video_ds, batch_size=2, num_workers=0, seed=0)
    clips, _ = next(iter(loader))
    video = jnp.asarray(np.stack([to_rgb_video(c) for c in clips]))

    dm_trainer = DMTrainer(fd, dm_opt(1e-4, [1000], 0.75))
    dm_state = dm_trainer.init_state(unet_vars)
    dm_step = dm_trainer.jitted_train_step(donate=False)
    l0 = None
    for i in range(2):
        dm_state, aux = dm_step(dm_state, lfae_vars, jax.random.fold_in(key, 100 + i), video)
        l0 = float(aux["loss"])
        assert np.isfinite(l0)

    # ---- sampling + autoregressive rollout + metrics ----------------------------
    cond = video[:, :2]
    sample = fd.sample_video(lfae_vars, {"params": dm_state.unet_params},
                             jax.random.PRNGKey(3), cond)
    out_vid = np.asarray(sample["sample_out_vid"])
    assert out_vid.shape == (2, 4, 32, 32, 3)
    assert np.isfinite(out_vid).all()

    from extdm_tpu.metrics import calculate_psnr1, calculate_ssim1

    real = np.asarray(video).transpose(0, 1, 4, 2, 3)
    pred = out_vid.transpose(0, 1, 4, 2, 3)
    psnr, _ = calculate_psnr1(pred, real)
    ssim, _ = calculate_ssim1(pred, real)
    assert np.isfinite(psnr["psnr"]) and np.isfinite(ssim["ssim"])
