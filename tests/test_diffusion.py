"""Diffusion stack tests: schedule parity (vs torch fp64 reference math),
DDIM time grid, dynamic thresholding vs torch.quantile, UNet3D shapes/jit,
MotionAdaptor semantics, and a full FlowDiffusion loss+sample smoke."""
import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from extdm_tpu.models.dm import (
    DiffusionSchedule,
    FlowDiffusion,
    FlowDiffusionConfig,
    GaussianDiffusion,
    Unet3D,
    compute_layer,
    cosine_beta_schedule,
    ddim_time_pairs,
    dynamic_threshold,
)
from extdm_tpu.models.dm.adaptor import MotionAdaptor


def torch_cosine_beta_schedule(timesteps, s=0.008):
    steps = timesteps + 1
    x = torch.linspace(0, timesteps, steps, dtype=torch.float64)
    alphas_cumprod = torch.cos(((x / timesteps) + s) / (1 + s) * torch.pi * 0.5) ** 2
    alphas_cumprod = alphas_cumprod / alphas_cumprod[0]
    betas = 1 - (alphas_cumprod[1:] / alphas_cumprod[:-1])
    return torch.clip(betas, 0, 0.9999)


class TestSchedule:
    def test_cosine_schedule_matches_torch(self):
        ours = cosine_beta_schedule(1000)
        ref = torch_cosine_beta_schedule(1000).numpy()
        np.testing.assert_allclose(ours, ref, rtol=1e-10, atol=1e-12)

    def test_buffers(self):
        s = DiffusionSchedule.create(100)
        betas = torch_cosine_beta_schedule(100)
        alphas = 1.0 - betas
        ac = torch.cumprod(alphas, dim=0)
        acp = torch.nn.functional.pad(ac[:-1], (1, 0), value=1.0)
        np.testing.assert_allclose(s.alphas_cumprod, ac.numpy(), rtol=1e-6)
        np.testing.assert_allclose(s.alphas_cumprod_prev, acp.numpy(), rtol=1e-6)
        pv = betas * (1 - acp) / (1 - ac)
        np.testing.assert_allclose(s.posterior_variance, pv.numpy(), rtol=1e-5)
        np.testing.assert_allclose(
            s.posterior_mean_coef1, (betas * torch.sqrt(acp) / (1 - ac)).numpy(), rtol=1e-5
        )

    def test_ddim_time_pairs_match_reference(self):
        # reference: torch.linspace(0., T, steps+2)[:-1].int(), reversed, pairs
        for T, steps in [(1000, 10), (1000, 250), (100, 5)]:
            times = torch.linspace(0.0, T, steps=steps + 2)[:-1]
            times = list(reversed(times.int().tolist()))
            ref_pairs = np.asarray(list(zip(times[:-1], times[1:])), np.int32)
            np.testing.assert_array_equal(ddim_time_pairs(T, steps), ref_pairs)

    def test_q_sample_roundtrip(self):
        s = DiffusionSchedule.create(1000)
        gd = GaussianDiffusion(schedule=s)
        x = jnp.asarray(np.random.RandomState(0).randn(2, 3, 4, 4, 3), jnp.float32)
        noise = jnp.asarray(np.random.RandomState(1).randn(2, 3, 4, 4, 3), jnp.float32)
        t = jnp.asarray([10, 500], jnp.int32)
        x_noisy = gd.q_sample(x, t, noise)
        x_rec = gd.predict_start_from_noise(x_noisy, t, noise)
        np.testing.assert_allclose(np.asarray(x_rec), np.asarray(x), rtol=1e-3, atol=1e-4)


class TestDynamicThreshold:
    def test_matches_torch_quantile(self):
        x = np.random.RandomState(2).randn(3, 2, 8, 8, 3).astype(np.float32) * 3
        ours = np.asarray(dynamic_threshold(jnp.asarray(x), 0.9))
        tx = torch.from_numpy(x)
        s = torch.quantile(tx.reshape(3, -1).abs(), 0.9, dim=-1)
        s = s.clamp(min=1.0).view(-1, 1, 1, 1, 1)
        ref = (tx.clamp(-s, s) / s).numpy()
        np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


class TestMotionAdaptor:
    def test_compute_layer(self):
        # reference formula (:767-771)
        assert compute_layer(10, 20) == (2, 30)
        assert compute_layer(2, 10) == (3, 14)
        assert compute_layer(4, 8) == (2, 12)
        assert compute_layer(10, 5) == (1, 10)

    def test_shapes_preserved(self):
        m = MotionAdaptor(tc=4, tp=6)
        x = jnp.asarray(np.random.RandomState(3).randn(2, 10, 8, 8, 16), jnp.float32)
        params = m.init(jax.random.PRNGKey(0), x)
        out = m.apply(params, x)
        assert out.shape == x.shape
        # cond window passes through untouched
        np.testing.assert_allclose(np.asarray(out[:, :4]), np.asarray(x[:, :4]), atol=1e-6)


TINY_UNET = dict(
    dim=16,
    dim_mults=(1, 2),
    window_size=(4, 4, 4),
    attn_heads=2,
    attn_dim_head=8,
    cond_feature_dim=16,
    cond_num=2,
    pred_num=3,
)


class TestUnet3D:
    @pytest.mark.parametrize("path", [0, 1])
    def test_forward_shapes(self, path):
        model = Unet3D(**TINY_UNET)
        x = jnp.asarray(np.random.RandomState(4).randn(1, 3, 16, 16, 3), jnp.float32)
        cond = jnp.asarray(np.random.RandomState(5).randn(1, 2, 16, 16, 3), jnp.float32)
        fea = jnp.asarray(np.random.RandomState(6).randn(1, 5, 8, 8, 16), jnp.float32)
        t = jnp.asarray([7], jnp.int32)
        params = model.init(jax.random.PRNGKey(0), x, t, cond, fea, path=path)
        out = model.apply(params, x, t, cond, fea, path=path)
        assert out.shape == (1, 3, 16, 16, 3)
        assert np.isfinite(np.asarray(out)).all()

    def test_trajwarp_variant(self):
        model = Unet3D(**{**TINY_UNET, "conditioning": "trajwarp",
                          "down_adaptor_from_level": 2})
        x = jnp.asarray(np.random.RandomState(7).randn(1, 3, 16, 16, 3), jnp.float32)
        cond = jnp.asarray(np.random.RandomState(8).randn(1, 2, 16, 16, 3), jnp.float32)
        fea = jnp.asarray(np.random.RandomState(9).randn(1, 5, 8, 8, 16), jnp.float32)
        t = jnp.asarray([7], jnp.int32)
        params = model.init(jax.random.PRNGKey(0), x, t, cond, fea)
        out = model.apply(params, x, t, cond, fea)
        assert out.shape == (1, 3, 16, 16, 3)

    def test_wo_ref_variant(self):
        model = Unet3D(**{**TINY_UNET, "use_ref_features": False})
        x = jnp.asarray(np.random.RandomState(10).randn(1, 3, 16, 16, 3), jnp.float32)
        cond = jnp.asarray(np.random.RandomState(11).randn(1, 2, 16, 16, 3), jnp.float32)
        t = jnp.asarray([7], jnp.int32)
        params = model.init(jax.random.PRNGKey(0), x, t, cond, None)
        out = model.apply(params, x, t, cond, None)
        assert out.shape == (1, 3, 16, 16, 3)


TINY_FLOW_PARAMS = dict(
    num_regions=3,
    num_channels=3,
    estimate_affine=True,
    revert_axis_swap=True,
    bg_predictor_params=dict(block_expansion=8, max_features=32, num_blocks=2, bg_type="affine"),
    region_predictor_params=dict(
        temperature=0.1, block_expansion=8, max_features=32, scale_factor=0.5,
        num_blocks=2, pca_based=True, pad=0, fast_svd=False,
    ),
    generator_params=dict(
        block_expansion=16, max_features=64, num_down_blocks=2, num_bottleneck_blocks=2,
        skips=True,
        pixelwise_flow_predictor_params=dict(
            block_expansion=8, max_features=32, num_blocks=2, scale_factor=0.5,
            use_deformed_source=True, use_covar_heatmap=True, estimate_occlusion_map=True,
        ),
    ),
)


@pytest.fixture(scope="module")
def tiny_fd():
    cfg = FlowDiffusionConfig(
        flow_params=TINY_FLOW_PARAMS,
        cond_frames=2,
        pred_frames=3,
        frame_shape=32,
        timesteps=50,
        sampling_timesteps=3,
        dim=16,
        dim_mults=(1, 2),
        attn_heads=2,
        attn_dim_head=8,
    )
    fd = FlowDiffusion(cfg)
    lfae_vars, unet_vars = fd.init_variables(jax.random.PRNGKey(0))
    return fd, lfae_vars, unet_vars


class TestFlowDiffusion:
    def test_loss(self, tiny_fd):
        fd, lfae_vars, unet_vars = tiny_fd
        video = jnp.asarray(np.random.RandomState(12).rand(2, 5, 32, 32, 3), jnp.float32)
        loss, aux = jax.jit(fd.loss)(lfae_vars, unet_vars, jax.random.PRNGKey(1), video)
        assert np.isfinite(float(loss))

    def test_loss_grads_only_touch_unet(self, tiny_fd):
        fd, lfae_vars, unet_vars = tiny_fd
        video = jnp.asarray(np.random.RandomState(13).rand(1, 5, 32, 32, 3), jnp.float32)

        def loss_fn(uv):
            loss, _ = fd.loss(lfae_vars, uv, jax.random.PRNGKey(2), video)
            return loss

        grads = jax.grad(loss_fn)(unet_vars)
        leaves = jax.tree_util.tree_leaves(grads)
        assert all(np.isfinite(np.asarray(g)).all() for g in leaves)
        total = sum(float(jnp.sum(jnp.abs(g))) for g in leaves)
        assert total > 0

    def test_sample(self, tiny_fd):
        fd, lfae_vars, unet_vars = tiny_fd
        cond = jnp.asarray(np.random.RandomState(14).rand(1, 2, 32, 32, 3), jnp.float32)
        out = jax.jit(lambda k, c: fd.sample_video(lfae_vars, unet_vars, k, c))(
            jax.random.PRNGKey(3), cond
        )
        assert out["sample_out_vid"].shape == (1, 5, 32, 32, 3)
        assert out["sample_vid_grid"].shape == (1, 5, 16, 16, 2)
        assert out["sample_vid_conf"].shape == (1, 5, 16, 16, 1)
        assert np.isfinite(np.asarray(out["sample_out_vid"])).all()
