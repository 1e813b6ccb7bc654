"""Capstone golden test: the ENTIRE inference pipeline vs the reference.

Instantiates the reference `VideoFlowDiffusion_multi_w_ref_u22.FlowDiffusion`
wrapper (random-init, eval mode, device_ids=cpu) — the exact object
`scripts/DM/valid.py` drives — converts its LFAE + UNet weights with our
torch2jax converters, and checks that `sample_one_video` and our
`FlowDiffusion.make_sampler` produce the same pseudo-GT latents, DDIM
trajectory (same x_T, eta=0) and decoded pixels. This covers every glue
seam at once: LFAE encode loop + ref-feature stacking
(u22.py:423-470), x_cond = cat(flow, conf*2-1), DDIM, latent splicing,
and the forward_with_flow pixel decode (u22.py:486-502).
"""
import sys

import numpy as np
import pytest

sys.path.insert(0, "/root/repo/tests")
torch = pytest.importorskip("torch")

import reference_stubs  # noqa: E402

reference_stubs.install()
sys.path.insert(0, "/root/reference")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from model.BaseDM_adaptor.VideoFlowDiffusion_multi_w_ref_u22 import (  # noqa: E402
    FlowDiffusion as RefFlowDiffusion,
)

from extdm_tpu.convert.torch2jax import (  # noqa: E402
    convert_dm_checkpoint,
    convert_lfae_checkpoint,
)
from extdm_tpu.models.dm.flow_diffusion import (  # noqa: E402
    FlowDiffusion,
    FlowDiffusionConfig,
)

TC, TP, FRAME = 2, 2, 32

FLOW_PARAMS = {
    "num_regions": 3,
    "num_channels": 3,
    "estimate_affine": True,
    "revert_axis_swap": True,
    "bg_predictor_params": {
        "block_expansion": 8, "max_features": 16, "num_blocks": 2,
        "bg_type": "affine",
    },
    "region_predictor_params": {
        "block_expansion": 8, "max_features": 16, "num_blocks": 2,
        "temperature": 0.1, "scale_factor": 0.5, "pca_based": True,
        "pad": 0, "fast_svd": False,
    },
    "generator_params": {
        # bottleneck must be 256ch: the reference wrapper hardcodes the
        # UNet cond channels to 256 (u22.py:200 `channels=3+256`)
        "block_expansion": 64, "max_features": 512, "num_down_blocks": 2,
        "num_bottleneck_blocks": 1, "skips": True,
        "pixelwise_flow_predictor_params": {
            "block_expansion": 8, "max_features": 16, "num_blocks": 2,
            "scale_factor": 0.5, "use_deformed_source": True,
            "use_covar_heatmap": True, "estimate_occlusion_map": True,
        },
    },
}

REF_CONFIG = {
    "flow_params": {"model_params": FLOW_PARAMS},
    "diffusion_params": {"model_params": {
        "use_residual_flow": False, "only_use_flow": False,
        "sampling_timesteps": 2, "loss_type": "l2", "null_cond_prob": 0.0,
    }},
    "dataset_params": {
        "frame_shape": FRAME,
        "train_params": {"cond_frames": TC, "pred_frames": TP},
    },
}


@pytest.fixture(scope="module")
def stacks():
    torch.manual_seed(0)
    ref = RefFlowDiffusion(config=REF_CONFIG, pretrained_pth="",
                           is_train=False, ddim_sampling_eta=0.0,
                           timesteps=20, dim_mults=(1, 2),
                           device_ids=["cpu", "cpu", "cpu"])
    ref.eval()  # BN -> running stats everywhere (random init: mean0/var1)

    def sd(m):
        return {k: v.detach().numpy() for k, v in m.state_dict().items()}

    lfae_vars = convert_lfae_checkpoint(
        {"generator": sd(ref.generator),
         "region_predictor": sd(ref.region_predictor),
         "bg_predictor": sd(ref.bg_predictor)},
        FLOW_PARAMS)
    unet_params = convert_dm_checkpoint(sd(ref.diffusion))

    cfg = FlowDiffusionConfig(
        flow_params=FLOW_PARAMS, cond_frames=TC, pred_frames=TP,
        frame_shape=FRAME, timesteps=20, sampling_timesteps=2, ddim_eta=0.0,
        dim=64, dim_mults=(1, 2), window_size=(4, 4, 4), attn_heads=8,
        attn_dim_head=32, remat=False)
    fd = FlowDiffusion(cfg)
    return ref, fd, lfae_vars, {"params": unet_params}


class TestEndToEndSamplingParity:
    def test_sample_one_video_matches(self, stacks, monkeypatch):
        ref, fd, lfae_vars, unet_vars = stacks
        rs = np.random.RandomState(0)
        video = rs.rand(1, TC + TP, FRAME, FRAME, 3).astype(np.float32)
        # latent x_T for the DDIM rollout: (B, 3, tp, h/2, w/2) ref layout
        x_T = rs.randn(1, 3, TP, FRAME // 2, FRAME // 2).astype(np.float32)

        real_randn = torch.randn
        monkeypatch.setattr(
            torch, "randn",
            lambda *s, **k: torch.from_numpy(x_T)
            if tuple(s[0] if isinstance(s[0], (tuple, list)) else s) == x_T.shape
            else real_randn(*s, **k))

        with torch.no_grad():
            ret = ref.sample_one_video(
                cond_scale=1.0,
                real_vid=torch.from_numpy(video.transpose(0, 4, 1, 2, 3)))

        def ref_np(key):  # (B, C, T, h, w) -> (B, T, h, w, C)
            return ret[key].numpy().transpose(0, 2, 3, 4, 1)

        # our sampler takes ONLY the tc cond frames (the ref passes the full
        # clip but reads just the cond window, u22.py:423-441)
        sampler = fd.make_sampler(lfae_vars, unet_vars)
        out = sampler(jax.random.PRNGKey(0), jnp.asarray(video[:, :TC]),
                      init_noise=jnp.asarray(x_T.transpose(0, 2, 3, 4, 1)))

        # pseudo-GT encode of the cond frames (LFAE glue + stacking order)
        np.testing.assert_allclose(
            np.asarray(out["real_vid_grid"]), ref_np("real_vid_grid")[:, :TC],
            rtol=1e-3, atol=1e-3)
        np.testing.assert_allclose(
            np.asarray(out["real_vid_conf"]), ref_np("real_vid_conf")[:, :TC],
            rtol=1e-3, atol=1e-3)
        # full DDIM trajectory in latent space
        np.testing.assert_allclose(
            np.asarray(out["sample_vid_grid"]), ref_np("sample_vid_grid"),
            rtol=2e-3, atol=2e-3)
        np.testing.assert_allclose(
            np.asarray(out["sample_vid_conf"]), ref_np("sample_vid_conf"),
            rtol=2e-3, atol=2e-3)
        # decoded pixels (ours splices real cond pixels; ref re-decodes the
        # cond frames too — compare the predicted window)
        np.testing.assert_allclose(
            np.asarray(out["sample_out_vid"][:, TC:]),
            ref_np("sample_out_vid")[:, TC:], rtol=5e-3, atol=5e-3)
        np.testing.assert_allclose(
            np.asarray(out["sample_warped_vid"][:, TC:]),
            ref_np("sample_warped_vid")[:, TC:], rtol=5e-3, atol=5e-3)


class TestTPSTransformParity:
    def test_warp_jacobian_and_frame_match(self):
        """Golden TPS equivariance transform vs reference model/LFAE/
        model.py:82-134 (sampled params injected from the ref object;
        jacobian via jvp vs torch double-backward)."""
        from model.LFAE.model import Transform as RefTransform

        from extdm_tpu.models.lfae import transform as tps

        torch.manual_seed(1)
        B = 2
        ref_t = RefTransform(B, sigma_affine=0.05, sigma_tps=0.005,
                             points_tps=5)
        ours_t = tps.TPSTransform(
            theta=jnp.asarray(ref_t.theta.numpy()),
            control_points=jnp.asarray(
                ref_t.control_points.numpy().reshape(-1, 2)),
            control_params=jnp.asarray(ref_t.control_params.numpy()),
        )

        rs = np.random.RandomState(0)
        coords = rs.uniform(-1, 1, (B, 7, 2)).astype(np.float32)
        tc = torch.from_numpy(coords).requires_grad_(True)
        warped_ref = ref_t.warp_coordinates(tc)
        jac_ref = ref_t.jacobian(tc).detach().numpy()
        np.testing.assert_allclose(
            np.asarray(tps.warp_coordinates(ours_t, jnp.asarray(coords))),
            warped_ref.detach().numpy(), rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(tps.jacobian(ours_t, jnp.asarray(coords))),
            jac_ref, rtol=1e-4, atol=1e-5)

        frame = rs.rand(B, 3, 8, 8).astype(np.float32)
        out_ref = ref_t.transform_frame(torch.from_numpy(frame))
        out = tps.transform_frame(ours_t,
                                  jnp.asarray(frame.transpose(0, 2, 3, 1)))
        np.testing.assert_allclose(
            np.asarray(out), out_ref.detach().numpy().transpose(0, 2, 3, 1),
            rtol=1e-4, atol=1e-5)


class TestGradientParity:
    def test_unet_train_grads_match_reference(self, stacks):
        """One-step GRADIENT parity: d(eps-loss)/d(params) through the whole
        UNet — torch autograd on the reference p_losses vs jax.grad on our
        composed loss (fixed t/noise, converted weights). Validates every
        backward semantic end to end (XLA autodiff path; the pallas
        backward kernels have their own on-chip parity tests)."""
        from extdm_tpu.models.dm.diffusion import (DiffusionSchedule,
                                                   GaussianDiffusion)

        ref, fd, lfae_vars, unet_vars = stacks
        rs = np.random.RandomState(7)
        x = rs.randn(2, 3, TP, FRAME // 2, FRAME // 2).astype(np.float32)
        cond = rs.randn(2, 3, TC, FRAME // 2, FRAME // 2).astype(np.float32)
        fea = rs.randn(2, 256, TC + TP, FRAME // 2,
                       FRAME // 2).astype(np.float32)
        noise = rs.randn(*x.shape).astype(np.float32)
        t_np = np.array([4, 17])

        # --- reference: autograd through p_losses --------------------------
        ref.diffusion.train()
        for p in ref.diffusion.parameters():
            p.grad = None
        loss_ref, _ = ref.diffusion.p_losses(
            torch.from_numpy(cond), torch.from_numpy(x),
            torch.from_numpy(fea), torch.from_numpy(t_np).long(),
            noise=torch.from_numpy(noise))
        loss_ref.backward()
        ref_sd = dict(ref.diffusion.named_parameters())

        # --- ours: jax.grad of the same composed loss ----------------------
        def to_last(a):
            return jnp.asarray(a.transpose(0, 2, 3, 4, 1))

        gd = GaussianDiffusion(schedule=DiffusionSchedule.create(timesteps=20),
                               loss_type="l2", use_dynamic_thres=True)
        t_j = jnp.asarray(t_np)

        def loss_fn(params):
            x_noisy = gd.q_sample(to_last(x), t_j, to_last(noise))
            pred = fd.unet.apply({"params": params}, x_noisy,
                                 t_j.astype(jnp.float32), to_last(cond),
                                 to_last(fea))
            return jnp.mean((to_last(noise) * 10.0 - pred * 10.0) ** 2)

        grads = jax.grad(loss_fn)(unet_vars["params"])

        from extdm_tpu.convert.torch2jax import conv3d_kernel, linear_kernel

        checks = [
            # (ref param name, ours grad path, torch->flax transform)
            ("denoise_fn.init_conv.bias",
             grads["init_conv"]["Conv_0"]["bias"], None),
            ("denoise_fn.final_conv.1.weight",
             grads["final_conv"]["kernel"], conv3d_kernel),
            ("denoise_fn.occlusion_map.1.weight",
             grads["occlusion_conv"]["kernel"], conv3d_kernel),
            ("denoise_fn.mid_attn1.fn.fn.attn.qkv.weight",
             grads["mid_attn1"]["fn"]["attn"]["qkv"]["kernel"],
             linear_kernel),
            ("denoise_fn.downs.0.5.fn.fn.fn.attn.to_qkv.weight",
             grads["down0_tattn"]["fn"]["attn"]["to_qkv"]["kernel"],
             linear_kernel),
            ("denoise_fn.downs.0.4.Tmodulator.bias",
             grads["down0_adaptor"]["Tmodulator"]["bias"], None),
            ("denoise_fn.time_mlp.1.weight",
             grads["time_mlp_0"]["kernel"], linear_kernel),
            ("denoise_fn.ups.1.0.block1.norm.weight",
             grads["up1_block1"]["block1"]["norm"]["scale"], None),
            ("denoise_fn.time_rel_pos_bias.relative_attention_bias.weight",
             grads["time_rel_pos_bias"]["relative_attention_bias"], None),
        ]
        for name, ours_g, tf in checks:
            ref_g = ref_sd[name].grad
            assert ref_g is not None, name
            ref_g = ref_g.numpy()
            if tf is not None:
                ref_g = tf(ref_g)
            scale = max(1e-3, float(np.abs(ref_g).max()))
            np.testing.assert_allclose(
                np.asarray(ours_g) / scale, ref_g / scale,
                rtol=2e-3, atol=2e-3, err_msg=name)

        # init_conv kernel: the reference's single 259-ch conv grad splits
        # into our init_conv (latent) + init_conv_cond (features) grads
        ref_w = ref_sd["denoise_fn.init_conv.weight"].grad.numpy()
        np.testing.assert_allclose(
            np.asarray(grads["init_conv"]["Conv_0"]["kernel"]),
            conv3d_kernel(ref_w[:, :3]), rtol=2e-3, atol=2e-3)
        np.testing.assert_allclose(
            np.asarray(grads["init_conv_cond"]["kernel"]),
            conv3d_kernel(ref_w[:, 3:]), rtol=2e-3, atol=2e-3)
