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
