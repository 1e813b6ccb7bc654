"""Golden parity: reference DM stack (torch, /root/reference) vs ours.

Instantiates the ACTUAL reference denoiser
(DenoiseNet_STWAtt_w_w_ref_adaptor_cross_multi_traj_ada_u22.Unet3D) and
GaussianDiffusion on CPU — with minimal stubs (tests/reference_stubs.py)
for rotary_embedding_torch / timm / einops_exts, which this image lacks —
converts the torch weights via extdm_tpu.convert.torch2jax.convert_unet3d,
and checks outputs match on the same inputs. This is the SURVEY §7.6
"golden tests" harness for the diffusion stage (the LFAE stage's lives in
test_convert_parity.py).

Caveat: RotaryEmbedding comes from the stub (interleaved pairs, theta
10000, partial rotation — rotary-embedding-torch's defaults as of the
reference's vintage), so rotary parity is vs that documented convention.
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

from model.BaseDM_adaptor.DenoiseNet_STWAtt_w_w_ref_adaptor_cross_multi_traj_ada_u22 import (  # noqa: E402
    Unet3D as RefUnet3D,
)

from extdm_tpu.convert.torch2jax import convert_dm_checkpoint, convert_unet3d  # noqa: E402
from extdm_tpu.models.dm.diffusion import DiffusionSchedule, GaussianDiffusion  # noqa: E402
from extdm_tpu.models.dm.unet3d import Unet3D  # noqa: E402

TC, TP, S = 2, 2, 8
DIM, MULTS, HEADS, DH = 16, (1, 2), 2, 8
WINDOW = (2, 2, 2)
GROUPS = 4
COND_DIM = 256


@pytest.fixture(scope="module")
def nets():
    torch.manual_seed(0)
    ref = RefUnet3D(dim=DIM, dim_mults=MULTS, attn_heads=HEADS,
                    attn_dim_head=DH, window_size=WINDOW,
                    resnet_groups=GROUPS, channels=3 + COND_DIM,
                    cond_num=TC, pred_num=TP, framesize=S)
    ref.eval()
    ours = Unet3D(dim=DIM, dim_mults=MULTS, attn_heads=HEADS,
                  attn_dim_head=DH, window_size=WINDOW, resnet_groups=GROUPS,
                  cond_num=TC, pred_num=TP, use_ref_features=True,
                  conditioning="adaptor", cond_feature_dim=COND_DIM,
                  remat=False)
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = convert_unet3d(sd, latent_channels=3)
    return ref, ours, params


def _inputs(seed=0, B=2):
    rs = np.random.RandomState(seed)
    x = rs.randn(B, 3, TP, S, S).astype(np.float32)       # noisy pred latents
    cond = rs.randn(B, 3, TC, S, S).astype(np.float32)    # cond latents
    fea = rs.randn(B, COND_DIM, TC + TP, S, S).astype(np.float32)
    t = np.array([3.0] * B, np.float32)
    return x, cond, fea, t


class TestUnetParity:
    def test_forward_matches_reference(self, nets):
        ref, ours, params = nets
        x, cond, fea, t = _inputs()
        with torch.no_grad():
            out_ref = ref(torch.from_numpy(x), torch.from_numpy(t),
                          cond_frames=torch.from_numpy(cond),
                          cond_fea=torch.from_numpy(fea))
        out_ref = out_ref.numpy().transpose(0, 2, 3, 4, 1)  # BCTHW -> BTHWC

        def to_last(a):  # (B, C, T, H, W) -> (B, T, H, W, C)
            return jnp.asarray(a.transpose(0, 2, 3, 4, 1))

        out = ours.apply({"params": params}, to_last(x), jnp.asarray(t),
                         to_last(cond), to_last(fea))
        out = np.asarray(out)
        assert out.shape == out_ref.shape == (2, TP, S, S, 3)
        np.testing.assert_allclose(out, out_ref, rtol=2e-4, atol=2e-4)

    def test_param_tree_structure_matches_init(self, nets):
        _, ours, params = nets
        x, cond, fea, t = _inputs(B=1)

        def to_last(a):
            return jnp.asarray(a.transpose(0, 2, 3, 4, 1))

        v = jax.eval_shape(ours.init, jax.random.PRNGKey(0), to_last(x),
                           jnp.asarray(t), to_last(cond), to_last(fea))
        want = jax.tree_util.tree_map(lambda l: l.shape, v["params"])
        got = jax.tree_util.tree_map(lambda l: np.asarray(l).shape, params)
        assert jax.tree_util.tree_structure(want) == \
            jax.tree_util.tree_structure(got)
        assert want == got

    def test_cond_cache_path_matches_direct(self, nets):
        """Our DDIM-hoisted cond_cache split must be output-identical to
        the direct forward (and hence to the reference)."""
        _, ours, params = nets
        x, cond, fea, t = _inputs(seed=1)

        def to_last(a):
            return jnp.asarray(a.transpose(0, 2, 3, 4, 1))

        direct = ours.apply({"params": params}, to_last(x), jnp.asarray(t),
                            to_last(cond), to_last(fea))
        cache = ours.apply({"params": params}, to_last(x), jnp.asarray(t),
                           to_last(cond), to_last(fea), cond_only=True)
        cached = ours.apply({"params": params}, to_last(x), jnp.asarray(t),
                            to_last(cond), None, cond_cache=cache)
        np.testing.assert_allclose(np.asarray(cached), np.asarray(direct),
                                   rtol=1e-5, atol=1e-5)


class TestDiffusionParity:
    @pytest.fixture(scope="class")
    def ref_diffusion(self, nets):
        from model.BaseDM_adaptor.Diffusion import GaussianDiffusion as RefGD

        ref_unet = nets[0]
        gd = RefGD(ref_unet, image_size=S, num_frames=TC + TP, channels=3,
                   timesteps=20, sampling_timesteps=2, loss_type="l2",
                   use_dynamic_thres=True)
        gd.eval()
        return gd

    def test_schedule_buffers_match(self, ref_diffusion):
        sched = DiffusionSchedule.create(timesteps=20)
        sd = ref_diffusion.state_dict()
        for ref_name, ours in [
            ("betas", sched.betas),
            ("alphas_cumprod", sched.alphas_cumprod),
            ("sqrt_alphas_cumprod", sched.sqrt_alphas_cumprod),
            ("sqrt_one_minus_alphas_cumprod",
             sched.sqrt_one_minus_alphas_cumprod),
            ("posterior_variance", sched.posterior_variance),
            ("posterior_mean_coef1", sched.posterior_mean_coef1),
            ("posterior_mean_coef2", sched.posterior_mean_coef2),
        ]:
            np.testing.assert_allclose(
                np.asarray(ours), sd[ref_name].numpy(), rtol=1e-5, atol=1e-6,
                err_msg=ref_name)

    def test_train_loss_matches_reference(self, nets, ref_diffusion):
        """Full ε-prediction training loss + thresholded pred_x0 on fixed
        (t, noise) — the reference p_losses (Diffusion.py:286-319) against
        our q_sample/denoise/predict_start/dynamic-threshold pipeline."""
        ref, ours, params = nets
        x, cond, fea, _ = _inputs(seed=2)
        rs = np.random.RandomState(3)
        noise = rs.randn(*x.shape).astype(np.float32)
        t_np = np.array([4, 17])

        with torch.no_grad():
            loss_ref, x0_ref = ref_diffusion.p_losses(
                torch.from_numpy(cond), torch.from_numpy(x),
                torch.from_numpy(fea), torch.from_numpy(t_np).long(),
                noise=torch.from_numpy(noise))
        x0_ref = x0_ref.numpy().transpose(0, 2, 3, 4, 1)

        def to_last(a):
            return jnp.asarray(a.transpose(0, 2, 3, 4, 1))

        gd = GaussianDiffusion(schedule=DiffusionSchedule.create(timesteps=20),
                               loss_type="l2", use_dynamic_thres=True)
        t_j = jnp.asarray(t_np)
        x_noisy = gd.q_sample(to_last(x), t_j, to_last(noise))
        pred_noise = ours.apply({"params": params}, x_noisy,
                                t_j.astype(jnp.float32), to_last(cond),
                                to_last(fea))
        loss = jnp.mean((to_last(noise) * 10.0 - pred_noise * 10.0) ** 2)
        x0 = gd.predict_start_from_noise(x_noisy, t_j, pred_noise)
        x0 = gd._maybe_threshold(x0)

        np.testing.assert_allclose(float(loss), float(loss_ref),
                                   rtol=2e-4, atol=2e-5)
        np.testing.assert_allclose(np.asarray(x0), x0_ref,
                                   rtol=2e-3, atol=2e-3)


class TestCheckpointEntry:
    def test_convert_dm_checkpoint_strips_prefix(self, nets, tmp_path):
        ref, _, params_direct = nets
        from model.BaseDM_adaptor.Diffusion import GaussianDiffusion as RefGD

        gd = RefGD(ref, image_size=S, num_frames=TC + TP, channels=3,
                   timesteps=20, sampling_timesteps=2, loss_type="l2")
        sd = {k: v.detach().numpy() for k, v in gd.state_dict().items()}
        params = convert_dm_checkpoint(sd)
        flat_a = jax.tree_util.tree_leaves(params)
        flat_b = jax.tree_util.tree_leaves(params_direct)
        assert len(flat_a) == len(flat_b)
        for a, b in zip(flat_a, flat_b):
            np.testing.assert_array_equal(a, b)


class TestDDIMSamplingParity:
    def test_ddim_trajectory_matches_reference(self, nets, monkeypatch):
        """Full DDIM rollout (2 steps, eta=0) with identical x_T: the
        reference ddim_sample (Diffusion.py:208-258) vs our lax.scan
        sampler. eta=0 makes the trajectory deterministic given x_T; the
        in-loop randn_like is multiplied by sigma=0."""
        ref, ours, params = nets
        from model.BaseDM_adaptor.Diffusion import GaussianDiffusion as RefGD

        gd_ref = RefGD(ref, image_size=S, num_frames=TC + TP, channels=3,
                       timesteps=20, sampling_timesteps=2, loss_type="l2",
                       use_dynamic_thres=True, ddim_sampling_eta=0.0)
        gd_ref.eval()

        x, cond, fea, _ = _inputs(seed=4)
        rs = np.random.RandomState(5)
        x_T = rs.randn(*x.shape).astype(np.float32)

        real_randn = torch.randn
        monkeypatch.setattr(
            torch, "randn",
            lambda *s, **k: torch.from_numpy(x_T)
            if tuple(s[0] if isinstance(s[0], (tuple, list)) else s) == x_T.shape
            else real_randn(*s, **k))
        with torch.no_grad():
            out_ref = gd_ref.ddim_sample(
                torch.from_numpy(cond), x_T.shape, torch.from_numpy(fea))
        out_ref = out_ref.numpy().transpose(0, 2, 3, 4, 1)

        def to_last(a):
            return jnp.asarray(a.transpose(0, 2, 3, 4, 1))

        gd = GaussianDiffusion(schedule=DiffusionSchedule.create(timesteps=20),
                               sampling_timesteps=2, loss_type="l2",
                               use_dynamic_thres=True, ddim_eta=0.0)

        def denoise(img, t, x_cond, cond_fea):
            return ours.apply({"params": params}, img,
                              t.astype(jnp.float32), x_cond, cond_fea)

        out = gd.ddim_sample(denoise, jax.random.PRNGKey(0), to_last(cond),
                             TP, to_last(fea), init_noise=to_last(x_T))
        np.testing.assert_allclose(np.asarray(out), out_ref,
                                   rtol=2e-3, atol=2e-3)
