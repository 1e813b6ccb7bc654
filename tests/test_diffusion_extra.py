"""Extra diffusion coverage: interpolate(), residual-flow mode, FOMM
jacobian-regression region predictor, classifier-free guidance wrapper."""
import jax
import jax.numpy as jnp
import numpy as np

from extdm_tpu.models.dm import DiffusionSchedule, GaussianDiffusion
from extdm_tpu.models.dm.diffusion import guided_denoise_fn


def _zero_denoise(x, t, cond, fea, **kw):
    return jnp.zeros_like(x)


class TestInterpolate:
    def test_shapes_and_finiteness(self):
        gd = GaussianDiffusion(schedule=DiffusionSchedule.create(20))
        x1 = jnp.asarray(np.random.RandomState(0).randn(2, 3, 8, 8, 3), jnp.float32)
        x2 = jnp.asarray(np.random.RandomState(1).randn(2, 3, 8, 8, 3), jnp.float32)
        cond = jnp.zeros((2, 2, 8, 8, 3))
        out = gd.interpolate(_zero_denoise, jax.random.PRNGKey(0), cond, x1, x2, t=5)
        assert out.shape == x1.shape
        assert np.isfinite(np.asarray(out)).all()


class TestGuidance:
    def test_scale_one_is_identity(self):
        fn = guided_denoise_fn(_zero_denoise, 1.0)
        assert fn is _zero_denoise

    def test_scale_interpolates(self):
        def denoise(x, t, cond, fea, null_cond_mask=None):
            if null_cond_mask is None:
                return jnp.ones_like(x)
            return jnp.where(null_cond_mask[:, None, None, None, None],
                             jnp.zeros_like(x), jnp.ones_like(x))

        x = jnp.zeros((2, 1, 4, 4, 3))
        fn = guided_denoise_fn(denoise, 2.0)
        out = fn(x, jnp.zeros((2,), jnp.int32), x, None)
        # null=0, full=1 -> 0 + 2*(1-0) = 2
        np.testing.assert_allclose(np.asarray(out), 2.0)


class TestResidualFlow:
    def test_latents_subtract_identity(self):
        from extdm_tpu.models.dm import FlowDiffusion, FlowDiffusionConfig
        from extdm_tpu.ops.coords import make_coordinate_grid

        from __graft_entry__ import TINY_FLOW_PARAMS

        cfg = FlowDiffusionConfig(
            flow_params=TINY_FLOW_PARAMS, cond_frames=2, pred_frames=2,
            frame_shape=32, timesteps=10, sampling_timesteps=2,
            dim=16, dim_mults=(1, 2), attn_heads=2, attn_dim_head=8,
            use_residual_flow=True,
        )
        fd = FlowDiffusion(cfg)
        ident = np.asarray(make_coordinate_grid(16, 16))
        flow = jnp.asarray(np.broadcast_to(ident, (1, 4, 16, 16, 2)))
        conf = jnp.ones((1, 4, 16, 16, 1)) * 0.5
        latents = fd.latents_from_encode({"flow": flow, "conf": conf})
        # identity flow in residual mode -> zero latent flow channels
        np.testing.assert_allclose(np.asarray(latents[..., :2]), 0.0, atol=1e-6)
        # round trip
        back = fd.flow_from_pred(latents)
        np.testing.assert_allclose(np.asarray(back), np.asarray(flow), atol=1e-6)


class TestFOMMJacobianPath:
    def test_region_predictor_regression_branch(self):
        from extdm_tpu.models.lfae import RegionPredictor

        model = RegionPredictor(num_regions=3, block_expansion=8, max_features=16,
                                num_blocks=2, scale_factor=1.0, pca_based=False,
                                estimate_affine=True, pad=3)
        x = jnp.asarray(np.random.RandomState(2).rand(1, 32, 32, 3), jnp.float32)
        variables = model.init({"params": jax.random.PRNGKey(0)}, x)
        out, _ = model.apply(variables, x, mutable=["batch_stats"])
        assert out["affine"].shape == (1, 3, 2, 2)
        # zero-init jacobian head with identity bias -> affine == I at init
        np.testing.assert_allclose(
            np.asarray(out["affine"]), np.tile(np.eye(2, dtype=np.float32), (1, 3, 1, 1)),
            atol=1e-5,
        )
        np.testing.assert_allclose(
            np.asarray(out["covar"]), np.tile(np.eye(2, dtype=np.float32), (1, 3, 1, 1)),
            atol=1e-5,
        )


class TestFourier:
    def test_fourier_encoding(self):
        from extdm_tpu.models.dm.fourier import FourierEncoding3D

        m = FourierEncoding3D(num_frequencies=4)
        x = jnp.asarray(np.random.RandomState(3).randn(1, 3, 8, 8, 16), jnp.float32)
        v = m.init(jax.random.PRNGKey(0), x)
        out = m.apply(v, x)
        assert out.shape == x.shape
        assert np.isfinite(np.asarray(out)).all()
