"""LFAE model tests: shapes, jit-compilability, and semantic invariants.

(The reference ships no pretrained checkpoints in this snapshot —
.MISSING_LARGE_BLOBS — so parity is pinned at the op level in test_ops.py
and at the semantics level here.)
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from extdm_tpu.models.lfae import (
    BGMotionPredictor,
    Generator,
    PixelwiseFlowPredictor,
    ReconstructionModel,
    RegionPredictor,
)
from extdm_tpu.models.lfae import transform as tps

KTH_GEN_CFG = dict(
    block_expansion=16,  # scaled down from 64 for test speed
    max_features=64,
    num_down_blocks=2,
    num_bottleneck_blocks=2,
    skips=True,
    pixelwise_flow_predictor_params=dict(
        block_expansion=16,
        max_features=64,
        num_blocks=2,
        scale_factor=0.5,
        use_deformed_source=True,
        use_covar_heatmap=True,
        estimate_occlusion_map=True,
    ),
)


@pytest.fixture(scope="module")
def rngs():
    return {"params": jax.random.PRNGKey(0)}


class TestRegionPredictor:
    def test_shapes_and_values(self, rngs):
        model = RegionPredictor(num_regions=5, block_expansion=8, max_features=32,
                                num_blocks=2, scale_factor=0.5, pad=0)
        x = jnp.asarray(np.random.RandomState(0).rand(2, 64, 64, 3), jnp.float32)
        params = model.init(rngs, x)
        out, _ = model.apply(params, x, mutable=["batch_stats"])
        assert out["shift"].shape == (2, 5, 2)
        assert out["covar"].shape == (2, 5, 2, 2)
        assert out["affine"].shape == (2, 5, 2, 2)
        # shift is a softmax-weighted mean of a [-1,1] grid
        assert np.all(np.abs(np.asarray(out["shift"])) <= 1.0)
        # affine @ affine^T == covar (the defining property of the sqrt)
        covar = np.asarray(out["covar"])
        affine = np.asarray(out["affine"])
        np.testing.assert_allclose(affine @ affine.transpose(0, 1, 3, 2), covar, atol=1e-5)
        # heatmaps sum to 1 over space
        hm = np.asarray(out["heatmap"])
        np.testing.assert_allclose(hm.sum(axis=(1, 2)), 1.0, atol=1e-5)


class TestBGPredictor:
    @pytest.mark.parametrize("bg_type", ["zero", "shift", "affine", "perspective"])
    def test_identity_at_init(self, rngs, bg_type):
        model = BGMotionPredictor(block_expansion=8, max_features=32, num_blocks=2, bg_type=bg_type)
        s = jnp.zeros((2, 32, 32, 3))
        d = jnp.zeros((2, 32, 32, 3))
        params = model.init(rngs, s, d)
        out, _ = model.apply(params, s, d, mutable=["batch_stats"])
        assert out.shape == (2, 3, 3)
        # zero-init fc head -> exact identity transform at init
        np.testing.assert_allclose(np.asarray(out), np.tile(np.eye(3), (2, 1, 1)), atol=1e-6)


class TestPixelwiseFlow:
    def test_shapes(self, rngs):
        K = 4
        model = PixelwiseFlowPredictor(
            num_regions=K, block_expansion=8, max_features=32, num_blocks=2,
            scale_factor=0.5, use_covar_heatmap=True, estimate_occlusion_map=True,
            revert_axis_swap=True,
        )
        src = jnp.asarray(np.random.RandomState(1).rand(2, 32, 32, 3), jnp.float32)
        rp = {
            "shift": jnp.zeros((2, K, 2)),
            "covar": jnp.tile(jnp.eye(2) * 0.01, (2, K, 1, 1)),
            "affine": jnp.tile(jnp.eye(2) * 0.1, (2, K, 1, 1)),
        }
        params = model.init(rngs, src, rp, rp)
        out, _ = model.apply(params, src, rp, rp, mutable=["batch_stats"])
        assert out["optical_flow"].shape == (2, 16, 16, 2)
        assert out["occlusion_map"].shape == (2, 16, 16, 1)
        occ = np.asarray(out["occlusion_map"])
        assert occ.min() >= 0 and occ.max() <= 1

    def test_identity_motion_gives_identity_grid_mask_mix(self, rngs):
        # With identical source/driving params and identity bg, every sparse
        # motion is the identity grid, so the mask-combined flow is identity.
        from extdm_tpu.ops.coords import make_coordinate_grid

        K = 3
        model = PixelwiseFlowPredictor(
            num_regions=K, block_expansion=8, max_features=32, num_blocks=2,
            scale_factor=1.0, use_covar_heatmap=True,
        )
        src = jnp.asarray(np.random.RandomState(2).rand(1, 16, 16, 3), jnp.float32)
        rp = {
            "shift": jnp.zeros((1, K, 2)),
            "covar": jnp.tile(jnp.eye(2) * 0.01, (1, K, 1, 1)),
            "affine": jnp.tile(jnp.eye(2) * 0.1, (1, K, 1, 1)),
        }
        params = model.init(rngs, src, rp, rp)
        out, _ = model.apply(params, src, rp, rp, mutable=["batch_stats"])
        ident = np.asarray(make_coordinate_grid(16, 16))
        np.testing.assert_allclose(np.asarray(out["optical_flow"][0]), ident, atol=1e-4)


class TestGenerator:
    def test_full_forward(self, rngs):
        model = Generator(num_regions=4, **KTH_GEN_CFG)
        src = jnp.asarray(np.random.RandomState(3).rand(2, 64, 64, 3), jnp.float32)
        rp = {
            "shift": jnp.zeros((2, 4, 2)),
            "covar": jnp.tile(jnp.eye(2) * 0.01, (2, 4, 1, 1)),
            "affine": jnp.tile(jnp.eye(2) * 0.1, (2, 4, 1, 1)),
        }
        bg = jnp.tile(jnp.eye(3), (2, 1, 1))
        variables = model.init(rngs, src, rp, rp, bg)
        out, _ = model.apply(variables, src, rp, rp, bg, mutable=["batch_stats"])
        assert out["prediction"].shape == (2, 64, 64, 3)
        assert out["optical_flow"].shape == (2, 32, 32, 2)
        assert out["occlusion_map"].shape == (2, 32, 32, 1)
        assert out["bottle_neck_feat"].shape == (2, 16, 16, 64)
        p = np.asarray(out["prediction"])
        assert np.isfinite(p).all()

    def test_flow_decode_path(self, rngs):
        model = Generator(num_regions=4, **KTH_GEN_CFG)
        src = jnp.asarray(np.random.RandomState(4).rand(1, 64, 64, 3), jnp.float32)
        rp = {
            "shift": jnp.zeros((1, 4, 2)),
            "covar": jnp.tile(jnp.eye(2) * 0.01, (1, 4, 1, 1)),
            "affine": jnp.tile(jnp.eye(2) * 0.1, (1, 4, 1, 1)),
        }
        variables = model.init(rngs, src, rp, rp, jnp.tile(jnp.eye(3), (1, 1, 1)))
        from extdm_tpu.ops.coords import make_coordinate_grid

        # full-res identity flow: avoids the (correct, reference-matching)
        # half-pixel boundary effect of resizing a 32x32 grid to 64x64.
        flow = jnp.broadcast_to(make_coordinate_grid(64, 64)[None], (1, 64, 64, 2))
        occ = jnp.ones((1, 32, 32, 1))
        out, _ = model.apply(
            variables, src, mode="flow", optical_flow=flow, occlusion_map=occ,
            mutable=["batch_stats"],
        )
        assert out["prediction"].shape == (1, 64, 64, 3)
        # identity flow + full-confidence occlusion => deformed == source
        np.testing.assert_allclose(np.asarray(out["deformed"]), np.asarray(src), atol=1e-5)

    def test_encode_feats_decode_matches_flow(self, rngs):
        """mode='encode_feats' + mode='flow_decode' must reproduce mode='flow'
        exactly (the encoder is flow-independent, so hoisting it out of the
        per-frame decode is a pure restructuring)."""
        model = Generator(num_regions=4, **KTH_GEN_CFG)
        rs = np.random.RandomState(6)
        src = jnp.asarray(rs.rand(1, 64, 64, 3), jnp.float32)
        rp = {
            "shift": jnp.zeros((1, 4, 2)),
            "covar": jnp.tile(jnp.eye(2) * 0.01, (1, 4, 1, 1)),
            "affine": jnp.tile(jnp.eye(2) * 0.1, (1, 4, 1, 1)),
        }
        variables = model.init(rngs, src, rp, rp, jnp.tile(jnp.eye(3), (1, 1, 1)))
        flow = jnp.asarray(rs.uniform(-1, 1, (1, 32, 32, 2)), jnp.float32)
        occ = jnp.asarray(rs.rand(1, 32, 32, 1), jnp.float32)
        ref, _ = model.apply(
            variables, src, mode="flow", optical_flow=flow, occlusion_map=occ,
            mutable=["batch_stats"],
        )
        enc, _ = model.apply(variables, src, mode="encode_feats", mutable=["batch_stats"])
        out, _ = model.apply(
            variables, src, mode="flow_decode", optical_flow=flow, occlusion_map=occ,
            feat=enc["feat"], skips=enc["skips"], mutable=["batch_stats"],
        )
        np.testing.assert_array_equal(
            np.asarray(out["prediction"]), np.asarray(ref["prediction"])
        )

    def test_encode_flow_matches_full(self, rngs):
        model = Generator(num_regions=4, **KTH_GEN_CFG)
        src = jnp.asarray(np.random.RandomState(5).rand(1, 64, 64, 3), jnp.float32)
        rp_s = {
            "shift": jnp.zeros((1, 4, 2)),
            "covar": jnp.tile(jnp.eye(2) * 0.01, (1, 4, 1, 1)),
            "affine": jnp.tile(jnp.eye(2) * 0.1, (1, 4, 1, 1)),
        }
        rp_d = {
            "shift": jnp.full((1, 4, 2), 0.1),
            "covar": jnp.tile(jnp.eye(2) * 0.02, (1, 4, 1, 1)),
            "affine": jnp.tile(jnp.eye(2) * 0.14, (1, 4, 1, 1)),
        }
        bg = jnp.tile(jnp.eye(3), (1, 1, 1))
        variables = model.init(rngs, src, rp_s, rp_s, bg)
        full, _ = model.apply(variables, src, rp_d, rp_s, bg, mutable=["batch_stats"])
        enc, _ = model.apply(variables, src, rp_d, rp_s, bg, mode="encode_flow",
                             mutable=["batch_stats"])
        np.testing.assert_allclose(
            np.asarray(enc["optical_flow"]), np.asarray(full["optical_flow"]), atol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(enc["occlusion_map"]), np.asarray(full["occlusion_map"]), atol=1e-6
        )


class TestTPS:
    def test_identity_transform(self):
        t = tps.TPSTransform(jnp.tile(jnp.eye(2, 3)[None], (2, 1, 1)), None, None)
        coords = jnp.asarray(np.random.RandomState(6).randn(2, 10, 2), jnp.float32)
        np.testing.assert_allclose(
            np.asarray(tps.warp_coordinates(t, coords)), np.asarray(coords), atol=1e-6
        )
        jac = tps.jacobian(t, coords)
        np.testing.assert_allclose(
            np.asarray(jac), np.tile(np.eye(2, dtype=np.float32), (2, 10, 1, 1)), atol=1e-6
        )

    def test_affine_jacobian(self):
        key = jax.random.PRNGKey(0)
        t = tps.random_tps(key, 3, sigma_affine=0.05)
        coords = jnp.asarray(np.random.RandomState(7).randn(3, 5, 2), jnp.float32)
        jac = np.asarray(tps.jacobian(t, coords))
        expected = np.asarray(t.theta)[:, None, :, :2]
        np.testing.assert_allclose(jac, np.broadcast_to(expected, jac.shape), atol=1e-5)

    def test_tps_frame_shape(self):
        key = jax.random.PRNGKey(1)
        t = tps.random_tps(key, 2, sigma_affine=0.05, sigma_tps=0.005, points_tps=5)
        frame = jnp.asarray(np.random.RandomState(8).rand(2, 32, 32, 3), jnp.float32)
        out = tps.transform_frame(t, frame)
        assert out.shape == frame.shape
        assert np.isfinite(np.asarray(out)).all()


class TestReconstructionModel:
    def test_losses(self):
        model = ReconstructionModel(
            region_predictor_cfg=dict(block_expansion=8, max_features=32, num_blocks=2,
                                      scale_factor=0.5, pad=0),
            bg_predictor_cfg=dict(block_expansion=8, max_features=32, num_blocks=2,
                                  bg_type="affine"),
            generator_cfg=KTH_GEN_CFG,
            num_regions=4,
            loss_weights=dict(perceptual=[1, 1, 1, 1, 1], equivariance_shift=10,
                              equivariance_affine=10, reconstruction=1),
            transform_params=dict(sigma_affine=0.05, sigma_tps=0.005, points_tps=5),
            scales=(1.0, 0.5),
        )
        batch = {
            "source": jnp.asarray(np.random.RandomState(9).rand(2, 64, 64, 3), jnp.float32),
            "driving": jnp.asarray(np.random.RandomState(10).rand(2, 64, 64, 3), jnp.float32),
        }
        variables = model.init(
            {"params": jax.random.PRNGKey(0), "tps": jax.random.PRNGKey(1)}, batch
        )
        (losses, generated), _ = model.apply(
            variables, batch, rngs={"tps": jax.random.PRNGKey(2)}, mutable=["batch_stats"]
        )
        for name in ["perceptual", "equivariance_shift", "equivariance_affine", "reconstruction"]:
            assert name in losses, name
            val = float(losses[name])
            assert np.isfinite(val) and val >= 0
