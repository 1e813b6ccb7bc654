"""Parity tests for core ops against torch-CPU functional semantics.

These pin the #1 numerical-parity risks called out in SURVEY.md §7:
grid_sample (align_corners=True), bilinear/nearest interpolate, antialias
downsample, the 2x2 SVD-sqrt, and the coordinate/gaussian helpers.
"""
import numpy as np
import pytest
import torch
import torch.nn.functional as tF

import jax.numpy as jnp

from extdm_tpu import ops


def _rand(*shape, seed=0):
    rng = np.random.RandomState(seed)
    return rng.randn(*shape).astype(np.float32)


class TestGridSample:
    @pytest.mark.parametrize("padding", ["zeros", "reflection", "border"])
    def test_matches_torch(self, padding):
        img = _rand(2, 7, 9, 3, seed=1)
        grid = np.clip(_rand(2, 5, 6, 2, seed=2) * 0.8, -1.6, 1.6).astype(np.float32)

        out = ops.grid_sample(jnp.asarray(img), jnp.asarray(grid), padding_mode=padding)

        timg = torch.from_numpy(img).permute(0, 3, 1, 2)
        tgrid = torch.from_numpy(grid)
        ref = tF.grid_sample(timg, tgrid, align_corners=True, padding_mode=padding)
        ref = ref.permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-5, atol=1e-5)

    def test_identity_grid(self):
        img = _rand(1, 8, 8, 2, seed=3)
        grid = np.asarray(ops.make_coordinate_grid(8, 8))[None]
        out = ops.grid_sample(jnp.asarray(img), jnp.asarray(grid))
        np.testing.assert_allclose(np.asarray(out), img, rtol=1e-5, atol=1e-5)


class TestInterpolate:
    @pytest.mark.parametrize("size", [(8, 8), (3, 5), (16, 12)])
    def test_bilinear_matches_torch(self, size):
        x = _rand(2, 6, 7, 4, seed=4)
        out = ops.interpolate_bilinear(jnp.asarray(x), size)
        ref = tF.interpolate(torch.from_numpy(x).permute(0, 3, 1, 2), size=size, mode="bilinear")
        ref = ref.permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-5)

    @pytest.mark.parametrize("size", [(8, 8), (3, 5)])
    def test_bilinear_align_corners_matches_torch(self, size):
        x = _rand(2, 6, 7, 4, seed=5)
        out = ops.interpolate_bilinear(jnp.asarray(x), size, align_corners=True)
        ref = tF.interpolate(
            torch.from_numpy(x).permute(0, 3, 1, 2), size=size, mode="bilinear", align_corners=True
        )
        ref = ref.permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-5)

    def test_nearest_upsample(self):
        x = _rand(1, 4, 4, 2, seed=6)
        out = ops.upsample_nearest(jnp.asarray(x), 2)
        ref = tF.interpolate(torch.from_numpy(x).permute(0, 3, 1, 2), scale_factor=2)
        ref = ref.permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-6, atol=1e-6)

    def test_avg_pool(self):
        x = _rand(2, 8, 6, 3, seed=7)
        out = ops.avg_pool_2x2(jnp.asarray(x))
        ref = tF.avg_pool2d(torch.from_numpy(x).permute(0, 3, 1, 2), 2)
        ref = ref.permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-5, atol=1e-6)


class TestAntialias:
    @pytest.mark.parametrize("scale", [0.5, 0.25])
    def test_matches_reference_semantics(self, scale):
        # Reference: pad (ka, kb), depthwise gaussian conv, then [::1/scale].
        x = _rand(2, 16, 16, 3, seed=8)
        out = ops.antialias_downsample(jnp.asarray(x), scale)

        k1 = ops.gaussian_kernel_1d(scale)
        k2 = np.outer(k1, k1)
        k2 = (k2 / k2.sum()).astype(np.float32)
        ksize = k2.shape[0]
        ka = ksize // 2
        kb = ka - 1 if ksize % 2 == 0 else ka
        tx = torch.from_numpy(x).permute(0, 3, 1, 2)
        weight = torch.from_numpy(k2)[None, None].repeat(3, 1, 1, 1)
        padded = tF.pad(tx, (ka, kb, ka, kb))
        ref = tF.conv2d(padded, weight, groups=3)
        stride = int(round(1 / scale))
        ref = ref[:, :, ::stride, ::stride].permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-5)

    def test_identity(self):
        x = jnp.asarray(_rand(1, 4, 4, 1))
        assert ops.antialias_downsample(x, 1.0) is x


class TestEigh2x2:
    def test_sqrt_matches_torch_svd(self):
        rng = np.random.RandomState(9)
        m = rng.randn(64, 2, 2).astype(np.float32)
        covar = m @ m.transpose(0, 2, 1) + 0.01 * np.eye(2, dtype=np.float32)

        sqrt = np.asarray(ops.sqrt_symmetric_2x2(jnp.asarray(covar)))
        # The defining property: sqrt @ sqrt^T == covar (sign conventions of
        # the eigenvectors may differ from LAPACK; products are invariant).
        np.testing.assert_allclose(sqrt @ sqrt.transpose(0, 2, 1), covar, rtol=1e-3, atol=1e-4)

        u, s = ops.eigh_2x2(jnp.asarray(covar))
        _, s_ref, _ = torch.svd(torch.from_numpy(covar))
        np.testing.assert_allclose(np.asarray(s), s_ref.numpy(), rtol=1e-3, atol=1e-4)

    def test_grad_finite_on_degenerate(self):
        import jax

        covar = jnp.eye(2)[None] * 0.5  # equal eigenvalues

        def f(c):
            return jnp.sum(ops.sqrt_symmetric_2x2(c))

        g = jax.grad(f)(covar)
        assert np.all(np.isfinite(np.asarray(g)))

    def test_inv(self):
        rng = np.random.RandomState(10)
        m = rng.randn(32, 2, 2).astype(np.float32) + 2 * np.eye(2, dtype=np.float32)
        inv = np.asarray(ops.inv_2x2(jnp.asarray(m)))
        np.testing.assert_allclose(inv @ m, np.tile(np.eye(2, dtype=np.float32), (32, 1, 1)), atol=1e-4)


class TestCoords:
    def test_grid_matches_reference(self):
        # reference make_coordinate_grid: x = 2*(i/(w-1))-1 along width
        g = np.asarray(ops.make_coordinate_grid(3, 5))
        assert g.shape == (3, 5, 2)
        np.testing.assert_allclose(g[0, :, 0], np.linspace(-1, 1, 5), atol=1e-6)
        np.testing.assert_allclose(g[:, 0, 1], np.linspace(-1, 1, 3), atol=1e-6)

    def test_region2gaussian_isotropic(self):
        center = jnp.zeros((2, 4, 2))
        out = ops.region2gaussian(center, 0.01, (16, 16))
        assert out.shape == (2, 4, 16, 16)
        out = np.asarray(out)
        # peak at the center of the grid
        assert abs(out[0, 0].max() - out[0, 0, 7:9, 7:9].max()) < 1e-6

    def test_region2gaussian_covar_matches_formula(self):
        rng = np.random.RandomState(11)
        center = rng.uniform(-0.5, 0.5, size=(1, 2, 2)).astype(np.float32)
        m = rng.randn(1, 2, 2, 2).astype(np.float32) * 0.1
        covar = m @ m.transpose(0, 1, 3, 2) + 0.05 * np.eye(2, dtype=np.float32)
        out = np.asarray(ops.region2gaussian(jnp.asarray(center), jnp.asarray(covar), (8, 8)))

        grid = np.asarray(ops.make_coordinate_grid(8, 8))
        for k in range(2):
            diff = grid - center[0, k]
            inv = np.linalg.inv(covar[0, k])
            under = np.einsum("hwi,ij,hwj->hw", diff, inv, diff)
            np.testing.assert_allclose(out[0, k], np.exp(-0.5 * under), rtol=1e-4, atol=1e-5)

    def test_homogeneous_roundtrip(self):
        x = jnp.asarray(_rand(4, 7, 2, seed=12))
        np.testing.assert_allclose(
            np.asarray(ops.from_homogeneous(ops.to_homogeneous(x))), np.asarray(x), rtol=1e-5, atol=1e-6
        )
