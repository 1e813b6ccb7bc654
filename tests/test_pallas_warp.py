"""Parity tests for the fused one-hot-matmul grid_sample kernel
(interpret mode on CPU) against the gather-based XLA reference."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from extdm_tpu.ops import pallas_warp
from extdm_tpu.ops.warp import grid_sample_xla


def _rand_case(rs, B, H, W, C, Ho=None, Wo=None, spread=1.4):
    Ho = Ho or H
    Wo = Wo or W
    img = jnp.asarray(rs.rand(B, H, W, C), jnp.float32)
    # spread > 1 pushes a good fraction of samples out of range to
    # exercise the padding behavior
    grid = jnp.asarray(rs.uniform(-spread, spread, (B, Ho, Wo, 2)), jnp.float32)
    return img, grid


class TestFusedGridSample:
    @pytest.mark.parametrize("mode", ["zeros", "border", "reflection"])
    def test_matches_xla_small(self, mode):
        rs = np.random.RandomState(0)
        img, grid = _rand_case(rs, 3, 16, 8, 3)
        out = pallas_warp.grid_sample(img, grid, mode, interpret=True)
        ref = grid_sample_xla(img, grid, mode)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)

    def test_matches_xla_lfae_shapes(self):
        # the two hot shapes: K+1 sparse warps and the decode skip warp
        rs = np.random.RandomState(1)
        for (B, H, W, C) in [(22, 32, 32, 3), (4, 64, 64, 64)]:
            img, grid = _rand_case(rs, B, H, W, C)
            out = pallas_warp.grid_sample(img, grid, "zeros", interpret=True)
            ref = grid_sample_xla(img, grid, "zeros")
            np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                       rtol=1e-5, atol=1e-5)

    def test_identity_grid_exact(self):
        from extdm_tpu.ops.coords import make_coordinate_grid

        rs = np.random.RandomState(2)
        img = jnp.asarray(rs.rand(2, 16, 16, 4), jnp.float32)
        grid = jnp.broadcast_to(make_coordinate_grid(16, 16)[None], (2, 16, 16, 2))
        out = pallas_warp.grid_sample(img, grid, "zeros", interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-6)

    def test_grid_resolution_differs(self):
        rs = np.random.RandomState(3)
        img, grid = _rand_case(rs, 2, 32, 32, 5, Ho=16, Wo=16)
        out = pallas_warp.grid_sample(img, grid, "zeros", interpret=True)
        ref = grid_sample_xla(img, grid, "zeros")
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)

    @pytest.mark.parametrize("bwd", ["0", "1"])
    @pytest.mark.parametrize("mode", ["zeros", "border", "reflection"])
    def test_grad_matches_xla(self, mode, bwd, monkeypatch):
        monkeypatch.setenv("EXTDM_PALLAS_WARP_BWD", bwd)
        rs = np.random.RandomState(4)
        img, grid = _rand_case(rs, 2, 8, 8, 3, spread=1.1)
        # non-uniform cotangent so d_grid exercises every weight path
        w = jnp.asarray(rs.rand(2, 8, 8, 3), jnp.float32)

        def f_fused(im, gr):
            return (w * pallas_warp.grid_sample(im, gr, mode, interpret=True)).sum()

        def f_ref(im, gr):
            return (w * grid_sample_xla(im, gr, mode)).sum()

        gi_f, gg_f = jax.grad(f_fused, argnums=(0, 1))(img, grid)
        gi_r, gg_r = jax.grad(f_ref, argnums=(0, 1))(img, grid)
        np.testing.assert_allclose(np.asarray(gi_f), np.asarray(gi_r),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(gg_f), np.asarray(gg_r),
                                   rtol=1e-4, atol=1e-4)

    def test_grad_matches_xla_lfae_shape(self):
        # the AE-training hot shape family (32x32 sparse warps), pallas bwd
        rs = np.random.RandomState(5)
        img, grid = _rand_case(rs, 3, 32, 32, 3)

        def f_fused(im, gr):
            return jnp.sin(pallas_warp.grid_sample(im, gr, "zeros",
                                                   interpret=True)).sum()

        def f_ref(im, gr):
            return jnp.sin(grid_sample_xla(im, gr, "zeros")).sum()

        gi_f, gg_f = jax.grad(f_fused, argnums=(0, 1))(img, grid)
        gi_r, gg_r = jax.grad(f_ref, argnums=(0, 1))(img, grid)
        np.testing.assert_allclose(np.asarray(gi_f), np.asarray(gi_r),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(gg_f), np.asarray(gg_r),
                                   rtol=1e-4, atol=1e-4)

    def test_supported_gate(self):
        # W must be a power of two and S a multiple of 128
        assert pallas_warp.supported((2, 32, 32, 3), (2, 32, 32, 2))
        assert not pallas_warp.supported((2, 24, 24, 3), (2, 24, 24, 2))
        assert not pallas_warp.supported((2, 8, 8, 3), (2, 8, 8, 2))
        # S=256 stays on the XLA path (overhead-bound in the kernel)
        assert not pallas_warp.supported((2, 16, 16, 256), (2, 16, 16, 2))

    def test_dispatch_on_cpu_uses_xla(self):
        # enabled() must be False on CPU so grid_sample never touches pallas
        assert not pallas_warp.enabled()
