"""Spatial (H-sharded) fused attention layers: shard_map + halo exchange.

Parity of `pallas_stw.spatial_shard_scope` routing against the single-
program fused kernels (interpret mode on the virtual CPU mesh):
  - plain STW windows: fully local per shard (no halo);
  - shifted STW windows: ppermute halo exchange for the H roll plus
    per-shard pre-expanded Swin mask blocks;
  - shard-unaligned H: all_gather fallback;
  - temporal attention: fully local per shard.

The single-program kernels themselves are parity-tested against the
module path in tests/test_pallas_stw.py; these tests prove the sharded
decomposition is exact relative to them.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh

from extdm_tpu.ops import pallas_stw

HEADS, DIM_HEAD = 2, 8
HIDDEN = HEADS * DIM_HEAD


def _mesh(devices, data=2, model=4):
    return Mesh(np.array(devices[: data * model]).reshape(data, model),
                ("data", "model"))


def _stw_inputs(B=2, T=4, H=16, W=8, C=16, seed=0):
    rng = np.random.RandomState(seed)
    arr = lambda *sh: jnp.asarray(rng.randn(*sh).astype(np.float32))
    x = arr(B, T, H, W, C)
    N = 2 * 4 * 4
    kw = dict(gamma=arr(C) * 0.2 + 1.0,
              w_qkv=arr(C, 3 * HIDDEN) * 0.1,
              w_proj=arr(HIDDEN, C) * 0.1,
              b_proj=arr(C) * 0.01,
              bias_hnn=arr(HEADS, N, N) * 0.05,
              window=(2, 4, 4), heads=HEADS, dim_head=DIM_HEAD)
    return x, kw


class TestSpatialSTW:
    @pytest.mark.parametrize("shift", [(0, 0, 0), (1, 2, 2)])
    def test_aligned_parity(self, devices, shift):
        """H=16 over 4 shards: HL=4 == window_h -> local / halo path."""
        mesh = _mesh(devices)
        x, kw = _stw_inputs()
        ref = pallas_stw.fused_stw_layer(x, shift=shift, interpret=True, **kw)
        with pallas_stw.spatial_shard_scope(mesh, interpret=True, force=True):
            out = pallas_stw.fused_stw_layer(x, shift=shift, **kw)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)

    def test_h_only_shift_masks(self, devices):
        """Shift only along H: the local kernel sees shift (0,0,0) but the
        wrap-window masks (owned by the last shard) must still apply."""
        mesh = _mesh(devices)
        x, kw = _stw_inputs(seed=1)
        shift = (0, 2, 0)
        ref = pallas_stw.fused_stw_layer(x, shift=shift, interpret=True, **kw)
        with pallas_stw.spatial_shard_scope(mesh, interpret=True, force=True):
            out = pallas_stw.fused_stw_layer(x, shift=shift, **kw)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)

    @pytest.mark.parametrize("shift", [(0, 0, 0), (1, 2, 2)])
    def test_unaligned_gather_fallback(self, devices, shift):
        """H=8 over 4 shards: HL=2 < window_h -> all_gather fallback."""
        mesh = _mesh(devices)
        x, kw = _stw_inputs(H=8, seed=2)
        ref = pallas_stw.fused_stw_layer(x, shift=shift, interpret=True, **kw)
        with pallas_stw.spatial_shard_scope(mesh, interpret=True, force=True):
            out = pallas_stw.fused_stw_layer(x, shift=shift, **kw)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)

    def test_batch_not_divisible(self, devices):
        """B=3 does not divide the data axis -> batch stays replicated."""
        mesh = _mesh(devices)
        x, kw = _stw_inputs(B=3, seed=3)
        ref = pallas_stw.fused_stw_layer(x, shift=(1, 2, 2), interpret=True,
                                         **kw)
        with pallas_stw.spatial_shard_scope(mesh, interpret=True, force=True):
            out = pallas_stw.fused_stw_layer(x, shift=(1, 2, 2), **kw)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)


class TestSpatialTemporal:
    def test_parity(self, devices):
        mesh = _mesh(devices)
        rng = np.random.RandomState(4)
        arr = lambda *sh: jnp.asarray(rng.randn(*sh).astype(np.float32))
        B, T, H, W, C = 2, 5, 16, 8, 16
        x = arr(B, T, H, W, C)
        kw = dict(gamma_cln=arr(C) * 0.2 + 1.0,
                  ln_scale=arr(C) * 0.1 + 1.0, ln_bias=arr(C) * 0.05,
                  w_qkv=arr(C, 3 * HIDDEN) * 0.1,
                  w_proj=arr(HIDDEN, C) * 0.1,
                  bias_hnn=arr(HEADS, T, T) * 0.05,
                  heads=HEADS, dim_head=DIM_HEAD)
        ref = pallas_stw.fused_temporal_layer(x, interpret=True, **kw)
        with pallas_stw.spatial_shard_scope(mesh, interpret=True, force=True):
            out = pallas_stw.fused_temporal_layer(x, **kw)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)


class TestScopeGate:
    def test_inactive_outside_scope(self):
        assert not pallas_stw.spatial_scope_active()

    def test_env_kill_switch(self, devices, monkeypatch):
        mesh = _mesh(devices)
        monkeypatch.setenv("EXTDM_SPATIAL_FUSED", "0")
        with pallas_stw.spatial_shard_scope(mesh, force=True):
            assert not pallas_stw.spatial_scope_active()

    def test_force_activates_on_cpu(self, devices):
        mesh = _mesh(devices)
        with pallas_stw.spatial_shard_scope(mesh, force=True):
            assert pallas_stw.spatial_scope_active()
