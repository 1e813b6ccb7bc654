"""bf16 compute-policy regression test.

flax norm layers with dtype=None promote bf16 activations with their f32
params, silently upcasting everything downstream (2x HBM per activation
pass and f32 matmuls inside the pallas attention kernels — measured as
f32 slabs in compiled HLO). This test walks every module output of a
bf16-configured Unet3D and asserts the stream stays bf16; norm-internal
f32 (statistics) and the final f32 output are the only exceptions.
"""
import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np


ALLOWED_F32_SUFFIXES = ("/norm",)  # norm submodules keep f32 stats internally


def _collect_f32(mods):
    leaks = []

    def walk(d, path):
        for k, v in d.items():
            if k == "__call__":
                for item in v:
                    for leaf in jax.tree_util.tree_leaves(item):
                        if (hasattr(leaf, "dtype") and leaf.dtype == jnp.float32
                                and getattr(leaf, "ndim", 0) >= 4):
                            leaks.append((path, tuple(leaf.shape)))
            elif isinstance(v, dict):
                walk(v, path + "/" + k)

    walk(mods["intermediates"], "")
    return leaks


def test_unet_bf16_stream_stays_bf16():
    from extdm_tpu.models.dm.unet3d import Unet3D

    unet = Unet3D(dim=16, dim_mults=(1, 2), window_size=(2, 2, 2),
                  attn_heads=2, attn_dim_head=4, cond_feature_dim=32,
                  cond_num=2, pred_num=2, remat=False, dtype=jnp.bfloat16)
    B, tc, tp, h = 1, 2, 2, 8
    x = jnp.zeros((B, tp, h, h, 3), jnp.float32)
    xc = jnp.zeros((B, tc, h, h, 3), jnp.float32)
    fea = jnp.zeros((B, tc + tp, 4, 4, 32), jnp.float32)
    t = jnp.zeros((B,), jnp.int32)
    vars_ = unet.init(jax.random.PRNGKey(0), x, t, xc, fea)
    out, mods = unet.apply(vars_, x, t, xc, fea, capture_intermediates=True)
    assert out.dtype == jnp.float32  # final output intentionally f32

    bad = [(p, s) for p, s in _collect_f32(mods)
           if p and not p.endswith(ALLOWED_F32_SUFFIXES)]
    assert not bad, f"f32 leaked into the bf16 stream at: {bad}"


def test_unet_f32_config_unchanged():
    # with dtype=None everything stays f32 (the parity-test configuration)
    from extdm_tpu.models.dm.unet3d import Unet3D

    unet = Unet3D(dim=16, dim_mults=(1, 2), window_size=(2, 2, 2),
                  attn_heads=2, attn_dim_head=4, cond_feature_dim=32,
                  cond_num=2, pred_num=2, remat=False, dtype=None)
    B, tc, tp, h = 1, 2, 2, 8
    x = jnp.asarray(np.random.RandomState(0).rand(B, tp, h, h, 3), jnp.float32)
    xc = jnp.asarray(np.random.RandomState(1).rand(B, tc, h, h, 3), jnp.float32)
    fea = jnp.asarray(np.random.RandomState(2).rand(B, tc + tp, 4, 4, 32), jnp.float32)
    t = jnp.zeros((B,), jnp.int32)
    vars_ = unet.init(jax.random.PRNGKey(0), x, t, xc, fea)
    out = unet.apply(vars_, x, t, xc, fea)
    assert out.dtype == jnp.float32
    assert np.isfinite(np.asarray(out)).all()
