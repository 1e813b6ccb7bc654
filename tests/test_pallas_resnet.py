"""Parity tests for the fused ResnetBlock3d kernel (ops/pallas_resnet.py).

Interpret-mode kernel vs the pure-jnp reference and vs the flax module
path (ResnetBlock3d with the kernel gated off), on CPU in f32.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from extdm_tpu.models.dm.unet3d import ResnetBlock3d
from extdm_tpu.ops import pallas_resnet


def make_params(key, cin, cout, film, res):
    ks = jax.random.split(key, 8)
    p = dict(
        w1=jax.random.normal(ks[0], (1, 3, 3, cin, cout)) * 0.1,
        b1=jax.random.normal(ks[1], (cout,)) * 0.1,
        g1s=1.0 + 0.1 * jax.random.normal(ks[2], (cout,)),
        g1b=0.1 * jax.random.normal(ks[3], (cout,)),
        film=(jax.random.normal(ks[4], (2, 2 * cout)) * 0.2) if film else None,
        w2=jax.random.normal(ks[5], (1, 3, 3, cout, cout)) * 0.1,
        b2=jax.random.normal(ks[6], (cout,)) * 0.1,
        g2s=1.0 + 0.1 * jax.random.normal(ks[7], (cout,)),
        g2b=jnp.zeros((cout,)),
    )
    if res:
        p["wres"] = jax.random.normal(jax.random.PRNGKey(9), (cin, cout)) * 0.1
        p["bres"] = jax.random.normal(jax.random.PRNGKey(10), (cout,)) * 0.1
    else:
        p["wres"] = p["bres"] = None
    return p


@pytest.mark.parametrize("shape,cout,groups,film", [
    ((2, 3, 8, 8, 16), 16, 4, True),     # identity residual + FiLM
    ((2, 3, 8, 8, 16), 32, 8, True),     # res_conv projection
    ((1, 2, 4, 4, 24), 16, 8, False),    # no FiLM, tiny spatial
    ((1, 5, 4, 8, 16), 16, 4, True),     # H != W
])
def test_kernel_matches_reference(shape, cout, groups, film):
    cin = shape[-1]
    p = make_params(jax.random.PRNGKey(0), cin, cout, film,
                    res=cin != cout)
    if p["film"] is not None and p["film"].shape[0] != shape[0]:
        p["film"] = p["film"][: shape[0]]
    x = jax.random.normal(jax.random.PRNGKey(1), shape, jnp.float32)

    ref = pallas_resnet.resnet_block_reference(
        x, p["w1"], p["b1"], p["g1s"], p["g1b"], p["film"], p["w2"],
        p["b2"], p["g2s"], p["g2b"], p["wres"], p["bres"], groups=groups)
    out = pallas_resnet.fused_resnet_block(
        x, p["w1"], p["b1"], p["g1s"], p["g1b"], p["film"], p["w2"],
        p["b2"], p["g2s"], p["g2b"], p["wres"], p["bres"], groups=groups,
        interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_reference_matches_module():
    """The jnp reference (kernel semantics + vjp fallback) must equal the
    flax module path bit-for-bit up to f32 roundoff."""
    B, T, H, W, cin, cout = 2, 3, 8, 8, 16, 32
    mod = ResnetBlock3d(cout, 8, None)
    x = jax.random.normal(jax.random.PRNGKey(1), (B, T, H, W, cin),
                          jnp.float32)
    temb = jax.random.normal(jax.random.PRNGKey(2), (B, 24), jnp.float32)
    params = mod.init(jax.random.PRNGKey(0), x, temb)["params"]
    want = mod.apply({"params": params}, x, temb)

    import flax.linen as nn
    film = nn.Dense(2 * cout).apply(
        {"params": params["mlp"]}, nn.silu(temb))
    got = pallas_resnet.resnet_block_reference(
        x,
        params["block1"]["proj"]["Conv_0"]["kernel"],
        params["block1"]["proj"]["Conv_0"]["bias"],
        params["block1"]["norm"]["scale"], params["block1"]["norm"]["bias"],
        film,
        params["block2"]["proj"]["Conv_0"]["kernel"],
        params["block2"]["proj"]["Conv_0"]["bias"],
        params["block2"]["norm"]["scale"], params["block2"]["norm"]["bias"],
        params["res_conv"]["kernel"][0, 0, 0], params["res_conv"]["bias"],
        groups=8)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_grad_fallback():
    """custom_vjp backward (reference recompute) produces finite grads
    matching the reference's autodiff."""
    B, T, H, W, c = 1, 2, 4, 4, 16
    p = make_params(jax.random.PRNGKey(0), c, c, True, res=False)
    p["film"] = p["film"][:B]
    x = jax.random.normal(jax.random.PRNGKey(1), (B, T, H, W, c),
                          jnp.float32)

    def loss_fused(x, w1):
        return jnp.sum(pallas_resnet.fused_resnet_block(
            x, w1, p["b1"], p["g1s"], p["g1b"], p["film"], p["w2"],
            p["b2"], p["g2s"], p["g2b"], groups=4, interpret=True) ** 2)

    def loss_ref(x, w1):
        return jnp.sum(pallas_resnet.resnet_block_reference(
            x, w1, p["b1"], p["g1s"], p["g1b"], p["film"], p["w2"],
            p["b2"], p["g2s"], p["g2b"], None, None, groups=4) ** 2)

    gx, gw = jax.grad(loss_fused, argnums=(0, 1))(x, p["w1"])
    rx, rw = jax.grad(loss_ref, argnums=(0, 1))(x, p["w1"])
    np.testing.assert_allclose(np.asarray(gx), np.asarray(rx), rtol=1e-4,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(gw), np.asarray(rw), rtol=1e-4,
                               atol=1e-5)


def test_module_pallas_path_used(monkeypatch):
    """ResnetBlock3d routes through the kernel when enabled (interpret
    via monkeypatched impl) and produces the same values as the XLA path."""
    B, T, H, W, cin, cout = 2, 2, 4, 8, 16, 32
    mod = ResnetBlock3d(cout, 8, None)
    x = jax.random.normal(jax.random.PRNGKey(1), (B, T, H, W, cin),
                          jnp.float32)
    temb = jax.random.normal(jax.random.PRNGKey(2), (B, 24), jnp.float32)
    params = mod.init(jax.random.PRNGKey(0), x, temb)["params"]
    want = mod.apply({"params": params}, x, temb)

    calls = []
    orig = pallas_resnet._kernel_impl

    def spy_impl(x, w1, b1, g1s, g1b, film, w2, b2, g2s, g2b, wres, bres,
                 groups, eps, interpret):
        calls.append(1)
        return orig(x, w1, b1, g1s, g1b, film, w2, b2, g2s, g2b, wres,
                    bres, groups, eps, True)

    monkeypatch.setattr(pallas_resnet, "_kernel_impl", spy_impl)
    monkeypatch.setattr(pallas_resnet, "enabled", lambda: True)
    got = mod.apply({"params": params}, x, temb)
    assert calls, "pallas path was not taken"
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_inference_only_scope():
    with pallas_resnet.inference_only_scope():
        assert not pallas_resnet.enabled()


@pytest.mark.parametrize("shape,cout,groups,film", [
    ((2, 3, 8, 8, 16), 16, 4, True),     # identity residual + FiLM
    ((2, 3, 8, 8, 16), 32, 8, True),     # res_conv projection
    ((1, 2, 4, 4, 24), 16, 8, False),    # no FiLM, tiny spatial
    ((1, 5, 4, 8, 16), 16, 4, True),     # H != W
])
def test_bwd_kernel_matches_reference(shape, cout, groups, film):
    """Dedicated backward kernel (interpret) vs reference autodiff on
    EVERY gradient: dx + all weight/FiLM grads."""
    assert pallas_resnet.backward_kernel_enabled()
    cin = shape[-1]
    p = make_params(jax.random.PRNGKey(3), cin, cout, film, res=cin != cout)
    if p["film"] is not None and p["film"].shape[0] != shape[0]:
        p["film"] = p["film"][: shape[0]]
    x = jax.random.normal(jax.random.PRNGKey(4), shape, jnp.float32)
    names = [k for k in ("film", "w1", "b1", "g1s", "g1b", "w2", "b2",
                         "g2s", "g2b", "wres", "bres")
             if p[k] is not None]
    # weight the output so the cotangent isn't uniform
    gw = jax.random.normal(jax.random.PRNGKey(5),
                           shape[:-1] + (cout,), jnp.float32)

    def run(fn, x, args):
        q = dict(p)
        q.update(dict(zip(names, args)))
        out = fn(x, q["w1"], q["b1"], q["g1s"], q["g1b"], q["film"],
                 q["w2"], q["b2"], q["g2s"], q["g2b"], q["wres"],
                 q["bres"], groups=groups,
                 **({"interpret": True}
                    if fn is pallas_resnet.fused_resnet_block else {}))
        return jnp.sum(out * gw)

    args = [p[k] for k in names]
    gf = jax.grad(lambda x, a: run(pallas_resnet.fused_resnet_block, x, a),
                  argnums=(0, 1))(x, args)
    gr = jax.grad(lambda x, a: run(pallas_resnet.resnet_block_reference,
                                   x, a), argnums=(0, 1))(x, args)
    np.testing.assert_allclose(np.asarray(gf[0]), np.asarray(gr[0]),
                               rtol=2e-4, atol=2e-5, err_msg="dx")
    for name, a, b in zip(names, gf[1], gr[1]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5, err_msg=name)


def test_bwd_xla_fallback_env(monkeypatch):
    """EXTDM_PALLAS_RESNET_BWD=0 restores the XLA-recompute backward."""
    monkeypatch.setenv("EXTDM_PALLAS_RESNET_BWD", "0")
    assert not pallas_resnet.backward_kernel_enabled()
    B, T, H, W, c = 1, 2, 4, 4, 16
    p = make_params(jax.random.PRNGKey(0), c, c, True, res=False)
    p["film"] = p["film"][:B]
    x = jax.random.normal(jax.random.PRNGKey(1), (B, T, H, W, c),
                          jnp.float32)

    def loss(x):
        return jnp.sum(pallas_resnet.fused_resnet_block(
            x, p["w1"], p["b1"], p["g1s"], p["g1b"], p["film"], p["w2"],
            p["b2"], p["g2s"], p["g2b"], groups=4, interpret=True) ** 2)

    gx = jax.grad(loss)(x)
    assert np.isfinite(np.asarray(gx)).all()


@pytest.mark.parametrize("film", [True, False])
@pytest.mark.parametrize("res", [True, False])
def test_chunked_bwd_matches_reference(film, res, monkeypatch):
    """Decomposed big-S backward (conv kernels + XLA elementwise; VERDICT
    r3 #4) vs reference autodiff on every gradient. The whole-sample
    kernel is forced unsupported so the chunked path engages; the
    (B, nT) chunk split is exercised by making only T=2 frames fit."""
    monkeypatch.setenv("EXTDM_PALLAS_RESNET_CHUNKED", "1")  # opt-in path
    assert pallas_resnet.chunked_backward_enabled()
    # pretend whole-sample backward never fits
    monkeypatch.setattr(pallas_resnet, "_bwd_supported",
                        lambda *a, **k: False)
    # force a chunk split: cap the conv live set so _chunk_t picks tc < T
    shape = (2, 4, 4, 8, 16)
    cin, cout, groups = 16, 16 if not res else 24, 4
    real_chunk = pallas_resnet._chunk_t(shape[1], shape[2], shape[3],
                                        cin, cout)
    assert real_chunk == shape[1]  # sanity: normally whole T fits
    monkeypatch.setattr(pallas_resnet, "_chunk_t",
                        lambda T, H, W, ci, co: 2)
    p = make_params(jax.random.PRNGKey(3), cin, cout, film, res=res)
    if p["film"] is not None:
        p["film"] = p["film"][: shape[0]]
    x = jax.random.normal(jax.random.PRNGKey(4), shape, jnp.float32)
    gw = jax.random.normal(jax.random.PRNGKey(5),
                           shape[:-1] + (cout,), jnp.float32)
    names = [k for k in ("film", "w1", "b1", "g1s", "g1b", "w2", "b2",
                         "g2s", "g2b", "wres", "bres")
             if p[k] is not None]

    def run(fn, x, args):
        q = dict(p)
        q.update(dict(zip(names, args)))
        out = fn(x, q["w1"], q["b1"], q["g1s"], q["g1b"], q["film"],
                 q["w2"], q["b2"], q["g2s"], q["g2b"], q["wres"],
                 q["bres"], groups=groups,
                 **({"interpret": True}
                    if fn is pallas_resnet.fused_resnet_block else {}))
        return jnp.sum(out * gw)

    args = [p[k] for k in names]
    gf = jax.grad(lambda x, a: run(pallas_resnet.fused_resnet_block, x, a),
                  argnums=(0, 1))(x, args)
    gr = jax.grad(lambda x, a: run(pallas_resnet.resnet_block_reference,
                                   x, a), argnums=(0, 1))(x, args)
    np.testing.assert_allclose(np.asarray(gf[0]), np.asarray(gr[0]),
                               rtol=2e-4, atol=2e-5, err_msg="dx")
    for name, a, b in zip(names, gf[1], gr[1]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5, err_msg=name)
