"""Parity tests for the fused whole-layer STW kernel (ops/pallas_stw.py).

Runs the pallas kernel in interpret mode on CPU against both the pure-jnp
reference function and the unfused PreNormSTW module path.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from extdm_tpu.models.dm.unet3d import PreNormSTW
from extdm_tpu.nn.attention import _relative_position_index
from extdm_tpu.ops import pallas_stw


def make_params(key, C, heads, dim_head, table_window):
    wd, wh, ww = table_window
    ks = jax.random.split(key, 5)
    hidden = heads * dim_head
    return dict(
        gamma=jax.random.normal(ks[0], (C,)) * 0.1 + 1.0,
        w_qkv=jax.random.normal(ks[1], (C, 3 * hidden)) * 0.05,
        w_proj=jax.random.normal(ks[2], (hidden, C)) * 0.05,
        b_proj=jax.random.normal(ks[3], (C,)) * 0.05,
        table=jax.random.normal(
            ks[4], ((2 * wd - 1) * (2 * wh - 1) * (2 * ww - 1), heads)) * 0.02,
    )


def bias_from_table(table, window, N, heads):
    rel = _relative_position_index(tuple(window))[:N, :N]
    bias = jnp.take(table, jnp.asarray(rel.reshape(-1)), axis=0)
    return jnp.transpose(bias.reshape(N, N, heads), (2, 0, 1))


@pytest.mark.parametrize("wm", ["0", "1"])
@pytest.mark.parametrize("shift", [(0, 0, 0), (2, 2, 2)])
@pytest.mark.parametrize("shape", [(2, 6, 8, 8, 32), (1, 4, 4, 8, 16)])
def test_fused_matches_reference(shape, shift, wm, monkeypatch):
    monkeypatch.setenv("EXTDM_STW_WINDOW_MAJOR", wm)
    window = (4, 4, 4)
    heads, dim_head = 4, 8
    B, T, H, W, C = shape
    key = jax.random.PRNGKey(0)
    p = make_params(key, C, heads, dim_head, window)
    x = jax.random.normal(jax.random.PRNGKey(1), shape, jnp.float32)

    from extdm_tpu.nn.attention import get_window_size

    win, sh = get_window_size((T, H, W), window, shift)
    N = win[0] * win[1] * win[2]
    bias = bias_from_table(p["table"], window, N, heads)

    ref = pallas_stw.stw_layer_reference(
        x, p["gamma"], p["w_qkv"], p["w_proj"], p["b_proj"], bias,
        *_mask_args(T, H, W, win, sh),
        window=win, shift=sh, heads=heads, dim_head=dim_head, rotary=True)
    out = pallas_stw.fused_stw_layer(
        x, p["gamma"], p["w_qkv"], p["w_proj"], p["b_proj"], bias,
        window=win, shift=sh, heads=heads, dim_head=dim_head, rotary=True,
        interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def _mask_args(T, H, W, window, shift):
    from extdm_tpu.nn.attention import _shifted_window_mask

    if not any(s > 0 for s in shift):
        return None, None
    Tp = -(-T // window[0]) * window[0]
    Hp = -(-H // window[1]) * window[1]
    Wp = -(-W // window[2]) * window[2]
    m = _shifted_window_mask(Tp, Hp, Wp, tuple(window), tuple(shift))
    flat = m.reshape(m.shape[0], -1)
    uniq, ids = np.unique(flat, axis=0, return_inverse=True)
    return (jnp.asarray(uniq.reshape(-1, m.shape[1], m.shape[2])),
            jnp.asarray(ids.astype(np.int32)))


@pytest.mark.parametrize("shift", [(0, 0, 0), (2, 2, 2)])
def test_reference_matches_module(shift):
    """The jnp reference (used for backward + parity) == PreNormSTW module."""
    window = (4, 4, 4)
    heads, dim_head = 4, 8
    B, T, H, W, C = 2, 6, 8, 8, 32
    x = jax.random.normal(jax.random.PRNGKey(2), (B, T, H, W, C), jnp.float32)
    mod = PreNormSTW(window, shift, heads, dim_head)
    variables = mod.init(jax.random.PRNGKey(3), x)
    out_mod = mod.apply(variables, x)

    p = variables["params"]
    attn = p["fn"]["attn"]
    from extdm_tpu.nn.attention import get_window_size

    win, sh = get_window_size((T, H, W), window, shift)
    N = win[0] * win[1] * win[2]
    bias = bias_from_table(attn["relative_position_bias_table"], window, N, heads)
    out_ref = pallas_stw.stw_layer_reference(
        x, p["norm"]["gamma"], attn["qkv"]["kernel"],
        attn["proj"]["Dense_0"]["kernel"], attn["proj"]["Dense_0"]["bias"],
        bias, *_mask_args(T, H, W, win, sh),
        window=win, shift=sh, heads=heads, dim_head=dim_head, rotary=True)
    np.testing.assert_allclose(np.asarray(out_mod), np.asarray(out_ref),
                               rtol=2e-4, atol=2e-4)


def test_fused_gradients_match():
    """custom_vjp (XLA-recompute backward) == autodiff of the reference."""
    window, shift = (2, 4, 4), (1, 2, 2)
    heads, dim_head = 2, 8
    B, T, H, W, C = 1, 4, 8, 8, 16
    p = make_params(jax.random.PRNGKey(4), C, heads, dim_head, window)
    x = jax.random.normal(jax.random.PRNGKey(5), (B, T, H, W, C), jnp.float32)
    N = window[0] * window[1] * window[2]
    bias = bias_from_table(p["table"], window, N, heads)
    margs = _mask_args(T, H, W, window, shift)

    def loss_fused(x, gamma, wq, wp, bp, b):
        return jnp.sum(pallas_stw.fused_stw_layer(
            x, gamma, wq, wp, bp, b, window=window, shift=shift,
            heads=heads, dim_head=dim_head, rotary=True, interpret=True) ** 2)

    def loss_ref(x, gamma, wq, wp, bp, b):
        return jnp.sum(pallas_stw.stw_layer_reference(
            x, gamma, wq, wp, bp, b, *margs, window=window, shift=shift,
            heads=heads, dim_head=dim_head, rotary=True) ** 2)

    args = (x, p["gamma"], p["w_qkv"], p["w_proj"], p["b_proj"], bias)
    g_fused = jax.grad(loss_fused, argnums=(0, 1, 2, 3, 4, 5))(*args)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4, 5))(*args)
    for a, b in zip(g_fused, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=5e-4)


def test_module_fused_path_param_tree_identical(monkeypatch):
    """Enabling the fused path must not change the flax param tree."""
    monkeypatch.setenv("EXTDM_PALLAS_STW", "1")
    x = jnp.zeros((1, 4, 8, 8, 16))
    mod = PreNormSTW((4, 4, 4), (2, 2, 2), 2, 8)
    v_off = mod.init(jax.random.PRNGKey(0), x)

    # force-enable despite CPU backend, run init through the fused branch
    import extdm_tpu.ops.pallas_stw as ps

    monkeypatch.setattr(ps, "enabled", lambda: True)
    orig = ps.fused_stw_layer

    def interp(*a, **kw):
        kw["interpret"] = True
        return orig(*a, **kw)

    monkeypatch.setattr(ps, "fused_stw_layer", interp)
    v_on = mod.init(jax.random.PRNGKey(0), x)
    t_off = jax.tree_util.tree_map(jnp.shape, v_off)
    t_on = jax.tree_util.tree_map(jnp.shape, v_on)
    assert t_off == t_on

    out_off = mod.apply(v_off, x + 0.1)
    out_on = mod.apply(v_on, x + 0.1)
    np.testing.assert_allclose(np.asarray(out_on), np.asarray(out_off),
                               rtol=2e-4, atol=2e-4)


# ---------------------------------------------------------------- temporal
from extdm_tpu.models.dm.unet3d import PreNormTemporalAttn


def _temporal_params(key, C, heads, dim_head):
    ks = jax.random.split(key, 5)
    hidden = heads * dim_head
    return dict(
        gamma_cln=jax.random.normal(ks[0], (C,)) * 0.1 + 1.0,
        ln_scale=jax.random.normal(ks[1], (C,)) * 0.1 + 1.0,
        ln_bias=jax.random.normal(ks[2], (C,)) * 0.1,
        w_qkv=jax.random.normal(ks[3], (C, 3 * hidden)) * 0.05,
        w_proj=jax.random.normal(ks[4], (hidden, C)) * 0.05,
    )


@pytest.mark.parametrize("shape", [(2, 6, 8, 8, 32), (1, 5, 4, 8, 16)])
def test_fused_temporal_matches_reference(shape):
    heads, dim_head = 4, 8
    B, T, H, W, C = shape
    p = _temporal_params(jax.random.PRNGKey(0), C, heads, dim_head)
    x = jax.random.normal(jax.random.PRNGKey(1), shape, jnp.float32)
    bias = jax.random.normal(jax.random.PRNGKey(2), (heads, T, T)) * 0.02

    ref = pallas_stw.temporal_layer_reference(
        x, p["gamma_cln"], p["ln_scale"], p["ln_bias"], p["w_qkv"],
        p["w_proj"], bias, heads=heads, dim_head=dim_head, rotary=True)
    out = pallas_stw.fused_temporal_layer(
        x, p["gamma_cln"], p["ln_scale"], p["ln_bias"], p["w_qkv"],
        p["w_proj"], bias, heads=heads, dim_head=dim_head, rotary=True,
        interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("bias_kind", ["3d", "4d", "none"])
def test_temporal_reference_matches_module(bias_kind):
    heads, dim_head = 4, 8
    B, T, H, W, C = 2, 5, 4, 4, 32
    x = jax.random.normal(jax.random.PRNGKey(3), (B, T, H, W, C), jnp.float32)
    mod = PreNormTemporalAttn(heads, dim_head)
    if bias_kind == "3d":
        pos_bias = jax.random.normal(jax.random.PRNGKey(4), (heads, T, T)) * 0.05
    elif bias_kind == "4d":
        pos_bias = jax.random.normal(jax.random.PRNGKey(4), (heads, T, T, T)) * 0.05
    else:
        pos_bias = None
    variables = mod.init(jax.random.PRNGKey(5), x, pos_bias)
    out_mod = mod.apply(variables, x, pos_bias)

    p = variables["params"]
    if pos_bias is None:
        bias_hnn = jnp.zeros((heads, T, T))
    elif pos_bias.ndim == 4:
        bias_hnn = jnp.broadcast_to(pos_bias.mean(axis=(-2, -1))[:, :, None],
                                    (heads, T, T))
    else:
        bias_hnn = pos_bias
    out_ref = pallas_stw.temporal_layer_reference(
        x, p["norm"]["gamma"], p["fn"]["norm"]["scale"], p["fn"]["norm"]["bias"],
        p["fn"]["attn"]["to_qkv"]["kernel"], p["fn"]["attn"]["to_out"]["kernel"],
        bias_hnn, heads=heads, dim_head=dim_head, rotary=True)
    np.testing.assert_allclose(np.asarray(out_mod), np.asarray(out_ref),
                               rtol=2e-4, atol=2e-4)


def test_temporal_module_fused_path_param_tree_identical(monkeypatch):
    x = jnp.ones((1, 5, 4, 4, 16)) * 0.3
    pos_bias = jnp.zeros((2, 5, 5))
    mod = PreNormTemporalAttn(2, 8)
    v_off = mod.init(jax.random.PRNGKey(0), x, pos_bias)

    import extdm_tpu.ops.pallas_stw as ps

    monkeypatch.setattr(ps, "enabled", lambda: True)
    orig = ps.fused_temporal_layer

    def interp(*a, **kw):
        kw["interpret"] = True
        return orig(*a, **kw)

    monkeypatch.setattr(ps, "fused_temporal_layer", interp)
    v_on = mod.init(jax.random.PRNGKey(0), x, pos_bias)
    assert jax.tree_util.tree_map(jnp.shape, v_on) == \
        jax.tree_util.tree_map(jnp.shape, v_off)
    out_on = mod.apply(v_on, x, pos_bias)
    out_off = mod.apply(v_off, x, pos_bias)
    np.testing.assert_allclose(np.asarray(out_on), np.asarray(out_off),
                               rtol=2e-4, atol=2e-4)


def test_fused_temporal_gradients_match():
    heads, dim_head = 2, 8
    B, T, H, W, C = 1, 4, 4, 4, 16
    p = _temporal_params(jax.random.PRNGKey(6), C, heads, dim_head)
    x = jax.random.normal(jax.random.PRNGKey(7), (B, T, H, W, C))
    bias = jax.random.normal(jax.random.PRNGKey(8), (heads, T, T)) * 0.02
    args = (x, p["gamma_cln"], p["ln_scale"], p["ln_bias"], p["w_qkv"],
            p["w_proj"], bias)

    def loss_fused(*a):
        return jnp.sum(pallas_stw.fused_temporal_layer(
            *a, heads=heads, dim_head=dim_head, rotary=True,
            interpret=True) ** 2)

    def loss_ref(*a):
        return jnp.sum(pallas_stw.temporal_layer_reference(
            *a, heads=heads, dim_head=dim_head, rotary=True) ** 2)

    g_fused = jax.grad(loss_fused, argnums=(0, 1, 2, 3, 4, 5, 6))(*args)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4, 5, 6))(*args)
    for a, b in zip(g_fused, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=5e-4)


def test_fused_gradients_match_unshifted_larger():
    """Backward kernel parity on an unshifted, multi-head, odd-T case."""
    window, shift = (4, 4, 4), (0, 0, 0)
    heads, dim_head = 4, 16
    B, T, H, W, C = 2, 6, 8, 8, 32
    p = make_params(jax.random.PRNGKey(9), C, heads, dim_head, window)
    x = jax.random.normal(jax.random.PRNGKey(10), (B, T, H, W, C))
    win, sh = window, shift
    N = win[0] * win[1] * win[2]
    bias = bias_from_table(p["table"], window, N, heads)
    margs = _mask_args(T, H, W, win, sh)

    def loss_fused(*a):
        return jnp.sum(pallas_stw.fused_stw_layer(
            *a, window=win, shift=sh, heads=heads, dim_head=dim_head,
            rotary=True, interpret=True) ** 3)

    def loss_ref(*a):
        return jnp.sum(pallas_stw.stw_layer_reference(
            *a, *margs, window=win, shift=sh, heads=heads,
            dim_head=dim_head, rotary=True) ** 3)

    args = (x, p["gamma"], p["w_qkv"], p["w_proj"], p["b_proj"], bias)
    g_fused = jax.grad(loss_fused, argnums=(0, 1, 2, 3, 4, 5))(*args)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4, 5))(*args)
    for a, b in zip(g_fused, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-3)


def test_fused_temporal_gradients_match_unpacked():
    """Temporal backward with a T too long to pack (G == 1)."""
    heads, dim_head = 2, 8
    B, T, H, W, C = 1, 40, 2, 4, 16
    p = _temporal_params(jax.random.PRNGKey(11), C, heads, dim_head)
    x = jax.random.normal(jax.random.PRNGKey(12), (B, T, H, W, C))
    bias = jax.random.normal(jax.random.PRNGKey(13), (heads, T, T)) * 0.02
    args = (x, p["gamma_cln"], p["ln_scale"], p["ln_bias"], p["w_qkv"],
            p["w_proj"], bias)

    def loss_fused(*a):
        return jnp.sum(pallas_stw.fused_temporal_layer(
            *a, heads=heads, dim_head=dim_head, rotary=True,
            interpret=True) ** 2)

    def loss_ref(*a):
        return jnp.sum(pallas_stw.temporal_layer_reference(
            *a, heads=heads, dim_head=dim_head, rotary=True) ** 2)

    g_fused = jax.grad(loss_fused, argnums=(0, 1, 4, 5, 6))(*args)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 4, 5, 6))(*args)
    for a, b in zip(g_fused, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=5e-4)


def test_fused_bf16_matches_f32_reference():
    """bf16 inputs (q/k/v stored bf16 since the VMEM-halving change) must
    track the f32 reference within bf16 noise."""
    window = (4, 4, 4)
    heads, dim_head = 4, 8
    B, T, H, W, C = 2, 6, 8, 8, 32
    p = make_params(jax.random.PRNGKey(0), C, heads, dim_head, window)
    x = jax.random.normal(jax.random.PRNGKey(1), (B, T, H, W, C), jnp.float32)

    from extdm_tpu.nn.attention import get_window_size

    win, sh = get_window_size((T, H, W), window, (2, 2, 2))
    N = win[0] * win[1] * win[2]
    bias = bias_from_table(p["table"], window, N, heads)

    ref = pallas_stw.stw_layer_reference(
        x, p["gamma"], p["w_qkv"], p["w_proj"], p["b_proj"], bias,
        *_mask_args(T, H, W, win, sh),
        window=win, shift=sh, heads=heads, dim_head=dim_head, rotary=True)
    out = pallas_stw.fused_stw_layer(
        x.astype(jnp.bfloat16), p["gamma"], p["w_qkv"], p["w_proj"],
        p["b_proj"], bias, window=win, shift=sh, heads=heads,
        dim_head=dim_head, rotary=True, interpret=True)
    assert out.dtype == jnp.bfloat16
    err = np.abs(np.asarray(out, np.float32) - np.asarray(ref))
    rel = err / (np.abs(np.asarray(ref)) + 1e-2)
    assert rel.max() < 0.1, rel.max()  # bf16 eps ~ 0.4% per op, chained


def test_fused_temporal_bf16_matches_f32_reference():
    heads, dim_head = 2, 8
    B, T, H, W, C = 1, 5, 4, 4, 16
    ks = jax.random.split(jax.random.PRNGKey(3), 7)
    gamma = jax.random.normal(ks[0], (C,)) * 0.1 + 1.0
    lns = jax.random.normal(ks[1], (C,)) * 0.1 + 1.0
    lnb = jax.random.normal(ks[2], (C,)) * 0.05
    w_qkv = jax.random.normal(ks[3], (C, 3 * heads * dim_head)) * 0.05
    w_proj = jax.random.normal(ks[4], (heads * dim_head, C)) * 0.05
    bias = jax.random.normal(ks[5], (heads, T, T)) * 0.1
    x = jax.random.normal(ks[6], (B, T, H, W, C), jnp.float32)

    ref = pallas_stw.temporal_layer_reference(
        x, gamma, lns, lnb, w_qkv, w_proj, bias,
        heads=heads, dim_head=dim_head, rotary=True)
    out = pallas_stw.fused_temporal_layer(
        x.astype(jnp.bfloat16), gamma, lns, lnb, w_qkv, w_proj, bias,
        heads=heads, dim_head=dim_head, rotary=True, interpret=True)
    assert out.dtype == jnp.bfloat16
    err = np.abs(np.asarray(out, np.float32) - np.asarray(ref))
    rel = err / (np.abs(np.asarray(ref)) + 1e-2)
    assert rel.max() < 0.1, rel.max()


@pytest.mark.parametrize("shift", [(0, 0, 0), (1, 2, 2)])
def test_fused_small_window_matches_reference(shift):
    """window (2,4,4) -> N=32 (traj_u12/u22 preset shape)."""
    window = (2, 4, 4)
    heads, dim_head = 4, 8
    B, T, H, W, C = 2, 6, 8, 8, 32
    p = make_params(jax.random.PRNGKey(0), C, heads, dim_head, window)
    x = jax.random.normal(jax.random.PRNGKey(1), (B, T, H, W, C), jnp.float32)

    from extdm_tpu.nn.attention import get_window_size

    win, sh = get_window_size((T, H, W), window, shift)
    N = win[0] * win[1] * win[2]
    bias = bias_from_table(p["table"], window, N, heads)

    ref = pallas_stw.stw_layer_reference(
        x, p["gamma"], p["w_qkv"], p["w_proj"], p["b_proj"], bias,
        *_mask_args(T, H, W, win, sh),
        window=win, shift=sh, heads=heads, dim_head=dim_head, rotary=True)
    out = pallas_stw.fused_stw_layer(
        x, p["gamma"], p["w_qkv"], p["w_proj"], p["b_proj"], bias,
        window=win, shift=sh, heads=heads, dim_head=dim_head, rotary=True,
        interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


class TestHeadPackAB:
    """Pairwise head packing (EXTDM_STW_HEADPACK) vs the per-head loops:
    forward bit-parity and backward grad parity, STW + temporal kernels.
    The packed matmuls compute identical sums (block-diagonal zeros kill
    the cross-head terms), so tolerances are tight."""

    def _stw_args(self):
        window, shift = (2, 4, 4), (1, 2, 2)
        heads, dim_head = 4, 8
        p = make_params(jax.random.PRNGKey(6), 16, heads, dim_head, window)
        x = jax.random.normal(jax.random.PRNGKey(7), (2, 4, 8, 8, 16),
                              jnp.float32)
        N = window[0] * window[1] * window[2]
        bias = bias_from_table(p["table"], window, N, heads)
        kw = dict(window=window, shift=shift, heads=heads,
                  dim_head=dim_head, rotary=True, interpret=True)
        return x, (p["gamma"], p["w_qkv"], p["w_proj"], p["b_proj"], bias), kw

    def test_stw_forward(self, monkeypatch):
        x, params, kw = self._stw_args()
        monkeypatch.setenv("EXTDM_STW_HEADPACK", "0")
        ref = pallas_stw.fused_stw_layer(x, *params, **kw)
        monkeypatch.setenv("EXTDM_STW_HEADPACK", "1")
        out = pallas_stw.fused_stw_layer(x, *params, **kw)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-6, atol=1e-6)

    def test_stw_backward(self, monkeypatch):
        x, params, kw = self._stw_args()

        def loss(x, *params):
            return jnp.sum(pallas_stw.fused_stw_layer(x, *params, **kw) ** 2)

        g = jax.grad(loss, argnums=tuple(range(6)))
        monkeypatch.setenv("EXTDM_STW_HEADPACK", "0")
        ref = g(x, *params)
        monkeypatch.setenv("EXTDM_STW_HEADPACK", "1")
        out = g(x, *params)
        for a, b in zip(ref, out):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                       rtol=1e-5, atol=1e-5)

    def _temporal_args(self):
        heads, dim_head = 4, 8
        hidden = heads * dim_head
        ks = jax.random.split(jax.random.PRNGKey(8), 7)
        B, T, H, W, C = 2, 5, 8, 8, 16
        x = jax.random.normal(ks[0], (B, T, H, W, C), jnp.float32)
        params = (jax.random.normal(ks[1], (C,)) * 0.1 + 1.0,
                  jax.random.normal(ks[2], (C,)) * 0.1 + 1.0,
                  jax.random.normal(ks[3], (C,)) * 0.05,
                  jax.random.normal(ks[4], (C, 3 * hidden)) * 0.05,
                  jax.random.normal(ks[5], (hidden, C)) * 0.05,
                  jax.random.normal(ks[6], (heads, T, T)) * 0.05)
        kw = dict(heads=heads, dim_head=dim_head, rotary=True,
                  interpret=True)
        return x, params, kw

    def test_temporal_forward(self, monkeypatch):
        x, params, kw = self._temporal_args()
        monkeypatch.setenv("EXTDM_STW_HEADPACK", "0")
        ref = pallas_stw.fused_temporal_layer(x, *params, **kw)
        monkeypatch.setenv("EXTDM_STW_HEADPACK", "1")
        out = pallas_stw.fused_temporal_layer(x, *params, **kw)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-6, atol=1e-6)

    def test_temporal_backward(self, monkeypatch):
        x, params, kw = self._temporal_args()

        def loss(x, *params):
            return jnp.sum(
                pallas_stw.fused_temporal_layer(x, *params, **kw) ** 2)

        g = jax.grad(loss, argnums=tuple(range(7)))
        monkeypatch.setenv("EXTDM_STW_HEADPACK", "0")
        ref = g(x, *params)
        monkeypatch.setenv("EXTDM_STW_HEADPACK", "1")
        out = g(x, *params)
        for a, b in zip(ref, out):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                       rtol=1e-5, atol=1e-5)


def test_scalar_softmax_clamp_survives_logit_spike(monkeypatch):
    """A row whose own max sits far below the program-scalar max must
    degrade gracefully (toward uniform) instead of underflowing its whole
    denominator to 0 -> inf/NaN (ADVICE r3: a transient training logit
    spike would otherwise NaN the step)."""
    monkeypatch.setenv("EXTDM_SOFTMAX_SCALAR", "1")
    # packed layout: (rows, 2N); row 0 carries a +500 spike so every other
    # row's scores sit ~500 below the block max
    N = 8
    s = jnp.zeros((4, 2 * N)).at[0, 0].set(500.0)
    e, r1, r2 = pallas_stw._softmax_lane_halves_parts(s, N, ablate=())
    p = e * jnp.where(
        jax.lax.broadcasted_iota(jnp.int32, e.shape, 1) < N, r1, r2)
    assert bool(jnp.all(jnp.isfinite(p)))
    # un-spiked rows stay (near-)uniform within each half
    np.testing.assert_allclose(np.asarray(p[1, :N]), 1.0 / N, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(p[1, N:]), 1.0 / N, rtol=1e-3)
    # plain per-row variant helper too
    sh = pallas_stw._shifted(jnp.zeros((4, N)).at[0, 0].set(500.0))
    p2 = jnp.exp(sh) / jnp.exp(sh).sum(-1, keepdims=True)
    assert bool(jnp.all(jnp.isfinite(p2)))
