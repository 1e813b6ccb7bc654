"""Pallas kernel parity tests (interpret mode on CPU)."""
import jax
import jax.numpy as jnp
import numpy as np

from extdm_tpu.ops.pallas_attn import fused_window_attention


def _reference(q, k, v, bias, mask):
    BW, H, N, D = q.shape
    attn = jnp.einsum("bhid,bhjd->bhij", q, k) + bias[None]
    if mask is not None:
        nW = mask.shape[0]
        attn = attn.reshape(BW // nW, nW, H, N, N) + mask[None, :, None]
        attn = attn.reshape(BW, H, N, N)
    attn = jax.nn.softmax(attn, axis=-1)
    return jnp.einsum("bhij,bhjd->bhid", attn, v)


class TestFusedWindowAttention:
    def test_matches_reference_no_mask(self):
        rng = np.random.RandomState(0)
        q = jnp.asarray(rng.randn(6, 2, 64, 32), jnp.float32)
        k = jnp.asarray(rng.randn(6, 2, 64, 32), jnp.float32)
        v = jnp.asarray(rng.randn(6, 2, 64, 32), jnp.float32)
        bias = jnp.asarray(rng.randn(2, 64, 64) * 0.1, jnp.float32)
        out = fused_window_attention(q, k, v, bias, None, interpret=True)
        ref = _reference(q, k, v, bias, None)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)

    def test_matches_reference_with_mask(self):
        rng = np.random.RandomState(1)
        nW = 3
        q = jnp.asarray(rng.randn(2 * nW, 2, 64, 16), jnp.float32)
        k = jnp.asarray(rng.randn(2 * nW, 2, 64, 16), jnp.float32)
        v = jnp.asarray(rng.randn(2 * nW, 2, 64, 16), jnp.float32)
        bias = jnp.asarray(rng.randn(2, 64, 64) * 0.1, jnp.float32)
        mask = np.zeros((nW, 64, 64), np.float32)
        mask[1, :32, 32:] = -100.0
        mask[1, 32:, :32] = -100.0
        mask = jnp.asarray(mask)
        out = fused_window_attention(q, k, v, bias, mask, interpret=True)
        ref = _reference(q, k, v, bias, mask)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)

    def test_unet_cpu_falls_back(self):
        # On the CPU test backend the pallas path must be disabled.
        from extdm_tpu.ops import pallas_attn

        assert not pallas_attn.enabled()


    def test_grad_via_custom_vjp(self):
        import jax

        rng = np.random.RandomState(2)
        q = jnp.asarray(rng.randn(2, 2, 64, 16), jnp.float32)
        k = jnp.asarray(rng.randn(2, 2, 64, 16), jnp.float32)
        v = jnp.asarray(rng.randn(2, 2, 64, 16), jnp.float32)
        bias = jnp.asarray(rng.randn(2, 64, 64) * 0.1, jnp.float32)

        def f(q, k, v):
            return jnp.sum(fused_window_attention(q, k, v, bias, None, interpret=True) ** 2)

        def f_ref(q, k, v):
            return jnp.sum(_reference(q, k, v, bias, None) ** 2)

        g = jax.grad(f, argnums=(0, 1, 2))(q, k, v)
        g_ref = jax.grad(f_ref, argnums=(0, 1, 2))(q, k, v)
        for a, b in zip(g, g_ref):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)
