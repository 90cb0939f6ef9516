"""Pallas flash-attention kernel tests (interpreter mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lmdx.nn.pallas import flash_attention as fa


@pytest.mark.parametrize("lq,lk,d", [(256, 256, 32), (256, 260, 32),
                                     (128, 512, 64)])
def test_forward_matches_xla(lq, lk, d):
    key = jax.random.key(0)
    q = jax.random.normal(key, (1, 2, lq, d), jnp.float32)
    k = jax.random.normal(jax.random.key(1), (1, 2, lk, d), jnp.float32)
    v = jax.random.normal(jax.random.key(2), (1, 2, lk, d), jnp.float32)
    ref = fa._xla_attention(q, k, v)
    out = fa._pallas_attention(q, k, v, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("lq,lk,d", [(256, 256, 32), (256, 260, 32)])
def test_backward_matches_xla(lq, lk, d):
    """The blockwise flash backward must match the XLA attention VJP."""
    q = jax.random.normal(jax.random.key(0), (1, 2, lq, d), jnp.float32)
    k = jax.random.normal(jax.random.key(1), (1, 2, lk, d), jnp.float32)
    v = jax.random.normal(jax.random.key(2), (1, 2, lk, d), jnp.float32)
    g = jax.random.normal(jax.random.key(3), (1, 2, lq, d), jnp.float32)

    _, vjp = jax.vjp(fa._xla_attention, q, k, v)
    dq_ref, dk_ref, dv_ref = vjp(g)

    o, lse = fa._pallas_attention(q, k, v, interpret=True, return_lse=True)
    dq, dk, dv = fa._pallas_attention_bwd(q, k, v, lse, o, g, interpret=True)

    np.testing.assert_allclose(np.asarray(dq), np.asarray(dq_ref),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(dk), np.asarray(dk_ref),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(dv), np.asarray(dv_ref),
                               rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("lq,lk,d", [(300, 330, 32)])
def test_unaligned_query_length(lq, lk, d):
    """Non-128-multiple query lengths pad internally, fwd and bwd."""
    q = jax.random.normal(jax.random.key(0), (1, 2, lq, d), jnp.float32)
    k = jax.random.normal(jax.random.key(1), (1, 2, lk, d), jnp.float32)
    v = jax.random.normal(jax.random.key(2), (1, 2, lk, d), jnp.float32)
    g = jax.random.normal(jax.random.key(3), (1, 2, lq, d), jnp.float32)

    ref = fa._xla_attention(q, k, v)
    o, lse = fa._pallas_attention(q, k, v, interpret=True, return_lse=True)
    np.testing.assert_allclose(np.asarray(o), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)

    _, vjp = jax.vjp(fa._xla_attention, q, k, v)
    dq_ref, dk_ref, dv_ref = vjp(g)
    dq, dk, dv = fa._pallas_attention_bwd(q, k, v, lse, o, g, interpret=True)
    np.testing.assert_allclose(np.asarray(dq), np.asarray(dq_ref), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(dk), np.asarray(dk_ref), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(dv), np.asarray(dv_ref), rtol=2e-4, atol=2e-4)
