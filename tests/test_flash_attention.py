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


@pytest.mark.parametrize("h,lq,lk,d", [
    (8, 1024, 1024, 40),    # SD1.5 level-0 shape: 8 heads -> pad to 9, pack 3
    (8, 1024, 1054, 40),    # GLIGEN fuser: kv = visual + grounding tokens
    (6, 1024, 1024, 40),    # even head-group count
    (4, 1024, 1024, 64),    # pack-2 regime
])
def test_packed_forward_matches_xla(h, lq, lk, d):
    """Head-packed kernel (block-diag QK/AV, online softmax) == XLA."""
    q = jax.random.normal(jax.random.key(0), (2, h, lq, d), jnp.float32)
    k = jax.random.normal(jax.random.key(1), (2, h, lk, d), jnp.float32)
    v = jax.random.normal(jax.random.key(2), (2, h, lk, d), jnp.float32)
    ref = fa._xla_attention(q, k, v)
    out, lse = fa.packed_attention_interpret(q, k, v, return_lse=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)
    # LSE feeds the (unpacked) flash backward: verify grads flow through it.
    g = jax.random.normal(jax.random.key(3), (2, h, lq, d), jnp.float32)
    _, vjp = jax.vjp(fa._xla_attention, q, k, v)
    dq_ref, dk_ref, dv_ref = vjp(g)
    dq, dk, dv = fa._pallas_attention_bwd(q, k, v, lse, np.asarray(out), g,
                                          interpret=True)
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
