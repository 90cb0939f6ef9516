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
@pytest.mark.slow
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
@pytest.mark.slow
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


def test_dispatch_pins():
    """Pin the measured-on-v5e dispatch decisions (see ARCHITECTURE.md §8):
    512-row forward q-blocks at the 4096-token level (Mosaic reuses the
    score buffer; 1024 exceeds VMEM), 256-row backward blocks, and both
    rejected kernel experiments defaulting OFF."""
    # forward: one live score buffer -> 512-row blocks at SD level-0 shapes
    assert fa._pick_block_q(4096, 4096, 40, n_score_bufs=1) == 512
    assert fa._pick_block_q(4096, 4224, 40, n_score_bufs=1) == 512
    # backward: four live score-sized buffers (chunked KV) -> 256
    assert fa._pick_block_q(4096, 512, 40, n_score_bufs=4) == 256
    # rejected experiments stay opt-in
    q = jnp.zeros((1, 8, 4096, 40))
    assert not fa._use_packed(q)
    qf = jnp.zeros((1, 1024, 640))
    kf = jnp.zeros((1, 77, 640))
    assert not fa._fusedheads_supported(qf, kf, 8)
    # cross-attention (77-token KV) stays on the XLA path per measurement
    k77 = jnp.zeros((1, 8, 77, 40))
    assert not fa._kernel_supported(q, k77)
    # 4096-token self/fuser attention rides the pallas kernel
    k4126 = jnp.zeros((1, 8, 4126, 40))
    assert fa._kernel_supported(q, k4126)


@pytest.mark.parametrize("h,lq,lk,d", [
    (8, 512, 512, 40),     # self-attention, aligned
    (8, 512, 542, 40),     # GLIGEN fuser KV (visual + grounding tokens)
    (8, 512, 77, 40),      # cross-attention (CLIP text tokens)
    (8, 256, 77, 80),      # level-1 cross
    (4, 300, 77, 64),      # unaligned query length
])
@pytest.mark.slow
def test_fusedheads_matches_xla(h, lq, lk, d):
    """Fused-heads kernel on (B, L, h*d) projection-layout tensors == XLA,
    and its LSE drives the per-head flash backward exactly."""
    qf = jax.random.normal(jax.random.key(0), (2, lq, h * d), jnp.float32)
    kf = jax.random.normal(jax.random.key(1), (2, lk, h * d), jnp.float32)
    vf = jax.random.normal(jax.random.key(2), (2, lk, h * d), jnp.float32)
    q, k, v = (fa._split_heads_bhld(t, h) for t in (qf, kf, vf))
    ref = fa._merge_heads_blhd(fa._xla_attention(q, k, v))
    out, lse = fa.fusedheads_attention_interpret(qf, kf, vf, h,
                                                 return_lse=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)
    g = jax.random.normal(jax.random.key(3), (2, lq, h * d), jnp.float32)
    _, vjp = jax.vjp(
        lambda a, b_, c: fa._merge_heads_blhd(fa._xla_attention(
            fa._split_heads_bhld(a, h), fa._split_heads_bhld(b_, h),
            fa._split_heads_bhld(c, h))), qf, kf, vf)
    dq_ref, dk_ref, dv_ref = vjp(g)
    dq, dk, dv = fa._pallas_attention_bwd(
        q, k, v, lse, fa._split_heads_bhld(jnp.asarray(out), h),
        fa._split_heads_bhld(g, h), interpret=True)
    np.testing.assert_allclose(np.asarray(fa._merge_heads_blhd(dq)),
                               np.asarray(dq_ref), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(fa._merge_heads_blhd(dk)),
                               np.asarray(dk_ref), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(fa._merge_heads_blhd(dv)),
                               np.asarray(dv_ref), rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("lq,lk,d", [(1024, 1054, 40)])
@pytest.mark.slow
def test_fuser_shaped_unaligned_kv(lq, lk, d):
    """GLIGEN-fuser-like KV (visual + grounding tokens, not a 128-multiple):
    the plain kernels take K/V unpadded (partial Pallas edge block with
    in-VMEM tail zeroing) — fwd and bwd must still match XLA.

    CAVEAT: interpret mode pads partial edge blocks with *defined* values,
    so this test cannot reproduce the undefined-VMEM-tail NaN hazard that
    _zero_tail_rows guards against on real hardware. The on-TPU verify run
    (.claude/skills/verify — fuser-shaped microbench) is the gate for that
    path; a regression there shows as NaNs in the fuser segment."""
    q = jax.random.normal(jax.random.key(0), (1, 4, lq, d), jnp.float32)
    k = jax.random.normal(jax.random.key(1), (1, 4, lk, d), jnp.float32)
    v = jax.random.normal(jax.random.key(2), (1, 4, lk, d), jnp.float32)
    g = jax.random.normal(jax.random.key(3), (1, 4, lq, d), jnp.float32)

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


@pytest.mark.parametrize("lq,lk,d", [(300, 330, 32)])
@pytest.mark.slow
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
