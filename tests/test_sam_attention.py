"""SAM fused global-attention kernel tests (interpreter mode on CPU).

The kernel (lmdx/nn/pallas/sam_attention.py) computes SAM ViT global
self-attention with the ViTDet decomposed rel-pos bias injected in VMEM via
an augmented one-hot matmul; these tests pin it against the materialized XLA
path (the math the reference runs via transformers SamVisionAttention,
/root/reference/models/sam.py:25-55) and pin that XLA path against the
module's previous inline implementation semantics.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lmdx.nn.pallas import sam_attention as sa


def _rand_inputs(b, h, gh, gw, d, dtype=jnp.float32):
    n = gh * gw
    keys = jax.random.split(jax.random.key(0), 5)
    q = jax.random.normal(keys[0], (b, h, n, d), dtype)
    k = jax.random.normal(keys[1], (b, h, n, d), dtype)
    v = jax.random.normal(keys[2], (b, h, n, d), dtype)
    bias_h = jax.random.normal(keys[3], (b, h, n, gh), jnp.float32)
    bias_w = jax.random.normal(keys[4], (b, h, n, gw), jnp.float32)
    return q, k, v, bias_h, bias_w


@pytest.mark.parametrize("gh,gw,d", [
    (8, 8, 32),     # N=64: tail-masked partial K block (lk_pad 128 > 64)
    (16, 16, 64),   # N=256: aligned, multiple q-blocks
    (8, 16, 16),    # non-square grid
    (14, 14, 64),   # N=196: the SAM ViT windowed-layer shape (lk_pad 256)
])
def test_kernel_matches_xla(gh, gw, d):
    # The kernel's dots run in bf16 (matching the reference's fp16-autocast
    # SDPA numerics) against the XLA path's f32 — tolerance is bf16-scale.
    q, k, v, bias_h, bias_w = _rand_inputs(1, 2, gh, gw, d)
    ref = sa.xla_sam_attention(q, k, v, bias_h, bias_w)
    out = sa.sam_attention_interpret(q, k, v, bias_h, bias_w)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=4e-2, atol=4e-2)


def test_onehot_selects_kh_kw():
    gh, gw = 4, 6
    oh = sa._onehot_kh_kw(gh, gw)
    assert oh.shape == (gh * gw, gh + gw)
    for kh in range(gh):
        for kw in range(gw):
            row = oh[kh * gw + kw]
            assert row[kh] == 1.0 and row[gh + kw] == 1.0
            assert row.sum() == 2.0


def test_bias_decomposition_equals_dense_bias():
    """score = qk/sqrt(d) + bias_h[q, kh] + bias_w[q, kw], verified against
    a dense per-pair bias softmax-attention computed with plain numpy."""
    gh, gw, d = 4, 4, 8
    n = gh * gw
    q, k, v, bias_h, bias_w = _rand_inputs(1, 1, gh, gw, d)
    out = sa.xla_sam_attention(q, k, v, bias_h, bias_w)

    qn, kn, vn = (np.asarray(a[0, 0], np.float64) for a in (q, k, v))
    bh_n = np.asarray(bias_h[0, 0], np.float64)
    bw_n = np.asarray(bias_w[0, 0], np.float64)
    s = qn @ kn.T / np.sqrt(d)
    for kk in range(n):
        s[:, kk] += bh_n[:, kk // gw] + bw_n[:, kk % gw]
    p = np.exp(s - s.max(-1, keepdims=True))
    p /= p.sum(-1, keepdims=True)
    np.testing.assert_allclose(np.asarray(out[0, 0]), p @ vn,
                               rtol=1e-4, atol=1e-4)


def test_dispatcher_falls_back_off_tpu():
    """On CPU the dispatcher must return the XLA path result exactly."""
    q, k, v, bias_h, bias_w = _rand_inputs(1, 2, 8, 8, 32)
    ref = sa.xla_sam_attention(q, k, v, bias_h, bias_w)
    out = sa.sam_global_attention(q, k, v, bias_h, bias_w)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_supported_envelope():
    q = jnp.zeros((1, 12, 4096, 64))
    assert sa._kernel_supported(q, 64, 64)          # SAM ViT-B global layer
    assert not sa._kernel_supported(q, 64, 32)      # grid mismatch
    win = jnp.zeros((1, 12, 196, 64))
    assert sa._kernel_supported(win, 14, 14)        # 14x14 windowed layer
    tiny = jnp.zeros((1, 2, 16, 8))
    assert not sa._kernel_supported(tiny, 4, 4)     # CPU-test grids: XLA path


@pytest.mark.slow
def test_module_level_unchanged():
    """SamAttention (global, rel-pos) output is unchanged by the refactor:
    compare against an inline materialized reimplementation of the original
    module math on the same params."""
    import flax.linen as nn

    from lmdx.nn import sam as samlib

    gh = gw = 8
    dim, heads = 32, 2
    attn = samlib.SamAttention(dim, heads, (gh, gw), dtype=jnp.float32)
    x = jax.random.normal(jax.random.key(0), (2, gh, gw, dim))
    params = attn.init(jax.random.key(1), x)["params"]
    out = attn.apply({"params": params}, x)

    # Original inline math (pre-kernel): materialized scores + bias add.
    head_dim = dim // heads
    qkv = x @ params["qkv"]["kernel"] + params["qkv"]["bias"]
    qkv = qkv.reshape(2, gh * gw, 3, heads, head_dim)
    q, k, v = (qkv[:, :, i].transpose(0, 2, 1, 3) for i in range(3))
    rh = samlib._rel_pos_bias(gh, gh, params["rel_pos_h"])
    rw = samlib._rel_pos_bias(gw, gw, params["rel_pos_w"])
    q_sp = q.reshape(2, heads, gh, gw, head_dim)
    bias_h = jnp.einsum("bnhwd,hkd->bnhwk", q_sp, rh)
    bias_w = jnp.einsum("bnhwd,wkd->bnhwk", q_sp, rw)
    s = jnp.einsum("bhqd,bhkd->bhqk", q * head_dim**-0.5, k)
    s = s.reshape(2, heads, gh, gw, gh, gw)
    s = (s + bias_h[..., :, None] + bias_w[..., None, :]
         ).reshape(2, heads, gh * gw, gh * gw)
    p = jax.nn.softmax(s, axis=-1)
    o = jnp.einsum("bhqk,bhkd->bhqd", p, v)
    o = o.transpose(0, 2, 1, 3).reshape(2, gh, gw, dim)
    ref = o @ params["proj"]["kernel"] + params["proj"]["bias"]
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
