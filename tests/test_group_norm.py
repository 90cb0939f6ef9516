"""Pallas GroupNorm(+SiLU) kernel vs flax reference, values and grads.

Interpret mode on CPU; the real-TPU gate is the microbench/verify run
(interpret cannot reproduce undefined VMEM tails on partial channel tiles,
which the in-kernel iota mask guards against).
"""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lmdx.nn.pallas import group_norm as gn

# The kernel is a measured-and-rejected experiment (ARCHITECTURE.md §8),
# opt-in via LMDX_PALLAS_GROUPNORM — not on the product path, so its ~55 s
# of interpret-mode runs live in the slow tier.
pytestmark = pytest.mark.slow


def _flax_ref(x, scale, bias, groups, eps=1e-5, silu=False):
    mod = nn.GroupNorm(num_groups=groups, epsilon=eps, dtype=jnp.float32)
    y = mod.apply({"params": {"scale": scale, "bias": bias}}, x)
    return nn.silu(y) if silu else y


# (B, H, W, C, groups): aligned and unaligned channel counts incl. SD sizes
SHAPES = [
    (2, 8, 8, 128, 32),     # lane-aligned
    (2, 8, 8, 320, 32),     # SD level-0: 2.5 lane tiles (partial edge tile)
    (1, 4, 4, 96, 8),       # small unaligned
    (2, 2, 2, 1920, 32),    # up-block concat width
]


@pytest.mark.parametrize("b,h,w,c,groups", SHAPES)
@pytest.mark.parametrize("silu", [False, True])
def test_group_norm_matches_flax(b, h, w, c, groups, silu):
    key = jax.random.key(0)
    x = jax.random.normal(key, (b, h, w, c), jnp.float32) * 2.0 + 0.5
    scale = jax.random.normal(jax.random.key(1), (c,)) * 0.1 + 1.0
    bias = jax.random.normal(jax.random.key(2), (c,)) * 0.1

    ref = _flax_ref(x, scale, bias, groups, silu=silu)
    out = gn.group_norm(x, scale, bias, groups, 1e-5, silu, True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("b,h,w,c,groups", SHAPES[:2])
@pytest.mark.parametrize("silu", [False, True])
def test_group_norm_grads_match_flax(b, h, w, c, groups, silu):
    x = jax.random.normal(jax.random.key(3), (b, h, w, c), jnp.float32)
    scale = jax.random.normal(jax.random.key(4), (c,)) * 0.1 + 1.0
    bias = jax.random.normal(jax.random.key(5), (c,)) * 0.1
    cot = jax.random.normal(jax.random.key(6), (b, h, w, c), jnp.float32)

    def ref_fn(x, s, bi):
        return jnp.vdot(_flax_ref(x, s, bi, groups, silu=silu), cot)

    def ker_fn(x, s, bi):
        return jnp.vdot(gn.group_norm(x, s, bi, groups, 1e-5, silu, True), cot)

    gr = jax.grad(ref_fn, argnums=(0, 1, 2))(x, scale, bias)
    gk = jax.grad(ker_fn, argnums=(0, 1, 2))(x, scale, bias)
    for a, b_ in zip(gk, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=2e-4, atol=2e-4)


def test_group_norm_bf16_input():
    x = jax.random.normal(jax.random.key(7), (2, 4, 4, 320), jnp.bfloat16)
    scale = jnp.ones((320,))
    bias = jnp.zeros((320,))
    ref = _flax_ref(x.astype(jnp.float32), scale, bias, 32)
    out = gn.group_norm(x, scale, bias, 32, 1e-5, False, True)
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref), rtol=2e-2, atol=2e-2)
