"""Fused attention kernel (Pallas, TPU) for the UNet's untapped layers.

The memory-bound part of SD attention is the (Lq, Lk) probability matrix: at
the 64x64 latent level Lq = Lk = 4096, so materializing probabilities in HBM
costs 64 MB/head-batch in fp32 per layer per step. This kernel keeps the
whole score block in VMEM: for each (batch*head, q-block) grid cell it
computes scores against the full K/V (which fit comfortably in VMEM at SD
sequence lengths), does a row softmax, and writes only the (BQ, D) output —
probabilities never touch HBM.

The reference instead switches between torch SDPA/Flash and a math path
(attention_processor.py:305-405); here the fused path is the default and the
explicit-probability path exists only for tapped layers (see
lmdx/nn/attention.py).

Falls back to a plain XLA implementation on non-TPU backends and for shapes
outside the kernel's envelope.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp

_NEG_INF = float("-inf")


def _xla_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    scale = 1.0 / jnp.sqrt(q.shape[-1]).astype(jnp.float32)
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
    probs = jax.nn.softmax(scores.astype(jnp.float32) * scale, axis=-1)
    out = jnp.einsum(
        "bhqk,bhkd->bhqd", probs.astype(v.dtype), v, preferred_element_type=jnp.float32
    )
    return out.astype(q.dtype)


def _pick_block_q(lq: int) -> int:
    for bq in (512, 256, 128):
        if lq % bq == 0:
            return bq
    return lq


@functools.partial(jax.jit, static_argnames=("interpret",))
def _pallas_attention(q, k, v, interpret=False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, h, lq, d = q.shape
    lk = k.shape[2]
    bh = b * h
    scale = 1.0 / (d**0.5)

    # Pad K/V length to the lane tile; mask padded columns inside the kernel.
    lk_pad = -(-lk // 128) * 128
    if lk_pad != lk:
        pad = [(0, 0), (0, 0), (0, lk_pad - lk), (0, 0)]
        k = jnp.pad(k, pad)
        v = jnp.pad(v, pad)

    block_q = _pick_block_q(lq)
    grid = (bh, lq // block_q)

    qr = q.reshape(bh, lq, d)
    kr = k.reshape(bh, lk_pad, d)
    vr = v.reshape(bh, lk_pad, d)

    def kernel(q_ref, k_ref, v_ref, o_ref):
        qb = q_ref[0].astype(jnp.float32)
        kb = k_ref[0].astype(jnp.float32)
        vb = v_ref[0].astype(jnp.float32)
        s = jax.lax.dot_general(
            qb, kb, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale
        if lk_pad != lk:
            col = jax.lax.broadcasted_iota(jnp.int32, s.shape, dimension=1)
            s = jnp.where(col < lk, s, _NEG_INF)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        denom = jnp.sum(p, axis=-1, keepdims=True)
        o = jnp.dot(p, vb, preferred_element_type=jnp.float32) / denom
        o_ref[0] = o.astype(o_ref.dtype)

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lk_pad, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lk_pad, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bh, lq, d), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * bh * lq * lk_pad * d,
            bytes_accessed=(qr.size + kr.size + vr.size + bh * lq * d) * q.dtype.itemsize,
            transcendentals=bh * lq * lk_pad,
        ),
        interpret=interpret,
    )(qr, kr, vr)
    return out.reshape(b, h, lq, d)


def _kernel_supported(q, k) -> bool:
    *_, lq, d = q.shape
    lk = k.shape[2]
    if d > 256 or lq < 8:
        return False
    if lk < 256:
        # Cross-attention (77 text tokens) and tiny self-attention: padding
        # K/V to the 128-lane tile wastes more than fusion saves — measured
        # slower than the XLA path on v5e.
        return False
    # Full K/V + one score block must fit VMEM with headroom.
    lk_pad = -(-lk // 128) * 128
    vmem = 2 * lk_pad * d * 4 + _pick_block_q(lq) * (lk_pad + 2 * d) * 4
    return vmem < 12 * 1024 * 1024


@jax.custom_vjp
def _flash_attention_ad(q, k, v):
    return _pallas_attention(q, k, v)


def _flash_fwd(q, k, v):
    return _pallas_attention(q, k, v), (q, k, v)


def _flash_bwd(residuals, g):
    # Backward through the XLA formulation (numerically identical); gradients
    # through attention only occur in guidance passes, which are XLA anyway.
    q, k, v = residuals
    _, vjp = jax.vjp(_xla_attention, q, k, v)
    return vjp(g)


_flash_attention_ad.defvjp(_flash_fwd, _flash_bwd)


def flash_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                    force_xla: bool | None = None) -> jnp.ndarray:
    """Fused multi-head attention over (B, heads, L, head_dim) tensors."""
    if force_xla is None:
        force_xla = os.environ.get("LMDX_DISABLE_PALLAS", "0") == "1"
    on_tpu = jax.default_backend() == "tpu"
    if force_xla or not on_tpu or not _kernel_supported(q, k):
        return _xla_attention(q, k, v)
    return _flash_attention_ad(q, k, v)


def flash_attention_interpret(q, k, v):
    """Interpreter-mode entry for CPU correctness tests of the kernel."""
    return _pallas_attention(q, k, v, interpret=True)
