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


def _pick_block_q(lq: int, lk_pad: int = 0, d: int = 0,
                  n_score_bufs: int = 2) -> int:
    """Largest divisible q-block whose working set fits scoped VMEM.

    n_score_bufs: concurrently-live (block_q, lk_pad) f32 matrices — 2 for
    the forward (s, p), 4 for the backward (s/p, dp, ds + headroom). The
    budget is deliberately far below the 16M scoped-VMEM limit: measured
    kernels carry ~6-8M of fixed overhead (double-buffered in/out blocks,
    layout copies) on top of the score temporaries."""
    budget = (3 if n_score_bufs >= 4 else 8) * 1024 * 1024
    for bq in (512, 256, 128):
        if lq % bq != 0:
            continue
        if not lk_pad:
            return bq
        vmem = (n_score_bufs * bq * lk_pad * 4      # score-sized f32 bufs
                + 2 * lk_pad * d * 4                # k, v upcast
                + 6 * bq * d * 4)                   # q/o/g blocks + outputs
        if vmem < budget:
            return bq
    return lq if lk_pad == 0 else 128


def _pad_q_rows(arrs, lq: int):
    """Pad the query axis (dim 2) to a 128-multiple; callers slice outputs
    back. Returns (padded arrays, lq_pad)."""
    lq_pad = -(-lq // 128) * 128
    if lq_pad == lq:
        return arrs, lq
    out = [jnp.pad(a, [(0, 0), (0, 0), (0, lq_pad - lq)] +
                   [(0, 0)] * (a.ndim - 3)) for a in arrs]
    return out, lq_pad


def _pad_kv(k, v, lk):
    lk_pad = -(-lk // 128) * 128
    if lk_pad != lk:
        pad = [(0, 0), (0, 0), (0, lk_pad - lk), (0, 0)]
        k = jnp.pad(k, pad)
        v = jnp.pad(v, pad)
    return k, v, lk_pad


@functools.partial(jax.jit, static_argnames=("interpret", "return_lse"))
def _pallas_attention(q, k, v, interpret=False, return_lse=False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, h, lq, d = q.shape
    lk = k.shape[2]
    bh = b * h
    scale = 1.0 / (d**0.5)

    # Pad K/V length to the lane tile; mask padded columns inside the kernel.
    k, v, lk_pad = _pad_kv(k, v, lk)
    (q,), lq_pad = _pad_q_rows([q], lq)

    block_q = _pick_block_q(lq_pad, lk_pad, d, n_score_bufs=2)
    grid = (bh, lq_pad // block_q)

    qr = q.reshape(bh, lq_pad, d)
    kr = k.reshape(bh, lk_pad, d)
    vr = v.reshape(bh, lk_pad, d)

    def kernel(q_ref, k_ref, v_ref, o_ref, lse_ref):
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
        # LSE row broadcast over an 8-sublane pad (TPU tiling: the last two
        # block dims must be (8k, 128k)); consumers read sublane 0.
        lse_row = (m + jnp.log(denom))[:, 0]
        lse_ref[0] = jnp.broadcast_to(lse_row[None, :], (8, lse_row.shape[0]))

    out, lse = pl.pallas_call(
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
        out_specs=(
            pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, block_q), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((bh, lq_pad, d), q.dtype),
            jax.ShapeDtypeStruct((bh, 8, lq_pad), jnp.float32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * bh * lq * lk_pad * d,
            bytes_accessed=(qr.size + kr.size + vr.size + bh * lq * d) * q.dtype.itemsize,
            transcendentals=bh * lq * lk_pad,
        ),
        interpret=interpret,
    )(qr, kr, vr)
    out = out[:, :lq].reshape(b, h, lq, d)
    if return_lse:
        return out, lse[:, 0, :lq].reshape(b, h, lq)
    return out


@functools.partial(jax.jit, static_argnames=("interpret",))
def _pallas_attention_bwd(q, k, v, lse, o, g, interpret=False):
    """Flash-attention backward: blockwise recompute of the probabilities —
    the (Lq, Lk) matrix never reaches HBM in fwd OR bwd. This is what lets
    batched guidance (jax.grad through the UNet) fit in HBM; the XLA
    formulation's VJP materializes fp32 probability matrices (4+ GB each at
    the 4096-token level with image batching).

    dk/dv accumulate across q-block grid steps (TPU grids run sequentially,
    so revisiting the same output block is well-defined).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, h, lq, d = q.shape
    lk = k.shape[2]
    bh = b * h
    scale = 1.0 / (d**0.5)
    k, v, lk_pad = _pad_kv(k, v, lk)
    # Pad the query axis; padded g rows are zero, so their ds vanishes and
    # dk/dv stay exact. Padded LSE is large so exp(s - lse) underflows to 0.
    (q, o, g), lq_pad = _pad_q_rows([q, o, g], lq)
    if lq_pad != lq:
        lse = jnp.pad(lse, [(0, 0), (0, 0), (0, lq_pad - lq)],
                      constant_values=1e9)

    # The kernel chunks KV at <=512, so the score temporaries scale with the
    # chunk, not the full KV length.
    block_q = _pick_block_q(lq_pad, min(lk_pad, 512), d, n_score_bufs=4)
    grid = (bh, lq_pad // block_q)

    qr = q.reshape(bh, lq_pad, d)
    kr = k.reshape(bh, lk_pad, d)
    vr = v.reshape(bh, lk_pad, d)
    # Re-pad the LSE sublane dim for the TPU tiling constraint.
    lser = jnp.broadcast_to(lse.reshape(bh, 1, lq_pad), (bh, 8, lq_pad))
    orr = o.reshape(bh, lq_pad, d)
    gr = g.reshape(bh, lq_pad, d)

    # Chunk the KV axis inside the kernel: the concurrently-live score-sized
    # temporaries (s/p, dp, ds) shrink from (bq, lk_pad) to (bq, chunk),
    # keeping the whole working set inside scoped VMEM at any KV length.
    kv_chunk = min(lk_pad, 512)
    n_chunks = lk_pad // kv_chunk if lk_pad % kv_chunk == 0 else None
    if n_chunks is None:
        kv_chunk = 128
        n_chunks = lk_pad // kv_chunk

    def kernel(q_ref, k_ref, v_ref, lse_ref, o_ref, g_ref,
               dq_ref, dk_ref, dv_ref):
        j = pl.program_id(1)
        qb = q_ref[0].astype(jnp.float32)
        ob = o_ref[0].astype(jnp.float32)
        gb = g_ref[0].astype(jnp.float32)
        lseb = lse_ref[0, 0]
        delta = jnp.sum(gb * ob, axis=-1, keepdims=True)     # (bq, 1)

        dq_acc = jnp.zeros((qb.shape[0], d), jnp.float32)
        for c in range(n_chunks):
            sl = pl.ds(c * kv_chunk, kv_chunk)
            kc = k_ref[0, sl].astype(jnp.float32)            # (chunk, d)
            vc = v_ref[0, sl].astype(jnp.float32)

            s = jax.lax.dot_general(
                qb, kc, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale
            if lk_pad != lk:
                col = jax.lax.broadcasted_iota(jnp.int32, s.shape, dimension=1)
                s = jnp.where(col + c * kv_chunk < lk, s, _NEG_INF)
            p = jnp.exp(s - lseb[:, None])                   # rows sum to 1

            dp = jax.lax.dot_general(
                gb, vc, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            ds = p * (dp - delta) * scale                    # (bq, chunk)

            dq_acc = dq_acc + jnp.dot(ds, kc,
                                      preferred_element_type=jnp.float32)

            dk_block = jax.lax.dot_general(
                ds, qb, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            dv_block = jax.lax.dot_general(
                p, gb, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)

            @pl.when(j == 0)
            def _():
                dk_ref[0, sl] = dk_block.astype(dk_ref.dtype)
                dv_ref[0, sl] = dv_block.astype(dv_ref.dtype)

            @pl.when(j > 0)
            def _():
                dk_ref[0, sl] = dk_ref[0, sl] + dk_block.astype(dk_ref.dtype)
                dv_ref[0, sl] = dv_ref[0, sl] + dv_block.astype(dv_ref.dtype)

        dq_ref[0] = dq_acc.astype(dq_ref.dtype)

    dq, dk, dv = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lk_pad, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lk_pad, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, block_q), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lk_pad, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lk_pad, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((bh, lq_pad, d), jnp.float32),
            jax.ShapeDtypeStruct((bh, lk_pad, d), jnp.float32),
            jax.ShapeDtypeStruct((bh, lk_pad, d), jnp.float32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=5 * 2 * bh * lq * lk_pad * d,
            bytes_accessed=3 * (qr.size + kr.size + vr.size) * 4,
            transcendentals=bh * lq * lk_pad,
        ),
        interpret=interpret,
    )(qr, kr, vr, lser, orr, gr)

    dq = dq[:, :lq].reshape(b, h, lq, d).astype(q.dtype)
    dk = dk[:, :lk].reshape(b, h, lk, d).astype(q.dtype)
    dv = dv[:, :lk].reshape(b, h, lk, d).astype(q.dtype)
    return dq, dk, dv


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
    # Full K/V + the smallest score block must fit VMEM with headroom
    # (backward is the tightest: 4 score-sized f32 buffers).
    lk_pad = -(-lk // 128) * 128
    vmem = 4 * 128 * lk_pad * 4 + 2 * lk_pad * d * 4 + 6 * 128 * d * 4
    return vmem < 12 * 1024 * 1024


@jax.custom_vjp
def _flash_attention_ad(q, k, v):
    return _pallas_attention(q, k, v)


def _flash_fwd(q, k, v):
    o, lse = _pallas_attention(q, k, v, return_lse=True)
    return o, (q, k, v, lse, o)


def _flash_bwd(residuals, g):
    q, k, v, lse, o = residuals
    return _pallas_attention_bwd(q, k, v, lse, o, g)


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
