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

    n_score_bufs: concurrently-live (block_q, lk_pad) f32 matrices AFTER
    Mosaic's liveness reuse — 1 for the forward (p reuses s's buffer;
    measured: block_q 512 at lk 4224 compiles and runs ~6% faster than 256,
    1024 exceeds VMEM), 4 for the backward (s/p, dp, ds + headroom). The
    budget stays below the 16M scoped-VMEM limit to leave room for
    double-buffered in/out blocks and layout copies.

    FAILURE MODE: the forward's 11 MiB budget with n_score_bufs=1 relies on
    Mosaic reusing s's buffer for p. If a future JAX/Mosaic version stops
    doing that liveness reuse, 512-row q-blocks become a hard compile-time
    "scoped vmem limit exceeded" error (not a wrong result). Fix: bump
    n_score_bufs to 2 at the forward call sites (reverting to 256-row
    blocks, ~6% slower) — grep for n_score_bufs=1."""
    budget = (3 if n_score_bufs >= 4 else 11) * 1024 * 1024
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


def _zero_tail_rows(x, valid_rows: int):
    """Zero rows >= valid_rows of a (rows, d) block.

    Unaligned K/V lengths are handled WITHOUT an HBM jnp.pad (at the GLIGEN
    fuser's 4126-token KV that pad round-trips 2x84 MB per layer per step):
    the kernels take the unpadded array and Pallas DMAs a partial edge block,
    leaving the tail rows of the VMEM buffer undefined. Undefined data can be
    +-inf/NaN leftovers, and 0 * inf = NaN would leak through the score and
    output matmuls, so the tail must be zeroed explicitly — after which every
    downstream contraction over the tail contributes exact zeros."""
    row = jax.lax.broadcasted_iota(jnp.int32, x.shape, dimension=0)
    return jnp.where(row < valid_rows, x, jnp.zeros_like(x))


@functools.partial(jax.jit, static_argnames=("interpret", "return_lse"))
def _pallas_attention(q, k, v, interpret=False, return_lse=False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, h, lq, d = q.shape
    lk = k.shape[2]
    bh = b * h
    scale = 1.0 / (d**0.5)

    # K/V length stays UNPADDED in HBM; the kernel's edge block is partial
    # and its undefined tail rows are zeroed in VMEM (_zero_tail_rows).
    lk_pad = -(-lk // 128) * 128
    (q,), lq_pad = _pad_q_rows([q], lq)

    block_q = _pick_block_q(lq_pad, lk_pad, d, n_score_bufs=1)
    grid = (bh, lq_pad // block_q)

    qr = q.reshape(bh, lq_pad, d)
    kr = k.reshape(bh, lk, d)
    vr = v.reshape(bh, lk, d)

    # The kernel is VMEM-traffic bound: every elementwise pass over the
    # (block_q, lk) f32 score matrix costs ~0.5 ms at the 4096-token level.
    # Two passes are eliminated (measured 10.6 -> 8.4 ms at 4096x4096 d40,
    # 2.35 -> 1.69 ms at 1024x1024 d80):
    #  - the softmax scale is folded into the q block before the matmul
    #    (a (block_q, d) multiply instead of a (block_q, lk) one);
    #  - the softmax denominator comes out of the AV matmul via a ones
    #    column appended to V — the extra lanes are free, the MXU pads the
    #    output width to 128 anyway.
    de = -(-(d + 1) // 8) * 8  # V extended with [ones | zeros] columns

    def kernel(q_ref, k_ref, v_ref, o_ref, lse_ref):
        qb = q_ref[0].astype(jnp.float32) * scale
        kb = k_ref[0].astype(jnp.float32)
        vb = v_ref[0].astype(jnp.float32)
        if lk_pad != lk:
            kb = _zero_tail_rows(kb, lk)
            vb = _zero_tail_rows(vb, lk)
        s = jax.lax.dot_general(
            qb, kb, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        if lk_pad != lk:
            col = jax.lax.broadcasted_iota(jnp.int32, s.shape, dimension=1)
            s = jnp.where(col < lk, s, _NEG_INF)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        ones = jnp.ones((vb.shape[0], 1), vb.dtype)
        if lk_pad != lk:
            ones = _zero_tail_rows(ones, lk)
        vext = jnp.concatenate(
            [vb, ones, jnp.zeros((vb.shape[0], de - d - 1), vb.dtype)], axis=1)
        oe = jax.lax.dot_general(
            p, vext, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        denom = oe[:, d : d + 1]
        o_ref[0] = (oe[:, :d] / denom).astype(o_ref.dtype)
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


def _head_pack(d: int) -> int:
    """Heads packed per MXU pass: SD1.5's head_dim 40 underfills the 128-wide
    contraction (31% utilization); packing 3 heads into a block-diagonal
    120-contraction matmul recovers ~3x on the QK^T and AV passes."""
    return max(1, min(3, 128 // d))


@functools.partial(jax.jit, static_argnames=("interpret", "return_lse"))
def _pallas_attention_packed(q, k, v, interpret=False, return_lse=False):
    """Head-packed flash forward for small head_dim.

    SD1.5's head_dim 40 underfills the MXU's 128-wide contraction (31%
    utilization). Here `pack` heads ride one MXU pass: K/V are laid out
    block-diagonally in HBM (chunk-major, built by one einsum against
    eye(pack)), so QK^T contracts over pack*d lanes and AV produces pack*d
    output lanes — both near-full MXU tiles.

    Grid = (batch x head-group, kv-chunk, q-block) with the kv-chunk axis
    outermost-but-one; online-softmax state (max/denominator rows, packed
    transposed output accumulator) lives in VMEM scratch that persists
    across the sequentially-executed grid. Scores and the accumulator are
    kept TRANSPOSED — (kv, q) and (pack*d, q) — so every per-head slice is
    sublane-aligned (d = 40 is a multiple of the 8-sublane tile) and no
    in-kernel vector transposes are needed. Outputs are written on the last
    chunk and untransposed by XLA outside.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, h, lq, d = q.shape
    lk = k.shape[2]
    pack = _head_pack(d)
    scale = 1.0 / (d**0.5)

    hp = -(-h // pack) * pack
    if hp != h:
        padh = [(0, 0), (0, hp - h), (0, 0), (0, 0)]
        q = jnp.pad(q, padh)
        k = jnp.pad(k, padh)
        v = jnp.pad(v, padh)
    groups = hp // pack
    bg = b * groups

    kv_chunk = 512
    lk_pad = -(-lk // kv_chunk) * kv_chunk
    if lk_pad != lk:
        padkv = [(0, 0), (0, 0), (0, lk_pad - lk), (0, 0)]
        k = jnp.pad(k, padkv)
        v = jnp.pad(v, padkv)
    (q,), lq_pad = _pad_q_rows([q], lq)
    n_chunks = lk_pad // kv_chunk
    dp = d * pack
    block_q = 256 if lq_pad % 256 == 0 else 128
    n_qblocks = lq_pad // block_q

    qr = q.reshape(bg, pack, lq_pad, d)
    # Block-diagonal packed K/V in HBM: (bg, nc, pack*ck, dp), chunk-major.
    eye = jnp.eye(pack, dtype=k.dtype)
    kc_ = k.reshape(bg, pack, n_chunks, kv_chunk, d).transpose(0, 2, 1, 3, 4)
    vc_ = v.reshape(bg, pack, n_chunks, kv_chunk, d).transpose(0, 2, 1, 3, 4)
    kp_bd = jnp.einsum("gnpcd,pq->gnpcqd", kc_, eye).reshape(
        bg, n_chunks, pack * kv_chunk, dp)
    vp_bd = jnp.einsum("gnpcd,pq->gnpcqd", vc_, eye).reshape(
        bg, n_chunks, pack * kv_chunk, dp)

    grid = (bg, n_chunks, n_qblocks)

    def kernel(q_ref, kp_ref, vp_ref, o_ref, lse_ref,
               o_scr, m_scr, l_scr):
        c = pl.program_id(1)
        j = pl.program_id(2)
        cols = pl.ds(j * block_q, block_q)

        @pl.when(c == 0)
        def _init():
            o_scr[:, cols] = jnp.zeros((dp, block_q), jnp.float32)
            m_scr[:, cols] = jnp.full((pack * 8, block_q), -1e30, jnp.float32)
            l_scr[:, cols] = jnp.zeros((pack * 8, block_q), jnp.float32)

        qp = jnp.concatenate(
            [q_ref[0, p] for p in range(pack)], axis=-1)        # (bq, dp)
        kp = kp_ref[0, 0]                                       # (pack*ck, dp)
        vp = vp_ref[0, 0]

        # Transposed scores: (pack*ck, bq); per-head row slices are
        # chunk-aligned.
        s_t = jax.lax.dot_general(
            kp, qp, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        if lk_pad != lk:
            row = jax.lax.broadcasted_iota(
                jnp.int32, (pack * kv_chunk, block_q), 0)
            kv_pos = c * kv_chunk + jax.lax.rem(row, kv_chunk)
            s_t = jnp.where(kv_pos < lk, s_t, -1e30)

        p_parts, alpha_parts = [], []
        for p in range(pack):
            s_h = jax.lax.slice_in_dim(
                s_t, p * kv_chunk, (p + 1) * kv_chunk, axis=0)  # (ck, bq)
            m_old = m_scr[p * 8 : p * 8 + 1, cols]              # (1, bq)
            l_old = l_scr[p * 8 : p * 8 + 1, cols]
            m_new = jnp.maximum(m_old, jnp.max(s_h, axis=0, keepdims=True))
            alpha = jnp.exp(m_old - m_new)                      # (1, bq)
            p_h = jnp.exp(s_h - m_new)                          # (ck, bq)
            m_scr[p * 8 : p * 8 + 1, cols] = m_new
            l_scr[p * 8 : p * 8 + 1, cols] = (
                l_old * alpha + jnp.sum(p_h, axis=0, keepdims=True))
            p_parts.append(p_h)
            alpha_parts.append(jnp.broadcast_to(alpha, (d, block_q)))

        p_t = jnp.concatenate(p_parts, axis=0)                  # (pack*ck, bq)
        alpha_t = jnp.concatenate(alpha_parts, axis=0)          # (dp, bq)
        o_new = o_scr[:, cols] * alpha_t + jax.lax.dot_general(
            vp, p_t.astype(vp.dtype), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)                 # (dp, bq)
        o_scr[:, cols] = o_new

        @pl.when(c == n_chunks - 1)
        def _finish():
            l_pack = jnp.concatenate(
                [jnp.broadcast_to(
                    jnp.maximum(l_scr[p * 8 : p * 8 + 1, cols], 1e-30),
                    (d, block_q))
                 for p in range(pack)], axis=0)                 # (dp, bq)
            o_ref[0] = (o_new / l_pack).astype(o_ref.dtype)
            lse_ref[0] = jnp.concatenate(
                [jnp.broadcast_to(
                    m_scr[p * 8 : p * 8 + 1, cols]
                    + jnp.log(jnp.maximum(
                        l_scr[p * 8 : p * 8 + 1, cols], 1e-30)),
                    (8, block_q))
                 for p in range(pack)], axis=0)                 # (pack*8, bq)

    out, lse = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, pack, block_q, d), lambda i, c, j: (i, 0, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, pack * kv_chunk, dp),
                         lambda i, c, j: (i, c, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, pack * kv_chunk, dp),
                         lambda i, c, j: (i, c, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, dp, block_q), lambda i, c, j: (i, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, pack * 8, block_q), lambda i, c, j: (i, 0, j),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((bg, dp, lq_pad), q.dtype),
            jax.ShapeDtypeStruct((bg, pack * 8, lq_pad), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((dp, lq_pad), jnp.float32),
            pltpu.VMEM((pack * 8, lq_pad), jnp.float32),
            pltpu.VMEM((pack * 8, lq_pad), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * bg * lq_pad * pack * lk_pad * dp,
            bytes_accessed=(qr.size + 2 * kp_bd.size
                            + bg * lq_pad * dp) * q.dtype.itemsize,
            transcendentals=bg * pack * lq_pad * lk_pad,
        ),
        interpret=interpret,
    )(qr, kp_bd, vp_bd)

    # Unpack: (bg, dp, lq) -> (b, groups, pack, d, lq) -> (b, h, lq, d)
    o = out[:, :, :lq].reshape(b, groups, pack, d, lq)
    o = o.transpose(0, 1, 2, 4, 3).reshape(b, hp, lq, d)[:, :h]
    if return_lse:
        lse_h = lse.reshape(b, groups, pack, 8, lq_pad)[:, :, :, 0, :lq]
        lse_h = lse_h.reshape(b, hp, lq)[:, :h]
        return o, lse_h
    return o


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
    # K/V length stays UNPADDED in HBM (see _zero_tail_rows).
    lk_pad = -(-lk // 128) * 128
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
    kr = k.reshape(bh, lk, d)
    vr = v.reshape(bh, lk, d)
    # Re-pad the LSE sublane dim for the TPU tiling constraint.
    lser = jnp.broadcast_to(lse.reshape(bh, 1, lq_pad), (bh, 8, lq_pad))
    orr = o.reshape(bh, lq_pad, d)
    gr = g.reshape(bh, lq_pad, d)

    # Chunk the KV axis inside the kernel: the concurrently-live score-sized
    # temporaries (s/p, dp, ds) shrink from (bq, lk_pad) to (bq, chunk),
    # keeping the whole working set inside scoped VMEM at any KV length.
    # The VMEM block is padded up to a whole number of chunks (the partial
    # tail is masked/zeroed in-kernel) — chunking at 128 to make the chunk
    # count divide exactly measured ~2x slower at the fuser's 4126-token KV.
    kv_chunk = min(lk_pad, 512)
    lk_pad = -(-lk_pad // kv_chunk) * kv_chunk
    n_chunks = lk_pad // kv_chunk

    def kernel(q_ref, k_ref, v_ref, lse_ref, o_ref, g_ref,
               dq_ref, dk_ref, dv_ref):
        j = pl.program_id(1)
        qb = q_ref[0].astype(jnp.float32)
        qbs = qb * scale  # scale folded into the (bq, d) block, not the scores
        ob = o_ref[0].astype(jnp.float32)
        gb = g_ref[0].astype(jnp.float32)
        lseb = lse_ref[0, 0]
        delta = jnp.sum(gb * ob, axis=-1, keepdims=True)     # (bq, 1)

        dq_acc = jnp.zeros((qb.shape[0], d), jnp.float32)
        for c in range(n_chunks):
            sl = pl.ds(c * kv_chunk, kv_chunk)
            kc = k_ref[0, sl].astype(jnp.float32)            # (chunk, d)
            vc = v_ref[0, sl].astype(jnp.float32)
            if lk_pad != lk and (c + 1) * kv_chunk > lk:
                kc = _zero_tail_rows(kc, lk - c * kv_chunk)
                vc = _zero_tail_rows(vc, lk - c * kv_chunk)

            s = jax.lax.dot_general(
                qbs, kc, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            if lk_pad != lk:
                col = jax.lax.broadcasted_iota(jnp.int32, s.shape, dimension=1)
                s = jnp.where(col + c * kv_chunk < lk, s, _NEG_INF)
            p = jnp.exp(s - lseb[:, None])                   # rows sum to 1

            dp = jax.lax.dot_general(
                gb, vc, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            ds = p * (dp - delta) * scale                    # (bq, chunk)

            # (Feeding p/ds to these matmuls in bf16 was measured neutral at
            # 4096 KV and slower at 1024 — the binding chain is the f32
            # exp/elementwise work, not matmul operand bytes.)
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
            jax.ShapeDtypeStruct((bh, lk, d), jnp.float32),
            jax.ShapeDtypeStruct((bh, lk, d), jnp.float32),
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


def _use_packed(q) -> bool:
    # Measured on-chip (min of 3x30 reps, bf16, batch 16): the block-diagonal
    # K/V materialization costs more HBM traffic than the narrow-contraction
    # MXU win at every SD shape — 4096x4096 d40: plain 13.4ms vs pack-3
    # 22.0ms / pack-2 17.2ms / pack-1 16.5ms; 1024x1024 d80: plain 1.91ms vs
    # transposed 2.22ms; 256x256 d160: 1.18ms vs 1.28ms. Kept as a tested,
    # opt-in experiment (LMDX_PACKED_ATTENTION=1) — never auto-dispatched.
    return os.environ.get("LMDX_PACKED_ATTENTION", "0") == "1"


@jax.custom_vjp
def _flash_attention_ad(q, k, v):
    if _use_packed(q):
        return _pallas_attention_packed(q, k, v)
    return _pallas_attention(q, k, v)


def _flash_fwd(q, k, v):
    if _use_packed(q):
        o, lse = _pallas_attention_packed(q, k, v, return_lse=True)
    else:
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


# ---------------------------------------------------------------------------
# Fused-heads kernel: attention directly on (B, L, heads*head_dim) tensors.
#
# The projection Dense layers produce activations with heads*head_dim on the
# minor (lane) axis; the per-head kernels above need head_dim minor with the
# head axis folded into the grid, and XLA materializes that relayout as HBM
# copies around every attention call (~0.85 ms each at the 4096-token level,
# ~14 ms per batch-16 UNet forward, measured from an xplane trace). This
# kernel instead takes the projection layout verbatim and slices heads with
# static lane offsets inside VMEM, so no HBM relayout exists in either
# direction. It also subsumes the small-KV (77-token cross-attention) case
# that previously fell back to a materialized XLA softmax: K/V ride along as
# a partial edge block and the score matrix never reaches HBM.
#
# K/V ride ordinary pipelined BlockSpecs (full-KV blocks, revisited across
# q-blocks so Pallas re-fetches nothing), which double-buffers them; the
# envelope check keeps the kernel to shapes where that fits scoped VMEM next
# to the score buffers. That covers every cross-attention (77-token KV) and
# the 1024/256/64-token levels; 4096-token self/fuser attention stays on the
# per-head kernel above. (A single-buffered manual-DMA variant was tried and
# rejected by Mosaic: memref slices must be 128-lane aligned, and
# heads*head_dim = 320 is not.)
# ---------------------------------------------------------------------------


@functools.partial(jax.jit,
                   static_argnames=("heads", "interpret", "return_lse"))
def _pallas_attention_fusedheads(qf, kf, vf, heads,
                                 interpret=False, return_lse=False):
    """qf: (b, lq, heads*d); kf/vf: (b, lk, heads*d) -> (b, lq, heads*d)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, lq, hd = qf.shape
    lk = kf.shape[1]
    d = hd // heads
    scale = 1.0 / (d**0.5)
    lk_pad = -(-lk // 128) * 128

    lq_pad = -(-lq // 128) * 128
    if lq_pad != lq:
        qf = jnp.pad(qf, [(0, 0), (0, lq_pad - lq), (0, 0)])

    block_q = _fusedheads_block_q(lq_pad, lk_pad, hd, qf.dtype.itemsize)
    grid = (b, lq_pad // block_q)

    def kernel(q_ref, k_ref, v_ref, o_ref, lse_ref):
        kb = k_ref[0]
        vb = v_ref[0]
        if lk_pad != lk:
            # Partial edge block: the tail rows are undefined VMEM and
            # 0 * inf = NaN would leak through the AV matmul.
            kb = _zero_tail_rows(kb, lk)
            vb = _zero_tail_rows(vb, lk)

        for h in range(heads):
            lanes = slice(h * d, (h + 1) * d)
            qh = q_ref[0][:, lanes].astype(jnp.float32)      # (bq, d)
            kh = kb[:, lanes].astype(jnp.float32)            # (lk_pad, d)
            vh = vb[:, lanes].astype(jnp.float32)
            s = jax.lax.dot_general(
                qh, kh, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale  # (bq, lk_pad)
            if lk_pad != lk:
                col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
                s = jnp.where(col < lk, s, _NEG_INF)
            m = jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp(s - m)
            denom = jnp.sum(p, axis=-1, keepdims=True)
            o = jnp.dot(p, vh, preferred_element_type=jnp.float32) / denom
            o_ref[0, :, lanes] = o.astype(o_ref.dtype)
            lse_row = (m + jnp.log(denom))[:, 0]
            lse_ref[0, h] = jnp.broadcast_to(
                lse_row[None, :], (8, lse_row.shape[0]))

    out, lse = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, hd), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lk_pad, hd), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lk_pad, hd), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, block_q, hd), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, heads, 8, block_q), lambda i, j: (i, 0, 0, j),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, lq_pad, hd), qf.dtype),
            jax.ShapeDtypeStruct((b, heads, 8, lq_pad), jnp.float32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * b * heads * lq * lk_pad * d,
            bytes_accessed=(qf.size + kf.size + vf.size
                            + b * lq * hd) * qf.dtype.itemsize,
            transcendentals=b * heads * lq * lk_pad,
        ),
        interpret=interpret,
    )(qf, kf, vf)

    out = out[:, :lq]
    if return_lse:
        return out, lse[:, :, 0, :lq]
    return out


def _fusedheads_vmem(bq: int, lk_pad: int, hd: int, itemsize: int) -> int:
    return (2 * bq * lk_pad * 4              # s, p f32 (one head live)
            + 4 * lk_pad * hd * itemsize     # k/v blocks, double-buffered
            + 4 * bq * hd * itemsize)        # q/o blocks, double-buffered


_FUSEDHEADS_VMEM_BUDGET = 11 * 1024 * 1024


def _fusedheads_block_q(lq_pad: int, lk_pad: int, hd: int,
                        itemsize: int) -> int:
    for bq in (512, 256, 128):
        if lq_pad % bq != 0:
            continue
        if _fusedheads_vmem(bq, lk_pad, hd, itemsize) < _FUSEDHEADS_VMEM_BUDGET:
            return bq
    return 128


def _fusedheads_supported(qf, kf, heads) -> bool:
    # Measured on-chip: the per-head lane extracts (heads*head_dim = 320
    # lanes, head slices at 40-lane offsets -> Mosaic lane rotations) cost
    # almost exactly what the HBM head-split relayouts they replace cost —
    # batch-16 fuser UNet forward 208.7 ms (off) vs 210.4 ms (on); standalone
    # 4096x77 cross-attention 2.25 ms vs 1.66 ms for split+XLA. Kept as a
    # tested opt-in (LMDX_FUSED_HEADS=1) — never auto-dispatched.
    if os.environ.get("LMDX_FUSED_HEADS", "0") != "1":
        return False
    b, lq, hd = qf.shape
    lk = kf.shape[1]
    d = hd // heads
    if hd % heads or d % 8 or d > 256 or lq < 8:
        return False
    lk_pad = -(-lk // 128) * 128
    return (_fusedheads_vmem(128, lk_pad, hd, qf.dtype.itemsize)
            < _FUSEDHEADS_VMEM_BUDGET)


def _split_heads_bhld(x, heads):
    b, l, hd = x.shape
    return x.reshape(b, l, heads, hd // heads).transpose(0, 2, 1, 3)


def _merge_heads_blhd(x):
    b, h, l, d = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, l, h * d)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _fusedheads_ad(qf, kf, vf, heads):
    return _pallas_attention_fusedheads(qf, kf, vf, heads)


def _fusedheads_fwd(qf, kf, vf, heads):
    o, lse = _pallas_attention_fusedheads(qf, kf, vf, heads, return_lse=True)
    return o, (qf, kf, vf, lse, o)


def _fusedheads_bwd(heads, residuals, g):
    # The backward runs only inside guidance iterations; it reuses the
    # per-head flash backward, paying the head relayout there alone.
    qf, kf, vf, lse, o = residuals
    q = _split_heads_bhld(qf, heads)
    k = _split_heads_bhld(kf, heads)
    v = _split_heads_bhld(vf, heads)
    dq, dk, dv = _pallas_attention_bwd(
        q, k, v, lse, _split_heads_bhld(o, heads), _split_heads_bhld(g, heads))
    return (_merge_heads_blhd(dq), _merge_heads_blhd(dk),
            _merge_heads_blhd(dv))


_fusedheads_ad.defvjp(_fusedheads_fwd, _fusedheads_bwd)


def flash_attention_hd(qf: jnp.ndarray, kf: jnp.ndarray, vf: jnp.ndarray,
                       heads: int,
                       force_xla: bool | None = None) -> jnp.ndarray:
    """Fused attention on projection-layout (B, L, heads*head_dim) tensors.

    Falls back to the per-head path (split -> flash/XLA -> merge) off-TPU or
    outside the kernel envelope."""
    if force_xla is None:
        force_xla = os.environ.get("LMDX_DISABLE_PALLAS", "0") == "1"
    on_tpu = jax.default_backend() == "tpu"
    if not force_xla and on_tpu and _fusedheads_supported(qf, kf, heads):
        return _fusedheads_ad(qf, kf, vf, heads)
    q = _split_heads_bhld(qf, heads)
    k = _split_heads_bhld(kf, heads)
    v = _split_heads_bhld(vf, heads)
    return _merge_heads_blhd(flash_attention(q, k, v, force_xla=force_xla))


def fusedheads_attention_interpret(qf, kf, vf, heads, return_lse=False):
    """Interpreter-mode entry for CPU tests of the fused-heads kernel."""
    return _pallas_attention_fusedheads(qf, kf, vf, heads, interpret=True,
                                        return_lse=return_lse)


def flash_attention_interpret(q, k, v):
    """Interpreter-mode entry for CPU correctness tests of the kernel."""
    return _pallas_attention(q, k, v, interpret=True)


def packed_attention_interpret(q, k, v, return_lse=False):
    """Interpreter-mode entry for CPU tests of the head-packed kernel."""
    return _pallas_attention_packed(q, k, v, interpret=True,
                                    return_lse=return_lse)
