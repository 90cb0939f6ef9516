"""Fused global attention for the SAM ViT encoder (Pallas, TPU).

SAM ViT-B's four global-attention layers at the 1024² input are the single
largest score matrices in the whole system: grid 64 → 4096 tokens × 12 heads,
so one layer materializes a (B, 12, 4096, 4096) f32 score tensor — 3.2 GB at
the segmenter's 4-image chunk — and the decomposed relative-position add
(ViTDet: bias[q,k] = q·Rh[qh,kh] + q·Rw[qw,kw]) costs several more full
passes over it (reshape to (B,12,64,64,64,64), two broadcast adds, reshape
back, f32 softmax). The reference runs this exact math in torch
(models/sam.py:25-55 → transformers SamVisionAttention); on TPU it is pure
HBM-bandwidth waste.

This kernel keeps the score block in VMEM and injects the decomposed bias
WITHOUT materializing it, via an augmented matmul: the (q, k) bias decomposes
as bias_h[q, kh(k)] + bias_w[q, kw(k)] where bias_h = q·Rh and bias_w = q·Rw
are small (lq, grid)-wide tensors computed outside. Inside the kernel

    s = (q·scale) @ K^T  +  [bias_h | bias_w] @ onehot^T

where onehot is the static (lk, gh+gw) 0/1 matrix with onehot[k] the
concatenated one-hots of (kh(k), kw(k)). The second matmul is an MXU-friendly
gather — the one-hot contraction broadcasts each bias column to the 64 score
columns that share its kh (resp. kw). Probabilities never touch HBM; the
softmax denominator rides the AV matmul as a ones column (same trick as
flash_attention.py).

Forward-only: the segmenter is inference-only (no gradient ever flows through
SAM in any pipeline path, reference models/sam.py wraps it in no_grad).

Falls back to the plain XLA path off-TPU and for shapes outside the envelope.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from .flash_attention import _pad_q_rows, _zero_tail_rows

_NEG_INF = float("-inf")


def xla_sam_attention(q, k, v, bias_h, bias_w):
    """Reference path: materialized scores + decomposed rel-pos add.

    q, k, v: (B, H, N, d); bias_h: (B, H, N, gh); bias_w: (B, H, N, gw)
    with N = gh * gw and key index n = kh * gw + kw.
    """
    b, h, n, d = q.shape
    gh = bias_h.shape[-1]
    gw = bias_w.shape[-1]
    scale = d**-0.5
    s = jnp.einsum("bhqd,bhkd->bhqk", q.astype(jnp.float32) * scale,
                   k.astype(jnp.float32),
                   preferred_element_type=jnp.float32)
    s = s.reshape(b, h, n, gh, gw)
    s = s + bias_h.astype(jnp.float32)[..., :, None]
    s = s + bias_w.astype(jnp.float32)[..., None, :]
    s = s.reshape(b, h, n, n)
    p = jax.nn.softmax(s, axis=-1).astype(v.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", p, v)


def _onehot_kh_kw(gh: int, gw: int) -> np.ndarray:
    """(gh*gw, gh+gw) 0/1 matrix: row k = onehot(kh(k)) ++ onehot(kw(k))."""
    oh_h = np.repeat(np.eye(gh, dtype=np.float32), gw, axis=0)
    oh_w = np.tile(np.eye(gw, dtype=np.float32), (gh, 1))
    return np.concatenate([oh_h, oh_w], axis=1)


def _pick_block_q(lq_pad: int, lk_pad: int, d: int,
                  bw_pad: int) -> int | None:
    """Largest divisible q-block fitting the forward VMEM budget: the f32
    score buffer plus its bf16 probability copy (distinct sizes, so no Mosaic
    liveness reuse), the bf16 K/V/onehot blocks revisited across q-steps, and
    the small q/bias/out blocks. Returns None when even the 128-row block
    oversubscribes the budget — callers route that shape to the XLA fallback
    (_kernel_supported shares this exact accounting, so the envelope check
    and the kernel can never disagree)."""
    budget = 11 * 1024 * 1024
    de = -(-(d + 1) // 8) * 8
    for bq in (512, 256, 128):
        if lq_pad % bq != 0:
            continue
        vmem = (bq * lk_pad * 4               # f32 score buffer
                + bq * lk_pad * 2             # bf16 probabilities
                + lk_pad * d * 2              # k (bf16)
                + lk_pad * de * 2             # v extended with ones column
                + lk_pad * bw_pad * 2         # onehot (bf16)
                + bq * (d + bw_pad + 2 * d) * 4)
        if vmem < budget:
            return bq
    return None


@functools.partial(jax.jit, static_argnames=("interpret",))
def _pallas_sam_attention(q, k, v, biasq, onehot, interpret=False):
    """q, k, v: (B, H, L, d); biasq: (B, H, L, bw); onehot: (L, bw)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, h, lq, d = q.shape
    lk = k.shape[2]
    bw = biasq.shape[-1]
    bh = b * h
    scale = 1.0 / (d**0.5)

    # Pad the bias width to the 128-lane tile with zero columns (zero rows in
    # onehot → zero score contribution, exactly).
    bw_pad = -(-bw // 128) * 128
    if bw_pad != bw:
        biasq = jnp.pad(biasq, ((0, 0), (0, 0), (0, 0), (0, bw_pad - bw)))
        onehot = jnp.pad(onehot, ((0, 0), (0, bw_pad - bw)))

    lk_pad = -(-lk // 128) * 128
    (q, biasq), lq_pad = _pad_q_rows([q, biasq], lq)

    block_q = _pick_block_q(lq_pad, lk_pad, d, bw_pad)
    assert block_q is not None, (
        f"no q-block fits VMEM for lq={lq} lk={lk} d={d} bw={bw}; "
        "callers must gate on _kernel_supported (XLA fallback)")
    grid = (bh, lq_pad // block_q)

    qr = q.reshape(bh, lq_pad, d)
    kr = k.reshape(bh, lk, d)
    vr = v.reshape(bh, lk, d)
    br = biasq.reshape(bh, lq_pad, bw_pad)

    de = -(-(d + 1) // 8) * 8  # V extended with [ones | zeros] columns

    # All three dots run as NATIVE bf16 x bf16 -> f32 MXU matmuls (f32
    # operands would run the MXU at a fraction of peak). The softmax itself
    # stays f32. Half-precision-class operands mirror the reference's
    # regime — it runs SAM under torch.autocast fp16 (models/sam.py:27-31) —
    # but bf16 is an approximation of fp16 (3 fewer mantissa bits), not
    # numeric parity: measured max|diff| ~1e-3 vs the f32 XLA path
    # (PARITY.md), mask-level outputs verified identical (thresholds sit
    # far above the noise floor).
    def kernel(q_ref, k_ref, v_ref, b_ref, oh_ref, o_ref):
        qb = q_ref[0].astype(jnp.bfloat16)
        kb = k_ref[0].astype(jnp.bfloat16)
        vb = v_ref[0].astype(jnp.bfloat16)
        bb = b_ref[0].astype(jnp.bfloat16)
        ohb = oh_ref[...].astype(jnp.bfloat16)
        if lk_pad != lk:
            kb = _zero_tail_rows(kb, lk)
            vb = _zero_tail_rows(vb, lk)
            ohb = _zero_tail_rows(ohb, lk)
        s = jax.lax.dot_general(
            qb, kb, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        s = s + jax.lax.dot_general(
            bb, ohb, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        if lk_pad != lk:
            col = jax.lax.broadcasted_iota(jnp.int32, s.shape, dimension=1)
            s = jnp.where(col < lk, s, _NEG_INF)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m).astype(jnp.bfloat16)
        vext = jnp.concatenate(
            [vb, jnp.ones((vb.shape[0], 1), vb.dtype),
             jnp.zeros((vb.shape[0], de - d - 1), vb.dtype)], axis=1)
        if lk_pad != lk:
            # Mask the 2D extended block, not the (rows, 1) ones column —
            # Mosaic rejects the 1-lane bool vector's relayout ("Invalid
            # relayout ... vector<256x1xi1>", seen at the 196-token windowed
            # shape). vb's tail rows are already zero; re-zeroing them in
            # vext is free and keeps one mask shape.
            vext = _zero_tail_rows(vext, lk)
        oe = jax.lax.dot_general(
            p, vext, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        o_ref[0] = (oe[:, :d] / oe[:, d : d + 1]).astype(o_ref.dtype)

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
            pl.BlockSpec((1, block_q, bw_pad), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((lk_pad, bw_pad), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bh, lq_pad, d), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * bh * lq * lk_pad * (d + bw_pad + de),
            bytes_accessed=(qr.size + kr.size + vr.size + br.size
                            + bh * lq * d) * q.dtype.itemsize,
            transcendentals=bh * lq * lk_pad,
        ),
        interpret=interpret,
    )(qr, kr, vr, br, onehot)
    return out[:, :lq].reshape(b, h, lq, d)


def _kernel_supported(q, gh: int, gw: int) -> bool:
    *_, lq, d = q.shape
    if lq != gh * gw or d > 128 or d % 8 != 0:
        return False
    # Floor 196 covers every SAM ViT shape: the 14x14 windowed layers
    # (196 tokens x 1200 head-batches at B=4 — measured 138.8 -> 112.3 ms
    # encoder when routed through the kernel, the bias-materialization +
    # window-relayout passes dominating the tiny matmuls) and the 64x64
    # global layers. Smaller grids exist only in CPU tests (XLA fallback).
    # LMDX_SAM_FLASH_MIN_TOKENS overrides for tuning experiments.
    if lq < int(os.environ.get("LMDX_SAM_FLASH_MIN_TOKENS", "196")):
        return False
    # Some q-block must fit scoped VMEM — the exact buffer accounting lives
    # in _pick_block_q (shared with the kernel itself, so this gate and the
    # kernel's block choice cannot drift apart).
    lq_pad = -(-lq // 128) * 128
    lk_pad = lq_pad  # self-attention: lk == lq
    bw_pad = -(-(gh + gw) // 128) * 128
    return _pick_block_q(lq_pad, lk_pad, d, bw_pad) is not None


def sam_global_attention(q, k, v, bias_h, bias_w,
                         force_xla: bool | None = None):
    """Fused SAM global self-attention with decomposed rel-pos bias.

    q, k, v: (B, H, N, d) with N = gh*gw tokens in row-major (kh, kw) order;
    bias_h = q·Rh: (B, H, N, gh); bias_w = q·Rw: (B, H, N, gw). The softmax
    scale 1/sqrt(d) applies to q·k only — the bias is added unscaled, matching
    ViTDet/SAM (transformers SamVisionAttention.forward).
    """
    if force_xla is None:
        force_xla = os.environ.get("LMDX_DISABLE_PALLAS", "0") == "1"
    gh = bias_h.shape[-1]
    gw = bias_w.shape[-1]
    on_tpu = jax.default_backend() == "tpu"
    if force_xla or not on_tpu or not _kernel_supported(q, gh, gw):
        return xla_sam_attention(q, k, v, bias_h, bias_w)
    biasq = jnp.concatenate([bias_h.astype(jnp.float32),
                             bias_w.astype(jnp.float32)], axis=-1)
    onehot = jnp.asarray(_onehot_kh_kw(gh, gw))
    return _pallas_sam_attention(q, k, v, biasq, onehot)


def sam_attention_interpret(q, k, v, bias_h, bias_w):
    """Interpret-mode kernel entry for CPU tests."""
    gh = bias_h.shape[-1]
    gw = bias_w.shape[-1]
    biasq = jnp.concatenate([bias_h.astype(jnp.float32),
                             bias_w.astype(jnp.float32)], axis=-1)
    onehot = jnp.asarray(_onehot_kh_kw(gh, gw))
    return _pallas_sam_attention(q, k, v, biasq, onehot, interpret=True)
