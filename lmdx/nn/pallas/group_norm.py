"""Fused GroupNorm(+SiLU) with a Pallas reduction kernel (TPU).

Hypothesis tested: the ~24 ms of GroupNorm reduce_fusions in the batch-16
UNet forward profile looked like an order of magnitude over the
HBM-bandwidth bound, so this kernel reduces each (batch, channel-tile)
block over the spatial dimension in one pass at full lane occupancy; group
statistics then come from a tiny per-channel segment reduction, and the
normalize(+affine, +SiLU) stays in XLA. See MEASURED RESULT below — the
hypothesis was wrong.

Layout notes:
- input is viewed (B, N=H*W, C): N rides the sublane axis (clean 8-row
  tiling for any SD level), C rides lanes in 128-wide tiles.
- SD channel counts (320/640/960/1280/1920/2560) are not all multiples of
  128: the edge channel tile is masked IN-KERNEL with an iota test — the
  padded VMEM tail is undefined on real TPUs and would corrupt the sums
  (same hazard as flash_attention._zero_tail_rows).
- one kernel serves forward and backward: it emits per-(B, C) sum(a) and
  sum(a*b); forward calls it with b=a (sum, sumsq), backward with
  (dy_pre, x_hat) which covers dbeta/dgamma (per-channel) and the two
  per-group moments of the dx formula.

The public entry `group_norm` is a drop-in for flax GroupNorm + optional
trailing SiLU with an exact custom VJP (guidance differentiates through
every norm in the UNet).

MEASURED RESULT (v5e, batch-16 SD UNet forward): the kernel LOSES — 190.1
ms vs 182.5 ms for plain XLA GroupNorm. XLA fuses the stats reduce into
the producing conv/elementwise epilogue, so the "24 ms of reduce_fusions"
in the profile is already shared work; a separate stats pass re-reads the
activations and breaks that fusion. Kept as an OPT-IN experiment
(LMDX_PALLAS_GROUPNORM=1 with the FusedGroupNorm module wired in); the
product UNet stays on nn.GroupNorm.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

LANE = 128


def _use_kernel(x) -> bool:
    if os.environ.get("LMDX_PALLAS_GROUPNORM", "0") != "1":
        return False
    try:
        platform = x.devices().pop().platform if hasattr(x, "devices") else (
            jax.default_backend())
    except Exception:
        platform = jax.default_backend()
    return platform in ("tpu", "axon")


@functools.partial(jax.jit, static_argnames=("interpret",))
def pair_stats(a, b, interpret: bool = False):
    """Per-(B, C) [sum(a), sum(a*b)] over the spatial axis.

    a, b: (B, N, C) (any float dtype; accumulation in f32).
    Returns (sum_a, sum_ab) each (B, C) f32.
    """
    bsz, n, c = a.shape
    n_tiles = pl.cdiv(c, LANE)
    c_pad = n_tiles * LANE

    def kernel(a_ref, b_ref, sa_ref, sab_ref):
        ti = pl.program_id(1)
        a_blk = a_ref[0].astype(jnp.float32)
        b_blk = b_ref[0].astype(jnp.float32)
        # static specialization: a partial tile exists only when c % LANE != 0,
        # and only the LAST tile can be partial. The padded VMEM tail is
        # undefined on real TPUs — mask before summing.
        if c % LANE != 0:
            c_valid = jnp.where(ti == n_tiles - 1,
                                c - (n_tiles - 1) * LANE, LANE)
            col = jax.lax.broadcasted_iota(jnp.int32, a_blk.shape, dimension=1)
            keep = col < c_valid
            a_blk = jnp.where(keep, a_blk, 0.0)
            b_blk = jnp.where(keep, b_blk, 0.0)
        # outputs carry an 8-row sublane axis (Mosaic block constraint);
        # row 0 holds the sums, the caller slices it off.
        sa_ref[0] = jnp.broadcast_to(jnp.sum(a_blk, axis=0), (8, LANE))
        sab_ref[0] = jnp.broadcast_to(jnp.sum(a_blk * b_blk, axis=0),
                                      (8, LANE))

    sa, sab = pl.pallas_call(
        kernel,
        grid=(bsz, n_tiles),
        in_specs=[
            pl.BlockSpec((1, n, LANE), lambda i, j: (i, 0, j)),
            pl.BlockSpec((1, n, LANE), lambda i, j: (i, 0, j)),
        ],
        out_specs=[
            pl.BlockSpec((1, 8, LANE), lambda i, j: (i, 0, j)),
            pl.BlockSpec((1, 8, LANE), lambda i, j: (i, 0, j)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bsz, 8, c_pad), jnp.float32),
            jax.ShapeDtypeStruct((bsz, 8, c_pad), jnp.float32),
        ],
        interpret=interpret,
    )(a, b)
    return sa[:, 0, :c], sab[:, 0, :c]


def _group_moments(sum_c, sumsq_c, groups: int, n: int):
    """(B, C) channel sums -> per-group mean / raw second moment."""
    bsz, c = sum_c.shape
    per = c // groups
    count = float(n * per)
    m1 = sum_c.reshape(bsz, groups, per).sum(-1) / count
    m2 = sumsq_c.reshape(bsz, groups, per).sum(-1) / count
    return m1, m2


def _xla_stats(x3, groups: int):
    bsz, n, c = x3.shape
    xg = x3.astype(jnp.float32).reshape(bsz, n, groups, c // groups)
    mean = xg.mean(axis=(1, 3))
    var = jnp.square(xg).mean(axis=(1, 3)) - jnp.square(mean)
    return mean, var


def _broadcast_group(v, groups: int, c: int):
    """(B, G) -> (B, 1, C) by repeating each group's value over its channels."""
    bsz = v.shape[0]
    return jnp.repeat(v, c // groups, axis=-1).reshape(bsz, 1, c)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def group_norm(x, scale, bias, groups: int, eps: float = 1e-5,
               apply_silu: bool = False, interpret: bool = False):
    """GroupNorm over the channel (last) axis of NHWC input, optional fused
    trailing SiLU. Drop-in semantics of flax nn.GroupNorm (f32 compute)."""
    y, _ = _gn_fwd(x, scale, bias, groups, eps, apply_silu, interpret)
    return y


def _gn_fwd(x, scale, bias, groups, eps, apply_silu, interpret):
    shape = x.shape
    bsz, c = shape[0], shape[-1]
    x3 = x.reshape(bsz, -1, c)
    n = x3.shape[1]

    if _use_kernel(x) or interpret:
        s, sq = pair_stats(x3, x3, interpret=interpret)
        mean, m2 = _group_moments(s, sq, groups, n)
        var = m2 - jnp.square(mean)
    else:
        mean, var = _xla_stats(x3, groups)

    rstd = jax.lax.rsqrt(var + eps)
    mean_b = _broadcast_group(mean, groups, c)
    rstd_b = _broadcast_group(rstd, groups, c)
    x_hat = (x3.astype(jnp.float32) - mean_b) * rstd_b
    y = x_hat * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    if apply_silu:
        y = y * jax.nn.sigmoid(y)
    return y.astype(x.dtype).reshape(shape), (x, scale, bias, mean, rstd)


def _gn_bwd(groups, eps, apply_silu, interpret, res, g):
    x, scale, bias, mean, rstd = res
    shape = x.shape
    bsz, c = shape[0], shape[-1]
    x3 = x.reshape(bsz, -1, c)
    n = x3.shape[1]
    g3 = g.reshape(bsz, -1, c).astype(jnp.float32)

    mean_b = _broadcast_group(mean, groups, c)
    rstd_b = _broadcast_group(rstd, groups, c)
    x_hat = (x3.astype(jnp.float32) - mean_b) * rstd_b

    if apply_silu:
        y_pre = x_hat * scale.astype(jnp.float32) + bias.astype(jnp.float32)
        sig = jax.nn.sigmoid(y_pre)
        g3 = g3 * (sig * (1.0 + y_pre * (1.0 - sig)))

    # All four reductions from ONE pair-stats pass over (g3, x_hat):
    #   per-channel: dbeta = sum g3 ; dgamma = sum g3*x_hat
    #   per-group:   m1 = mean(dx_hat), m2 = mean(dx_hat*x_hat) where
    #   dx_hat = g3*scale — channel-wise scale folds into the channel sums.
    if _use_kernel(x) or interpret:
        s_g, s_gx = pair_stats(g3, x_hat, interpret=interpret)
    else:
        s_g = g3.sum(axis=1)
        s_gx = (g3 * x_hat).sum(axis=1)
    dbias = s_g.sum(axis=0).astype(bias.dtype)
    dscale = s_gx.sum(axis=0).astype(scale.dtype)

    per = c // groups
    count = float(n * per)
    sc = scale.astype(jnp.float32)[None]                      # (1, C)
    m1 = (s_g * sc).reshape(bsz, groups, per).sum(-1) / count  # (B, G)
    m2 = (s_gx * sc).reshape(bsz, groups, per).sum(-1) / count

    dx_hat = g3 * sc[:, None]
    dx = rstd_b * (dx_hat - _broadcast_group(m1, groups, c)
                   - x_hat * _broadcast_group(m2, groups, c))
    return dx.astype(x.dtype).reshape(shape), dscale, dbias


group_norm.defvjp(_gn_fwd, _gn_bwd)


import flax.linen as nn  # noqa: E402  (module def after kernel code)


class FusedGroupNorm(nn.Module):
    """flax.nn.GroupNorm drop-in (same param tree: scale/bias) that takes
    the Pallas stats path on TPU, with an optional fused trailing SiLU."""

    num_groups: int
    epsilon: float = 1e-5
    apply_silu: bool = False

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        return group_norm(x, scale, bias, self.num_groups, self.epsilon,
                          self.apply_silu, False)
