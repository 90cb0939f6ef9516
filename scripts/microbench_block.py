"""Where the UNet's non-MXU milliseconds live: in-jit chained motifs (TPU).

Standalone dispatches over the axon tunnel pay a ~1.6 ms floor (measured:
standalone GroupNorm times are constant across 4x data sizes), so every
motif here is applied K times inside ONE jitted lax.scan — per-iteration
cost amortizes the dispatch floor 20x and matches how the motifs actually
run (inside the sampler scan).

Measured per SD1.5 level shape at batch 16 (the overall CFG batch):
  a) bare 3x3 conv pair (the ResnetBlock skeleton) + MFU
  b) the REAL ResnetBlock (GN/SiLU/temb-add/residual around the convs)
  c) the REAL Transformer2D (GN + proj + LN/self/cross/FF with the Pallas
     flash kernel)
  d) conv variants at the worst level: 1x1 conv (pure-matmul ceiling for
     the same arithmetic), channels padded 320->384 (lane alignment)
then a composition check: sum(level motif times x SD1.5 motif counts) vs
the measured full UNet CFG forward (BASELINE.md: 180 ms at batch 16).

    python scripts/microbench_block.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from lmdx.runtime import jit_cache

jit_cache.enable()

from lmdx.nn import attention as A  # noqa: E402
from lmdx.nn import blocks as B  # noqa: E402

PEAK = 197e12  # bf16 peak, one v5e chip
K = 20         # chain length inside one jit


def _fetch_sync(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(jax.device_get(leaf.ravel()[:1]))


def timed_chain(apply_fn, params, x, extras=(), reps=5):
    """Per-application seconds for K chained applications in one dispatch."""

    def chain(p, x0, *ex):
        def body(h, _):
            return apply_fn(p, h, *ex), None

        return jax.lax.scan(body, x0, None, length=K)[0]

    f = jax.jit(chain)
    out = f(params, x, *extras)
    _fetch_sync(out)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = f(params, x, *extras)
        _fetch_sync(out)
        best = min(best, (time.perf_counter() - t0) / K)
    return best


class ConvPair(nn.Module):
    ch: int
    kernel: int = 3

    @nn.compact
    def __call__(self, x):
        k = (self.kernel, self.kernel)
        pad = self.kernel // 2
        h = nn.Conv(self.ch, k, padding=pad, dtype=jnp.bfloat16)(x)
        return nn.Conv(self.ch, k, padding=pad, dtype=jnp.bfloat16)(h)


def conv_flops(b, hw, cin, cout, kernel=3):
    return 2 * b * hw * hw * cin * cout * kernel * kernel


def resnet_flops(b, hw, ch):
    return 2 * conv_flops(b, hw, ch, ch) + 2 * b * 1280 * ch


def tx_flops(b, hw, ch, ctx_len=77, ctx_dim=768):
    n = hw * hw
    proj = 2 * (2 * b * n * ch * ch)
    attn1 = 4 * (2 * b * n * ch * ch) + 4 * b * n * n * ch
    attn2 = (2 * (2 * b * n * ch * ch) + 2 * (2 * b * ctx_len * ctx_dim * ch)
             + 4 * b * n * ctx_len * ch)
    ff = 24 * b * n * ch * ch
    return proj + attn1 + attn2 + ff


def bench_level(b, hw, ch, heads, key):
    x = jax.device_put(jax.random.normal(key, (b, hw, hw, ch), jnp.bfloat16))
    t_emb = jax.device_put(jax.random.normal(key, (b, 1280), jnp.bfloat16))
    ctx = jax.device_put(jax.random.normal(key, (b, 77, 768), jnp.bfloat16))

    cp = ConvPair(ch)
    pcp = jax.jit(cp.init)(key, x)["params"]
    t_cp = timed_chain(lambda p, h: cp.apply({"params": p}, h), pcp, x)
    f_cp = 2 * conv_flops(b, hw, ch, ch)

    rb = B.ResnetBlock(out_channels=ch, dtype=jnp.bfloat16)
    prb = jax.jit(rb.init)(key, x, t_emb)["params"]
    t_rb = timed_chain(lambda p, h, t: rb.apply({"params": p}, h, t),
                       prb, x, (t_emb,))
    f_rb = resnet_flops(b, hw, ch)

    tx = A.Transformer2D(channels=ch, heads=heads, head_dim=ch // heads,
                         context_dim=768, depth=1, dtype=jnp.bfloat16)
    ptx = jax.jit(tx.init)(key, x, ctx)["params"]
    t_tx = timed_chain(lambda p, h, c: tx.apply({"params": p}, h, c),
                       ptx, x, (ctx,))
    f_tx = tx_flops(b, hw, ch)

    def row(name, t, f):
        print(f"  {name:<18} {t*1e3:8.3f} ms  {f/1e9:8.1f} GF  "
              f"{f/t/1e12:6.1f} TF/s  MFU {100*f/t/PEAK:5.1f}%")

    print(f"level {hw}x{hw}x{ch} (batch {b}):")
    row("conv3x3 pair", t_cp, f_cp)
    row("ResnetBlock", t_rb, f_rb)
    row("Transformer2D", t_tx, f_tx)
    return {"conv": t_cp, "res": t_rb, "tx": t_tx}


def bench_conv_variants(b, hw, ch, key):
    print(f"\nconv variants at {hw}x{hw}x{ch} (batch {b}):")
    x = jax.device_put(jax.random.normal(key, (b, hw, hw, ch), jnp.bfloat16))

    cp1 = ConvPair(ch, kernel=1)
    p1 = jax.jit(cp1.init)(key, x)["params"]
    t1 = timed_chain(lambda p, h: cp1.apply({"params": p}, h), p1, x)
    f1 = 2 * conv_flops(b, hw, ch, ch, kernel=1)
    print(f"  1x1 conv pair (matmul ceiling){t1*1e3:8.3f} ms  "
          f"MFU {100*f1/t1/PEAK:5.1f}%")

    ch_pad = ((ch + 127) // 128) * 128
    xp = jax.device_put(
        jax.random.normal(key, (b, hw, hw, ch_pad), jnp.bfloat16))
    cpp = ConvPair(ch_pad)
    pp = jax.jit(cpp.init)(key, xp)["params"]
    tp = timed_chain(lambda p, h: cpp.apply({"params": p}, h), pp, xp)
    fp = 2 * conv_flops(b, hw, ch_pad, ch_pad)
    print(f"  3x3 pair ch={ch_pad} (lane-pad)  {tp*1e3:8.3f} ms  "
          f"MFU {100*fp/tp/PEAK:5.1f}%  "
          f"(useful-FLOP MFU at ch={ch}: "
          f"{100*2*conv_flops(b,hw,ch,ch)/tp/PEAK:5.1f}%)")


def main():
    b, heads = 16, 8
    key = jax.random.PRNGKey(0)
    levels = [(64, 320), (32, 640), (16, 1280), (8, 1280)]
    times = {}
    for hw, ch in levels:
        times[(hw, ch)] = bench_level(b, hw, ch, heads, key)

    bench_conv_variants(b, 64, 320, key)

    # SD1.5 motif counts per level (down+mid+up incl. resamplers as conv
    # pairs are approximated by the nearest motif): Res counts include the
    # channel-transition blocks at their OUTPUT level shape.
    counts = {  # (hw, ch): (n_resnet, n_transformer)
        (64, 320): (5, 5),
        (32, 640): (5, 5),
        (16, 1280): (5, 5),
        (8, 1280): (7, 1),
    }
    total = 0.0
    for lvl, (n_res, n_tx) in counts.items():
        total += n_res * times[lvl]["res"] + n_tx * times[lvl]["tx"]
    print(f"\ncomposition: sum(level motifs x SD1.5 counts) = {total*1e3:.1f} ms"
          f" vs measured full UNet CFG fwd b16 = ~180 ms (BASELINE.md)")
    print("(difference = resamplers, in/out convs, skip concats, temb, "
          "and level-transition Res blocks approximated at uniform channels)")


if __name__ == "__main__":
    main()
