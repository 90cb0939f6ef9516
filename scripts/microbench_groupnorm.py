"""Marginal cost of GroupNorm(+SiLU) in the UNet's conv chains (TPU).

The batch-16 forward profile (scripts/xplane_groups.py) attributed ~42 ms
of 178 ms to GroupNorm/LayerNorm stats reduce-fusions. MEASURED OUTCOME
(round 4, recorded in BASELINE.md's roofline table): the attribution was
wrong — in situ, GN+SiLU between convs costs −0.01…0.24 ms per instance
(XLA fuses the stats with the producing convs; the xplane "reduce-fusion"
events include the fused conv epilogues). Standalone-GN timings here are
dominated by the ~1.6 ms tunnel dispatch floor (flat across 4× data
sizes) — trust only the in-situ marginals. This measures, per SD level
shape:

  a) conv3x3 C->C alone
  b) conv3x3 -> GroupNorm -> SiLU -> conv3x3 (the ResNet-block motif)
  c) standalone GroupNorm+SiLU
  d) chained GN+SiLU (two convs with GN between, minus two convs alone)
     = the true marginal in-situ cost

All timings fetch-synced (block_until_ready lies over the axon tunnel).

    python scripts/microbench_groupnorm.py
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


def _fetch_sync(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(jax.device_get(leaf.ravel()[:1]))


def timed(fn, *args, n=20, reps=3):
    out = fn(*args)
    _fetch_sync(out)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*args)
        _fetch_sync(out)
        best = min(best, (time.perf_counter() - t0) / n)
    return best


class ConvOnly(nn.Module):
    ch: int

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.ch, (3, 3), padding=1, dtype=jnp.bfloat16)(x)
        x = nn.Conv(self.ch, (3, 3), padding=1, dtype=jnp.bfloat16)(x)
        return x


class ConvGN(nn.Module):
    ch: int

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.ch, (3, 3), padding=1, dtype=jnp.bfloat16)(x)
        x = nn.GroupNorm(num_groups=32, epsilon=1e-5, dtype=jnp.float32)(x)
        x = nn.silu(x).astype(jnp.bfloat16)
        x = nn.Conv(self.ch, (3, 3), padding=1, dtype=jnp.bfloat16)(x)
        return x


class GNOnly(nn.Module):
    @nn.compact
    def __call__(self, x):
        y = nn.GroupNorm(num_groups=32, epsilon=1e-5, dtype=jnp.float32)(x)
        return nn.silu(y).astype(jnp.bfloat16)


def main():
    b = 16
    shapes = [(b, 64, 64, 320), (b, 32, 32, 640), (b, 16, 16, 1280)]
    key = jax.random.PRNGKey(0)
    for shape in shapes:
        ch = shape[-1]
        x = jax.device_put(
            jax.random.normal(key, shape, jnp.bfloat16))
        conv2 = ConvOnly(ch)
        p2 = jax.jit(conv2.init)(key, x)["params"]
        f2 = jax.jit(lambda p, x: conv2.apply({"params": p}, x))
        convgn = ConvGN(ch)
        pg = jax.jit(convgn.init)(key, x)["params"]
        fg = jax.jit(lambda p, x: convgn.apply({"params": p}, x))
        gn = GNOnly()
        pn = jax.jit(gn.init)(key, x)["params"]
        fn_ = jax.jit(lambda p, x: gn.apply({"params": p}, x))

        t2 = timed(f2, p2, x) * 1e3
        tg = timed(fg, pg, x) * 1e3
        tn = timed(fn_, pn, x) * 1e3
        bytes_gn = 2 * x.size * 2  # bf16 read + write
        roof = bytes_gn / 819e9 * 1e3
        print(f"shape {shape}: conv2 {t2:7.3f} ms | conv-GN-conv {tg:7.3f} ms"
              f" | marginal GN {tg - t2:6.3f} ms | standalone GN {tn:6.3f} ms"
              f" | roofline {roof:5.3f} ms")


if __name__ == "__main__":
    main()
