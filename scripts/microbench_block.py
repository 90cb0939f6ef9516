"""Where the UNet's non-MXU milliseconds live: real block motifs (TPU).

Compares, at the 64x64x320 level (batch 16):
  a) two bare 3x3 convs (skeleton)
  b) the REAL ResnetBlock (GN/SiLU/temb-add/residual around the convs)
  c) the REAL SpatialTransformer (GN + proj + LN/attn/FF with the Pallas
     flash kernel) vs its matmul-only skeleton
so the marginal cost of the norm/elementwise structure around each motif
is measured in situ rather than inferred from per-op profiles.

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

from lmdx.nn import blocks as B  # noqa: E402
from lmdx.nn import attention as A  # noqa: E402


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


class ConvSkeleton(nn.Module):
    ch: int

    @nn.compact
    def __call__(self, x, t_emb):
        h = nn.Conv(self.ch, (3, 3), padding=1, dtype=jnp.bfloat16)(x)
        h = nn.Conv(self.ch, (3, 3), padding=1, dtype=jnp.bfloat16)(h)
        return h


def main():
    b, hw, ch, heads = 16, 64, 320, 8
    key = jax.random.PRNGKey(0)
    x = jax.device_put(jax.random.normal(key, (b, hw, hw, ch), jnp.bfloat16))
    t_emb = jax.device_put(jax.random.normal(key, (b, 1280), jnp.bfloat16))
    ctx = jax.device_put(jax.random.normal(key, (b, 77, 768), jnp.bfloat16))

    sk = ConvSkeleton(ch)
    psk = jax.jit(sk.init)(key, x, t_emb)["params"]
    fsk = jax.jit(lambda p, x, t: sk.apply({"params": p}, x, t))

    rb = B.ResnetBlock(out_channels=ch, dtype=jnp.bfloat16)
    prb = jax.jit(rb.init)(key, x, t_emb)["params"]
    frb = jax.jit(lambda p, x, t: rb.apply({"params": p}, x, t))

    t_sk = timed(fsk, psk, x, t_emb) * 1e3
    t_rb = timed(frb, prb, x, t_emb) * 1e3
    print(f"resnet motif 64x64x320 b16: conv-skeleton {t_sk:.3f} ms | "
          f"real ResnetBlock {t_rb:.3f} ms | marginal {t_rb - t_sk:.3f} ms")

    st = A.SpatialTransformer(
        channels=ch, heads=heads, context_dim=768, depth=1,
        dtype=jnp.bfloat16)
    pst = jax.jit(st.init)(key, x, ctx)["params"]
    fst = jax.jit(lambda p, x, c: st.apply({"params": p}, x, c)[0]
                  if isinstance(st.apply({"params": p}, x, c), tuple)
                  else st.apply({"params": p}, x, c))
    try:
        t_st = timed(fst, pst, x, ctx) * 1e3
        print(f"spatial transformer 4096 tok b16: {t_st:.3f} ms")
    except Exception as e:  # signature may differ; report and move on
        print("spatial transformer bench skipped:", e)


if __name__ == "__main__":
    main()
