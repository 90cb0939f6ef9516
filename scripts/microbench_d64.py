"""Accept-or-reject probe: zero-padding head_dim 40 -> 64 at conversion time.

VERDICT r2 item 3a: padding the level-0 Q/K/V projection columns (and to_out
rows) from head_dim 40 to 64 is mathematically exact (zero score
contributions, zero output columns) IF the softmax scale stays 1/sqrt(40).
The question is whether MXU tiling at d=64 recovers the pad waste.

Hypothesis from the round-1 xplane work (ARCHITECTURE.md section 8): the MXU
pads the contraction tile to 128 either way, and the flash kernel is bound by
VMEM traffic over the (block_q, lk) f32 score matrix, whose volume is
INDEPENDENT of head_dim — so d=64 should cost the same kernel time while
adding +60% projection FLOPs and +60% Q/K/V HBM bytes. This script measures:

1. the isolated flash kernel at L=4096, d=40 vs d=64 (same effective scale);
2. the projection Dense cost at 320 -> 320 vs 320 -> 512 columns;

    python scripts/microbench_d64.py [batch]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from lmdx.runtime import jit_cache

jit_cache.enable()

from lmdx.nn.pallas.flash_attention import flash_attention  # noqa: E402


def bench_chained(fn, x0, *rest, n=10, reps=3):
    """Fetch-synced chained timing: feeds fn's output back as its first
    argument so the tunnel cannot overlap or drop the work, and syncs with a
    tiny device->host fetch (jax.block_until_ready on the current axon
    tunnel resolves futures WITHOUT waiting for chip completion — measured
    0.09 ms for a 34-TFLOP kernel; a data fetch gives the true 12 ms)."""
    import numpy as np

    x = fn(x0, *rest)
    np.asarray(jax.device_get(x.ravel()[:1]))
    best = float("inf")
    for _ in range(reps):
        x = x0
        t0 = time.perf_counter()
        for _ in range(n):
            x = fn(x, *rest)
        np.asarray(jax.device_get(x.ravel()[:1]))
        best = min(best, (time.perf_counter() - t0) / n)
    return best


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    l = 4096
    heads = 8

    print(f"batch={batch} L={l} heads={heads}")
    for d in (40, 64, 80, 128):
        k1, k2, k3 = jax.random.split(jax.random.key(0), 3)
        q = jax.random.normal(k1, (batch, heads, l, d), jnp.bfloat16)
        k = jax.random.normal(k2, (batch, heads, l, d), jnp.bfloat16)
        v = jax.random.normal(k3, (batch, heads, l, d), jnp.bfloat16)
        # d=40's useful FLOPs for the ratio readers care about: does padding
        # change WALL time (the math is fixed; extra dims do zero work).
        tf = 4 * batch * heads * l * l * 40 / 1e12
        t_flash = bench_chained(jax.jit(flash_attention), q, k, v)
        print(f"  flash d={d:4d}: {t_flash*1e3:7.2f} ms  "
              f"({tf/t_flash:6.1f} TF/s @d40-useful)")

    # Projection cost: 4096-token activations, 320 -> {320, 512} columns
    # (to_q at d40 vs conversion-padded d64; to_k/to_v/to_out scale the same).
    for cols in (320, 512):
        x = jax.random.normal(jax.random.key(1), (batch, l, 320), jnp.bfloat16)
        w = jax.random.normal(jax.random.key(2), (320, cols), jnp.bfloat16)

        def proj_step(x, w):
            y = x @ w
            # data dependence for the chained timer without changing x
            return x * (1 + y.ravel()[0].astype(x.dtype) * 0)

        t_proj = bench_chained(jax.jit(proj_step), x, w)
        tf = 2 * batch * l * 320 * cols / 1e12
        print(f"  proj 320->{cols}: {t_proj*1e3:7.2f} ms ({tf/t_proj:6.1f} TF/s)")


if __name__ == "__main__":
    main()
