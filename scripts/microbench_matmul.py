"""Pure-matmul MFU ceiling on this chip (in-jit chained, fetch-synced).

Calibrates the conv roofline: if a big aligned GEMM hits ~X% MFU, then the
3x3 convs' measured 48% (aligned channels) is either XLA's conv lowering
leaving MFU on the table (X >> 48) or simply the chip's practical ceiling
under this workload (X ~= 48-60). Includes the im2col-equivalent GEMM of
the level-0 conv (rows 65536, K 2880, N 320) for a direct comparison.

    python scripts/microbench_matmul.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from lmdx.runtime import jit_cache

jit_cache.enable()

PEAK = 197e12
K = 20


def _fetch_sync(out):
    np.asarray(jax.device_get(out.ravel()[:1]))


def timed_chain(m, k, n, reps=5):
    key = jax.random.PRNGKey(0)
    a = jax.device_put(jax.random.normal(key, (m, k), jnp.bfloat16))
    b = jax.device_put(jax.random.normal(key, (k, n), jnp.bfloat16))
    # Chain through A (project the (m, n) product back to (m, k)) so each
    # iteration depends on the previous and nothing is DCE'd; count both
    # matmuls' FLOPs.
    c = jax.device_put(jax.random.normal(key, (n, k), jnp.bfloat16))

    def chain(a0, b0, c0):
        def body(h, _):
            s = jnp.dot(h, b0, preferred_element_type=jnp.float32)
            return jnp.dot(s.astype(jnp.bfloat16), c0,
                           preferred_element_type=jnp.float32
                           ).astype(jnp.bfloat16), None

        return jax.lax.scan(body, a0, None, length=K)[0]

    f = jax.jit(chain)
    out = f(a, b, c)
    _fetch_sync(out)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = f(a, b, c)
        _fetch_sync(out)
        best = min(best, (time.perf_counter() - t0) / K)
    flops = 2 * 2 * m * k * n
    print(f"  ({m:>6} x {k:>5}) @ ({k:>5} x {n:>5}) pair: {best*1e3:8.3f} ms"
          f"  {flops/best/1e12:6.1f} TF/s  MFU {100*flops/best/PEAK:5.1f}%")


def main():
    print("aligned square-ish GEMMs:")
    timed_chain(4096, 4096, 4096)
    timed_chain(8192, 2048, 2048)
    print("UNet-shaped GEMMs:")
    timed_chain(65536, 2880, 320)    # level-0 3x3 conv as im2col
    timed_chain(65536, 320, 320)     # level-0 1x1 proj
    timed_chain(16384, 640, 640)     # level-1 1x1
    timed_chain(65536, 320, 2560)    # level-0 FF up-proj


if __name__ == "__main__":
    main()
