"""Validate head-packing: small-contraction matmuls vs block-diag packed.

Hypothesis: QK^T with head_dim 40 runs at ~40/128 MXU utilization; packing
3 heads into a 120-contraction block-diagonal matmul recovers ~3x.

    python scripts/microbench_packing.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

REPS = 50


import numpy as np


def timeit(fn, *args):
    np.asarray(fn(*args)[0, 0, :8])  # warmup + forced host transfer
    t0 = time.perf_counter()
    np.asarray(fn(*args)[0, 0, :8])  # axon tunnel defers work past
    return time.perf_counter() - t0, None  # block_until_ready; transfer forces it


def scan_dot(a, b):
    """REPS dependent matmuls inside one jit to amortize dispatch."""

    def body(c, _):
        c = jnp.dot(a + c[0, 0] * 0, b, preferred_element_type=jnp.float32)
        return c.astype(a.dtype) * 1e-3, None

    init = jnp.zeros((a.shape[0], b.shape[1]), a.dtype)
    return jax.lax.scan(body, init, None, length=REPS)[0]


def main():
    L = 4096
    key = jax.random.key(0)

    # Per-head QK: (L, 40) @ (40, L), 8 heads as a batch dim.
    q8 = jax.random.normal(key, (8, L, 40), jnp.bfloat16)
    k8 = jax.random.normal(key, (8, 40, L), jnp.bfloat16)

    def scan_bdot(a, b):
        def body(c, _):
            # Real (scalar) data dependence so XLA can't CSE iterations away.
            c = jnp.einsum("hqd,hdk->hqk", a + c[:, :1, :1] * 1e-9, b,
                           preferred_element_type=jnp.float32)
            return c.astype(a.dtype), None

        init = jnp.zeros((a.shape[0], a.shape[1], b.shape[2]), a.dtype)
        return jax.lax.scan(body, init, None, length=REPS)[0]

    f1 = jax.jit(scan_bdot)
    dt, _ = timeit(f1, q8, k8)
    tf = 2 * 8 * L * L * 40 * REPS / 1e12
    print(f"per-head  (8x (4096,40)@(40,4096)): {dt*1e3:8.1f} ms  {tf/dt:7.1f} TF/s")

    # Packed: 3 groups of (L, 120) @ (120, 3L) block-diagonal (9 heads).
    qp = jax.random.normal(key, (3, L, 120), jnp.bfloat16)
    kp = jax.random.normal(key, (3, 120, 3 * L), jnp.bfloat16)
    f2 = jax.jit(scan_bdot)
    dt, _ = timeit(f2, qp, kp)
    tf_logical = 2 * 9 * L * L * 40 * REPS / 1e12  # useful flops only
    print(f"packed-3  (3x (4096,120)@(120,12288)): {dt*1e3:6.1f} ms  "
          f"{tf_logical/dt:7.1f} TF/s useful (9 heads)")

    # Control: contraction 128 dense (1 group) for peak reference.
    qd = jax.random.normal(key, (8, L, 128), jnp.bfloat16)
    kd = jax.random.normal(key, (8, 128, L), jnp.bfloat16)
    f3 = jax.jit(scan_bdot)
    dt, _ = timeit(f3, qd, kd)
    tf = 2 * 8 * L * L * 128 * REPS / 1e12
    print(f"dense-128 (8x (4096,128)@(128,4096)): {dt*1e3:7.1f} ms  {tf/dt:7.1f} TF/s")

    # AV side: (L, L) @ (L, 40) per head vs (L, 3L) @ (3L, 120) packed.
    a8 = jax.random.normal(key, (8, L, L), jnp.bfloat16)
    v8 = jax.random.normal(key, (8, L, 40), jnp.bfloat16)
    dt, _ = timeit(jax.jit(scan_bdot), a8, v8)
    tf = 2 * 8 * L * L * 40 * REPS / 1e12
    print(f"AV per-head (8x (4096,4096)@(4096,40)): {dt*1e3:6.1f} ms  {tf/dt:7.1f} TF/s")

    ap = jax.random.normal(key, (3, L, 3 * L), jnp.bfloat16)
    vp = jax.random.normal(key, (3, 3 * L, 120), jnp.bfloat16)
    dt, _ = timeit(jax.jit(scan_bdot), ap, vp)
    tf_logical = 2 * 9 * L * L * 40 * REPS / 1e12
    print(f"AV packed-3 (3x (4096,12288)@(12288,120)): {dt*1e3:4.1f} ms  "
          f"{tf_logical/dt:7.1f} TF/s useful (9 heads)")


if __name__ == "__main__":
    main()
