"""Measure chip-tunnel transfer bandwidth (host <-> TPU over the axon relay).

The tunnel is the bottleneck for every host-resident image path (SAM box
images, stage-2 eval pixels, decoded outputs): this script puts numbers on
it so upload-shrinking optimizations (uint8 source-resolution uploads,
on-device resize — lmdx/nn/sam.py, lmdx/eval/owl_vit.py) can be sized.

Timing rules (BASELINE.md "tunnel sync" caveat): block_until_ready does not
wait for chip completion on this tunnel; every sample therefore ends with a
1-element device->host fetch. Upload time is measured as (dispatch of a
jitted reduction over a fresh host array) + fetch; the reduction itself is
microseconds at these sizes, so the wall is the transfer.

Usage: python scripts/microbench_tunnel.py  (needs the real TPU; ~2 min)
"""

import time

import jax
import jax.numpy as jnp
import numpy as np


@jax.jit
def _reduce(x):
    return x.astype(jnp.float32).sum()


def _sample_upload(x: np.ndarray, reps: int = 5) -> float:
    float(_reduce(x))  # compile + first transfer outside the timing
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        float(_reduce(x))
        best = min(best, time.perf_counter() - t0)
    return best


def _sample_download(shape, reps: int = 5) -> float:
    make = jax.jit(lambda k: jax.random.randint(k, shape, 0, 255, jnp.uint8))
    key = jax.random.key(0)
    np.asarray(make(key))
    best = float("inf")
    for _ in range(reps):
        y = make(key)
        t0 = time.perf_counter()
        np.asarray(y)
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    print(f"device: {jax.devices()[0]}")
    rng = np.random.default_rng(0)
    rows = []
    for shape, label in [
        ((1, 512, 512, 3), "1x512^2 uint8 (one SAM/eval source image)"),
        ((8, 512, 512, 3), "8x512^2 uint8 (eval chunk, source res)"),
        ((8, 768, 768, 3), "8x768^2 uint8 (eval chunk, model res)"),
        ((4, 1024, 1024, 3), "4x1024^2 uint8 (SAM chunk, model res)"),
    ]:
        x = rng.integers(0, 255, shape, dtype=np.uint8)
        t = _sample_upload(x)
        mb = x.nbytes / 1e6
        rows.append((label, "up", mb, t))
        print(f"upload   {label}: {t*1e3:7.1f} ms  {mb/t:7.1f} MB/s")
    for shape, label in [
        ((8, 512, 512, 3), "8x512^2 uint8 (decoded batch fetch)"),
    ]:
        t = _sample_download(shape)
        mb = int(np.prod(shape)) / 1e6
        rows.append((label, "down", mb, t))
        print(f"download {label}: {t*1e3:7.1f} ms  {mb/t:7.1f} MB/s")


if __name__ == "__main__":
    main()
