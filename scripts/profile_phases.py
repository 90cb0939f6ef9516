"""Phase-level timing of the batched LMD+ pipeline on real hardware.

Monkeypatches timing (with block_until_ready) around the pipeline's major
stages — per-box sampler call, overall sampler call, text encoding, VAE
decode, mask refinement — to show where wall-clock goes. Run on TPU:

    python scripts/profile_phases.py [BATCH]
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from lmdx.runtime import jit_cache

jit_cache.enable()

from lmdx.methods import base  # noqa: E402
from lmdx.methods import batch as batch_mod  # noqa: E402
from lmdx.runtime import models as runtime_models  # noqa: E402
from lmdx.sampling import masking  # noqa: E402

TIMES: dict[str, list[float]] = {}


def _fetch_sync(out):
    """jax.block_until_ready on the axon tunnel resolves futures without
    waiting for the chip; only a device->host fetch truly syncs."""
    import numpy as np

    leaves = [x for x in jax.tree_util.tree_leaves(out)
              if hasattr(x, "ravel") and getattr(x, "size", 0)]
    if leaves:
        np.asarray(jax.device_get(leaves[0].ravel()[:1]))


def timed(name, fn, block=True):
    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        t0 = time.perf_counter()
        out = fn(*args, **kwargs)
        if block:
            _fetch_sync(out)
        TIMES.setdefault(name, []).append(time.perf_counter() - t0)
        return out

    return wrapper


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 8

    import bench

    bench.BATCH = batch
    specs = bench._specs()

    batch_mod.sample = timed("sample(per-box + overall)", batch_mod.sample)
    batch_mod.base.decode_latents = timed(
        "vae_decode", base.decode_latents)
    batch_mod.runtime_models.encode_text = timed(
        "text_encode", runtime_models.encode_text)
    batch_mod.masking.refine_mask_from_box = timed(
        "mask_refine", masking.refine_mask_from_box)

    bundle = runtime_models.load_bundle(
        "gligen/diffusers-generation-text-box", seed=0)

    def once():
        return batch_mod.run_lmd_plus_batch(
            specs, bundle, bg_seeds=list(range(1, batch + 1)),
            num_inference_steps=50)

    once()  # compile
    TIMES.clear()
    t0 = time.perf_counter()
    jax.block_until_ready(once()[0].image)
    total = time.perf_counter() - t0

    print(f"TOTAL: {total:.3f}s  ({batch / total:.4f} img/s)")
    accounted = 0.0
    for name, vals in sorted(TIMES.items(), key=lambda kv: -sum(kv[1])):
        s = sum(vals)
        accounted += s
        print(f"{name:32s} {s:8.3f}s  ({100 * s / total:5.1f}%)  "
              f"n={len(vals)}  {['%.3f' % v for v in vals[:6]]}")
    print(f"{'unaccounted (host/compose)':32s} {total - accounted:8.3f}s  "
          f"({100 * (total - accounted) / total:5.1f}%)")


if __name__ == "__main__":
    main()
