"""Micro-benchmark: one UNet CFG forward at serving batch, attention variants.

    python scripts/microbench_unet.py [batch]
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

from lmdx.nn.attention import NO_TAPS, TapSpec  # noqa: E402
from lmdx.nn.unet import apply_unet  # noqa: E402
from lmdx.runtime import models as runtime_models  # noqa: E402


def _fetch_sync(out):
    """jax.block_until_ready on the axon tunnel resolves futures without
    waiting for the chip; only a device->host fetch truly syncs."""
    import numpy as np

    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(jax.device_get(leaf.ravel()[:1]))


def bench(fn, *args, n=10, **kwargs):
    out = fn(*args, **kwargs)
    _fetch_sync(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args, **kwargs)
    _fetch_sync(out)
    return (time.perf_counter() - t0) / n


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    bundle = runtime_models.load_bundle(
        "gligen/diffusers-generation-text-box", seed=0)
    cfg = bundle.config
    h, w = cfg.latent_height, cfg.latent_width
    d = cfg.unet.cross_attention_dim

    lat = jnp.zeros((batch, h, w, 4), jnp.float32)
    t = jnp.zeros((), jnp.int32)
    ctx = jnp.zeros((batch, 77, d), jnp.float32)
    objs = jnp.zeros((batch, cfg.unet.gligen_max_objs, d), jnp.float32)

    fwd_fused = jax.jit(lambda p, l: apply_unet(
        bundle.unet, p, l, t, ctx, objs=objs, fuser_gate=1.0)[0])
    fwd_xla = jax.jit(lambda p, l: apply_unet(
        bundle.unet, p, l, t, ctx, objs=objs, fuser_gate=1.0,
        taps=TapSpec(keys=(), fused=False))[0])

    params = bundle.params["unet"]
    p32 = jax.tree.map(lambda x: x.astype(jnp.float32), params)

    for name, fn, p in [
        ("fused(pallas) bf16-params", fwd_fused, params),
        ("fused(pallas) f32-params ", fwd_fused, p32),
        ("xla-attn      bf16-params", fwd_xla, params),
    ]:
        dt = bench(fn, p, lat)
        print(f"{name}: {dt * 1000:8.2f} ms/fwd  "
              f"({batch / dt:6.1f} img-fwd/s)")


if __name__ == "__main__":
    main()
