"""Isolated attention + cost-analysis microbench at SD1.5 level-0 shapes.

    python scripts/microbench_attn.py [batch]
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

from lmdx.nn.pallas.flash_attention import _xla_attention, flash_attention  # noqa: E402
from lmdx.nn.unet import apply_unet  # noqa: E402
from lmdx.runtime import models as runtime_models  # noqa: E402


def _fetch_sync(out):
    """jax.block_until_ready on the axon tunnel resolves futures without
    waiting for the chip; only a device->host fetch truly syncs."""
    import numpy as np

    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(jax.device_get(leaf.ravel()[:1]))


def bench(fn, *args, n=20):
    out = fn(*args)
    _fetch_sync(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    _fetch_sync(out)
    return (time.perf_counter() - t0) / n


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 32

    # --- attention at each UNet level's self-attn shape -------------------
    for (l, heads, hd) in [(4096, 8, 40), (1024, 8, 80), (256, 8, 160),
                           (64, 8, 160)]:
        k1, k2, k3 = jax.random.split(jax.random.key(0), 3)
        q = jax.random.normal(k1, (batch, heads, l, hd), jnp.bfloat16)
        k = jax.random.normal(k2, (batch, heads, l, hd), jnp.bfloat16)
        v = jax.random.normal(k3, (batch, heads, l, hd), jnp.bfloat16)
        tf = 4 * batch * heads * l * l * hd / 1e12
        t_flash = bench(jax.jit(flash_attention), q, k, v)
        t_xla = bench(jax.jit(_xla_attention), q, k, v)
        print(f"L={l:5d} hd={hd:4d}: flash {t_flash*1e3:7.2f} ms "
              f"({tf/t_flash:6.1f} TF/s)   xla {t_xla*1e3:7.2f} ms "
              f"({tf/t_xla:6.1f} TF/s)")

    # --- whole-UNet cost analysis ------------------------------------------
    bundle = runtime_models.load_bundle(
        "gligen/diffusers-generation-text-box", seed=0)
    cfg = bundle.config
    h, w = cfg.latent_height, cfg.latent_width
    d = cfg.unet.cross_attention_dim
    lat = jnp.zeros((batch, h, w, 4), jnp.float32)
    t = jnp.zeros((), jnp.int32)
    ctx = jnp.zeros((batch, 77, d), jnp.float32)

    fwd = jax.jit(lambda p, l: apply_unet(bundle.unet, p, l, t, ctx)[0])
    lowered = fwd.lower(bundle.params["unet"], lat)
    compiled = lowered.compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    flops = ca.get("flops", 0.0)
    bytes_ = ca.get("bytes accessed", 0.0)
    dt = bench(fwd, bundle.params["unet"], lat, n=10)
    print(f"UNet fwd (no fuser) batch={batch}: {dt*1e3:.1f} ms, "
          f"XLA flops={flops/1e12:.2f} TF -> {flops/dt/1e12:.1f} TF/s, "
          f"bytes={bytes_/1e9:.1f} GB -> {bytes_/dt/1e9:.0f} GB/s")


if __name__ == "__main__":
    main()
