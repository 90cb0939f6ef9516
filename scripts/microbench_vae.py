"""Where the VAE decode's milliseconds live: in-jit chained stages (TPU).

BASELINE.md's phase split charges ~0.4 s per 8-image batch to VAE decode
(~12% MFU) — 1.3% of the headline wall, but ~45% of the SAM-on mode's
residual cost (the per-box decode feeds the segmenter). This localizes it:

  a) full decode e2e at B=8 (chained K times in one jit; the carry trick
     makes each iteration depend on the last so XLA can't hoist it)
  b) VAEResnetBlock marginal at each decoder stage shape
  c) the upsample motif (2x nearest repeat + 3x3 conv) at each boundary
  d) the mid-block single-head attention at 64² (materialized XLA scores)

    python scripts/microbench_vae.py
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

from lmdx.nn import vae as vaelib  # noqa: E402
from lmdx.runtime import models as runtime_models  # noqa: E402

PEAK = 197e12
K = 10
B = 8


def _fetch_sync(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(jax.device_get(leaf.ravel()[:1]))


def timed_same_shape(apply_fn, params, x, reps=4):
    def chain(p, x0):
        def body(h, _):
            return apply_fn(p, h).astype(x0.dtype), None
        return jax.lax.scan(body, x0, None, length=K)[0]

    f = jax.jit(chain)
    out = f(params, x)
    _fetch_sync(out)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = f(params, x)
        _fetch_sync(out)
        best = min(best, (time.perf_counter() - t0) / K)
    return best


def timed_changed_shape(apply_fn, params, z, reps=4):
    """Chained timing when out shape != in shape: the next z depends on a
    vanishing function of the previous output, so iterations serialize."""

    def chain(p, z0):
        def body(h, _):
            out = apply_fn(p, h)
            h2 = h + (jnp.mean(out.astype(jnp.float32))
                      * jnp.float32(1e-30)).astype(h.dtype)
            return h2, None
        return jax.lax.scan(body, z0, None, length=K)[0]

    f = jax.jit(chain)
    out = f(params, z)
    _fetch_sync(out)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = f(params, z)
        _fetch_sync(out)
        best = min(best, (time.perf_counter() - t0) / K)
    return best


def resnet_flops(b, h, w, c):
    # two 3x3 convs c->c
    return 2 * 2 * b * h * w * c * c * 9


def main():
    bundle = runtime_models.load_bundle(
        "gligen/diffusers-generation-text-box", seed=0)
    vcfg = bundle.config.vae
    vae = bundle.vae
    params = bundle.params["vae"]
    lat_h = bundle.config.latent_height

    z = jax.random.normal(jax.random.key(0), (B, lat_h, lat_h, 4),
                          jnp.float32)

    t = timed_changed_shape(
        lambda p, h: vae.apply({"params": p}, h,
                               method=vae.__class__.decode), params, z)
    print(f"decode e2e B={B}: {t*1e3:8.1f} ms")

    key = jax.random.key(1)
    rev = list(reversed(vcfg.block_out_channels))
    # decoder stage shapes: (resolution, channels) per up block
    res = lat_h
    stages = []
    for i, ch in enumerate(rev):
        stages.append((res, ch))
        if i < len(rev) - 1:
            res *= 2

    for res_i, ch in stages:
        blk = vaelib.VAEResnetBlock(ch, vcfg.norm_num_groups,
                                    dtype=jnp.bfloat16)
        x = jax.random.normal(key, (B, res_i, res_i, ch), jnp.bfloat16)
        p = blk.init(jax.random.key(2), x)["params"]
        tt = timed_same_shape(lambda pp, xx: blk.apply({"params": pp}, xx),
                              p, x)
        fl = resnet_flops(B, res_i, res_i, ch)
        print(f"resnet {res_i:3d}x{res_i:<3d} c{ch:<4d}: {tt*1e3:8.2f} ms  "
              f"MFU {100*fl/tt/PEAK:5.1f}%")

    class Upsample(nn.Module):
        ch: int

        @nn.compact
        def __call__(self, x):
            x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
            return nn.Conv(self.ch, (3, 3), padding=1,
                           dtype=jnp.bfloat16)(x)

    for res_i, ch in stages[:-1]:
        up = Upsample(ch)
        x = jax.random.normal(key, (B, res_i, res_i, ch), jnp.bfloat16)
        p = up.init(jax.random.key(3), x)["params"]
        tt = timed_changed_shape(
            lambda pp, xx: up.apply({"params": pp}, xx), p, x)
        fl = 2 * B * (2 * res_i) ** 2 * ch * ch * 9
        print(f"upsample {res_i:3d}->{2*res_i:<3d} c{ch:<4d}: {tt*1e3:8.2f} ms  "
              f"MFU {100*fl/tt/PEAK:5.1f}%")

    att = vaelib.VAEAttention(rev[0], vcfg.norm_num_groups,
                              dtype=jnp.bfloat16)
    x = jax.random.normal(key, (B, lat_h, lat_h, rev[0]), jnp.bfloat16)
    p = att.init(jax.random.key(4), x)["params"]
    tt = timed_same_shape(lambda pp, xx: att.apply({"params": pp}, xx), p, x)
    print(f"mid attention {lat_h}x{lat_h} c{rev[0]}: {tt*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
