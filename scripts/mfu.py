"""MFU accounting for the LMD+ pipeline's compute kernels on one TPU chip.

For each hot computation this script takes FLOPs from XLA's own cost
analysis (compiled.cost_analysis()["flops"]) — not hand-counting — times
the compiled function, and reports achieved TFLOP/s and MFU against the
v5e bf16 peak (197 TFLOP/s). It then derives scan-level MFU for the two
pipeline phases from their wall-clock (scripts/profile_phases.py) and the
known step structure:

  per-box scan  = 50 steps x CFG fwd at batch 2*n_boxes (+ fuser segments)
  overall scan  = 50 steps x CFG fwd at batch 2*G
                + sum(max_iter[i], i < max_index_step) guidance fwd+bwd at G

Run on TPU:  python scripts/mfu.py [--images 8] [--perbox-s S] [--overall-s S]
(omit the phase seconds to skip the derived rows).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from lmdx.runtime import jit_cache

jit_cache.enable()

from lmdx.nn.attention import TapSpec  # noqa: E402
from lmdx.nn.unet import apply_unet  # noqa: E402
from lmdx.runtime import models as runtime_models  # noqa: E402
from lmdx.sampling import guidance as guidance_lib  # noqa: E402

V5E_BF16_PEAK = 197e12  # TPU v5e (v5 lite) bf16 peak FLOP/s per chip


def _fetch_sync(out):
    """True device sync: jax.block_until_ready on the axon tunnel resolves
    futures WITHOUT waiting for chip completion (measured 0.09 ms for a
    34-TFLOP kernel); only a device->host data fetch round-trips."""
    import numpy as np

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


def flops_of(jitted, *args):
    cost = jitted.lower(*args).compile().cost_analysis()
    if isinstance(cost, list):  # older jax returns [dict]
        cost = cost[0]
    return float(cost["flops"])


def row(name, seconds, flops):
    tf = flops / seconds / 1e12
    print(f"{name:<44} {seconds * 1e3:9.1f} ms  {flops / 1e12:8.2f} TF  "
          f"{tf:7.1f} TF/s  {100 * tf * 1e12 / V5E_BF16_PEAK:5.1f}% MFU")
    return tf


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--images", type=int, default=8)
    ap.add_argument("--boxes-per-image", type=int, default=2)
    ap.add_argument("--perbox-s", type=float, default=None,
                    help="measured per-box sampler phase seconds")
    ap.add_argument("--overall-s", type=float, default=None,
                    help="measured overall sampler phase seconds")
    ap.add_argument("--steps", type=int, default=50)
    args = ap.parse_args()

    bundle = runtime_models.load_bundle(
        "gligen/diffusers-generation-text-box", seed=0)
    cfg = bundle.config
    h, w = cfg.latent_height, cfg.latent_width
    d = cfg.unet.cross_attention_dim
    params = bundle.params["unet"]

    g = args.images
    n_boxes = g * args.boxes_per_image

    def make_fwd(batch):
        lat = jnp.zeros((batch, h, w, 4), jnp.float32)
        ctx = jnp.zeros((batch, 77, d), jnp.float32)
        objs = jnp.zeros((batch, cfg.unet.gligen_max_objs, d), jnp.float32)
        fn = jax.jit(lambda p, l: apply_unet(
            bundle.unet, p, l, jnp.zeros((), jnp.int32), ctx, objs=objs,
            fuser_gate=1.0)[0])
        return fn, lat

    print(f"{'kernel':<44} {'time':>12}  {'flops':>10}  {'rate':>9}  {'mfu':>8}")
    results = {}
    for label, batch in [
        (f"UNet CFG fwd+fuser, per-box batch ({2 * n_boxes})", 2 * n_boxes),
        (f"UNet CFG fwd+fuser, overall batch ({2 * g})", 2 * g),
        ("UNet fwd+fuser, batch 16 (headline microbench)", 16),
    ]:
        fn, lat = make_fwd(batch)
        fl = flops_of(fn, params, lat)
        s = timed(fn, params, lat)
        results[batch] = (s, fl)
        row(label, s, fl)

    # Guidance iteration: cond-only tapped fwd (early exit) + grad wrt latents.
    spec = guidance_lib.GuidanceSpec(
        keys=guidance_lib.default_guidance_keys(cfg.unet))
    lat_g = jnp.zeros((g, h, w, 4), jnp.float32)
    ctx_g = jnp.zeros((g, 77, d), jnp.float32)
    objs_g = jnp.zeros((g, cfg.unet.gligen_max_objs, d), jnp.float32)

    def loss_fn(p, l):
        _, taps = apply_unet(
            bundle.unet, p, l, jnp.zeros((), jnp.int32), ctx_g, objs=objs_g,
            fuser_gate=1.0, taps=spec.tap_spec, stop_after_taps=True)
        return sum(jnp.sum(v.astype(jnp.float32)) for v in taps.values())

    gfn = jax.jit(lambda p, l: jax.grad(loss_fn, argnums=1)(p, l))
    gfl = flops_of(gfn, params, lat_g)
    gs = timed(gfn, params, lat_g)
    row(f"guidance fwd+bwd (tapped, early-exit, G={g})", gs, gfl)

    # Derived scan-level MFU from phase wall-clock.
    default_iters = [4] * 5 + [3] * 5 + [2] * 5 + [2] * 5 + [1] * 10
    n_guid = sum(default_iters[:30])
    if args.perbox_s:
        fl = args.steps * results[2 * n_boxes][1]
        row(f"per-box sampler scan ({args.steps} steps, wall)",
            args.perbox_s, fl)
    if args.overall_s:
        fl = args.steps * results[2 * g][1] + n_guid * gfl
        row(f"overall sampler scan (+{n_guid} guidance iters, wall)",
            args.overall_s, fl)


if __name__ == "__main__":
    main()
