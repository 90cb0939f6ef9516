"""Where SAM's ~4.4 s/batch goes: segment_batch phase split + encoder MFU.

BASELINE.md round 3: with the Flax SAM ViT-B refining every box mask (the
reference's default configuration) the bench drops 0.263 -> 0.230 img/s,
i.e. ~4.4 s of SAM per 8-image 2-box batch (16 box segmentations). ViT-B at
1024² is ~0.93 TF/image, so 275 ms/image is ~3% MFU — something beyond the
encoder matmuls dominates. This isolates, fetch-synced, in-jit:

  a) segment_batch end to end (16 box prompts, 512² source images)
  b) the jitted apply (resize+normalize+encoder+decoder) per 4-image chunk
  c) encoder-only forward per chunk
  d) encoder variants: rel-pos bias OFF (isolates the decomposed-bias
     einsums + (B,12,4096,4096) f32 materialization), windowed-only
     (global layers windowed too; isolates the global score volume)

    python scripts/microbench_sam.py
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

from lmdx.nn import sam as samlib  # noqa: E402

PEAK = 197e12


def _fetch_sync(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(jax.device_get(leaf.ravel()[:1]))


def timed(fn, *args, reps=3, inner=1):
    out = fn(*args)
    _fetch_sync(out)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(inner):
            out = fn(*args)
        _fetch_sync(out)
        best = min(best, (time.perf_counter() - t0) / inner)
    return best


def encoder_flops(cfg, b):
    g = cfg.grid                      # 64 at 1024²/16
    n = g * g
    d = cfg.encoder_dim
    per_layer_proj = 2 * b * n * d * d * 4 + 2 * b * n * d * 4 * d * 2
    win = cfg.window_size
    n_win = ((g + win - 1) // win) ** 2
    win_scores = 4 * b * n_win * (win * win) ** 2 * d
    glob_scores = 4 * b * n * n * d
    total = 0
    for i in range(cfg.encoder_layers):
        total += per_layer_proj
        total += glob_scores if i in cfg.global_attn_layers else win_scores
    return total


def main():
    cfg = samlib.sam_vit_base()
    model = samlib.Sam(cfg, dtype=jnp.bfloat16)
    key = jax.random.key(0)
    params = jax.jit(model.init)(
        key, jnp.zeros((1, cfg.image_size, cfg.image_size, 3)),
        jnp.zeros((1, 2, 2)), jnp.zeros((1, 2), jnp.int32))["params"]
    seg = samlib.FlaxSamSegmenter(params, cfg)

    rng = np.random.default_rng(0)
    images = [rng.integers(0, 255, (512, 512, 3), dtype=np.uint8)
              for _ in range(16)]
    boxes = [[(0.2, 0.2, 0.7, 0.7)]] * 16

    t_e2e = timed(lambda: seg.segment_batch(images, input_boxes=boxes,
                                            target_hw=(64, 64)))
    print(f"segment_batch 16 boxes e2e: {t_e2e*1e3:8.1f} ms "
          f"({t_e2e/16*1e3:.1f} ms/box)")

    b = seg.CHUNK
    raw = jnp.asarray(np.stack([np.asarray(im) for im in images[:b]]))
    pts = jnp.asarray(np.full((b, 2, 2), 0.4, np.float32))
    lbl = jnp.asarray(np.array([[2, 3]] * b, np.int32))
    t_apply = timed(seg._apply, seg.params, raw, pts, lbl)
    print(f"jitted apply (resize+enc+dec) B={b}: {t_apply*1e3:8.1f} ms "
          f"({t_apply/b*1e3:.1f} ms/box)")

    x1024 = jax.device_put(jax.random.normal(
        key, (b, cfg.image_size, cfg.image_size, 3), jnp.float32))

    def enc_run(dtype, global_layers):
        import dataclasses

        c = dataclasses.replace(cfg, global_attn_layers=global_layers)
        enc = samlib.SamImageEncoder(c, dtype=dtype)
        # Fresh params per variant: the rel-pos table shapes depend on each
        # layer's window/global attention size. Weights are irrelevant to
        # timing.
        p = jax.jit(enc.init)(key, x1024[:1])["params"]
        f = jax.jit(enc.apply)
        return timed(f, {"params": p}, x1024), encoder_flops(c, b)

    t_enc, fl = enc_run(jnp.bfloat16, cfg.global_attn_layers)
    print(f"encoder-only B={b}: {t_enc*1e3:8.1f} ms  {fl/1e12:.2f} TF  "
          f"MFU {100*fl/t_enc/PEAK:5.1f}%")

    t_win, fl_w = enc_run(jnp.bfloat16, ())
    print(f"encoder all-windowed B={b}: {t_win*1e3:8.1f} ms  "
          f"(global-attention marginal {1e3*(t_enc-t_win):.1f} ms)")


if __name__ == "__main__":
    main()
