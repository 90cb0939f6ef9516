"""Benchmark: LMD+ grounded-image throughput on one TPU chip.

Measures end-to-end grounded generation — per-box GLIGEN passes, mask
refinement, masked latent composition, frozen-step overall regeneration with
CA-energy guidance (jax.grad through the UNet), VAE decode — at the
reference's flagship configuration: SD v1.4 + GLIGEN topology, 512x512,
50 steps, CFG 7.5, frozen_step_ratio 0.5, scheduled-sampling beta 0.4
(reference generation/lmd_plus.py:196-209), 2-object layout.

Params are randomly initialized (weights are irrelevant to throughput; no
network egress in this environment). First invocation pays XLA compilation;
the steady-state number is what's reported.

vs_baseline: the reference publishes no throughput numbers (BASELINE.md).
The denominator is a documented engineering estimate of the PyTorch
reference on A100: ~150 CFG UNet steps per 2-box image at ~10 it/s fp16
plus ~66 forward-equivalents of guidance backprop, SAM, and VAE decode
=> ~0.043 images/s. Recorded in BASELINE.json["published"].

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import time

REFERENCE_A100_IMG_PER_S = 0.043  # documented estimate, see module docstring

SPEC = {
    "prompt": "A realistic photo of a scene with a brown dog and a white cat",
    "gen_boxes": [
        ("a brown dog", (80, 280, 160, 180)),
        ("a white cat", (300, 300, 150, 140)),
    ],
    "bg_prompt": "A realistic photo of a scene",
    "extra_neg_prompt": "",
}


import os

# Images per batched pipeline invocation. LMDX_BENCH_BATCH=1 measures
# single-image latency (BASELINE.json's p50-latency north star) instead of
# batched throughput.
BATCH = int(os.environ.get("LMDX_BENCH_BATCH", "8"))

# LMDX_BENCH_SAM=1 runs the real Flax SAM ViT-B segmenter per box (the
# reference's configuration, models/sam.py:25-55) instead of the weightless
# CoarseSegmenter; random-init weights — timing is weight-independent.
USE_SAM = bool(int(os.environ.get("LMDX_BENCH_SAM", "0")))

# LMDX_BENCH_METHOD=lmd measures the training-free flagship (per-box
# CA-energy guidance, max_index_step 30 — reference generation/lmd.py
# defaults) instead of LMD+ (GLIGEN adapters, per-box guidance off).
METHOD = os.environ.get("LMDX_BENCH_METHOD", "lmd_plus")

# LMDX_BENCH_FAST=1 turns on the reference's truncated fast schedule for the
# per-box passes (utils/schedule.py:4-8; the p50-latency lever — the per-box
# tail past the frozen steps only feeds mask extraction).
USE_FAST = bool(int(os.environ.get("LMDX_BENCH_FAST", "0")))

# LMDX_BENCH_SOLVER=dpmpp_2m selects DPM-Solver++(2M) (the reference's
# --scheduler DPMSolverMultistep low-latency mode, typically with
# LMDX_BENCH_STEPS=20); default DDIM at 50 steps.
SOLVER = os.environ.get("LMDX_BENCH_SOLVER", None)
STEPS = int(os.environ.get("LMDX_BENCH_STEPS", "50"))

# LMDX_BENCH_PIPELINE=0 disables cross-batch software pipelining (defer each
# batch's image fetch until the next batch's chip work is dispatched — the
# serving driver's default; outputs byte-identical). Pipelined throughput is
# measured as N back-to-back batches over total wall instead of min-of-reps.
PIPELINE = bool(int(os.environ.get("LMDX_BENCH_PIPELINE", "1"))) and BATCH > 1


def _specs():
    """BATCH distinct 2-box layouts (different objects/placements/seeds)."""
    objects = [("a brown dog", "a white cat"), ("a red car", "a blue bus"),
               ("a green chair", "a wooden table"), ("a black horse", "a gray sheep"),
               ("a yellow bird", "a pink flower"), ("a silver laptop", "a red mug"),
               ("an orange fox", "a white rabbit"), ("a blue kite", "a green ball")]
    objects = objects[:BATCH]
    specs = []
    for i, (a, b) in enumerate(objects):
        specs.append({
            "prompt": f"A realistic photo of a scene with {a[2:]} and {b[2:]}",
            "gen_boxes": [
                (a, (60 + 10 * i, 270 + 8 * i, 170, 180)),
                (b, (290 - 6 * i, 300, 150, 150)),
            ],
            "bg_prompt": "A realistic photo of a scene",
            "extra_neg_prompt": "",
        })
    return specs


def main():
    from lmdx.runtime import jit_cache

    jit_cache.enable()

    from lmdx.methods.batch import run_lmd_batch, run_lmd_plus_batch
    from lmdx.runtime import models as runtime_models

    bundle = runtime_models.load_bundle("gligen/diffusers-generation-text-box",
                                        seed=0)
    specs = _specs()

    segmenter = None
    if USE_SAM:
        import jax

        from lmdx.nn import sam as samlib

        sam_cfg = samlib.sam_vit_base()
        sam_model = samlib.Sam(sam_cfg)
        import jax.numpy as jnp

        sam_params = jax.jit(sam_model.init)(
            jax.random.key(0),
            jnp.zeros((1, sam_cfg.image_size, sam_cfg.image_size, 3)),
            jnp.zeros((1, 2, 2)), jnp.zeros((1, 2), jnp.int32))["params"]
        segmenter = samlib.FlaxSamSegmenter(sam_params, sam_cfg)

    run_batch = run_lmd_batch if METHOD == "lmd" else run_lmd_plus_batch

    def once(defer=False):
        kwargs = {}
        if SOLVER:
            kwargs["scheduler"] = SOLVER
        return run_batch(
            specs, bundle, bg_seeds=list(range(1, BATCH + 1)),
            num_inference_steps=STEPS, segmenter=segmenter,
            use_fast_schedule=USE_FAST, defer_fetch=defer, **kwargs)

    once()  # compile warmup (segments for per-box and overall passes)

    times = []
    if PIPELINE:
        # Serving-driver schedule: batch k's image fetch resolves only
        # after batch k+1's chip work is dispatched, so the tunnel fetch
        # and host prep ride under the scans (lmdx/cli/generate.py
        # run_batched). Steady rate = N back-to-back batches / total wall.
        from lmdx.methods import base as method_base
        reps = 3
        t0 = time.perf_counter()
        prev = None
        for _ in range(reps):
            results = once(defer=True)
            if prev is not None:
                method_base.finalize_results(prev)
            prev = results
        method_base.finalize_results(prev)
        assert len(prev) == BATCH
        assert prev[0].image.shape[0] == bundle.config.height
        times.append((time.perf_counter() - t0) / reps)
    else:
        for _ in range(3):
            t0 = time.perf_counter()
            results = once()
            assert len(results) == BATCH
            assert results[0].image.shape[0] == bundle.config.height
            times.append(time.perf_counter() - t0)

    value = BATCH / min(times)
    step_tag = f"{STEPS}step" + (f"_{SOLVER}" if SOLVER else "")
    metric = f"{METHOD}_sd512_{step_tag}_images_per_sec_per_chip"
    if USE_SAM:
        metric += "_with_sam"
    if USE_FAST:
        metric += "_fast"
    extra = {}
    if BATCH == 1:
        metric = f"{METHOD}_sd512_{step_tag}_p50_latency_s" + (
            "_with_sam" if USE_SAM else "") + ("_fast" if USE_FAST else "")
        value = sorted(times)[len(times) // 2]
        extra = {"unit": "s/image",
                 "vs_baseline": round((1.0 / value) /
                                      REFERENCE_A100_IMG_PER_S, 3)}
    print(json.dumps({
        "metric": metric,
        "value": round(value, 5),
        "unit": "images/s/chip",
        # denominator is the documented A100 engineering ESTIMATE (no
        # published reference throughput exists) — see module docstring.
        "vs_baseline": round(value / REFERENCE_A100_IMG_PER_S, 3),
        **extra,
    }))


if __name__ == "__main__":
    main()
