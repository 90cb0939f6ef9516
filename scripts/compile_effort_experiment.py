"""Compile-wall experiment: XLA effort knobs vs sampler-class compile time.

VERDICT r04 weak#2 / next#2(b): one sampler shape class costs 627-772 s of
XLA:TPU compile (BASELINE.md production-workload table) — 2689 s of the
4118 s cold 400-prompt wall. XLA exposes three scheduler/optimizer effort
knobs through jax.config (jax 0.9):

  jax_exec_time_optimization_effort   (0.0 default; <0 = compile faster)
  jax_memory_fitting_effort           (0.0 default)
  jax_optimization_level              (O0/O1/O2/O3; O2 default)

This tool measures ONE setting per invocation (compile must happen in a
fresh process AND a fresh persistent-cache dir to be comparable): it runs
the dominant production class — LMD+ 2-box, batch 8, 50-step DDIM, the
same configuration bench.py measures — and prints first-batch wall
(compile+run) and steady-batch wall as one JSON line.

    LMDX_JIT_CACHE=/tmp/effort_base python scripts/compile_effort_experiment.py
    LMDX_JIT_CACHE=/tmp/effort_fast python scripts/compile_effort_experiment.py \
        --exec-effort -1.0 [--opt-level O1] [--memory-effort -1.0]

Accept/reject goes to ARCHITECTURE.md §8: accept if compile drops >=25%
with steady-batch cost within 5%.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--exec-effort", type=float, default=None)
    ap.add_argument("--memory-effort", type=float, default=None)
    ap.add_argument("--opt-level", type=str, default=None)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"

    import jax

    if args.exec_effort is not None:
        jax.config.update("jax_exec_time_optimization_effort", args.exec_effort)
    if args.memory_effort is not None:
        jax.config.update("jax_memory_fitting_effort", args.memory_effort)
    if args.opt_level is not None:
        jax.config.update("jax_optimization_level", args.opt_level)

    import numpy as np

    from lmdx.methods.batch import run_lmd_plus_batch
    from lmdx.runtime import jit_cache
    from lmdx.runtime.models import load_bundle

    jit_cache.enable()
    print(f"devices: {jax.devices()}", flush=True)

    bundle = load_bundle("gligen/diffusers-generation-text-box", seed=0)
    jax.block_until_ready(bundle.params["unet"])

    objects = [("a brown dog", "a white cat"), ("a red car", "a blue bus"),
               ("a green chair", "a wooden table"),
               ("a black horse", "a gray sheep"),
               ("a yellow bird", "a pink flower"),
               ("a silver laptop", "a red mug"),
               ("a purple ball", "an orange box"),
               ("a white boat", "a brown bench")]
    specs = []
    for i in range(args.batch):
        a, b = objects[i % len(objects)]
        specs.append({
            "prompt": f"A realistic photo of a scene with {a} and {b}",
            "gen_boxes": [(a, (60 + 10 * i, 270, 160, 180)),
                          (b, (290, 290 + 5 * i, 150, 140))],
            "bg_prompt": "A realistic photo of a scene",
            "extra_neg_prompt": "",
        })

    kwargs = dict(num_inference_steps=args.steps)
    t0 = time.monotonic()
    res = run_lmd_plus_batch(specs, bundle,
                             bg_seeds=list(range(args.batch)),
                             fg_seed_starts=[100] * args.batch, **kwargs)
    np.asarray(res[-1].image)
    first = time.monotonic() - t0

    t0 = time.monotonic()
    res = run_lmd_plus_batch(specs, bundle,
                             bg_seeds=[7 + i for i in range(args.batch)],
                             fg_seed_starts=[900] * args.batch, **kwargs)
    np.asarray(res[-1].image)
    steady = time.monotonic() - t0

    print(json.dumps({
        "exec_effort": args.exec_effort,
        "memory_effort": args.memory_effort,
        "opt_level": args.opt_level,
        "batch": args.batch, "steps": args.steps,
        "first_batch_s": round(first, 1),
        "steady_batch_s": round(steady, 1),
        "steady_img_per_s": round(args.batch / steady, 4),
        "cache_dir": os.environ.get("LMDX_JIT_CACHE", "(default)"),
    }), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
