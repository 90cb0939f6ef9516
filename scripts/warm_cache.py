"""Pre-populate the persistent XLA compile cache for a batched-driver run.

A cold 400-prompt benchmark run pays ~23+ min of XLA compilation spread
through its first batches (BASELINE.md production-workload table), and the
cache does not survive jax upgrades. This tool enumerates the exact batch
shape classes a driver invocation will compile — by rebuilding the SAME job
list / grouping / pad plan via lmdx.cli.generate's build_jobs/plan_groups —
and runs ONE representative batch per class so every compile lands in the
shared persistent cache (LMDX_JIT_CACHE, default .jax_cache/) before the
real run starts.

    python scripts/warm_cache.py [--workers K] [--list] <generate flags>
    # e.g. warm the benchmark run:
    python scripts/warm_cache.py --prompt-type lmd --model gpt-4 \
        --run-model lmd_plus --image-batch-size 8 --max-compiled-variants 3 \
        --cache-path /root/reference/cache/cache_lmd_v0.1_gpt-4.json

--workers K compiles classes in K concurrent subprocesses sharing the cache
dir. The TPU tunnel multiplexes processes (verified: a second process can
initialize and run concurrently), but XLA compilation is host-CPU-bound, so
K > 1 only pays off on multi-core hosts (this dev host has ONE core —
sequential there). Representative batches come from the real workload, so
tokenization-dependent shapes (word-position buckets) match exactly.

Weights do not matter: compiled executables are keyed on HLO, which depends
on shapes/dtypes only — warming with random-init params serves real-weight
runs of the same model config.
"""

from __future__ import annotations

import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lmdx.cli import generate as gen
from lmdx.text.cache import LayoutCache, cache_filename


def class_key(group, pads, tokenizer):
    """Compiled-variant key for a batch: the pad target in budget mode,
    natural buckets (incl. the tokenization-derived word-position bucket)
    otherwise. Empty-layout groups key separately (no per-box scan)."""
    counts = [len(j["spec"]["gen_boxes"]) for j in group]
    if pads:
        return ("merged", pads["pad_boxes_to"], pads["pad_objs_to"],
                pads["pad_positions_to"], len(group))
    if sum(counts) == 0:
        return ("empty", len(group))
    p_pad = (gen.workload_position_floor(
        tokenizer, [j["spec"] for j in group]) if tokenizer else None)
    return ("natural", gen._flat_bucket(sum(counts)),
            gen._pow2_bucket(max(counts)), p_pad, len(group))


def enumerate_classes(args, bundle):
    cache_path = args.cache_path or cache_filename(
        args.prompt_type, args.template_version, args.model, args.cache_dir)
    cache = LayoutCache(cache_path, allow_nonexist=False)
    from lmdx.eval.prompts import get_prompts

    prompts = get_prompts(args.prompt_type, model=args.model)
    save_dir = gen.make_save_dir(args)
    jobs = gen.build_jobs(args, cache, prompts, save_dir)
    groups, pad_plan, _ = gen.plan_groups(
        args, jobs, tokenizer=bundle.tokenizer if bundle else None)

    reps = {}  # key -> (group, pads)
    for group, pads in zip(groups, pad_plan):
        key = class_key(group, pads, bundle.tokenizer if bundle else None)
        reps.setdefault(key, (group, pads))
    return reps


def warm_one(key, group, pads, args, bundle, segmenter, run_kwargs):
    from lmdx.methods.batch import run_lmd_batch, run_lmd_plus_batch

    run_batch_fn = (run_lmd_plus_batch if args.run_model == "lmd_plus"
                    else run_lmd_batch)
    t0 = time.perf_counter()
    run_batch_fn([j["spec"] for j in group], bundle,
                 bg_seeds=[j["bg_seed"] for j in group],
                 fg_seed_starts=[j["fg_seed_start"] for j in group],
                 segmenter=segmenter, **(pads or {}), **run_kwargs)
    print(f"[warm] {key}: {time.perf_counter() - t0:.1f}s "
          f"(compile + one batch)", flush=True)


def main(argv=None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)

    def pop_opt(name, has_value=True):
        if name not in argv:
            return None
        i = argv.index(name)
        if has_value:
            val = argv[i + 1]
            del argv[i : i + 2]
            return val
        del argv[i]
        return True

    workers = int(pop_opt("--workers") or 0)
    list_only = bool(pop_opt("--list", has_value=False))
    class_index = pop_opt("--class-index")

    args = gen.build_parser().parse_args(argv)
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    from lmdx.runtime import jit_cache

    jit_cache.enable()
    from lmdx.runtime.models import load_bundle

    bundle = load_bundle(
        gen.select_model_key(args),
        dtype="float32" if args.use_autocast == 0 else None)
    sam_checkpoint = args.sam_checkpoint or gen.discover_sam_checkpoint()
    segmenter = gen.load_segmenter(sam_checkpoint) if sam_checkpoint else None
    run_kwargs = gen.collect_run_kwargs(args)

    reps = enumerate_classes(args, bundle)
    keys = sorted(reps)
    if list_only:
        for key in keys:
            print(f"[warm] class {key}")
        print(f"[warm] {len(keys)} compiled variants to warm")
        return 0

    if class_index is not None:  # subprocess worker: warm exactly one class
        key = keys[int(class_index)]
        warm_one(key, *reps[key], args, bundle, segmenter, run_kwargs)
        return 0

    print(f"[warm] {len(keys)} compiled variants, "
          f"{'sequential' if workers <= 1 else f'{workers} workers'}")
    t0 = time.perf_counter()
    if workers <= 1:
        for key in keys:
            warm_one(key, *reps[key], args, bundle, segmenter, run_kwargs)
    else:
        pending = list(range(len(keys)))
        running: list[subprocess.Popen] = []
        failed = 0
        while pending or running:
            while pending and len(running) < workers:
                i = pending.pop(0)
                running.append(subprocess.Popen(
                    [sys.executable, os.path.abspath(__file__),
                     *argv, "--class-index", str(i)]))
            done = [p for p in running if p.poll() is not None]
            for p in done:
                running.remove(p)
                failed += p.returncode != 0
            if not done:
                time.sleep(2.0)
        if failed:
            print(f"[warm] {failed} worker(s) failed")
            return 1
    print(f"[warm] total {time.perf_counter() - t0:.1f}s; cache at "
          f"{jit_cache.DEFAULT_DIR}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
