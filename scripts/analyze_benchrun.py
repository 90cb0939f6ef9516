"""Summarize a batched-driver benchmark log into a compile-vs-steady table.

The batched driver (lmdx.cli.generate --image-batch-size N) prints one line
per batch: `[batched] K/400 done  boxes=[...] 12.3s (0.65 img/s)`. Every
distinct batch *shape class* — (flat box bucket, max boxes/image) — compiles
its own sampler scans, so the first batch of a class pays XLA compilation
and the rest run steady-state. This script separates the two, which is the
measurement VERDICT round 2 asked for: compile-variant count, compile wall
vs steady wall, and throughput at the real benchmark box-count distribution
(reference README.md:93, generate.py:275-279 is the workload being modeled).

Usage: python scripts/analyze_benchrun.py /tmp/benchrun_gpt4.log
"""

from __future__ import annotations

import ast
import re
import sys

LINE = re.compile(
    r"\[batched\] (\d+)/(\d+) done\s+boxes=(\[[^\]]*\])"
    r"(?:\s+pad=\((\d+),(\d+)\))?\s+([0-9.]+)s")


def pow2_bucket(n: int) -> int:
    # Mirrors lmdx/sampling/guidance.py:bucket — the per-image object pad
    # is the pow2 bucket of max(boxes), not the raw max, so e.g. max=3 and
    # max=4 batches share ONE compiled variant and must group together.
    return 1 << max(0, n - 1).bit_length() if n > 0 else 0


def box_bucket(n: int) -> int:
    if n <= 0:
        return 0
    if n <= 8:
        return pow2_bucket(n)
    return ((n + 7) // 8) * 8


def main(path: str) -> None:
    batches = []  # (shape_class, n_images, wall_s)
    total = None
    for line in open(path):
        m = LINE.search(line)
        if not m:
            continue
        done, total, boxes_s, pad_flat, pad_objs, wall = m.groups()
        boxes = ast.literal_eval(boxes_s)
        if pad_flat is not None:
            # Compile-budget plan: the driver logged the EFFECTIVE padded
            # class this batch compiled/ran as — raw shapes would
            # misattribute which batch paid which compile.
            cls = (int(pad_flat), int(pad_objs))
        else:
            cls = (box_bucket(sum(boxes)),
                   pow2_bucket(max(boxes)) if boxes else 0)
        batches.append((cls, len(boxes), float(wall)))

    classes: dict = {}
    for cls, n, wall in batches:
        classes.setdefault(cls, []).append((n, wall))

    print(f"batches: {len(batches)}   images: "
          f"{sum(n for _, n, _ in batches)}/{total}   "
          f"shape classes (compiled variants): {len(classes)}")
    print(f"{'class (flat,maxbox)':>20} {'batches':>8} {'first(s)':>9} "
          f"{'steady med(s)':>14} {'steady img/s':>13}")
    compile_wall = steady_wall = steady_imgs = 0.0
    for cls in sorted(classes):
        runs = classes[cls]
        first = runs[0][1]
        rest = runs[1:]
        # Median: robust against host contention polluting a few batches.
        med = (sorted(w for _, w in rest)[len(rest) // 2]
               if rest else float("nan"))
        ips = (rest[0][0] / med) if rest else float("nan")
        print(f"{str(cls):>20} {len(runs):>8} {first:>9.1f} {med:>14.1f} "
              f"{ips:>13.3f}")
        # first batch of a class = compile + one steady execution
        compile_wall += max(0.0, first - (med if rest else 0.0))
        steady_wall += sum(w for _, w in runs) - max(
            0.0, first - (med if rest else 0.0))
        steady_imgs += sum(n for n, _ in runs)
    tw = compile_wall + steady_wall
    print(f"\ncompile wall ~{compile_wall:.0f}s   steady wall ~{steady_wall:.0f}s"
          f"   total {tw:.0f}s")
    if steady_wall:
        print(f"steady-state throughput over the real distribution: "
              f"{steady_imgs / steady_wall:.3f} img/s/chip "
              f"(end-to-end incl. compiles: {steady_imgs / tw:.3f})")


if __name__ == "__main__":
    main(sys.argv[1])
