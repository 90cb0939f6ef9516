"""Trace the batched LMD+ *overall* sampler scan and break down the trace.

The round-2 MFU table showed the overall scan at 20.0 s wall vs ~16.8 s of
estimated kernel composition (50 CFG steps x 180 ms + 65 guidance iters x
119 ms). This script replaces the estimate with a real trace: it runs the
full batched pipeline once to compile, then re-runs it with a jax.profiler
trace around ONLY the overall `sample` call (the second one), and reports,
per TPU plane line: summed event time, span (last end - first start), and
the top ops — so in-program op time and between-op gaps are separated.

    python scripts/trace_overall.py [BATCH]
"""

from __future__ import annotations

import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

from lmdx.runtime import jit_cache

jit_cache.enable()

from lmdx.methods import batch as batch_mod  # noqa: E402
from lmdx.runtime import models as runtime_models  # noqa: E402

TRACE_DIR = "/tmp/lmdx_trace_overall"


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 8

    import bench

    bench.BATCH = batch
    specs = bench._specs()

    real_sample = batch_mod.sample
    state = {"n": 0, "trace": False}

    def wrapped(*args, **kwargs):
        state["n"] += 1
        # Calls 1..B(+1) are per-box passes / composition; the LAST call in a
        # pipeline invocation is the overall pass. For the traced run we flag
        # the overall call by arity of invocations per run (2 for batched:
        # one batched per-box + one overall).
        is_overall = state["n"] % 2 == 0
        if state["trace"] and is_overall:
            with jax.profiler.trace(TRACE_DIR):
                out = real_sample(*args, **kwargs)
                jax.block_until_ready(out.latents)
            return out
        return real_sample(*args, **kwargs)

    batch_mod.sample = wrapped

    bundle = runtime_models.load_bundle(
        "gligen/diffusers-generation-text-box", seed=0)

    def once():
        return batch_mod.run_lmd_plus_batch(
            specs, bundle, bg_seeds=list(range(1, batch + 1)),
            num_inference_steps=50)

    once()  # compile
    os.makedirs(TRACE_DIR, exist_ok=True)
    state["trace"] = True
    imgs = once()
    np.asarray(imgs[0].image)

    xplane = sorted(glob.glob(
        os.path.join(TRACE_DIR, "**", "*.xplane.pb"), recursive=True))[-1]
    print("xplane:", xplane)
    report(xplane)


def report(xplane: str, top: int = 30):
    import collections

    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    xs = xplane_pb2.XSpace()
    with open(xplane, "rb") as fh:
        xs.ParseFromString(fh.read())
    for plane in xs.planes:
        if "TPU" not in plane.name:
            continue
        meta = {m.id: m.name for m in plane.event_metadata.values()}
        print(f"\n=== plane {plane.name}")
        for line in plane.lines:
            if not line.events:
                continue
            dur = sum(ev.duration_ps for ev in line.events)
            start = min(ev.offset_ps for ev in line.events)
            end = max(ev.offset_ps + ev.duration_ps for ev in line.events)
            span = end - start
            print(f"line {line.name!r}: n={len(line.events)} "
                  f"sum={dur / 1e12:.3f}s span={span / 1e12:.3f}s "
                  f"gap={(span - dur) / 1e12:.3f}s")
        for line in plane.lines:
            if line.name != "XLA Ops" or not line.events:
                continue
            per_op = collections.Counter()
            n_op = collections.Counter()
            for ev in line.events:
                name = meta.get(ev.metadata_id, "?")
                per_op[name] += ev.duration_ps
                n_op[name] += 1
            total = sum(per_op.values())
            print(f"\ntop ops ({total / 1e12:.3f}s total):")
            for name, ps in per_op.most_common(top):
                print(f"{ps / 1e9:10.1f} ms {100 * ps / total:5.1f}% "
                      f"n={n_op[name]:6d}  {name[:100]}")


if __name__ == "__main__":
    main()
