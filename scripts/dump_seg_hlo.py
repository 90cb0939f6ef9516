"""Dump the compiled HLO of the batched-pipeline OVERALL guidance segment.

Captures the exact (static, args) of each _run_segment invocation during one
batched LMD+ run, then lowers/compiles the requested call and prints either
the full HLO or just ops matching a size/pattern filter. Used to identify
hot ops seen in traces (scripts/trace_overall.py) that op names alone don't
explain.

    python scripts/dump_seg_hlo.py [call_index] [pattern]
"""

from __future__ import annotations

import re
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np

from lmdx.runtime import jit_cache

jit_cache.enable()

from lmdx.methods import batch as batch_mod  # noqa: E402
from lmdx.runtime import models as runtime_models  # noqa: E402
from lmdx.sampling import loop as loop_mod  # noqa: E402

CALLS = []
real = loop_mod._run_segment


def wrapper(unet, static, params, schedule, carry, xs, consts):
    CALLS.append((unet, static, params, schedule, carry, xs, consts))
    return real(unet, static, params, schedule, carry, xs, consts)


loop_mod._run_segment = wrapper


def main():
    want = int(sys.argv[1]) if len(sys.argv) > 1 else -1
    pattern = sys.argv[2] if len(sys.argv) > 2 else "1048576"

    import bench

    bench.BATCH = 8
    specs = bench._specs()
    bundle = runtime_models.load_bundle(
        "gligen/diffusers-generation-text-box", seed=0)
    out = batch_mod.run_lmd_plus_batch(
        specs, bundle, bg_seeds=list(range(1, 9)), num_inference_steps=50)
    np.asarray(out[0].image)

    for i, (unet, static, *_rest) in enumerate(CALLS):
        print(f"call {i}: guidance={static.guidance} fuser={static.fuser} "
              f"frozen={static.frozen} batched={static.guidance_batched} "
              f"save_taps={static.save_taps}")

    unet, static, params, schedule, carry, xs, consts = CALLS[want]
    txt = real.lower(unet, static, params, schedule, carry, xs,
                     consts).compile().as_text()
    with open("/tmp/seg_hlo.txt", "w") as fh:
        fh.write(txt)
    print(f"\n=== call {want} HLO: {len(txt.splitlines())} lines "
          f"(full text in /tmp/seg_hlo.txt); ops matching {pattern!r}:")
    seen = set()
    for line in txt.splitlines():
        if re.search(pattern, line):
            s = line.strip()[:300]
            key = s.split(" = ")[0].rsplit(".", 1)[0]
            if key in seen:
                continue
            seen.add(key)
            print(s)


if __name__ == "__main__":
    main()
