"""Grouped per-category time breakdown of an xplane trace.

Unlike profile_ops.py's flat per-op counter, this separates the trace
lines (module events vs op events vs DMA) and groups op events into
categories (pallas attention, convolution, reduce/groupnorm, copies,
other fusions) so the per-call cost structure is readable.

    python scripts/xplane_groups.py /tmp/lmdx_trace/.../vm.xplane.pb [iters]
"""

from __future__ import annotations

import collections
import re
import sys

from tensorflow.tsl.profiler.protobuf import xplane_pb2


def categorize(name: str) -> str:
    # The event name is a full HLO line incl. operands; categorize on the
    # instruction (lhs) name only, or operand text pollutes the match.
    lhs = name.split(" = ")[0].lstrip("%")
    base = re.sub(r"\.\d+$", "", lhs)
    if "_pallas_attention" in base:
        m = re.search(r"bf16\[(\d+),(\d+),(\d+)\]", name)
        return f"pallas_attn L={m.group(2)}" if m else "pallas_attn"
    if "convolution" in base:
        m = re.search(r"= (?:\()?bf16\[([\d,]+)\]", name)
        return f"conv out=[{m.group(1)}]" if m else f"conv ({base})"
    if base in ("copy-start", "copy-done"):
        return "async copy"
    if base in ("slice-start", "slice-done", "dynamic-slice-start",
                "dynamic-slice-done"):
        return "async slice"
    if "reduce" in base:
        m = re.search(r"bf16\[([\d,]+)\]", name)
        return (f"reduce-fusion act=[{m.group(1)}]" if m
                else f"reduce ({base})")
    if base == "copy":
        return "layout copy"
    if "fusion" in base:
        return "other fusion"
    if "custom-call" in base:
        return "custom-call other"
    return f"misc ({base})"


def main():
    path = sys.argv[1]
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    xs = xplane_pb2.XSpace()
    with open(path, "rb") as fh:
        xs.ParseFromString(fh.read())
    for plane in xs.planes:
        if "TPU" not in plane.name:
            continue
        meta = {m.id: m.name for m in plane.event_metadata.values()}
        print(f"\n== plane {plane.name}")
        for line in plane.lines:
            per_cat = collections.Counter()
            per_cat_n = collections.Counter()
            biggest: dict[str, tuple[float, str]] = {}
            for ev in line.events:
                name = meta.get(ev.metadata_id, "?")
                cat = categorize(name)
                per_cat[cat] += ev.duration_ps
                per_cat_n[cat] += 1
                if cat not in biggest or ev.duration_ps > biggest[cat][0]:
                    biggest[cat] = (ev.duration_ps, name[:90])
            total = sum(per_cat.values())
            if total == 0:
                continue
            print(f"\n-- line '{line.name}' total {total/1e9/iters:.2f} ms/iter "
                  f"({len(line.events)} events)")
            for cat, ps in per_cat.most_common(30):
                big = biggest[cat]
                print(f"{ps/1e9/iters:9.3f} ms {100*ps/total:5.1f}% "
                      f"n={per_cat_n[cat]//iters:<4d} {cat}")
                if ps / total > 0.02:
                    print(f"          biggest: {big[0]/1e9/iters:.3f} ms  {big[1]}")


if __name__ == "__main__":
    main()
