"""Op-level TPU profile of one UNet forward (and optionally a guided step).

Captures a jax.profiler trace and converts it with xprof/tensorboard-plugin
tooling into a per-HLO-op time breakdown.

    python scripts/profile_ops.py [batch] [fuser]
"""

from __future__ import annotations

import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from lmdx.runtime import jit_cache

jit_cache.enable()

from lmdx.nn.unet import apply_unet  # noqa: E402
from lmdx.runtime import models as runtime_models  # noqa: E402

TRACE_DIR = "/tmp/lmdx_trace"


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    with_fuser = len(sys.argv) > 2 and sys.argv[2] == "fuser"

    bundle = runtime_models.load_bundle(
        "gligen/diffusers-generation-text-box", seed=0)
    cfg = bundle.config
    h, w = cfg.latent_height, cfg.latent_width
    d = cfg.unet.cross_attention_dim
    lat = jnp.zeros((batch, h, w, 4), jnp.float32)
    t = jnp.zeros((), jnp.int32)
    ctx = jnp.zeros((batch, 77, d), jnp.float32)
    objs = (jnp.zeros((batch, cfg.unet.gligen_max_objs, d), jnp.float32)
            if with_fuser else None)

    fwd = jax.jit(lambda p, l: apply_unet(
        bundle.unet, p, l, t, ctx, objs=objs, fuser_gate=1.0)[0])
    params = bundle.params["unet"]
    np.asarray(fwd(params, lat)[0, 0, 0])  # compile + settle

    os.makedirs(TRACE_DIR, exist_ok=True)
    with jax.profiler.trace(TRACE_DIR):
        for _ in range(3):
            out = fwd(params, lat)
        np.asarray(out[0, 0, 0])

    xplane = sorted(glob.glob(
        os.path.join(TRACE_DIR, "**", "*.xplane.pb"), recursive=True))[-1]
    print("xplane:", xplane)

    from tensorboard_plugin_profile.convert import raw_to_tool_data

    data, _ = raw_to_tool_data.xspace_to_tool_data(
        [xplane], "framework_op_stats^", {})
    import csv
    import io

    rows = list(csv.reader(io.StringIO(
        data.decode() if isinstance(data, bytes) else data)))
    header = rows[0]
    cols = {name: i for i, name in enumerate(header)}
    print(" | ".join(header[:10]))
    body = rows[1:]

    def f(row, name, default=0.0):
        try:
            return float(row[cols[name]])
        except Exception:
            return default

    key_time = next((c for c in ("total_self_time", "self_time_us",
                                 "Total self-time (us)", "avg_self_time_us")
                     if c in cols), None)
    print("time column:", key_time)
    body.sort(key=lambda r: -f(r, key_time))
    total = sum(f(r, key_time) for r in body)
    print(f"total self time: {total/1e3:.2f} ms")
    for r in body[:30]:
        name_i = cols.get("operation", cols.get("Operation", 1))
        print(f"{f(r, key_time)/1e3:9.3f} ms  {100*f(r, key_time)/total:5.1f}%  "
              f"{r[name_i][:90]}")


if __name__ == "__main__":
    main()
