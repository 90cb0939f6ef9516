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
    # Commit params to device once — host-resident params would re-stream
    # every call over the tunnel and swamp the trace with copy-starts.
    params = jax.device_put(bundle.params["unet"])
    jax.block_until_ready(params)
    np.asarray(fwd(params, lat)[0, 0, 0])  # compile + settle

    os.makedirs(TRACE_DIR, exist_ok=True)
    with jax.profiler.trace(TRACE_DIR):
        for _ in range(3):
            out = fwd(params, lat)
        np.asarray(out[0, 0, 0])

    xplane = sorted(glob.glob(
        os.path.join(TRACE_DIR, "**", "*.xplane.pb"), recursive=True))[-1]
    print("xplane:", xplane)

    report(xplane)


def report(xplane: str, top: int = 35):
    """Per-op time breakdown parsed straight from the xplane proto.

    (tensorboard_plugin_profile's converters are broken against this
    image's protobuf/tensorflow pairing; the raw XSpace is all we need.)
    Run under PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python if the C++
    descriptor pool rejects the generated proto module.
    """
    import collections

    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    xs = xplane_pb2.XSpace()
    with open(xplane, "rb") as fh:
        xs.ParseFromString(fh.read())
    for plane in xs.planes:
        if "TPU" not in plane.name:
            continue
        per_op = collections.Counter()
        meta = {m.id: m.name for m in plane.event_metadata.values()}
        for line in plane.lines:
            for ev in line.events:
                per_op[meta.get(ev.metadata_id, "?")] += ev.duration_ps
        total = sum(per_op.values())
        print(f"\nplane {plane.name}: total {total/1e9:.2f} ms "
              f"over {len(per_op)} op names")
        for name, ps in per_op.most_common(top):
            print(f"{ps/1e9:9.3f} ms {100*ps/total:5.1f}%  {name[:110]}")


if __name__ == "__main__":
    main()
