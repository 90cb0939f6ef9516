"""Tensor-parallel SDXL at REAL parameter shapes on a virtual CPU mesh.

SURVEY §2 names SDXL as the tensor-parallel sharding use case; until round 5
nothing had exercised tp on its real shapes (tiny configs only). This script
builds the full-size SDXL-base UNet (2.6B params, dual-tower context dim
2048) with random weights, shards it Megatron-style over a ("dp","tp")
virtual CPU mesh (dist/mesh.py param rules), runs ONE CFG UNet forward
sharded and unsharded, and asserts agreement — proving the PartitionSpec
rules cover every real parameter name and that GSPMD compiles the
production topology.

The latent grid defaults to 64x64 (512^2-equivalent) to keep the one-core
CPU run tractable; --full-res uses the 128x128 production grid. Either way
the tp-sharded matmuls are the real (2048/1280/5120...) parameter shapes —
the thing tp actually shards.

    python scripts/sdxl_tp_virtual.py [--devices 4] [--tp 2] [--full-res]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", type=int, default=4)
    ap.add_argument("--tp", type=int, default=2)
    ap.add_argument("--full-res", action="store_true")
    args = ap.parse_args()

    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={args.devices}"
        ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from lmdx import config as cfglib
    from lmdx.dist import mesh as meshlib
    from lmdx.nn.unet import UNet2DCondition
    from lmdx.runtime import jit_cache

    jit_cache.enable()

    cfg = cfglib.sdxl_base()
    h = cfg.latent_height if args.full_res else 64
    ucfg = cfg.unet
    unet = UNet2DCondition(ucfg, dtype=jnp.float32)

    b = 2  # CFG pair
    d = ucfg.cross_attention_dim
    x = jax.random.normal(jax.random.key(0), (b, h, h, 4), jnp.float32)
    t = jnp.asarray([500, 500], jnp.int32)
    text = jax.random.normal(jax.random.key(1), (b, 77, d)) * 0.02
    pooled_dim = cfg.pooled_dim
    num_ids = (ucfg.projection_class_embeddings_input_dim
               - pooled_dim) // ucfg.addition_time_embed_dim
    added = {
        "added_text_embeds": jax.random.normal(
            jax.random.key(2), (b, pooled_dim)) * 0.02,
        "added_time_ids": jnp.ones((b, num_ids), jnp.float32) * 512,
    }

    t0 = time.monotonic()
    params = unet.init(jax.random.key(7), x, t, text, **added)["params"]
    n = sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(params))
    print(f"SDXL-base UNet init: {time.monotonic() - t0:.1f}s "
          f"({n / 1e9:.2f}B params f32, latent {h}x{h})", flush=True)

    def fwd(p, x, t, text, a1, a2):
        return unet.apply({"params": p}, x, t, text,
                          added_text_embeds=a1, added_time_ids=a2)

    t0 = time.monotonic()
    ref = np.asarray(jax.jit(fwd)(params, x, t, text,
                                  added["added_text_embeds"],
                                  added["added_time_ids"]))
    print(f"unsharded forward (compile+run): {time.monotonic() - t0:.1f}s",
          flush=True)

    mesh = meshlib.make_mesh(dp=args.devices // args.tp, tp=args.tp)
    sh_params = meshlib.shard_params(params, mesh)
    # Count actually-tp-sharded params (the Megatron rules must cover the
    # real SDXL names, incl. the 10-deep transformer stacks).
    specs = meshlib.param_spec(params)
    n_sharded = sum(
        int(np.prod(leaf.shape))
        for leaf, spec in zip(jax.tree_util.tree_leaves(params),
                              jax.tree_util.tree_leaves(
                                  specs, is_leaf=lambda s: isinstance(s, P)))
        if any(ax == "tp" for ax in spec))
    print(f"mesh {dict(mesh.shape)}; tp-sharded {n_sharded / 1e9:.2f}B of "
          f"{n / 1e9:.2f}B params "
          f"({100 * n_sharded / n:.0f}%)", flush=True)
    assert n_sharded > 0.5 * n, "tp rules missed most of the UNet"

    xs = jax.device_put(x, NamedSharding(mesh, P("dp")))
    t0 = time.monotonic()
    out = jax.jit(fwd, out_shardings=NamedSharding(mesh, P("dp")))(
        sh_params, xs, t, text, added["added_text_embeds"],
        added["added_time_ids"])
    out = np.asarray(out)
    print(f"tp={args.tp} sharded forward (compile+run): "
          f"{time.monotonic() - t0:.1f}s", flush=True)

    diff = np.max(np.abs(out - ref))
    denom = np.max(np.abs(ref)) + 1e-9
    print(f"sharded vs unsharded max|diff|={diff:.2e} "
          f"(rel {diff / denom:.2e})", flush=True)
    assert diff / denom < 1e-3, diff
    print("sdxl_tp_virtual: OK", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
