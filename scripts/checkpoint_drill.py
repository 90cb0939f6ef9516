"""Full-size checkpoint-load drill (VERDICT r04 #8).

Drives the production validate -> convert -> load path against fabricated
checkpoints (scripts/fabricate_checkpoints.py) at REAL parameter shapes —
the chain `scripts/run_real_weights.py` uses on first contact with real
weights (reference loads: models/models.py:41-53, sam.py:13-21,
scripts/owl_vit_eval.py:39-41) — then proves the loaded bundle is usable:
one text encode, one CFG UNet forward, one VAE decode at production
latent shapes.

The fabricated checkpoints carry no tokenizer files (the CLIP BPE vocab is
network-only), so the drill sets LMDX_ALLOW_WORD_TOKENIZER=1 — the drill's
subject is key coverage / shapes / conversion / device upload, not vocab.

    LMDX_CHECKPOINT_DIR=/tmp/fab_ckpts python scripts/checkpoint_drill.py \
        [--models KEY ...] [--cpu] [--forward]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--models", nargs="*", default=None,
                    help="model keys to drill (default: every fabricated "
                         "subdir under $LMDX_CHECKPOINT_DIR)")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--forward", action="store_true",
                    help="also run text-encode + CFG UNet fwd + VAE decode "
                         "on the loaded params")
    args = ap.parse_args()

    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ.setdefault("LMDX_ALLOW_WORD_TOKENIZER", "1")

    root = os.environ.get("LMDX_CHECKPOINT_DIR", "")
    if not root or not os.path.isdir(root):
        print(f"ERROR: LMDX_CHECKPOINT_DIR={root!r} is not a directory")
        return 2

    import jax
    import jax.numpy as jnp
    import numpy as np

    from lmdx.runtime import convert, jit_cache, models as modlib

    jit_cache.enable()
    print(f"devices: {jax.devices()}", flush=True)

    keys = args.models
    if keys is None:
        keys = sorted(
            k for k in convert._COMPONENT_MANIFESTS
            if os.path.isdir(os.path.join(root, k.replace("/", "--"))))
    if not keys:
        print(f"ERROR: no fabricated model dirs under {root}")
        return 2

    for key in keys:
        ckpt = os.path.join(root, key.replace("/", "--"))
        t0 = time.monotonic()
        report = convert.validate_checkpoint(key, ckpt)
        bad = {c: {k: v for k, v in d.items() if v}
               for c, d in report.items()}
        bad = {c: d for c, d in bad.items() if d}
        if bad:
            print(f"MANIFEST MISMATCH {key}: {bad}")
            return 3
        print(f"[{key}] validate OK ({time.monotonic() - t0:.1f}s)",
              flush=True)

        t0 = time.monotonic()
        bundle = modlib.load_bundle(key)
        n = sum(int(np.prod(p.shape))
                for p in jax.tree_util.tree_leaves(bundle.params))
        # Force the host->device upload to complete before timing.
        jax.block_until_ready(bundle.params)
        print(f"[{key}] convert+load: {time.monotonic() - t0:.1f}s "
              f"({n / 1e9:.2f}B params, dtype {bundle.config.dtype})",
              flush=True)

        if not args.forward:
            continue
        cfg = bundle.config
        h = cfg.latent_height
        dt = cfg.jnp_dtype()
        emb, _ = modlib.encode_text(bundle, ["a drill prompt", ""])
        x = jax.random.normal(jax.random.key(0), (2, h, h, 4), dt)
        t = jnp.asarray([500, 500], jnp.int32)
        kwargs = {}
        proj_dim = getattr(cfg.unet, "projection_class_embeddings_input_dim",
                           None)
        if proj_dim:  # SDXL text_time conditioning
            num_ids = (proj_dim - cfg.pooled_dim) // cfg.unet.addition_time_embed_dim
            kwargs = {
                "added_text_embeds": jnp.zeros((2, cfg.pooled_dim), dt),
                "added_time_ids": jnp.full((2, num_ids), 512.0, dt),
            }
        t0 = time.monotonic()
        eps = bundle.unet.apply({"params": bundle.params["unet"]},
                                x, t, emb.astype(dt), **kwargs)
        eps = np.asarray(eps)
        print(f"[{key}] CFG UNet forward @ {h}x{h}: "
              f"{time.monotonic() - t0:.1f}s (finite={np.isfinite(eps).all()})",
              flush=True)

        t0 = time.monotonic()
        from lmdx.methods import base as mbase
        img = mbase.decode_latents(bundle, x[:1])
        print(f"[{key}] VAE decode -> {img.shape}: "
              f"{time.monotonic() - t0:.1f}s (finite={np.isfinite(img).all()})",
              flush=True)

    print("checkpoint_drill: OK", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
