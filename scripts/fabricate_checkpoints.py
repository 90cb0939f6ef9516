"""Fabricate random checkpoints matching the checked-in manifests.

VERDICT r04 #8 (checkpoint-load drill): the converter/loader chain had only
ever been exercised at tiny test configs; this tool writes safetensors
checkpoint directories whose key/shape sets match lmdx/runtime/manifests/
exactly, so `scripts/run_real_weights.py` can drive its full
validate -> convert -> load -> generate path at PRODUCTION shapes without
network access. Values are N(0, 0.02) — numerically finite garbage; the
drill proves shapes, key coverage, conversion, and device loading, so first
contact with real weights is load-and-go.

    python scripts/fabricate_checkpoints.py --root /tmp/fab_ckpts \
        [--models gligen/diffusers-generation-text-box ...] [--sam] [--owlvit]

Then:
    LMDX_CHECKPOINT_DIR=/tmp/fab_ckpts python scripts/run_real_weights.py ...
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lmdx.runtime.convert import _COMPONENT_MANIFESTS, MANIFEST_DIR

# Component subdir -> weight filename _load_state_dict probes first.
_FILENAMES = {
    "unet": "diffusion_pytorch_model.safetensors",
    "vae": "diffusion_pytorch_model.safetensors",
    "text_encoder": "model.safetensors",
    "text_encoder_2": "model.safetensors",
}


def write_component(manifest_name: str, out_dir: str, filename: str,
                    seed: int) -> int:
    from safetensors.numpy import save_file

    manifest = json.load(
        open(os.path.join(MANIFEST_DIR, f"{manifest_name}.json")))
    rng = np.random.default_rng(seed)
    tensors = {}
    total = 0
    for key, shape in manifest.items():
        # Norm weights get 1.0 (zero scales would zero every activation);
        # everything else small normal noise.
        if key.endswith(".weight") and len(shape) == 1 and (
                "norm" in key or "ln_" in key or "layer_norm" in key):
            t = np.ones(shape, np.float32)
        else:
            # f32-native normal: the f64 default doubles RNG + cast cost,
            # which matters at 2.6B params on a one-core host.
            t = np.asarray(
                rng.standard_normal(size=shape, dtype=np.float32) * 0.02,
                np.float32)  # 0-dim entries (logit_scale) stay ndarray
        tensors[key] = t
        total += t.size
    os.makedirs(out_dir, exist_ok=True)
    save_file(tensors, os.path.join(out_dir, filename))
    return total


def fabricate_model(model_key: str, root: str) -> None:
    manifests = _COMPONENT_MANIFESTS[model_key]
    base = os.path.join(root, model_key.replace("/", "--"))
    grand = 0
    for i, (component, manifest_name) in enumerate(sorted(manifests.items())):
        n = write_component(manifest_name,
                            os.path.join(base, component),
                            _FILENAMES.get(component, "model.safetensors"),
                            seed=hash((model_key, component)) % 2**31)
        print(f"  {component}: {n / 1e6:.1f}M params ({manifest_name})")
        grand += n
    print(f"{model_key}: {grand / 1e9:.2f}B params -> {base}")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", required=True)
    ap.add_argument("--models", nargs="*",
                    default=["gligen/diffusers-generation-text-box"])
    ap.add_argument("--all", action="store_true",
                    help="every SD model key with manifests")
    ap.add_argument("--sam", action="store_true")
    ap.add_argument("--owlvit", action="store_true")
    args = ap.parse_args()

    models = sorted(_COMPONENT_MANIFESTS) if args.all else args.models
    for key in models:
        fabricate_model(key, args.root)
    if args.sam:
        n = write_component(
            "sam_vit_base", os.path.join(args.root, "facebook--sam-vit-base"),
            "model.safetensors", seed=11)
        print(f"facebook--sam-vit-base: {n / 1e6:.1f}M params")
    if args.owlvit:
        n = write_component(
            "owlvit_base_patch32",
            os.path.join(args.root, "google--owlvit-base-patch32"),
            "model.safetensors", seed=12)
        print(f"google--owlvit-base-patch32: {n / 1e6:.1f}M params")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
