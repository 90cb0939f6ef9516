"""Regenerate the method-level golden outputs in tests/fixtures/goldens/.

Each golden is the final uint8 image of a seed-fixed tiny-test-config run
of a flagship method (the whole orchestration: seed derivation, per-box
passes, masking, composition, overall pass). tests/test_method_goldens.py
compares fresh runs against these — a drift net for refactors that the
structural method tests and the reference-parity tests (which pin
loop.sample, not the method wiring) would not catch.

Run on the CPU backend (the same backend the test tier uses):
    python scripts/make_method_goldens.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

GOLDEN_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tests", "fixtures", "goldens")

SPEC = {
    "prompt": "a photo of a blue cube and a red sphere",
    "gen_boxes": [("a blue cube", (90, 150, 180, 160)),
                  ("a red sphere", (300, 180, 140, 140))],
    "bg_prompt": "a photo of a simple scene",
    "extra_neg_prompt": "",
}
STEPS = 4


def run_method(name: str):
    from lmdx import methods
    from lmdx.runtime import models as runtime_models

    bundle = runtime_models.load_bundle("tiny-test", seed=0)
    method = getattr(methods, name)
    result = method.run(SPEC, bundle, bg_seed=7, fg_seed_start=100,
                        num_inference_steps=STEPS)
    return np.asarray(result.image)


def main():
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    for name in ("lmd", "lmd_plus"):
        img = run_method(name)
        path = os.path.join(GOLDEN_DIR, f"{name}.npy")
        np.save(path, img)
        print(f"saved {path} shape={img.shape} checksum={int(img.sum())}")


if __name__ == "__main__":
    main()
