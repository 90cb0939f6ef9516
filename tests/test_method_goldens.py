"""Method-level golden regression: seed-fixed flagship runs must keep
producing the same image.

The reference-parity suite (tests/test_pipeline_parity.py) pins
`loop.sample` and the loss/composition functions against the reference
implementation; the structural method tests assert shapes and invariants.
Neither catches a refactor that silently changes the method ORCHESTRATION
— seed derivation, per-box wiring, mask selection, composition inputs.
These goldens do: any numeric drift in the end-to-end tiny-config output
fails here. Regenerate intentionally with scripts/make_method_goldens.py
after a deliberate behavior change (e.g. a parity fix) and explain the
change in the commit message.
"""

from __future__ import annotations

import os

import numpy as np
import pytest

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "fixtures", "goldens")


@pytest.mark.slow
@pytest.mark.parametrize("name", ["lmd", "lmd_plus"])
def test_method_output_matches_golden(name):
    import sys

    sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "scripts"))
    from make_method_goldens import run_method

    golden = np.load(os.path.join(GOLDEN_DIR, f"{name}.npy"))
    fresh = run_method(name)
    assert fresh.shape == golden.shape
    # uint8 images; allow single-bit rounding wiggle from XLA fusion-order
    # changes, fail on anything semantic.
    diff = np.abs(fresh.astype(np.int32) - golden.astype(np.int32))
    assert diff.max() <= 1, f"max pixel diff {diff.max()}"
