"""LMD+: LMD with GLIGEN gated self-attention grounding adapters.

Parity: reference generation/lmd_plus.py:193-227 — per-box and overall passes
both run through GLIGEN scheduled sampling (beta 0.4); per-box CA guidance is
disabled (max_index_step=0); masks are box-prompted; alignment is off with
horizontal-only shifts.
"""

from __future__ import annotations

from ..text.template import (
    DEFAULT_OVERALL_NEGATIVE_PROMPT,
    DEFAULT_SO_NEGATIVE_PROMPT,
)
from . import base
from ._grounded import GroundedParams, run_grounded

version = "lmd_plus"


def run(spec, bundle, segmenter=None, **overrides) -> base.GenerationResult:
    # LMD+ defaults (lmd_plus.py:202-227). CLI overrides win.
    defaults = dict(
        so_negative_prompt=DEFAULT_SO_NEGATIVE_PROMPT,
        overall_negative_prompt=DEFAULT_OVERALL_NEGATIVE_PROMPT,
        use_gligen=True,
        so_gligen_scheduled_sampling_beta=0.4,
        overall_gligen_scheduled_sampling_beta=0.4,
        max_index_step=0,
        so_center_box=False,
        so_horizontal_center_only=True,
        fg_blending_ratio=0.1,
        align_with_overall_bboxes=False,
        horizontal_shift_only=True,
    )
    params = GroundedParams(**{**defaults, **overrides})
    return run_grounded(spec, bundle, params, segmenter=segmenter)
