"""Spec-level golden test for the stage-1 text stack.

Every cached LLM response in both reference benchmark caches is run through
(filter_boxes . parse_layout_response) and convert_spec; the digest of the
full result is pinned in tests/fixtures/stage1_golden.json. This catches
parser / box-filter / pluralization drift directly — the stage-1 eval score
(test_stage_one_eval.py) would only catch drift that changes a predicate
outcome. Re-bless with scripts/make_stage1_golden.py after an intentional
change verified against reference utils/parse.py:66-226,313-367.
"""

import json
import os

import pytest

from scripts.make_stage1_golden import CACHES, spec_digest

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures", "stage1_golden.json")


@pytest.mark.parametrize("cache_name", sorted(CACHES))
def test_stage1_spec_digests(cache_name):
    path = CACHES[cache_name]
    if not os.path.exists(path):
        pytest.skip(f"reference cache not present: {path}")
    golden = json.load(open(FIXTURE))[cache_name]
    cache = json.load(open(path))
    assert set(cache) == set(golden)

    mismatches = []
    for prompt, responses in cache.items():
        got = [spec_digest(prompt, r) for r in responses]
        if got != golden[prompt]:
            mismatches.append(prompt)
    assert not mismatches, (
        f"{len(mismatches)} prompts drifted, first: {mismatches[:3]}"
    )
