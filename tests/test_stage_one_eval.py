"""End-to-end stage-1 evaluation against the published reference layout
caches. Fully offline and deterministic; reproduces the README accuracy
numbers (reference README.md:148-151): GPT-4 100.0%, GPT-3.5 99.0%.
"""

import pytest

from lmdx.eval.stage_one import evaluate_stage_one
from lmdx.text.cache import LayoutCache
from lmdx.text.llm_client import LLMConfig


def run_eval(cache_path, model):
    cache = LayoutCache(cache_path, allow_nonexist=False)
    config = LLMConfig(model=model, api_key="unused")
    return evaluate_stage_one("lmd", config, cache)


def test_stage_one_golden_slice_fast_tier(ref_cache_gpt4, ref_cache_gpt35):
    """Fast-tier slice of the published-numbers path: 10 prompts from each
    task section (negation 0-9, numeracy 100-109, attribution 200-209,
    spatial 300-309) through the full cache -> parse -> predicate pipeline,
    asserting EXACT per-task counts. GPT-4 is 40/40; GPT-3.5's slice catches
    one of its four published failures (spatial 9/10 — the 99.0% overall,
    reference README.md:148-151). The full-400 runs stay in the slow tier
    below; this keeps the default tier covering the golden path end to end."""
    expected = {
        "gpt-4": {0: ("negation", 10), 100: ("numeracy", 10),
                  200: ("attribution", 10), 300: ("spatial", 10)},
        "gpt-3.5-turbo": {0: ("negation", 10), 100: ("numeracy", 10),
                          200: ("attribution", 10), 300: ("spatial", 9)},
    }
    caches = {"gpt-4": ref_cache_gpt4, "gpt-3.5-turbo": ref_cache_gpt35}
    for model, slices in expected.items():
        cache = LayoutCache(caches[model], allow_nonexist=False)
        config = LLMConfig(model=model, api_key="unused")
        for start, (task, successes) in slices.items():
            report = evaluate_stage_one("lmd", config, cache,
                                        skip_first_prompts=start,
                                        num_prompts=10)
            assert report.total_counts == {task: 10}, (model, start)
            assert report.success_counts == {task: successes}, (model, start)


@pytest.mark.slow
def test_stage_one_gpt4_is_100_percent(ref_cache_gpt4):
    report = run_eval(ref_cache_gpt4, "gpt-4")
    assert sum(report.total_counts.values()) == 400
    assert report.overall_rate == pytest.approx(1.0)


@pytest.mark.slow
def test_stage_one_gpt35_is_99_percent(ref_cache_gpt35):
    report = run_eval(ref_cache_gpt35, "gpt-3.5-turbo")
    assert sum(report.total_counts.values()) == 400
    assert report.overall_rate == pytest.approx(0.99, abs=1e-6)
