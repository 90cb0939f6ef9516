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
