import json

from lmdx.eval import prompts as bench


def test_benchmark_sizes():
    prompts = bench.get_lmd_prompts()
    assert len(prompts["lmd_negation"]) == 100
    assert len(prompts["lmd_numeracy"]) == 100
    assert len(prompts["lmd_attribution"]) == 100
    assert len(prompts["lmd_spatial"]) == 100
    assert len(prompts["lmd"]) == 400


def test_benchmark_prompt_shapes():
    prompts = bench.get_lmd_prompts()
    assert prompts["lmd_negation"][0] == "A realistic photo of a scene without backpacks"
    assert prompts["lmd_numeracy"][0] == "A realistic photo of a scene with one backpack"
    assert all(p.startswith("A realistic photo of a scene") for p in prompts["lmd"])
    for p in prompts["lmd_spatial"]:
        assert " on the " in p


def test_benchmark_matches_reference_cache_keys(ref_cache_gpt4):
    """Golden parity: every generated benchmark prompt is a key of the
    published reference layout cache, and the cache response multiplicity
    matches the prompt repeat count exactly."""
    cache = json.load(open(ref_cache_gpt4))
    prompts = bench.get_lmd_prompts()["lmd"]
    assert set(prompts) == set(cache.keys())
    counts = {}
    for p in prompts:
        counts[p] = counts.get(p, 0) + 1
    for key, responses in cache.items():
        assert counts[key] == len(responses), key


def test_predicate_rederivation_covers_all_prompts():
    from lmdx.eval.predicates import get_eval_info_from_prompt

    expected_types = {
        "lmd_negation": "negation",
        "lmd_numeracy": "numeracy",
        "lmd_attribution": "attribution",
        "lmd_spatial": "spatial",
    }
    for split, expected in expected_types.items():
        for prompt, _ in bench.get_lmd_prompt_predicates(split):
            _, info = get_eval_info_from_prompt(prompt)
            assert info["type"] == expected, prompt
