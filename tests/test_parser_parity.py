"""Stage-1 text-stack parity vs the reference's utils/parse.py over ALL
real cached LLM responses.

tests/test_stage1_golden.py pins (filter ∘ parse) against checked-in hashes
of lmdx's own output; this file removes the self-reference: the reference's
actual parse_input_with_negative / filter_boxes / convert_spec run (over the
structural shims; inflect shimmed with the same pluralization rules
lmdx/text/english.py reconstructs) against lmdx's parser on every response
of all three shipped caches — 500+ real GPT-3.5/GPT-4 outputs — and every
field must match: boxes, background prompt, negative prompt, the filtered/
rescaled boxes, and the derived per-box + overall prompts/phrases/words.
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np
import pytest

pytest.importorskip("torch")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CACHE_DIR = "/root/reference/cache"
CACHES = [
    "cache_demo_v0.1_gpt-4.json",
    "cache_lmd_v0.1_gpt-4.json",
    "cache_lmd_v0.1_gpt-3.5-turbo.json",
]


def _load_reference_parse():
    shim = os.path.join(REPO, "scripts", "_diffusers_shim")
    for p in (shim, "/root/reference"):
        if p not in sys.path:
            sys.path.insert(0, p)
    import importlib

    return importlib.import_module("utils.parse")


def _responses():
    for name in CACHES:
        with open(os.path.join(CACHE_DIR, name)) as f:
            data = json.load(f)
        for prompt, responses in data.items():
            for resp in responses:
                yield name, prompt, resp


def test_parse_and_filter_match_reference_on_all_caches():
    rp = _load_reference_parse()
    from lmdx.text import parser as fp

    n = 0
    for name, prompt, resp in _responses():
        t_boxes, t_bg, t_neg = rp.parse_input_with_negative(
            text=resp, no_input=True)
        layout = fp.parse_layout_response(resp)
        assert layout.gen_boxes == t_boxes, (name, prompt)
        assert layout.bg_prompt == t_bg, (name, prompt)
        assert layout.neg_prompt == t_neg, (name, prompt)

        t_filtered = rp.filter_boxes(t_boxes)
        f_filtered = fp.filter_boxes(layout.gen_boxes)
        assert len(f_filtered) == len(t_filtered), (name, prompt)
        for fb, tb in zip(f_filtered, t_filtered):
            assert fb[0] == tb[0], (name, prompt)
            np.testing.assert_allclose(
                np.float64(fb[1]), np.float64(tb[1]), atol=1e-9,
                err_msg=f"{name} {prompt}")
        n += 1
    assert n >= 500  # 3 + 250 + 250 cache entries


def test_convert_spec_matches_reference_on_all_caches():
    rp = _load_reference_parse()
    from lmdx.text import parser as fp

    n = 0
    for name, prompt, resp in _responses():
        t_boxes, t_bg, t_neg = rp.parse_input_with_negative(
            text=resp, no_input=True)
        boxes = rp.filter_boxes(t_boxes)
        spec = {"prompt": prompt, "gen_boxes": boxes, "bg_prompt": t_bg,
                "extra_neg_prompt": t_neg}
        t_so, t_overall, t_pwb = rp.convert_spec(spec, 512, 512)

        conv = fp.convert_spec(spec, 512, 512)
        assert conv.overall_prompt == t_overall, (name, prompt)
        assert len(conv.so_prompt_phrase_word_box) == len(t_so), (name, prompt)
        for fs, ts in zip(conv.so_prompt_phrase_word_box, t_so):
            assert fs[0] == ts[0] and fs[1] == ts[1] and fs[2] == ts[2], (
                name, prompt)
            np.testing.assert_allclose(np.float64(fs[3]), np.float64(ts[3]),
                                       atol=1e-9)
        assert len(conv.overall_phrases_words_bboxes) == len(t_pwb)
        for (fph, fw, fbs), (tph, tw, tbs) in zip(
                conv.overall_phrases_words_bboxes, t_pwb):
            assert fph == tph and fw == tw, (name, prompt, fph, tph)
            np.testing.assert_allclose(np.float64(fbs), np.float64(tbs),
                                       atol=1e-9)
        n += 1
    assert n >= 500
