"""Regenerate tests/fixtures/stage1_golden.json.

Pins the exact output of (filter_boxes . parse_layout_response) and
convert_spec for every cached LLM response in the two reference benchmark
caches, so parser / filter / pluralization drift is caught directly (not
just indirectly through the stage-1 score). Run from the repo root:

    python scripts/make_stage1_golden.py

Only rerun (i.e. re-bless the goldens) after verifying an intentional
behavior change against the reference semantics (utils/parse.py:66-226,313-367).
"""

import hashlib
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lmdx.text import parser  # noqa: E402

CACHES = {
    "gpt-4": "/root/reference/cache/cache_lmd_v0.1_gpt-4.json",
    "gpt-3.5-turbo": "/root/reference/cache/cache_lmd_v0.1_gpt-3.5-turbo.json",
}
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "tests", "fixtures", "stage1_golden.json")


def spec_digest(prompt: str, response: str) -> str:
    layout = parser.parse_layout_response(response, strict=True)
    boxes = parser.filter_boxes(layout.gen_boxes)
    spec = {
        "prompt": prompt,
        "gen_boxes": boxes,
        "bg_prompt": layout.bg_prompt,
        "extra_neg_prompt": layout.neg_prompt,
    }
    conv = parser.convert_spec(spec, height=512, width=512)
    canonical = repr((
        boxes,
        layout.bg_prompt,
        layout.neg_prompt,
        conv.so_prompt_phrase_word_box,
        conv.overall_prompt,
        conv.overall_phrases_words_bboxes,
    ))
    return hashlib.sha256(canonical.encode()).hexdigest()[:16]


def main():
    out = {}
    for name, path in CACHES.items():
        cache = json.load(open(path))
        digests = {}
        for prompt, responses in cache.items():
            digests[prompt] = [spec_digest(prompt, r) for r in responses]
        out[name] = digests
        n = sum(len(v) for v in digests.values())
        print(f"{name}: {len(digests)} prompts, {n} responses")
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    json.dump(out, open(OUT, "w"), indent=0, sort_keys=True)
    print(f"wrote {OUT}")


if __name__ == "__main__":
    main()
