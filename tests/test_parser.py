import pytest

from lmdx.text import english
from lmdx.text.parser import (
    Layout,
    ParseError,
    convert_spec,
    filter_boxes,
    parse_layout_response,
)

SAMPLE = (
    "[('a blue cube', [202, 120, 110, 110]), ('a red cube', [204, 236, 104, 104])]\n"
    "Background prompt: An indoor scene\n"
    "Negative prompt: birds"
)


def test_parse_full_response():
    layout = parse_layout_response(SAMPLE)
    assert layout.gen_boxes == [
        ("a blue cube", [202, 120, 110, 110]),
        ("a red cube", [204, 236, 104, 104]),
    ]
    assert layout.bg_prompt == "An indoor scene"
    assert layout.neg_prompt == "birds"


def test_parse_with_objects_prefix():
    layout = parse_layout_response("Objects: " + SAMPLE)
    assert len(layout.gen_boxes) == 2


def test_parse_empty_and_none_fields():
    layout = parse_layout_response("[]\nBackground prompt: A scene\nNegative prompt: None")
    assert layout.gen_boxes == []
    assert layout.neg_prompt == ""

    layout = parse_layout_response(
        "No objects mentioned.\nBackground prompt: A scene\nNegative prompt: "
    )
    assert layout.gen_boxes == []


def test_parse_missing_background_strict():
    with pytest.raises(ParseError):
        parse_layout_response("[('a cat', [0, 0, 10, 10])]")


def test_parse_missing_negative_defaults_empty():
    layout = parse_layout_response("[]\nBackground prompt: A scene")
    assert layout.neg_prompt == ""


def test_filter_boxes_drops_degenerate_and_background():
    boxes = [
        ("a cat", (10, 10, 100, 100)),
        ("empty", (0, 0, 0, 50)),           # zero width
        ("bg", (0, 0, 512, 512)),            # background-sized
        ("offscreen", (600, 0, 50, 50)),     # starts beyond canvas
    ]
    out = filter_boxes(boxes, scale_boxes=False)
    assert out == [("a cat", (10, 10, 100, 100))]


def test_filter_boxes_rescales_out_of_bounds():
    # A box hanging off the right edge forces a joint rescale even with
    # scale_boxes=False.
    boxes = [("a dog", (256, 0, 512, 256))]
    out = filter_boxes(boxes, scale_boxes=False)
    (_, (x, y, w, h)), = out
    assert x == 0 and w == 512  # shifted to x_lo=0 then scaled to span
    assert 0 <= y and y + h <= 512


def test_filter_boxes_max_scale_caps_upscaling():
    boxes = [("a mouse", (0, 0, 10, 10))]
    out = filter_boxes(boxes, scale_boxes=True, max_scale=3)
    assert out == [("a mouse", (0, 0, 30, 30))]


def test_filter_boxes_dict_format_roundtrip():
    boxes = [{"name": "a cat.", "bounding_box": (10, 10, 100, 100)}]
    out = filter_boxes(boxes, scale_boxes=False)
    assert out == [{"name": "a cat", "bounding_box": (10, 10, 100, 100)}]


def test_convert_spec_dedup_and_pluralize():
    spec = {
        "prompt": "two apples on a table",
        "gen_boxes": [
            ("an apple", (150, 226, 100, 100)),
            ("an apple", (280, 226, 100, 100)),
            ("a wooden table", (20, 148, 472, 216)),
        ],
        "bg_prompt": "A realistic top-down view",
    }
    converted = convert_spec(spec, 512, 512)
    # sorted by name: 'a wooden table' < 'an apple'
    assert [item[1] for item in converted.so_prompt_phrase_word_box] == [
        "a wooden table", "an apple", "an apple",
    ]
    assert converted.so_prompt_phrase_word_box[0][0] == (
        "A realistic top-down view with a wooden table"
    )
    assert converted.so_prompt_phrase_word_box[0][2] == "table"
    phrases = [p for p, _, _ in converted.overall_phrases_words_bboxes]
    assert phrases == ["a wooden table", "two apples"]
    assert converted.overall_prompt == (
        "A realistic top-down view with a wooden table, two apples"
    )
    # flattened overall boxes correspond 1:1 with the per-object list
    flat = sum((b for _, _, b in converted.overall_phrases_words_bboxes), start=[])
    assert flat == [item[3] for item in converted.so_prompt_phrase_word_box]


def test_convert_spec_no_background():
    spec = {"prompt": "a cat", "gen_boxes": [("a cat", (0, 0, 100, 100))], "bg_prompt": ""}
    converted = convert_spec(spec, 512, 512)
    assert converted.so_prompt_phrase_word_box[0][0] == "a cat"
    assert converted.overall_prompt == "a cat"


def test_convert_spec_empty_boxes():
    spec = {"prompt": "a scene", "gen_boxes": [], "bg_prompt": "A scene"}
    converted = convert_spec(spec, 512, 512)
    assert converted.overall_prompt == "A scene"
    assert converted.so_prompt_phrase_word_box == []


def test_english_helpers():
    assert english.pluralize("cat") == "cats"
    assert english.pluralize("blue box") == "blue boxes"
    assert english.pluralize("puppy") == "puppies"
    assert english.singularize("backpacks") == "backpack"
    assert english.singularize("dishes") == "dish"
    assert english.number_to_words(3) == "three"
    assert english.number_to_words(21) == "twenty-one"
    assert english.a("apple") == "an apple"
    assert english.a("red apple") == "a red apple"
    assert english.a("orange") == "an orange"
    assert english.a("hour") == "an hour"
    assert english.a("unicorn") == "a unicorn"


def test_vis_heatmap_suite():
    """The artifact visualizers (reference utils/vis.py equivalents) render
    without matplotlib and at the expected sizes."""
    import numpy as np

    from lmdx.utils import vis

    rng = np.random.RandomState(0)
    assert vis.heatmap(rng.rand(8, 8), size=64).size == (64, 64)
    # constant array must not divide by zero
    assert vis.heatmap(np.zeros((4, 4))).size == (4, 4)
    grid = vis.array_grid([rng.rand(8, 8)] * 3, titles=["a", "b", "c"])
    assert grid.size == (128 * 3, 128 + 14)
    strip = vis.attn_heatmaps(rng.rand(6, 1, 2, 16, 1), steps=[0, 3, 5])
    assert strip.size == (128 * 3, 128 + 14)
    ml = vis.masked_latents(rng.rand(1, 8, 8, 4), rng.rand(8, 8) > 0.5)
    assert ml.size == (256 * 3, 256 + 14)
    traj = vis.latent_trajectory_strip(rng.rand(11, 1, 8, 8, 4), stride=5)
    assert traj.size == (96 * 3, 96 + 14)

    # mask_overlay (reference parse.show_masks): disjoint masks get distinct
    # colors, empty list renders, overlap saturates instead of wrapping.
    m1 = np.zeros((16, 16), np.float32)
    m1[:8] = 1.0
    m2 = np.zeros((16, 16), np.float32)
    m2[8:] = 1.0
    ov = vis.mask_overlay([m1, m2], size=32)
    assert ov.size == (32, 32)
    arr = np.asarray(vis.mask_overlay([m1, m2]))
    assert arr[0, 0].any() and arr[15, 15].any()
    assert not np.array_equal(arr[0, 0], arr[15, 15])
    both = np.asarray(vis.mask_overlay([m1, m1 * 0 + 1.0]))
    assert both.max() <= 255
    assert vis.mask_overlay([]).size == (64, 64)
