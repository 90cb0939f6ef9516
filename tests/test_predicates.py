import numpy as np

from lmdx.eval import predicates as preds


def box(name, bb=(0, 0, 10, 10)):
    return {"name": name, "bounding_box": list(bb)}


def test_count_substring():
    boxes = [box("a red car"), box("a carrot")]
    # count() is plain substring ("car" in "carrot" counts) — get_box is the
    # word-boundary-safe variant.
    assert preds.count(boxes, ("car",)) == 2


def test_get_box_word_boundary():
    boxes = [box("a carrot"), box("a red car")]
    got = preds.get_box(boxes, ("car",))
    assert got["name"] == "a red car"
    assert preds.get_box([box("a carrot")], ("car",)) is None


def test_predicate_numeracy():
    boxes = [box("a dog"), box("a dog"), box("a cat")]
    assert preds.predicate_numeracy(("dog",), 2, boxes)
    assert not preds.predicate_numeracy(("dog",), 1, boxes)
    assert preds.predicate_numeracy(("bird",), 0, boxes)


def test_predicate_attribution():
    boxes = [box("a red car"), box("a blue dog")]
    assert preds.predicate_attribution(("car",), ("dog",), "red", "blue", 1, 1, boxes)
    assert not preds.predicate_attribution(("car",), ("dog",), "blue", "red", 1, 1, boxes)
    # single-object variant
    assert preds.predicate_attribution(("car",), None, "red", None, 1, 1, boxes)


def test_predicate_spatial():
    left = box("a cat", (0, 0, 100, 100))
    right = box("a dog", (200, 0, 100, 100))
    verify = preds.LOCATIONS_XYWH[("left", "right")]
    assert preds.predicate_spatial(("cat",), ("dog",), verify, [left, right])
    assert not preds.predicate_spatial(("dog",), ("cat",), verify, [left, right])
    assert not preds.predicate_spatial(("cat",), ("bird",), verify, [left])


def test_eval_info_negation():
    texts, info = preds.get_eval_info_from_prompt(
        "A realistic photo of a scene without backpacks"
    )
    assert texts == [["a photo of a backpack"]]
    assert info["type"] == "negation"
    assert info["predicate"]([])  # zero backpacks -> success
    assert not info["predicate"]([box("a backpack")])


def test_eval_info_numeracy():
    _, info = preds.get_eval_info_from_prompt(
        "A realistic photo of a scene with three dogs"
    )
    assert info["type"] == "numeracy" and info["number"] == 3
    assert info["predicate"]([box("a dog")] * 3)
    assert not info["predicate"]([box("a dog")] * 2)


def test_eval_info_attribution():
    _, info = preds.get_eval_info_from_prompt(
        "A realistic photo of a scene with a red car and a blue dog"
    )
    assert info["type"] == "attribution"
    assert info["predicate"]([box("a red car"), box("a blue dog")])
    assert not info["predicate"]([box("a green car"), box("a blue dog")])


def test_eval_info_spatial():
    _, info = preds.get_eval_info_from_prompt(
        "A realistic photo of a scene with a cat on the left and a dog on the right"
    )
    assert info["type"] == "spatial"
    assert info["predicate"](
        [box("a cat", (0, 0, 50, 50)), box("a dog", (200, 0, 50, 50))]
    )
    assert not info["predicate"](
        [box("a cat", (200, 0, 50, 50)), box("a dog", (0, 0, 50, 50))]
    )


def test_nms_and_class_aware_nms():
    boxes = np.array([
        [0.0, 0.0, 0.5, 0.5],
        [0.01, 0.01, 0.5, 0.5],   # overlaps first
        [0.6, 0.6, 0.9, 0.9],
    ])
    scores = np.array([0.9, 0.8, 0.7])
    labels = np.array([0, 0, 1])
    keep = preds.nms(boxes, scores, threshold=0.5)
    assert keep == [0, 2]

    # With distinct labels, class-aware NMS keeps the overlapping pair.
    labels2 = np.array([0, 1, 1])
    kb, ks, kl = preds.class_aware_nms(boxes, scores, labels2, threshold=0.5)
    assert len(kb) == 3
