"""OWL-ViT detector and stage-2 eval machinery tests (tiny config)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lmdx.eval import owl_vit as eval_owl
from lmdx.nn import owlvit as owlvit_lib


@pytest.fixture(scope="module")
def tiny_detector():
    config = owlvit_lib.tiny_owlvit()
    model = owlvit_lib.OwlViT(config)
    params = model.init(
        jax.random.key(0),
        jnp.zeros((1, config.image_size, config.image_size, 3)),
        jnp.zeros((2, config.text.max_length), jnp.int32),
    )["params"]
    return eval_owl.FlaxOwlViTDetector(params, config)


def test_detector_shapes(tiny_detector):
    image = np.zeros((64, 64, 3), np.uint8)
    boxes, scores, labels = tiny_detector(image, ["a photo of a cat",
                                                  "a photo of a dog"])
    n = tiny_detector.config.grid ** 2
    assert boxes.shape == (n, 4)
    assert scores.shape == (n,)
    assert labels.shape == (n,)
    # Corners are NOT clipped to [0,1] (reference post_process keeps raw
    # cx±w/2 coordinates); centers still land inside the unit canvas.
    centers = (boxes[:, :2] + boxes[:, 2:]) / 2
    assert (centers >= 0).all() and (centers <= 1).all()
    assert set(np.unique(labels)) <= {0, 1}


def test_detector_query_bucket_padding_is_inert(tiny_detector):
    """A 3-query call pads the query axis to 4; padded columns must not
    change the real queries' scores (queries are independent in OWL-ViT)."""
    rng = np.random.default_rng(0)
    image = rng.integers(0, 255, (64, 64, 3), np.uint8)
    texts = ["a photo of a cat", "a photo of a dog", "a photo of a car"]
    _, scores3, labels3 = tiny_detector(image, texts)
    for i in range(3):
        _, s1, _ = tiny_detector(image, [texts[i]])
        # scores are per-box max over queries; single-query scores bound it
        assert (scores3 >= s1 - 1e-5).all()
    _, scores2, _ = tiny_detector(image, texts[:2])
    mask2 = labels3 < 2
    np.testing.assert_allclose(scores3[mask2], scores2[mask2], atol=1e-5)


def test_eval_prompt_with_planted_detections():
    """A fake detector with planted boxes must drive the predicates exactly."""

    def detector(image, texts):
        # Two cats: predicate for "two cats" numeracy should pass.
        boxes = np.array([[0.1, 0.1, 0.3, 0.3], [0.6, 0.6, 0.9, 0.9]])
        return boxes, np.array([0.9, 0.8]), np.array([0, 0])

    image = np.zeros((64, 64, 3), np.uint8)
    eval_type, ok = eval_owl.eval_prompt(
        "A realistic photo of a scene with two cats", image, detector)
    assert eval_type == "numeracy" and ok

    eval_type, ok = eval_owl.eval_prompt(
        "A realistic photo of a scene with three cats", image, detector)
    assert eval_type == "numeracy" and not ok

    eval_type, ok = eval_owl.eval_prompt(
        "A realistic photo of a scene without cats", image, detector)
    assert eval_type == "negation" and not ok


def test_nms_threshold_drops_duplicates():
    def detector(image, texts):
        # Two near-identical boxes -> NMS keeps one -> numeracy "one cat" ok.
        boxes = np.array([[0.1, 0.1, 0.5, 0.5], [0.11, 0.11, 0.5, 0.5]])
        return boxes, np.array([0.9, 0.85]), np.array([0, 0])

    image = np.zeros((64, 64, 3), np.uint8)
    _, ok = eval_owl.eval_prompt(
        "A realistic photo of a scene with one cat", image, detector)
    assert ok


def test_box_bias_matches_grid():
    bias = owlvit_lib.box_bias(4)
    assert bias.shape == (16, 4)
    # Center of the first cell is (1/4, 1/4) in the biased parameterization.
    xy = 1.0 / (1.0 + np.exp(-bias[0, :2]))
    np.testing.assert_allclose(xy, [0.25, 0.25], atol=1e-3)
