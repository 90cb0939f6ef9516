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


def test_device_bicubic_resize_matches_pil():
    """device_resize_bicubic with pil_bicubic_weights must reproduce PIL
    BICUBIC (the stage-2 protocol's resize, transformers OwlViTProcessor)
    to <=2 LSB on <1% of pixels — up- AND down-scale, the uint8
    intermediate clamp included."""
    from PIL import Image

    rng = np.random.default_rng(7)
    for in_s, out_s in [(64, 96), (96, 64), (48, 48)]:
        img = rng.integers(0, 256, (in_s, in_s, 3), np.uint8)
        pil = np.asarray(
            Image.fromarray(img).resize((out_s, out_s), Image.BICUBIC),
            np.int32)
        dev = np.asarray(owlvit_lib.device_resize_bicubic(
            img[None],
            owlvit_lib.pil_bicubic_weights(in_s, out_s),
            owlvit_lib.pil_bicubic_weights(in_s, out_s)))[0].astype(np.int32)
        diff = np.abs(pil - dev)
        assert diff.max() <= 2, (in_s, out_s, diff.max())
        assert (diff > 0).mean() < 0.01, (in_s, out_s, (diff > 0).mean())


def test_detect_batch_device_resize_tracks_pil_path(tiny_detector):
    """detect_batch on NON-model-size images resizes on device (uint8
    source upload); results must track the sequential path's host PIL
    resize within the <=2 LSB input deviation's downstream effect."""
    rng = np.random.default_rng(3)
    images = [rng.integers(0, 255, (96, 96, 3), np.uint8) for _ in range(2)]
    texts_list = [["a cat"], ["a dog", "a car"]]
    batched = tiny_detector.detect_batch(images, texts_list)
    for img, texts, (bb, bs, bl) in zip(images, texts_list, batched):
        rb, rs, rl = tiny_detector(img, texts)
        np.testing.assert_allclose(bb, rb, atol=5e-3)
        np.testing.assert_allclose(bs, rs, atol=5e-3)
        gap_ok = np.abs(np.sort(rs)[-1] - rs) > 1e-3  # skip near-tie argmax
        np.testing.assert_array_equal(bl[gap_ok], rl[gap_ok])


def test_detect_batch_matches_sequential(tiny_detector):
    """detect_batch (one forward, per-image query sets, uint8 upload +
    on-device normalization) must reproduce the per-image path: same
    host-side resize, same float math, query pads sliced off."""
    rng = np.random.default_rng(1)
    images = [rng.integers(0, 255, (64, 64, 3), np.uint8) for _ in range(3)]
    texts_list = [["a photo of a cat"],
                  ["a photo of a dog", "a photo of a car"],
                  ["a cat", "a dog", "a bird"]]
    batched = tiny_detector.detect_batch(images, texts_list)
    assert len(batched) == 3
    for img, texts, (bb, bs, bl) in zip(images, texts_list, batched):
        rb, rs, rl = tiny_detector(img, texts)
        assert bs.shape == rs.shape  # query pads sliced to the real count
        np.testing.assert_allclose(bb, rb, atol=1e-5)
        np.testing.assert_allclose(bs, rs, atol=1e-5)
        np.testing.assert_array_equal(bl, rl)


def test_evaluate_run_batched_matches_sequential(tiny_detector, tmp_path):
    """evaluate_run with eval_batch>1 (chunked detect_batch, last chunk
    padded by repeating its final job) scores exactly the jobs the
    sequential reference loop scores, in the same order, with the same
    results — including a missing image that must be skipped."""
    from PIL import Image

    rng = np.random.default_rng(2)
    for ind in (0, 1, 3, 4):  # prompt 2's image is missing
        d = tmp_path / str(ind)
        d.mkdir()
        Image.fromarray(rng.integers(0, 255, (64, 64, 3), dtype=np.uint8),
                        "RGB").save(d / "img_0.png")

    kwargs = dict(prompt_type="lmd", model="gpt-4", num_prompts=5)
    seq = eval_owl.evaluate_run(str(tmp_path), tiny_detector,
                                eval_batch=1, **kwargs)
    bat = eval_owl.evaluate_run(str(tmp_path), tiny_detector,
                                eval_batch=3, **kwargs)
    assert seq.summary() == bat.summary()
    assert "4" in seq.summary().splitlines()[-1]  # 4 images scored


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


def test_top_k_pre_nms_cap():
    """Score-sorted pre-NMS cap (VERDICT r04 weak #4): under a degenerate
    score distribution the cap bounds NMS input; with planted detections it
    keeps the highest-scoring boxes, and a generous cap is report-equivalent
    to the uncapped protocol."""
    rng = np.random.default_rng(0)
    n = 600
    boxes = np.concatenate([
        np.array([[0.05, 0.05, 0.35, 0.35], [0.6, 0.6, 0.95, 0.95]]),
        rng.uniform(0, 1, (n, 2)).repeat(2, axis=1) * [1, 1, 0, 0]
        + np.concatenate([np.zeros((n, 2)), rng.uniform(0.01, 0.02, (n, 2))],
                         axis=1),
    ])
    boxes[:, 2:] += boxes[:, :2]
    scores = np.concatenate([[0.99, 0.98], rng.uniform(0.2, 0.5, n)])
    labels = np.zeros(len(scores), np.int64)

    def detector(image, texts):
        return boxes, scores, labels

    image = np.zeros((64, 64, 3), np.uint8)
    prompt = "A realistic photo of a scene with two cats"
    # Uncapped: 600 tiny junk boxes also pass threshold -> "two cats" fails.
    t_unc, ok_unc = eval_owl.eval_prompt(prompt, image, detector)
    # Capped at 2: exactly the two planted cats survive.
    t_cap, ok_cap = eval_owl.eval_prompt(prompt, image, detector,
                                         top_k_pre_nms=2)
    assert (t_unc, t_cap) == ("numeracy", "numeracy")
    assert not ok_unc and ok_cap
    # A cap >= the box count is exactly the uncapped protocol.
    assert eval_owl.eval_prompt(prompt, image, detector,
                                top_k_pre_nms=10_000) == (t_unc, ok_unc)
