"""End-to-end method tests on the tiny weightless bundle.

These drive the full stage-2 stack — prompt encoding, sampling loops,
guidance, GLIGEN packing, mask refinement, composition, frozen regeneration,
VAE decode — at toy scale on CPU. Output *quality* is meaningless with random
params; these tests pin down shapes, determinism, and orchestration.
"""

import numpy as np
import pytest

from lmdx import methods
from lmdx.runtime import models as runtime_models

TINY_KEYS = (("down", 0, 0, 0), ("mid", 0, 0, 0), ("up", 1, 0, 0))
TINY_OBJ_KEY = ("down", 0, 0, 0)

SPEC = {
    "prompt": "A realistic scene with a red cube and a blue ball",
    "gen_boxes": [
        ("a red cube", (50, 300, 120, 120)),
        ("a blue ball", (300, 280, 100, 100)),
    ],
    "bg_prompt": "A realistic scene",
    "extra_neg_prompt": "",
}

GROUNDED_OVERRIDES = dict(
    num_inference_steps=10,
    max_iter=1,
    overall_max_iter=1,
    max_index_step=2,
    overall_max_index_step=2,
    guidance_attn_keys=TINY_KEYS,
    obj_attn_key=TINY_OBJ_KEY,
    attn_aggregation_step_start=4,
)


@pytest.fixture(scope="module")
def bundle():
    return runtime_models.load_bundle("tiny-test", seed=0)


def _check_image(result, bundle):
    assert result.image.shape == (bundle.config.height, bundle.config.width, 3)
    assert result.image.dtype == np.uint8


def test_sd(bundle):
    result = methods.sd.run(SPEC, bundle, num_inference_steps=6)
    _check_image(result, bundle)


def test_sd_deterministic(bundle):
    a = methods.sd.run(SPEC, bundle, bg_seed=7, num_inference_steps=4)
    b = methods.sd.run(SPEC, bundle, bg_seed=7, num_inference_steps=4)
    c = methods.sd.run(SPEC, bundle, bg_seed=8, num_inference_steps=4)
    np.testing.assert_array_equal(a.image, b.image)
    assert (a.image != c.image).any()


def test_gligen(bundle):
    result = methods.gligen.run(SPEC, bundle, num_inference_steps=6)
    _check_image(result, bundle)


def test_backward_guidance(bundle):
    result = methods.backward_guidance.run(
        SPEC, bundle, num_inference_steps=6, overall_max_iter=1,
        overall_max_index_step=2, guidance_attn_keys=TINY_KEYS,
    )
    _check_image(result, bundle)


def test_lmd(bundle):
    result = methods.lmd.run(SPEC, bundle, **GROUNDED_OVERRIDES)
    _check_image(result, bundle)
    assert len(result.so_img_list) == 2
    # The composed foreground must cover some latent area for both objects.
    assert result.aux["frozen_mask"].sum() > 0
    assert set(np.unique(result.aux["foreground_indices"])) >= {0, 1, 2}


def test_lmd_plus(bundle):
    result = methods.lmd_plus.run(SPEC, bundle, **GROUNDED_OVERRIDES)
    _check_image(result, bundle)
    assert len(result.so_img_list) == 2
    assert result.aux["frozen_mask"].sum() > 0


def test_lmd_fast_schedule(bundle):
    result = methods.lmd.run(
        SPEC, bundle, use_fast_schedule=True, **GROUNDED_OVERRIDES)
    _check_image(result, bundle)


def test_lmd_empty_layout(bundle):
    spec = {"prompt": "A sunset", "gen_boxes": [], "bg_prompt": "A sunset",
            "extra_neg_prompt": ""}
    result = methods.lmd.run(spec, bundle, **GROUNDED_OVERRIDES)
    _check_image(result, bundle)
    assert result.so_img_list == []


def test_method_registry():
    assert set(methods.METHODS) >= {"sd", "gligen", "backward_guidance",
                                    "lmd", "lmd_plus"}
    assert methods.get_method("lmd-plus").version == "lmd_plus"
    with pytest.raises(KeyError):
        methods.get_method("nope")
