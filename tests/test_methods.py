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

# Every test here jit-compiles at least one full sampler scan (tens of
# seconds each on this host); the whole module is the slow tier.
pytestmark = pytest.mark.slow

SPEC = {
    "prompt": "A realistic scene with a red cube and a blue ball",
    "gen_boxes": [
        ("a red cube", (50, 300, 120, 120)),
        ("a blue ball", (300, 280, 100, 100)),
    ],
    "bg_prompt": "A realistic scene",
    "extra_neg_prompt": "",
}

# Guidance keys and the obj-attn key are derived from the tiny topology
# (guidance.default_guidance_keys / default_obj_attn_key).
GROUNDED_OVERRIDES = dict(
    num_inference_steps=10,
    max_iter=1,
    overall_max_iter=1,
    max_index_step=2,
    overall_max_index_step=2,
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
        overall_max_index_step=2,
    )
    _check_image(result, bundle)


def test_lmd(bundle):
    result = methods.lmd.run(SPEC, bundle, **GROUNDED_OVERRIDES)
    _check_image(result, bundle)
    assert len(result.so_img_list) == 2
    # The composed foreground must cover some latent area for both objects.
    assert result.aux["frozen_mask"].sum() > 0
    assert set(np.unique(result.aux["foreground_indices"])) >= {0, 1, 2}
    # Per-box masks are exposed for the masks.png artifact
    # (reference parse.show_masks).
    assert len(result.aux["masks"]) == 2


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


def test_boxdiff(bundle):
    result = methods.boxdiff.run(
        SPEC, bundle, num_inference_steps=6, overall_max_index_step=2,
    )
    _check_image(result, bundle)


def test_multidiffusion(bundle):
    result = methods.multidiffusion.run(
        SPEC, bundle, steps=6, bootstrapping=3)
    _check_image(result, bundle)
    # Region masks exposed for masks.png (reference multidiffusion.py:384).
    assert len(result.aux["masks"]) == len(SPEC["gen_boxes"])
    # Reference-style signature also works.
    result2 = methods.multidiffusion.run(
        gen_boxes=SPEC["gen_boxes"], bg_prompt=SPEC["bg_prompt"],
        bundle=bundle, steps=4, bootstrapping=0, original_ind_base=5)
    _check_image(result2, bundle)


def test_refine_img2img(bundle):
    base_img = methods.sd.run(SPEC, bundle, num_inference_steps=4).image
    refined = methods.sdxl_refine.refine(
        base_img, SPEC, refine_seed=3, refinement_step_ratio=0.5,
        bundle=bundle, target_size=bundle.config.height)
    assert refined.shape == base_img.shape
    assert refined.dtype == np.uint8


def test_invert_roundtrip(bundle):
    import jax.numpy as jnp

    from lmdx.core import schedule as sched
    from lmdx.runtime import models as rm
    from lmdx.sampling.loop import invert

    schedule = sched.make_schedule(8)
    uncond, cond = rm.encode_prompts(bundle, ["a cat"], "")
    te = jnp.concatenate([uncond, cond])
    h = bundle.config.latent_height
    x0 = jnp.zeros((1, h, h, 4), jnp.float32)
    final, traj = invert(bundle.unet, bundle.params["unet"], schedule, x0, te)
    # x0 plus T-1 inversion steps — the reference walks timesteps[:-1]
    # (pipelines.py:504), so an 8-step grid yields an 8-entry trajectory.
    assert traj.shape == (8, 1, h, h, 4)
    assert np.isfinite(np.asarray(final)).all()


def test_sdxl_family_img2img():
    """tiny-sdxl: per-level transformer depth + text_time conditioning."""
    b = runtime_models.load_bundle("tiny-sdxl", seed=1)
    base_img = (np.random.RandomState(0)
                .randint(0, 255, (32, 32, 3)).astype(np.uint8))
    refined = methods.sdxl_refine.refine(
        base_img, SPEC, refine_seed=3, refinement_step_ratio=0.5,
        bundle=b, target_size=b.config.height)
    assert refined.shape == (32, 32, 3)
    assert refined.dtype == np.uint8


def test_lmd_plus_batched_multi_image(bundle):
    from lmdx.methods.batch import run_lmd_plus_batch

    spec2 = {"prompt": "A park with a green tree",
             "gen_boxes": [("a green tree", (200, 100, 150, 250))],
             "bg_prompt": "A park", "extra_neg_prompt": "people"}
    overrides = {k: v for k, v in GROUNDED_OVERRIDES.items()
                 if k != "max_index_step"}  # batched path needs LMD+ regime
    results = run_lmd_plus_batch(
        [SPEC, spec2], bundle, bg_seeds=[1, 2],
        return_so_images=True, **overrides)
    assert len(results) == 2
    for r, n_boxes in zip(results, (2, 1)):
        _check_image(r, bundle)
        assert len(r.so_img_list) == n_boxes
        assert r.aux["frozen_mask"].sum() > 0
    assert (results[0].image != results[1].image).any()


def test_lmd_plus_batched_matches_shapes_with_empty_layout(bundle):
    from lmdx.methods.batch import run_lmd_plus_batch

    empty = {"prompt": "A sunset", "gen_boxes": [], "bg_prompt": "A sunset",
             "extra_neg_prompt": ""}
    overrides = {k: v for k, v in GROUNDED_OVERRIDES.items()
                 if k != "max_index_step"}
    results = run_lmd_plus_batch([SPEC, empty], bundle, bg_seeds=[3, 4],
                                 **overrides)
    assert len(results) == 2
    _check_image(results[0], bundle)
    _check_image(results[1], bundle)


def test_lmd_plus_batched_all_empty_layouts(bundle):
    """The benchmark's negation task is 100 zero-box prompts; with shape
    scheduling (cli/generate.py) they group into ALL-empty batches, which
    must skip the per-box pass (n_total == 0) and still produce images."""
    from lmdx.methods.batch import run_lmd_plus_batch

    empty = {"prompt": "A sunset", "gen_boxes": [], "bg_prompt": "A sunset",
             "extra_neg_prompt": ""}
    overrides = {k: v for k, v in GROUNDED_OVERRIDES.items()
                 if k != "max_index_step"}
    results = run_lmd_plus_batch([empty, dict(empty)], bundle,
                                 bg_seeds=[3, 4], **overrides)
    assert len(results) == 2
    for r in results:
        _check_image(r, bundle)
        assert r.so_img_list == []
    # Distinct bg seeds must still produce distinct images.
    assert (results[0].image != results[1].image).any()


def test_batched_matches_sequential_lmd_plus(bundle):
    """The multi-image pipeline must reproduce the single-image pipeline
    bit-for-bit-ish (same seeds, same hyperparameters)."""
    from lmdx.methods.batch import run_lmd_plus_batch

    overrides = {k: v for k, v in GROUNDED_OVERRIDES.items()
                 if k != "max_index_step"}
    spec2 = {"prompt": "A park with a green tree",
             "gen_boxes": [("a green tree", (200, 100, 150, 250))],
             "bg_prompt": "A park", "extra_neg_prompt": ""}

    seq = [methods.lmd_plus.run(SPEC, bundle, bg_seed=11, **overrides),
           methods.lmd_plus.run(spec2, bundle, bg_seed=12, **overrides)]
    batched = run_lmd_plus_batch([SPEC, spec2], bundle, bg_seeds=[11, 12],
                                 **overrides)
    for s, b in zip(seq, batched):
        # Identical math modulo float reassociation across the batch axis.
        diff = np.abs(s.image.astype(np.int32) - b.image.astype(np.int32))
        assert np.mean(diff) < 2.0, float(np.mean(diff))
        assert np.array_equal(s.aux["frozen_mask"], b.aux["frozen_mask"])


def test_batched_defer_fetch_matches_eager(bundle):
    """Cross-batch pipelining (defer_fetch=True + finalize_results after
    dispatching the next batch) is pure dispatch reordering: images must be
    byte-identical to the eager path (cli/generate.py run_batched,
    bench.py)."""
    from lmdx.methods import base as method_base
    from lmdx.methods.batch import run_lmd_plus_batch

    overrides = {k: v for k, v in GROUNDED_OVERRIDES.items()
                 if k != "max_index_step"}
    spec2 = {"prompt": "A park with a green tree",
             "gen_boxes": [("a green tree", (200, 100, 150, 250))],
             "bg_prompt": "A park", "extra_neg_prompt": ""}

    eager = [run_lmd_plus_batch([SPEC], bundle, bg_seeds=[31], **overrides),
             run_lmd_plus_batch([spec2], bundle, bg_seeds=[32], **overrides)]

    # The serving-driver schedule: dispatch batch k+1, THEN resolve batch k.
    d0 = run_lmd_plus_batch([SPEC], bundle, bg_seeds=[31],
                            defer_fetch=True, **overrides)
    assert isinstance(d0[0].image, method_base.ImageRef)
    d1 = run_lmd_plus_batch([spec2], bundle, bg_seeds=[32],
                            defer_fetch=True, **overrides)
    method_base.finalize_results(d0)
    method_base.finalize_results(d1)
    assert isinstance(d0[0].image, np.ndarray)

    for e, d in zip(eager, [d0, d1]):
        assert np.array_equal(e[0].image, d[0].image)
        assert np.array_equal(e[0].aux["frozen_mask"], d[0].aux["frozen_mask"])


def test_batched_matches_sequential_lmd(bundle):
    """Training-free LMD through the multi-image serving path — per-box CA
    guidance rides the batched guidance loop — must reproduce the
    sequential method (same seeds/hyperparameters)."""
    from lmdx.methods.batch import run_lmd_batch

    spec2 = {"prompt": "A park with a green tree",
             "gen_boxes": [("a green tree", (200, 100, 150, 250))],
             "bg_prompt": "A park", "extra_neg_prompt": ""}

    seq = [methods.lmd.run(SPEC, bundle, bg_seed=21, **GROUNDED_OVERRIDES),
           methods.lmd.run(spec2, bundle, bg_seed=22, **GROUNDED_OVERRIDES)]
    batched = run_lmd_batch([SPEC, spec2], bundle, bg_seeds=[21, 22],
                            **GROUNDED_OVERRIDES)
    for s, b in zip(seq, batched):
        # Identical math modulo float reassociation across the batch axis.
        assert np.abs(b.image.astype(int) - s.image.astype(int)).max() <= 1


def test_batched_fast_schedule_matches_sequential(bundle):
    """The truncated fast schedule (reference utils/schedule.py:4-8) through
    the batched serving path must reproduce the sequential fast-schedule
    method — the batch shares one hyperparameter set, hence one truncated
    per-box grid (VERDICT r2 item 4)."""
    from lmdx.methods.batch import run_lmd_batch, run_lmd_plus_batch

    spec2 = {"prompt": "A park with a green tree",
             "gen_boxes": [("a green tree", (200, 100, 150, 250))],
             "bg_prompt": "A park", "extra_neg_prompt": ""}

    # LMD+ regime (no per-box guidance).
    plus_overrides = {k: v for k, v in GROUNDED_OVERRIDES.items()
                      if k != "max_index_step"}
    plus_overrides["use_fast_schedule"] = True
    seq = [methods.lmd_plus.run(SPEC, bundle, bg_seed=31, **plus_overrides),
           methods.lmd_plus.run(spec2, bundle, bg_seed=32, **plus_overrides)]
    batched = run_lmd_plus_batch([SPEC, spec2], bundle, bg_seeds=[31, 32],
                                 **plus_overrides)
    for s, b in zip(seq, batched):
        diff = np.abs(s.image.astype(np.int32) - b.image.astype(np.int32))
        assert np.mean(diff) < 2.0, float(np.mean(diff))
        assert np.array_equal(s.aux["frozen_mask"], b.aux["frozen_mask"])

    # LMD regime (per-box CA guidance rides the batched guidance loop).
    lmd_overrides = dict(GROUNDED_OVERRIDES, use_fast_schedule=True)
    seq = [methods.lmd.run(SPEC, bundle, bg_seed=41, **lmd_overrides),
           methods.lmd.run(spec2, bundle, bg_seed=42, **lmd_overrides)]
    batched = run_lmd_batch([SPEC, spec2], bundle, bg_seeds=[41, 42],
                            **lmd_overrides)
    for s, b in zip(seq, batched):
        assert np.abs(b.image.astype(int) - s.image.astype(int)).max() <= 1


def test_sdxl_base_dual_encoder_e2e():
    """tiny-sdxl-base: the full SDXL-base conditioning topology — TWO text
    towers feature-concatenated into the UNet context, pooled text_time from
    the second tower's projection — drives img2img end to end."""
    import jax.numpy as jnp

    b = runtime_models.load_bundle("tiny-sdxl-base", seed=2)
    assert b.text_encoder_2 is not None and "text2" in b.params

    hidden, pooled = runtime_models.encode_text(b, ["a red cube", "a park"])
    assert hidden.shape == (2, 77, b.config.context_dim)  # 16 + 32 = 48
    assert hidden.shape[-1] == b.config.unet.cross_attention_dim
    assert pooled.shape == (2, b.config.pooled_dim)       # from tower 2
    # The concat really carries both towers: each half varies across prompts.
    assert float(jnp.abs(hidden[0, :, :16] - hidden[1, :, :16]).max()) > 0
    assert float(jnp.abs(hidden[0, :, 16:] - hidden[1, :, 16:]).max()) > 0

    base_img = (np.random.RandomState(0)
                .randint(0, 255, (32, 32, 3)).astype(np.uint8))
    refined = methods.sdxl_refine.refine(
        base_img, SPEC, refine_seed=3, refinement_step_ratio=0.5,
        bundle=b, target_size=b.config.height)
    assert refined.shape == (32, 32, 3)
    assert refined.dtype == np.uint8


def test_batched_pad_floors_match_default(bundle):
    """Compile-budget pads (pad_boxes_to / pad_objs_to — the driver's
    --max-compiled-variants merging) must not change any output: pad rows
    are sliced away and the floored guidance buckets are masked."""
    from lmdx.methods.batch import run_lmd_plus_batch

    spec2 = {"prompt": "A park with a green tree",
             "gen_boxes": [("a green tree", (200, 100, 150, 250))],
             "bg_prompt": "A park", "extra_neg_prompt": ""}
    overrides = {k: v for k, v in GROUNDED_OVERRIDES.items()
                 if k != "max_index_step"}

    base = run_lmd_plus_batch([SPEC, spec2], bundle, bg_seeds=[51, 52],
                              **overrides)
    padded = run_lmd_plus_batch([SPEC, spec2], bundle, bg_seeds=[51, 52],
                                pad_boxes_to=8, pad_objs_to=4,
                                pad_positions_to=4, **overrides)
    for s, b in zip(base, padded):
        diff = np.abs(s.image.astype(np.int32) - b.image.astype(np.int32))
        assert np.mean(diff) < 2.0, float(np.mean(diff))
        assert np.array_equal(s.aux["frozen_mask"], b.aux["frozen_mask"])


test_batched_pad_floors_match_default = pytest.mark.slow(
    test_batched_pad_floors_match_default)
