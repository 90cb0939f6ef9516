"""GLIGEN baseline: grounding adapters only, no energy guidance.

Parity: reference generation/gligen.py — one scheduled-sampling GLIGEN pass
over the overall prompt; the grounding phrases are the per-box prompts and
the boxes come straight from the spec.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core import schedule as sched
from ..runtime import models as runtime_models
from ..sampling import latents as latents_lib
from ..sampling.loop import sample
from ..text.parser import BOX_SCALE, convert_spec
from ..text.template import DEFAULT_OVERALL_NEGATIVE_PROMPT
from . import base

version = "gligen"


def run(
    spec,
    bundle,
    bg_seed: int = 1,
    gligen_scheduled_sampling_beta: float = 0.4,
    num_inference_steps: int = 50,
    guidance_scale: float = 7.5,
    negative_prompt: str = DEFAULT_OVERALL_NEGATIVE_PROMPT,
    scheduler: str = "ddim",
) -> base.GenerationResult:
    cfg = bundle.config
    converted = convert_spec(spec, *BOX_SCALE)
    phrases = [item[0] for item in converted.so_prompt_phrase_word_box]
    bboxes = [item[3] for item in converted.so_prompt_phrase_word_box]
    prompt = converted.overall_prompt
    negative_prompt = base.with_extra_negative(spec, negative_prompt)

    schedule = sched.make_schedule(num_inference_steps, solver=scheduler)
    uncond, cond = runtime_models.encode_prompts(bundle, [prompt], negative_prompt)
    text_embeddings = jnp.concatenate([uncond, cond], axis=0)

    objs_full, objs_null = base.make_gligen_inputs(bundle, bboxes, phrases)

    shape = (1, cfg.latent_height, cfg.latent_width, 4)
    latents = latents_lib.noise_from_seed(bg_seed, shape) * schedule.init_noise_sigma

    out = sample(
        bundle.unet, bundle.params["unet"], schedule, latents, text_embeddings,
        guidance_scale=guidance_scale,
        gligen=(objs_full, objs_null),
        num_fuser_steps=int(gligen_scheduled_sampling_beta * schedule.num_steps),
        solver=scheduler,
    )
    images = base.decode_latents(bundle, out.latents)
    return base.GenerationResult(image=images[0])
