"""Image refinement pass (img2img), the SDXL-refiner stage.

Parity target: reference generation/sdxl_refinement.py — upscale the grounded
image to 1024x1024 (LANCZOS), then run an img2img denoise of strength
`refinement_step_ratio` with a style negative prompt plus the spec's extra
negatives.

The refinement engine here is architecture-agnostic img2img on any lmdx
bundle. The default refiner bundle is the SDXL-refiner configuration the
reference loads (stabilityai/stable-diffusion-xl-refiner-1.0,
sdxl_refinement.py:10-20) — single bigG tower, text_time micro-conditioning
with the aesthetic-score id; override with LMDX_REFINER_MODEL (e.g.
tiny-sdxl for CPU tests, an SD key for memory-constrained runs).
"""

from __future__ import annotations

import os

import jax.numpy as jnp
import numpy as np
from PIL import Image

from ..core import schedule as sched
from ..runtime import models as runtime_models
from ..sampling import latents as latents_lib
from ..sampling.loop import sample
from . import base

version = "sdxl_refine"

SDXL_NEGATIVE_PROMPT = (
    "drawing, painting, crayon, sketch, graphite, impressionist, noisy, "
    "blurry, soft, deformed, ugly"
)

_REFINER_CACHE: dict = {}


def load_refiner_bundle():
    key = os.environ.get("LMDX_REFINER_MODEL",
                         "stabilityai/stable-diffusion-xl-refiner-1.0")
    if key not in _REFINER_CACHE:
        _REFINER_CACHE[key] = runtime_models.load_bundle(key)
    return _REFINER_CACHE[key]


def img2img(
    bundle,
    image: np.ndarray,              # (H, W, 3) uint8 at the bundle's size
    prompt: str,
    negative_prompt: str = "",
    strength: float = 0.3,
    num_inference_steps: int = 50,
    guidance_scale: float = 5.0,
    seed: int = 0,
    return_latents: bool = False,
    scheduler: str | None = None,
) -> np.ndarray:
    """Noise the encoded image at the strength point of the grid and denoise
    the remaining steps (diffusers XL img2img semantics — guidance_scale
    defaults to the XL pipeline's 5.0, which the reference inherits by not
    passing one, sdxl_refinement.py:29). Trajectory-pinned against the shim
    transcription of the pipeline the reference calls
    (tests/test_pipeline_parity.py::test_sdxl_refiner_img2img_matches_shim).

    scheduler: integrator for the denoise tail; None uses the bundle's
    checkpoint default (EulerDiscrete for the SDXL refiner — the scheduler
    its repo config names; "ddim" for SD-family bundles). Both integrators
    are pinned against the shim, parametrized in the parity test above.
    return_latents: skip the VAE decode and return the final (1,h,w,4)
    latents (parity tests compare latents)."""
    scheduler = scheduler or getattr(
        bundle.config, "default_scheduler", "ddim")
    schedule = sched.make_schedule(num_inference_steps, solver=scheduler)
    start = max(num_inference_steps - int(num_inference_steps * strength), 0)
    start = min(start, num_inference_steps - 1)

    latents0 = base.encode_image(
        bundle, image,
        noise=latents_lib.noise_from_seed(seed + 1, (1,) + tuple(
            np.array(image.shape[:2]) // bundle.config.vae_scale) + (4,)),
    )
    noise = latents_lib.noise_from_seed(seed, latents0.shape)
    if scheduler == "euler":
        # Euler samples live in sigma-space: x = x0 + sigma * noise.
        latents = sched.euler_add_noise(latents0, noise,
                                        schedule.sigmas[start])
    else:
        latents = sched.add_noise(schedule, latents0, noise,
                                  schedule.timesteps[start])

    tail = sched.Schedule(
        timesteps=schedule.timesteps[start:],
        prev_timesteps=schedule.prev_timesteps[start:],
        alphas_cumprod=schedule.alphas_cumprod,
        final_alpha_cumprod=schedule.final_alpha_cumprod,
        sigmas=(schedule.sigmas[start:] if scheduler == "euler" else None),
    )
    cond, cond_pooled = runtime_models.encode_text(bundle, [prompt])
    uncond, uncond_pooled = runtime_models.encode_text(bundle, [negative_prompt])
    text_embeddings = jnp.concatenate([uncond, cond], axis=0)

    added_cond = None
    ucfg = bundle.config.unet
    if ucfg.addition_embed_type == "text_time":
        # SDXL micro-conditioning ids: refiner (5) = size + crop + aesthetic
        # score (6.0 cond / 2.5 uncond); base (6) = size + crop + target size.
        pooled_dim = bundle.config.pooled_dim
        num_ids = (ucfg.projection_class_embeddings_input_dim
                   - pooled_dim) // ucfg.addition_time_embed_dim
        h, w = image.shape[:2]
        if num_ids == 5:
            ids_cond = [h, w, 0, 0, 6.0]
            ids_uncond = [h, w, 0, 0, 2.5]
        else:
            ids_cond = ids_uncond = [h, w, 0, 0, h, w]
        time_ids = jnp.asarray([ids_uncond, ids_cond], jnp.float32)
        pooled = jnp.concatenate([uncond_pooled, cond_pooled], axis=0)
        added_cond = (pooled, time_ids)

    out = sample(bundle.unet, bundle.params["unet"], tail, latents,
                 text_embeddings, guidance_scale=guidance_scale,
                 added_cond=added_cond, solver=scheduler)
    if return_latents:
        return np.asarray(out.latents)
    return base.decode_latents(bundle, out.latents)[0]


def refine(image: np.ndarray, spec, refine_seed: int,
           refinement_step_ratio: float = 0.3, bundle=None,
           target_size: int | None = None) -> np.ndarray:
    """Upscale + img2img refinement (sdxl_refinement.py:22-30).

    target_size defaults to the refiner bundle's configured resolution
    (1024 for the real SDXL refiner; the bundle's own size for test
    configs — a mismatched hardcoded 1024 would square the attention
    sequence length into OOM)."""
    bundle = bundle or load_refiner_bundle()
    if target_size is None:
        target_size = bundle.config.height
    prompt = base.spec_get(spec, "prompt")
    extra = base.spec_get(spec, "extra_neg_prompt", "")
    # Reference-exact concatenation (sdxl_refinement.py:28): the reference
    # always prepends `extra + ", "`, including when extra is empty.
    negative = f"{extra}, {SDXL_NEGATIVE_PROMPT}"

    upscaled = np.asarray(
        Image.fromarray(image).resize((target_size, target_size), Image.LANCZOS))
    return img2img(bundle, upscaled, prompt, negative_prompt=negative,
                   strength=refinement_step_ratio, seed=refine_seed)
