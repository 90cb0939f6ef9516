"""MultiDiffusion region-control baseline.

Parity: reference generation/multidiffusion.py — per-region denoising over
sliding latent views with mask-weighted recombination each step, random
constant-color background bootstrapping for the first N steps, per-region
CFG (independent uncond), exclusive box masks with background = complement
(boxes_to_masks_prompts:300-331, run:350-446, generate:160-285).

TPU-native design: the whole sampler is a segmented `lax.scan` (bootstrap
segment + plain segment); the region axis is a batch dimension (the reference
micro-batches a python list through the UNet, unet_batch:92-110 — here the
(2*regions) CFG batch is one XLA call on the MXU); views are a static python
list (one view at 512x512, a sliding grid for panoramas).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..core import boxes as boxlib
from ..core import schedule as sched
from ..runtime import models as runtime_models
from ..text.parser import BOX_SCALE, filter_boxes
from . import base

version = "multidiffusion"

BG_NEGATIVE = (
    "artifacts, blurry, smooth texture, bad quality, distortions, unrealistic, "
    "distorted image, bad proportions, duplicate, headshot, close-up, partial, "
    "large, large, huge, gigantic"
)
FG_NEGATIVE = BG_NEGATIVE + ", cut-out, partial, occluded, weird"


def get_views(height: int, width: int, window_size: int = 64, stride: int = 8,
              vae_scale: int = 8):
    """Sliding latent views (reference multidiffusion.py:28-43)."""
    h, w = height // vae_scale, width // vae_scale
    window_size = min(window_size, h, w)
    num_h = (h - window_size) // stride + 1
    num_w = (w - window_size) // stride + 1
    views = []
    for i in range(int(num_h * num_w)):
        h_start = int(i // num_w) * stride
        w_start = int(i % num_w) * stride
        views.append((h_start, h_start + window_size, w_start, w_start + window_size))
    return views


def boxes_to_masks_prompts(gen_boxes, H: int, W: int, first_top: bool = False):
    """Exclusive per-box masks: each pixel belongs to ONE box (the last box
    painted wins; first_top reverses paint order). Reference
    boxes_to_masks_prompts:300-331, at latent resolution."""
    boxes = list(gen_boxes)
    if first_top:
        boxes = boxes[::-1]
    inds = np.full((H, W), -1, np.int32)
    prompts = []
    for ind, (name, bbox) in enumerate(boxes):
        x0, y0, x1, y1 = boxlib.scale_proportion(
            boxlib.convert_box_xywh_to_xyxy_norm(bbox, *BOX_SCALE), H=H, W=W)
        inds[y0:y1, x0:x1] = ind
        prompts.append(name)
    masks = [(inds == i).astype(np.float32) for i in range(len(boxes))]
    if first_top:
        masks, prompts = masks[::-1], prompts[::-1]
    return masks, prompts


@functools.partial(jax.jit, static_argnames=("unet", "views", "bootstrap",
                                             "guidance_scale", "indep_uncond",
                                             "normalization"))
def _run_segment(unet, views, bootstrap: bool, guidance_scale: float,
                 indep_uncond: bool, normalization: bool,
                 params, schedule: sched.Schedule, latent, xs, consts):
    """Scan one segment of MultiDiffusion steps.

    latent: (1, H, W, C); consts: masks (R, H, W, 1), text_embeddings
    (2R, L, D), bootstrap backgrounds (Nb, H, W, C) + noise (R-1, H, W, C).
    """
    masks = consts["masks"]
    text_embeddings = consts["text_embeddings"]
    num_regions = masks.shape[0]

    def step(latent, x):
        t, prev_t = x["t"], x["prev_t"]
        value = jnp.zeros_like(latent)
        count = jnp.zeros_like(latent)

        for (h0, h1, w0, w1) in views:
            masks_view = masks[:, h0:h1, w0:w1, :]
            latent_view = jnp.broadcast_to(
                latent[:, h0:h1, w0:w1, :],
                (num_regions, h1 - h0, w1 - w0, latent.shape[-1]),
            )
            if bootstrap:
                bg_idx = jax.random.randint(
                    x["key"], (num_regions - 1,), 0, consts["bootstrap_bgs"].shape[0])
                bg = consts["bootstrap_bgs"][bg_idx][:, h0:h1, w0:w1, :]
                noise = consts["bootstrap_noise"][:, h0:h1, w0:w1, :]
                bg = sched.add_noise(schedule, bg, noise, t)
                m = jnp.clip((masks_view[1:] >= 0.5).astype(latent.dtype), 0, 1)
                fg = latent_view[1:] * m + bg * (1.0 - m)
                latent_view = jnp.concatenate([latent_view[:1], fg], axis=0)

            latent_in = jnp.concatenate([latent_view, latent_view], axis=0)
            eps = unet.apply({"params": params}, latent_in, t, text_embeddings)
            eps_uncond, eps_text = jnp.split(eps, 2, axis=0)
            if indep_uncond:
                eps = eps_uncond + guidance_scale * (eps_text - eps_uncond)
            else:
                eps = eps_uncond[:1] + guidance_scale * (eps_text - eps_uncond)

            denoised = sched.ddim_step(schedule, eps, t, prev_t, latent_view)
            value = value.at[:, h0:h1, w0:w1, :].add(
                (denoised * masks_view).sum(axis=0, keepdims=True))
            if normalization:
                count = count.at[:, h0:h1, w0:w1, :].add(
                    masks_view.sum(axis=0, keepdims=True))
            else:
                count = jnp.ones_like(count)

        latent = jnp.where(count > 0, value / jnp.maximum(count, 1e-8), value)
        return latent, None

    latent, _ = jax.lax.scan(step, latent, xs)
    return latent


def run(
    spec=None,
    bundle=None,
    gen_boxes=None,
    bg_prompt: str = "",
    original_ind_base: int | None = None,
    bootstrapping: int = 20,
    first_top: bool = False,
    steps: int = 50,
    guidance_scale: float = 10.0,
    extra_neg_prompt: str = "",
    indep_uncond: bool = True,
    normalization: bool = False,
    bg_seed: int | None = None,
    num_inference_steps: int | None = None,
) -> base.GenerationResult:
    # Accept either a layout spec (uniform method interface) or explicit
    # gen_boxes/bg_prompt (the reference's multidiffusion.run signature).
    if spec is not None:
        gen_boxes = base.spec_get(spec, "gen_boxes", gen_boxes)
        bg_prompt = base.spec_get(spec, "bg_prompt", bg_prompt)
        extra_neg_prompt = base.spec_get(spec, "extra_neg_prompt",
                                         extra_neg_prompt)
    if bg_seed is not None and original_ind_base is None:
        original_ind_base = bg_seed
    if num_inference_steps is not None:
        steps = num_inference_steps
    seed = original_ind_base if original_ind_base is not None else 0

    cfg = bundle.config
    H, W = cfg.latent_height, cfg.latent_width

    gen_boxes = filter_boxes(gen_boxes)
    bg_negative = (f"{extra_neg_prompt}, {BG_NEGATIVE}" if extra_neg_prompt
                   else BG_NEGATIVE)
    fg_negative = (f"{extra_neg_prompt}, {FG_NEGATIVE}" if extra_neg_prompt
                   else FG_NEGATIVE)

    fg_masks, fg_prompts = boxes_to_masks_prompts(gen_boxes, H, W,
                                                  first_top=first_top)
    bg_mask = np.clip(1.0 - sum(fg_masks, np.zeros((H, W), np.float32)), 0, 1)
    masks = np.stack([bg_mask, *fg_masks])[..., None]  # (R, H, W, 1)

    prompts = [bg_prompt] + fg_prompts
    neg_prompts = [bg_negative] + [fg_negative] * len(fg_prompts)

    # Per-region text embeddings with per-region negative prompts.
    cond, _ = runtime_models.encode_text(bundle, prompts)
    uncond, _ = runtime_models.encode_text(bundle, neg_prompts)
    text_embeddings = jnp.concatenate([uncond, cond], axis=0)

    schedule = sched.make_schedule(steps)
    key = jax.random.key(seed)
    k_latent, k_bg, k_noise, k_steps = jax.random.split(key, 4)
    latent = jax.random.normal(k_latent, (1, H, W, 4), jnp.float32)
    latent = latent * schedule.init_noise_sigma

    consts = {
        "masks": jnp.asarray(masks, jnp.float32),
        "text_embeddings": text_embeddings,
    }
    bootstrap_steps = min(bootstrapping, steps) if len(fg_prompts) else 0
    if bootstrap_steps:
        # Random constant-color backgrounds, VAE-encoded (reference :113-118).
        colors = jax.random.uniform(k_bg, (bootstrapping, 1, 1, 3)) * 2.0 - 1.0
        bg_images = jnp.broadcast_to(colors, (bootstrapping, cfg.height,
                                              cfg.width, 3))
        consts["bootstrap_bgs"] = base._vae_encode(
            bundle.vae, bundle.params["vae"], bg_images, None)
        consts["bootstrap_noise"] = jax.random.normal(
            k_noise, (len(fg_prompts), H, W, 4), jnp.float32)

    views = tuple(get_views(cfg.height, cfg.width, vae_scale=cfg.vae_scale))

    for start, stop, bootstrap in (
        (0, bootstrap_steps, True),
        (bootstrap_steps, steps, False),
    ):
        if stop <= start:
            continue
        xs = {
            "t": schedule.timesteps[start:stop],
            "prev_t": schedule.prev_timesteps[start:stop],
        }
        if bootstrap:
            xs["key"] = jax.random.split(k_steps, stop - start)
        latent = _run_segment(
            bundle.unet, views, bootstrap, guidance_scale, indep_uncond,
            normalization, bundle.params["unet"], schedule, latent, xs, consts)

    images = base.decode_latents(bundle, latent)
    return base.GenerationResult(
        image=images[0], aux={"masks": fg_masks})
