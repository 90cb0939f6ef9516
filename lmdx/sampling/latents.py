"""Seeded latent-noise construction and foreground/background blending.

Parity target: utils/latents.py:7-35,120-160 and the seed-derivation scheme of
generate.py. JAX PRNG cannot reproduce torch's sampler bit-for-bit (SURVEY.md
§7 "Seed parity"), so parity here means: the same seed-derivation *structure*
(background seed, per-box fg seed = fg_seed_start + idx, collision bump
+12345), deterministic reruns, and the same blending math.

Noise is drawn in float32 and cast afterwards — drawing directly in low
precision would change the sample stream (reference latents.py:10-16).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

SEED_COLLISION_BUMP = 12345  # reference utils/latents.py:144-147


def noise_from_seed(seed: int, shape, dtype=jnp.float32,
                    backend: str | None = None) -> jnp.ndarray:
    """Standard-normal latent noise for an integer seed (fp32 then cast).

    backend "jax" (default) uses the jax PRNG; "torch" (or
    LMDX_NOISE_BACKEND=torch) reproduces the reference's noise stream
    bit-exactly — torch.manual_seed + randn in NCHW, transposed to NHWC
    (utils/latents.py:13-16) — for A/B output comparison against the
    PyTorch implementation.
    """
    backend = backend or os.environ.get("LMDX_NOISE_BACKEND", "jax")
    if backend == "torch":
        import numpy as np
        import torch

        b, h, w, c = shape
        generator = torch.manual_seed(seed)
        x = torch.randn((b, c, h, w), generator=generator,
                        dtype=torch.float32)
        return jnp.asarray(np.asarray(x).transpose(0, 2, 3, 1)).astype(dtype)
    key = jax.random.key(seed)
    return jax.random.normal(key, shape, dtype=jnp.float32).astype(dtype)


def blend_latents(latents_bg: jnp.ndarray, latents_fg: jnp.ndarray,
                  fg_mask: jnp.ndarray, fg_blending_ratio: float = 0.01) -> jnp.ndarray:
    """Mix foreground noise into the background noise inside the mask.

    bg outside the mask; inside: bg*sqrt(1-r) + fg*sqrt(r) — keeps unit
    variance (utils/latents.py:25-35). fg_mask: (H, W).
    """
    import numpy as np

    m = fg_mask[..., None]
    # Host-side f64 sqrt constants (the reference uses np.sqrt scalars,
    # utils/latents.py:32) — keeps the torch-noise A/B backend bit-exact.
    mixed = (latents_bg * float(np.sqrt(1.0 - fg_blending_ratio))
             + latents_fg * float(np.sqrt(fg_blending_ratio)))
    return latents_bg * (1.0 - m) + mixed * m


def get_input_latents_list(
    bg_seed: int,
    fg_seed_start: int,
    fg_masks,                 # list of (H, W) masks (one per box)
    latent_shape,             # (B, H, W, C)
    fg_blending_ratio: float = 0.01,
    init_noise_sigma: float = 1.0,
    dtype=jnp.float32,
):
    """Per-box input latents + shared background latents.

    Each box idx gets noise from seed fg_seed_start + idx (bumped if it
    collides with bg_seed), blended into the common background noise within
    its mask (utils/latents.py:120-160).
    """
    latents_bg_raw = noise_from_seed(bg_seed, latent_shape, dtype)
    input_latents = []
    for idx, fg_mask in enumerate(fg_masks):
        fg_seed = fg_seed_start + idx
        if fg_seed == bg_seed:
            fg_seed += SEED_COLLISION_BUMP
        latents_fg = noise_from_seed(fg_seed, latent_shape, dtype)
        blended = blend_latents(latents_bg_raw, latents_fg, jnp.asarray(fg_mask),
                                fg_blending_ratio=fg_blending_ratio)
        input_latents.append(blended * init_noise_sigma)
    return input_latents, latents_bg_raw * init_noise_sigma
