"""GLIGEN grounding-condition preparation.

Pads (boxes, phrase embeddings) to a fixed `max_objs` slot count, marks
validity masks, and doubles everything for classifier-free guidance with the
unconditional half's masks zeroed — so the uncond branch sees only null
grounding tokens. Parity: models/pipelines.py:285-321.

The phrase embeddings are CLIP pooled (EOS-token) embeddings of each phrase
(pipelines.py:303-305); computing them is the caller's job (they need the
text encoder), this module handles the packing math only.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def prepare_gligen_condition(
    bboxes,                 # list of normalized xyxy boxes (one per phrase slot)
    phrase_embeddings,      # (num_boxes, width) pooled CLIP embeddings
    max_objs: int = 30,
    num_images_per_prompt: int = 1,
    cfg_double: bool = True,
):
    """Returns (boxes (R, max_objs, 4), embeddings (R, max_objs, width),
    masks (R, max_objs)) where R = 2 * num_images_per_prompt when cfg_double
    (uncond first, masks zeroed) else num_images_per_prompt."""
    phrase_embeddings = np.asarray(phrase_embeddings)
    width = phrase_embeddings.shape[-1]
    n = min(len(bboxes), max_objs)

    boxes = np.zeros((1, max_objs, 4), np.float32)
    embs = np.zeros((1, max_objs, width), np.float32)
    masks = np.zeros((1, max_objs), np.float32)
    if n > 0:
        boxes[0, :n] = np.asarray(bboxes, np.float32)[:n]
        embs[0, :n] = phrase_embeddings[:n]
        masks[0, :n] = 1.0

    repeat = (2 if cfg_double else 1) * num_images_per_prompt
    boxes = np.repeat(boxes, repeat, axis=0)
    embs = np.repeat(embs, repeat, axis=0)
    masks = np.repeat(masks, repeat, axis=0)
    if cfg_double:
        masks[: repeat // 2] = 0.0  # uncond half gets null grounding

    return jnp.asarray(boxes), jnp.asarray(embs), jnp.asarray(masks)
