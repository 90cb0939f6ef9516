"""Shared method-layer plumbing.

Every method module exposes `version` (checked against the CLI's --run-model,
reference generate.py:151-153) and `run(spec, bundle=..., **kwargs) ->
GenerationResult`. Unlike the reference — where method modules bind global
models at import time (lmd.py:12-19) and generate.py must load models before
importing the module — the model bundle is an explicit argument, so methods
are pure functions of (spec, models, hyperparameters).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from ..nn import vae as vaelib
from ..runtime.models import ModelBundle
from ..sampling import gligen as gligen_lib


@dataclass
class GenerationResult:
    image: np.ndarray                      # (H, W, 3) uint8
    so_img_list: list = field(default_factory=list)  # per-box images (LMD/LMD+)
    aux: dict = field(default_factory=dict)


class DeferredImages:
    """A batch of device-resident images with ONE lazy host fetch.

    run_grounded_batch(defer_fetch=True) ends with the decode still on
    device and hands every result an ImageRef into this object. A serving
    driver dispatches the NEXT batch first and only then resolves the
    previous batch's images — the ~0.3 s tunnel fetch plus PNG encoding
    then overlap the chip's work on the next batch instead of draining its
    queue (single-threaded software pipelining across batches; outputs are
    byte-identical to the eager path)."""

    def __init__(self, device_images):
        self._dev = device_images
        self._host = None

    def resolve(self) -> np.ndarray:
        if self._host is None:
            self._host = np.asarray(self._dev)
            self._dev = None
        return self._host


class ImageRef:
    """Index into a DeferredImages batch; `get()` resolves to (H, W, 3)."""

    def __init__(self, batch: DeferredImages, index: int):
        self._batch = batch
        self._index = index

    def get(self) -> np.ndarray:
        return self._batch.resolve()[self._index]

    def __array__(self, dtype=None):
        arr = self.get()
        return arr.astype(dtype) if dtype is not None else arr


def finalize_results(results) -> None:
    """Resolve any deferred images in-place (one fetch per source batch).

    Call after dispatching the next batch's work; a no-op on eager
    results."""
    for r in results:
        if isinstance(r.image, ImageRef):
            r.image = r.image.get()


@functools.partial(jax.jit, static_argnames=("vae",))
def _vae_decode(vae, params, latents):
    images = vae.apply({"params": params}, latents, method=vae.__class__.decode)
    return vaelib.to_uint8(images)


@functools.partial(jax.jit, static_argnames=("vae",))
def _vae_encode(vae, params, images, noise):
    return vae.apply({"params": params}, images, noise,
                     method=vae.__class__.encode)


def decode_latents(bundle: ModelBundle, latents, to_host: bool = True):
    """Latents (B, h, w, 4) -> uint8 images (B, H, W, 3).

    Batch is padded to a power-of-two bucket so varying box counts reuse a
    handful of compiled decoders instead of one per distinct N.

    to_host=False returns the device array instead of fetching: decode
    compute is cheap (~129 ms for 8 images in-jit, scripts/microbench_vae.py)
    but the uint8 fetch rides the chip tunnel — callers that feed the images
    straight back to a device consumer (the SAM segmenter) skip the
    round-trip."""
    latents = jnp.asarray(latents)
    n = latents.shape[0]
    bucket = 1
    while bucket < n:
        bucket *= 2
    if bucket != n:
        latents = jnp.concatenate(
            [latents, jnp.zeros((bucket - n, *latents.shape[1:]),
                                latents.dtype)], axis=0)
    out = _vae_decode(bundle.vae, bundle.params["vae"], latents)
    return np.asarray(out[:n]) if to_host else out[:n]


def encode_image(bundle: ModelBundle, image: np.ndarray, noise=None):
    """uint8 image (H, W, 3) -> scaled latents (1, h, w, 4)."""
    x = jnp.asarray(image, jnp.float32)[None] / 127.5 - 1.0
    return _vae_encode(bundle.vae, bundle.params["vae"], x, noise)


def with_extra_negative(spec, negative_prompt: str) -> str:
    """Prepend the spec's extra negative prompt (reference lmd.py:330-335)."""
    extra = spec.get("extra_neg_prompt") if isinstance(spec, dict) else getattr(
        spec, "extra_neg_prompt", ""
    )
    if extra:
        return f"{extra}, {negative_prompt}"
    return negative_prompt


def make_gligen_inputs(
    bundle: ModelBundle,
    bboxes: list,
    phrases: list[str],
    batch_size: int = 1,
):
    """Pack GLIGEN grounding for CFG sampling.

    Returns (objs_full (2B, M, D), objs_guidance (B, M, D)) — the CFG-doubled
    grounding tokens (uncond half nulled) and the tokens for guidance
    forwards. Parity: models/pipelines.py:285-321 and :378-388 — the
    reference's guidance kwargs take the FIRST half of the CFG-doubled
    condition, whose masks were zeroed for CFG, so guidance forwards see
    null grounding tokens (the fuser runs, but attends to null features).
    """
    from ..runtime import models as runtime_models

    max_objs = bundle.config.unet.gligen_max_objs
    if len(bboxes) > max_objs:
        bboxes, phrases = bboxes[:max_objs], phrases[:max_objs]
    if phrases:
        _, pooled = runtime_models.encode_text(bundle, phrases)
        pooled = np.asarray(pooled)
    else:
        pooled = np.zeros((0, bundle.config.clip.hidden_size), np.float32)

    boxes, embs, masks = gligen_lib.prepare_gligen_condition(
        bboxes, pooled, max_objs=max_objs,
        num_images_per_prompt=batch_size, cfg_double=True,
    )
    objs_full = runtime_models.gligen_objs(bundle, boxes, masks, embs)
    objs_guidance = objs_full[: objs_full.shape[0] // 2]
    return objs_full, objs_guidance


def make_gligen_inputs_batched(bundle: ModelBundle, bboxes: list,
                               phrases: list[str], pooled=None):
    """Per-box grounding for the batched per-box passes: image i grounds
    only box i (slot 0). Returns (objs_full (2N, M, D), objs_guidance
    (N, M, D)) with the uncond half's grounding nulled; guidance forwards
    take the nulled half (reference pipelines.py:378-388, see
    make_gligen_inputs). `pooled` (N, D) lets callers reuse phrase
    embeddings from a consolidated encode_text call."""
    from ..runtime import models as runtime_models

    n = len(bboxes)
    max_objs = bundle.config.unet.gligen_max_objs
    if pooled is None:
        _, pooled = runtime_models.encode_text(bundle, phrases)
    pooled = np.asarray(pooled)

    boxes = np.zeros((n, max_objs, 4), np.float32)
    embs = np.zeros((n, max_objs, pooled.shape[-1]), np.float32)
    masks = np.zeros((n, max_objs), np.float32)
    boxes[:, 0] = np.asarray(bboxes, np.float32)
    embs[:, 0] = pooled
    masks[:, 0] = 1.0

    boxes2 = np.concatenate([boxes, boxes], axis=0)
    embs2 = np.concatenate([embs, embs], axis=0)
    masks2 = np.concatenate([np.zeros_like(masks), masks], axis=0)
    objs_full = runtime_models.gligen_objs(bundle, boxes2, masks2, embs2)
    return objs_full, objs_full[:n]


def spec_get(spec, key, default=None):
    if isinstance(spec, dict):
        return spec.get(key, default)
    return getattr(spec, key, default)
