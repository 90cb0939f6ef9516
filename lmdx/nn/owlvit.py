"""OWL-ViT open-vocabulary detector (Flax) — the stage-2 evaluation model.

Architecture parity with google/owlvit-base-patch32 as the reference uses it
(scripts/owl_vit_eval.py:39-47): a CLIP ViT-B/32 vision tower whose patch
tokens become detection queries, a CLIP text tower whose pooled embeddings
become class queries, a box-regression MLP with grid-position bias, and a
scaled similarity class head. Text layers reuse lmdx.nn.clip's pre-LN
transformer blocks.

`convert_owlvit` maps a transformers OwlViT checkpoint onto these modules.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..config import CLIPTextConfig
from .clip import CLIPLayer, CLIPTextEncoder


@dataclass(frozen=True)
class OwlViTConfig:
    image_size: int = 768
    patch_size: int = 32
    vision_hidden: int = 768
    vision_layers: int = 12
    vision_heads: int = 12
    vision_mlp: int = 3072
    projection_dim: int = 512
    text: CLIPTextConfig = CLIPTextConfig(
        vocab_size=49408, hidden_size=512, intermediate_size=2048,
        num_layers=12, num_heads=8, max_length=16)

    @property
    def grid(self) -> int:
        return self.image_size // self.patch_size


def owlvit_base_patch32() -> OwlViTConfig:
    return OwlViTConfig()


def tiny_owlvit() -> OwlViTConfig:
    return OwlViTConfig(
        image_size=64, patch_size=16, vision_hidden=32, vision_layers=2,
        vision_heads=2, vision_mlp=64, projection_dim=16,
        text=CLIPTextConfig(vocab_size=1024, hidden_size=32,
                            intermediate_size=64, num_layers=2, num_heads=2,
                            max_length=16),
    )


class VisionTower(nn.Module):
    config: OwlViTConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, pixels: jnp.ndarray) -> jnp.ndarray:
        """pixels (B, H, W, 3) -> patch-token features (B, 1+N, D)."""
        cfg = self.config
        b = pixels.shape[0]
        x = nn.Conv(cfg.vision_hidden, (cfg.patch_size, cfg.patch_size),
                    strides=(cfg.patch_size, cfg.patch_size), use_bias=False,
                    dtype=self.dtype, name="patch_embedding")(pixels)
        x = x.reshape(b, -1, cfg.vision_hidden)
        cls = self.param("class_embedding", nn.initializers.normal(0.02),
                         (cfg.vision_hidden,))
        x = jnp.concatenate(
            [jnp.broadcast_to(cls, (b, 1, cfg.vision_hidden)).astype(x.dtype), x],
            axis=1)
        pos = self.param("position_embedding", nn.initializers.normal(0.02),
                         (cfg.grid**2 + 1, cfg.vision_hidden))
        x = x + pos[None].astype(x.dtype)
        x = nn.LayerNorm(dtype=self.dtype, name="pre_layernorm")(x)

        text_like = CLIPTextConfig(hidden_size=cfg.vision_hidden,
                                   intermediate_size=cfg.vision_mlp,
                                   num_heads=cfg.vision_heads)
        mask = jnp.zeros((1, 1, x.shape[1], x.shape[1]), jnp.float32)
        for i in range(cfg.vision_layers):
            x = CLIPLayer(text_like, dtype=self.dtype, name=f"layers_{i}")(x, mask)
        return nn.LayerNorm(dtype=self.dtype, name="post_layernorm")(x)


class BoxHead(nn.Module):
    hidden: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.gelu(nn.Dense(self.hidden, dtype=self.dtype,
                            name="dense0")(x), approximate=False)
        x = nn.gelu(nn.Dense(self.hidden, dtype=self.dtype,
                            name="dense1")(x), approximate=False)
        return nn.Dense(4, dtype=self.dtype, name="dense2")(x)


class ClassHead(nn.Module):
    projection_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, image_embeds, query_embeds):
        class_embeds = nn.Dense(self.projection_dim, dtype=self.dtype,
                                name="dense0")(image_embeds)
        class_embeds = class_embeds / (
            jnp.linalg.norm(class_embeds, axis=-1, keepdims=True) + 1e-6)
        query = query_embeds / (
            jnp.linalg.norm(query_embeds, axis=-1, keepdims=True) + 1e-6)
        logits = jnp.einsum("bnd,bqd->bnq", class_embeds, query)
        shift = nn.Dense(1, dtype=self.dtype, name="logit_shift")(image_embeds)
        scale = nn.elu(
            nn.Dense(1, dtype=self.dtype, name="logit_scale")(image_embeds)) + 1
        return (logits + shift) * scale


def box_bias(grid: int) -> np.ndarray:
    """Grid-position bias added to box-head outputs before the sigmoid."""
    coords = (np.stack(np.meshgrid(np.arange(1, grid + 1),
                                   np.arange(1, grid + 1)), -1)
              .astype(np.float32) / grid)
    coords = coords.reshape(-1, 2).clip(0.0, 1.0)
    coord_bias = np.log(coords + 1e-4) - np.log1p(-coords + 1e-4)
    size = np.full((grid * grid, 2), 1.0 / grid, np.float32)
    size_bias = np.log(size + 1e-4) - np.log1p(-size + 1e-4)
    return np.concatenate([coord_bias, size_bias], axis=-1)


class OwlViT(nn.Module):
    config: OwlViTConfig
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        cfg = self.config
        self.vision = VisionTower(cfg, dtype=self.dtype)
        self.text = CLIPTextEncoder(cfg.text, dtype=self.dtype)
        self.text_projection = nn.Dense(cfg.projection_dim, use_bias=False,
                                        dtype=self.dtype)
        self.merge_layer_norm = nn.LayerNorm(dtype=self.dtype)
        self.class_head = ClassHead(cfg.projection_dim, dtype=self.dtype)
        self.box_head = BoxHead(cfg.vision_hidden, dtype=self.dtype)

    def image_embedder(self, pixels):
        feats = self.vision(pixels)
        cls = feats[:, :1]
        patches = feats[:, 1:] * cls          # class-token broadcast merge
        return self.merge_layer_norm(patches)

    def __call__(self, pixels: jnp.ndarray, input_ids: jnp.ndarray):
        """pixels (B, S, S, 3) in CLIP normalization; input_ids (Q, L) for
        one query set shared across the batch, or (B, Q, L) for per-image
        query sets (the batched eval path — each benchmark prompt carries
        its own query texts).

        Returns (pred_boxes (B, N, 4) cxcywh in [0,1], logits (B, N, Q)).
        """
        image_embeds = self.image_embedder(pixels)
        eos = self.config.text.vocab_size - 1
        if input_ids.ndim == 3:
            b, qn, length = input_ids.shape
            _, pooled = self.text(input_ids.reshape(b * qn, length),
                                  eos_token_id=eos)
            query = (self.text_projection(pooled)
                     .reshape(b, qn, -1).astype(jnp.float32))
        else:
            _, pooled = self.text(input_ids, eos_token_id=eos)
            query = self.text_projection(pooled)[None].astype(jnp.float32)
            query = jnp.broadcast_to(
                query, (pixels.shape[0], *query.shape[1:]))

        logits = self.class_head(image_embeds, query)
        boxes = self.box_head(image_embeds)
        boxes = jax.nn.sigmoid(boxes + jnp.asarray(box_bias(self.config.grid)))
        return boxes, logits


CLIP_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
CLIP_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)


def resize_image(image: np.ndarray, size: int) -> np.ndarray:
    """uint8 (H, W, 3) -> uint8 (size, size, 3), PIL BICUBIC (the protocol's
    resize — transformers OwlViTProcessor; normalization happens on device
    in the batched path so only 1 byte/px crosses the chip tunnel)."""
    from PIL import Image as PILImage

    img = PILImage.fromarray(image).convert("RGB").resize(
        (size, size), PILImage.BICUBIC)
    return np.asarray(img, np.uint8)


@functools.lru_cache(maxsize=16)
def pil_bicubic_weights(in_size: int, out_size: int) -> np.ndarray:
    """One-axis PIL BICUBIC resample matrix (out_size, in_size).

    Reproduces Pillow's precompute_coeffs + 8bpc normalization
    (src/libImaging/Resample.c): Keys cubic a=-0.5, support 2 scaled by
    the downscale factor, window [center-support+0.5, center+support+0.5),
    weights normalized then quantized to 22 fixed-point bits. A matmul by
    this matrix followed by round-half-up + clip to [0,255] reproduces one
    PIL uint8 resample pass to <=1 LSB (f32 summation can land a hair off
    PIL's int32 accumulator only when the true value sits exactly on a
    rounding boundary)."""
    a = -0.5
    scale = in_size / out_size
    filterscale = max(scale, 1.0)
    support = 2.0 * filterscale
    ss = 1.0 / filterscale
    m = np.zeros((out_size, in_size), np.float64)
    for xx in range(out_size):
        center = (xx + 0.5) * scale
        xmin = max(int(center - support + 0.5), 0)
        xmax = min(int(center + support + 0.5), in_size)
        t = np.abs((np.arange(xmin, xmax) - center + 0.5) * ss)
        w = np.where(
            t < 1.0, ((a + 2.0) * t - (a + 3.0)) * t * t + 1.0,
            np.where(t < 2.0, a * (((t - 5.0) * t + 8.0) * t - 4.0), 0.0))
        w = w / w.sum()
        m[xx, xmin:xmax] = np.round(w * (1 << 22)) / (1 << 22)
    return np.ascontiguousarray(m, np.float32)


def device_resize_bicubic(x_u8, wy, wx):
    """(B, H, W, 3) uint8 -> (B, S, S, 3) float32 in [0, 255] with PIL
    BICUBIC semantics, on device: horizontal then vertical separable pass
    (Pillow's order), each followed by round-half-up + clip — replicating
    the uint8 intermediate store that clamps bicubic overshoot between
    passes (skipping it diverges from PIL by up to 25/255 at hard edges)."""
    hi = jax.lax.Precision.HIGHEST  # TPU f32 matmul otherwise runs bf16 passes
    x = x_u8.astype(jnp.float32)
    t = jnp.einsum("bhwc,ow->bhoc", x, wx, precision=hi)
    t = jnp.clip(jnp.floor(t + 0.5), 0.0, 255.0)
    t = jnp.einsum("bhoc,ph->bpoc", t, wy, precision=hi)
    return jnp.clip(jnp.floor(t + 0.5), 0.0, 255.0)


def preprocess_image(image: np.ndarray, size: int) -> np.ndarray:
    """uint8 (H, W, 3) -> normalized (1, size, size, 3) float32."""
    x = resize_image(image, size).astype(np.float32) / 255.0
    return ((x - CLIP_MEAN) / CLIP_STD)[None]


# ---- transformers checkpoint conversion -----------------------------------

def convert_owlvit(sd: dict, config: OwlViTConfig) -> dict:
    """Map a transformers OwlViTForObjectDetection state dict (numpy) onto
    the OwlViT module tree."""
    from ..runtime.convert import _linear, _norm

    def clip_layer(prefix):
        return {
            "layer_norm1": _norm(sd, f"{prefix}.layer_norm1"),
            "layer_norm2": _norm(sd, f"{prefix}.layer_norm2"),
            "self_attn": {
                name: _linear(sd, f"{prefix}.self_attn.{name}")
                for name in ("q_proj", "k_proj", "v_proj", "out_proj")
            },
            "fc1": _linear(sd, f"{prefix}.mlp.fc1"),
            "fc2": _linear(sd, f"{prefix}.mlp.fc2"),
        }

    vp = "owlvit.vision_model"
    vision = {
        "patch_embedding": {
            "kernel": sd[f"{vp}.embeddings.patch_embedding.weight"]
            .transpose(2, 3, 1, 0)},
        "class_embedding": sd[f"{vp}.embeddings.class_embedding"].reshape(-1),
        "position_embedding": sd[f"{vp}.embeddings.position_embedding.weight"],
        "pre_layernorm": _norm(sd, f"{vp}.pre_layernorm"),
        "post_layernorm": _norm(sd, f"{vp}.post_layernorm"),
    }
    for i in range(config.vision_layers):
        vision[f"layers_{i}"] = clip_layer(f"{vp}.encoder.layers.{i}")

    tp = "owlvit.text_model"
    text = {
        "token_embedding": {
            "embedding": sd[f"{tp}.embeddings.token_embedding.weight"]},
        "position_embedding": sd[f"{tp}.embeddings.position_embedding.weight"],
        "final_layer_norm": _norm(sd, f"{tp}.final_layer_norm"),
    }
    for i in range(config.text.num_layers):
        text[f"layers_{i}"] = clip_layer(f"{tp}.encoder.layers.{i}")

    return {
        "vision": vision,
        "text": text,
        "text_projection": {
            "kernel": sd["owlvit.text_projection.weight"].transpose(1, 0)},
        "merge_layer_norm": _norm(sd, "layer_norm"),
        "class_head": {
            "dense0": _linear(sd, "class_head.dense0"),
            "logit_shift": _linear(sd, "class_head.logit_shift"),
            "logit_scale": _linear(sd, "class_head.logit_scale"),
        },
        "box_head": {
            "dense0": _linear(sd, "box_head.dense0"),
            "dense1": _linear(sd, "box_head.dense1"),
            "dense2": _linear(sd, "box_head.dense2"),
        },
    }
