"""Segment Anything (SAM, ViT-B) in Flax — mask refinement for LMD/LMD+.

Replaces the reference's transformers SamModel wrapper (models/sam.py:13-55):
image encoder (ViT-det with windowed attention + decomposed relative
positions + conv neck), prompt encoder (Fourier point embeddings, point/box
labels), and the two-way-transformer mask decoder producing 3 candidate
masks + IoU scores. `FlaxSamSegmenter` plugs into
lmdx.sampling.masking.Segmenter.

Weights convert from a transformers `facebook/sam-vit-base` checkpoint via
`convert_sam`. The image encoder runs once per per-box image — off the
per-step hot path — so most of it leans on XLA fusion; the exception is the
global-attention layers' (N, N) score map at N = 4096, which goes through a
fused Pallas kernel with the decomposed rel-pos bias injected in VMEM
(pallas/sam_attention.py).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .pallas import sam_attention as sam_attention_kernel


@dataclass(frozen=True)
class SamConfig:
    image_size: int = 1024
    patch_size: int = 16
    encoder_dim: int = 768
    encoder_layers: int = 12
    encoder_heads: int = 12
    window_size: int = 14
    global_attn_layers: tuple[int, ...] = (2, 5, 8, 11)
    out_dim: int = 256
    decoder_layers: int = 2
    decoder_heads: int = 8
    num_multimask: int = 3

    @property
    def grid(self) -> int:
        return self.image_size // self.patch_size


def sam_vit_base() -> SamConfig:
    return SamConfig()


def tiny_sam() -> SamConfig:
    return SamConfig(image_size=64, patch_size=8, encoder_dim=32,
                     encoder_layers=2, encoder_heads=2, window_size=4,
                     global_attn_layers=(1,), out_dim=16, decoder_heads=2)


# ---- image encoder ---------------------------------------------------------

def _rel_pos_bias(q_size: int, k_size: int, rel_pos: jnp.ndarray) -> jnp.ndarray:
    """Decomposed relative position lookup (ViTDet): (q, k) bias table."""
    max_rel = 2 * max(q_size, k_size) - 1
    # rel_pos table is (max_rel, head_dim); interpolation not needed when
    # trained and used at the same resolution.
    coords_q = jnp.arange(q_size)[:, None]
    coords_k = jnp.arange(k_size)[None, :]
    rel = coords_q - coords_k + (k_size - 1)
    return rel_pos[rel]  # (q, k, dim)


class SamAttention(nn.Module):
    dim: int
    heads: int
    input_size: tuple[int, int]
    use_rel_pos: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):  # x: (B, H, W, C)
        b, h, w, _ = x.shape
        head_dim = self.dim // self.heads
        qkv = nn.Dense(self.dim * 3, dtype=self.dtype, name="qkv")(x)
        qkv = qkv.reshape(b, h * w, 3, self.heads, head_dim)
        q, k, v = (qkv[:, :, i].transpose(0, 2, 1, 3) for i in range(3))

        if self.use_rel_pos:
            rel_h = self.param("rel_pos_h", nn.initializers.zeros,
                               (2 * self.input_size[0] - 1, head_dim))
            rel_w = self.param("rel_pos_w", nn.initializers.zeros,
                               (2 * self.input_size[1] - 1, head_dim))
            rh = _rel_pos_bias(h, h, rel_h.astype(jnp.float32))
            rw = _rel_pos_bias(w, w, rel_w.astype(jnp.float32))
            q_sp = q.reshape(b, self.heads, h, w, head_dim).astype(jnp.float32)
            bias_h = jnp.einsum("bnhwd,hkd->bnhwk", q_sp, rh)
            bias_w = jnp.einsum("bnhwd,wkd->bnhwk", q_sp, rw)
            # Fused path (TPU, global layers): scores + decomposed bias +
            # softmax + AV in VMEM — never materializes the (N, N) map.
            out = sam_attention_kernel.sam_global_attention(
                q, k, v, bias_h.reshape(b, self.heads, h * w, h),
                bias_w.reshape(b, self.heads, h * w, w))
        else:
            scale = head_dim**-0.5
            attn = jnp.einsum("bhqd,bhkd->bhqk", q * scale, k,
                              preferred_element_type=jnp.float32)
            probs = jax.nn.softmax(attn.astype(jnp.float32),
                                   axis=-1).astype(v.dtype)
            out = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
        out = out.astype(self.dtype)
        out = out.transpose(0, 2, 1, 3).reshape(b, h, w, self.dim)
        return nn.Dense(self.dim, dtype=self.dtype, name="proj")(out)


def _window_partition(x, win):
    b, h, w, c = x.shape
    pad_h = (win - h % win) % win
    pad_w = (win - w % win) % win
    x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
    hp, wp = h + pad_h, w + pad_w
    x = x.reshape(b, hp // win, win, wp // win, win, c)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, win, win, c)
    return x, (hp, wp)


def _window_unpartition(x, win, padded, orig):
    hp, wp = padded
    h, w = orig
    b = x.shape[0] // ((hp // win) * (wp // win))
    x = x.reshape(b, hp // win, wp // win, win, win, -1)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, hp, wp, -1)
    return x[:, :h, :w]


class SamEncoderBlock(nn.Module):
    config: SamConfig
    window: int  # 0 = global attention
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        cfg = self.config
        residual = x
        x = nn.LayerNorm(dtype=self.dtype, name="layer_norm1")(x)
        if self.window:
            x, padded = _window_partition(x, self.window)
            size = (self.window, self.window)
        else:
            size = (cfg.grid, cfg.grid)
        x = SamAttention(cfg.encoder_dim, cfg.encoder_heads, size,
                         dtype=self.dtype, name="attn")(x)
        if self.window:
            x = _window_unpartition(x, self.window, padded,
                                    (residual.shape[1], residual.shape[2]))
        x = residual + x
        y = nn.LayerNorm(dtype=self.dtype, name="layer_norm2")(x)
        y = nn.Dense(cfg.encoder_dim * 4, dtype=self.dtype, name="lin1")(y)
        y = nn.Dense(cfg.encoder_dim, dtype=self.dtype, name="lin2")(nn.gelu(y, approximate=False))
        return x + y


class SamImageEncoder(nn.Module):
    config: SamConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, pixels):  # (B, S, S, 3) normalized
        cfg = self.config
        x = nn.Conv(cfg.encoder_dim, (cfg.patch_size, cfg.patch_size),
                    strides=(cfg.patch_size, cfg.patch_size),
                    dtype=self.dtype, name="patch_embed")(pixels)
        pos = self.param("pos_embed", nn.initializers.zeros,
                         (1, cfg.grid, cfg.grid, cfg.encoder_dim))
        x = x + pos.astype(x.dtype)
        for i in range(cfg.encoder_layers):
            window = 0 if i in cfg.global_attn_layers else cfg.window_size
            x = SamEncoderBlock(cfg, window, dtype=self.dtype,
                                name=f"layers_{i}")(x)
        # Conv neck with channel-wise LayerNorm (ViTDet).
        x = nn.Conv(cfg.out_dim, (1, 1), use_bias=False, dtype=self.dtype,
                    name="neck_conv1")(x)
        x = nn.LayerNorm(dtype=jnp.float32, name="neck_ln1")(x)
        x = nn.Conv(cfg.out_dim, (3, 3), padding=1, use_bias=False,
                    dtype=self.dtype, name="neck_conv2")(x)
        return nn.LayerNorm(dtype=jnp.float32, name="neck_ln2")(x)


# ---- prompt encoder --------------------------------------------------------

class SamPromptEncoder(nn.Module):
    """Points/boxes -> sparse prompt embeddings + dense positional grid.

    Point labels: 1 foreground, 0 background, 2/3 box corners, -1 pad."""

    config: SamConfig
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        dim = self.config.out_dim
        self.pe_gaussian = self.param(
            "positional_embedding", nn.initializers.normal(1.0), (2, dim // 2))
        self.point_embed = [
            nn.Embed(1, dim, name=f"point_embed_{i}") for i in range(4)
        ]
        self.not_a_point_embed = nn.Embed(1, dim, name="not_a_point_embed")
        self.no_mask_embed = nn.Embed(1, dim, name="no_mask_embed")

    def _pe(self, coords):  # coords in [0,1], (..., 2)
        x = (2.0 * coords - 1.0) @ self.pe_gaussian
        x = 2.0 * jnp.pi * x
        return jnp.concatenate([jnp.sin(x), jnp.cos(x)], axis=-1)

    def dense_pe(self):
        g = self.config.grid
        ys = (jnp.arange(g) + 0.5) / g
        xs = (jnp.arange(g) + 0.5) / g
        grid = jnp.stack(jnp.meshgrid(xs, ys), axis=-1)  # (g, g, 2) xy
        return self._pe(grid)

    def no_mask_dense(self):
        """Dense embedding for "no mask prompt" (added to image embeds)."""
        return self.no_mask_embed(jnp.zeros((1,), jnp.int32))[0]

    def __call__(self, points, labels):
        """points (B, N, 2) in [0,1] xy; labels (B, N) int32."""
        emb = self._pe(points)
        emb = jnp.where((labels == -1)[..., None],
                        self.not_a_point_embed(jnp.zeros_like(labels)), emb)
        for i in range(4):
            table = self.point_embed[i](jnp.zeros_like(labels))
            emb = jnp.where((labels == i)[..., None], emb + table, emb)
        emb = jnp.where((labels == -1)[..., None],
                        self.not_a_point_embed(jnp.zeros_like(labels)), emb)
        return emb


# ---- mask decoder ----------------------------------------------------------

class _DecoderAttention(nn.Module):
    dim: int
    heads: int
    downsample: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, q, k, v):
        inner = self.dim // self.downsample
        head_dim = inner // self.heads
        b = q.shape[0]

        def proj(x, name):
            y = nn.Dense(inner, dtype=self.dtype, name=name)(x)
            return y.reshape(b, -1, self.heads, head_dim).transpose(0, 2, 1, 3)

        qh, kh, vh = proj(q, "q_proj"), proj(k, "k_proj"), proj(v, "v_proj")
        attn = jnp.einsum("bhqd,bhkd->bhqk", qh, kh,
                          preferred_element_type=jnp.float32) / jnp.sqrt(head_dim)
        probs = jax.nn.softmax(attn.astype(jnp.float32), -1).astype(vh.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", probs, vh)
        out = out.transpose(0, 2, 1, 3).reshape(b, -1, inner)
        return nn.Dense(self.dim, dtype=self.dtype, name="out_proj")(out)


class TwoWayBlock(nn.Module):
    config: SamConfig
    skip_first_pe: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, tokens, image, token_pe, image_pe):
        cfg = self.config
        dim, heads = cfg.out_dim, cfg.decoder_heads

        q = tokens if self.skip_first_pe else tokens + token_pe
        tokens = tokens + _DecoderAttention(dim, heads, dtype=self.dtype,
                                            name="self_attn")(q, q, tokens)
        tokens = nn.LayerNorm(dtype=self.dtype, name="layer_norm1")(tokens)

        q = tokens + token_pe
        k = image + image_pe
        tokens = tokens + _DecoderAttention(
            dim, heads, downsample=2, dtype=self.dtype,
            name="cross_attn_token_to_image")(q, k, image)
        tokens = nn.LayerNorm(dtype=self.dtype, name="layer_norm2")(tokens)

        y = nn.Dense(dim * 8, dtype=self.dtype, name="mlp_lin1")(tokens)
        tokens = tokens + nn.Dense(dim, dtype=self.dtype,
                                   name="mlp_lin2")(nn.relu(y))
        tokens = nn.LayerNorm(dtype=self.dtype, name="layer_norm3")(tokens)

        q = tokens + token_pe
        image = image + _DecoderAttention(
            dim, heads, downsample=2, dtype=self.dtype,
            name="cross_attn_image_to_token")(k, q, tokens)
        image = nn.LayerNorm(dtype=self.dtype, name="layer_norm4")(image)
        return tokens, image


class _MLP(nn.Module):
    hidden: int
    out: int
    layers: int = 3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i in range(self.layers - 1):
            x = nn.relu(nn.Dense(self.hidden, dtype=self.dtype,
                                 name=f"layers_{i}")(x))
        return nn.Dense(self.out, dtype=self.dtype,
                        name=f"layers_{self.layers - 1}")(x)


class SamMaskDecoder(nn.Module):
    config: SamConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, image_embeds, image_pe, sparse_prompt):
        """image_embeds (B, g, g, D); sparse_prompt (B, N, D).

        Returns (masks (B, 3, 4g, 4g) logits, iou (B, 3))."""
        cfg = self.config
        dim = cfg.out_dim
        num_tokens = cfg.num_multimask + 1
        b, g, _, _ = image_embeds.shape

        iou_token = self.param("iou_token", nn.initializers.normal(1.0), (1, dim))
        mask_tokens = self.param("mask_tokens", nn.initializers.normal(1.0),
                                 (num_tokens, dim))
        out_tokens = jnp.concatenate([iou_token, mask_tokens], axis=0)
        tokens = jnp.concatenate(
            [jnp.broadcast_to(out_tokens, (b, *out_tokens.shape)),
             sparse_prompt], axis=1)

        image = image_embeds.reshape(b, g * g, dim)
        pe = image_pe.reshape(1, g * g, dim)
        pe = jnp.broadcast_to(pe, image.shape)
        token_pe = tokens

        x_tokens, x_image = tokens, image
        for i in range(cfg.decoder_layers):
            x_tokens, x_image = TwoWayBlock(
                cfg, skip_first_pe=(i == 0), dtype=self.dtype,
                name=f"layers_{i}")(x_tokens, x_image, token_pe, pe)

        q = x_tokens + token_pe
        k = x_image + pe
        x_tokens = x_tokens + _DecoderAttention(
            dim, cfg.decoder_heads, downsample=2, dtype=self.dtype,
            name="final_attn_token_to_image")(q, k, x_image)
        x_tokens = nn.LayerNorm(dtype=self.dtype, name="layer_norm_final")(x_tokens)

        iou_out = x_tokens[:, 0]
        mask_out = x_tokens[:, 1 : 1 + num_tokens]

        img = x_image.reshape(b, g, g, dim)
        img = nn.ConvTranspose(dim // 4, (2, 2), strides=(2, 2),
                               dtype=self.dtype, name="upscale_conv1")(img)
        img = nn.LayerNorm(dtype=jnp.float32, name="upscale_ln")(img)
        img = nn.gelu(img, approximate=False)
        img = nn.ConvTranspose(dim // 8, (2, 2), strides=(2, 2),
                               dtype=self.dtype, name="upscale_conv2")(img)
        img = nn.gelu(img, approximate=False)  # (B, 4g, 4g, dim/8)

        hyper = jnp.stack([
            _MLP(dim, dim // 8, dtype=self.dtype,
                 name=f"hypernet_{i}")(mask_out[:, i])
            for i in range(num_tokens)
        ], axis=1)  # (B, T, dim/8)
        masks = jnp.einsum("btc,bhwc->bthw", hyper, img)
        iou = _MLP(dim, num_tokens, dtype=self.dtype,
                   name="iou_prediction_head")(iou_out)
        # Multimask outputs are tokens 1..3 (token 0 is the single-mask path).
        return masks[:, 1:], iou[:, 1:]


class Sam(nn.Module):
    config: SamConfig
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.image_encoder = SamImageEncoder(self.config, dtype=self.dtype)
        self.prompt_encoder = SamPromptEncoder(self.config, dtype=self.dtype)
        self.mask_decoder = SamMaskDecoder(self.config, dtype=self.dtype)

    def __call__(self, pixels, points, labels):
        """pixels (B, S, S, 3); points (B, N, 2) xy in [0,1]; labels (B, N).

        Returns (mask logits (B, 3, S/4, S/4), iou scores (B, 3))."""
        image_embeds = self.image_encoder(pixels)
        sparse = self.prompt_encoder(points, labels)
        # No mask prompt in this pipeline: the learned no-mask embedding is
        # added densely (SAM's dense prompt path with empty input).
        image_embeds = image_embeds + self.prompt_encoder.no_mask_dense()
        dense_pe = self.prompt_encoder.dense_pe()[None]
        return self.mask_decoder(image_embeds, dense_pe, sparse)


SAM_MEAN = np.array([123.675, 116.28, 103.53], np.float32)
SAM_STD = np.array([58.395, 57.12, 57.375], np.float32)


def _bucket_pow2(n: int) -> int:
    b = 1
    while b < n:
        b *= 2
    return b


def _torch_bilinear(x: jnp.ndarray, oh: int, ow: int) -> jnp.ndarray:
    """Bilinear resize over the LAST TWO axes with torch
    F.interpolate(mode='bilinear', align_corners=False, antialias=False)
    semantics: 2-tap sampling at half-pixel-mapped coordinates, border
    clamped. jax.image.resize differs on DOWNSCALE (it antialiases), and
    the reference's mask chain downscales twice (transformers
    post_process_masks; models/sam.py:51-54) — so the exact kernel matters
    for mask-bit parity."""
    h, w = x.shape[-2], x.shape[-1]
    ys = jnp.clip((jnp.arange(oh) + 0.5) * (h / oh) - 0.5, 0.0, h - 1.0)
    xs = jnp.clip((jnp.arange(ow) + 0.5) * (w / ow) - 0.5, 0.0, w - 1.0)
    y0 = jnp.floor(ys).astype(jnp.int32)
    x0 = jnp.floor(xs).astype(jnp.int32)
    y1 = jnp.minimum(y0 + 1, h - 1)
    x1 = jnp.minimum(x0 + 1, w - 1)
    wy = (ys - y0).astype(x.dtype)
    wx = (xs - x0).astype(x.dtype)
    top = x[..., y0, :] * (1.0 - wy)[:, None] + x[..., y1, :] * wy[:, None]
    return top[..., :, x0] * (1.0 - wx) + top[..., :, x1] * wx


@functools.partial(jax.jit,
                   static_argnames=("size", "oh", "ow", "th", "tw"))
def _postprocess_masks(masks, size, oh, ow, th, tw):
    """Reference mask chain, on device: low-res logits -> bilinear to the
    model grid -> bilinear to the original image size -> threshold at 0
    (transformers post_process_masks, models/sam.py:41-44) -> bilinear to
    the target latent shape -> nonzero (models/sam.py:51-54's
    F.interpolate(...).type(torch.bool))."""
    up = _torch_bilinear(masks.astype(jnp.float32), size, size)
    orig = (_torch_bilinear(up, oh, ow) > 0.0).astype(jnp.float32)
    return _torch_bilinear(orig, th, tw) != 0.0


class FlaxSamSegmenter:
    """masking.Segmenter backed by Flax SAM.

    dtype: compute dtype. bf16 is the parity configuration — the reference
    runs its SAM forward under torch.autocast fp16 (models/sam.py:27-31 via
    lmd_plus.py use_autocast=True); params stay f32, linen casts per call.

    segment_batch runs every box of a pipeline batch through ONE compiled
    forward (batch dim bucketed to the next power of two, point prompts
    padded to the box-prompt's 2 slots with label -1) instead of B separate
    1024² encoder dispatches — the encoder dominates, so B-at-once is the
    difference between a memory/launch-bound loop and an MXU-bound matmul.
    """

    # segment_batch takes jax uint8 HxWx3 arrays directly (no host fetch):
    # pipeline callers hand decode_latents(to_host=False) output straight in.
    accepts_device_arrays = True

    def __init__(self, params, config: SamConfig | None = None,
                 dtype=jnp.bfloat16):
        self.config = config or sam_vit_base()
        self.model = Sam(self.config, dtype=dtype)
        # Pin params on device once: converted checkpoints arrive as host
        # numpy, and a per-call transfer would re-stream ~0.36 GB over the
        # chip tunnel on every segment call.
        self.params = jax.device_put(params)
        size = self.config.image_size

        def apply(params, raw, pts, lbl):
            # Resize + normalize ON DEVICE: the host uploads compact uint8
            # at source resolution (0.8 MB per 512² image) instead of
            # f32 at 1024² (12.6 MB) — the upload rides the tunnel, so
            # 16× less traffic dominates everything else in this path.
            x = raw.astype(jnp.float32)
            x = jax.image.resize(
                x, (x.shape[0], size, size, x.shape[3]), "bilinear")
            x = (x - SAM_MEAN) / SAM_STD
            return self.model.apply({"params": params}, x, pts, lbl)

        self._apply = jax.jit(apply)

    def _preprocess(self, image) -> np.ndarray:
        """Host fallback: to RGB uint8 at a uniform size (device resizes)."""
        from PIL import Image as PILImage

        img = PILImage.fromarray(np.asarray(image)).convert("RGB")
        return np.asarray(img, np.uint8)

    def segment(self, image, input_points=None, input_boxes=None,
                target_hw=None):
        [(masks, iou)] = self.segment_batch(
            [image],
            input_points=None if input_points is None else [input_points],
            input_boxes=None if input_boxes is None else [input_boxes],
            target_hw=target_hw)
        return masks, iou

    # Compiled batch cap. Originally forced by the materialized
    # (B, heads, 4096, 4096) f32 score matrices (0.8 GB/image); the fused
    # global-attention kernel removed that peak, but 4 re-measured as the
    # fastest chunk post-kernel too (16 boxes e2e on v5e: 558 ms at 4,
    # 621 at 8, 764 at 16 — larger chunks lose dispatch/compute overlap).
    CHUNK = 4

    def segment_batch(self, images, input_points=None, input_boxes=None,
                      target_hw=None):
        """Segment B images with one prompt each, in chunked jitted forwards.

        images: length-B list of HxWx3 arrays — host uint8 (PIL-normalized)
        or jax uint8 device arrays (decode_latents(to_host=False); stays on
        device end to end). Exactly one of input_points
        (B entries of [(x, y)]) / input_boxes (B entries of [(x0,y0,x1,y1)])
        — per-image prompt kind mixing is not needed by any pipeline path.
        Returns a length-B list of (masks (3, h, w) bool, iou (3,)).
        """
        n = len(images)
        if n > self.CHUNK:
            # Dispatch every chunk's forward+postprocess before fetching any
            # result: each np.asarray is a host round trip over the chip
            # tunnel, and fetching chunk i before dispatching chunk i+1 would
            # serialize device work against that latency.
            pending = []
            for s in range(0, n, self.CHUNK):
                pending.append(self._segment_chunk(
                    images[s : s + self.CHUNK],
                    input_points=(None if input_points is None
                                  else input_points[s : s + self.CHUNK]),
                    input_boxes=(None if input_boxes is None
                                 else input_boxes[s : s + self.CHUNK]),
                    target_hw=target_hw))
            out = []
            for masks, iou, m in pending:
                masks = np.asarray(masks[:m])
                iou = np.asarray(iou[:m], np.float32)
                out.extend((masks[i], iou[i]) for i in range(m))
            return out
        masks, iou, m = self._segment_chunk(
            images, input_points=input_points, input_boxes=input_boxes,
            target_hw=target_hw)
        masks = np.asarray(masks[:m])
        iou = np.asarray(iou[:m], np.float32)
        return [(masks[i], iou[i]) for i in range(m)]

    def _segment_chunk(self, images, input_points, input_boxes, target_hw):
        """Dispatch one chunk; returns device arrays (masks, iou, n) without
        forcing a host sync.

        Device fast path: images that are already jax uint8 HxWx3 arrays
        (decode_latents(to_host=False)) stay on device — no PIL, no host
        stack, no tunnel round-trip; prompts only need their shapes."""
        n = len(images)
        if all(isinstance(im, jax.Array) for im in images):
            arrs = images
            if len({a.shape for a in arrs}) > 1:
                raise ValueError("device-array batch must be uniform-size")
            device_pixels = jnp.stack(arrs)
        else:
            device_pixels = None
            arrs = [self._preprocess(im) for im in images]
        if device_pixels is None:
            if len({a.shape for a in arrs}) > 1:
                # Mixed sizes (not produced by any pipeline path): host-resize
                # to the model size so the batch stacks.
                from PIL import Image as PILImage

                size = self.config.image_size
                arrs = [np.asarray(
                    PILImage.fromarray(a).resize((size, size),
                                                 PILImage.BILINEAR), np.uint8)
                    for a in arrs]
            pixels = np.stack(arrs)
        else:
            pixels = device_pixels
        size = self.config.image_size
        # Both prompt kinds share the compiled 2-slot shape: a lone point
        # rides slot 0 with slot 1 padded as "not a point" (label -1).
        # Coordinates replicate the reference chain exactly: normalized box
        # -> integer pixels in IMAGE space (utils.scale_proportion,
        # models/sam.py:186) -> the processor's rescale to the model grid
        # -> the torch prompt encoder's +0.5 pixel-center shift, normalized.
        points = np.zeros((n, 2, 2), np.float32)
        labels = np.full((n, 2), -1, np.int32)
        if input_boxes is not None:
            from ..core import boxes as boxlib

            for i, [box] in enumerate(input_boxes):
                oh, ow = arrs[i].shape[:2]
                x0, y0, x1, y1 = boxlib.scale_proportion(box, oh, ow)
                sx, sy = size / ow, size / oh
                points[i] = [((x0 * sx + 0.5) / size, (y0 * sy + 0.5) / size),
                             ((x1 * sx + 0.5) / size, (y1 * sy + 0.5) / size)]
                labels[i] = (2, 3)
        elif input_points is not None:
            for i, [(px, py)] in enumerate(input_points):
                # Normalized point -> model-grid pixel -> +0.5 shift: the
                # reference's pixel point is integer in image space
                # (sam.py:150-154), so px*size is already exact.
                points[i, 0] = ((px * size + 0.5) / size,
                                (py * size + 0.5) / size)
                labels[i, 0] = 1
        else:
            raise ValueError("need input_points or input_boxes")

        b = _bucket_pow2(n)
        if b > n:
            pad = ((0, b - n),) + ((0, 0),) * (pixels.ndim - 1)
            xp = jnp if device_pixels is not None else np
            pixels = xp.pad(pixels, pad, mode="edge")
            points = np.pad(points, ((0, b - n), (0, 0), (0, 0)))
            labels = np.pad(labels, ((0, b - n), (0, 0)),
                            constant_values=-1)

        masks, iou = self._apply(self.params, jnp.asarray(pixels),
                                 jnp.asarray(points), jnp.asarray(labels))
        # Reference-exact postprocess on device (only (n, 3, th, tw) bools
        # cross the tunnel, not model-resolution float masks).
        oh, ow = arrs[0].shape[:2]
        th, tw = target_hw
        masks = _postprocess_masks(masks, size=size, oh=oh, ow=ow,
                                   th=th, tw=tw)
        return masks, iou, n


# ---- conversion ------------------------------------------------------------

def convert_sam(sd: dict, config: SamConfig) -> dict:
    """Map a transformers SamModel (facebook/sam-vit-base) state dict onto
    the Flax Sam module tree."""
    from ..runtime.convert import _linear, _norm

    def enc_block(prefix):
        out = {
            "layer_norm1": _norm(sd, f"{prefix}.layer_norm1"),
            "layer_norm2": _norm(sd, f"{prefix}.layer_norm2"),
            "attn": {
                "qkv": _linear(sd, f"{prefix}.attn.qkv"),
                "proj": _linear(sd, f"{prefix}.attn.proj"),
                "rel_pos_h": sd[f"{prefix}.attn.rel_pos_h"],
                "rel_pos_w": sd[f"{prefix}.attn.rel_pos_w"],
            },
            "lin1": _linear(sd, f"{prefix}.mlp.lin1"),
            "lin2": _linear(sd, f"{prefix}.mlp.lin2"),
        }
        return out

    ve = "vision_encoder"
    encoder = {
        "patch_embed": {
            "kernel": sd[f"{ve}.patch_embed.projection.weight"].transpose(2, 3, 1, 0),
            "bias": sd[f"{ve}.patch_embed.projection.bias"]},
        "pos_embed": sd[f"{ve}.pos_embed"],
        "neck_conv1": {"kernel": sd[f"{ve}.neck.conv1.weight"].transpose(2, 3, 1, 0)},
        "neck_ln1": _norm(sd, f"{ve}.neck.layer_norm1"),
        "neck_conv2": {"kernel": sd[f"{ve}.neck.conv2.weight"].transpose(2, 3, 1, 0)},
        "neck_ln2": _norm(sd, f"{ve}.neck.layer_norm2"),
    }
    for i in range(config.encoder_layers):
        encoder[f"layers_{i}"] = enc_block(f"{ve}.layers.{i}")

    pe = "prompt_encoder"
    prompt = {
        "positional_embedding": sd[
            f"{pe}.shared_embedding.positional_embedding"],
        "not_a_point_embed": {
            "embedding": sd[f"{pe}.point_embed.not_a_point_embed.weight"]
            if f"{pe}.point_embed.not_a_point_embed.weight" in sd
            else sd[f"{pe}.not_a_point_embed.weight"]},
        "no_mask_embed": {"embedding": sd[f"{pe}.no_mask_embed.weight"]},
    }
    for i in range(4):
        key = f"{pe}.point_embed.{i}.weight"
        prompt[f"point_embed_{i}"] = {"embedding": sd[key]}

    md = "mask_decoder"

    def dec_attn(prefix):
        return {name: _linear(sd, f"{prefix}.{name}")
                for name in ("q_proj", "k_proj", "v_proj", "out_proj")}

    def ffn3(prefix):
        """transformers SamFeedForward: proj_in -> layers.* -> proj_out."""
        if f"{prefix}.layers.2.weight" in sd:
            names = ("layers.0", "layers.1", "layers.2")
        elif f"{prefix}.proj_in.weight" in sd:
            names = ("proj_in", "layers.0", "proj_out")
        else:
            names = ("layers.0", "layers.1", "layers.2")
        return {f"layers_{j}": _linear(sd, f"{prefix}.{n}")
                for j, n in enumerate(names)}

    decoder = {
        "iou_token": sd[f"{md}.iou_token.weight"],
        "mask_tokens": sd[f"{md}.mask_tokens.weight"],
        # transformers nests this under mask_decoder.transformer (caught by
        # the sam_vit_base manifest test).
        "layer_norm_final": _norm(sd, f"{md}.transformer.layer_norm_final_attn"),
        "final_attn_token_to_image": dec_attn(
            f"{md}.transformer.final_attn_token_to_image"),
        "upscale_conv1": {
            "kernel": sd[f"{md}.upscale_conv1.weight"].transpose(2, 3, 0, 1),
            "bias": sd[f"{md}.upscale_conv1.bias"]},
        "upscale_conv2": {
            "kernel": sd[f"{md}.upscale_conv2.weight"].transpose(2, 3, 0, 1),
            "bias": sd[f"{md}.upscale_conv2.bias"]},
        "upscale_ln": _norm(sd, f"{md}.upscale_layer_norm"),
        "iou_prediction_head": ffn3(f"{md}.iou_prediction_head"),
    }
    for i in range(config.decoder_layers):
        p = f"{md}.transformer.layers.{i}"
        decoder[f"layers_{i}"] = {
            "self_attn": dec_attn(f"{p}.self_attn"),
            "cross_attn_token_to_image": dec_attn(
                f"{p}.cross_attn_token_to_image"),
            "cross_attn_image_to_token": dec_attn(
                f"{p}.cross_attn_image_to_token"),
            "layer_norm1": _norm(sd, f"{p}.layer_norm1"),
            "layer_norm2": _norm(sd, f"{p}.layer_norm2"),
            "layer_norm3": _norm(sd, f"{p}.layer_norm3"),
            "layer_norm4": _norm(sd, f"{p}.layer_norm4"),
            "mlp_lin1": _linear(sd, f"{p}.mlp.lin1"),
            "mlp_lin2": _linear(sd, f"{p}.mlp.lin2"),
        }
    for i in range(config.num_multimask + 1):
        decoder[f"hypernet_{i}"] = ffn3(f"{md}.output_hypernetworks_mlps.{i}")

    return {"image_encoder": encoder, "prompt_encoder": prompt,
            "mask_decoder": decoder}
