"""Conditional 2D UNet (Stable Diffusion) with attention taps and GLIGEN
grounding, in Flax/NHWC.

Forward contract (all static switches are hashable):

    eps, taps = unet.apply(
        {"params": params}, latents_nhwc, timesteps, encoder_hidden_states,
        objs=objs_or_None, fuser_gate=0_or_1, taps=TapSpec(...),
        tap_token_index=optional_i32,
    )

`taps` is a dict {AttnKey: (B, heads, q_len, kv_len_or_1) float32} of
cross-attention probabilities for the statically requested keys — the
functional replacement for the reference's `save_attn_to_dict` mutation
(models/unet_2d_condition.py:704-719, attention_processor.py:463-483).

GLIGEN grounding (LMD+): `objs` are grounding tokens from `PositionNet`
(box Fourier features ‖ CLIP phrase pooler embeddings -> MLP; reference
models/unet_2d_condition.py:63-114) consumed by gated self-attention fusers
inside every transformer block (models/attention.py:25-53). `fuser_gate`
scales the fuser contribution (scheduled sampling, pipelines.py:408-414).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..config import UNetConfig
from .attention import NO_TAPS, TapSpec, name_to_key
from .blocks import (
    CrossAttnDownBlock,
    CrossAttnUpBlock,
    DownBlock,
    MidBlock,
    TimestepEmbedding,
    UpBlock,
    timestep_embedding,
)


class FourierEmbedder:
    """Sin/cos features of box coordinates (GLIGEN PositionNet input).

    Feature ordering is (freq, sin/cos, coord) flattened — matching the
    reference buffer layout so converted checkpoints are bit-compatible
    (unet_2d_condition.py:63-77).
    """

    def __init__(self, num_freqs: int = 8, temperature: float = 100.0):
        self.num_freqs = num_freqs
        self.freq_bands = temperature ** (jnp.arange(num_freqs) / num_freqs)

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        # x: (B, N, 4) -> (B, N, num_freqs * 2 * 4)
        emb = self.freq_bands[None, None, None, :] * x[..., None]  # (B, N, 4, F)
        emb = jnp.stack([jnp.sin(emb), jnp.cos(emb)], axis=-1)      # (B, N, 4, F, 2)
        emb = emb.transpose(0, 1, 3, 4, 2)                           # (B, N, F, 2, 4)
        return emb.reshape(*x.shape[:2], -1)


class PositionNet(nn.Module):
    """Grounding-token MLP: (boxes, phrase embeddings, validity masks) -> objs."""

    positive_len: int
    out_dim: int
    fourier_freqs: int = 8
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, boxes: jnp.ndarray, masks: jnp.ndarray,
                 phrase_embeddings: jnp.ndarray) -> jnp.ndarray:
        position_dim = self.fourier_freqs * 2 * 4
        xyxy = FourierEmbedder(self.fourier_freqs)(boxes)

        null_positive = self.param("null_positive_feature", nn.initializers.zeros,
                                   (self.positive_len,))
        null_position = self.param("null_position_feature", nn.initializers.zeros,
                                   (position_dim,))

        m = masks[..., None]
        phrase = phrase_embeddings * m + (1 - m) * null_positive[None, None]
        xyxy = xyxy * m + (1 - m) * null_position[None, None]

        h = jnp.concatenate([phrase, xyxy], axis=-1).astype(self.dtype)
        h = nn.Dense(512, dtype=self.dtype, name="linears_0")(h)
        h = nn.Dense(512, dtype=self.dtype, name="linears_2")(nn.silu(h))
        return nn.Dense(self.out_dim, dtype=self.dtype, name="linears_4")(nn.silu(h))


class UNet2DCondition(nn.Module):
    config: UNetConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        sample: jnp.ndarray,             # (B, H, W, C) latents
        timesteps: jnp.ndarray,          # scalar or (B,)
        encoder_hidden_states: jnp.ndarray,  # (B, L, context_dim)
        objs: jnp.ndarray | None = None,     # (B, max_objs, context_dim) grounding tokens
        fuser_gate=1.0,
        taps: TapSpec = NO_TAPS,
        tap_token_index: jnp.ndarray | None = None,
        added_text_embeds: jnp.ndarray | None = None,  # (B, pooled_dim) SDXL
        added_time_ids: jnp.ndarray | None = None,     # (B, num_ids) SDXL
        stop_after_taps: bool = False,
    ):
        """When `stop_after_taps` is set, the forward ends right after the
        last block containing a tapped attention layer: guidance passes
        consume only the tapped probability maps, so everything downstream
        of the last tap (for SD: up blocks 2-3, the highest-resolution and
        most expensive) is dead compute. Returns None in place of eps."""
        cfg = self.config
        stop_point = _last_tap_point(taps) if stop_after_taps else None
        timesteps = jnp.asarray(timesteps)
        if timesteps.ndim == 0:
            timesteps = jnp.broadcast_to(timesteps, (sample.shape[0],))

        t_feat = timestep_embedding(
            timesteps, cfg.block_out_channels[0],
            flip_sin_to_cos=cfg.flip_sin_to_cos, freq_shift=cfg.freq_shift,
        )
        t_emb = TimestepEmbedding(cfg.time_embed_dim, dtype=self.dtype,
                                  name="time_embedding")(t_feat)

        if cfg.addition_embed_type == "text_time":
            # SDXL micro-conditioning: Fourier-embed each conditioning id,
            # concat with the pooled text embedding, project into the time
            # embedding (diffusers add_embedding parity).
            if added_text_embeds is None or added_time_ids is None:
                raise ValueError(
                    "text_time conditioning needs added_text_embeds and "
                    "added_time_ids")
            ids = added_time_ids.reshape(-1)
            id_emb = timestep_embedding(
                ids, cfg.addition_time_embed_dim,
                flip_sin_to_cos=cfg.flip_sin_to_cos, freq_shift=cfg.freq_shift,
            ).reshape(added_time_ids.shape[0], -1)
            aug = jnp.concatenate(
                [added_text_embeds.astype(id_emb.dtype), id_emb], axis=-1)
            t_emb = t_emb + TimestepEmbedding(
                cfg.time_embed_dim, dtype=self.dtype, name="add_embedding")(aug)

        x = nn.Conv(cfg.block_out_channels[0], (3, 3), padding=1,
                    dtype=self.dtype, name="conv_in")(sample.astype(self.dtype))

        ca_kwargs = dict(fuser_gate=fuser_gate, taps=taps,
                         tap_token_index=tap_token_index, objs=objs)
        context = encoder_hidden_states.astype(self.dtype)

        residuals = [x]
        for i, block_type in enumerate(cfg.down_block_types):
            out_ch = cfg.block_out_channels[i]
            is_last = i == len(cfg.down_block_types) - 1
            if block_type == "CrossAttnDownBlock2D":
                x, res = CrossAttnDownBlock(
                    out_channels=out_ch, num_layers=cfg.layers_per_block,
                    heads=cfg.num_attention_heads[i],
                    context_dim=cfg.cross_attention_dim,
                    transformer_depth=cfg.transformer_depth(i),
                    norm_num_groups=cfg.norm_num_groups,
                    add_downsample=not is_last,
                    use_linear_projection=cfg.use_linear_projection,
                    use_gated_attention=cfg.use_gligen,
                    tap_place=f"down_{i}", dtype=self.dtype,
                    name=f"down_blocks_{i}",
                )(x, t_emb, context, **ca_kwargs)
            elif block_type == "DownBlock2D":
                x, res = DownBlock(
                    out_channels=out_ch, num_layers=cfg.layers_per_block,
                    norm_num_groups=cfg.norm_num_groups, add_downsample=not is_last,
                    dtype=self.dtype, name=f"down_blocks_{i}",
                )(x, t_emb)
            else:
                raise ValueError(block_type)
            residuals.extend(res)
            if stop_point == ("down", i):
                return None

        x = MidBlock(
            channels=cfg.block_out_channels[-1],
            heads=cfg.num_attention_heads[-1],
            context_dim=cfg.cross_attention_dim,
            transformer_depth=cfg.transformer_depth(len(cfg.block_out_channels) - 1),
            norm_num_groups=cfg.norm_num_groups,
            use_linear_projection=cfg.use_linear_projection,
            use_gated_attention=cfg.use_gligen,
            dtype=self.dtype, name="mid_block",
        )(x, t_emb, context, **ca_kwargs)
        if stop_point == ("mid", 0):
            return None

        reversed_channels = list(reversed(cfg.block_out_channels))
        for i, block_type in enumerate(cfg.up_block_types):
            out_ch = reversed_channels[i]
            level = len(cfg.block_out_channels) - 1 - i
            is_last = i == len(cfg.up_block_types) - 1
            res = [residuals.pop() for _ in range(cfg.layers_per_block + 1)][::-1]
            res = list(res)
            if block_type == "CrossAttnUpBlock2D":
                x = CrossAttnUpBlock(
                    out_channels=out_ch, num_layers=cfg.layers_per_block + 1,
                    heads=cfg.num_attention_heads[level],
                    context_dim=cfg.cross_attention_dim,
                    transformer_depth=cfg.transformer_depth(level),
                    norm_num_groups=cfg.norm_num_groups,
                    add_upsample=not is_last,
                    use_linear_projection=cfg.use_linear_projection,
                    use_gated_attention=cfg.use_gligen,
                    tap_place=f"up_{i}", dtype=self.dtype,
                    name=f"up_blocks_{i}",
                )(x, res, t_emb, context, **ca_kwargs)
            elif block_type == "UpBlock2D":
                x = UpBlock(
                    out_channels=out_ch, num_layers=cfg.layers_per_block + 1,
                    norm_num_groups=cfg.norm_num_groups, add_upsample=not is_last,
                    dtype=self.dtype, name=f"up_blocks_{i}",
                )(x, res, t_emb)
            else:
                raise ValueError(block_type)
            if stop_point == ("up", i):
                return None

        x = nn.GroupNorm(num_groups=cfg.norm_num_groups, epsilon=1e-5,
                         dtype=jnp.float32, name="conv_norm_out")(x)
        x = nn.Conv(cfg.out_channels, (3, 3), padding=1, dtype=self.dtype,
                    name="conv_out")(nn.silu(x))
        return x.astype(jnp.float32)


def _last_tap_point(taps: TapSpec):
    """Static stop point: the last (place, block) containing a tapped layer,
    in forward order down_0..down_n, mid, up_0..up_n."""
    if not taps:
        return None
    down = [k[1] for k in taps.keys if k[0] == "down"]
    mid = [k for k in taps.keys if k[0] == "mid"]
    up = [k[1] for k in taps.keys if k[0] == "up"]
    if up:
        return ("up", max(up))
    if mid:
        return ("mid", 0)
    return ("down", max(down))


def apply_unet(unet: UNet2DCondition, params, sample, timesteps, encoder_hidden_states,
               objs=None, fuser_gate=1.0, taps: TapSpec = NO_TAPS, tap_token_index=None,
               added_text_embeds=None, added_time_ids=None, stop_after_taps=False):
    """Apply the UNet, returning (eps, {AttnKey: probs}).

    Flattens the sown "taps" collection back into the reference's 4-tuple key
    space (pipelines.py:12-14) for the guidance losses. With
    `stop_after_taps`, eps is None and only the taps are computed.
    """
    out = unet.apply(
        {"params": params}, sample, timesteps, encoder_hidden_states,
        objs=objs, fuser_gate=fuser_gate, taps=taps, tap_token_index=tap_token_index,
        added_text_embeds=added_text_embeds, added_time_ids=added_time_ids,
        stop_after_taps=stop_after_taps,
        mutable=["taps"] if taps else False,
    )
    if not taps:
        return out, {}
    eps, variables = out
    flat = {}

    def _collect(path, leaf):
        name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
        flat[name_to_key(name)] = leaf

    tap_vars = variables.get("taps", {})
    jax.tree_util.tree_map_with_path(_collect, tap_vars)
    return eps, flat
