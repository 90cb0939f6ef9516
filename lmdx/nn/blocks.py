"""UNet building blocks (Flax, NHWC).

Fresh TPU-first implementation of the SD UNet topology: NHWC layouts for TPU
convolutions, fp32 GroupNorm, bf16-friendly convs/matmuls. Architecture
parity target: the reference's vendored diffusers-0.18 UNet
(models/unet_2d_blocks.py), including the attention-key threading that names
each cross-attention layer ("down"/"mid"/"up", block index, attention index,
transformer index) — here realized as static `tap_prefix` strings
(unet_2d_blocks.py:257-259,381-386,640-643; transformer_2d.py:297-302).
"""

from __future__ import annotations

import math

import flax.linen as nn
import jax.numpy as jnp

from .attention import NO_TAPS, TapSpec, Transformer2D


def timestep_embedding(timesteps: jnp.ndarray, dim: int, flip_sin_to_cos: bool = True,
                       freq_shift: float = 0.0, max_period: float = 10000.0) -> jnp.ndarray:
    """Sinusoidal timestep features (diffusers get_timestep_embedding parity)."""
    half = dim // 2
    exponent = -math.log(max_period) * jnp.arange(half, dtype=jnp.float32)
    exponent = exponent / (half - freq_shift)
    emb = timesteps.astype(jnp.float32)[:, None] * jnp.exp(exponent)[None, :]
    sin, cos = jnp.sin(emb), jnp.cos(emb)
    return jnp.concatenate([cos, sin] if flip_sin_to_cos else [sin, cos], axis=-1)


class TimestepEmbedding(nn.Module):
    dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, t_feat):
        h = nn.Dense(self.dim, dtype=self.dtype, name="linear_1")(t_feat)
        return nn.Dense(self.dim, dtype=self.dtype, name="linear_2")(nn.silu(h))


class ResnetBlock(nn.Module):
    out_channels: int
    norm_num_groups: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, t_emb):
        residual = x
        # NOTE: a Pallas fused GroupNorm+SiLU (pallas/group_norm.py) was
        # measured SLOWER here (190 vs 182.5 ms b16 fwd on v5e) — XLA fuses
        # the stats reduce with the producing conv, which a separate kernel
        # pass cannot; it stays available as an opt-in experiment.
        h = nn.GroupNorm(num_groups=self.norm_num_groups, epsilon=1e-5,
                         dtype=jnp.float32, name="norm1")(x)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype, name="conv1")(
            nn.silu(h)
        )
        t = nn.Dense(self.out_channels, dtype=self.dtype, name="time_emb_proj")(nn.silu(t_emb))
        h = h + t[:, None, None, :]
        h = nn.GroupNorm(num_groups=self.norm_num_groups, epsilon=1e-5,
                         dtype=jnp.float32, name="norm2")(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype, name="conv2")(
            nn.silu(h)
        )
        if residual.shape[-1] != self.out_channels:
            residual = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                               name="conv_shortcut")(residual)
        return residual + h


class Downsample(nn.Module):
    channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        return nn.Conv(self.channels, (3, 3), strides=(2, 2), padding=1,
                       dtype=self.dtype, name="conv")(x)


class Upsample(nn.Module):
    channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)  # nearest 2x
        return nn.Conv(self.channels, (3, 3), padding=1, dtype=self.dtype, name="conv")(x)


class CrossAttnDownBlock(nn.Module):
    out_channels: int
    num_layers: int
    heads: int
    context_dim: int
    transformer_depth: int = 1
    norm_num_groups: int = 32
    add_downsample: bool = True
    use_linear_projection: bool = False
    use_gated_attention: bool = False
    tap_place: str = "down_0"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, t_emb, context, objs=None, fuser_gate=1.0,
                 taps: TapSpec = NO_TAPS, tap_token_index=None):
        residuals = []
        for i in range(self.num_layers):
            x = ResnetBlock(self.out_channels, self.norm_num_groups,
                            dtype=self.dtype, name=f"resnets_{i}")(x, t_emb)
            x = Transformer2D(
                channels=self.out_channels, heads=self.heads,
                head_dim=self.out_channels // self.heads,
                context_dim=self.context_dim, depth=self.transformer_depth,
                norm_num_groups=self.norm_num_groups,
                use_linear_projection=self.use_linear_projection,
                use_gated_attention=self.use_gated_attention,
                tap_prefix=f"{self.tap_place}_{i}",
                dtype=self.dtype, name=f"attentions_{i}",
            )(x, context, objs=objs, fuser_gate=fuser_gate, taps=taps,
              tap_token_index=tap_token_index)
            residuals.append(x)
        if self.add_downsample:
            x = Downsample(self.out_channels, dtype=self.dtype, name="downsample")(x)
            residuals.append(x)
        return x, residuals


class DownBlock(nn.Module):
    out_channels: int
    num_layers: int
    norm_num_groups: int = 32
    add_downsample: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, t_emb):
        residuals = []
        for i in range(self.num_layers):
            x = ResnetBlock(self.out_channels, self.norm_num_groups,
                            dtype=self.dtype, name=f"resnets_{i}")(x, t_emb)
            residuals.append(x)
        if self.add_downsample:
            x = Downsample(self.out_channels, dtype=self.dtype, name="downsample")(x)
            residuals.append(x)
        return x, residuals


class MidBlock(nn.Module):
    channels: int
    heads: int
    context_dim: int
    transformer_depth: int = 1
    norm_num_groups: int = 32
    use_linear_projection: bool = False
    use_gated_attention: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, t_emb, context, objs=None, fuser_gate=1.0,
                 taps: TapSpec = NO_TAPS, tap_token_index=None):
        x = ResnetBlock(self.channels, self.norm_num_groups,
                        dtype=self.dtype, name="resnets_0")(x, t_emb)
        x = Transformer2D(
            channels=self.channels, heads=self.heads,
            head_dim=self.channels // self.heads,
            context_dim=self.context_dim, depth=self.transformer_depth,
            norm_num_groups=self.norm_num_groups,
            use_linear_projection=self.use_linear_projection,
            use_gated_attention=self.use_gated_attention,
            tap_prefix="mid_0_0",
            dtype=self.dtype, name="attentions_0",
        )(x, context, objs=objs, fuser_gate=fuser_gate, taps=taps,
          tap_token_index=tap_token_index)
        x = ResnetBlock(self.channels, self.norm_num_groups,
                        dtype=self.dtype, name="resnets_1")(x, t_emb)
        return x


class CrossAttnUpBlock(nn.Module):
    out_channels: int
    num_layers: int
    heads: int
    context_dim: int
    transformer_depth: int = 1
    norm_num_groups: int = 32
    add_upsample: bool = True
    use_linear_projection: bool = False
    use_gated_attention: bool = False
    tap_place: str = "up_0"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, res_samples, t_emb, context, objs=None, fuser_gate=1.0,
                 taps: TapSpec = NO_TAPS, tap_token_index=None):
        for i in range(self.num_layers):
            x = jnp.concatenate([x, res_samples.pop()], axis=-1)
            x = ResnetBlock(self.out_channels, self.norm_num_groups,
                            dtype=self.dtype, name=f"resnets_{i}")(x, t_emb)
            x = Transformer2D(
                channels=self.out_channels, heads=self.heads,
                head_dim=self.out_channels // self.heads,
                context_dim=self.context_dim, depth=self.transformer_depth,
                norm_num_groups=self.norm_num_groups,
                use_linear_projection=self.use_linear_projection,
                use_gated_attention=self.use_gated_attention,
                tap_prefix=f"{self.tap_place}_{i}",
                dtype=self.dtype, name=f"attentions_{i}",
            )(x, context, objs=objs, fuser_gate=fuser_gate, taps=taps,
              tap_token_index=tap_token_index)
        if self.add_upsample:
            x = Upsample(self.out_channels, dtype=self.dtype, name="upsample")(x)
        return x


class UpBlock(nn.Module):
    out_channels: int
    num_layers: int
    norm_num_groups: int = 32
    add_upsample: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, res_samples, t_emb):
        for i in range(self.num_layers):
            x = jnp.concatenate([x, res_samples.pop()], axis=-1)
            x = ResnetBlock(self.out_channels, self.norm_num_groups,
                            dtype=self.dtype, name=f"resnets_{i}")(x, t_emb)
        if self.add_upsample:
            x = Upsample(self.out_channels, dtype=self.dtype, name="upsample")(x)
        return x
