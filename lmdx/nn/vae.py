"""AutoencoderKL (SD VAE) in Flax/NHWC: encoder (image -> latent posterior)
and decoder (latent -> image).

Architecture parity: diffusers AutoencoderKL as used by the reference
(models/models.py:41, pipelines.py:84-127; latent scaling 0.18215 at
pipelines.py:119). Decode dominates the per-image cost and runs once per
image; encode is used by img2img/SDXL refinement.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..config import VAEConfig


class VAEResnetBlock(nn.Module):
    out_channels: int
    norm_num_groups: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        residual = x
        h = nn.GroupNorm(num_groups=self.norm_num_groups, epsilon=1e-6,
                         dtype=jnp.float32, name="norm1")(x)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                    name="conv1")(nn.silu(h))
        h = nn.GroupNorm(num_groups=self.norm_num_groups, epsilon=1e-6,
                         dtype=jnp.float32, name="norm2")(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                    name="conv2")(nn.silu(h))
        if residual.shape[-1] != self.out_channels:
            residual = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                               name="conv_shortcut")(residual)
        return residual + h


class VAEAttention(nn.Module):
    """Single-head spatial self-attention in the VAE mid block."""

    channels: int
    norm_num_groups: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        residual = x
        y = nn.GroupNorm(num_groups=self.norm_num_groups, epsilon=1e-6,
                         dtype=jnp.float32, name="group_norm")(x)
        y = y.reshape(b, h * w, c)
        q = nn.Dense(c, dtype=self.dtype, name="to_q")(y)
        k = nn.Dense(c, dtype=self.dtype, name="to_k")(y)
        v = nn.Dense(c, dtype=self.dtype, name="to_v")(y)
        scores = jnp.einsum("bqd,bkd->bqk", q, k,
                            preferred_element_type=jnp.float32) / jnp.sqrt(c)
        probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(v.dtype)
        y = jnp.einsum("bqk,bkd->bqd", probs, v)
        y = nn.Dense(c, dtype=self.dtype, name="to_out")(y)
        return residual + y.reshape(b, h, w, c)


class VAEMidBlock(nn.Module):
    channels: int
    norm_num_groups: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = VAEResnetBlock(self.channels, self.norm_num_groups, dtype=self.dtype,
                           name="resnets_0")(x)
        x = VAEAttention(self.channels, self.norm_num_groups, dtype=self.dtype,
                         name="attentions_0")(x)
        return VAEResnetBlock(self.channels, self.norm_num_groups, dtype=self.dtype,
                              name="resnets_1")(x)


class Encoder(nn.Module):
    config: VAEConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        cfg = self.config
        x = nn.Conv(cfg.block_out_channels[0], (3, 3), padding=1, dtype=self.dtype,
                    name="conv_in")(x)
        for i, ch in enumerate(cfg.block_out_channels):
            for j in range(cfg.layers_per_block):
                x = VAEResnetBlock(ch, cfg.norm_num_groups, dtype=self.dtype,
                                   name=f"down_{i}_resnets_{j}")(x)
            if i < len(cfg.block_out_channels) - 1:
                # Asymmetric padding then stride-2 conv (diffusers parity).
                x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
                x = nn.Conv(ch, (3, 3), strides=(2, 2), padding="VALID",
                            dtype=self.dtype, name=f"down_{i}_downsample")(x)
        x = VAEMidBlock(cfg.block_out_channels[-1], cfg.norm_num_groups,
                        dtype=self.dtype, name="mid")(x)
        x = nn.GroupNorm(num_groups=cfg.norm_num_groups, epsilon=1e-6,
                         dtype=jnp.float32, name="conv_norm_out")(x)
        return nn.Conv(2 * cfg.latent_channels, (3, 3), padding=1, dtype=self.dtype,
                       name="conv_out")(nn.silu(x))


class Decoder(nn.Module):
    config: VAEConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, z):
        cfg = self.config
        reversed_channels = list(reversed(cfg.block_out_channels))
        x = nn.Conv(reversed_channels[0], (3, 3), padding=1, dtype=self.dtype,
                    name="conv_in")(z)
        x = VAEMidBlock(reversed_channels[0], cfg.norm_num_groups,
                        dtype=self.dtype, name="mid")(x)
        for i, ch in enumerate(reversed_channels):
            for j in range(cfg.layers_per_block + 1):
                x = VAEResnetBlock(ch, cfg.norm_num_groups, dtype=self.dtype,
                                   name=f"up_{i}_resnets_{j}")(x)
            if i < len(reversed_channels) - 1:
                x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
                x = nn.Conv(ch, (3, 3), padding=1, dtype=self.dtype,
                            name=f"up_{i}_upsample")(x)
        x = nn.GroupNorm(num_groups=cfg.norm_num_groups, epsilon=1e-6,
                         dtype=jnp.float32, name="conv_norm_out")(x)
        return nn.Conv(cfg.in_channels, (3, 3), padding=1, dtype=self.dtype,
                       name="conv_out")(nn.silu(x))


class AutoencoderKL(nn.Module):
    config: VAEConfig
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.encoder = Encoder(self.config, dtype=self.dtype)
        self.decoder = Decoder(self.config, dtype=self.dtype)
        self.quant_conv = nn.Conv(2 * self.config.latent_channels, (1, 1),
                                  dtype=self.dtype, name="quant_conv")
        self.post_quant_conv = nn.Conv(self.config.latent_channels, (1, 1),
                                       dtype=self.dtype, name="post_quant_conv")

    def encode_moments(self, images):
        """images (B, H, W, 3) in [-1, 1] -> (mean, logvar) latents (B, h, w, 4)."""
        moments = self.quant_conv(self.encoder(images))
        mean, logvar = jnp.split(moments, 2, axis=-1)
        return mean, jnp.clip(logvar, -30.0, 20.0)

    def encode(self, images, noise=None):
        """Sample the latent posterior, applying the SD scaling factor."""
        mean, logvar = self.encode_moments(images)
        if noise is None:
            z = mean
        else:
            z = mean + jnp.exp(0.5 * logvar) * noise
        return z * self.config.scaling_factor

    def decode(self, latents):
        """Scaled latents (B, h, w, 4) -> images (B, H, W, 3) in [-1, 1]."""
        z = latents / self.config.scaling_factor
        return self.decoder(self.post_quant_conv(z))

    def __call__(self, images, noise=None):
        return self.decode(self.encode(images, noise))


def to_uint8(images: jnp.ndarray) -> jnp.ndarray:
    """[-1, 1] float images -> uint8 (decode postprocess, pipelines.py:116-127)."""
    images = jnp.clip(images / 2 + 0.5, 0.0, 1.0)
    return jnp.round(images * 255.0).astype(jnp.uint8)
