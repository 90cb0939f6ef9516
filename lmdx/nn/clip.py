"""CLIP text encoder (Flax), from scratch.

Covers both SD1.x (OpenAI CLIP ViT-L/14 text tower, quick_gelu) and SD2.x
(OpenCLIP ViT-H penultimate, gelu) via `CLIPTextConfig`. Returns the last
hidden state (the UNet conditioning) and the pooled EOS-token embedding
(used as GLIGEN phrase embeddings — reference models/pipelines.py:303-305).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from ..config import CLIPTextConfig


def _act(name: str):
    if name == "quick_gelu":
        return lambda x: x * nn.sigmoid(1.702 * x)
    if name == "gelu":
        # exact erf GELU (torch nn.GELU default), not the tanh approximation
        return lambda x: nn.gelu(x, approximate=False)
    raise ValueError(name)


class CLIPAttention(nn.Module):
    config: CLIPTextConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask):
        cfg = self.config
        head_dim = cfg.hidden_size // cfg.num_heads
        b, l, _ = x.shape

        def proj(name):
            return nn.Dense(cfg.hidden_size, dtype=self.dtype, name=name)

        q = proj("q_proj")(x).reshape(b, l, cfg.num_heads, head_dim)
        k = proj("k_proj")(x).reshape(b, l, cfg.num_heads, head_dim)
        v = proj("v_proj")(x).reshape(b, l, cfg.num_heads, head_dim)

        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                            preferred_element_type=jnp.float32) / jnp.sqrt(head_dim)
        scores = scores + mask
        probs = nn.softmax(scores.astype(jnp.float32), axis=-1).astype(v.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(b, l, cfg.hidden_size)
        return proj("out_proj")(out)


class CLIPLayer(nn.Module):
    config: CLIPTextConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask):
        cfg = self.config
        x = x + CLIPAttention(cfg, dtype=self.dtype, name="self_attn")(
            nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                         name="layer_norm1")(x), mask
        )
        h = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                         name="layer_norm2")(x)
        h = nn.Dense(cfg.intermediate_size, dtype=self.dtype, name="fc1")(h)
        h = _act(cfg.hidden_act)(h)
        return x + nn.Dense(cfg.hidden_size, dtype=self.dtype, name="fc2")(h)


class CLIPTextEncoder(nn.Module):
    config: CLIPTextConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, input_ids: jnp.ndarray, eos_token_id: int = 49407):
        cfg = self.config
        b, l = input_ids.shape

        tok = nn.Embed(cfg.vocab_size, cfg.hidden_size, dtype=self.dtype,
                       name="token_embedding")(input_ids)
        pos = self.param(
            "position_embedding", nn.initializers.normal(0.01),
            (cfg.max_length, cfg.hidden_size),
        )
        x = tok + pos[None, :l].astype(self.dtype)

        # Causal mask (CLIP text tower is autoregressive-masked).
        causal = jnp.triu(jnp.full((l, l), -1e9, dtype=jnp.float32), k=1)
        mask = causal[None, None]

        penultimate = None
        for i in range(cfg.num_layers):
            x = CLIPLayer(cfg, dtype=self.dtype, name=f"layers_{i}")(x, mask)
            if i == cfg.num_layers - 2:
                penultimate = x

        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                         name="final_layer_norm")(x)

        # Pooled output: hidden state at the first EOS token position.
        eos_pos = jnp.argmax((input_ids == eos_token_id).astype(jnp.int32), axis=-1)
        pooled = x[jnp.arange(b), eos_pos]
        if cfg.use_text_projection:
            pooled = nn.Dense(cfg.hidden_size, use_bias=False, dtype=self.dtype,
                              name="text_projection")(pooled)

        # SDXL conditions on the raw penultimate hidden states (clip-skip 2).
        hidden = penultimate if cfg.penultimate_hidden else x
        return hidden, pooled
