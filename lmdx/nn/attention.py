"""Attention primitives for the grounded-diffusion UNet.

The reference exports cross-attention probability maps by mutating a dict
passed through `cross_attention_kwargs` (reference:
models/attention_processor.py:377-483). Here attention taps are *functional*:
each cross-attention layer knows its static key ("down"/"mid"/"up", block,
attention index, transformer index); the UNet forward receives a static
`TapSpec` naming which keys to export, and tapped layers `sow` their
probability maps into a "taps" variable collection. `Module.apply(...,
mutable=["taps"])` then returns `{key_name: (B, heads, q, kv)}` alongside the
output — everything stays jit-able and differentiable (the guidance loss
back-propagates through the sown probabilities into the latents).

Untapped layers take a fused attention path that never materializes the
probability matrix (Pallas flash-attention kernel on TPU — see
lmdx/nn/pallas/flash_attention.py; XLA einsum elsewhere).
"""

from __future__ import annotations

from dataclasses import dataclass

import flax.linen as nn
import jax
import jax.numpy as jnp

AttnKey = tuple[str, int, int, int]


def key_name(key: AttnKey) -> str:
    return "_".join(str(part) for part in key)


def name_to_key(name: str) -> AttnKey:
    place, a, b, c = name.split("_")
    return (place, int(a), int(b), int(c))


@dataclass(frozen=True)
class TapSpec:
    """Static description of which cross-attention maps to export.

    keys: attention-layer keys to export.
    cond_only: export only the conditional half of a CFG-doubled batch
        (reference `return_cond_ca_only`, attention_processor.py:463-470).
    single_token: export only one text-token column (given per-call by
        `tap_token_index`; reference `return_token_ca_only`).
    fused: use the fused (Pallas/flash) path for untapped layers. Guidance
        passes set False so their gradient path is plain XLA (parity with the
        reference's `enable_flash_attn: False` under guidance,
        pipelines.py:165-168).
    """

    keys: tuple[AttnKey, ...] = ()
    cond_only: bool = False
    single_token: bool = False
    fused: bool = True

    def __bool__(self) -> bool:
        return bool(self.keys)

    @property
    def names(self) -> frozenset[str]:
        return frozenset(key_name(k) for k in self.keys)


NO_TAPS = TapSpec()


def split_heads(x: jnp.ndarray, heads: int) -> jnp.ndarray:
    b, l, d = x.shape
    return x.reshape(b, l, heads, d // heads).transpose(0, 2, 1, 3)


def merge_heads(x: jnp.ndarray) -> jnp.ndarray:
    b, h, l, d = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, l, h * d)


def attention_probs(q: jnp.ndarray, k: jnp.ndarray) -> jnp.ndarray:
    """Explicit softmax attention probabilities in float32.

    q, k: (B, heads, L, head_dim). Returns (B, heads, Lq, Lk) float32.
    """
    scale = 1.0 / jnp.sqrt(q.shape[-1]).astype(jnp.float32)
    scores = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
    ) * scale
    return jax.nn.softmax(scores.astype(jnp.float32), axis=-1)


class CrossAttention(nn.Module):
    """Multi-head attention (self when context is None, cross otherwise)."""

    query_dim: int
    heads: int
    head_dim: int
    context_dim: int | None = None  # None -> self-attention
    tap_name: str | None = None     # static identity for TapSpec matching
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        context: jnp.ndarray | None = None,
        taps: TapSpec = NO_TAPS,
        tap_token_index: jnp.ndarray | None = None,
    ) -> jnp.ndarray:
        inner = self.heads * self.head_dim
        ctx = x if context is None else context

        qf = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_q")(x)
        kf = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_k")(ctx)
        vf = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_v")(ctx)

        tapped = self.tap_name is not None and self.tap_name in taps.names
        if not tapped and taps.fused:
            # Projection-layout fused path: no head-split relayout in HBM
            # (see flash_attention.flash_attention_hd).
            from .pallas.flash_attention import flash_attention_hd

            out = flash_attention_hd(qf, kf, vf, self.heads)
            return nn.Dense(self.query_dim, dtype=self.dtype,
                            name="to_out")(out)

        q, k, v = (split_heads(t, self.heads) for t in (qf, kf, vf))
        if tapped:
            probs = attention_probs(q, k)
            export = probs
            if taps.cond_only:
                # CFG convention: [uncond..., cond...] along the batch axis.
                export = export[export.shape[0] // 2 :]
            if taps.single_token:
                if tap_token_index is None:
                    raise ValueError("TapSpec.single_token requires tap_token_index")
                idx = jnp.asarray(tap_token_index)
                if idx.ndim == 0:
                    export = jax.lax.dynamic_slice_in_dim(
                        export, idx, 1, axis=-1
                    )
                else:
                    # Per-batch-element token column (batched per-box passes).
                    export = jnp.take_along_axis(
                        export, idx[:, None, None, None], axis=-1
                    )
            self.sow("taps", self.tap_name, export, reduce_fn=lambda _, b: b)
            out = jnp.einsum(
                "bhqk,bhkd->bhqd", probs.astype(v.dtype), v,
                preferred_element_type=jnp.float32,
            ).astype(v.dtype)
        else:
            from .pallas.flash_attention import _xla_attention

            out = _xla_attention(q, k, v)

        out = merge_heads(out)
        return nn.Dense(self.query_dim, dtype=self.dtype, name="to_out")(out)


class GEGLU(nn.Module):
    dim_out: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.Dense(self.dim_out * 2, dtype=self.dtype, name="proj")(x)
        h, gate = jnp.split(h, 2, axis=-1)
        return h * nn.gelu(gate)


class FeedForward(nn.Module):
    dim: int
    mult: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = GEGLU(self.dim * self.mult, dtype=self.dtype, name="net_0")(x)
        return nn.Dense(self.dim, dtype=self.dtype, name="net_2")(h)


class GatedSelfAttention(nn.Module):
    """GLIGEN's gated self-attention fuser (reference models/attention.py:25-53).

    Visual tokens attend over [visual tokens ‖ grounding tokens]; the result is
    added through a tanh-gated learned scalar. `gate` scales the whole update:
    the scheduled-sampling toggle (pipelines.py:408-414) becomes a traced 0/1
    multiplier so the sampler can switch it off mid-scan without recompiling
    (segmented scans additionally skip it statically).
    """

    query_dim: int
    context_dim: int
    heads: int
    head_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, objs: jnp.ndarray, gate=1.0) -> jnp.ndarray:
        n_visual = x.shape[1]
        objs = nn.Dense(self.query_dim, dtype=self.dtype, name="linear")(objs)

        alpha_attn = self.param("alpha_attn", nn.initializers.zeros, ())
        alpha_dense = self.param("alpha_dense", nn.initializers.zeros, ())

        attn = CrossAttention(
            query_dim=self.query_dim, heads=self.heads, head_dim=self.head_dim,
            dtype=self.dtype, name="attn",
        )
        ff = FeedForward(self.query_dim, dtype=self.dtype, name="ff")

        # The reference self-attends over [visual ‖ objs] then keeps only the
        # visual rows (attention.py:44-46). Querying only the visual tokens
        # against the concatenated keys/values is numerically identical for
        # those rows — and keeps the query length at the latent token count
        # (a block-divisible size the fused kernel accepts; a 4096+30-token
        # self-attention would fall back to a materialized XLA softmax).
        h = nn.LayerNorm(dtype=self.dtype, name="norm1")(
            jnp.concatenate([x, objs], axis=1))
        h = attn(h[:, :n_visual], context=h)
        x = x + gate * jnp.tanh(alpha_attn) * h
        x = x + gate * jnp.tanh(alpha_dense) * ff(
            nn.LayerNorm(dtype=self.dtype, name="norm2")(x)
        )
        return x


class BasicTransformerBlock(nn.Module):
    """Self-attention -> (GLIGEN fuser) -> cross-attention -> feed-forward."""

    dim: int
    heads: int
    head_dim: int
    context_dim: int
    tap_name: str | None = None
    use_gated_attention: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context, objs=None, fuser_gate=1.0, taps: TapSpec = NO_TAPS,
                 tap_token_index=None):
        x = x + CrossAttention(
            query_dim=self.dim, heads=self.heads, head_dim=self.head_dim,
            dtype=self.dtype, name="attn1",
        )(nn.LayerNorm(dtype=self.dtype, name="norm1")(x))

        if self.use_gated_attention and objs is not None:
            x = GatedSelfAttention(
                query_dim=self.dim, context_dim=self.context_dim,
                heads=self.heads, head_dim=self.head_dim,
                dtype=self.dtype, name="fuser",
            )(x, objs, gate=fuser_gate)

        x = x + CrossAttention(
            query_dim=self.dim, heads=self.heads, head_dim=self.head_dim,
            context_dim=self.context_dim, tap_name=self.tap_name,
            dtype=self.dtype, name="attn2",
        )(
            nn.LayerNorm(dtype=self.dtype, name="norm2")(x),
            context=context, taps=taps, tap_token_index=tap_token_index,
        )

        x = x + FeedForward(self.dim, dtype=self.dtype, name="ff")(
            nn.LayerNorm(dtype=self.dtype, name="norm3")(x)
        )
        return x


class Transformer2D(nn.Module):
    """Spatial transformer: GroupNorm -> proj_in -> transformer blocks on
    flattened (H*W) tokens -> proj_out, residual."""

    channels: int
    heads: int
    head_dim: int
    context_dim: int
    depth: int = 1
    norm_num_groups: int = 32
    use_linear_projection: bool = False
    tap_prefix: str | None = None  # e.g. "down_0_1" -> blocks tap "down_0_1_<k>"
    use_gated_attention: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context, objs=None, fuser_gate=1.0, taps: TapSpec = NO_TAPS,
                 tap_token_index=None):
        b, h, w, c = x.shape
        residual = x
        x = nn.GroupNorm(num_groups=self.norm_num_groups, epsilon=1e-6,
                         dtype=jnp.float32, name="norm")(x)
        if self.use_linear_projection:
            x = x.reshape(b, h * w, c)
            x = nn.Dense(self.channels, dtype=self.dtype, name="proj_in")(x)
        else:
            x = nn.Conv(self.channels, (1, 1), dtype=self.dtype, name="proj_in")(x)
            x = x.reshape(b, h * w, self.channels)

        for k in range(self.depth):
            tap_name = f"{self.tap_prefix}_{k}" if self.tap_prefix else None
            x = BasicTransformerBlock(
                dim=self.channels, heads=self.heads, head_dim=self.head_dim,
                context_dim=self.context_dim, tap_name=tap_name,
                use_gated_attention=self.use_gated_attention,
                dtype=self.dtype, name=f"blocks_{k}",
            )(x, context, objs=objs, fuser_gate=fuser_gate, taps=taps,
              tap_token_index=tap_token_index)

        if self.use_linear_projection:
            x = nn.Dense(self.channels, dtype=self.dtype, name="proj_out")(x)
            x = x.reshape(b, h, w, self.channels)
        else:
            x = x.reshape(b, h, w, self.channels)
            x = nn.Conv(self.channels, (1, 1), dtype=self.dtype, name="proj_out")(x)
        return x + residual
