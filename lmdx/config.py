"""Model/architecture configurations.

Explicit frozen dataclasses replace the reference's scattered module-level
globals and HF config dicts (reference: models/models.py:11-14,
generate.py:104-115). Every config is hashable so it can be a static argument
to jitted functions.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax.numpy as jnp


@dataclass(frozen=True)
class CLIPTextConfig:
    vocab_size: int = 49408
    hidden_size: int = 768
    intermediate_size: int = 3072
    num_layers: int = 12
    num_heads: int = 12
    max_length: int = 77
    # "quick_gelu" for OpenAI CLIP (SD1.x), "gelu" for OpenCLIP (SD2.x/XL)
    hidden_act: str = "quick_gelu"
    layer_norm_eps: float = 1e-5
    # SDXL conditions on the penultimate layer's hidden states (clip-skip 2).
    penultimate_hidden: bool = False
    # Project the pooled embedding (CLIP text_projection); SDXL's pooled
    # conditioning uses the projected vector.
    use_text_projection: bool = False


@dataclass(frozen=True)
class VAEConfig:
    in_channels: int = 3
    latent_channels: int = 4
    block_out_channels: tuple[int, ...] = (128, 256, 512, 512)
    layers_per_block: int = 2
    norm_num_groups: int = 32
    scaling_factor: float = 0.18215


@dataclass(frozen=True)
class UNetConfig:
    in_channels: int = 4
    out_channels: int = 4
    block_out_channels: tuple[int, ...] = (320, 640, 1280, 1280)
    down_block_types: tuple[str, ...] = (
        "CrossAttnDownBlock2D", "CrossAttnDownBlock2D", "CrossAttnDownBlock2D", "DownBlock2D",
    )
    up_block_types: tuple[str, ...] = (
        "UpBlock2D", "CrossAttnUpBlock2D", "CrossAttnUpBlock2D", "CrossAttnUpBlock2D",
    )
    layers_per_block: int = 2
    cross_attention_dim: int = 768
    # Number of attention heads per resolution level. (In SD1.x HF configs this
    # is the `attention_head_dim=8` legacy quirk: 8 *heads*, head_dim = C/8.
    # In SD2.x it's per-level head counts with head_dim 64.)
    num_attention_heads: tuple[int, ...] = (8, 8, 8, 8)
    # int (uniform) or per-level tuple (SDXL: (1, 2, 10)).
    transformer_layers_per_block: int | tuple[int, ...] = 1
    norm_num_groups: int = 32
    # SDXL "text_time" additional conditioning: pooled text embedding +
    # Fourier-embedded micro-conditioning ids, projected into the time
    # embedding. None for SD1.x/2.x.
    addition_embed_type: str | None = None
    addition_time_embed_dim: int = 256
    # pooled-text dim + addition_time_embed_dim * num_time_ids
    projection_class_embeddings_input_dim: int = 2816
    # SD2.x projects in/out of the transformer with Linear instead of 1x1 conv.
    use_linear_projection: bool = False
    freq_shift: int = 0
    flip_sin_to_cos: bool = True
    # GLIGEN grounding adapters (gated self-attention + PositionNet).
    use_gligen: bool = False
    gligen_fourier_freqs: int = 8
    gligen_max_objs: int = 30

    @property
    def time_embed_dim(self) -> int:
        return self.block_out_channels[0] * 4

    def head_dim(self, channels: int, level: int) -> int:
        return channels // self.num_attention_heads[level]

    def transformer_depth(self, level: int) -> int:
        if isinstance(self.transformer_layers_per_block, int):
            return self.transformer_layers_per_block
        return self.transformer_layers_per_block[level]


@dataclass(frozen=True)
class SDConfig:
    """A full Stable Diffusion model family configuration."""

    key: str = "runwayml/stable-diffusion-v1-5"
    unet: UNetConfig = field(default_factory=UNetConfig)
    clip: CLIPTextConfig = field(default_factory=CLIPTextConfig)
    # Secondary text tower (SDXL-base: clip = CLIP-L, clip2 = OpenCLIP bigG;
    # the UNet context is the feature-concat of both, pooled comes from
    # clip2's projected embedding). None for single-tower families.
    clip2: CLIPTextConfig | None = None
    # Checkpoint subdirectory holding the primary tower's weights. The SDXL
    # refiner ships its single (bigG) tower as text_encoder_2/ with no
    # text_encoder/ at all (reference generation/sdxl_refinement.py loads
    # stabilityai/stable-diffusion-xl-refiner-1.0).
    text_encoder_dir: str = "text_encoder"
    vae: VAEConfig = field(default_factory=VAEConfig)
    height: int = 512
    width: int = 512
    # bfloat16 on TPU replaces the reference's fp16/autocast switches
    # (models.py:29-39, lmd_plus.py:227).
    dtype: str = "bfloat16"
    param_dtype: str = "float32"
    # Integrator the checkpoint's repo scheduler config names: "ddim" for the
    # SD-family bundles the reference selects (models/models.py:41-53), and
    # "euler" for the SDXL refiner (its scheduler_config is EulerDiscrete —
    # formerly PARITY.md's one known integrator residual).
    default_scheduler: str = "ddim"

    @property
    def vae_scale(self) -> int:
        """Spatial down/up factor of the VAE (8 for SD: 4 levels)."""
        return 2 ** (len(self.vae.block_out_channels) - 1)

    @property
    def latent_height(self) -> int:
        return self.height // self.vae_scale

    @property
    def latent_width(self) -> int:
        return self.width // self.vae_scale

    def jnp_dtype(self):
        return jnp.dtype(self.dtype)

    @property
    def pooled_dim(self) -> int:
        """Width of the pooled text embedding that conditions text_time
        (SDXL takes it from the bigG tower)."""
        return (self.clip2 or self.clip).hidden_size

    @property
    def context_dim(self) -> int:
        """Width of the UNet cross-attention context (dual towers concat)."""
        return self.clip.hidden_size + (
            self.clip2.hidden_size if self.clip2 else 0)


def sd15() -> SDConfig:
    return SDConfig(key="runwayml/stable-diffusion-v1-5")


def sd14_gligen() -> SDConfig:
    """SD v1.4 with GLIGEN grounding adapters (LMD+'s base model,
    'gligen/diffusers-generation-text-box' — reference generate.py:105-111)."""
    return SDConfig(
        key="gligen/diffusers-generation-text-box",
        unet=UNetConfig(use_gligen=True),
    )


def sd21_base() -> SDConfig:
    return SDConfig(
        key="stabilityai/stable-diffusion-2-1-base",
        unet=UNetConfig(
            cross_attention_dim=1024,
            num_attention_heads=(5, 10, 20, 20),
            use_linear_projection=True,
        ),
        clip=CLIPTextConfig(
            hidden_size=1024,
            intermediate_size=4096,
            num_layers=23,
            num_heads=16,
            hidden_act="gelu",
        ),
    )


def sdxl_refiner() -> SDConfig:
    """SDXL refiner (img2img upsampling pass, reference
    generation/sdxl_refinement.py uses stabilityai/stable-diffusion-xl-refiner-1.0).
    Single OpenCLIP ViT-bigG text encoder (penultimate hidden states), 4-level
    UNet with 4 transformer blocks per cross-attn level, text_time additional
    conditioning with 5 micro-conditioning ids (size/crop/aesthetic)."""
    return SDConfig(
        key="stabilityai/stable-diffusion-xl-refiner-1.0",
        unet=UNetConfig(
            block_out_channels=(384, 768, 1536, 1536),
            down_block_types=(
                "DownBlock2D", "CrossAttnDownBlock2D", "CrossAttnDownBlock2D",
                "DownBlock2D",
            ),
            up_block_types=(
                "UpBlock2D", "CrossAttnUpBlock2D", "CrossAttnUpBlock2D",
                "UpBlock2D",
            ),
            cross_attention_dim=1280,
            num_attention_heads=(6, 12, 24, 24),
            transformer_layers_per_block=4,
            use_linear_projection=True,
            addition_embed_type="text_time",
            projection_class_embeddings_input_dim=2560,  # 1280 + 256*5
        ),
        clip=CLIPTextConfig(
            hidden_size=1280, intermediate_size=5120, num_layers=32,
            num_heads=20, hidden_act="gelu", penultimate_hidden=True,
            use_text_projection=True,
        ),
        text_encoder_dir="text_encoder_2",
        height=1024,
        width=1024,
        default_scheduler="euler",
    )


def sdxl_base() -> SDConfig:
    """SDXL base: 3-level UNet (10 transformer blocks at the lowest level)
    conditioned on the feature-concat of TWO text towers — CLIP-L (768) and
    OpenCLIP bigG (1280) penultimate hidden states = 2048-dim context; the
    pooled text_time conditioning comes from bigG's projected embedding."""
    return SDConfig(
        key="stabilityai/stable-diffusion-xl-base-1.0",
        unet=UNetConfig(
            block_out_channels=(320, 640, 1280),
            down_block_types=(
                "DownBlock2D", "CrossAttnDownBlock2D", "CrossAttnDownBlock2D",
            ),
            up_block_types=(
                "CrossAttnUpBlock2D", "CrossAttnUpBlock2D", "UpBlock2D",
            ),
            cross_attention_dim=2048,
            num_attention_heads=(5, 10, 20),
            transformer_layers_per_block=(1, 2, 10),
            use_linear_projection=True,
            addition_embed_type="text_time",
            projection_class_embeddings_input_dim=2816,  # 1280 + 256*6
        ),
        clip=CLIPTextConfig(
            hidden_size=768, intermediate_size=3072, num_layers=12,
            num_heads=12, hidden_act="quick_gelu", penultimate_hidden=True,
        ),
        clip2=CLIPTextConfig(
            hidden_size=1280, intermediate_size=5120, num_layers=32,
            num_heads=20, hidden_act="gelu", penultimate_hidden=True,
            use_text_projection=True,
        ),
        height=1024,
        width=1024,
    )


def tiny_sdxl() -> SDConfig:
    """Miniature SDXL-class config (per-level transformer depth + text_time
    additional conditioning) for CPU tests."""
    return SDConfig(
        key="tiny-sdxl",
        unet=UNetConfig(
            block_out_channels=(32, 64),
            down_block_types=("DownBlock2D", "CrossAttnDownBlock2D"),
            up_block_types=("CrossAttnUpBlock2D", "UpBlock2D"),
            layers_per_block=1,
            cross_attention_dim=32,
            num_attention_heads=(2, 2),
            transformer_layers_per_block=(1, 2),
            norm_num_groups=8,
            use_linear_projection=True,
            addition_embed_type="text_time",
            addition_time_embed_dim=8,
            projection_class_embeddings_input_dim=32 + 8 * 5,
        ),
        clip=CLIPTextConfig(
            vocab_size=1024, hidden_size=32, intermediate_size=64,
            num_layers=2, num_heads=2, penultimate_hidden=True,
            use_text_projection=True,
        ),
        vae=VAEConfig(block_out_channels=(16, 32), layers_per_block=1,
                      norm_num_groups=8),
        height=32,
        width=32,
        dtype="float32",
    )


def tiny_sdxl_base() -> SDConfig:
    """Miniature SDXL-BASE-class config: DUAL text towers whose concatenated
    penultimate states form the UNet context, pooled from the second tower's
    projection — the full SDXL-base conditioning topology at CPU-test size."""
    return SDConfig(
        key="tiny-sdxl-base",
        unet=UNetConfig(
            block_out_channels=(32, 64),
            down_block_types=("DownBlock2D", "CrossAttnDownBlock2D"),
            up_block_types=("CrossAttnUpBlock2D", "UpBlock2D"),
            layers_per_block=1,
            cross_attention_dim=48,  # 16 (clip) + 32 (clip2)
            num_attention_heads=(2, 2),
            transformer_layers_per_block=(1, 2),
            norm_num_groups=8,
            use_linear_projection=True,
            addition_embed_type="text_time",
            addition_time_embed_dim=8,
            projection_class_embeddings_input_dim=32 + 8 * 6,
        ),
        clip=CLIPTextConfig(
            vocab_size=1024, hidden_size=16, intermediate_size=32,
            num_layers=2, num_heads=2, penultimate_hidden=True,
        ),
        clip2=CLIPTextConfig(
            vocab_size=1024, hidden_size=32, intermediate_size=64,
            num_layers=2, num_heads=2, hidden_act="gelu",
            penultimate_hidden=True, use_text_projection=True,
        ),
        vae=VAEConfig(block_out_channels=(16, 32), layers_per_block=1,
                      norm_num_groups=8),
        height=32,
        width=32,
        dtype="float32",
    )


def tiny_test() -> SDConfig:
    """A miniature config for fast CPU tests: same topology class as SD1.5
    (cross-attn down/up blocks, mid block, GLIGEN-capable) at toy width."""
    return SDConfig(
        key="tiny-test",
        unet=UNetConfig(
            block_out_channels=(32, 64),
            down_block_types=("CrossAttnDownBlock2D", "DownBlock2D"),
            up_block_types=("UpBlock2D", "CrossAttnUpBlock2D"),
            layers_per_block=1,
            cross_attention_dim=32,
            num_attention_heads=(2, 2),
            norm_num_groups=8,
            use_gligen=True,
            gligen_max_objs=8,
        ),
        clip=CLIPTextConfig(
            vocab_size=1024, hidden_size=32, intermediate_size=64,
            num_layers=2, num_heads=2,
        ),
        vae=VAEConfig(block_out_channels=(16, 32), layers_per_block=1, norm_num_groups=8),
        height=32,
        width=32,
        dtype="float32",
    )


SD_CONFIGS = {
    "runwayml/stable-diffusion-v1-5": sd15,
    "gligen/diffusers-generation-text-box": sd14_gligen,
    "stabilityai/stable-diffusion-2-1-base": sd21_base,
    "stabilityai/stable-diffusion-xl-refiner-1.0": sdxl_refiner,
    "stabilityai/stable-diffusion-xl-base-1.0": sdxl_base,
    "tiny-test": tiny_test,
    "tiny-sdxl": tiny_sdxl,
    "tiny-sdxl-base": tiny_sdxl_base,
}
