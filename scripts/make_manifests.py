"""Generate key/shape manifests for the real checkpoints lmdx converts.

The manifests (lmdx/runtime/manifests/*.json) are the ground-truth weight
contract: {torch_state_dict_key: shape_list} for each checkpoint component
the reference pipeline loads (reference models/models.py:41-53 component
layout, scripts/owl_vit_eval.py:39-41, models/sam.py:13-21). Conversion
tests build synthetic state dicts FROM these manifests and require
runtime/convert.py to consume every key — killing the circular
"test-uses-the-converter's-own-inverse" problem.

Provenance of each manifest (no network in this environment):
- unet_sd15 / unet_gligen / unet_sd21: state_dict() of the reference's
  vendored diffusers-0.18 UNet fork (/root/reference/models/unet_2d_condition.py),
  instantiated with the published config.json values via the structural
  shim in scripts/_diffusers_shim. The vendored module tree is the exact
  class the reference loads those checkpoints into (generate.py:104-115
  selects stabilityai/stable-diffusion-2-1-base for --sdv2), so its
  state-dict layout is authoritative.
- unet_sdxl_base / unet_sdxl_refiner: authored programmatically below from
  the published unet/config.json values (the 0.18 fork predates SDXL's
  transformer_layers_per_block lists and "text_time" conditioning). The
  generator is validated in main() by reproducing the fork-derived
  unet_sd15 and unet_sd21 manifests byte-for-byte on their configs.
- text_encoder_clip_vit_l: state_dict() of transformers.CLIPTextModel with
  the openai/clip-vit-large-patch14 config (the SD1.x text encoder; also
  SDXL-base's first tower).
- text_encoder_clip_vit_h: state_dict() of transformers.CLIPTextModel with
  the stabilityai/stable-diffusion-2-1-base text_encoder config (OpenCLIP
  ViT-H as transformers converts it: 23 exported layers, gelu).
- sam_vit_base: state_dict() of transformers.SamModel (default config ==
  facebook/sam-vit-base).
- owlvit_base_patch32: state_dict() of transformers.OwlViTForObjectDetection
  (default config == google/owlvit-base-patch32).
- vae_sd: authored programmatically below from the diffusers AutoencoderKL
  layout (kl-f8, block_out 128/256/512/512). Attention keys use the legacy
  era (query/key/value/proj_attn) that diffusers<=0.19 wrote — the era the
  reference's pinned diffusers==0.18 checkpoints carry on disk; convert.py
  also accepts the post-0.20 to_q/to_k/to_v/to_out.0 era (tested both ways).

Run from the repo root:  python scripts/make_manifests.py
"""

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT_DIR = os.path.join(REPO, "lmdx", "runtime", "manifests")

# SD1.x UNet config (runwayml/stable-diffusion-v1-5/unet/config.json ==
# CompVis/stable-diffusion-v1-4 values; GLIGEN's checkpoint adds
# use_gated_attention).
SD1X_UNET_KWARGS = dict(
    sample_size=64,
    in_channels=4,
    out_channels=4,
    down_block_types=("CrossAttnDownBlock2D", "CrossAttnDownBlock2D",
                      "CrossAttnDownBlock2D", "DownBlock2D"),
    up_block_types=("UpBlock2D", "CrossAttnUpBlock2D", "CrossAttnUpBlock2D",
                    "CrossAttnUpBlock2D"),
    block_out_channels=(320, 640, 1280, 1280),
    layers_per_block=2,
    cross_attention_dim=768,
    attention_head_dim=8,
)

# stabilityai/stable-diffusion-2-1-base unet/config.json values accepted by
# the 0.18 fork (per-level head counts, linear transformer projections).
SD21_UNET_KWARGS = dict(
    SD1X_UNET_KWARGS,
    cross_attention_dim=1024,
    attention_head_dim=(5, 10, 20, 20),
    use_linear_projection=True,
)

# stabilityai/stable-diffusion-xl-base-1.0 unet/config.json (shape-relevant
# subset; attention_head_dim [5,10,20] does not affect tensor shapes).
SDXL_BASE_UNET_KWARGS = dict(
    in_channels=4,
    out_channels=4,
    down_block_types=("DownBlock2D", "CrossAttnDownBlock2D",
                      "CrossAttnDownBlock2D"),
    up_block_types=("CrossAttnUpBlock2D", "CrossAttnUpBlock2D", "UpBlock2D"),
    block_out_channels=(320, 640, 1280),
    layers_per_block=2,
    cross_attention_dim=2048,
    transformer_layers_per_block=(1, 2, 10),
    use_linear_projection=True,
    addition_embed_type="text_time",
    projection_class_embeddings_input_dim=2816,  # 1280 pooled + 256*6 ids
)

# stabilityai/stable-diffusion-xl-refiner-1.0 unet/config.json.
SDXL_REFINER_UNET_KWARGS = dict(
    in_channels=4,
    out_channels=4,
    down_block_types=("DownBlock2D", "CrossAttnDownBlock2D",
                      "CrossAttnDownBlock2D", "DownBlock2D"),
    up_block_types=("UpBlock2D", "CrossAttnUpBlock2D", "CrossAttnUpBlock2D",
                    "UpBlock2D"),
    block_out_channels=(384, 768, 1536, 1536),
    layers_per_block=2,
    cross_attention_dim=1280,
    transformer_layers_per_block=4,
    use_linear_projection=True,
    addition_embed_type="text_time",
    projection_class_embeddings_input_dim=2560,  # 1280 pooled + 256*5 ids
)

# openai/clip-vit-large-patch14 text config (SD1.x text encoder).
CLIP_VIT_L_TEXT = dict(
    vocab_size=49408,
    hidden_size=768,
    intermediate_size=3072,
    num_hidden_layers=12,
    num_attention_heads=12,
    max_position_embeddings=77,
    hidden_act="quick_gelu",
    projection_dim=768,
)

# Stable Diffusion VAE (kl-f8) config.
SD_VAE = dict(
    block_out_channels=(128, 256, 512, 512),
    layers_per_block=2,
    latent_channels=4,
    norm_num_groups=32,
)


def _shapes(state_dict):
    return {k: list(v.shape) for k, v in sorted(state_dict.items())}


def unet_manifest(use_gated_attention: bool, kwargs=None):
    sys.path.insert(0, os.path.join(REPO, "scripts", "_diffusers_shim"))
    import importlib
    import types

    # Synthetic package over /root/reference/models so the vendored modules'
    # relative imports resolve WITHOUT executing the reference __init__
    # (which pulls utils/ and a CUDA device global).
    if "refmodels" not in sys.modules:
        pkg = types.ModuleType("refmodels")
        pkg.__path__ = ["/root/reference/models"]
        sys.modules["refmodels"] = pkg
    unet_mod = importlib.import_module("refmodels.unet_2d_condition")

    import torch

    with torch.device("meta"):
        model = unet_mod.UNet2DConditionModel(
            **(kwargs or SD1X_UNET_KWARGS),
            use_gated_attention=use_gated_attention)
    return _shapes(model.state_dict())


def sd_unet_manifest(kw):
    """diffusers UNet2DConditionModel key/shape layout, authored from config.

    Covers the SDXL extensions the 0.18 fork lacks (per-level transformer
    depth, "text_time" add_embedding); validated in main() against the
    fork-derived manifests on the SD1.5 and SD2.1 configs."""
    ch = kw["block_out_channels"]
    lpb = kw["layers_per_block"]
    ctx = kw["cross_attention_dim"]
    ted = 4 * ch[0]
    levels = len(ch)
    linear_proj = kw.get("use_linear_projection", False)
    tlpb = kw.get("transformer_layers_per_block", 1)
    out = {}

    def conv(key, o, i, k):
        out[f"{key}.weight"] = [o, i, k, k]
        out[f"{key}.bias"] = [o]

    def norm(key, c):
        out[f"{key}.weight"] = [c]
        out[f"{key}.bias"] = [c]

    def linear(key, o, i, bias=True):
        out[f"{key}.weight"] = [o, i]
        if bias:
            out[f"{key}.bias"] = [o]

    def resnet(key, cin, cout):
        norm(f"{key}.norm1", cin)
        conv(f"{key}.conv1", cout, cin, 3)
        linear(f"{key}.time_emb_proj", cout, ted)
        norm(f"{key}.norm2", cout)
        conv(f"{key}.conv2", cout, cout, 3)
        if cin != cout:
            conv(f"{key}.conv_shortcut", cout, cin, 1)

    def attn(key, c, kv):
        linear(f"{key}.to_q", c, c, bias=False)
        linear(f"{key}.to_k", c, kv, bias=False)
        linear(f"{key}.to_v", c, kv, bias=False)
        linear(f"{key}.to_out.0", c, c)

    def transformer2d(key, c, depth):
        norm(f"{key}.norm", c)
        if linear_proj:
            linear(f"{key}.proj_in", c, c)
            linear(f"{key}.proj_out", c, c)
        else:
            conv(f"{key}.proj_in", c, c, 1)
            conv(f"{key}.proj_out", c, c, 1)
        for k in range(depth):
            bk = f"{key}.transformer_blocks.{k}"
            norm(f"{bk}.norm1", c)
            attn(f"{bk}.attn1", c, c)
            norm(f"{bk}.norm2", c)
            attn(f"{bk}.attn2", c, ctx)
            norm(f"{bk}.norm3", c)
            linear(f"{bk}.ff.net.0.proj", 8 * c, c)
            linear(f"{bk}.ff.net.2", c, 4 * c)

    def depth_at(level):
        return tlpb if isinstance(tlpb, int) else tlpb[level]

    conv("conv_in", ch[0], kw["in_channels"], 3)
    linear("time_embedding.linear_1", ted, ch[0])
    linear("time_embedding.linear_2", ted, ted)
    if kw.get("addition_embed_type") == "text_time":
        linear("add_embedding.linear_1", ted,
               kw["projection_class_embeddings_input_dim"])
        linear("add_embedding.linear_2", ted, ted)

    for i, btype in enumerate(kw["down_block_types"]):
        cin = ch[i - 1] if i > 0 else ch[0]
        cout = ch[i]
        for j in range(lpb):
            resnet(f"down_blocks.{i}.resnets.{j}", cin if j == 0 else cout,
                   cout)
            if btype == "CrossAttnDownBlock2D":
                transformer2d(f"down_blocks.{i}.attentions.{j}", cout,
                              depth_at(i))
        if i < levels - 1:
            conv(f"down_blocks.{i}.downsamplers.0.conv", cout, cout, 3)

    resnet("mid_block.resnets.0", ch[-1], ch[-1])
    transformer2d("mid_block.attentions.0", ch[-1], depth_at(levels - 1))
    resnet("mid_block.resnets.1", ch[-1], ch[-1])

    rev = list(reversed(ch))
    for i, btype in enumerate(kw["up_block_types"]):
        cout = rev[i]
        prev_out = rev[i - 1] if i > 0 else rev[0]
        skip_in = rev[min(i + 1, levels - 1)]
        for j in range(lpb + 1):
            rin = prev_out if j == 0 else cout
            skip = skip_in if j == lpb else cout
            resnet(f"up_blocks.{i}.resnets.{j}", rin + skip, cout)
            if btype == "CrossAttnUpBlock2D":
                transformer2d(f"up_blocks.{i}.attentions.{j}", cout,
                              depth_at(levels - 1 - i))
        if i < levels - 1:
            conv(f"up_blocks.{i}.upsamplers.0.conv", cout, cout, 3)

    norm("conv_norm_out", ch[0])
    conv("conv_out", kw["out_channels"], ch[0], 3)
    return out


def text_encoder_manifest():
    import torch
    from transformers import CLIPTextConfig, CLIPTextModel

    with torch.device("meta"):
        model = CLIPTextModel(CLIPTextConfig(**CLIP_VIT_L_TEXT))
    sd = {k: v for k, v in model.state_dict().items()
          if "position_ids" not in k}
    return _shapes(sd)


# OpenCLIP ViT-bigG text tower as transformers converts it for SDXL's
# text_encoder_2 (CLIPTextModelWithProjection).
CLIP_BIGG_TEXT = dict(
    vocab_size=49408,
    hidden_size=1280,
    intermediate_size=5120,
    num_hidden_layers=32,
    num_attention_heads=20,
    max_position_embeddings=77,
    hidden_act="gelu",
    projection_dim=1280,
)


def text_encoder_bigg_manifest():
    import torch
    from transformers import CLIPTextConfig, CLIPTextModelWithProjection

    with torch.device("meta"):
        model = CLIPTextModelWithProjection(CLIPTextConfig(**CLIP_BIGG_TEXT))
    sd = {k: v for k, v in model.state_dict().items()
          if "position_ids" not in k}
    return _shapes(sd)


# stabilityai/stable-diffusion-2-1-base text_encoder/config.json — OpenCLIP
# ViT-H as transformers exports it for SD2.x: 23 layers kept (SD2 conditions
# on the penultimate hidden state, so the converted checkpoint drops the
# final block), gelu activation.
CLIP_VIT_H_TEXT = dict(
    vocab_size=49408,
    hidden_size=1024,
    intermediate_size=4096,
    num_hidden_layers=23,
    num_attention_heads=16,
    max_position_embeddings=77,
    hidden_act="gelu",
)


def text_encoder_vit_h_manifest():
    import torch
    from transformers import CLIPTextConfig, CLIPTextModel

    with torch.device("meta"):
        model = CLIPTextModel(CLIPTextConfig(**CLIP_VIT_H_TEXT))
    sd = {k: v for k, v in model.state_dict().items()
          if "position_ids" not in k}
    return _shapes(sd)


def sam_manifest():
    import torch
    from transformers import SamConfig, SamModel

    cfg = SamConfig()
    assert cfg.vision_config.hidden_size == 768, "default SamConfig drifted"
    with torch.device("meta"):
        model = SamModel(cfg)
    return _shapes(model.state_dict())


def owlvit_manifest():
    import torch
    from transformers import OwlViTConfig, OwlViTForObjectDetection

    cfg = OwlViTConfig()
    assert cfg.vision_config.patch_size == 32, "default OwlViTConfig drifted"
    with torch.device("meta"):
        model = OwlViTForObjectDetection(cfg)
    sd = {k: v for k, v in model.state_dict().items()
          if "position_ids" not in k}
    return _shapes(sd)


def vae_manifest():
    """diffusers AutoencoderKL (kl-f8) key/shape layout, legacy attn era."""
    ch = SD_VAE["block_out_channels"]
    lpb = SD_VAE["layers_per_block"]
    lat = SD_VAE["latent_channels"]
    out = {}

    def conv(key, o, i, k):
        out[f"{key}.weight"] = [o, i, k, k]
        out[f"{key}.bias"] = [o]

    def norm(key, c):
        out[f"{key}.weight"] = [c]
        out[f"{key}.bias"] = [c]

    def linear(key, o, i):
        out[f"{key}.weight"] = [o, i]
        out[f"{key}.bias"] = [o]

    def resnet(key, cin, cout):
        norm(f"{key}.norm1", cin)
        conv(f"{key}.conv1", cout, cin, 3)
        norm(f"{key}.norm2", cout)
        conv(f"{key}.conv2", cout, cout, 3)
        if cin != cout:
            conv(f"{key}.conv_shortcut", cout, cin, 1)

    def attention(key, c):
        norm(f"{key}.group_norm", c)
        linear(f"{key}.query", c, c)
        linear(f"{key}.key", c, c)
        linear(f"{key}.value", c, c)
        linear(f"{key}.proj_attn", c, c)

    def mid(key, c):
        resnet(f"{key}.resnets.0", c, c)
        attention(f"{key}.attentions.0", c)
        resnet(f"{key}.resnets.1", c, c)

    # encoder
    conv("encoder.conv_in", ch[0], 3, 3)
    cin = ch[0]
    for i, c in enumerate(ch):
        for j in range(lpb):
            resnet(f"encoder.down_blocks.{i}.resnets.{j}", cin if j == 0 else c, c)
        cin = c
        if i < len(ch) - 1:
            conv(f"encoder.down_blocks.{i}.downsamplers.0.conv", c, c, 3)
    mid("encoder.mid_block", ch[-1])
    norm("encoder.conv_norm_out", ch[-1])
    conv("encoder.conv_out", 2 * lat, ch[-1], 3)

    # decoder (reversed channels; lpb+1 resnets per level)
    rev = list(reversed(ch))
    conv("decoder.conv_in", rev[0], lat, 3)
    mid("decoder.mid_block", rev[0])
    cin = rev[0]
    for i, c in enumerate(rev):
        for j in range(lpb + 1):
            resnet(f"decoder.up_blocks.{i}.resnets.{j}", cin if j == 0 else c, c)
        cin = c
        if i < len(rev) - 1:
            conv(f"decoder.up_blocks.{i}.upsamplers.0.conv", c, c, 3)
    norm("decoder.conv_norm_out", rev[-1])
    conv("decoder.conv_out", 3, rev[-1], 3)

    conv("quant_conv", 2 * lat, 2 * lat, 1)
    conv("post_quant_conv", lat, lat, 1)
    return out


def validate_generator_against_fork():
    """The programmatic SDXL manifests can't come from the 0.18 fork (it
    predates SDXL), so prove the generator on the configs the fork DOES
    accept: it must reproduce the fork's state-dict layout byte-for-byte on
    SD1.5 and SD2.1 before its SDXL output is trusted."""
    for name, kw in (("sd15", SD1X_UNET_KWARGS), ("sd21", SD21_UNET_KWARGS)):
        fork = unet_manifest(use_gated_attention=False, kwargs=kw)
        ours = sd_unet_manifest(kw)
        missing = sorted(set(fork) - set(ours))
        extra = sorted(set(ours) - set(fork))
        wrong = {k: (fork[k], ours[k]) for k in fork
                 if k in ours and fork[k] != ours[k]}
        assert not (missing or extra or wrong), (
            f"sd_unet_manifest disagrees with the fork on {name}: "
            f"missing={missing[:5]} extra={extra[:5]} "
            f"wrong={dict(list(wrong.items())[:5])}")
        print(f"generator == fork state_dict on {name} "
              f"({len(fork)} tensors)")


def main():
    os.makedirs(OUT_DIR, exist_ok=True)
    validate_generator_against_fork()
    manifests = {
        "unet_sd15": lambda: unet_manifest(use_gated_attention=False),
        "unet_gligen": lambda: unet_manifest(use_gated_attention=True),
        "unet_sd21": lambda: unet_manifest(use_gated_attention=False,
                                           kwargs=SD21_UNET_KWARGS),
        "unet_sdxl_base": lambda: sd_unet_manifest(SDXL_BASE_UNET_KWARGS),
        "unet_sdxl_refiner": lambda: sd_unet_manifest(
            SDXL_REFINER_UNET_KWARGS),
        "text_encoder_clip_vit_l": text_encoder_manifest,
        "text_encoder_clip_vit_h": text_encoder_vit_h_manifest,
        "text_encoder_clip_bigg": text_encoder_bigg_manifest,
        "vae_sd": vae_manifest,
        "sam_vit_base": sam_manifest,
        "owlvit_base_patch32": owlvit_manifest,
    }
    for name, fn in manifests.items():
        shapes = fn()
        path = os.path.join(OUT_DIR, f"{name}.json")
        json.dump(shapes, open(path, "w"), indent=0, sort_keys=True)
        n_params = sum(
            int.__mul__(*(s + [1, 1])[:2]) if len(s) <= 2
            else s[0] * s[1] * s[2] * s[3]
            for s in shapes.values() if s
        )
        print(f"{name}: {len(shapes)} tensors (~{n_params/1e6:.1f}M params) -> {path}")


if __name__ == "__main__":
    main()
