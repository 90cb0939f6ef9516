"""Generate key/shape manifests for the real checkpoints lmdx converts.

The manifests (lmdx/runtime/manifests/*.json) are the ground-truth weight
contract: {torch_state_dict_key: shape_list} for each checkpoint component
the reference pipeline loads (reference models/models.py:41-53 component
layout, scripts/owl_vit_eval.py:39-41, models/sam.py:13-21). Conversion
tests build synthetic state dicts FROM these manifests and require
runtime/convert.py to consume every key — killing the circular
"test-uses-the-converter's-own-inverse" problem.

Provenance of each manifest (no network in this environment):
- unet_sd15 / unet_gligen: state_dict() of the reference's vendored
  diffusers-0.18 UNet fork (/root/reference/models/unet_2d_condition.py),
  instantiated with the published config.json values via the structural
  shim in scripts/_diffusers_shim. The vendored module tree is the exact
  class the reference loads those checkpoints into, so its state-dict
  layout is authoritative.
- text_encoder_clip_vit_l: state_dict() of transformers.CLIPTextModel with
  the openai/clip-vit-large-patch14 config (the SD1.x text encoder).
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


def unet_manifest(use_gated_attention: bool):
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
            **SD1X_UNET_KWARGS, use_gated_attention=use_gated_attention)
    return _shapes(model.state_dict())


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


def main():
    os.makedirs(OUT_DIR, exist_ok=True)
    manifests = {
        "unet_sd15": lambda: unet_manifest(use_gated_attention=False),
        "unet_gligen": lambda: unet_manifest(use_gated_attention=True),
        "text_encoder_clip_vit_l": text_encoder_manifest,
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
