"""HF/diffusers checkpoint -> lmdx parameter trees.

Maps diffusers-format Stable Diffusion weights (the layout the reference
loads with `from_pretrained`, models/models.py:41-53) onto the lmdx Flax
modules:

- torch conv (O, I, kh, kw) -> flax (kh, kw, I, O)
- torch linear (O, I)       -> flax (I, O)
- norm weight/bias          -> scale/bias
- diffusers attention `to_out.0` (Sequential linear+dropout) -> `to_out`
- GLIGEN fuser + PositionNet tensors map onto nn/unet.py's modules
- VAE mid attention accepts both naming eras (query/key/value/proj_attn and
  to_q/to_k/to_v/to_out.0)

Weight files may be .safetensors or torch .bin. Nothing here touches the
accelerator: tensors load as numpy and device placement happens lazily at
first apply.
"""

from __future__ import annotations

import os

import numpy as np

from ..config import SDConfig


def _load_state_dict(component_dir: str) -> dict[str, np.ndarray]:
    candidates = [
        "diffusion_pytorch_model.safetensors", "model.safetensors",
        "diffusion_pytorch_model.bin", "pytorch_model.bin",
        "pytorch_model.safetensors",
    ]
    for name in candidates:
        path = os.path.join(component_dir, name)
        if not os.path.exists(path):
            continue
        if name.endswith(".safetensors"):
            from safetensors import safe_open

            out = {}
            with safe_open(path, framework="np") as f:
                for key in f.keys():
                    out[key] = f.get_tensor(key)
            return out
        import torch

        sd = torch.load(path, map_location="cpu", weights_only=True)
        return {k: v.float().numpy() for k, v in sd.items()}
    raise FileNotFoundError(f"no weight file in {component_dir}")


def _conv(sd, key):
    return {"kernel": sd[f"{key}.weight"].transpose(2, 3, 1, 0),
            "bias": sd[f"{key}.bias"]}


def _linear(sd, key, bias=True):
    out = {"kernel": sd[f"{key}.weight"].transpose(1, 0)}
    if bias and f"{key}.bias" in sd:
        out["bias"] = sd[f"{key}.bias"]
    return out


def _norm(sd, key):
    return {"scale": sd[f"{key}.weight"], "bias": sd[f"{key}.bias"]}


def _attn(sd, key):
    """Cross/self attention; diffusers wraps the output linear as to_out.0."""
    return {
        "to_q": _linear(sd, f"{key}.to_q"),
        "to_k": _linear(sd, f"{key}.to_k"),
        "to_v": _linear(sd, f"{key}.to_v"),
        "to_out": _linear(sd, f"{key}.to_out.0"),
    }


def _ff(sd, key):
    return {
        "net_0": {"proj": _linear(sd, f"{key}.net.0.proj")},
        "net_2": _linear(sd, f"{key}.net.2"),
    }


def _resnet(sd, key):
    out = {
        "norm1": _norm(sd, f"{key}.norm1"),
        "conv1": _conv(sd, f"{key}.conv1"),
        "norm2": _norm(sd, f"{key}.norm2"),
        "conv2": _conv(sd, f"{key}.conv2"),
    }
    if f"{key}.time_emb_proj.weight" in sd:
        out["time_emb_proj"] = _linear(sd, f"{key}.time_emb_proj")
    if f"{key}.conv_shortcut.weight" in sd:
        out["conv_shortcut"] = _conv(sd, f"{key}.conv_shortcut")
    return out


def _transformer_block(sd, key, use_gligen: bool):
    out = {
        "norm1": _norm(sd, f"{key}.norm1"),
        "attn1": _attn(sd, f"{key}.attn1"),
        "norm2": _norm(sd, f"{key}.norm2"),
        "attn2": _attn(sd, f"{key}.attn2"),
        "norm3": _norm(sd, f"{key}.norm3"),
        "ff": _ff(sd, f"{key}.ff"),
    }
    if use_gligen and f"{key}.fuser.alpha_attn" in sd:
        out["fuser"] = {
            "alpha_attn": sd[f"{key}.fuser.alpha_attn"].reshape(()),
            "alpha_dense": sd[f"{key}.fuser.alpha_dense"].reshape(()),
            "linear": _linear(sd, f"{key}.fuser.linear"),
            "attn": _attn(sd, f"{key}.fuser.attn"),
            "ff": _ff(sd, f"{key}.fuser.ff"),
            "norm1": _norm(sd, f"{key}.fuser.norm1"),
            "norm2": _norm(sd, f"{key}.fuser.norm2"),
        }
    return out


def _transformer2d(sd, key, depth: int, use_linear_projection: bool,
                   use_gligen: bool):
    proj_in = (_linear(sd, f"{key}.proj_in") if use_linear_projection
               else _conv(sd, f"{key}.proj_in"))
    proj_out = (_linear(sd, f"{key}.proj_out") if use_linear_projection
                else _conv(sd, f"{key}.proj_out"))
    out = {"norm": _norm(sd, f"{key}.norm"), "proj_in": proj_in,
           "proj_out": proj_out}
    for k in range(depth):
        out[f"blocks_{k}"] = _transformer_block(
            sd, f"{key}.transformer_blocks.{k}", use_gligen)
    return out


def convert_unet(sd: dict, config: SDConfig) -> dict:
    ucfg = config.unet
    params = {
        "conv_in": _conv(sd, "conv_in"),
        "time_embedding": {
            "linear_1": _linear(sd, "time_embedding.linear_1"),
            "linear_2": _linear(sd, "time_embedding.linear_2"),
        },
        "conv_norm_out": _norm(sd, "conv_norm_out"),
        "conv_out": _conv(sd, "conv_out"),
    }
    if ucfg.addition_embed_type == "text_time":
        params["add_embedding"] = {
            "linear_1": _linear(sd, "add_embedding.linear_1"),
            "linear_2": _linear(sd, "add_embedding.linear_2"),
        }

    for i, block_type in enumerate(ucfg.down_block_types):
        block = {}
        for j in range(ucfg.layers_per_block):
            block[f"resnets_{j}"] = _resnet(sd, f"down_blocks.{i}.resnets.{j}")
            if block_type == "CrossAttnDownBlock2D":
                block[f"attentions_{j}"] = _transformer2d(
                    sd, f"down_blocks.{i}.attentions.{j}",
                    ucfg.transformer_depth(i),
                    ucfg.use_linear_projection, ucfg.use_gligen)
        if f"down_blocks.{i}.downsamplers.0.conv.weight" in sd:
            block["downsample"] = {"conv": _conv(
                sd, f"down_blocks.{i}.downsamplers.0.conv")}
        params[f"down_blocks_{i}"] = block

    params["mid_block"] = {
        "resnets_0": _resnet(sd, "mid_block.resnets.0"),
        "resnets_1": _resnet(sd, "mid_block.resnets.1"),
        "attentions_0": _transformer2d(
            sd, "mid_block.attentions.0",
            ucfg.transformer_depth(len(ucfg.block_out_channels) - 1),
            ucfg.use_linear_projection, ucfg.use_gligen),
    }

    for i, block_type in enumerate(ucfg.up_block_types):
        block = {}
        for j in range(ucfg.layers_per_block + 1):
            block[f"resnets_{j}"] = _resnet(sd, f"up_blocks.{i}.resnets.{j}")
            if block_type == "CrossAttnUpBlock2D":
                block[f"attentions_{j}"] = _transformer2d(
                    sd, f"up_blocks.{i}.attentions.{j}",
                    ucfg.transformer_depth(len(ucfg.block_out_channels) - 1 - i),
                    ucfg.use_linear_projection, ucfg.use_gligen)
        if f"up_blocks.{i}.upsamplers.0.conv.weight" in sd:
            block["upsample"] = {"conv": _conv(
                sd, f"up_blocks.{i}.upsamplers.0.conv")}
        params[f"up_blocks_{i}"] = block

    return params


def convert_position_net(sd: dict) -> dict | None:
    """GLIGEN PositionNet, stored under position_net.* in the UNet state dict
    (reference models/unet_2d_condition.py:63-114,571-572)."""
    if "position_net.null_positive_feature" not in sd:
        return None
    return {
        "null_positive_feature": sd["position_net.null_positive_feature"].reshape(-1),
        "null_position_feature": sd["position_net.null_position_feature"].reshape(-1),
        "linears_0": _linear(sd, "position_net.linears.0"),
        "linears_2": _linear(sd, "position_net.linears.2"),
        "linears_4": _linear(sd, "position_net.linears.4"),
    }


def convert_text_encoder(sd: dict, config: SDConfig, clip_cfg=None) -> dict:
    """Convert one CLIP text tower. clip_cfg selects the tower's config
    (defaults to config.clip; pass config.clip2 for SDXL-base's bigG)."""
    clip_cfg = clip_cfg or config.clip
    prefix = "text_model."
    if not any(k.startswith(prefix) for k in sd):
        prefix = ""
    params = {
        "token_embedding": {
            "embedding": sd[f"{prefix}embeddings.token_embedding.weight"]},
        "position_embedding": sd[f"{prefix}embeddings.position_embedding.weight"],
        "final_layer_norm": _norm(sd, f"{prefix}final_layer_norm"),
    }
    if clip_cfg.use_text_projection:
        # CLIPTextModelWithProjection stores it beside text_model.*
        params["text_projection"] = {
            "kernel": sd["text_projection.weight"].transpose(1, 0)}
    for i in range(clip_cfg.num_layers):
        lk = f"{prefix}encoder.layers.{i}"
        params[f"layers_{i}"] = {
            "layer_norm1": _norm(sd, f"{lk}.layer_norm1"),
            "layer_norm2": _norm(sd, f"{lk}.layer_norm2"),
            "self_attn": {
                "q_proj": _linear(sd, f"{lk}.self_attn.q_proj"),
                "k_proj": _linear(sd, f"{lk}.self_attn.k_proj"),
                "v_proj": _linear(sd, f"{lk}.self_attn.v_proj"),
                "out_proj": _linear(sd, f"{lk}.self_attn.out_proj"),
            },
            "fc1": _linear(sd, f"{lk}.mlp.fc1"),
            "fc2": _linear(sd, f"{lk}.mlp.fc2"),
        }
    return params


def _vae_attention(sd, key):
    """Both diffusers naming eras for the VAE mid attention."""
    if f"{key}.to_q.weight" in sd:
        names = ("to_q", "to_k", "to_v", "to_out.0")
    else:
        names = ("query", "key", "value", "proj_attn")
    q, k, v, o = (_linear(sd, f"{key}.{n}") for n in names)
    # 1x1-conv-style (O, I, 1, 1) weights appear in very old checkpoints.
    for d in (q, k, v, o):
        if d["kernel"].ndim == 4:
            d["kernel"] = d["kernel"][..., 0, 0].transpose(1, 0)
    return {"group_norm": _norm(sd, f"{key}.group_norm"),
            "to_q": q, "to_k": k, "to_v": v, "to_out": o}


def convert_vae(sd: dict, config: SDConfig) -> dict:
    vcfg = config.vae
    levels = len(vcfg.block_out_channels)

    encoder = {
        "conv_in": _conv(sd, "encoder.conv_in"),
        "conv_norm_out": _norm(sd, "encoder.conv_norm_out"),
        "conv_out": _conv(sd, "encoder.conv_out"),
        "mid": {
            "resnets_0": _resnet(sd, "encoder.mid_block.resnets.0"),
            "attentions_0": _vae_attention(sd, "encoder.mid_block.attentions.0"),
            "resnets_1": _resnet(sd, "encoder.mid_block.resnets.1"),
        },
    }
    for i in range(levels):
        for j in range(vcfg.layers_per_block):
            encoder[f"down_{i}_resnets_{j}"] = _resnet(
                sd, f"encoder.down_blocks.{i}.resnets.{j}")
        if f"encoder.down_blocks.{i}.downsamplers.0.conv.weight" in sd:
            encoder[f"down_{i}_downsample"] = _conv(
                sd, f"encoder.down_blocks.{i}.downsamplers.0.conv")

    decoder = {
        "conv_in": _conv(sd, "decoder.conv_in"),
        "conv_norm_out": _norm(sd, "decoder.conv_norm_out"),
        "conv_out": _conv(sd, "decoder.conv_out"),
        "mid": {
            "resnets_0": _resnet(sd, "decoder.mid_block.resnets.0"),
            "attentions_0": _vae_attention(sd, "decoder.mid_block.attentions.0"),
            "resnets_1": _resnet(sd, "decoder.mid_block.resnets.1"),
        },
    }
    for i in range(levels):
        for j in range(vcfg.layers_per_block + 1):
            decoder[f"up_{i}_resnets_{j}"] = _resnet(
                sd, f"decoder.up_blocks.{i}.resnets.{j}")
        if f"decoder.up_blocks.{i}.upsamplers.0.conv.weight" in sd:
            decoder[f"up_{i}_upsample"] = _conv(
                sd, f"decoder.up_blocks.{i}.upsamplers.0.conv")

    return {
        "encoder": encoder,
        "decoder": decoder,
        "quant_conv": _conv(sd, "quant_conv"),
        "post_quant_conv": _conv(sd, "post_quant_conv"),
    }


MANIFEST_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "manifests")

# checkpoint component -> manifest file, per SD model key.
_COMPONENT_MANIFESTS = {
    "runwayml/stable-diffusion-v1-5": {
        "unet": "unet_sd15", "text_encoder": "text_encoder_clip_vit_l",
        "vae": "vae_sd"},
    "CompVis/stable-diffusion-v1-4": {
        "unet": "unet_sd15", "text_encoder": "text_encoder_clip_vit_l",
        "vae": "vae_sd"},
    "gligen/diffusers-generation-text-box": {
        "unet": "unet_gligen", "text_encoder": "text_encoder_clip_vit_l",
        "vae": "vae_sd"},
    # --use-sdv2 base model (reference generate.py:113).
    "stabilityai/stable-diffusion-2-1-base": {
        "unet": "unet_sd21", "text_encoder": "text_encoder_clip_vit_h",
        "vae": "vae_sd"},
    # SDXL base: dual text towers (ViT-L + bigG-with-projection).
    "stabilityai/stable-diffusion-xl-base-1.0": {
        "unet": "unet_sdxl_base", "text_encoder": "text_encoder_clip_vit_l",
        "text_encoder_2": "text_encoder_clip_bigg", "vae": "vae_sd"},
    # SDXL refiner (reference generation/sdxl_refinement.py:10-20): single
    # bigG tower shipped as text_encoder_2/, no text_encoder/ at all.
    "stabilityai/stable-diffusion-xl-refiner-1.0": {
        "unet": "unet_sdxl_refiner",
        "text_encoder_2": "text_encoder_clip_bigg", "vae": "vae_sd"},
}

# Keys that may legitimately differ from the manifest: buffer tensors some
# transformers versions persist, and the two VAE attention naming eras.
_IGNORABLE_SUBSTRINGS = ("position_ids",)
_VAE_ERA_RENAMES = {"to_q": "query", "to_k": "key", "to_v": "value",
                    "to_out.0": "proj_attn"}


def validate_checkpoint(model_key: str, checkpoint_dir: str) -> dict:
    """Diff a checkpoint directory against the checked-in manifests.

    Returns {component: {"missing": [...], "extra": [...], "shape": [...]}}
    with empty lists on a clean match. The VAE check accepts both attention
    naming eras (pre/post diffusers 0.20)."""
    import json

    manifests = _COMPONENT_MANIFESTS.get(model_key)
    if manifests is None:
        raise KeyError(f"no manifests for model key {model_key!r}; known: "
                       f"{sorted(_COMPONENT_MANIFESTS)}")
    report = {}
    for component, manifest_name in manifests.items():
        manifest = json.load(
            open(os.path.join(MANIFEST_DIR, f"{manifest_name}.json")))
        sd = _load_state_dict(os.path.join(checkpoint_dir, component))
        actual = {}
        for k, v in sd.items():
            if any(s in k for s in _IGNORABLE_SUBSTRINGS):
                continue
            if component == "vae":
                for new, old in _VAE_ERA_RENAMES.items():
                    marker = f".attentions.0.{new}."
                    if marker in k:
                        k = k.replace(marker, f".attentions.0.{old}.")
                        break
                # modern-era to_q etc. store (C, C); legacy proj_attn may be
                # (C, C, 1, 1) — normalize for the shape compare
                v = v.reshape(v.shape[0], -1) if ".attentions.0." in k and v.ndim == 4 else v
            actual[k] = list(v.shape)
        want = {k: v for k, v in manifest.items()
                if not any(s in k for s in _IGNORABLE_SUBSTRINGS)}
        report[component] = {
            "missing": sorted(set(want) - set(actual)),
            "extra": sorted(set(actual) - set(want)),
            "shape": sorted(k for k in set(want) & set(actual)
                            if want[k] != actual[k]),
        }
    return report


def load_checkpoint(config: SDConfig, checkpoint_dir: str) -> dict:
    """Convert a diffusers checkpoint directory (unet/ vae/ text_encoder/)."""
    unet_sd = _load_state_dict(os.path.join(checkpoint_dir, "unet"))
    params = {
        "unet": convert_unet(unet_sd, config),
        "text": convert_text_encoder(
            _load_state_dict(
                os.path.join(checkpoint_dir, config.text_encoder_dir)),
            config),
        "vae": convert_vae(
            _load_state_dict(os.path.join(checkpoint_dir, "vae")), config),
    }
    if config.clip2 is not None:
        params["text2"] = convert_text_encoder(
            _load_state_dict(os.path.join(checkpoint_dir, "text_encoder_2")),
            config, clip_cfg=config.clip2)
    if config.unet.use_gligen:
        pn = convert_position_net(unet_sd)
        if pn is None:
            raise ValueError(
                f"{checkpoint_dir} has no GLIGEN position_net weights but "
                f"config.unet.use_gligen is set")
        params["position_net"] = pn
    return params
