"""Checkpoint-conversion round trip.

Exports the tiny model's Flax params to a synthetic diffusers-format torch
state dict (the inverse transposes), converts back with runtime.convert, and
checks (a) exact tree equality and (b) that the converted trees drive the
real modules. Catches name-mapping, transpose, and structure drift.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lmdx import config as cfglib
from lmdx.runtime import convert
from lmdx.runtime.models import build_modules, init_random_params


def _export(tree, rules, out, prefix=""):
    """Walk a flax param tree emitting diffusers-style keys via `rules`,
    a callable (flax_path) -> (torch_key, inverse_transform)."""
    for name, val in tree.items():
        path = f"{prefix}/{name}" if prefix else name
        if isinstance(val, dict):
            _export(val, rules, out, path)
        else:
            torch_key, inverse = rules(path)
            out[torch_key] = inverse(np.asarray(val))


def _unet_rules(path: str):
    parts = path.split("/")
    leaf = parts[-1]

    def to_torch_name(parts):
        mapped = []
        for p in parts[:-1]:
            p = (p.replace("down_blocks_", "down_blocks.")
                 .replace("up_blocks_", "up_blocks.")
                 .replace("attentions_", "attentions.")
                 .replace("resnets_", "resnets.")
                 .replace("blocks_", "transformer_blocks.")
                 .replace("linears_", "linears.")
                 .replace("net_0", "net.0").replace("net_2", "net.2")
                 .replace("downsample", "downsamplers.0")
                 .replace("upsample", "upsamplers.0"))
            if p in ("to_q", "to_k", "to_v"):
                mapped.append(p)
            elif p == "to_out":
                mapped.append("to_out.0")
            else:
                mapped.append(p)
        return ".".join(mapped)

    base = to_torch_name(parts)
    if leaf == "kernel":
        def inv(x):
            if x.ndim == 4:
                return x.transpose(3, 2, 0, 1)
            return x.transpose(1, 0)
        return f"{base}.weight", inv
    if leaf == "scale":
        return f"{base}.weight", lambda x: x
    if leaf == "bias":
        return f"{base}.bias", lambda x: x
    if leaf in ("alpha_attn", "alpha_dense"):
        return f"{base}.{leaf}" if base else leaf, lambda x: x.reshape(())
    if leaf in ("null_positive_feature", "null_position_feature"):
        return leaf, lambda x: x
    raise KeyError(path)


def _pn_rules(path: str):
    key, inv = _unet_rules(path)
    return f"position_net.{key}", inv


def _text_rules(path: str):
    parts = path.split("/")
    leaf = parts[-1]
    if parts[0] == "token_embedding":
        return "text_model.embeddings.token_embedding.weight", lambda x: x
    if parts[0] == "position_embedding":
        return "text_model.embeddings.position_embedding.weight", lambda x: x
    mapped = []
    for p in parts[:-1]:
        if p.startswith("layers_"):
            mapped.append(f"encoder.layers.{p.split('_')[-1]}")
        elif p in ("fc1", "fc2"):
            mapped.append(f"mlp.{p}")
        else:
            mapped.append(p)
    base = "text_model." + ".".join(mapped)
    if leaf == "kernel":
        return f"{base}.weight", lambda x: x.transpose(1, 0)
    if leaf == "scale":
        return f"{base}.weight", lambda x: x
    return f"{base}.bias", lambda x: x


def _vae_rules(path: str):
    parts = path.split("/")
    leaf = parts[-1]
    mapped = []
    for p in parts[:-1]:
        if p.startswith("down_") and "_resnets_" in p:
            i, j = p.split("_")[1], p.split("_")[3]
            mapped.append(f"down_blocks.{i}.resnets.{j}")
        elif p.startswith("down_") and p.endswith("_downsample"):
            mapped.append(f"down_blocks.{p.split('_')[1]}.downsamplers.0.conv")
        elif p.startswith("up_") and "_resnets_" in p:
            i, j = p.split("_")[1], p.split("_")[3]
            mapped.append(f"up_blocks.{i}.resnets.{j}")
        elif p.startswith("up_") and p.endswith("_upsample"):
            mapped.append(f"up_blocks.{p.split('_')[1]}.upsamplers.0.conv")
        elif p == "mid":
            mapped.append("mid_block")
        elif p.startswith("resnets_"):
            mapped.append(f"resnets.{p.split('_')[-1]}")
        elif p.startswith("attentions_"):
            mapped.append(f"attentions.{p.split('_')[-1]}")
        elif p == "to_out":
            mapped.append("to_out.0")
        else:
            mapped.append(p)
    base = ".".join(mapped)
    if leaf == "kernel":
        def inv(x):
            if x.ndim == 4:
                return x.transpose(3, 2, 0, 1)
            return x.transpose(1, 0)
        return f"{base}.weight", inv
    if leaf == "scale":
        return f"{base}.weight", lambda x: x
    return f"{base}.bias", lambda x: x


@pytest.fixture(scope="module")
def tiny_params():
    cfg = cfglib.tiny_test()
    return cfg, init_random_params(cfg, seed=3)


@pytest.mark.slow
def test_unet_roundtrip(tiny_params):
    cfg, params = tiny_params
    sd = {}
    _export(params["unet"], _unet_rules, sd)
    _export(params["position_net"], _pn_rules, sd)
    converted = convert.convert_unet(sd, cfg)
    jax.tree_util.tree_map(np.testing.assert_array_equal, params["unet"],
                           converted)
    pn = convert.convert_position_net(sd)
    jax.tree_util.tree_map(np.testing.assert_array_equal,
                           params["position_net"], pn)


@pytest.mark.slow
def test_text_roundtrip(tiny_params):
    cfg, params = tiny_params
    sd = {}
    _export(params["text"], _text_rules, sd)
    converted = convert.convert_text_encoder(sd, cfg)
    jax.tree_util.tree_map(np.testing.assert_array_equal, params["text"],
                           converted)


@pytest.mark.slow
def test_vae_roundtrip(tiny_params):
    cfg, params = tiny_params
    sd = {}
    _export(params["vae"], _vae_rules, sd)
    converted = convert.convert_vae(sd, cfg)
    jax.tree_util.tree_map(np.testing.assert_array_equal, params["vae"],
                           converted)


@pytest.mark.slow
def test_converted_params_drive_modules(tiny_params):
    cfg, params = tiny_params
    sd = {}
    _export(params["unet"], _unet_rules, sd)
    converted = convert.convert_unet(sd, cfg)
    unet, _, _, _ = build_modules(cfg)
    h = cfg.latent_height
    out = unet.apply(
        {"params": converted},
        jnp.zeros((1, h, h, 4)), jnp.zeros((1,), jnp.int32),
        jnp.zeros((1, 77, cfg.unet.cross_attention_dim)),
    )
    assert out.shape == (1, h, h, 4)


def test_word_tokenizer_guard_fires(tmp_path, monkeypatch):
    """Converted real-vocab weights + no tokenizer dir must hard-fail, not
    silently fall back to the hash-based WordTokenizer (runtime/models.py)."""
    from lmdx.runtime import models as runtime_models

    monkeypatch.delenv("LMDX_ALLOW_WORD_TOKENIZER", raising=False)
    ckpt = tmp_path / "sd15"
    ckpt.mkdir()
    with pytest.raises(ValueError, match="WordTokenizer"):
        runtime_models.load_bundle.__wrapped__(
            "runwayml/stable-diffusion-v1-5", checkpoint_dir=str(ckpt))
