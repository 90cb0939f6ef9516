"""Manifest-driven conversion tests: the provable weight contract.

tests/test_convert.py checks converter round trips on the *tiny* config with
the test's own inverse rules — circular by construction. These tests break
the circle: the checked-in manifests (lmdx/runtime/manifests/*.json) record
the real checkpoints' torch state-dict keys/shapes, machine-derived
independently of the converter (see scripts/make_manifests.py provenance
notes). Each test

  1. builds a synthetic state dict exactly from the manifest,
  2. runs the real converter at the real model size,
  3. requires the converted tree to match the Flax module's parameter
     structure+shapes exactly (via jax.eval_shape — no compute), and
  4. requires every manifest key to be consumed (minus an explicit
     allowlist of intentionally unused tensors).

A wrong assumed key name (e.g. GLIGEN `fuser.*`, VAE attention era,
`position_net` layout) now fails here instead of on the real file.
"""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lmdx import config as cfglib
from lmdx.runtime import convert
from lmdx.runtime.models import build_modules
from lmdx.text import tokens as toklib

MANIFEST_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "lmdx", "runtime", "manifests")


class TrackingDict(dict):
    """State dict that records which keys the converter consumed."""

    def __init__(self, manifest):
        super().__init__(
            {k: np.zeros(shape, np.float32) for k, shape in manifest.items()})
        self.accessed = set()

    def __getitem__(self, key):
        self.accessed.add(key)
        return super().__getitem__(key)

    def __contains__(self, key):
        # membership probes don't count as consumption
        return super().__contains__(key)


def load_manifest(name):
    return json.load(open(os.path.join(MANIFEST_DIR, f"{name}.json")))


def assert_tree_matches(converted, expected, component):
    got = {p: tuple(np.shape(v))
           for p, v in _flatten(converted).items()}
    want = {p: tuple(v.shape) for p, v in _flatten(expected).items()}
    missing = sorted(set(want) - set(got))
    extra = sorted(set(got) - set(want))
    assert not missing and not extra, (
        f"{component}: tree mismatch\n missing: {missing[:8]}\n extra: {extra[:8]}")
    bad = [p for p in want if got[p] != want[p]]
    assert not bad, (
        f"{component}: shape mismatch at {bad[:8]}: "
        f"{[(got[p], want[p]) for p in bad[:4]]}")


def _flatten(tree, prefix=""):
    out = {}
    for k, v in tree.items():
        path = f"{prefix}/{k}" if prefix else k
        if isinstance(v, dict):
            out.update(_flatten(v, path))
        else:
            out[path] = v
    return out


def assert_fully_consumed(sd: TrackingDict, allow_unused=(), component=""):
    unused = {k for k in sd if k not in sd.accessed}
    unused -= {k for k in unused if any(k.startswith(p) for p in allow_unused)}
    assert not unused, (
        f"{component}: {len(unused)} manifest tensors never consumed, "
        f"e.g. {sorted(unused)[:8]}")


# ---- SD UNet / text / VAE ---------------------------------------------------

def _unet_eval_shapes(config):
    unet, _, _, position_net = build_modules(config)
    h, w = config.latent_height, config.latent_width
    d = config.unet.cross_attention_dim
    objs = (jnp.zeros((1, config.unet.gligen_max_objs, d))
            if config.unet.use_gligen else None)
    added = {}
    if config.unet.addition_embed_type == "text_time":
        num_ids = (config.unet.projection_class_embeddings_input_dim
                   - config.pooled_dim) // config.unet.addition_time_embed_dim
        added = {"added_text_embeds": jnp.zeros((1, config.pooled_dim)),
                 "added_time_ids": jnp.zeros((1, num_ids))}
    shapes = jax.eval_shape(
        unet.init, jax.random.key(0), jnp.zeros((1, h, w, 4)),
        jnp.zeros((1,), jnp.int32), jnp.zeros((1, toklib.MAX_LENGTH, d)),
        objs=objs, **added)["params"]
    pn_shapes = None
    if position_net is not None:
        pn_shapes = jax.eval_shape(
            position_net.init, jax.random.key(0),
            jnp.zeros((1, config.unet.gligen_max_objs, 4)),
            jnp.zeros((1, config.unet.gligen_max_objs)),
            jnp.zeros((1, config.unet.gligen_max_objs,
                       config.clip.hidden_size)))["params"]
    return shapes, pn_shapes


@pytest.mark.parametrize("model_key,manifest_name", [
    ("runwayml/stable-diffusion-v1-5", "unet_sd15"),
    ("gligen/diffusers-generation-text-box", "unet_gligen"),
    # --use-sdv2 base model (reference generate.py:113).
    ("stabilityai/stable-diffusion-2-1-base", "unet_sd21"),
    # SDXL base + refiner (reference generation/sdxl_refinement.py:10-20).
    ("stabilityai/stable-diffusion-xl-base-1.0", "unet_sdxl_base"),
    ("stabilityai/stable-diffusion-xl-refiner-1.0", "unet_sdxl_refiner"),
])
def test_unet_manifest(model_key, manifest_name):
    config = cfglib.SD_CONFIGS[model_key]()
    sd = TrackingDict(load_manifest(manifest_name))
    converted = convert.convert_unet(sd, config)
    expected, pn_expected = _unet_eval_shapes(config)
    assert_tree_matches(converted, expected, f"unet[{model_key}]")
    if config.unet.use_gligen:
        pn = convert.convert_position_net(sd)
        assert pn is not None
        assert_tree_matches(pn, pn_expected, "position_net")
    assert_fully_consumed(sd, component=manifest_name)


def test_text_encoder_manifest():
    config = cfglib.SD_CONFIGS["runwayml/stable-diffusion-v1-5"]()
    sd = TrackingDict(load_manifest("text_encoder_clip_vit_l"))
    converted = convert.convert_text_encoder(sd, config)
    _, text_encoder, _, _ = build_modules(config)
    expected = jax.eval_shape(
        text_encoder.init, jax.random.key(0),
        jnp.zeros((1, toklib.MAX_LENGTH), jnp.int32))["params"]
    assert_tree_matches(converted, expected, "text_encoder")
    assert_fully_consumed(sd, component="text_encoder_clip_vit_l")


def test_text_encoder_vit_h_manifest():
    """SD2.1's OpenCLIP ViT-H text encoder (as transformers exports it: 23
    layers, gelu) converts fully from the manifest (reference generate.py:113
    selects stabilityai/stable-diffusion-2-1-base for --sdv2)."""
    config = cfglib.SD_CONFIGS["stabilityai/stable-diffusion-2-1-base"]()
    sd = TrackingDict(load_manifest("text_encoder_clip_vit_h"))
    converted = convert.convert_text_encoder(sd, config)
    _, text_encoder, _, _ = build_modules(config)
    expected = jax.eval_shape(
        text_encoder.init, jax.random.key(0),
        jnp.zeros((1, toklib.MAX_LENGTH), jnp.int32))["params"]
    assert_tree_matches(converted, expected, "text_encoder_vit_h")
    assert_fully_consumed(sd, component="text_encoder_clip_vit_h")


def _vae_era_to_modern(manifest):
    """Rewrite the legacy attention keys to the post-0.20 diffusers era."""
    renames = {"query": "to_q", "key": "to_k", "value": "to_v",
               "proj_attn": "to_out.0"}
    out = {}
    for k, shape in manifest.items():
        for old, new in renames.items():
            marker = f".attentions.0.{old}."
            if marker in k:
                k = k.replace(marker, f".attentions.0.{new}.")
                break
        out[k] = shape
    return out


@pytest.mark.parametrize("era", ["legacy", "modern"])
def test_vae_manifest(era):
    config = cfglib.SD_CONFIGS["runwayml/stable-diffusion-v1-5"]()
    manifest = load_manifest("vae_sd")
    if era == "modern":
        manifest = _vae_era_to_modern(manifest)
    sd = TrackingDict(manifest)
    converted = convert.convert_vae(sd, config)
    _, _, vae, _ = build_modules(config)
    expected = jax.eval_shape(
        vae.init, jax.random.key(0), jnp.zeros((1, 64, 64, 3)))["params"]
    assert_tree_matches(converted, expected, f"vae[{era}]")
    assert_fully_consumed(sd, component="vae_sd")


# ---- SAM / OWL-ViT ----------------------------------------------------------

def test_sam_manifest():
    from lmdx.nn import sam as samlib

    config = samlib.sam_vit_base()
    sd = TrackingDict(load_manifest("sam_vit_base"))
    converted = samlib.convert_sam(sd, config)
    model = samlib.Sam(config)
    expected = jax.eval_shape(
        model.init, jax.random.key(0),
        jnp.zeros((1, config.image_size, config.image_size, 3)),
        jnp.zeros((1, 1, 2)), jnp.zeros((1, 1), jnp.int32))["params"]
    assert_tree_matches(converted, expected, "sam")
    assert_fully_consumed(
        sd,
        allow_unused=(
            # mask-prompt path: lmdx prompts SAM with points/boxes only
            # (reference models/sam.py:125-213 does the same).
            "prompt_encoder.mask_embed.",
            # duplicate of prompt_encoder.shared_embedding in the checkpoint.
            "shared_image_embedding.",
        ),
        component="sam_vit_base")


def test_owlvit_manifest():
    from lmdx.eval import owl_vit as eval_owl  # noqa: F401 (import check)
    from lmdx.nn import owlvit as owlvit_lib

    config = owlvit_lib.owlvit_base_patch32()
    sd = TrackingDict(load_manifest("owlvit_base_patch32"))
    converted = owlvit_lib.convert_owlvit(sd, config)
    model = owlvit_lib.OwlViT(config)
    expected = jax.eval_shape(
        model.init, jax.random.key(0),
        jnp.zeros((1, config.image_size, config.image_size, 3)),
        jnp.zeros((2, config.text.max_length), jnp.int32))["params"]
    assert_tree_matches(converted, expected, "owlvit")
    assert_fully_consumed(
        sd,
        allow_unused=(
            # logit_scale: OwlViT eval uses the detection head's per-query
            # logit_shift/scale, not CLIP's global contrastive temperature.
            "owlvit.logit_scale",
            # visual_projection belongs to the contrastive OwlViTModel; the
            # detection image path is vision_model + merge layer_norm only
            # (transformers OwlViTForObjectDetection.image_embedder).
            "owlvit.visual_projection.",
        ),
        component="owlvit_base_patch32")


def test_validate_checkpoint_diff_logic(monkeypatch, tmp_path):
    """validate_checkpoint flags missing/extra/shape-mismatched tensors and
    accepts the modern VAE attention era via rename."""
    model_key = "runwayml/stable-diffusion-v1-5"

    def fake_load(component_dir):
        component = os.path.basename(component_dir)
        name = {"unet": "unet_sd15", "text_encoder": "text_encoder_clip_vit_l",
                "vae": "vae_sd"}[component]
        manifest = load_manifest(name)
        if component == "vae":
            manifest = _vae_era_to_modern(manifest)
        sd = {k: np.zeros(s, np.float32) for k, s in manifest.items()}
        if component == "unet":
            del sd["conv_out.bias"]                       # missing
            sd["unexpected.weight"] = np.zeros((1,))      # extra
            sd["conv_in.bias"] = np.zeros((7,))           # shape
        return sd

    monkeypatch.setattr(convert, "_load_state_dict", fake_load)
    report = convert.validate_checkpoint(model_key, str(tmp_path))
    assert report["unet"]["missing"] == ["conv_out.bias"]
    assert report["unet"]["extra"] == ["unexpected.weight"]
    assert report["unet"]["shape"] == ["conv_in.bias"]
    assert report["vae"] == {"missing": [], "extra": [], "shape": []}
    assert report["text_encoder"] == {"missing": [], "extra": [], "shape": []}


def test_text_encoder_bigg_manifest():
    """SDXL text_encoder_2 (OpenCLIP bigG with projection) converts from the
    transformers-derived manifest onto the second-tower Flax module."""
    from lmdx.runtime.models import build_text_encoder_2

    config = cfglib.sdxl_base()
    sd = TrackingDict(load_manifest("text_encoder_clip_bigg"))
    converted = convert.convert_text_encoder(sd, config, clip_cfg=config.clip2)
    tower2 = build_text_encoder_2(config)
    expected = jax.eval_shape(
        tower2.init, jax.random.key(0),
        jnp.zeros((1, toklib.MAX_LENGTH), jnp.int32))["params"]
    assert_tree_matches(converted, expected, "text_encoder_2")
    assert_fully_consumed(sd, component="text_encoder_clip_bigg")
