"""METHOD-level numeric parity: the reference's own generation/lmd.py run()
vs lmdx.methods.lmd.run on identical tiny weights.

tests/test_pipeline_parity.py pins the sampler loops; tests/test_torch_parity
pins the modules; tests/test_method_goldens.py pins lmdx's orchestration
against itself. This test closes the last rung: the method ORCHESTRATION glue
runs against the reference implementation itself — spec conversion and box
sort order, box centering with floor padding, the per-box seed streams
(bit-exact under the torch noise backend), negative-prompt splicing, prompt
assembly, word/token index selection, per-box CA-guided generation (batched
in lmdx, sequential in the reference — any batching cross-talk fails here),
attention aggregation, masked composition with mass-center alignment, the
ref-CA shift by composition offsets, frozen-mask derivation, and the final
guided partial-frozen regeneration.

SAM and the VAE are stubbed IDENTICALLY on both sides (scripted per-box
masks; the linear latents->image decode of test_pipeline_parity._StubVAE):
their real implementations are pinned by tests/test_torch_parity.py and
tests/test_sam.py, and stubbing keeps this test deterministic about the glue
rather than about boundary pixels of a random-weight segmenter.

The reference modules import over the structural shims in
scripts/_diffusers_shim (diffusers/easydict/inflect/gradio); the hard-coded
SD-512 module constants (height/width/H/W, lmd.py:24-26; the SD1.x attention
keys, lmd.py:33,418) are rebound to the tiny topology the same way lmdx
derives them.
"""

from __future__ import annotations

import importlib
import json
import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

from tests.test_pipeline_parity import (  # noqa: E402
    _load_reference_pipelines,
    _StubVAE,
    _tiny_pair,
)

pytestmark = pytest.mark.slow

STEPS = 6
LAT = 16                      # tiny latent side (tiny_test: 32 // vae_scale 2)
HEIGHT = WIDTH = LAT * 8      # reference derives latents as height//8
KEYS = [("mid", 0, 0, 0), ("up", 1, 0, 0), ("up", 1, 1, 0)]
OBJ_KEY = ("down", 0, 0, 0)   # tiny-topology form of lmd.py:418's (down,2,1,0)

SPEC = {  # gen_boxes in the patched 128x128 pixel space
    "prompt": "A realistic scene with a red cube and a blue ball",
    "gen_boxes": [
        ("a red cube", (12, 72, 32, 32)),
        ("a blue ball", (72, 68, 26, 26)),
    ],
    "bg_prompt": "A realistic scene",
    "extra_neg_prompt": "smudged",
}

# Scripted per-box SAM masks, consumed by call order (box order is the
# name-sorted spec order on both sides). Different sizes on purpose: the
# composition pastes largest-first (utils/latents.py:56-58).
def _scripted_masks():
    m0 = np.zeros((LAT, LAT), bool)
    m0[8:15, 1:8] = True          # "a blue ball" (sorted first), 49 px
    m1 = np.zeros((LAT, LAT), bool)
    m1[9:16, 6:15] = True         # "a red cube", 63 px
    return [m0, m1]


def _mini_clip_vocab(dirpath):
    """Character-level CLIP vocab (every printable char bare and </w>-final,
    plus the specials) — tokenizes any ASCII prompt; shared verbatim by
    transformers.CLIPTokenizer and lmdx's ClipBpeTokenizer."""
    chars = [c for c in (chr(i) for i in range(32, 127)) if not c.isspace()]
    vocab_tokens = chars + [c + "</w>" for c in chars]
    vocab_tokens += ["<|startoftext|>", "<|endoftext|>"]
    vocab = {t: i for i, t in enumerate(dict.fromkeys(vocab_tokens))}
    os.makedirs(dirpath, exist_ok=True)
    with open(os.path.join(dirpath, "vocab.json"), "w") as f:
        json.dump(vocab, f)
    with open(os.path.join(dirpath, "merges.txt"), "w") as f:
        f.write("#version: 0.2\n")
    return vocab


def _build_clip_pair(vocab_dir, hidden_size=32, num_heads=2):
    """(hf tokenizer, torch CLIPTextModel, lmdx clip config, converted
    params) over the shared mini vocab. hidden_size=768 for the GLIGEN
    variant: the reference hard-codes 768-dim phrase/pooler embeddings
    (unet_2d_condition.py:572, pipelines.py:293)."""
    from transformers import CLIPTextConfig as TClipCfg
    from transformers import CLIPTextModel, CLIPTokenizer

    from lmdx.config import CLIPTextConfig
    from lmdx.runtime.convert import convert_text_encoder

    vocab = _mini_clip_vocab(vocab_dir)
    hf_tok = CLIPTokenizer(os.path.join(vocab_dir, "vocab.json"),
                           os.path.join(vocab_dir, "merges.txt"))
    hf_tok.model_max_length = 77

    fcfg = CLIPTextConfig(vocab_size=len(vocab), hidden_size=hidden_size,
                          intermediate_size=64, num_layers=2,
                          num_heads=num_heads, max_length=77)
    tcfg = TClipCfg(
        vocab_size=fcfg.vocab_size,
        hidden_size=fcfg.hidden_size,
        intermediate_size=fcfg.intermediate_size,
        num_hidden_layers=fcfg.num_layers,
        num_attention_heads=fcfg.num_heads,
        max_position_embeddings=fcfg.max_length,
        hidden_act="quick_gelu",
        eos_token_id=vocab["<|endoftext|>"],
        bos_token_id=vocab["<|startoftext|>"],
        pad_token_id=vocab["<|endoftext|>"],
    )
    torch.manual_seed(7)
    tm = CLIPTextModel(tcfg).eval()

    class _Cfg:
        clip = fcfg

    params = convert_text_encoder(
        {k: np.asarray(v) for k, v in tm.state_dict().items()}, _Cfg())
    return hf_tok, tm, fcfg, params


def _load_reference_method(name, model_dict):
    """Import generation/<name>.py with its import-order DI satisfied: the
    `models` package resolves to the already-loaded refmodels namespace, and
    model_dict is installed before the module binds its globals
    (lmd.py:12-19, lmd_plus.py:12-19)."""
    _load_reference_pipelines()
    pkg = sys.modules["refmodels"]
    sys.modules.setdefault("models", pkg)
    pkg.torch_device = "cpu"
    pkg.encode_prompts = sys.modules["refmodels.models"].encode_prompts
    for mod in ("parse", "attn", "vis"):
        importlib.import_module(f"utils.{mod}")
    refsam = importlib.import_module("refmodels.sam")
    pkg.sam = refsam
    pkg.model_dict = model_dict

    modname = f"generation.{name}"
    if modname in sys.modules:
        method = sys.modules[modname]
        method.model_dict = model_dict
        (method.vae, method.tokenizer, method.text_encoder, method.unet,
         method.scheduler, method.dtype) = (
            model_dict.vae, model_dict.tokenizer, model_dict.text_encoder,
            model_dict.unet, model_dict.scheduler, model_dict.dtype)
    else:
        method = importlib.import_module(modname)
    return method, refsam


class _ScriptedSegmenter:
    """lmdx masking.Segmenter returning the scripted mask for each call, in
    box order (matches the reference-side sam_refine_attn stub)."""

    needs_image = False

    def __init__(self, masks):
        self.masks = list(masks)
        self.i = 0

    def segment(self, image=None, input_points=None, input_boxes=None,
                target_hw=None):
        mask = self.masks[self.i]
        self.i += 1
        return mask[None].astype(bool), np.ones((1,), np.float32)


def _stub_decode_latents(bundle, latents, to_host=True):
    """lmdx-side twin of reference pipelines.decode over _StubVAE
    (pipelines.py:116-127 with vae.decode = z[:, :3])."""
    z = np.asarray(latents, np.float32) / 0.18215
    img = np.clip(z[..., :3] / 2.0 + 0.5, 0.0, 1.0)
    return np.round(img * 255.0).astype(np.uint8)


def test_lmd_method_matches_reference(tmp_path, monkeypatch):
    _load_reference_pipelines()  # puts the shim dir (easydict &c) on sys.path
    from easydict import EasyDict

    from lmdx import config as cfglib
    from lmdx import methods
    from lmdx.methods import _grounded, base
    from lmdx.nn.clip import CLIPTextEncoder
    from lmdx.runtime import models as rm
    from lmdx.text.tokens import ClipBpeTokenizer

    # ---- shared weights --------------------------------------------------
    t_unet, f_unet, unet_params, _, cfg = _tiny_pair(use_gligen=False)
    vocab_dir = str(tmp_path / "tok")
    hf_tok, t_text, clip_cfg, text_params = _build_clip_pair(vocab_dir)

    # ---- reference side ---------------------------------------------------
    from diffusers import DDIMScheduler

    model_dict = EasyDict(
        vae=_StubVAE(), tokenizer=hf_tok, text_encoder=t_text, unet=t_unet,
        scheduler=DDIMScheduler(), dtype=torch.float32)
    lmd_ref, refsam = _load_reference_method("lmd", model_dict)

    monkeypatch.setattr(lmd_ref, "height", HEIGHT)
    monkeypatch.setattr(lmd_ref, "width", WIDTH)
    monkeypatch.setattr(lmd_ref, "H", LAT)
    monkeypatch.setattr(lmd_ref, "W", LAT)
    monkeypatch.setattr(lmd_ref, "overall_guidance_attn_keys", KEYS)
    monkeypatch.setattr(lmd_ref, "attn_aggregation_step_start", 2)

    # run() hard-codes the SD1.x obj_attn_key (down,2,1,0) in its call to
    # get_masked_latents_all_list (lmd.py:418); rebind to the tiny key the
    # same way lmdx's default_obj_attn_key derives it.
    orig_gml = lmd_ref.get_masked_latents_all_list

    def _gml(*args, **kwargs):
        kwargs["obj_attn_key"] = OBJ_KEY
        return orig_gml(*args, **kwargs)

    monkeypatch.setattr(lmd_ref, "get_masked_latents_all_list", _gml)

    ref_calls = {"i": 0}
    masks = _scripted_masks()

    def _fake_sam_refine_attn(sam_input_image=None, token_attn_np=None,
                              model_dict=None, **kwargs):
        assert np.isfinite(np.asarray(token_attn_np)).all()
        mask = masks[ref_calls["i"]]
        ref_calls["i"] += 1
        return mask.copy(), 1.0

    monkeypatch.setattr(refsam, "sam_refine_attn", _fake_sam_refine_attn)

    # Short negatives: the char-level mini vocab turns the real default
    # negative prompts into >77 tokens; the default strings' byte parity is
    # pinned separately (text/template tests).
    t_out = lmd_ref.run(SPEC, bg_seed=31, fg_seed_start=100,
                        num_inference_steps=STEPS,
                        so_negative_prompt="ugly, blurry",
                        overall_negative_prompt="dull, noisy")
    t_image = np.asarray(t_out.image)
    assert ref_calls["i"] == 2

    # ---- lmdx side ----------------------------------------------------------
    import dataclasses

    bundle_cfg = dataclasses.replace(cfg, clip=clip_cfg)
    f_text = CLIPTextEncoder(clip_cfg)
    params = rm.init_random_params(bundle_cfg, seed=0)
    params = {**params, "unet": unet_params, "text": text_params}
    bundle = rm.ModelBundle(
        config=bundle_cfg,
        tokenizer=ClipBpeTokenizer.from_dir(vocab_dir),
        unet=f_unet, text_encoder=f_text,
        vae=rm.build_modules(bundle_cfg)[2],
        position_net=None, params=params)

    monkeypatch.setattr(_grounded, "BOX_SCALE", (WIDTH, HEIGHT))
    monkeypatch.setattr(base, "decode_latents", _stub_decode_latents)
    monkeypatch.setenv("LMDX_NOISE_BACKEND", "torch")

    f_out = methods.lmd.run(
        SPEC, bundle, segmenter=_ScriptedSegmenter(masks),
        bg_seed=31, fg_seed_start=100, num_inference_steps=STEPS,
        attn_aggregation_step_start=2,
        so_negative_prompt="ugly, blurry",
        overall_negative_prompt="dull, noisy")

    assert f_out.image.shape == t_image.shape == (LAT, LAT, 3)
    diff = np.abs(f_out.image.astype(np.int32) - t_image.astype(np.int32))
    assert diff.max() <= 1, (
        f"max pixel diff {diff.max()} at {np.unravel_index(diff.argmax(), diff.shape)}"
    )


def _gligen768_pair():
    """Torch vendored GLIGEN UNet + matching lmdx modules at
    cross_attention_dim=768 — the width the reference hard-codes for
    phrase/pooler embeddings (unet_2d_condition.py:572 PositionNet
    positive_len, pipelines.py:293 prepare buffer) — and gligen_max_objs=30
    (pipelines.py:289), so the fuser sees the same 30 grounding slots."""
    import dataclasses

    from lmdx import config as cfglib
    from lmdx.nn import unet as unet_lib
    from lmdx.runtime.convert import convert_position_net, convert_unet
    from tests.test_torch_parity import _load_vendored_unet_module, _to_np

    unet_mod = _load_vendored_unet_module()
    cfg = cfglib.tiny_test()
    ucfg = dataclasses.replace(cfg.unet, cross_attention_dim=768,
                               gligen_max_objs=30)
    cfg = dataclasses.replace(cfg, unet=ucfg)

    torch.manual_seed(3)
    tm = unet_mod.UNet2DConditionModel(
        sample_size=16,
        in_channels=4,
        out_channels=4,
        down_block_types=ucfg.down_block_types,
        up_block_types=ucfg.up_block_types,
        block_out_channels=ucfg.block_out_channels,
        layers_per_block=ucfg.layers_per_block,
        cross_attention_dim=768,
        attention_head_dim=ucfg.num_attention_heads[0],
        norm_num_groups=ucfg.norm_num_groups,
        use_gated_attention=True,
    ).eval()
    with torch.no_grad():
        for name, p in tm.named_parameters():
            if "alpha_attn" in name:
                p.fill_(0.6)
            elif "alpha_dense" in name:
                p.fill_(-0.3)
            elif ("null_positive_feature" in name
                  or "null_position_feature" in name):
                p.normal_(0.0, 0.5)
    sd = _to_np(tm.state_dict())
    params = convert_unet(sd, cfg)
    pn_params = convert_position_net(sd)
    fm = unet_lib.UNet2DCondition(ucfg)
    return tm, fm, params, pn_params, cfg


def test_lmd_plus_method_matches_reference(tmp_path, monkeypatch):
    """generation/lmd_plus.py run() vs lmdx.methods.lmd_plus.run: the GLIGEN
    flagship's glue — per-box grounding-condition assembly (one box in slot
    0 of 30), scheduled-sampling step counts for both passes, per-box
    guidance OFF (max_index_step=0) while capture stays on for ref-CA,
    box-prompted masks, horizontal-only handling, flattened overall
    boxes/phrases ordering, and the frozen overall GLIGEN regeneration."""
    _load_reference_pipelines()
    from easydict import EasyDict

    from lmdx import methods
    from lmdx.methods import _grounded, base
    from lmdx.nn.clip import CLIPTextEncoder
    from lmdx.runtime import models as rm
    from lmdx.text.tokens import ClipBpeTokenizer

    t_unet, f_unet, unet_params, pn_params, cfg = _gligen768_pair()
    vocab_dir = str(tmp_path / "tok")
    hf_tok, t_text, clip_cfg, text_params = _build_clip_pair(
        vocab_dir, hidden_size=768, num_heads=8)

    from diffusers import DDIMScheduler

    model_dict = EasyDict(
        vae=_StubVAE(), tokenizer=hf_tok, text_encoder=t_text, unet=t_unet,
        scheduler=DDIMScheduler(), dtype=torch.float32)
    lp_ref, refsam = _load_reference_method("lmd_plus", model_dict)

    monkeypatch.setattr(lp_ref, "height", HEIGHT)
    monkeypatch.setattr(lp_ref, "width", WIDTH)
    monkeypatch.setattr(lp_ref, "H", LAT)
    monkeypatch.setattr(lp_ref, "W", LAT)
    monkeypatch.setattr(lp_ref, "guidance_attn_keys", KEYS)

    orig_gml = lp_ref.get_masked_latents_all_list

    def _gml(*args, **kwargs):
        kwargs["obj_attn_key"] = OBJ_KEY
        return orig_gml(*args, **kwargs)

    monkeypatch.setattr(lp_ref, "get_masked_latents_all_list", _gml)

    ref_calls = {"i": 0}
    masks = _scripted_masks()

    def _fake_sam_refine_box(sam_input_image=None, box=None, model_dict=None,
                             **kwargs):
        assert 0.0 <= min(box) and max(box) <= 1.0
        mask = masks[ref_calls["i"]]
        ref_calls["i"] += 1
        return mask.copy(), 1.0

    monkeypatch.setattr(refsam, "sam_refine_box", _fake_sam_refine_box)

    t_out = lp_ref.run(SPEC, bg_seed=17, fg_seed_start=200,
                       num_inference_steps=STEPS,
                       so_negative_prompt="ugly, blurry",
                       overall_negative_prompt="dull, noisy")
    t_image = np.asarray(t_out.image)
    assert ref_calls["i"] == 2

    import dataclasses

    bundle_cfg = dataclasses.replace(cfg, clip=clip_cfg)
    params = rm.init_random_params(bundle_cfg, seed=0)
    params = {**params, "unet": unet_params, "text": text_params,
              "position_net": pn_params}
    _, _, f_vae, f_pn = rm.build_modules(bundle_cfg)
    bundle = rm.ModelBundle(
        config=bundle_cfg,
        tokenizer=ClipBpeTokenizer.from_dir(vocab_dir),
        unet=f_unet, text_encoder=CLIPTextEncoder(clip_cfg),
        vae=f_vae, position_net=f_pn, params=params)

    monkeypatch.setattr(_grounded, "BOX_SCALE", (WIDTH, HEIGHT))
    monkeypatch.setattr(base, "decode_latents", _stub_decode_latents)
    monkeypatch.setenv("LMDX_NOISE_BACKEND", "torch")

    f_out = methods.lmd_plus.run(
        SPEC, bundle, segmenter=_ScriptedSegmenter(masks),
        bg_seed=17, fg_seed_start=200, num_inference_steps=STEPS,
        so_negative_prompt="ugly, blurry",
        overall_negative_prompt="dull, noisy")

    assert f_out.image.shape == t_image.shape == (LAT, LAT, 3)
    diff = np.abs(f_out.image.astype(np.int32) - t_image.astype(np.int32))
    assert diff.max() <= 1, (
        f"max pixel diff {diff.max()} at {np.unravel_index(diff.argmax(), diff.shape)}"
    )


# ---- SAM refinement chain vs the reference's models/sam.py ------------------

class _NoAutocastTorch:
    """torch proxy for refmodels.sam: autocast becomes a no-op so the
    reference computes f32 on CPU (sam.py:39 hard-codes
    torch.autocast(torch_device); on CPU that would silently run bf16,
    which is neither the reference's CUDA fp16 nor this test's f32)."""

    def __getattr__(self, name):
        return getattr(torch, name)

    @staticmethod
    def autocast(*args, **kwargs):
        import contextlib

        return contextlib.nullcontext()


def _sam_rig(monkeypatch):
    """(reference sam module with a tiny real SamModel+SamProcessor wired in,
    matching lmdx FlaxSamSegmenter, model_dict) — f32 both sides."""
    import jax.numpy as jnp
    from transformers import SamImageProcessor, SamProcessor

    from lmdx.nn import sam as samlib
    from tests.test_torch_parity import sam_pair as _  # noqa: F401

    # Rebuild the pair inline (the fixture is module-scoped to the other
    # file; construction is cheap at tiny size).
    from tests import test_torch_parity as ttp

    tm, fm, params, fcfg = ttp.sam_pair.__wrapped__()
    # Random-init mask logits have sigma ~1e-5 — BELOW the legitimate
    # cross-framework f32 difference (~2e-5), so thresholded masks would be
    # fp-coin-flips. Bias the hypernetwork outputs and upscale conv so the
    # logits are O(1) spatial structure instead; re-convert so both sides
    # share the biased weights.
    with torch.no_grad():
        g = torch.Generator().manual_seed(11)
        for mlp in tm.mask_decoder.output_hypernetworks_mlps:
            mlp.proj_out.bias.normal_(0.0, 1.0, generator=g)
        tm.mask_decoder.upscale_conv2.bias.normal_(0.0, 0.5, generator=g)
    params = samlib.convert_sam(ttp._to_np(tm.state_dict()), fcfg)

    _load_reference_pipelines()
    from easydict import EasyDict

    refsam = importlib.import_module("refmodels.sam")
    monkeypatch.setattr(refsam, "torch", _NoAutocastTorch())

    size = fcfg.image_size
    processor = SamProcessor(SamImageProcessor(
        size={"longest_edge": size},
        pad_size={"height": size, "width": size}))
    model_dict = EasyDict(sam_model=tm, sam_processor=processor)

    segmenter = samlib.FlaxSamSegmenter(params, fcfg, dtype=jnp.float32)
    return refsam, model_dict, segmenter, fcfg


def test_sam_refine_box_matches_reference(monkeypatch):
    """models/sam.py sam_refine_box (SamProcessor preprocessing, box-corner
    prompts, post_process_masks upscale->threshold chain, target resize,
    coarse-IoU largest_over_conf selection; sam.py:176-213) vs lmdx
    refine_masks_from_boxes over FlaxSamSegmenter with converted weights."""
    from lmdx.sampling import masking

    refsam, model_dict, segmenter, fcfg = _sam_rig(monkeypatch)
    size = fcfg.image_size
    rng = np.random.default_rng(5)
    img = rng.integers(0, 255, (size, size, 3), dtype=np.uint8)
    box = (0.15, 0.2, 0.8, 0.7)

    t_mask, t_conf = refsam.sam_refine_box(
        sam_input_image=img, box=box, model_dict=model_dict,
        height=size, width=size, H=16, W=16,
        discourage_mask_below_confidence=0.85,
        discourage_mask_below_coarse_iou=0.25, verbose=False)

    [f_mask] = masking.refine_masks_from_boxes(
        [box], [img], (16, 16), segmenter)

    assert t_mask.shape == f_mask.shape == (16, 16)
    np.testing.assert_array_equal(f_mask.astype(bool), np.asarray(t_mask))


def test_sam_refine_attn_matches_reference(monkeypatch):
    """models/sam.py sam_refine_attn (gaussian smoothing, threshold, the
    point prompt at the attention argmax scaled to image pixels, coarse-IoU
    selection; sam.py:125-172) vs lmdx refine_masks_from_attn."""
    from lmdx.sampling import masking

    refsam, model_dict, segmenter, fcfg = _sam_rig(monkeypatch)
    size = fcfg.image_size
    rng = np.random.default_rng(9)
    img = rng.integers(0, 255, (size, size, 3), dtype=np.uint8)
    attn = rng.random((16, 16)).astype(np.float32)
    attn[5:9, 6:11] += 1.5  # a clear blob so the threshold mask is stable

    t_mask, t_conf = refsam.sam_refine_attn(
        sam_input_image=img, token_attn_np=attn, model_dict=model_dict,
        height=size, width=size, H=16, W=16,
        use_box_input=False, gaussian_sigma=1.5, mask_th_for_box=0.05,
        n_erode_dilate_mask_for_box=1, mask_th_for_point=0.25,
        discourage_mask_below_confidence=0.85,
        discourage_mask_below_coarse_iou=0.25, verbose=False)

    [f_mask] = masking.refine_masks_from_attn(
        [attn], [img], (16, 16), segmenter,
        masking.RefineConfig(use_box_input=False, mask_th_for_point=0.25))

    assert t_mask.shape == f_mask.shape == (16, 16)
    np.testing.assert_array_equal(f_mask.astype(bool), np.asarray(t_mask))


# ---- stage-2 eval protocol vs the reference's utils/eval --------------------

def test_owl_vit_eval_matches_reference(tmp_path, monkeypatch):
    """The reference's own utils/eval/eval.py eval_prompt (OwlViTProcessor
    preprocessing, post_process box conversion, score threshold, class-aware
    NMS, to_gen_box_format, task predicate; eval.py:120-174) vs
    lmdx.eval.owl_vit.eval_prompt over a matched tiny OwlViT with converted
    weights: the FINAL DETECTION LISTS and the verdict must agree. Class/
    projection weights are amplified so the detection structure sits far
    above cross-framework fp differences."""
    import dataclasses

    from PIL import Image

    _load_reference_pipelines()
    import importlib as _il

    ev = _il.import_module("utils.eval")

    from transformers import CLIPTokenizer, OwlViTConfig as TOwlCfg
    from transformers import (OwlViTForObjectDetection, OwlViTImageProcessor,
                              OwlViTProcessor)

    from lmdx.eval import owl_vit as fowl
    from lmdx.eval.prompts import get_lmd_prompts
    from lmdx.nn import owlvit as owlvit_lib
    from lmdx.text.tokens import ClipBpeTokenizer

    vocab_dir = str(tmp_path / "tok")
    vocab = _mini_clip_vocab(vocab_dir)

    fcfg = dataclasses.replace(owlvit_lib.tiny_owlvit(), projection_dim=32)
    # max_length 64 instead of the real checkpoint's 16: the char-level
    # mini vocab makes "a photo of a red cube" ~20 tokens.
    fcfg = dataclasses.replace(
        fcfg, text=dataclasses.replace(fcfg.text, vocab_size=len(vocab),
                                       max_length=64))
    tcfg = TOwlCfg(
        text_config=dict(
            vocab_size=fcfg.text.vocab_size,
            hidden_size=fcfg.text.hidden_size,
            intermediate_size=fcfg.text.intermediate_size,
            num_hidden_layers=fcfg.text.num_layers,
            num_attention_heads=fcfg.text.num_heads,
            max_position_embeddings=fcfg.text.max_length,
        ),
        vision_config=dict(
            hidden_size=fcfg.vision_hidden,
            intermediate_size=fcfg.vision_mlp,
            num_hidden_layers=fcfg.vision_layers,
            num_attention_heads=fcfg.vision_heads,
            image_size=fcfg.image_size,
            patch_size=fcfg.patch_size,
        ),
        projection_dim=fcfg.projection_dim,
    )
    torch.manual_seed(2)
    tm = OwlViTForObjectDetection(tcfg).eval()
    with torch.no_grad():
        # Random-init class logits are ~1e-4, below legitimate
        # cross-framework fp noise; amplify the query-dependent similarity
        # and the per-patch shift so detections are structurally stable.
        tm.owlvit.text_projection.weight.mul_(30.0)
        tm.class_head.logit_shift.weight.mul_(30.0)
    params = owlvit_lib.convert_owlvit(
        {k: np.asarray(v) for k, v in tm.state_dict().items()}, fcfg)

    size = fcfg.image_size
    hf_tok = CLIPTokenizer(os.path.join(vocab_dir, "vocab.json"),
                           os.path.join(vocab_dir, "merges.txt"))
    hf_tok.model_max_length = fcfg.text.max_length  # the real owlvit's 16
    processor = OwlViTProcessor(
        OwlViTImageProcessor(size={"height": size, "width": size}),
        hf_tok)

    # Seed chosen so every protocol decision has a wide margin over the
    # ~1e-5 cross-framework fp difference: per-patch query-logit gap 0.008
    # (argmax labels), score-threshold margin 0.049 (the 0.15 cutoff),
    # same-class score gap 0.004 (NMS pick order — most seeds saturate
    # several scores to exactly 1.0, which makes the order a tie), and
    # pairwise-IoU margin 0.085 (the 0.15 NMS threshold).
    rng = np.random.default_rng(25)
    img = rng.integers(0, 255, (size, size, 3), dtype=np.uint8)
    png = tmp_path / "img.png"
    Image.fromarray(img, "RGB").save(png)

    prompt = get_lmd_prompts()["lmd_attribution"][0]

    t_caught = {}
    orig_eval_boxes = ev.evaluate_with_boxes

    def _t_spy(boxes, eval_info, verbose=False):
        t_caught["boxes"] = boxes
        return orig_eval_boxes(boxes, eval_info, verbose=verbose)

    monkeypatch.setattr(sys.modules["utils.eval.eval"],
                        "evaluate_with_boxes", _t_spy)

    # the reference driver wraps eval in no_grad (scripts/owl_vit_eval.py)
    with torch.no_grad():
        t_type, t_success = ev.eval_prompt(
            prompt, "lmd", str(png), processor, tm,
            score_threshold=0.15, nms_threshold=0.15,
            use_class_aware_nms=True, use_cuda=False)

    f_caught = {}
    orig_get = fowl.get_eval_info_from_prompt

    def _f_get(p):
        texts, info = orig_get(p)
        orig_pred = info["predicate"]

        def pred(boxes, *a, **k):
            f_caught["boxes"] = boxes
            return orig_pred(boxes, *a, **k)

        return texts, {**info, "predicate": pred}

    monkeypatch.setattr(fowl, "get_eval_info_from_prompt", _f_get)

    detector = fowl.FlaxOwlViTDetector(
        params, fcfg, tokenizer=ClipBpeTokenizer.from_dir(vocab_dir))
    f_type, f_success = fowl.eval_prompt(prompt, img, detector)

    assert f_type == t_type
    t_boxes, f_boxes = t_caught["boxes"], f_caught["boxes"]
    assert len(t_boxes) == len(f_boxes) and len(t_boxes) > 0
    for tb, fb in zip(t_boxes, f_boxes):
        assert tb["name"] == fb["name"]
        np.testing.assert_allclose(np.float64(fb["bounding_box"]),
                                   np.float64(tb["bounding_box"]), atol=0.05)
        assert abs(float(fb["score"]) - float(tb["score"])) < 1e-3
    assert f_success == t_success
