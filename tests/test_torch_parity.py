"""Numeric parity vs the reference implementations (transformers, torch CPU).

The environment has no checkpoint files, so real-weight validation cannot
run — but `transformers` (the library the reference loads SAM / OWL-ViT /
the CLIP text encoder from: /root/reference/models/sam.py:13-21,
scripts/owl_vit_eval.py:39-41, models/models.py:41-53) is installed. These
tests instantiate the *actual torch modules* at tiny random-init configs,
export their state_dicts through lmdx's converters, and assert the Flax
forward reproduces the torch forward numerically. That proves architecture
AND conversion rules define the same function — the strongest weight-
contract evidence available offline (key/shape manifests prove the
contract's *names*; this proves its *math*).
"""

from __future__ import annotations

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def _to_np(sd):
    return {k: v.detach().cpu().numpy() for k, v in sd.items()}


# ---- SAM -------------------------------------------------------------------

@pytest.fixture(scope="module")
def sam_pair():
    from transformers import SamConfig, SamModel

    from lmdx.nn import sam as samlib

    fcfg = samlib.tiny_sam()
    tcfg = SamConfig(
        vision_config=dict(
            hidden_size=fcfg.encoder_dim,
            output_channels=fcfg.out_dim,
            num_hidden_layers=fcfg.encoder_layers,
            num_attention_heads=fcfg.encoder_heads,
            image_size=fcfg.image_size,
            patch_size=fcfg.patch_size,
            use_abs_pos=True,
            use_rel_pos=True,
            window_size=fcfg.window_size,
            global_attn_indexes=list(fcfg.global_attn_layers),
            num_pos_feats=fcfg.out_dim // 2,
            hidden_act="gelu",
        ),
        prompt_encoder_config=dict(
            hidden_size=fcfg.out_dim,
            image_size=fcfg.image_size,
            patch_size=fcfg.patch_size,
        ),
        mask_decoder_config=dict(
            hidden_size=fcfg.out_dim,
            num_hidden_layers=fcfg.decoder_layers,
            num_attention_heads=fcfg.decoder_heads,
            mlp_dim=fcfg.out_dim * 8,
            num_multimask_outputs=fcfg.num_multimask,
            iou_head_depth=3,
            iou_head_hidden_dim=fcfg.out_dim,
        ),
    )
    torch.manual_seed(0)
    tm = SamModel(tcfg).eval()
    params = samlib.convert_sam(_to_np(tm.state_dict()), fcfg)
    fm = samlib.Sam(fcfg)
    return tm, fm, params, fcfg


def _run_sam_pair(sam_pair, t_points, t_labels, t_boxes, f_points, f_labels):
    tm, fm, params, fcfg = sam_pair
    rng = np.random.default_rng(0)
    px = rng.standard_normal(
        (1, fcfg.image_size, fcfg.image_size, 3)).astype(np.float32)

    with torch.no_grad():
        t_out = tm(
            pixel_values=torch.from_numpy(px.transpose(0, 3, 1, 2)),
            input_points=(None if t_points is None
                          else torch.from_numpy(t_points)),
            input_labels=(None if t_labels is None
                          else torch.from_numpy(t_labels)),
            input_boxes=(None if t_boxes is None
                         else torch.from_numpy(t_boxes)),
            multimask_output=True,
        )
    t_masks = t_out.pred_masks[0, 0].numpy()      # (3, 4g, 4g)
    t_iou = t_out.iou_scores[0, 0].numpy()        # (3,)

    f_masks, f_iou = fm.apply(
        {"params": params}, jnp.asarray(px), jnp.asarray(f_points),
        jnp.asarray(f_labels))
    return t_masks, t_iou, np.asarray(f_masks[0]), np.asarray(f_iou[0])


def test_sam_point_prompt_matches_transformers(sam_pair):
    """Point prompt: torch pads (0,0)/-1; flax passes the pad explicitly.
    torch coords are pixels (+0.5 pixel-center shift happens inside); flax
    takes [0,1] of the shifted coordinate."""
    size = sam_pair[3].image_size
    ppix = np.array([23.0, 41.0], np.float32)
    t_points = ppix[None, None, None]                      # (1,1,1,2)
    t_labels = np.array([[[1]]], np.int64)
    f_points = np.stack([(ppix + 0.5) / size,
                         np.array([0.5 / size] * 2)])[None]
    f_labels = np.array([[1, -1]], np.int32)
    t_masks, t_iou, f_masks, f_iou = _run_sam_pair(
        sam_pair, t_points, t_labels, None, f_points, f_labels)
    np.testing.assert_allclose(f_masks, t_masks, atol=5e-4)
    np.testing.assert_allclose(f_iou, t_iou, atol=5e-4)


# ---- UNet (vendored reference fork) ----------------------------------------

def _load_vendored_unet_module():
    """Import the reference's vendored diffusers-0.18 UNet fork — the exact
    torch class the real checkpoints load into (reference
    models/unet_2d_condition.py) — over the structural diffusers shim."""
    import importlib
    import os
    import sys
    import types

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    shim = os.path.join(repo, "scripts", "_diffusers_shim")
    if shim not in sys.path:
        sys.path.insert(0, shim)
    if "refmodels" not in sys.modules:
        pkg = types.ModuleType("refmodels")
        pkg.__path__ = ["/root/reference/models"]
        sys.modules["refmodels"] = pkg
    return importlib.import_module("refmodels.unet_2d_condition")


@pytest.mark.slow
def test_unet_matches_vendored_reference_fork():
    """Numeric parity of the Flax UNet + convert_unet against the reference's
    own vendored torch UNet (tiny SD1.x-class topology): same weights, same
    inputs, same eps prediction."""
    from lmdx import config as cfglib
    from lmdx.nn import unet as unet_lib
    from lmdx.runtime.convert import convert_unet

    unet_mod = _load_vendored_unet_module()
    cfg = cfglib.tiny_test()
    ucfg = cfg.unet

    torch.manual_seed(0)
    tm = unet_mod.UNet2DConditionModel(
        sample_size=16,
        in_channels=4,
        out_channels=4,
        down_block_types=ucfg.down_block_types,
        up_block_types=ucfg.up_block_types,
        block_out_channels=ucfg.block_out_channels,
        layers_per_block=ucfg.layers_per_block,
        cross_attention_dim=ucfg.cross_attention_dim,
        attention_head_dim=ucfg.num_attention_heads[0],
        norm_num_groups=ucfg.norm_num_groups,
        use_gated_attention=False,
    ).eval()
    import dataclasses

    plain_ucfg = dataclasses.replace(ucfg, use_gligen=False)
    params = convert_unet(_to_np(tm.state_dict()),
                          dataclasses.replace(cfg, unet=plain_ucfg))

    rng = np.random.default_rng(2)
    sample = rng.standard_normal((1, 16, 16, 4)).astype(np.float32)
    ehs = rng.standard_normal((1, 7, ucfg.cross_attention_dim)).astype(
        np.float32)

    with torch.no_grad():
        t_out = tm(
            sample=torch.from_numpy(sample.transpose(0, 3, 1, 2)),
            timestep=torch.tensor(10),
            encoder_hidden_states=torch.from_numpy(ehs),
        ).sample.numpy()

    fm = unet_lib.UNet2DCondition(plain_ucfg)
    f_out = fm.apply({"params": params}, jnp.asarray(sample),
                     jnp.asarray(10), jnp.asarray(ehs))
    if isinstance(f_out, tuple):
        f_out = f_out[0]
    np.testing.assert_allclose(
        np.asarray(f_out), t_out.transpose(0, 2, 3, 1), atol=1e-4)


@pytest.mark.slow
def test_gligen_unet_matches_vendored_reference_fork():
    """GLIGEN variant: gated self-attention fusers + PositionNet grounding
    tokens (reference unet_2d_condition.py:63-114,863-871, attention.py:25-53).
    The fuser alpha gates and null features init to zero (which would make the
    fuser a no-op), so they are filled with nonzero values before conversion
    to actually exercise the gated path."""
    from lmdx import config as cfglib
    from lmdx.nn import unet as unet_lib
    from lmdx.runtime.convert import convert_position_net, convert_unet

    unet_mod = _load_vendored_unet_module()
    cfg = cfglib.tiny_test()
    ucfg = cfg.unet  # use_gligen=True

    torch.manual_seed(0)
    tm = unet_mod.UNet2DConditionModel(
        sample_size=16,
        in_channels=4,
        out_channels=4,
        down_block_types=ucfg.down_block_types,
        up_block_types=ucfg.up_block_types,
        block_out_channels=ucfg.block_out_channels,
        layers_per_block=ucfg.layers_per_block,
        cross_attention_dim=ucfg.cross_attention_dim,
        attention_head_dim=ucfg.num_attention_heads[0],
        norm_num_groups=ucfg.norm_num_groups,
        use_gated_attention=True,
    ).eval()
    with torch.no_grad():
        for name, p in tm.named_parameters():
            if "alpha_attn" in name:
                p.fill_(0.7)
            elif "alpha_dense" in name:
                p.fill_(-0.4)
            elif "null_positive_feature" in name or \
                    "null_position_feature" in name:
                p.normal_(0.0, 0.5)
    sd = _to_np(tm.state_dict())
    params = convert_unet(sd, cfg)
    pn_params = convert_position_net(sd)
    assert pn_params is not None

    rng = np.random.default_rng(3)
    sample = rng.standard_normal((2, 16, 16, 4)).astype(np.float32)
    ehs = rng.standard_normal((2, 7, ucfg.cross_attention_dim)).astype(
        np.float32)
    n_objs = ucfg.gligen_max_objs
    lo = rng.uniform(0.0, 0.6, (2, n_objs, 2)).astype(np.float32)
    boxes = np.concatenate(
        [lo, lo + rng.uniform(0.1, 0.4, lo.shape).astype(np.float32)], -1)
    masks = np.zeros((2, n_objs), np.float32)
    masks[0, :2] = 1.0
    masks[1, :1] = 1.0
    # reference PositionNet hard-codes positive_len=768 (CLIP pooler dim,
    # unet_2d_condition.py:572) independent of the tiny topology
    pos_emb = rng.standard_normal((2, n_objs, 768)).astype(np.float32)

    with torch.no_grad():
        t_out = tm(
            sample=torch.from_numpy(sample.transpose(0, 3, 1, 2)),
            timestep=torch.tensor(7),
            encoder_hidden_states=torch.from_numpy(ehs),
            cross_attention_kwargs={"gligen": {
                "boxes": torch.from_numpy(boxes),
                "masks": torch.from_numpy(masks),
                "positive_embeddings": torch.from_numpy(pos_emb),
            }},
        ).sample.numpy()

    objs = unet_lib.PositionNet(
        positive_len=768, out_dim=ucfg.cross_attention_dim,
        fourier_freqs=ucfg.gligen_fourier_freqs,
    ).apply({"params": pn_params}, jnp.asarray(boxes), jnp.asarray(masks),
            jnp.asarray(pos_emb))

    fm = unet_lib.UNet2DCondition(ucfg)
    f_out = fm.apply({"params": params}, jnp.asarray(sample),
                     jnp.asarray(7), jnp.asarray(ehs), objs=objs,
                     fuser_gate=1.0)
    if isinstance(f_out, tuple):
        f_out = f_out[0]
    np.testing.assert_allclose(
        np.asarray(f_out), t_out.transpose(0, 2, 3, 1), atol=2e-4)


@pytest.mark.slow
def test_attention_taps_match_vendored_reference_capture():
    """The guidance contract: lmdx's tapped cross-attention probabilities must
    equal the reference AttnProcessor's saved maps (attention_processor.py:
    440-483, (batch, heads, hw, tokens) under the 4-tuple attn key), including
    the cond-only CFG slice (`return_cond_ca_only`)."""
    import dataclasses

    from lmdx import config as cfglib
    from lmdx.nn import attention as attn_lib
    from lmdx.nn import unet as unet_lib
    from lmdx.runtime.convert import convert_unet

    unet_mod = _load_vendored_unet_module()
    cfg = cfglib.tiny_test()
    ucfg = dataclasses.replace(cfg.unet, use_gligen=False)

    torch.manual_seed(0)
    tm = unet_mod.UNet2DConditionModel(
        sample_size=16,
        in_channels=4,
        out_channels=4,
        down_block_types=ucfg.down_block_types,
        up_block_types=ucfg.up_block_types,
        block_out_channels=ucfg.block_out_channels,
        layers_per_block=ucfg.layers_per_block,
        cross_attention_dim=ucfg.cross_attention_dim,
        attention_head_dim=ucfg.num_attention_heads[0],
        norm_num_groups=ucfg.norm_num_groups,
        use_gated_attention=False,
    ).eval()
    params = convert_unet(_to_np(tm.state_dict()),
                          dataclasses.replace(cfg, unet=ucfg))

    # every cross-attention site in the tiny topology (down block 0, mid,
    # up block 1 with layers_per_block+1 = 2 attentions)
    keys = (("down", 0, 0, 0), ("mid", 0, 0, 0),
            ("up", 1, 0, 0), ("up", 1, 1, 0))

    rng = np.random.default_rng(4)
    sample = rng.standard_normal((2, 16, 16, 4)).astype(np.float32)
    ehs = rng.standard_normal((2, 7, ucfg.cross_attention_dim)).astype(
        np.float32)

    for cond_only in (False, True):
        saved = {}
        with torch.no_grad():
            tm(
                sample=torch.from_numpy(sample.transpose(0, 3, 1, 2)),
                timestep=torch.tensor(3),
                encoder_hidden_states=torch.from_numpy(ehs),
                cross_attention_kwargs={
                    "save_attn_to_dict": saved,
                    "save_keys": [tuple(k) for k in keys],
                    "return_cond_ca_only": cond_only,
                    "enable_flash_attn": False,
                },
            )
        assert set(saved) == set(keys)

        _, f_taps = unet_lib.apply_unet(
            unet_lib.UNet2DCondition(ucfg), params,
            jnp.asarray(sample), jnp.asarray(3), jnp.asarray(ehs),
            taps=attn_lib.TapSpec(keys=keys, cond_only=cond_only,
                                  fused=False))
        assert set(f_taps) == set(keys)
        for k in keys:
            np.testing.assert_allclose(
                np.asarray(f_taps[k]), saved[k].numpy(), atol=2e-5,
                err_msg=f"{k} cond_only={cond_only}")


# ---- CLIP text encoder -----------------------------------------------------

def test_clip_text_encoder_matches_transformers():
    """transformers CLIPTextModel (the SD1.x text encoder the reference
    loads, models/models.py:41-53) vs lmdx.nn.clip + convert_text_encoder:
    final hidden states and EOS-pooled output must agree. Covers both
    activation variants (quick_gelu = OpenAI CLIP / SD1.x; gelu =
    OpenCLIP / SD2.x-XL)."""
    from transformers import CLIPTextConfig as TClipCfg
    from transformers import CLIPTextModel

    from lmdx.config import CLIPTextConfig
    from lmdx.nn.clip import CLIPTextEncoder
    from lmdx.runtime.convert import convert_text_encoder

    for act in ("quick_gelu", "gelu"):
        fcfg = CLIPTextConfig(vocab_size=1024, hidden_size=32,
                              intermediate_size=64, num_layers=2,
                              num_heads=2, max_length=16, hidden_act=act)
        tcfg = TClipCfg(
            vocab_size=fcfg.vocab_size,
            hidden_size=fcfg.hidden_size,
            intermediate_size=fcfg.intermediate_size,
            num_hidden_layers=fcfg.num_layers,
            num_attention_heads=fcfg.num_heads,
            max_position_embeddings=fcfg.max_length,
            hidden_act=act,
            eos_token_id=fcfg.vocab_size - 1,
            bos_token_id=fcfg.vocab_size - 2,
            pad_token_id=0,
        )
        torch.manual_seed(0)
        tm = CLIPTextModel(tcfg).eval()

        class _Cfg:
            clip = fcfg

        params = convert_text_encoder(_to_np(tm.state_dict()), _Cfg())

        eos = fcfg.vocab_size - 1
        ids = np.zeros((2, fcfg.max_length), np.int64)
        ids[0, :5] = (1022, 14, 52, 9, eos)
        ids[1, :3] = (1022, 700, eos)
        with torch.no_grad():
            t_out = tm(input_ids=torch.from_numpy(ids))
        f_hidden, f_pooled = CLIPTextEncoder(fcfg).apply(
            {"params": params}, jnp.asarray(ids.astype(np.int32)),
            eos_token_id=eos)
        np.testing.assert_allclose(
            np.asarray(f_hidden), t_out.last_hidden_state.numpy(),
            atol=5e-5, err_msg=f"hidden ({act})")
        np.testing.assert_allclose(
            np.asarray(f_pooled), t_out.pooler_output.numpy(),
            atol=5e-5, err_msg=f"pooled ({act})")


# ---- CLIP BPE tokenizer ----------------------------------------------------

def test_clip_bpe_tokenizer_matches_transformers(tmp_path):
    """lmdx.text.tokens.ClipBpeTokenizer vs transformers.CLIPTokenizer (the
    tokenizer the reference loads, models/models.py:41-53) over the SAME
    vocab/merges files: token strings and padded ids must agree on real
    benchmark prompts. The vocab is a miniature with the real construction
    (per-char tokens both bare and `</w>`-final, ranked merges, specials)."""
    import itertools
    import json

    from transformers import CLIPTokenizer

    from lmdx.eval.prompts import get_lmd_prompts
    from lmdx.text.tokens import ClipBpeTokenizer

    chars = [chr(c) for c in range(32, 127)]
    vocab_tokens = [c for c in chars if not c.isspace()]
    vocab_tokens += [c + "</w>" for c in vocab_tokens]
    # merges for common benchmark words (rank order matters; include partial
    # merges so multi-step BPE and rank tie-breaking are exercised)
    merges = [
        ("t", "h"), ("th", "e</w>"), ("a", "n</w>"), ("o", "f</w>"),
        ("i", "n"), ("w", "i"), ("wi", "th"), ("with", "o"),
        ("c", "a"), ("ca", "t</w>"), ("d", "o"), ("do", "g</w>"),
        ("e", "r"), ("er", "e</w>"), ("r", "e"), ("re", "a"),
        ("l", "i"), ("li", "s"), ("t", "i"), ("ti", "c</w>"),
        ("p", "h"), ("ph", "o"), ("pho", "t"), ("phot", "o</w>"),
        ("s", "c"), ("sc", "e"), ("sce", "n"), ("scen", "e</w>"),
        ("'", "s</w>"), ("in", "g</w>"), ("o", "n</w>"), ("t", "o</w>"),
    ]
    for m in merges:
        vocab_tokens.append("".join(m))
    vocab_tokens += ["<|startoftext|>", "<|endoftext|>"]
    vocab = {t: i for i, t in enumerate(dict.fromkeys(vocab_tokens))}
    (tmp_path / "vocab.json").write_text(json.dumps(vocab))
    (tmp_path / "merges.txt").write_text(
        "#version: 0.2\n" + "\n".join(f"{a} {b}" for a, b in merges) + "\n")

    hf = CLIPTokenizer(str(tmp_path / "vocab.json"),
                       str(tmp_path / "merges.txt"))
    own = ClipBpeTokenizer.from_dir(str(tmp_path))

    prompts = get_lmd_prompts()
    texts = list(itertools.chain(
        prompts["lmd_negation"][:6], prompts["lmd_numeracy"][:6],
        prompts["lmd_attribution"][:6], prompts["lmd_spatial"][:6],
        ["A realistic photo of a gray cat and an orange dog on the grass.",
         "the cat's toy, next to a dog!",
         "Hello,   World -- with    extra whitespace\tand CAPS"],
    ))
    for text in texts:
        assert own.tokenize(text) == hf.tokenize(text), text
        hf_ids = hf(text, padding="max_length", max_length=77,
                    truncation=True)["input_ids"]
        assert own.encode(text, pad_to=77) == hf_ids, text


# ---- OWL-ViT ---------------------------------------------------------------

def test_owlvit_matches_transformers():
    """OwlViTForObjectDetection (the stage-2 eval model,
    scripts/owl_vit_eval.py:39-41) vs lmdx.nn.owlvit at a matched tiny
    config: pred_boxes and per-query logits must agree."""
    from transformers import OwlViTConfig as TOwlCfg
    from transformers import OwlViTForObjectDetection

    from lmdx.nn import owlvit as owlvit_lib

    import dataclasses

    # projection_dim must equal the text tower's hidden size: the real
    # checkpoint has 512 == 512, and transformers' class head relies on it
    # (OwlViTClassPredictionHead out_dim = text hidden).
    fcfg = dataclasses.replace(owlvit_lib.tiny_owlvit(), projection_dim=32)
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
    torch.manual_seed(0)
    tm = OwlViTForObjectDetection(tcfg).eval()
    params = owlvit_lib.convert_owlvit(_to_np(tm.state_dict()), fcfg)

    rng = np.random.default_rng(1)
    px = rng.standard_normal(
        (1, fcfg.image_size, fcfg.image_size, 3)).astype(np.float32)
    # Two queries; EOS (= vocab-1, the argmax id transformers pools at)
    # mid-sequence with zero-padding after, as the CLIP tokenizer produces.
    L = fcfg.text.max_length
    eos = fcfg.text.vocab_size - 1
    ids = np.zeros((2, L), np.int64)
    ids[0, :4] = (3, 17, 41, eos)
    ids[1, :6] = (3, 99, 12, 7, 120, eos)
    mask = (ids != 0).astype(np.int64)
    mask[:, 0] = 1

    with torch.no_grad():
        t_out = tm(input_ids=torch.from_numpy(ids),
                   pixel_values=torch.from_numpy(px.transpose(0, 3, 1, 2)),
                   attention_mask=torch.from_numpy(mask))
    t_boxes = t_out.pred_boxes[0].numpy()
    t_logits = t_out.logits[0].numpy()

    fm = owlvit_lib.OwlViT(fcfg)
    f_boxes, f_logits = fm.apply({"params": params}, jnp.asarray(px),
                                 jnp.asarray(ids.astype(np.int32)))
    np.testing.assert_allclose(np.asarray(f_boxes[0]), t_boxes, atol=5e-5)
    np.testing.assert_allclose(np.asarray(f_logits[0]), t_logits, atol=5e-4)


def test_sam_box_prompt_matches_transformers(sam_pair):
    size = sam_pair[3].image_size
    box = np.array([10.0, 8.0, 50.0, 60.0], np.float32)    # x0 y0 x1 y1 px
    t_boxes = box[None, None]                              # (1,1,4)
    f_points = np.stack([(box[:2] + 0.5) / size,
                         (box[2:] + 0.5) / size])[None]
    f_labels = np.array([[2, 3]], np.int32)
    t_masks, t_iou, f_masks, f_iou = _run_sam_pair(
        sam_pair, None, None, t_boxes, f_points, f_labels)
    np.testing.assert_allclose(f_masks, t_masks, atol=5e-4)
    np.testing.assert_allclose(f_iou, t_iou, atol=5e-4)
