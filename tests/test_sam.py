"""SAM (Flax) tests: module shapes, segmenter protocol, conversion structure."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lmdx.nn import sam as samlib
from lmdx.sampling import masking


@pytest.fixture(scope="module")
def tiny():
    cfg = samlib.tiny_sam()
    model = samlib.Sam(cfg)
    px = jnp.zeros((1, cfg.image_size, cfg.image_size, 3))
    pts = jnp.asarray([[[0.4, 0.5]]], jnp.float32)
    lbl = jnp.asarray([[1]], jnp.int32)
    params = model.init(jax.random.key(0), px, pts, lbl)["params"]
    return cfg, model, params


@pytest.mark.slow
def test_sam_shapes(tiny):
    cfg, model, params = tiny
    px = jnp.zeros((2, cfg.image_size, cfg.image_size, 3))
    pts = jnp.zeros((2, 2, 2), jnp.float32)
    lbl = jnp.asarray([[2, 3], [1, -1]], jnp.int32)
    masks, iou = model.apply({"params": params}, px, pts, lbl)
    up = 4 * cfg.grid
    assert masks.shape == (2, cfg.num_multimask, up, up)
    assert iou.shape == (2, cfg.num_multimask)
    assert np.isfinite(np.asarray(masks)).all()


@pytest.mark.slow
def test_sam_segmenter_in_refine_path(tiny):
    cfg, _, params = tiny
    seg = samlib.FlaxSamSegmenter(params, cfg)
    image = np.zeros((64, 64, 3), np.uint8)
    mask = masking.refine_mask_from_box(
        (0.2, 0.2, 0.8, 0.8), image, (16, 16), seg)
    assert mask.shape == (16, 16)
    attn = np.zeros((8, 8), np.float32)
    attn[3:6, 3:6] = 1.0
    mask2 = masking.refine_mask_from_attn(attn, image, (16, 16), seg)
    assert mask2.shape == (16, 16)


@pytest.mark.slow
def test_sam_segment_batch_matches_singles(tiny):
    """The batched forward (bucketed batch dim, -1-padded point slots) must
    reproduce per-item results for both prompt kinds — including a batch
    size (5) that exceeds the CHUNK cap (4) and pads the 1-item tail."""
    cfg, _, params = tiny
    seg = samlib.FlaxSamSegmenter(params, cfg, dtype=jnp.float32)
    rng = np.random.default_rng(0)
    images = [rng.integers(0, 255, (64, 64, 3), np.uint8) for _ in range(5)]
    boxes = [[(0.1, 0.1, 0.6, 0.7)], [(0.3, 0.2, 0.9, 0.8)],
             [(0.0, 0.4, 0.5, 1.0)], [(0.2, 0.0, 0.7, 0.5)],
             [(0.4, 0.4, 1.0, 1.0)]]
    points = [[(0.3, 0.4)], [(0.6, 0.5)], [(0.2, 0.8)], [(0.7, 0.2)],
              [(0.5, 0.5)]]

    for kw in ({"input_boxes": boxes}, {"input_points": points}):
        batched = seg.segment_batch(images, target_hw=(16, 16), **kw)
        for i, (masks_b, iou_b) in enumerate(batched):
            single_kw = {k: [v[i][0]] for k, v in kw.items()}
            masks_s, iou_s = seg.segment(images[i], target_hw=(16, 16),
                                         **single_kw)
            np.testing.assert_array_equal(masks_b, masks_s)
            np.testing.assert_allclose(iou_b, iou_s, atol=1e-5)


@pytest.mark.slow
def test_sam_segment_batch_device_arrays_match_host(tiny):
    """The on-device fast path (jax uint8 arrays from
    decode_latents(to_host=False)) must reproduce the host-numpy path bit
    for bit — including a bucketed/padded tail chunk."""
    cfg, _, params = tiny
    seg = samlib.FlaxSamSegmenter(params, cfg, dtype=jnp.float32)
    assert seg.accepts_device_arrays
    rng = np.random.default_rng(1)
    host = [rng.integers(0, 255, (64, 64, 3), np.uint8) for _ in range(5)]
    dev = [jnp.asarray(a) for a in host]
    boxes = [[(0.1, 0.1, 0.6, 0.7)], [(0.3, 0.2, 0.9, 0.8)],
             [(0.0, 0.4, 0.5, 1.0)], [(0.2, 0.0, 0.7, 0.5)],
             [(0.4, 0.4, 1.0, 1.0)]]
    out_h = seg.segment_batch(host, input_boxes=boxes, target_hw=(16, 16))
    out_d = seg.segment_batch(dev, input_boxes=boxes, target_hw=(16, 16))
    for (mh, ih), (md, idv) in zip(out_h, out_d):
        np.testing.assert_array_equal(mh, md)
        np.testing.assert_allclose(ih, idv, atol=1e-6)


def test_refine_masks_batched_match_singles():
    """Batched refine helpers == single-box wrappers (CoarseSegmenter)."""
    seg = masking.CoarseSegmenter()
    boxes = [(0.1, 0.1, 0.6, 0.7), (0.3, 0.2, 0.9, 0.8)]
    out = masking.refine_masks_from_boxes(boxes, [None, None], (16, 16), seg)
    for box, m in zip(boxes, out):
        np.testing.assert_array_equal(
            m, masking.refine_mask_from_box(box, None, (16, 16), seg))

    rng = np.random.default_rng(1)
    attns = [rng.random((8, 8)).astype(np.float32) for _ in range(2)]
    out = masking.refine_masks_from_attn(attns, [None, None], (16, 16), seg)
    for a, m in zip(attns, out):
        np.testing.assert_array_equal(
            m, masking.refine_mask_from_attn(a, None, (16, 16), seg))


def _export_sam(params):
    """Inverse of convert_sam for the tiny module (tests the name mapping)."""
    sd = {}

    def lin(prefix, tree):
        sd[f"{prefix}.weight"] = np.asarray(tree["kernel"]).transpose(1, 0)
        if "bias" in tree:
            sd[f"{prefix}.bias"] = np.asarray(tree["bias"])

    def norm(prefix, tree):
        sd[f"{prefix}.weight"] = np.asarray(tree["scale"])
        sd[f"{prefix}.bias"] = np.asarray(tree["bias"])

    enc = params["image_encoder"]
    sd["vision_encoder.patch_embed.projection.weight"] = np.asarray(
        enc["patch_embed"]["kernel"]).transpose(3, 2, 0, 1)
    sd["vision_encoder.patch_embed.projection.bias"] = np.asarray(
        enc["patch_embed"]["bias"])
    sd["vision_encoder.pos_embed"] = np.asarray(enc["pos_embed"])
    sd["vision_encoder.neck.conv1.weight"] = np.asarray(
        enc["neck_conv1"]["kernel"]).transpose(3, 2, 0, 1)
    sd["vision_encoder.neck.conv2.weight"] = np.asarray(
        enc["neck_conv2"]["kernel"]).transpose(3, 2, 0, 1)
    norm("vision_encoder.neck.layer_norm1", enc["neck_ln1"])
    norm("vision_encoder.neck.layer_norm2", enc["neck_ln2"])
    for name, block in enc.items():
        if not name.startswith("layers_"):
            continue
        i = name.split("_")[-1]
        p = f"vision_encoder.layers.{i}"
        norm(f"{p}.layer_norm1", block["layer_norm1"])
        norm(f"{p}.layer_norm2", block["layer_norm2"])
        lin(f"{p}.attn.qkv", block["attn"]["qkv"])
        lin(f"{p}.attn.proj", block["attn"]["proj"])
        sd[f"{p}.attn.rel_pos_h"] = np.asarray(block["attn"]["rel_pos_h"])
        sd[f"{p}.attn.rel_pos_w"] = np.asarray(block["attn"]["rel_pos_w"])
        lin(f"{p}.mlp.lin1", block["lin1"])
        lin(f"{p}.mlp.lin2", block["lin2"])

    pr = params["prompt_encoder"]
    sd["prompt_encoder.shared_embedding.positional_embedding"] = np.asarray(
        pr["positional_embedding"])
    sd["prompt_encoder.not_a_point_embed.weight"] = np.asarray(
        pr["not_a_point_embed"]["embedding"])
    sd["prompt_encoder.no_mask_embed.weight"] = np.asarray(
        pr["no_mask_embed"]["embedding"])
    for i in range(4):
        sd[f"prompt_encoder.point_embed.{i}.weight"] = np.asarray(
            pr[f"point_embed_{i}"]["embedding"])

    dec = params["mask_decoder"]
    sd["mask_decoder.iou_token.weight"] = np.asarray(dec["iou_token"])
    sd["mask_decoder.mask_tokens.weight"] = np.asarray(dec["mask_tokens"])
    norm("mask_decoder.transformer.layer_norm_final_attn",
         dec["layer_norm_final"])
    for n in ("q_proj", "k_proj", "v_proj", "out_proj"):
        lin(f"mask_decoder.transformer.final_attn_token_to_image.{n}",
            dec["final_attn_token_to_image"][n])
    sd["mask_decoder.upscale_conv1.weight"] = np.asarray(
        dec["upscale_conv1"]["kernel"]).transpose(2, 3, 0, 1)
    sd["mask_decoder.upscale_conv1.bias"] = np.asarray(
        dec["upscale_conv1"]["bias"])
    sd["mask_decoder.upscale_conv2.weight"] = np.asarray(
        dec["upscale_conv2"]["kernel"]).transpose(2, 3, 0, 1)
    sd["mask_decoder.upscale_conv2.bias"] = np.asarray(
        dec["upscale_conv2"]["bias"])
    norm("mask_decoder.upscale_layer_norm", dec["upscale_ln"])
    for j in range(3):
        lin(f"mask_decoder.iou_prediction_head.layers.{j}",
            dec["iou_prediction_head"][f"layers_{j}"])
    for name, block in dec.items():
        if name.startswith("hypernet_"):
            i = name.split("_")[-1]
            for j in range(3):
                lin(f"mask_decoder.output_hypernetworks_mlps.{i}.layers.{j}",
                    block[f"layers_{j}"])
        if name.startswith("layers_"):
            i = name.split("_")[-1]
            p = f"mask_decoder.transformer.layers.{i}"
            for attn in ("self_attn", "cross_attn_token_to_image",
                         "cross_attn_image_to_token"):
                for n in ("q_proj", "k_proj", "v_proj", "out_proj"):
                    lin(f"{p}.{attn}.{n}", block[attn][n])
            for k in range(1, 5):
                norm(f"{p}.layer_norm{k}", block[f"layer_norm{k}"])
            lin(f"{p}.mlp.lin1", block["mlp_lin1"])
            lin(f"{p}.mlp.lin2", block["mlp_lin2"])
    return sd


@pytest.mark.slow  # the `tiny` init is ~40 s; torch-parity pins conversion
def test_sam_conversion_roundtrip(tiny):
    cfg, model, params = tiny
    sd = _export_sam(params)
    converted = samlib.convert_sam(sd, cfg)
    jax.tree_util.tree_map(np.testing.assert_array_equal, params, converted)
