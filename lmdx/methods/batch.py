"""Multi-image batched grounded generation (LMD / LMD+ serving path).

The reference generates one image at a time; per-chip throughput is then
bounded by batch-1 latency (the guidance loop at batch 1 measures ~5%% MXU
utilization). Here G independent prompts ride the pipeline together:

- ALL boxes of ALL images run as one batched per-box pass (sum of box
  counts), each box with its own image's uncond embedding, noise seeds,
  GLIGEN slot (LMD+), per-box CA guidance data (LMD), and tap token;
- composition/masking stay per-image on the host (cheap);
- the G overall passes run as one batched pass: per-image frozen masks and
  trajectories, per-image GLIGEN grounding, and *batched* CA-energy guidance
  (per-image loss vector; converged images freeze inside the while_loop —
  numerically equivalent to G sequential runs; see run_lmd_plus_batch's
  docstring for the exact guarantee).

Both flagship regimes are served: `run_lmd_plus_batch` (GLIGEN adapters,
per-box guidance off) and `run_lmd_batch` (training-free, per-box guidance
riding the same batched guidance loop — each box converges independently).

When a device mesh is active (dist/serve.py), batch inputs are placed with
the image/box axis sharded over the "dp" mesh axis, replacing the
reference's process-level prompt sharding (reference generate.py:23-25).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..core import boxes as boxlib
from ..core import schedule as sched
from ..dist import serve as serve_lib
from ..runtime import models as runtime_models
from ..sampling import compose as compose_lib
from ..sampling import guidance as guidance_lib
from ..sampling import latents as latents_lib
from ..sampling import masking
from ..sampling.loop import sample
from ..text import tokens as toklib
from ..text.parser import BOX_SCALE, convert_spec
from ..text.template import (
    DEFAULT_OVERALL_NEGATIVE_PROMPT,
    DEFAULT_SO_NEGATIVE_PROMPT,
)
from . import base
from ._grounded import GroundedParams, _make_guidance_spec


def _box_bucket(n: int) -> int:
    """Static pad size for the flat per-box batch.

    Small batches (single-image latency path) pad to the next power of two
    so a 2-box prompt doesn't pay 4x per-box compute; large batches pad to
    the next multiple of 8 (benchmark groups sum to up to 5 boxes x G
    images, and multiples of 8 cap pad waste at 20% where powers of two
    would waste up to 60%). Either way the distinct compiled sampler-scan
    shapes stay bounded: {1, 2, 4, 8, 16, 24, 32, 40, ...}."""
    if n <= 0:
        return 0
    if n <= 8:
        return guidance_lib.bucket(n)
    return ((n + 7) // 8) * 8


def run_grounded_batch(
    specs: list,
    bundle,
    p: GroundedParams,
    bg_seeds: list[int] | None = None,
    fg_seed_starts: list[int] | None = None,
    segmenter: masking.Segmenter | None = None,
    return_so_images: bool = False,
    pad_boxes_to: int | None = None,
    pad_objs_to: int | None = None,
    pad_positions_to: int | None = None,
    defer_fetch: bool = False,
) -> list[base.GenerationResult]:
    """pad_boxes_to / pad_objs_to / pad_positions_to: compile-budget floors.
    A serving driver that knows its whole workload can merge batch shape
    classes — pad the flat per-box batch to `pad_boxes_to` rows, floor the
    per-image object-count buckets (o_pad/bx_pad) at `pad_objs_to`, and
    floor the word-position bucket (p_pad) at `pad_positions_to` — trading
    linear pad compute for an XLA compile per avoided shape class (~10 min
    each on v5e, measured in BASELINE.md's production-workload table).
    Outputs are numerically equivalent, not bitwise: pad rows are sliced
    away before anything user-visible and floored buckets are masked, but
    floored bucket shapes change topk sort shapes and float reduction
    order — verified to pixel tolerance (tests/test_methods.py).

    defer_fetch=True leaves the final decoded images ON DEVICE: each
    result's .image is a base.ImageRef and the caller resolves them with
    base.finalize_results AFTER dispatching the next batch — cross-batch
    software pipelining that keeps the chip queue full through the fetch +
    PNG-save + host-prep gap between batches (byte-identical outputs,
    tests/test_methods.py)."""
    cfg = bundle.config
    H, W = cfg.latent_height, cfg.latent_width
    latent_hw = (H, W)
    num_levels = len(cfg.unet.block_out_channels)
    if p.guidance_attn_keys is None:
        p.guidance_attn_keys = guidance_lib.default_guidance_keys(cfg.unet)
    if p.obj_attn_key is None:
        p.obj_attn_key = guidance_lib.default_obj_attn_key(cfg.unet)
    segmenter = segmenter or masking.CoarseSegmenter()
    refine_cfg = masking.RefineConfig(use_box_input=p.use_box_input,
                                      mask_th_for_point=p.mask_th_for_point)

    # Mesh serving (dist/serve.py): when a mesh is active, batch inputs are
    # placed with their image/box axis sharded over "dp" and GSPMD carries
    # the layout through the jitted sampler scans. Identity when no mesh.
    def shard0(x):
        return serve_lib.shard_leading_axis(x, axis=0)

    def shard1(x):
        return serve_lib.shard_leading_axis(x, axis=1)

    g_count = len(specs)
    bg_seeds = bg_seeds or [p.bg_seed + i for i in range(g_count)]
    fg_seed_starts = fg_seed_starts or [p.fg_seed_start] * g_count
    frozen_steps = int(p.num_inference_steps *
                       min(max(p.frozen_step_ratio, 0.0), 1.0))
    schedule = sched.make_schedule(p.num_inference_steps, solver=p.scheduler)
    # Fast schedule (reference utils/schedule.py:4-8, lmd.py:278): the batch
    # shares ONE hyperparameter set, hence one truncated per-box grid — the
    # tail of the per-box passes only feeds mask extraction. Keeping
    # fast_after_steps >= frozen_steps (and >= overall_max_index_step when
    # ref-CA transfer is on) preserves trajectory/tap index alignment with
    # the full-grid overall pass (same constraint as _grounded.py:184-192).
    if p.use_fast_schedule:
        fast_after_steps = (
            max(frozen_steps, p.overall_max_index_step) if p.use_ref_ca
            else frozen_steps
        )
        so_schedule = sched.make_schedule(
            p.num_inference_steps, fast_after_steps=fast_after_steps,
            fast_rate=p.fast_rate, solver=p.scheduler)
    else:
        so_schedule = schedule

    # ---- per-image preprocessing -----------------------------------------
    images = []
    for spec, bg_seed, fg_start in zip(specs, bg_seeds, fg_seed_starts):
        conv = convert_spec(spec, *BOX_SCALE)
        so_list = conv.so_prompt_phrase_word_box
        if p.so_center_box:
            so_list = [
                (pr, ph, wd, boxlib.get_centered_box(
                    bx, horizontal_center_only=p.so_horizontal_center_only,
                    vertical_placement=p.so_vertical_placement,
                    floor_padding=p.so_floor_padding))
                for pr, ph, wd, bx in so_list
            ]
        images.append({
            "spec": spec, "conv": conv, "so_list": so_list,
            "bg_seed": bg_seed, "fg_seed_start": fg_start,
            "so_negative": base.with_extra_negative(spec, p.so_negative_prompt),
            "overall_negative": base.with_extra_negative(
                spec, p.overall_negative_prompt),
        })

    # ---- ONE batched per-box pass over every box of every image ----------
    flat = [(gi, item) for gi, im in enumerate(images)
            for item in im["so_list"]]
    n_real = len(flat)
    # Bucket the flat per-box batch: every distinct batch shape compiles its
    # own sampler scan, and the benchmark workload's 1-5 boxes per prompt
    # makes the raw sum take ~25 values across 8-image groups — a compile
    # storm. Pad rows duplicate the last box (independent along the batch
    # axis: no cross-sample reduction anywhere in the UNet/guidance path) and
    # every output is sliced back to the real rows below.
    n_total = _box_bucket(n_real)
    if pad_boxes_to is not None and n_real:
        assert pad_boxes_to >= n_real, (pad_boxes_to, n_real)
        n_total = pad_boxes_to
    if n_total > n_real:
        flat = flat + [flat[-1]] * (n_total - n_real)
    save_keys = tuple(dict.fromkeys((p.obj_attn_key, *p.guidance_attn_keys))) \
        if p.use_ref_ca else (p.obj_attn_key,)
    fuser_steps = (int(p.so_gligen_scheduled_sampling_beta
                       * so_schedule.num_steps)
                   if p.use_gligen else 0)
    so_spec = _make_guidance_spec(p, overall=False)
    use_so_guidance = so_spec.max_index_step > 0

    latents_bg_per_image = []
    if n_total:
        # Noise: per image, per its own seeds/blending.
        per_box_latents = []
        for gi, im in enumerate(images):
            boxes_i = [x[3] for x in im["so_list"]]
            fg_masks = [boxlib.box_to_mask(b, H, W) for b in boxes_i]
            lat_list, lat_bg = latents_lib.get_input_latents_list(
                im["bg_seed"], im["fg_seed_start"], fg_masks, (1, H, W, 4),
                fg_blending_ratio=p.fg_blending_ratio,
                init_noise_sigma=schedule.init_noise_sigma)
            per_box_latents.extend(lat_list)
            latents_bg_per_image.append(np.asarray(lat_bg))
        if n_total > n_real:
            per_box_latents += [per_box_latents[-1]] * (n_total - n_real)

        # ONE text-encoder call for prompts + negatives + GLIGEN phrases:
        # over the chip tunnel every dispatch pays RTT, so consolidating the
        # three encodes (and indexing the result on device) is a real win.
        so_prompts = [item[0] for _, item in flat]
        so_phrases = [item[1] for _, item in flat]
        neg_prompts = [im["so_negative"] for im in images]
        texts = so_prompts + neg_prompts + (so_phrases if p.use_gligen else [])
        enc_hidden, enc_pooled = runtime_models.encode_text(bundle, texts)
        cond = enc_hidden[:n_total]
        uncond_unique = enc_hidden[n_total:n_total + len(images)]
        uncond = uncond_unique[jnp.asarray([gi for gi, _ in flat])]
        text_embeddings = jnp.concatenate([uncond, cond], axis=0)

        word_token_indices = np.asarray([
            toklib.get_phrase_indices(bundle.tokenizer, item[0], [item[1]],
                                      words=[item[2]]).word_token_indices[0]
            for _, item in flat
        ], np.int32)

        gligen_inputs = (
            base.make_gligen_inputs_batched(
                bundle, [item[3] for _, item in flat], so_phrases,
                pooled=enc_pooled[n_total + len(images):])
            if p.use_gligen else None
        )

        # LMD regime: per-box CA guidance rides the batched guidance loop —
        # every box is an independent "image" with its own single-box
        # GuidanceData; converged boxes freeze individually (exactly the
        # sequential semantics of _grounded.py:233-243 across all images).
        so_data = None
        if use_so_guidance:
            so_positions = [
                toklib.get_phrase_indices(
                    bundle.tokenizer, prompt, [phrase],
                    words=[word]).object_positions
                for _, (prompt, phrase, word, _) in flat
            ]
            # Shared position pad across the batch (stacking requires it) —
            # bucketed to the actual need, not a fixed maximum.
            so_p_pad = guidance_lib.bucket(max(
                (len(pos) for obj_pos in so_positions for pos in obj_pos),
                default=1))
            so_datas = [
                guidance_lib.make_guidance_data(
                    [item[3]], obj_pos, so_spec, latent_hw, num_levels,
                    max_objs=1, max_positions=so_p_pad)
                for (_, item), obj_pos in zip(flat, so_positions)
            ]
            so_data = jax.tree_util.tree_map(
                shard0, guidance_lib.stack_guidance_data(so_datas))

        out = sample(
            bundle.unet, bundle.params["unet"], so_schedule,
            shard0(jnp.concatenate(per_box_latents, axis=0)),
            shard0(text_embeddings),
            cond_embeddings=shard0(cond) if use_so_guidance else None,
            guidance_scale=p.guidance_scale,
            spec=so_spec if use_so_guidance else None,
            guidance_data=so_data,
            guidance_batched=use_so_guidance,
            max_iter=p.max_iter,
            gligen=(tuple(shard0(g) for g in gligen_inputs)
                    if gligen_inputs is not None else None),
            num_fuser_steps=fuser_steps,
            save_all_latents=True, save_keys=save_keys,
            save_cond_only=True, save_single_token=True,
            tap_token_index=word_token_indices, solver=p.scheduler,
        )
        needs_pixels = (return_so_images
                        or getattr(segmenter, "needs_image", True))
        # to_host only when the caller wants the per-box images back; a
        # segmenter that accepts_device_arrays (FlaxSamSegmenter) consumes
        # them ON DEVICE — the decode→SAM handoff skips a ~25 MB uint8
        # round-trip over the chip tunnel per 16-box batch.
        to_host = (return_so_images or not getattr(
            segmenter, "accepts_device_arrays", False))
        so_images = (base.decode_latents(bundle, out.latents[:n_real],
                                         to_host=to_host)
                     if needs_pixels else [None] * n_real)
        # Trajectories and attention taps stay ON DEVICE when no alignment
        # shift is needed (LMD+ default): downloading+re-uploading them costs
        # ~100 MB of tunnel traffic per 4-image batch.
        on_device = not p.align_with_overall_bboxes
        obj_taps_np = None
        if on_device:
            all_latents_dev = out.all_latents
            taps_dev = out.saved_taps
            if not p.use_gligen:
                # LMD masks come from aggregated attention (host-side).
                obj_taps_np = np.asarray(
                    out.saved_taps[p.obj_attn_key][:, :n_real])
        else:
            # Slice the padded rows off on device before the download.
            all_latents_np = np.asarray(out.all_latents[:, :n_real])
            taps_np = {k: np.asarray(v[:, :n_real])
                       for k, v in out.saved_taps.items()}
            obj_taps_np = taps_np[p.obj_attn_key]
    else:
        for im in images:
            latents_bg_per_image.append(np.asarray(
                latents_lib.noise_from_seed(im["bg_seed"], (1, H, W, 4))
                * schedule.init_noise_sigma))

    # ---- per-image composition -------------------------------------------
    composed_list, data_list, ref_list, results_aux = [], [], [], []
    guid_raw, ref_raw = [], []
    overall_prompts, overall_negatives = [], []
    overall_spec = _make_guidance_spec(p, overall=True)

    # ALL boxes of ALL images segment in one batched call (one compiled SAM
    # encoder forward for the whole batch instead of a B=1 dispatch per box).
    n_flat = sum(len(im["so_list"]) for im in images)
    flat_images = [so_images[bi] for bi in range(n_flat)]
    if n_flat == 0:
        all_masks = []
    elif p.use_gligen:
        # LMD+: the box itself prompts the segmenter (sam.py:182-213).
        flat_boxes = [so[3] for im in images for so in im["so_list"]]
        all_masks = masking.refine_masks_from_boxes(
            flat_boxes, flat_images, latent_hw, segmenter, refine_cfg)
    else:
        # LMD: aggregated word-token attention prompts the segmenter
        # (reference lmd.py:124-147).
        attn_maps = [
            compose_lib.aggregate_token_attention(
                obj_taps_np[:, bi : bi + 1],
                start_step=p.attn_aggregation_step_start)
            for bi in range(n_flat)
        ]
        all_masks = masking.refine_masks_from_attn(
            attn_maps, flat_images, latent_hw, segmenter, refine_cfg)

    flat_idx = 0
    image_box_idxs = []
    for im in images:
        n_i = len(im["so_list"])
        image_box_idxs.append(list(range(flat_idx, flat_idx + n_i)))
        flat_idx += n_i

    # Device-path composition runs as ONE jitted call over the whole batch
    # (per-image device loops cost ~5 tunnel-RTT dispatches per image).
    fg_np_batched = None
    if n_total and on_device:
        composed_batched, fg_np_batched = _compose_batch_device(
            all_latents_dev, image_box_idxs, all_masks,
            np.concatenate(latents_bg_per_image, axis=0), frozen_steps)

    for gi, im in enumerate(images):
        conv = im["conv"]
        so_list = im["so_list"]
        n_i = len(so_list)
        idxs = image_box_idxs[gi]
        mask_list = [all_masks[bi] for bi in idxs]

        if n_total and on_device:
            fg_idx = fg_np_batched[gi]
            offsets = [(0.0, 0.0)] * n_i
        else:
            traj_list = ([all_latents_np[:, bi : bi + 1] for bi in idxs]
                         if n_i else [])
            host = compose_lib.compose_latents_with_alignment(
                traj_list, mask_list, latents_bg_per_image[gi],
                num_compose_steps=frozen_steps,
                align_with_overall_bboxes=p.align_with_overall_bboxes,
                overall_bboxes=[x[2] for x in conv.overall_phrases_words_bboxes],
                horizontal_shift_only=p.horizontal_shift_only)
            composed_list.append(jnp.asarray(host.latents))
            fg_idx = host.foreground_indices
            offsets = host.offsets
        results_aux.append({
            "frozen_mask": (fg_idx != 0).astype(np.float32),
            "foreground_indices": fg_idx,
            "so_image_ids": idxs,
            "masks": mask_list,
        })

        phrases = [x[0] for x in conv.overall_phrases_words_bboxes]
        words = [x[1] for x in conv.overall_phrases_words_bboxes]
        bboxes = [x[2] for x in conv.overall_phrases_words_bboxes]
        overall_prompt = conv.overall_prompt
        if phrases:
            indices = toklib.get_phrase_indices(
                bundle.tokenizer, overall_prompt, phrases, words=words,
                add_suffix_if_not_found=True)
            overall_prompt = indices.prompt
            guid_raw.append({
                "bboxes": bboxes,
                "positions": indices.object_positions,
                "wt": indices.word_token_indices,
                "ref": [o for o, bs in enumerate(bboxes) for _ in bs],
            })
        else:
            guid_raw.append({"bboxes": [], "positions": [], "wt": [],
                             "ref": []})
        if p.use_ref_ca and not (n_total and on_device):
            # Host path (alignment shifts). The device path is handled for
            # the whole batch at once by _gather_ref_batched below.
            ref_taps_per_box = [
                {k: v[:, bi, :, :, 0] for k, v in taps_np.items()
                 if k in p.guidance_attn_keys}
                for bi in idxs
            ] if n_i else []
            shifted = compose_lib.shift_ref_taps(
                ref_taps_per_box, offsets,
                horizontal_shift_only=p.horizontal_shift_only)
            ref_raw.append(("host", shifted))
        overall_prompts.append(overall_prompt)
        overall_negatives.append(im["overall_negative"])

    # Shared static pads for the batch, bucketed to the actual maxima: the
    # guidance loss sorts (G, O, P, heads, n) per topk, so a fixed 8/8/8 pad
    # on typical 2-box 1-word prompts cost 32x the necessary sort volume
    # (measured 9.15 ms per padded sort on v5e — ~55 ms/guidance iteration).
    o_pad = guidance_lib.bucket(max(
        (len(g["bboxes"]) for g in guid_raw), default=1))
    p_pad = guidance_lib.bucket(max(
        (len(pos) for g in guid_raw for pos in g["positions"]), default=1))
    bx_pad = guidance_lib.bucket(max(
        (len(g["ref"]) for g in guid_raw), default=1))
    if pad_objs_to is not None:
        # Compile-budget floor: unify the guided-overall-scan shape across
        # batches whose real object counts differ (its compile dominates a
        # cold run; the cost is extra topk sort volume on the padded axes).
        o_pad = max(o_pad, pad_objs_to)
        bx_pad = max(bx_pad, pad_objs_to)
    if pad_positions_to is not None:
        # Word-position counts (phrase tokenization) fragment otherwise-
        # equal classes: the 400-prompt run recompiled a (flat 24, o_pad 4)
        # batch solely because its plural phrases bumped p_pad (measured
        # 438 s). Floor it in compile-budget mode.
        p_pad = max(p_pad, pad_positions_to)
    for g in guid_raw:
        data_list.append(guidance_lib.make_guidance_data(
            g["bboxes"], g["positions"], overall_spec, latent_hw,
            num_levels, word_token_indices=g["wt"],
            ref_box_to_obj=g["ref"] if p.use_ref_ca else None,
            max_objs=o_pad, max_positions=p_pad, max_ref_boxes=bx_pad))
    for kind, payload in ref_raw:
        ref_list.append({k: jnp.asarray(v) for k, v in _pad_ref(
            payload, bx_pad, p, cfg, so_schedule.num_steps,
            latent_hw, num_levels).items()})

    # ---- ONE batched overall pass -----------------------------------------
    # Consolidated text encode: overall prompts + negatives + GLIGEN phrase
    # poolers in a single dispatch (see the per-box phase note).
    all_phrases = _overall_phrases(images) if p.use_gligen else []
    enc_hidden, enc_pooled = runtime_models.encode_text(
        bundle, overall_prompts + overall_negatives + all_phrases)
    cond = enc_hidden[:g_count]
    uncond = enc_hidden[g_count:2 * g_count]
    text_embeddings = jnp.concatenate([uncond, cond], axis=0)

    if n_total and on_device:
        frozen_latents = composed_batched        # (S+1, G, H, W, C)
        frozen_mask = jnp.asarray(
            (fg_np_batched != 0).astype(np.float32))  # (G, H, W)
    else:
        frozen_latents = jnp.concatenate(composed_list, axis=1)
        frozen_mask = jnp.asarray(np.stack(
            [aux["frozen_mask"] for aux in results_aux]))
    data_batched = guidance_lib.stack_guidance_data(data_list)
    ref_batched = None
    if p.use_ref_ca:
        if n_total and on_device:
            ref_batched = _gather_ref_batched(
                taps_dev, image_box_idxs, bx_pad, p.guidance_attn_keys)
        elif ref_list:
            ref_batched = {
                k: jnp.stack([jnp.asarray(r[k]) for r in ref_list], axis=1)
                for k in ref_list[0]   # (T, G, Bx, heads, n)
            }

    gligen_inputs = (
        _overall_gligen_batched(
            bundle, images, pooled=enc_pooled[2 * g_count:])
        if p.use_gligen else None)
    frozen_latents = shard1(frozen_latents)
    if ref_batched is not None:
        ref_batched = {k: shard1(v) for k, v in ref_batched.items()}
    out = sample(
        bundle.unet, bundle.params["unet"], schedule,
        frozen_latents[0], shard0(text_embeddings),
        cond_embeddings=shard0(cond),
        guidance_scale=p.guidance_scale,
        spec=overall_spec,
        guidance_data=jax.tree_util.tree_map(shard0, data_batched),
        max_iter=p.overall_max_iter, ref_taps=ref_batched,
        gligen=(tuple(shard0(g) for g in gligen_inputs)
                if gligen_inputs is not None else None),
        num_fuser_steps=(int(p.overall_gligen_scheduled_sampling_beta
                             * schedule.num_steps) if p.use_gligen else 0),
        frozen_mask=shard0(frozen_mask), frozen_latents=frozen_latents,
        num_frozen_steps=frozen_steps,
        guidance_batched=True, solver=p.scheduler,
    )
    final_images = base.decode_latents(bundle, out.latents,
                                       to_host=not defer_fetch)
    deferred = base.DeferredImages(final_images) if defer_fetch else None

    results = []
    for gi, aux in enumerate(results_aux):
        so_imgs = ([so_images[i] for i in aux["so_image_ids"]]
                   if return_so_images else [])
        results.append(base.GenerationResult(
            image=(base.ImageRef(deferred, gi) if defer_fetch
                   else final_images[gi]),
            so_img_list=so_imgs,
            aux={"frozen_mask": np.asarray(aux["frozen_mask"]),
                 "foreground_indices": aux["foreground_indices"],
                 "masks": aux["masks"]}))
    return results


@functools.partial(jax.jit, static_argnames=("s_plus",))
def _compose_batch_jit(all_latents, idx_map, masks, box_masks, labels, bg,
                       s_plus):
    """Whole-batch masked trajectory composition, one compiled dispatch.

    all_latents: (T+1, B_flat, H, W, C); idx_map: (G, n_max) flat box index
    per image in descending-mask-size order (padding rows point anywhere —
    their masks are zero); masks/box_masks: (G, n_max, H, W) f32 ordered the
    same way; labels: (G, n_max) original 1-based box index (0 = pad);
    bg: (G, H, W, C). Mirrors compose_lib.compose_latents: box-to-bg copy of
    the initial noise under the bbox, then largest-mask-first paste with
    later (smaller) masks overwriting."""
    traj = all_latents[:s_plus][:, idx_map]   # (s_plus, G, n_max, H, W, C)
    n_max = idx_map.shape[1]

    comp0 = bg
    for j in range(n_max):
        bm = box_masks[:, j][..., None]                      # (G, H, W, 1)
        comp0 = comp0 * (1.0 - bm) + traj[0, :, j] * bm

    composed = jnp.zeros((s_plus,) + comp0.shape, comp0.dtype)
    composed = composed.at[0].set(comp0)
    fg = jnp.zeros(masks.shape[:1] + masks.shape[2:], jnp.int32)  # (G, H, W)
    for j in range(n_max):
        m = masks[:, j]                                      # (G, H, W)
        fg = jnp.where(m > 0, labels[:, j][:, None, None], fg)
        me = m[None, :, :, :, None]                          # (1, G, H, W, 1)
        composed = composed * (1.0 - me) + traj[:, :, j] * me
    return composed, fg


def _compose_batch_device(all_latents, image_box_idxs, mask_flat, latents_bg,
                          num_compose_steps):
    """Host-side prep for _compose_batch_jit: per-image mask ordering and
    padding to a bucketed shared box count.

    all_latents: (T+1, B_flat, H, W, C) device; image_box_idxs: per image the
    flat box indices; mask_flat: flat list of host (H, W) masks; latents_bg:
    (G, H, W, C) host. Returns (composed (S+1, G, H, W, C) device,
    fg (G, H, W) np.int32)."""
    g_count = len(image_box_idxs)
    h, w = np.asarray(mask_flat[0]).shape if mask_flat else latents_bg.shape[1:3]
    n_max = guidance_lib.bucket(max(
        (len(idxs) for idxs in image_box_idxs), default=1))

    idx_map = np.zeros((g_count, n_max), np.int32)
    masks = np.zeros((g_count, n_max, h, w), np.float32)
    box_masks = np.zeros_like(masks)
    labels = np.zeros((g_count, n_max), np.int32)
    for gi, idxs in enumerate(image_box_idxs):
        ms = [np.asarray(mask_flat[bi], np.float32) for bi in idxs]
        order = np.argsort([-m.sum() for m in ms]) if ms else []
        for j, oi in enumerate(order):
            idx_map[gi, j] = idxs[oi]
            masks[gi, j] = ms[oi]
            box_masks[gi, j] = boxlib.mask_to_box_mask(ms[oi])
            labels[gi, j] = oi + 1

    composed, fg = _compose_batch_jit(
        all_latents, jnp.asarray(idx_map), jnp.asarray(masks),
        jnp.asarray(box_masks), jnp.asarray(labels),
        jnp.asarray(np.asarray(latents_bg, np.float32)),
        s_plus=num_compose_steps + 1)
    return composed, np.asarray(fg)


@jax.jit
def _gather_ref_jit(taps, idx_map, valid):
    # NOTE: index in two steps — v[:, idx_map, :, :, 0] is *mixed* advanced
    # indexing (array + separated integer), which moves the gathered dims to
    # the front instead of keeping them in place.
    return {
        k: v[..., 0][:, idx_map] * valid[None, :, :, None, None]
        for k, v in taps.items()
    }


def _gather_ref_batched(taps_dev, image_box_idxs, max_boxes, keys):
    """Device-path reference-CA padding for the whole batch: one gather per
    key over the flat tap stacks -> {key: (T, G, Bx, heads, n)} with padded
    box rows zeroed (replaces per-image slicing + stacking)."""
    g_count = len(image_box_idxs)
    idx_map = np.zeros((g_count, max_boxes), np.int32)
    valid = np.zeros((g_count, max_boxes), np.float32)
    for gi, idxs in enumerate(image_box_idxs):
        n_i = min(len(idxs), max_boxes)
        idx_map[gi, :n_i] = idxs[:n_i]
        valid[gi, :n_i] = 1.0
    return _gather_ref_jit(
        {k: taps_dev[k] for k in keys},
        jnp.asarray(idx_map), jnp.asarray(valid))


def _key_heads(key, cfg):
    place, idx = key[0], key[1]
    levels = len(cfg.unet.block_out_channels)
    level = {"down": idx, "mid": levels - 1, "up": levels - 1 - idx}[place]
    return cfg.unet.num_attention_heads[level]


def _pad_ref(shifted, max_boxes, p, cfg, num_steps, latent_hw, num_levels):
    """Pad per-image shifted ref taps {key: (T, Bx, heads, n)} to max_boxes
    along the box axis (zeros; matching zero box_weight rows). Zero-box
    images emit all-zero stacks with the model's true head counts so every
    image stacks into one (T, G, Bx, heads, n) array."""
    from ..sampling.guidance import key_resolution

    out = {}
    for key in p.guidance_attn_keys:
        h, w = key_resolution(key, latent_hw, num_levels)
        heads = _key_heads(key, cfg)
        if shifted is not None and key in shifted:
            arr = np.asarray(shifted[key])
            t_dim = arr.shape[0]
        else:
            arr = None
            t_dim = num_steps
        padded = np.zeros((t_dim, max_boxes, heads, h * w), np.float32)
        if arr is not None:
            padded[:, :arr.shape[1]] = arr
        out[key] = padded
    return out


def _overall_phrases(images) -> list[str]:
    """Flat per-box phrase list across the batch, in _overall_gligen_batched
    span order — lets callers fold the phrase encode into a consolidated
    encode_text call and inject the pooled slice back via `pooled`."""
    out = []
    for im in images:
        conv = im["conv"]
        out.extend(ph for ph, _, bs in conv.overall_phrases_words_bboxes
                   for _ in bs)
    return out


def _overall_gligen_batched(bundle, images, pooled=None):
    """Per-image overall grounding: image i grounds all of its boxes."""
    max_objs = bundle.config.unet.gligen_max_objs
    g_count = len(images)
    width = bundle.config.clip.hidden_size

    all_phrases = []
    spans = []
    for im in images:
        conv = im["conv"]
        phrases = [ph for ph, _, bs in conv.overall_phrases_words_bboxes
                   for _ in bs]
        boxes = boxlib.expand_overall_bboxes(
            [bs for _, _, bs in conv.overall_phrases_words_bboxes])
        spans.append((len(all_phrases), phrases, boxes))
        all_phrases.extend(phrases)

    if pooled is None and all_phrases:
        pooled = runtime_models.encode_text(bundle, all_phrases)[1]
    pooled = (np.asarray(pooled) if all_phrases
              else np.zeros((0, width), np.float32))

    boxes_arr = np.zeros((g_count, max_objs, 4), np.float32)
    embs = np.zeros((g_count, max_objs, width), np.float32)
    masks = np.zeros((g_count, max_objs), np.float32)
    for gi, (start, phrases, boxes) in enumerate(spans):
        n = min(len(boxes), max_objs)
        if n:
            boxes_arr[gi, :n] = np.asarray(boxes, np.float32)[:n]
            embs[gi, :n] = pooled[start : start + n]
            masks[gi, :n] = 1.0

    boxes2 = np.concatenate([boxes_arr, boxes_arr], axis=0)
    embs2 = np.concatenate([embs, embs], axis=0)
    masks2 = np.concatenate([np.zeros_like(masks), masks], axis=0)
    objs_full = runtime_models.gligen_objs(bundle, boxes2, masks2, embs2)
    return objs_full, objs_full[g_count:]


def run_lmd_batch(specs, bundle, segmenter=None, **overrides):
    """Batched training-free LMD over a list of specs; one GenerationResult
    per spec. Hyperparameters are shared across the batch (LMD defaults,
    methods/lmd.py)."""
    defaults = dict(
        so_negative_prompt=DEFAULT_SO_NEGATIVE_PROMPT,
        overall_negative_prompt=DEFAULT_OVERALL_NEGATIVE_PROMPT,
        use_gligen=False,
        max_index_step=30,
        so_center_box=True,
        so_horizontal_center_only=False,
        fg_blending_ratio=0.01,
        align_with_overall_bboxes=True,
        horizontal_shift_only=False,
    )
    bg_seeds = overrides.pop("bg_seeds", None)
    fg_seed_starts = overrides.pop("fg_seed_starts", None)
    return_so_images = overrides.pop("return_so_images", False)
    pad_boxes_to = overrides.pop("pad_boxes_to", None)
    pad_objs_to = overrides.pop("pad_objs_to", None)
    pad_positions_to = overrides.pop("pad_positions_to", None)
    defer_fetch = overrides.pop("defer_fetch", False)
    params = GroundedParams(**{**defaults, **overrides})
    return run_grounded_batch(specs, bundle, params, bg_seeds=bg_seeds,
                              fg_seed_starts=fg_seed_starts,
                              segmenter=segmenter,
                              return_so_images=return_so_images,
                              pad_boxes_to=pad_boxes_to,
                              pad_objs_to=pad_objs_to,
                              pad_positions_to=pad_positions_to,
                              defer_fetch=defer_fetch)


def run_lmd_plus_batch(specs, bundle, segmenter=None, **overrides):
    """Batched LMD+ over a list of specs; returns one GenerationResult per
    spec. Hyperparameters are shared across the batch (LMD+ defaults,
    methods/lmd_plus.py)."""
    defaults = dict(
        so_negative_prompt=DEFAULT_SO_NEGATIVE_PROMPT,
        overall_negative_prompt=DEFAULT_OVERALL_NEGATIVE_PROMPT,
        use_gligen=True,
        so_gligen_scheduled_sampling_beta=0.4,
        overall_gligen_scheduled_sampling_beta=0.4,
        max_index_step=0,
        so_center_box=False,
        so_horizontal_center_only=True,
        fg_blending_ratio=0.1,
        align_with_overall_bboxes=False,
        horizontal_shift_only=True,
    )
    bg_seeds = overrides.pop("bg_seeds", None)
    fg_seed_starts = overrides.pop("fg_seed_starts", None)
    return_so_images = overrides.pop("return_so_images", False)
    pad_boxes_to = overrides.pop("pad_boxes_to", None)
    pad_objs_to = overrides.pop("pad_objs_to", None)
    pad_positions_to = overrides.pop("pad_positions_to", None)
    defer_fetch = overrides.pop("defer_fetch", False)
    params = GroundedParams(**{**defaults, **overrides})
    return run_grounded_batch(specs, bundle, params, bg_seeds=bg_seeds,
                              fg_seed_starts=fg_seed_starts,
                              segmenter=segmenter,
                              return_so_images=return_so_images,
                              pad_boxes_to=pad_boxes_to,
                              pad_objs_to=pad_objs_to,
                              pad_positions_to=pad_positions_to,
                              defer_fetch=defer_fetch)
