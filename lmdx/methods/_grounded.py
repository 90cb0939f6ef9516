"""Shared LMD / LMD+ orchestration.

The two flagship methods share one skeleton (reference generation/lmd.py:215,
generation/lmd_plus.py:193):

  1. convert the layout spec into per-box and overall prompts;
  2. run one full diffusion pass per box (optionally CA-guided, optionally
     GLIGEN-grounded), capturing the latent trajectory and tapped
     cross-attention maps;
  3. refine each object's foreground mask (attention-prompted for LMD,
     box-prompted for LMD+);
  4. compose the per-box trajectories into the background trajectory under
     the masks (largest first, optional center alignment);
  5. regenerate the overall prompt from the composed latents with the
     foreground frozen for the first `frozen_steps` and cross-attention
     energy guidance (optionally transferring per-box reference attention).

Per-box passes differ between methods only in flags, so both methods call
`run_grounded` with their default bundles of hyperparameters.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np

from ..core import boxes as boxlib
from ..core import schedule as sched
from ..runtime import models as runtime_models
from ..sampling import compose as compose_lib
from ..sampling import guidance as guidance_lib
from ..sampling import latents as latents_lib
from ..sampling import masking
from ..sampling.loop import sample
from ..text import tokens as toklib
from ..text.parser import BOX_SCALE, convert_spec
from . import base

@dataclass
class GroundedParams:
    """Hyperparameters shared by LMD and LMD+ (defaults = LMD,
    generation/lmd.py:215-255; LMD+ overrides in methods/lmd_plus.py)."""

    bg_seed: int = 1
    fg_seed_start: int = 20
    overall_prompt_override: str = ""
    frozen_step_ratio: float = 0.5
    num_inference_steps: int = 50
    guidance_scale: float = 7.5

    loss_scale: float = 5.0
    loss_threshold: float = 5.0
    max_iter: object = None  # default schedule set in __post_init__
    max_index_step: int = 30
    overall_loss_scale: float = 5.0
    overall_loss_threshold: float = 5.0
    overall_max_iter: object = None
    overall_max_index_step: int = 30

    fg_top_p: float = 0.2
    bg_top_p: float = 0.2
    overall_fg_top_p: float = 0.2
    overall_bg_top_p: float = 0.2
    fg_weight: float = 1.0
    bg_weight: float = 4.0
    overall_fg_weight: float = 1.0
    overall_bg_weight: float = 4.0
    ref_ca_loss_weight: float = 2.0

    so_center_box: bool = True
    so_horizontal_center_only: bool = False
    so_vertical_placement: str = "floor_padding"
    so_floor_padding: float = 0.2
    fg_blending_ratio: float = 0.01
    align_with_overall_bboxes: bool = True
    horizontal_shift_only: bool = False
    use_fast_schedule: bool = False
    fast_rate: int = 2
    use_ref_ca: bool = True
    scheduler: str = "ddim"

    so_negative_prompt: str = ""
    overall_negative_prompt: str = ""

    # GLIGEN (LMD+ only)
    use_gligen: bool = False
    so_gligen_scheduled_sampling_beta: float = 0.4
    overall_gligen_scheduled_sampling_beta: float = 0.4

    # Mask refinement
    use_box_input: bool = False  # SAM prompt style for the attention path
    mask_th_for_point: float = 0.25

    # None -> derived from the UNet topology (for SD1.x this reproduces the
    # reference's DEFAULT_GUIDANCE_ATTN_KEYS / ("down", 2, 1, 0) exactly).
    guidance_attn_keys: tuple | None = None
    # Attention key whose single-token map seeds mask extraction
    # (reference lmd.py:418), and the step from which maps are aggregated
    # (reference lmd.py:36).
    obj_attn_key: tuple | None = None
    attn_aggregation_step_start: int = 10

    def __post_init__(self):
        default_iters = [4] * 5 + [3] * 5 + [2] * 5 + [2] * 5 + [1] * 10
        if self.max_iter is None:
            self.max_iter = default_iters
        if self.overall_max_iter is None:
            self.overall_max_iter = default_iters


def _make_guidance_spec(p: GroundedParams, overall: bool) -> guidance_lib.GuidanceSpec:
    if overall:
        return guidance_lib.GuidanceSpec(
            keys=tuple(p.guidance_attn_keys),
            loss_scale=p.overall_loss_scale,
            loss_threshold=p.overall_loss_threshold,
            max_index_step=p.overall_max_index_step,
            fg_top_p=p.overall_fg_top_p,
            bg_top_p=p.overall_bg_top_p,
            fg_weight=p.overall_fg_weight,
            bg_weight=p.overall_bg_weight,
            use_ref_ca=p.use_ref_ca,
            ref_ca_loss_weight=p.ref_ca_loss_weight,
        )
    return guidance_lib.GuidanceSpec(
        keys=tuple(p.guidance_attn_keys),
        loss_scale=p.loss_scale,
        loss_threshold=p.loss_threshold,
        max_index_step=p.max_index_step,
        fg_top_p=p.fg_top_p,
        bg_top_p=p.bg_top_p,
        fg_weight=p.fg_weight,
        bg_weight=p.bg_weight,
    )


def run_grounded(spec, bundle, p: GroundedParams,
                 segmenter: masking.Segmenter | None = None,
                 refine_cfg: masking.RefineConfig | None = None,
                 return_so_images: bool = True) -> base.GenerationResult:
    cfg = bundle.config
    H, W = cfg.latent_height, cfg.latent_width
    num_levels = len(cfg.unet.block_out_channels)
    latent_hw = (H, W)
    if p.guidance_attn_keys is None:
        p.guidance_attn_keys = guidance_lib.default_guidance_keys(cfg.unet)
    if p.obj_attn_key is None:
        p.obj_attn_key = guidance_lib.default_obj_attn_key(cfg.unet)
    segmenter = segmenter or masking.CoarseSegmenter()
    refine_cfg = refine_cfg or masking.RefineConfig(
        use_box_input=p.use_box_input, mask_th_for_point=p.mask_th_for_point)

    frozen_ratio = min(max(p.frozen_step_ratio, 0.0), 1.0)
    frozen_steps = int(p.num_inference_steps * frozen_ratio)

    converted = convert_spec(spec, *BOX_SCALE)
    so_list = converted.so_prompt_phrase_word_box
    overall_prompt = converted.overall_prompt
    if p.overall_prompt_override.strip():
        overall_prompt = p.overall_prompt_override.strip()
    overall_phrases = [x[0] for x in converted.overall_phrases_words_bboxes]
    overall_words = [x[1] for x in converted.overall_phrases_words_bboxes]
    overall_bboxes = [x[2] for x in converted.overall_phrases_words_bboxes]

    # Per-box boxes are optionally centered; overall boxes keep placement.
    if p.so_center_box:
        so_list = [
            (prompt, phrase, word,
             boxlib.get_centered_box(
                 box, horizontal_center_only=p.so_horizontal_center_only,
                 vertical_placement=p.so_vertical_placement,
                 floor_padding=p.so_floor_padding))
            for prompt, phrase, word, box in so_list
        ]
    so_boxes = [x[3] for x in so_list]

    so_negative = base.with_extra_negative(spec, p.so_negative_prompt)
    overall_negative = base.with_extra_negative(spec, p.overall_negative_prompt)

    schedule = sched.make_schedule(p.num_inference_steps, solver=p.scheduler)

    if p.use_fast_schedule:
        fast_after_steps = (
            max(frozen_steps, p.overall_max_index_step) if p.use_ref_ca
            else frozen_steps
        )
        so_schedule = sched.make_schedule(
            p.num_inference_steps, fast_after_steps=fast_after_steps,
            fast_rate=p.fast_rate, solver=p.scheduler,
        )
    else:
        so_schedule = schedule

    # ---- per-box passes -------------------------------------------------
    latents_all_list, mask_list, ref_taps_per_box, so_images = [], [], [], []
    if so_list:
        so_prompts = [x[0] for x in so_list]
        so_uncond, so_cond = runtime_models.encode_prompts(
            bundle, so_prompts, so_negative, one_uncond_input_only=True)

        fg_masks = [boxlib.box_to_mask(b, H, W) for b in so_boxes]
        input_latents_list, latents_bg = latents_lib.get_input_latents_list(
            p.bg_seed, p.fg_seed_start, fg_masks,
            (1, H, W, 4), fg_blending_ratio=p.fg_blending_ratio,
            init_noise_sigma=schedule.init_noise_sigma,
        )

        so_spec = _make_guidance_spec(p, overall=False)
        use_so_guidance = so_spec.max_index_step > 0
        save_keys = (p.obj_attn_key,)
        if p.use_ref_ca:
            save_keys = tuple(dict.fromkeys(
                (p.obj_attn_key, *p.guidance_attn_keys)))

        word_token_indices = [
            toklib.get_phrase_indices(bundle.tokenizer, prompt, [phrase],
                                      words=[word]).word_token_indices[0]
            for prompt, phrase, word, _ in so_list
        ]
        fuser_steps = (
            int(p.so_gligen_scheduled_sampling_beta * so_schedule.num_steps)
            if p.use_gligen else 0
        )

        # All per-box passes ride ONE batched sampler call (batch = box
        # count) — a large MXU-utilization win over the reference's
        # sequential per-box diffusions (lmd.py:162-189, lmd_plus.py:162-189).
        # When per-box guidance is on (LMD), each box is an independent
        # "image" for the batched guidance loop: per-box GuidanceData stacks
        # along the batch axis and converged boxes freeze individually.
        n = len(so_list)
        so_data = None
        if use_so_guidance:
            so_positions = [
                toklib.get_phrase_indices(
                    bundle.tokenizer, prompt, [phrase],
                    words=[word]).object_positions
                for prompt, phrase, word, _ in so_list
            ]
            # Shared position pad across boxes (stacking requires it),
            # bucketed to the actual need (see make_guidance_data).
            so_p_pad = guidance_lib.bucket(max(
                (len(pos) for obj_pos in so_positions for pos in obj_pos),
                default=1))
            so_datas = [
                guidance_lib.make_guidance_data(
                    [box], obj_pos, so_spec, latent_hw, num_levels,
                    max_objs=1, max_positions=so_p_pad)
                for (_, _, _, box), obj_pos in zip(so_list, so_positions)
            ]
            so_data = guidance_lib.stack_guidance_data(so_datas)
        batched_latents = jnp.concatenate(input_latents_list, axis=0)
        text_embeddings = jnp.concatenate(
            [jnp.repeat(so_uncond, n, axis=0), so_cond], axis=0)
        gligen_inputs = (
            base.make_gligen_inputs_batched(
                bundle, [x[3] for x in so_list], [x[1] for x in so_list])
            if p.use_gligen else None
        )
        out = sample(
            bundle.unet, bundle.params["unet"], so_schedule,
            batched_latents, text_embeddings,
            cond_embeddings=so_cond if use_so_guidance else None,
            guidance_scale=p.guidance_scale,
            spec=so_spec if use_so_guidance else None,
            guidance_data=so_data,
            guidance_batched=use_so_guidance,
            max_iter=p.max_iter,
            gligen=gligen_inputs, num_fuser_steps=fuser_steps,
            save_all_latents=True, save_keys=save_keys,
            save_cond_only=True, save_single_token=True,
            tap_token_index=np.asarray(word_token_indices, np.int32),
            solver=p.scheduler,
        )
        all_latents, saved_taps, final_latents = (
            out.all_latents, out.saved_taps, out.latents)

        so_images_arr = (
            base.decode_latents(
                bundle, final_latents,
                to_host=(return_so_images or not getattr(
                    segmenter, "accepts_device_arrays", False)))
            if (return_so_images
                or (segmenter is not None
                    and getattr(segmenter, "needs_image", True))) else None
        )

        all_latents_np = np.asarray(all_latents)
        saved_taps_np = {k: np.asarray(v) for k, v in saved_taps.items()}
        img_list = [
            so_images_arr[idx] if so_images_arr is not None else None
            for idx in range(n)
        ]
        # Every box segments in ONE batched call (one compiled SAM encoder
        # forward instead of a B=1 dispatch per box).
        if p.use_gligen:
            # LMD+: the box itself prompts the segmenter (sam.py:182-213).
            masks = masking.refine_masks_from_boxes(
                [box for _, _, _, box in so_list], img_list, latent_hw,
                segmenter, refine_cfg)
        else:
            # LMD: aggregated word-token attention prompts the segmenter.
            attn_maps = [
                compose_lib.aggregate_token_attention(
                    saved_taps_np[p.obj_attn_key][:, idx : idx + 1],
                    start_step=p.attn_aggregation_step_start)
                for idx in range(n)
            ]
            masks = masking.refine_masks_from_attn(
                attn_maps, img_list, latent_hw, segmenter, refine_cfg)
        for idx, mask in enumerate(masks):
            so_image = img_list[idx]
            latents_all_list.append(all_latents_np[:, idx : idx + 1])
            mask_list.append(mask)
            if p.use_ref_ca:
                ref_taps_per_box.append({
                    k: v[:, idx, :, :, 0]  # (T, heads, n)
                    for k, v in saved_taps_np.items()
                    if k in p.guidance_attn_keys
                })
            if return_so_images:
                so_images.append(so_image)
    else:
        latents_bg = latents_lib.noise_from_seed(
            p.bg_seed, (1, H, W, 4)) * schedule.init_noise_sigma

    # ---- composition ----------------------------------------------------
    composed = compose_lib.compose_latents_with_alignment(
        latents_all_list, mask_list, np.asarray(latents_bg),
        num_compose_steps=frozen_steps,
        align_with_overall_bboxes=p.align_with_overall_bboxes,
        overall_bboxes=overall_bboxes,
        horizontal_shift_only=p.horizontal_shift_only,
    )
    frozen_mask = (composed.foreground_indices != 0).astype(np.float32)

    # ---- overall pass ---------------------------------------------------
    overall_spec = None
    overall_data = None
    ref_taps = None
    if so_list:
        indices = toklib.get_phrase_indices(
            bundle.tokenizer, overall_prompt, overall_phrases,
            words=overall_words, add_suffix_if_not_found=True)
        overall_prompt = indices.prompt

        overall_spec = _make_guidance_spec(p, overall=True)
        ref_box_to_obj = [
            obj for obj, bboxes in enumerate(overall_bboxes) for _ in bboxes
        ]
        overall_data = guidance_lib.make_guidance_data(
            overall_bboxes, indices.object_positions, overall_spec, latent_hw,
            num_levels,
            word_token_indices=indices.word_token_indices,
            ref_box_to_obj=ref_box_to_obj if p.use_ref_ca else None,
        )
        if p.use_ref_ca and ref_taps_per_box:
            ref_taps = compose_lib.shift_ref_taps(
                ref_taps_per_box, composed.offsets,
                horizontal_shift_only=p.horizontal_shift_only)
            ref_taps = {k: jnp.asarray(v) for k, v in ref_taps.items()}

    uncond, cond = runtime_models.encode_prompts(
        bundle, [overall_prompt], overall_negative)
    text_embeddings = jnp.concatenate([uncond, cond], axis=0)

    gligen_inputs = None
    fuser_steps = 0
    if p.use_gligen and so_list:
        flat_boxes = boxlib.expand_overall_bboxes(overall_bboxes)
        flat_phrases = [
            phrase for phrase, _, bboxes in converted.overall_phrases_words_bboxes
            for _ in bboxes
        ]
        gligen_inputs = base.make_gligen_inputs(bundle, flat_boxes, flat_phrases)
        fuser_steps = int(
            p.overall_gligen_scheduled_sampling_beta * schedule.num_steps)

    out = sample(
        bundle.unet, bundle.params["unet"], schedule,
        jnp.asarray(composed.latents[0]), text_embeddings,
        cond_embeddings=cond,
        guidance_scale=p.guidance_scale,
        spec=overall_spec,
        guidance_data=overall_data,
        max_iter=p.overall_max_iter,
        ref_taps=ref_taps,
        gligen=gligen_inputs,
        num_fuser_steps=fuser_steps,
        frozen_mask=frozen_mask if so_list else None,
        frozen_latents=jnp.asarray(composed.latents) if so_list else None,
        num_frozen_steps=frozen_steps if so_list else 0,
        solver=p.scheduler,
    )

    images = base.decode_latents(bundle, out.latents)
    return base.GenerationResult(
        image=images[0], so_img_list=so_images,
        aux={"masks": mask_list,
             "frozen_mask": frozen_mask,
             "foreground_indices": composed.foreground_indices},
    )
