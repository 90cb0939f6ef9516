"""Jit-compiled denoising loops.

TPU-first redesign of the reference sampler layer (models/pipelines.py:
generate_semantic_guidance :129, generate_gligen :323, generate_partial_frozen
:541, generate :249 — all four collapse into ONE implementation here):

- The whole N-step sampler is `lax.scan`, not a Python loop: no per-step
  dispatch, no host round-trips, trajectories are scan outputs with static
  shapes (the reference offloads a Python list to CPU each step,
  pipelines.py:143-148).
- Phase boundaries — GLIGEN scheduled-sampling cutoff, frozen-step splicing,
  guidance max_index_step — are *static segment boundaries*: the run is split
  into consecutive scans, each compiled with exactly the features its steps
  need. No masked no-op UNet calls, no wasted FLOPs.
- The per-step guidance optimization is a `lax.while_loop` with
  `jax.value_and_grad` through the tapped UNet (see sampling/guidance.py).
- Everything per-prompt (box masks, token positions, GLIGEN slots) is padded
  to static shapes, so each segment compiles once and is reused across all
  prompts, boxes, and methods.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

from ..core import schedule as sched
from ..nn.attention import NO_TAPS, AttnKey, TapSpec
from ..nn.unet import apply_unet
from . import boxdiff as boxdiff_lib
from . import guidance as guidance_lib


@dataclass(frozen=True)
class SegmentStatic:
    """Everything compile-time about one scan segment."""

    guidance: bool = False
    frozen: bool = False
    fuser: bool = False          # GLIGEN fusers active in this segment
    gligen: bool = False         # grounding tokens exist at all
    save_latents: bool = False
    save_taps: bool = False
    guidance_scale: float = 7.5
    spec: guidance_lib.GuidanceSpec | None = None
    save_keys: tuple[AttnKey, ...] = ()
    save_cond_only: bool = False
    save_single_token: bool = False
    ref_ca: bool = False
    solver: str = "ddim"          # "ddim" | "dpmpp_2m"
    guidance_batched: bool = False  # per-image loss vector over batch G


class SampleOutput(NamedTuple):
    latents: jnp.ndarray                 # (B, H, W, C) final
    all_latents: jnp.ndarray | None      # (T+1, B, H, W, C) trajectory
    saved_taps: dict | None              # {AttnKey: (T, ...)} from the main forward
    final_loss: jnp.ndarray


@functools.partial(jax.jit, static_argnames=("unet", "static"))
def _run_segment(unet, static: SegmentStatic, params, schedule: sched.Schedule,
                 carry, xs, consts):
    """One scan over a contiguous run of steps sharing static features.

    carry: (latents (B,H,W,C) f32, loss () f32,
            prev_x0 (B,H,W,C) f32, prev_t () i32) — multistep solver state
    xs: dict of per-step arrays — t, prev_t, max_iter, frozen_next?, ref?
    consts: dict of per-run arrays — text_embeddings (2B,L,D),
        cond_embeddings (B,L,D), objs (2B,M,D)?, objs_null (B,M,D)?,
        frozen_mask (H,W)?, guidance_data?, tap_token_index?
    """
    text_embeddings = consts["text_embeddings"]
    fuser_gate = 1.0

    objs_full = consts.get("objs") if static.gligen and static.fuser else None
    objs_null = consts.get("objs_null") if static.gligen and static.fuser else None

    save_tapspec = (
        TapSpec(keys=static.save_keys, cond_only=static.save_cond_only,
                single_token=static.save_single_token)
        if static.save_taps else NO_TAPS
    )
    tap_token_index = consts.get("tap_token_index")
    added_full = {
        "added_text_embeds": consts.get("added_text_embeds"),
        "added_time_ids": consts.get("added_time_ids"),
    }
    added_cond = {
        "added_text_embeds": consts.get("added_text_embeds_cond"),
        "added_time_ids": consts.get("added_time_ids_cond"),
    }

    def step(carry, x):
        latents, loss, prev_x0, prev_tc = carry
        t, prev_t = x["t"], x["prev_t"]

        if static.guidance:
            cond_embeddings = consts["cond_embeddings"]

            def unet_taps(lat):
                # Early-exit forward: blocks after the last tapped layer are
                # never computed (their fwd AND bwd are dead w.r.t. the loss).
                _, taps = apply_unet(
                    unet, params, lat, t, cond_embeddings,
                    objs=objs_null, fuser_gate=fuser_gate,
                    taps=static.spec.tap_spec, stop_after_taps=True,
                    **added_cond,
                )
                return taps

            if isinstance(static.spec, boxdiff_lib.BoxDiffSpec):
                latents, loss = boxdiff_lib.boxdiff_update(
                    unet_taps, latents,
                    step_index=x["step_index"],
                    num_steps=schedule.num_steps,
                    data=consts["guidance_data"], spec=static.spec,
                )
            elif static.guidance_batched:
                latents, loss = guidance_lib.guidance_update_batched(
                    unet_taps, latents, loss,
                    step_size=sched.guidance_step_size(
                        schedule, t, solver=static.solver),
                    max_iter=x["max_iter"],
                    data=consts["guidance_data"], spec=static.spec,
                    ref_taps=x.get("ref"),
                )
            else:
                latents, loss = guidance_lib.guidance_update(
                    unet_taps, latents, loss,
                    step_size=sched.guidance_step_size(
                        schedule, t, solver=static.solver),
                    max_iter=x["max_iter"],
                    data=consts["guidance_data"], spec=static.spec,
                    ref_taps=x.get("ref"),
                )

        latent_in = jnp.concatenate([latents, latents], axis=0)
        if static.solver == "euler":
            # Samples live in sigma-space; the UNet wants VP-scaled inputs.
            latent_in = sched.euler_scale_model_input(latent_in, x["sigma"])
        eps, taps = apply_unet(
            unet, params, latent_in, t, text_embeddings,
            objs=objs_full, fuser_gate=fuser_gate,
            taps=save_tapspec, tap_token_index=tap_token_index, **added_full,
        )
        eps_uncond, eps_cond = jnp.split(eps, 2, axis=0)
        eps = eps_uncond + static.guidance_scale * (eps_cond - eps_uncond)

        if static.solver == "dpmpp_2m":
            latents, x0 = sched.dpmpp_2m_step(
                schedule, eps, t, prev_t, latents, prev_x0, prev_tc,
                force_first_order=x["dpm_first"])
            prev_x0, prev_tc = x0, t
        elif static.solver == "euler":
            latents = sched.euler_step(eps, x["sigma"], x["sigma_next"],
                                       latents)
        else:
            latents = sched.ddim_step(schedule, eps, t, prev_t, latents)

        if static.frozen:
            fm = consts["frozen_mask"]
            m = (fm[None, :, :, None] if fm.ndim == 2  # shared (H, W)
                 else fm[:, :, :, None])               # per-image (G, H, W)
            latents = x["frozen_next"] * m + latents * (1.0 - m)

        ys = {}
        if static.save_latents:
            ys["latents"] = latents
        if static.save_taps:
            ys["taps"] = taps
        return (latents, loss, prev_x0, prev_tc), ys

    return jax.lax.scan(step, carry, xs)


def _segment_boundaries(num_steps: int, *cuts: int) -> list[tuple[int, int]]:
    points = sorted({0, num_steps, *(min(max(c, 0), num_steps) for c in cuts)})
    return [(a, b) for a, b in zip(points[:-1], points[1:]) if b > a]


def _stack_max_iter(max_iter, num_steps: int) -> jnp.ndarray:
    """Per-step iteration budgets; scalars broadcast, short lists extend with
    their last value (reference pipelines.py:21-25)."""
    if isinstance(max_iter, (int, float)):
        vals = [int(max_iter)] * num_steps
    else:
        vals = [int(max_iter[i]) if i < len(max_iter) else int(max_iter[-1])
                for i in range(num_steps)]
    return jnp.asarray(vals, dtype=jnp.int32)


def sample(
    unet,
    params,
    schedule: sched.Schedule,
    latents: jnp.ndarray,                  # (B, H, W, C), already scaled
    text_embeddings: jnp.ndarray,          # (2B, L, D) [uncond; cond]
    *,
    cond_embeddings: jnp.ndarray | None = None,
    guidance_scale: float = 7.5,
    spec: guidance_lib.GuidanceSpec | None = None,
    guidance_data: guidance_lib.GuidanceData | None = None,
    max_iter: Any = 5,
    ref_taps: dict | None = None,          # {key: (T, Bx, heads, n)}
    gligen: tuple | None = None,           # (objs (2B,M,D), objs_null (B,M,D))
    num_fuser_steps: int = 0,
    frozen_mask: jnp.ndarray | None = None,  # (H, W)
    frozen_latents: jnp.ndarray | None = None,  # (>=frozen_steps+1, B, H, W, C)
    num_frozen_steps: int = 0,
    save_all_latents: bool = False,
    save_keys: tuple[AttnKey, ...] = (),
    save_cond_only: bool = False,
    save_single_token: bool = False,
    tap_token_index=None,
    added_cond: tuple | None = None,   # (text_embeds (2B,D), time_ids (2B,K))
    solver: str = "ddim",              # "ddim" | "dpmpp_2m"
    guidance_batched: bool = False,    # guidance_data has a leading image axis
    initial_loss: float = 10000.0,
) -> SampleOutput:
    """Run a full grounded-diffusion sampling pass.

    One driver covers plain CFG sampling, semantic guidance, GLIGEN scheduled
    sampling, frozen-mask regeneration, and their combinations — split into
    statically-compiled segments at the feature boundaries.
    """
    num_steps = schedule.num_steps
    has_guidance = spec is not None and guidance_data is not None
    guidance_steps = min(spec.max_index_step, num_steps) if has_guidance else 0
    fuser_steps = min(num_fuser_steps, num_steps) if gligen is not None else 0
    frozen_steps = min(num_frozen_steps, num_steps) if frozen_mask is not None else 0

    latents = latents.astype(jnp.float32)
    loss = (jnp.full((latents.shape[0],), initial_loss, jnp.float32)
            if guidance_batched else jnp.float32(initial_loss))
    max_iter_arr = _stack_max_iter(max_iter, num_steps)

    consts = {"text_embeddings": text_embeddings}
    if cond_embeddings is not None:
        consts["cond_embeddings"] = cond_embeddings
    if gligen is not None:
        consts["objs"], consts["objs_null"] = gligen
    if frozen_mask is not None:
        consts["frozen_mask"] = jnp.asarray(frozen_mask, dtype=jnp.float32)
    if has_guidance:
        consts["guidance_data"] = guidance_data
    if tap_token_index is not None:
        consts["tap_token_index"] = jnp.asarray(tap_token_index, dtype=jnp.int32)
    if added_cond is not None:
        text_e, time_ids = added_cond
        consts["added_text_embeds"] = text_e
        consts["added_time_ids"] = time_ids
        consts["added_text_embeds_cond"] = text_e[text_e.shape[0] // 2 :]
        consts["added_time_ids_cond"] = time_ids[time_ids.shape[0] // 2 :]

    all_latents = [latents] if save_all_latents else None
    saved_taps: list | None = [] if save_keys else None
    # Multistep solver state threads across segment boundaries.
    carry = (latents, loss, jnp.zeros_like(latents), jnp.int32(-1000))

    for start, stop in _segment_boundaries(num_steps, guidance_steps, fuser_steps,
                                           frozen_steps):
        seg_guidance = has_guidance and start < guidance_steps
        seg_fuser = gligen is not None and start < fuser_steps
        seg_frozen = frozen_mask is not None and start < frozen_steps

        static = SegmentStatic(
            guidance=seg_guidance,
            frozen=seg_frozen,
            fuser=seg_fuser,
            gligen=gligen is not None,
            save_latents=save_all_latents,
            save_taps=bool(save_keys),
            guidance_scale=guidance_scale,
            spec=spec if seg_guidance else None,
            save_keys=tuple(save_keys),
            save_cond_only=save_cond_only,
            save_single_token=save_single_token,
            ref_ca=seg_guidance and ref_taps is not None,
            solver=solver,
            guidance_batched=guidance_batched,
        )

        xs = {
            "t": schedule.timesteps[start:stop],
            "prev_t": schedule.prev_timesteps[start:stop],
        }
        if solver == "dpmpp_2m":
            xs["dpm_first"] = jnp.asarray(
                sched.dpm_lower_order_mask(num_steps)[start:stop])
        elif solver == "euler":
            assert not has_guidance, (
                "energy guidance is defined on the VP-space solvers "
                "(ddim/dpmpp_2m); the euler path serves the SDXL refiner, "
                "which has none")
            xs["sigma"] = schedule.sigmas[start:stop]
            xs["sigma_next"] = schedule.sigmas[start + 1 : stop + 1]
        if seg_guidance:
            if isinstance(spec, boxdiff_lib.BoxDiffSpec):
                xs["step_index"] = jnp.arange(start, stop, dtype=jnp.int32)
            else:
                xs["max_iter"] = max_iter_arr[start:stop]
                if ref_taps is not None:
                    xs["ref"] = {k: v[start:stop] for k, v in ref_taps.items()}
        if seg_frozen:
            xs["frozen_next"] = frozen_latents[start + 1 : stop + 1]

        carry, ys = _run_segment(unet, static, params, schedule, carry, xs, consts)
        if save_all_latents:
            all_latents.append(ys["latents"])
        if save_keys:
            saved_taps.append(ys["taps"])

    latents, loss, _, _ = carry

    stacked_latents = None
    if save_all_latents:
        stacked_latents = jnp.concatenate(
            [all_latents[0][None], *all_latents[1:]], axis=0
        )
    stacked_taps = None
    if save_keys:
        stacked_taps = {
            k: jnp.concatenate([seg[k] for seg in saved_taps], axis=0)
            for k in saved_taps[0]
        }
    return SampleOutput(latents=latents, all_latents=stacked_latents,
                        saved_taps=stacked_taps, final_loss=loss)


@functools.partial(jax.jit, static_argnames=("unet", "guidance_scale"))
def _invert_scan(unet, guidance_scale, params, schedule: sched.Schedule,
                 latents, text_embeddings, xs):
    def step(latents, x):
        # The UNet timestep embedding is the TARGET t — the reference
        # evaluates unet(input, t) on source-level latents and then steps
        # toward t (pipelines.py:513,531 with the 0.18 inverse scheduler's
        # prev_timestep = t convention).
        if guidance_scale > 0.0:
            latent_in = jnp.concatenate([latents, latents], axis=0)
            eps = apply_unet(unet, params, latent_in, x["next_t"],
                             text_embeddings)[0]
            eps_uncond, eps_cond = jnp.split(eps, 2, axis=0)
            eps = eps_uncond + guidance_scale * (eps_cond - eps_uncond)
        else:
            # guidance_scale <= 0: uncond-only forward, exactly like the
            # reference's else branch (pipelines.py:519-528).
            uncond = text_embeddings[: text_embeddings.shape[0] // 2]
            eps = apply_unet(unet, params, latents, x["next_t"], uncond)[0]
        latents = sched.ddim_inverse_step(schedule, eps, x["t"], x["next_t"],
                                          latents)
        return latents, latents

    return jax.lax.scan(step, latents, xs)


def invert(unet, params, schedule: sched.Schedule, latents: jnp.ndarray,
           text_embeddings: jnp.ndarray, guidance_scale: float = 7.5):
    """DDIM inversion x_0 -> near-x_T (reference models/pipelines.py:489-539).

    Reference-exact semantics: the ascending grid's first T-1 entries are
    the step TARGETS (pipelines.py:504 iterates `timesteps[:-1]`), each
    step predicts eps with the target-t embedding on source-level latents
    (pipelines.py:513), and the source noise level is t - train//T with a
    sub-zero first source mapped to the initial alpha (the 0.18
    DDIMInverseScheduler's prev_timestep = t / t -= ratio swap; `_alpha_at`
    encodes the set_alpha_to_one=False SD configuration). Returns the final
    latents (at grid[-2], NOT the top grid point — the reference stops one
    short) and the trajectory (T, B, H, W, C) ascending from the input x0;
    the reference returns the same set stacked most-noised-first.
    """
    ts = schedule.timesteps[::-1]          # ascending
    ratio = schedule.alphas_cumprod.shape[0] // schedule.num_steps
    targets = ts[:-1]
    xs = {"t": targets - ratio, "next_t": targets}
    final, traj = _invert_scan(unet, guidance_scale, params, schedule,
                               latents.astype(jnp.float32), text_embeddings, xs)
    all_latents = jnp.concatenate([latents[None].astype(jnp.float32), traj], axis=0)
    return final, all_latents
