"""StableDiffusionXLImg2ImgPipeline — diffusers 0.18 semantics transcription.

The reference's SDXL refinement stage calls this diffusers pipeline directly
(reference generation/sdxl_refinement.py:14-30); it has no loop of its own
to import, so the parity target for lmdx.methods.sdxl_refine.img2img is this
transcription of the pipeline's math:

- get_timesteps: strength -> t_start mapping over the scheduler grid
  (init_timestep = min(int(steps*strength), steps);
  t_start = max(steps - init_timestep, 0); grid sliced from t_start);
- prepare_latents: VAE-encode * scaling_factor, then scheduler.add_noise at
  the sliced grid's first timestep;
- _get_add_time_ids with requires_aesthetics_score=True (the refiner):
  time_ids = original_size + crop (0,0) + aesthetic score, 6.0 on the cond
  row and 2.5 (negative_aesthetic_score) on the uncond row;
- CFG denoise loop passing added_cond_kwargs={"text_embeds", "time_ids"}
  into the UNet, uncond rows first; guidance_scale default 5.0 (the XL
  img2img default the reference inherits by not passing one).

Test-oriented deviations from the real class, all inert to the math:
components are injected callables (unet(sample, t, encoder_hidden_states,
added_cond_kwargs) -> eps; vae_encode(image) -> scaled latents), prompts
arrive pre-encoded (prompt_embeds/pooled — prompt encoding is pinned
separately at module level), the initial noise is passed explicitly instead
of drawn from `generator`, and output_type="latent" is the only output.

Scheduler note: the stabilityai/stable-diffusion-xl-refiner-1.0 repo config
defaults to EulerDiscrete — the parity test pins this pipeline over BOTH
the shim EulerDiscreteScheduler (the checkpoint default, and lmdx's
default for the refiner bundle) and DDIM (scheduler.order == 1 either way,
so get_timesteps slicing is identical).
"""

from __future__ import annotations

import torch


class StableDiffusionXLImg2ImgPipeline:
    def __init__(self, unet, scheduler, vae_encode,
                 requires_aesthetics_score: bool = True):
        self.unet = unet
        self.scheduler = scheduler
        self.vae_encode = vae_encode
        self.requires_aesthetics_score = requires_aesthetics_score

    def get_timesteps(self, num_inference_steps: int, strength: float):
        init_timestep = min(int(num_inference_steps * strength),
                            num_inference_steps)
        t_start = max(num_inference_steps - init_timestep, 0)
        timesteps = self.scheduler.timesteps[t_start:]
        return timesteps, num_inference_steps - t_start

    def _get_add_time_ids(self, original_size, crops_coords_top_left,
                          target_size, aesthetic_score,
                          negative_aesthetic_score, dtype):
        if self.requires_aesthetics_score:
            add_time_ids = list(
                original_size + crops_coords_top_left + (aesthetic_score,))
            add_neg_time_ids = list(
                original_size + crops_coords_top_left
                + (negative_aesthetic_score,))
        else:
            add_time_ids = list(
                original_size + crops_coords_top_left + target_size)
            add_neg_time_ids = add_time_ids
        return (torch.tensor([add_time_ids], dtype=dtype),
                torch.tensor([add_neg_time_ids], dtype=dtype))

    @torch.no_grad()
    def __call__(
        self,
        image: torch.Tensor,                  # (1, 3, H, W) in [-1, 1]
        prompt_embeds: torch.Tensor,          # (1, L, D)
        negative_prompt_embeds: torch.Tensor,
        pooled_prompt_embeds: torch.Tensor,   # (1, P)
        negative_pooled_prompt_embeds: torch.Tensor,
        noise: torch.Tensor,                  # (1, 4, h, w) initial noise
        strength: float = 0.3,
        num_inference_steps: int = 50,
        guidance_scale: float = 5.0,
        aesthetic_score: float = 6.0,
        negative_aesthetic_score: float = 2.5,
    ) -> torch.Tensor:
        self.scheduler.set_timesteps(num_inference_steps)
        timesteps, _ = self.get_timesteps(num_inference_steps, strength)
        latent_timestep = timesteps[:1]

        init_latents = self.vae_encode(image)
        latents = self.scheduler.add_noise(init_latents, noise,
                                           latent_timestep)

        height, width = image.shape[-2:]
        original_size = target_size = (height, width)
        add_time_ids, add_neg_time_ids = self._get_add_time_ids(
            original_size, (0, 0), target_size, aesthetic_score,
            negative_aesthetic_score, prompt_embeds.dtype)

        prompt_embeds = torch.cat([negative_prompt_embeds, prompt_embeds])
        add_text_embeds = torch.cat(
            [negative_pooled_prompt_embeds, pooled_prompt_embeds])
        add_time_ids = torch.cat([add_neg_time_ids, add_time_ids])

        for t in timesteps:
            latent_model_input = torch.cat([latents] * 2)
            latent_model_input = self.scheduler.scale_model_input(
                latent_model_input, t)
            noise_pred = self.unet(
                latent_model_input, t, encoder_hidden_states=prompt_embeds,
                added_cond_kwargs={"text_embeds": add_text_embeds,
                                   "time_ids": add_time_ids})
            noise_pred_uncond, noise_pred_text = noise_pred.chunk(2)
            noise_pred = noise_pred_uncond + guidance_scale * (
                noise_pred_text - noise_pred_uncond)
            latents = self.scheduler.step(noise_pred, t, latents).prev_sample
        return latents
