"""Shim for the diffusers schedulers the reference imports
(models/models.py:3).

`DDIMScheduler` is a faithful torch implementation of the public
diffusers-0.18 DDIM algorithm (eta=0, epsilon prediction, leading-spaced
timesteps) with the stock Stable-Diffusion configuration defaults — it is
the torch-side scheduler for the pipeline-level parity tests
(tests/test_pipeline_parity.py), standing in for the object
`models.load_sd` would build from the real checkpoint's scheduler config.
The other three names are import-time stubs (never instantiated offline).
"""

from __future__ import annotations

from dataclasses import dataclass

import torch

from .configuration_utils import ConfigMixin, register_to_config


@dataclass
class DDIMSchedulerOutput:
    prev_sample: torch.Tensor
    pred_original_sample: torch.Tensor | None = None


class DDIMScheduler(ConfigMixin):
    """Deterministic DDIM (Song et al.) per diffusers 0.18 semantics.

    Defaults mirror the SD v1.x scheduler config the reference loads
    (beta scaled_linear 0.00085..0.012, 1000 train steps, steps_offset=1,
    clip_sample=False, set_alpha_to_one=False, epsilon prediction).
    """

    @register_to_config
    def __init__(
        self,
        num_train_timesteps: int = 1000,
        beta_start: float = 0.00085,
        beta_end: float = 0.012,
        beta_schedule: str = "scaled_linear",
        clip_sample: bool = False,
        set_alpha_to_one: bool = False,
        steps_offset: int = 1,
        prediction_type: str = "epsilon",
    ):
        if beta_schedule == "scaled_linear":
            betas = (
                torch.linspace(beta_start**0.5, beta_end**0.5,
                               num_train_timesteps, dtype=torch.float32) ** 2
            )
        elif beta_schedule == "linear":
            betas = torch.linspace(beta_start, beta_end, num_train_timesteps,
                                   dtype=torch.float32)
        else:
            raise ValueError(beta_schedule)
        self.betas = betas
        self.alphas_cumprod = torch.cumprod(1.0 - betas, dim=0)
        self.final_alpha_cumprod = (
            torch.tensor(1.0) if set_alpha_to_one else self.alphas_cumprod[0]
        )
        self.init_noise_sigma = 1.0
        self.num_inference_steps = None
        self.timesteps = torch.arange(num_train_timesteps - 1, -1, -1)

    def scale_model_input(self, sample: torch.Tensor, timestep=None):
        return sample

    def set_timesteps(self, num_inference_steps: int):
        cfg = self.config
        self.num_inference_steps = num_inference_steps
        step_ratio = cfg.num_train_timesteps // num_inference_steps
        # "leading" spacing: arange * ratio, reversed, + steps_offset
        timesteps = (
            (torch.arange(0, num_inference_steps) * step_ratio)
            .round()
            .flip(0)
            .long()
            + cfg.steps_offset
        )
        self.timesteps = timesteps

    def step(self, model_output: torch.Tensor, timestep, sample: torch.Tensor,
             eta: float = 0.0, generator=None) -> DDIMSchedulerOutput:
        assert eta == 0.0, "shim implements deterministic DDIM only"
        cfg = self.config
        t = int(timestep)
        prev_t = t - cfg.num_train_timesteps // self.num_inference_steps

        alpha_prod_t = self.alphas_cumprod[t]
        alpha_prod_t_prev = (
            self.alphas_cumprod[prev_t] if prev_t >= 0
            else self.final_alpha_cumprod
        )
        beta_prod_t = 1.0 - alpha_prod_t

        if cfg.prediction_type == "epsilon":
            pred_original_sample = (
                sample - beta_prod_t**0.5 * model_output
            ) / alpha_prod_t**0.5
            pred_epsilon = model_output
        else:
            raise ValueError(cfg.prediction_type)

        if cfg.clip_sample:
            pred_original_sample = pred_original_sample.clamp(-1.0, 1.0)

        pred_sample_direction = (1.0 - alpha_prod_t_prev) ** 0.5 * pred_epsilon
        prev_sample = (
            alpha_prod_t_prev**0.5 * pred_original_sample
            + pred_sample_direction
        )
        return DDIMSchedulerOutput(prev_sample=prev_sample,
                                   pred_original_sample=pred_original_sample)


class AutoencoderKL:  # import-time stub (models/models.py:3)
    pass


class DDIMInverseScheduler:  # import-time stub
    pass


class DPMSolverMultistepScheduler:  # import-time stub
    pass
