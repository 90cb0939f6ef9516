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

    def __getitem__(self, key):  # diffusers outputs allow ["prev_sample"]
        return getattr(self, key)


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

    def add_noise(self, original_samples: torch.Tensor, noise: torch.Tensor,
                  timesteps: torch.Tensor) -> torch.Tensor:
        """Forward process q(x_t | x_0) (diffusers 0.18 DDIMScheduler.add_noise);
        the XL img2img pipeline noises the encoded image at the strength
        point with this."""
        acp = self.alphas_cumprod[timesteps.long()].flatten()
        while acp.dim() < original_samples.dim():
            acp = acp.unsqueeze(-1)
        return (acp**0.5) * original_samples + ((1.0 - acp) ** 0.5) * noise

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


class DDIMInverseScheduler(ConfigMixin):
    """Inverse DDIM per diffusers-0.18 semantics (used only by
    pipelines.invert, models/pipelines.py:489-539; built via
    DDIMInverseScheduler.from_config(ddim.config), models/models.py:57-59).

    0.18-era behavior transcribed here: set_timesteps yields the ASCENDING
    leading grid `arange(T) * (train//T) + steps_offset`; step(eps, t,
    sample) treats t as the TARGET noise level (prev_timestep = t) and
    t - train//T as the SOURCE, mapping a sub-zero source to
    `initial_alpha_cumprod` (1.0 when set_alpha_to_one else
    alphas_cumprod[0]). The caller's UNet is therefore evaluated with the
    target-t embedding on source-level latents (pipelines.py:513,531)."""

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
        self.alphas_cumprod = torch.cumprod(1.0 - betas, dim=0)
        self.initial_alpha_cumprod = (
            torch.tensor(1.0) if set_alpha_to_one else self.alphas_cumprod[0]
        )
        self.init_noise_sigma = 1.0
        self.num_inference_steps = None
        self.timesteps = torch.arange(0, num_train_timesteps)

    def scale_model_input(self, sample: torch.Tensor, timestep=None):
        return sample

    def set_timesteps(self, num_inference_steps: int, device=None):
        cfg = self.config
        self.num_inference_steps = num_inference_steps
        step_ratio = cfg.num_train_timesteps // num_inference_steps
        self.timesteps = (
            (torch.arange(0, num_inference_steps) * step_ratio).round().long()
            + cfg.steps_offset
        )

    def step(self, model_output: torch.Tensor, timestep, sample: torch.Tensor,
             generator=None) -> DDIMSchedulerOutput:
        cfg = self.config
        prev_t = int(timestep)                                   # target
        t = prev_t - cfg.num_train_timesteps // self.num_inference_steps

        alpha_prod_t = (
            self.alphas_cumprod[t] if t >= 0 else self.initial_alpha_cumprod
        )
        alpha_prod_t_prev = self.alphas_cumprod[prev_t]
        beta_prod_t = 1.0 - alpha_prod_t

        if cfg.prediction_type == "epsilon":
            pred_original_sample = (
                sample - beta_prod_t**0.5 * model_output
            ) / alpha_prod_t**0.5
            pred_epsilon = model_output
        else:
            raise ValueError(cfg.prediction_type)

        pred_sample_direction = (1.0 - alpha_prod_t_prev) ** 0.5 * pred_epsilon
        prev_sample = (
            alpha_prod_t_prev**0.5 * pred_original_sample
            + pred_sample_direction
        )
        return DDIMSchedulerOutput(prev_sample=prev_sample,
                                   pred_original_sample=pred_original_sample)


class EulerDiscreteScheduler(ConfigMixin):
    """Faithful torch transcription of diffusers-0.18 EulerDiscreteScheduler
    (deterministic configuration: s_churn=0) — the scheduler the SDXL
    refiner checkpoint's repo config names, and therefore what the
    reference's `StableDiffusionXLImg2ImgPipeline.from_pretrained` builds
    for generation/sdxl_refinement.py:10-20.

    0.18-era behavior transcribed here: set_timesteps is an unconditional
    float `linspace(0, T-1, n)[::-1]` (timestep_spacing did not exist yet;
    the checkpoint config's "leading" key is ignored by 0.18, so parity
    follows the code as run); sigmas = sqrt((1-acp)/acp) linearly
    interpolated at those fractional timesteps with a trailing 0.0; the
    sample lives in sigma-space (add_noise is x0 + sigma*noise), the UNet
    input is scaled by 1/sqrt(sigma^2+1), and the deterministic step is
    x + eps*(sigma_next - sigma) for epsilon prediction."""

    @register_to_config
    def __init__(
        self,
        num_train_timesteps: int = 1000,
        beta_start: float = 0.00085,
        beta_end: float = 0.012,
        beta_schedule: str = "scaled_linear",
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
        self.alphas_cumprod = torch.cumprod(1.0 - betas, dim=0)
        self.num_inference_steps = None
        self.timesteps = None
        self.sigmas = None
        self.order = 1

    @property
    def init_noise_sigma(self):
        return (self.sigmas.max() ** 2 + 1) ** 0.5

    def set_timesteps(self, num_inference_steps: int):
        import numpy as np

        cfg = self.config
        self.num_inference_steps = num_inference_steps
        timesteps = np.linspace(
            0, cfg.num_train_timesteps - 1, num_inference_steps,
            dtype=float)[::-1].copy()
        full = np.array(
            ((1.0 - self.alphas_cumprod) / self.alphas_cumprod) ** 0.5)
        sigmas = np.interp(timesteps, np.arange(0, len(full)), full)
        sigmas = np.concatenate([sigmas, [0.0]]).astype(np.float32)
        self.sigmas = torch.from_numpy(sigmas)
        self.timesteps = torch.from_numpy(timesteps)

    def _step_index(self, timestep) -> int:
        idx = (self.timesteps == timestep).nonzero()
        return int(idx[0].item())

    def scale_model_input(self, sample: torch.Tensor, timestep):
        sigma = self.sigmas[self._step_index(timestep)]
        return sample / ((sigma**2 + 1) ** 0.5)

    def add_noise(self, original_samples: torch.Tensor, noise: torch.Tensor,
                  timesteps: torch.Tensor) -> torch.Tensor:
        step_indices = [self._step_index(t) for t in timesteps]
        sigma = self.sigmas[step_indices].flatten()
        while sigma.dim() < original_samples.dim():
            sigma = sigma.unsqueeze(-1)
        return original_samples + noise * sigma

    def step(self, model_output: torch.Tensor, timestep,
             sample: torch.Tensor, generator=None) -> DDIMSchedulerOutput:
        assert self.config.prediction_type == "epsilon"
        i = self._step_index(timestep)
        sigma = self.sigmas[i]
        # s_churn = 0 (the default, and the XL img2img configuration):
        # gamma = 0, sigma_hat = sigma, no stochastic churn term.
        pred_original_sample = sample - sigma * model_output
        derivative = (sample - pred_original_sample) / sigma
        dt = self.sigmas[i + 1] - sigma
        prev_sample = sample + derivative * dt
        return DDIMSchedulerOutput(prev_sample=prev_sample,
                                   pred_original_sample=pred_original_sample)


class DPMSolverMultistepScheduler(ConfigMixin):
    """Faithful torch transcription of diffusers-0.18
    DPMSolverMultistepScheduler at the configuration the reference selects
    (algorithm_type dpmsolver++, solver_order 2, epsilon prediction,
    midpoint 2nd-order, lower_order_final): linspace timestep grid,
    multistep x0 history, first-order fallback on step 0 and (for runs
    < 15 steps) the final step. `sigmas` holds sqrt((1-acp)/acp) on the
    inference grid — the quantity the reference's guidance update squares
    (models/pipelines.py:60-63)."""

    @register_to_config
    def __init__(
        self,
        num_train_timesteps: int = 1000,
        beta_start: float = 0.00085,
        beta_end: float = 0.012,
        beta_schedule: str = "scaled_linear",
        solver_order: int = 2,
        prediction_type: str = "epsilon",
        algorithm_type: str = "dpmsolver++",
        lower_order_final: bool = True,
    ):
        assert algorithm_type == "dpmsolver++" and solver_order == 2
        betas = (
            torch.linspace(beta_start**0.5, beta_end**0.5,
                           num_train_timesteps, dtype=torch.float32) ** 2
        )
        self.alphas_cumprod = torch.cumprod(1.0 - betas, dim=0)
        self.alpha_t = torch.sqrt(self.alphas_cumprod)
        self.sigma_t = torch.sqrt(1.0 - self.alphas_cumprod)
        self.lambda_t = torch.log(self.alpha_t) - torch.log(self.sigma_t)
        self.init_noise_sigma = 1.0
        self.num_inference_steps = None
        self.timesteps = torch.arange(num_train_timesteps - 1, -1, -1)

    def scale_model_input(self, sample, timestep=None):
        return sample

    def set_timesteps(self, num_inference_steps: int):
        cfg = self.config
        import numpy as np

        timesteps = (
            np.linspace(0, cfg.num_train_timesteps - 1,
                        num_inference_steps + 1)
            .round()[::-1][:-1]
            .copy()
            .astype(np.int64)
        )
        self.timesteps = torch.from_numpy(timesteps)
        self.num_inference_steps = num_inference_steps
        acp = self.alphas_cumprod[self.timesteps]
        self.sigmas = torch.sqrt((1.0 - acp) / acp)
        self.model_outputs = [None] * cfg.solver_order
        self.timestep_list = [None] * cfg.solver_order
        self.lower_order_nums = 0

    def _convert(self, model_output, timestep, sample):
        # dpmsolver++ epsilon -> x0 prediction
        return (
            sample - self.sigma_t[timestep] * model_output
        ) / self.alpha_t[timestep]

    def _first_order(self, m0, timestep, prev_timestep, sample):
        lam_t, lam_s = self.lambda_t[prev_timestep], self.lambda_t[timestep]
        alpha_t, sigma_t = self.alpha_t[prev_timestep], self.sigma_t[prev_timestep]
        sigma_s = self.sigma_t[timestep]
        h = lam_t - lam_s
        return (sigma_t / sigma_s) * sample - alpha_t * (
            torch.exp(-h) - 1.0) * m0

    def _second_order(self, timestep_list, prev_timestep, sample):
        t = prev_timestep
        s0, s1 = timestep_list[-1], timestep_list[-2]
        m0, m1 = self.model_outputs[-1], self.model_outputs[-2]
        lam_t, lam_s0, lam_s1 = (
            self.lambda_t[t], self.lambda_t[s0], self.lambda_t[s1])
        alpha_t, sigma_t = self.alpha_t[t], self.sigma_t[t]
        sigma_s0 = self.sigma_t[s0]
        h, h_0 = lam_t - lam_s0, lam_s0 - lam_s1
        r0 = h_0 / h
        d0, d1 = m0, (1.0 / r0) * (m0 - m1)
        # midpoint rule
        return (
            (sigma_t / sigma_s0) * sample
            - alpha_t * (torch.exp(-h) - 1.0) * d0
            - 0.5 * alpha_t * (torch.exp(-h) - 1.0) * d1
        )

    def step(self, model_output, timestep, sample,
             generator=None) -> DDIMSchedulerOutput:
        t = int(timestep)
        idx = (self.timesteps == t).nonzero()
        step_index = int(idx.item()) if len(idx) else len(self.timesteps) - 1
        prev_timestep = (
            0 if step_index == len(self.timesteps) - 1
            else int(self.timesteps[step_index + 1])
        )
        lower_order_final = (
            step_index == len(self.timesteps) - 1
            and self.config.lower_order_final
            and len(self.timesteps) < 15
        )

        x0 = self._convert(model_output, t, sample)
        self.model_outputs = [self.model_outputs[-1], x0]
        self.timestep_list = [self.timestep_list[-1], t]

        if self.lower_order_nums < 1 or lower_order_final:
            prev_sample = self._first_order(x0, t, prev_timestep, sample)
        else:
            prev_sample = self._second_order(
                self.timestep_list, prev_timestep, sample)

        if self.lower_order_nums < self.config.solver_order:
            self.lower_order_nums += 1
        return DDIMSchedulerOutput(prev_sample=prev_sample,
                                   pred_original_sample=x0)
