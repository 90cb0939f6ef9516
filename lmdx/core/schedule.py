"""Diffusion noise schedules and sampler steps as static arrays.

TPU-first redesign of the scheduler layer: instead of a stateful scheduler
object whose `num_inference_steps` is mutated per step to handle non-uniform
grids (reference: diffusers DDIMScheduler + utils/schedule.py:10-19), a
schedule here is a pair of *static* arrays `(timesteps, prev_timesteps)`
precomputed on the host. Every sampler step receives its exact `(t, prev_t)`
pair, which makes truncated "fast" schedules, inversion, and img2img all the
same code path inside `lax.scan` with fully static shapes.

Parity notes:
- betas/alphas: scaled-linear (sqrt-space linspace) with SD's
  beta_start=0.00085, beta_end=0.012, 1000 train steps.
- timestep grid: leading-spaced `arange(n) * (1000 // n) + steps_offset(=1)`,
  matching diffusers DDIMScheduler.set_timesteps for SD.
- fast schedule: keep the first `fast_after_steps` steps, then every
  `fast_rate`-th (reference utils/schedule.py:4-8).
- final step uses alpha_cumprod[0] (set_alpha_to_one=False in SD configs).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np


class Schedule(NamedTuple):
    """Static description of one sampling run."""

    timesteps: jnp.ndarray        # (T,) int32 descending (float32 for euler)
    prev_timesteps: jnp.ndarray   # (T,); <0 means "final" step
    alphas_cumprod: jnp.ndarray   # (num_train_timesteps,) float32
    final_alpha_cumprod: jnp.ndarray  # scalar float32
    init_noise_sigma: float = 1.0
    # Karras-convention noise levels on the inference grid, (T+1,) float32
    # with a trailing 0.0 — present only for solver="euler", whose samples
    # live in sigma-space (x = x0 + sigma * noise) rather than the
    # sqrt(alpha)-scaled space of DDIM/DPM-Solver.
    sigmas: jnp.ndarray | None = None

    @property
    def num_steps(self) -> int:
        return self.timesteps.shape[0]


def make_alphas_cumprod(
    num_train_timesteps: int = 1000,
    beta_start: float = 0.00085,
    beta_end: float = 0.012,
    beta_schedule: str = "scaled_linear",
) -> np.ndarray:
    if beta_schedule == "scaled_linear":
        betas = np.linspace(beta_start**0.5, beta_end**0.5, num_train_timesteps,
                            dtype=np.float64) ** 2
    elif beta_schedule == "linear":
        betas = np.linspace(beta_start, beta_end, num_train_timesteps, dtype=np.float64)
    else:
        raise ValueError(beta_schedule)
    return np.cumprod(1.0 - betas).astype(np.float32)


def ddim_timestep_grid(num_inference_steps: int, num_train_timesteps: int = 1000,
                       steps_offset: int = 1) -> np.ndarray:
    step_ratio = num_train_timesteps // num_inference_steps
    timesteps = (np.arange(0, num_inference_steps) * step_ratio).round()[::-1]
    return (timesteps + steps_offset).astype(np.int64)


def dpm_timestep_grid(num_inference_steps: int,
                      num_train_timesteps: int = 1000) -> np.ndarray:
    """DPMSolverMultistep's linspace grid (diffusers 0.18 set_timesteps):
    n+1 points linspaced over [0, T-1], rounded, descending, last dropped.
    Differs from DDIM's leading-spaced grid — the reference's
    --scheduler dpmsolver path samples these timesteps."""
    return (
        np.linspace(0, num_train_timesteps - 1, num_inference_steps + 1)
        .round()[::-1][:-1]
        .astype(np.int64)
    )


def euler_timestep_grid(num_inference_steps: int,
                        num_train_timesteps: int = 1000) -> np.ndarray:
    """EulerDiscrete's grid per diffusers 0.18 (the version the reference
    pins): `linspace(0, T-1, n)` reversed, kept as FLOATS — the UNet's
    timestep embedding is evaluated at fractional t, and sigma is linearly
    interpolated between integer train steps. (The refiner checkpoint's
    config also names timestep_spacing="leading", but diffusers 0.18
    predates that key and ignores it — parity follows the code as run.)"""
    return np.linspace(
        0, num_train_timesteps - 1, num_inference_steps, dtype=np.float64
    )[::-1].copy()


def euler_sigmas(alphas_cumprod: np.ndarray,
                 timesteps: np.ndarray) -> np.ndarray:
    """Interpolated Karras-convention sigmas sqrt((1-acp)/acp) at (possibly
    fractional) `timesteps`, plus the trailing 0.0 the final step targets
    (diffusers 0.18 EulerDiscreteScheduler.set_timesteps)."""
    full = np.sqrt((1.0 - alphas_cumprod) / alphas_cumprod)
    sig = np.interp(timesteps, np.arange(len(full)), full)
    return np.concatenate([sig, [0.0]]).astype(np.float32)


def fast_schedule_timesteps(timesteps: np.ndarray, fast_after_steps: int,
                            fast_rate: int) -> np.ndarray:
    """Truncate a timestep grid: full resolution up to `fast_after_steps`,
    then every `fast_rate`-th step. Used when the tail of a per-box pass only
    feeds mask extraction and need not be precise (lmd.py:278)."""
    if fast_after_steps >= len(timesteps) - 1:
        return timesteps
    return np.concatenate([timesteps[:fast_after_steps], timesteps[fast_after_steps + 1 :: fast_rate]])


def make_schedule(
    num_inference_steps: int,
    num_train_timesteps: int = 1000,
    fast_after_steps: int | None = None,
    fast_rate: int = 2,
    alphas_cumprod: np.ndarray | None = None,
    solver: str = "ddim",
) -> Schedule:
    if alphas_cumprod is None:
        alphas_cumprod = make_alphas_cumprod(num_train_timesteps)
    if solver == "euler":
        timesteps = euler_timestep_grid(num_inference_steps, num_train_timesteps)
        sigmas = euler_sigmas(alphas_cumprod, timesteps)
        prev = np.concatenate([timesteps[1:], [0.0]])
        return Schedule(
            timesteps=jnp.asarray(timesteps, dtype=jnp.float32),
            prev_timesteps=jnp.asarray(prev, dtype=jnp.float32),
            alphas_cumprod=jnp.asarray(alphas_cumprod, dtype=jnp.float32),
            final_alpha_cumprod=jnp.asarray(alphas_cumprod[0], dtype=jnp.float32),
            init_noise_sigma=float(np.sqrt(sigmas.max() ** 2 + 1.0)),
            sigmas=jnp.asarray(sigmas),
        )
    if solver == "dpmpp_2m":
        timesteps = dpm_timestep_grid(num_inference_steps, num_train_timesteps)
    else:
        timesteps = ddim_timestep_grid(num_inference_steps, num_train_timesteps)
    if fast_after_steps is not None:
        timesteps = fast_schedule_timesteps(timesteps, fast_after_steps, fast_rate)

    # prev_timesteps[i] is the *actual* next grid point; the final entry steps
    # past zero by the local gap (subsuming the reference's dynamic
    # num_inference_steps adjustment, utils/schedule.py:10-19).
    if len(timesteps) > 1:
        last_gap = int(timesteps[-2] - timesteps[-1])
    else:
        last_gap = num_train_timesteps // num_inference_steps
    prev = np.concatenate([timesteps[1:], [timesteps[-1] - last_gap]])

    return Schedule(
        timesteps=jnp.asarray(timesteps, dtype=jnp.int32),
        prev_timesteps=jnp.asarray(prev, dtype=jnp.int32),
        alphas_cumprod=jnp.asarray(alphas_cumprod, dtype=jnp.float32),
        final_alpha_cumprod=jnp.asarray(alphas_cumprod[0], dtype=jnp.float32),
    )


def _alpha_at(schedule: Schedule, t: jnp.ndarray) -> jnp.ndarray:
    """alphas_cumprod[t], mapping t < 0 to the final alpha."""
    safe_t = jnp.clip(t, 0, schedule.alphas_cumprod.shape[0] - 1)
    return jnp.where(t >= 0, schedule.alphas_cumprod[safe_t], schedule.final_alpha_cumprod)


def ddim_step(schedule: Schedule, eps: jnp.ndarray, t: jnp.ndarray, prev_t: jnp.ndarray,
              sample: jnp.ndarray) -> jnp.ndarray:
    """One deterministic DDIM update x_t -> x_{prev_t} (eta = 0,
    epsilon-prediction, no clipping — SD inference configuration)."""
    dtype = sample.dtype
    alpha_t = _alpha_at(schedule, t).astype(jnp.float32)
    alpha_prev = _alpha_at(schedule, prev_t).astype(jnp.float32)

    sample32 = sample.astype(jnp.float32)
    eps32 = eps.astype(jnp.float32)
    x0 = (sample32 - jnp.sqrt(1.0 - alpha_t) * eps32) / jnp.sqrt(alpha_t)
    out = jnp.sqrt(alpha_prev) * x0 + jnp.sqrt(1.0 - alpha_prev) * eps32
    return out.astype(dtype)


def ddim_inverse_step(schedule: Schedule, eps: jnp.ndarray, t: jnp.ndarray,
                      next_t: jnp.ndarray, sample: jnp.ndarray) -> jnp.ndarray:
    """One DDIM inversion update x_t -> x_{next_t} (next_t > t); used by
    `pipelines.invert`-equivalent img2img initialization."""
    dtype = sample.dtype
    alpha_t = _alpha_at(schedule, t).astype(jnp.float32)
    alpha_next = _alpha_at(schedule, next_t).astype(jnp.float32)
    sample32 = sample.astype(jnp.float32)
    eps32 = eps.astype(jnp.float32)
    x0 = (sample32 - jnp.sqrt(1.0 - alpha_t) * eps32) / jnp.sqrt(alpha_t)
    out = jnp.sqrt(alpha_next) * x0 + jnp.sqrt(1.0 - alpha_next) * eps32
    return out.astype(dtype)


def add_noise(schedule: Schedule, x0: jnp.ndarray, noise: jnp.ndarray,
              t: jnp.ndarray) -> jnp.ndarray:
    """Forward-process q(x_t | x_0); used for img2img / SDXL refinement."""
    alpha_t = _alpha_at(schedule, t).astype(jnp.float32)
    out = jnp.sqrt(alpha_t) * x0.astype(jnp.float32) + jnp.sqrt(1.0 - alpha_t) * noise.astype(
        jnp.float32
    )
    return out.astype(x0.dtype)


def guidance_step_size(schedule: Schedule, t: jnp.ndarray,
                       solver: str = "ddim") -> jnp.ndarray:
    """Step-size factor for energy-guidance latent updates.

    DDIM (sigma-less scheduler): sqrt(1 - alpha_cumprod[t]), the
    classifier-guidance scaling (reference models/pipelines.py:64-69).
    dpmpp_2m (DPMSolverMultistep): the reference uses scheduler.sigmas[i]**2
    when the scheduler carries sigmas (models/pipelines.py:60-63); diffusers
    defines sigma_t = sqrt((1-acp)/acp), so the factor is (1-acp)/acp."""
    a = _alpha_at(schedule, t)
    if solver == "dpmpp_2m":
        return (1.0 - a) / jnp.maximum(a, 1e-10)
    return jnp.sqrt(1.0 - a)


def _alpha_sigma_lambda(schedule: Schedule, t: jnp.ndarray):
    a = _alpha_at(schedule, t).astype(jnp.float32)
    alpha = jnp.sqrt(a)
    sigma = jnp.sqrt(1.0 - a)
    lam = jnp.log(alpha) - jnp.log(jnp.maximum(sigma, 1e-10))
    return alpha, sigma, lam


def dpmpp_2m_step(schedule: Schedule, eps: jnp.ndarray, t: jnp.ndarray,
                  next_t: jnp.ndarray, sample: jnp.ndarray,
                  prev_x0: jnp.ndarray, prev_t: jnp.ndarray,
                  force_first_order: jnp.ndarray | bool = False):
    """One DPM-Solver++(2M) update x_t -> x_{next_t}.

    Multistep state: (prev_x0, prev_t) from the preceding step; prev_t < -500
    marks "no history" (first step -> first-order update). Matches diffusers
    DPMSolverMultistepScheduler(algorithm_type="dpmsolver++", solver_order=2)
    — the scheduler the reference can inject via --scheduler
    (generate.py:26,121; models/models.py:49-56). `force_first_order` is the
    scheduler's lower_order_final rule: the final step drops to first order
    when the run has < 15 steps (see dpm_lower_order_mask).

    Returns (new_sample, x0) — callers thread (x0, t) as the next state.
    """
    alpha_t, sigma_t, lam_t = _alpha_sigma_lambda(schedule, t)
    alpha_s, sigma_s, lam_s = _alpha_sigma_lambda(schedule, next_t)

    sample32 = sample.astype(jnp.float32)
    x0 = (sample32 - sigma_t * eps.astype(jnp.float32)) / alpha_t

    h = lam_s - lam_t
    first_order = (sigma_s / sigma_t) * sample32 - alpha_s * (
        jnp.exp(-h) - 1.0) * x0

    # Second-order correction using the previous step's x0 prediction.
    _, _, lam_p = _alpha_sigma_lambda(schedule, jnp.maximum(prev_t, 0))
    h_last = lam_t - lam_p
    r0 = h_last / jnp.where(h == 0, 1e-10, h)
    coeff = 1.0 / jnp.maximum(2.0 * r0, 1e-10)
    d = (1.0 + coeff) * x0 - coeff * prev_x0
    second_order = (sigma_s / sigma_t) * sample32 - alpha_s * (
        jnp.exp(-h) - 1.0) * d

    use_first = jnp.logical_or(prev_t < -500, force_first_order)
    out = jnp.where(use_first, first_order, second_order)
    return out.astype(sample.dtype), x0.astype(sample.dtype)


def euler_step(eps: jnp.ndarray, sigma: jnp.ndarray, sigma_next: jnp.ndarray,
               sample: jnp.ndarray) -> jnp.ndarray:
    """One deterministic Euler update in sigma-space (diffusers 0.18
    EulerDiscreteScheduler.step with the default s_churn=0 — the SDXL
    refiner checkpoint's scheduler, closing PARITY's former integrator
    residual). `sample` is x0 + sigma*noise (UNSCALED — callers divide the
    UNet input by sqrt(sigma^2+1), see `euler_scale_model_input`); for
    epsilon prediction the derivative is exactly eps, so
    x_{i+1} = x_i + eps * (sigma_{i+1} - sigma_i)."""
    out = (sample.astype(jnp.float32)
           + eps.astype(jnp.float32) * (sigma_next - sigma))
    return out.astype(sample.dtype)


def euler_scale_model_input(sample: jnp.ndarray,
                            sigma: jnp.ndarray) -> jnp.ndarray:
    """EulerDiscrete's UNet input scaling: x / sqrt(sigma^2 + 1) (the model
    was trained on variance-preserving inputs; sigma-space samples are not)."""
    return sample / jnp.sqrt(sigma * sigma + 1.0)


def euler_add_noise(x0: jnp.ndarray, noise: jnp.ndarray,
                    sigma: jnp.ndarray) -> jnp.ndarray:
    """Forward noising in sigma-space: x = x0 + sigma * noise (diffusers
    EulerDiscreteScheduler.add_noise — img2img entry at the strength point)."""
    out = x0.astype(jnp.float32) + noise.astype(jnp.float32) * sigma
    return out.astype(x0.dtype)


def dpm_lower_order_mask(num_steps: int) -> np.ndarray:
    """Per-step force-first-order flags for DPM-Solver++(2M): diffusers'
    lower_order_final rule drops the FINAL step to first order when the run
    has fewer than 15 steps (stabilizes short schedules)."""
    mask = np.zeros((num_steps,), bool)
    if num_steps < 15 and num_steps > 0:
        mask[-1] = True
    return mask
