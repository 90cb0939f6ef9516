"""lmdx — a TPU-native (JAX/XLA/Pallas) LLM-grounded diffusion framework.

Two-stage text-to-image generation:

- Stage 1 (text -> layout): an LLM turns a caption into captioned bounding
  boxes + a background prompt + a negative prompt, with an OpenAI-compatible
  client and a sequential-read JSON response cache.
- Stage 2 (layout -> image): layout-grounded Stable Diffusion sampling — the
  flagship LMD / LMD+ methods (per-box generation, mask refinement, latent
  composition, frozen-step regeneration, cross-attention energy guidance via
  ``jax.grad`` through the UNet, GLIGEN gated self-attention adapters), plus a
  baseline zoo (plain SD, GLIGEN, MultiDiffusion, backward guidance, BoxDiff)
  and an SDXL refiner.

Capability parity target: TonyLianLong/LLM-groundedDiffusion (see SURVEY.md).
The implementation is a fresh TPU-first design, not a port: NHWC layouts,
static-shape `lax.scan` samplers, functional attention taps, Pallas attention
kernels, and `jax.sharding` meshes for scale-out.
"""

__version__ = "0.1.0"
