"""Minimal structural shim standing in for the `diffusers` package.

Purpose: let scripts/make_manifests.py instantiate the reference's vendored
diffusers-0.18 UNet fork (/root/reference/models/unet_2d_condition.py and
friends) WITHOUT diffusers installed, purely to enumerate the torch
state-dict key/shape layout of the real SD checkpoints. Only the pieces the
vendored files import are provided; parameterized modules reproduce the
exact diffusers-0.18 parameter naming (that naming IS the checkpoint
contract being extracted). Forward passes are not needed and mostly omitted.

NOT a runtime dependency of lmdx — used only at manifest-generation and
parity-test time.
"""

from .schedulers import (  # noqa: F401  (reference models/models.py:3)
    AutoencoderKL,
    DDIMInverseScheduler,
    DDIMScheduler,
    DPMSolverMultistepScheduler,
    EulerDiscreteScheduler,
)
from .pipeline_xl_img2img import (  # noqa: F401
    StableDiffusionXLImg2ImgPipeline,  # reference generation/sdxl_refinement.py:1
)


class UNet2DConditionModel:  # import-time stub (generation/multidiffusion.py:16)
    pass
