"""Shim for diffusers.loaders (structure-only)."""


class UNet2DConditionLoadersMixin:
    pass
