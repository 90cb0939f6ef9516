"""Shim for diffusers.configuration_utils (structure-only)."""

import functools
import inspect


class ConfigMixin:
    config_name = "config.json"

    def register_to_config(self, **kwargs):
        self._internal_dict = {**getattr(self, "_internal_dict", {}), **kwargs}

    @property
    def config(self):
        import types

        return types.SimpleNamespace(**getattr(self, "_internal_dict", {}))

    @classmethod
    def from_config(cls, config):
        """diffusers ConfigMixin.from_config semantics: instantiate from
        another scheduler's config, keeping only the kwargs this class's
        __init__ accepts (models/models.py:58 builds the inverse scheduler
        this way from the DDIM config)."""
        if not isinstance(config, dict):
            config = vars(config)
        sig = inspect.signature(cls.__init__)
        kept = {k: v for k, v in config.items() if k in sig.parameters}
        return cls(**kept)


def register_to_config(init):
    @functools.wraps(init)
    def wrapper(self, *args, **kwargs):
        sig = inspect.signature(init)
        bound = sig.bind(self, *args, **kwargs)
        bound.apply_defaults()
        cfg = {k: v for k, v in bound.arguments.items() if k != "self"}
        self._internal_dict = cfg
        init(self, *args, **kwargs)

    return wrapper
