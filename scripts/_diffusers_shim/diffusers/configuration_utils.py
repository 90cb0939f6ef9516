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
