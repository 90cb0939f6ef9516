"""Shim for diffusers.utils: decorators/helpers used by the vendored UNet."""

import logging as _py_logging
from collections import OrderedDict


def maybe_allow_in_graph(cls):
    return cls


def deprecate(*args, **kwargs):
    return None


def is_torch_version(op: str, version: str) -> bool:
    import torch

    from packaging.version import parse

    cur = parse(torch.__version__.split("+")[0])
    ref = parse(version)
    return {"<": cur < ref, "<=": cur <= ref, ">": cur > ref,
            ">=": cur >= ref, "==": cur == ref}[op]


class logging:  # noqa: N801 - mimics diffusers.utils.logging module
    @staticmethod
    def get_logger(name):
        return _py_logging.getLogger(name)


class BaseOutput(OrderedDict):
    """Dataclass-style output container; attribute and key access."""

    def __post_init__(self):
        for field_name in getattr(self, "__dataclass_fields__", {}):
            value = getattr(self, field_name)
            if value is not None:
                self[field_name] = value

    def __getattr__(self, name):
        try:
            return self[name]
        except KeyError as e:
            raise AttributeError(name) from e
