"""Stage-2 method registry.

Each module exposes `version` and `run(spec, bundle, **kwargs)`; the registry
maps --run-model names to modules (reference generate.py:130-153 uses dynamic
imports + import-time global binding; here methods are plain functions of an
explicit bundle).
"""

from . import backward_guidance, gligen, lmd, lmd_plus, sd  # noqa: F401

METHODS = {
    m.version: m for m in (sd, gligen, backward_guidance, lmd, lmd_plus)
}


def get_method(name: str):
    # "lmd_plus" etc.; the CLI also accepts "gligen/lmd_plus"-style aliases
    # used by the reference's --run-model matching.
    key = name.replace("-", "_")
    if key not in METHODS:
        raise KeyError(f"unknown method {name!r}; available: {sorted(METHODS)}")
    return METHODS[key]
