"""Stage-2 method registry.

Each module exposes `version` and `run(spec, bundle, **kwargs)`; the registry
maps --run-model names to modules (reference generate.py:130-153 uses dynamic
imports + import-time global binding; here methods are plain functions of an
explicit bundle).
"""

from . import (  # noqa: F401
    backward_guidance,
    batch,
    boxdiff,
    gligen,
    lmd,
    lmd_plus,
    multidiffusion,
    sd,
    sdxl_refine,
)

METHODS = {
    m.version: m
    for m in (sd, gligen, backward_guidance, boxdiff, multidiffusion,
              lmd, lmd_plus)
}


def get_method(name: str):
    # "lmd_plus" etc.; the CLI also accepts "gligen/lmd_plus"-style aliases
    # used by the reference's --run-model matching.
    key = name.replace("-", "_")
    if key not in METHODS:
        raise KeyError(f"unknown method {name!r}; available: {sorted(METHODS)}")
    return METHODS[key]
