"""Pytest root conftest: force JAX onto a virtual 8-device CPU mesh.

Multi-chip sharding (dp/tp meshes) is tested on virtual CPU devices; bench.py
and real generation run on TPU. The host image pre-imports jax via
sitecustomize and pins JAX_PLATFORMS to the TPU plugin, so we must switch the
platform via jax.config *after* import (backends are not initialized yet at
conftest time) and set XLA_FLAGS before first device use.
"""

import os

xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Full-suite caveat: ~200 tests' worth of XLA:CPU compiles in ONE process
# has repeatedly segfaulted late in the run inside backend_compile_and_load
# (and, with the persistent cache on, inside executable serialization) —
# an XLA:CPU flakiness under accumulation, not a test bug: every crash
# site passes in a shorter process. The canonical full-suite command is
# therefore the chunked runner `scripts/run_tests.sh` (one pytest process
# per test file). Opt into the persistent compile cache with
# LMDX_TEST_JIT_CACHE=<dir> if desired.
if os.environ.get("LMDX_TEST_JIT_CACHE"):
    from lmdx.runtime import jit_cache  # noqa: E402

    jit_cache.enable(os.environ["LMDX_TEST_JIT_CACHE"])
