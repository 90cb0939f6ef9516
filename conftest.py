"""Pytest root conftest: force JAX onto a virtual 8-device CPU mesh.

Multi-chip sharding (dp/tp meshes) is tested on virtual CPU devices; bench.py
and real generation run on TPU. Must run before the first `import jax`.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()
