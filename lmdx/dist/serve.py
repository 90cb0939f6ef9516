"""Mesh-parallel serving: shard the inference pipeline over a device mesh.

This is SURVEY.md §2's named TPU replacement for the reference's
process-level prompt sharding (reference generate.py:23-25): instead of one
process per chip with manual --skip_first_prompts ranges, one process drives
a ("dp", "tp") `jax.sharding.Mesh`, the image batch rides the dp axis, and
(optionally) every transformer matmul is tensor-sharded over tp
(dist/mesh.py). GSPMD propagates the input shardings through the jitted
sampler scans, so the batched LMD+ pipeline (methods/batch.py) needs no
sharding annotations of its own — inputs placed here carry the layout.
"""

from __future__ import annotations

import dataclasses
import warnings

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from . import mesh as meshlib

# Set by activate_mesh(); consulted by methods/batch.py before its sampler
# calls. One process drives one mesh, so a module global (not thread-local)
# matches the runtime model.
_ACTIVE_MESH: Mesh | None = None


def active_mesh() -> Mesh | None:
    return _ACTIVE_MESH


def parse_mesh_arg(arg: str) -> dict:
    """Parse "--mesh dp=4,tp=2" / "dp=8" / "auto" into make_mesh kwargs."""
    if arg in ("auto", ""):
        return {}
    kwargs = {}
    for part in arg.split(","):
        k, _, v = part.partition("=")
        if k not in ("dp", "tp") or not v.isdigit():
            raise ValueError(
                f"bad --mesh {arg!r}; expected e.g. 'dp=4', 'dp=4,tp=2', 'auto'")
        kwargs[k] = int(v)
    return kwargs


def activate_mesh(bundle, dp: int | None = None, tp: int | None = None,
                  devices=None):
    """Create the mesh, place the bundle's params on it, and mark it active.

    tp == 1: params replicate across all devices (pure data parallel).
    tp > 1: UNet/CLIP transformer matmuls shard Megatron-style
    (dist/mesh.py param rules); the rest replicates.

    Returns (mesh, sharded_bundle).
    """
    global _ACTIVE_MESH
    mesh = meshlib.make_mesh(dp=dp, tp=tp, devices=devices)
    if mesh.shape["tp"] > 1:
        params = {
            name: meshlib.shard_params(tree, mesh)
            for name, tree in bundle.params.items()
        }
    else:
        params = meshlib.replicate(bundle.params, mesh)
    _ACTIVE_MESH = mesh
    return mesh, dataclasses.replace(bundle, params=params)


def deactivate_mesh():
    global _ACTIVE_MESH
    _ACTIVE_MESH = None


def shard_leading_axis(x, mesh: Mesh | None = None, axis: int = 0):
    """Place `x` with its `axis` dim sharded over dp (replicated if the dim
    doesn't divide dp — correct either way, GSPMD resolves the mismatch).

    The replication fallback is loud: it means every dp replica computes the
    full batch, a silent 1/dp throughput loss if hit on the hot path (e.g.
    --image-batch-size not a multiple of dp). Warned once per (shape, dp)."""
    mesh = mesh or _ACTIVE_MESH
    if mesh is None:
        return x
    x = jnp.asarray(x)
    dp = mesh.shape["dp"]
    if x.ndim <= axis or x.shape[axis] % dp != 0:
        if dp > 1:
            sig = (x.shape[axis] if x.ndim > axis else None, axis, dp)
            if sig not in _WARNED_REPLICATED:
                _WARNED_REPLICATED.add(sig)
                warnings.warn(
                    f"shard_leading_axis: axis {axis} of shape {x.shape} does "
                    f"not divide dp={dp}; replicating instead of sharding "
                    f"(1/{dp} of the mesh's dp throughput). Pick a batch size "
                    f"divisible by dp.", stacklevel=2)
        spec = P()
    else:
        spec = P(*([None] * axis), "dp", *([None] * (x.ndim - axis - 1)))
    return jax.device_put(x, NamedSharding(mesh, spec))


_WARNED_REPLICATED: set = set()
