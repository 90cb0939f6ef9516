"""Device meshes and sharding layouts.

The reference has no distributed runtime at all — its only multi-device story
is prompt-range sharding across independent processes (reference
generate.py:23-25, README.md:93 "Parallel and resumable image generation").
The TPU-native replacement is a first-class `jax.sharding.Mesh` with two axes:

- ``dp`` (data parallel): prompts / images / CFG pairs ride this axis; ICI
  collectives never touch the hot loop (pure replication of params).
- ``tp`` (tensor parallel): Megatron-style sharding of every transformer
  matmul in the UNet/CLIP — attention q/k/v and MLP up-projections are
  column-sharded, attention out and MLP down-projections are row-sharded, so
  XLA inserts exactly one all-reduce per attention/MLP pair. Convolutions and
  norms stay replicated (they are a small fraction of FLOPs at the
  resolutions where tensor parallelism pays off).

There is deliberately no PP/EP/CP: the model is a ~0.9B-param UNet driven
at batch ≤ O(10); pipeline/expert/context axes have no workload here
(SURVEY.md §2 "Parallelism").

Shardings are expressed as `PartitionSpec` trees derived from parameter path
names; `jit` + GSPMD propagate everything else.
"""

from __future__ import annotations

import re
from typing import Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# Leaf-path regexes -> (kernel spec, bias spec). First match wins.
# Column-parallel (shard output features), then row-parallel (shard input
# features, bias replicated — XLA inserts the psum after the matmul).
_COLUMN_PARALLEL = re.compile(
    r"(to_q|to_k|to_v|q_proj|k_proj|v_proj|fc1|net_0/proj|linear_1|linears_0)/kernel$"
)
_COLUMN_BIAS = re.compile(
    r"(to_q|to_k|to_v|q_proj|k_proj|v_proj|fc1|net_0/proj|linear_1|linears_0)/bias$"
)
_ROW_PARALLEL = re.compile(r"(to_out|out_proj|fc2|net_2|linear_2)/kernel$")


def make_mesh(
    dp: int | None = None,
    tp: int | None = None,
    devices: Sequence[jax.Device] | None = None,
) -> Mesh:
    """Build a ("dp", "tp") mesh over the given (default: all) devices.

    With neither axis size given: tp=1, dp=#devices — the LMD workload is
    embarrassingly data-parallel and that is the fastest default; tp>1 is for
    fitting bigger models (SDXL) or latency-cutting a single image.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if dp is None and tp is None:
        dp, tp = n, 1
    elif dp is None:
        dp = n // tp
    elif tp is None:
        tp = n // dp
    if dp * tp != n:
        raise ValueError(f"dp*tp = {dp}*{tp} != {n} devices")
    arr = np.asarray(devices).reshape(dp, tp)
    return Mesh(arr, ("dp", "tp"))


def param_spec(params) -> dict:
    """PartitionSpec tree for a model param pytree (UNet / CLIP / PositionNet).

    Tensor-parallel layout over the "tp" axis; everything unmatched is
    replicated.
    """

    def spec_for(path: str, leaf) -> P:
        if _COLUMN_PARALLEL.search(path):
            return P(None, "tp")
        if _COLUMN_BIAS.search(path):
            return P("tp")
        if _ROW_PARALLEL.search(path):
            return P("tp", None)
        return P()

    def walk(tree, prefix=""):
        if isinstance(tree, dict):
            return {k: walk(v, f"{prefix}/{k}" if prefix else k) for k, v in tree.items()}
        return spec_for(prefix, tree)

    return walk(params)


def batch_spec(ndim: int = 4) -> P:
    """Leading-axis data-parallel spec for activations/latents."""
    return P("dp", *([None] * (ndim - 1)))


def shard_params(params, mesh: Mesh):
    """Place a param pytree on the mesh under its tensor-parallel layout."""
    specs = param_spec(params)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs
    )


def shard_batch(tree, mesh: Mesh):
    """Place a batch pytree on the mesh, sharding each leaf's leading axis
    over "dp" (leaves whose leading dim doesn't divide are replicated)."""
    dp = mesh.shape["dp"]

    def put(x):
        spec = batch_spec(x.ndim) if x.ndim >= 1 and x.shape[0] % dp == 0 else P()
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(put, tree)


def replicate(tree, mesh: Mesh):
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P())), tree
    )
