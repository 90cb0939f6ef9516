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

import os
import re
from typing import Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize_multihost(
    coordinator: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> bool:
    """Multi-host entry point (SURVEY §2: jax.distributed + ICI/DCN meshes).

    Call once per process before any device use. Arguments default to the
    LMDX_COORDINATOR / LMDX_NUM_PROCESSES / LMDX_PROCESS_ID environment
    (falling back further to jax's own cluster autodetection for the
    num/id pair, which works on Cloud TPU pods). Returns True if the
    distributed runtime was initialized, False when no coordinator is
    configured (single-process run — the default, a no-op).

    Invocation (one line per host):
        LMDX_COORDINATOR=host0:8476 LMDX_NUM_PROCESSES=4 LMDX_PROCESS_ID=$i \\
            python -m lmdx.cli.generate --mesh auto ...
    """
    coordinator = coordinator or os.environ.get("LMDX_COORDINATOR")
    if not coordinator:
        return False
    if num_processes is None and os.environ.get("LMDX_NUM_PROCESSES"):
        num_processes = int(os.environ["LMDX_NUM_PROCESSES"])
    if process_id is None and os.environ.get("LMDX_PROCESS_ID"):
        process_id = int(os.environ["LMDX_PROCESS_ID"])
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )
    return True


def arrange_devices(devices: Sequence, dp: int, tp: int) -> np.ndarray:
    """DCN-aware (dp, tp) device layout. Pure topology math (unit-testable
    without multi-host hardware: only `.process_index` and `.id` are read).

    Invariants:
    - every tp group lies within ONE process, so tensor-parallel collectives
      (one all-reduce per attention/MLP pair) ride ICI, never DCN;
    - the dp axis is process-major (DCN outermost): dp index
      = process * ici_dp + local_row, so dp sub-groups that span DCN are as
      coarse as possible and per-image work never crosses hosts.
    """
    by_proc: dict[int, list] = {}
    for d in devices:
        by_proc.setdefault(getattr(d, "process_index", 0), []).append(d)
    counts = {len(v) for v in by_proc.values()}
    if len(counts) != 1:
        raise ValueError(
            f"uneven device counts per process: "
            f"{ {p: len(v) for p, v in by_proc.items()} }")
    per = counts.pop()
    if tp > per or per % tp != 0:
        raise ValueError(
            f"tp={tp} must divide the {per} devices of each process "
            f"(tensor parallelism rides ICI and cannot span DCN)")
    ici_dp = per // tp
    if dp != len(by_proc) * ici_dp:
        raise ValueError(
            f"dp={dp} != processes({len(by_proc)}) x ici_dp({ici_dp}) "
            f"for tp={tp}")
    rows = []
    for pid in sorted(by_proc):
        ds = sorted(by_proc[pid], key=lambda d: d.id)
        rows.extend(ds[i * tp : (i + 1) * tp] for i in range(ici_dp))
    arr = np.empty((dp, tp), dtype=object)
    for i, row in enumerate(rows):
        for j, d in enumerate(row):
            arr[i, j] = d
    return arr

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
    if len({getattr(d, "process_index", 0) for d in devices}) > 1:
        # Multi-host: DCN-aware arrangement (tp intra-process, dp
        # process-major) instead of the flat reshape.
        arr = arrange_devices(devices, dp, tp)
    else:
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
