"""Training-state checkpointing (orbax).

The reference is inference-only and has no model checkpointing (SURVEY.md
§5); the fine-tuning path here saves/restores `TrainState` with orbax so
adapter training survives preemption — the TPU-native equivalent of a
torch.save loop, with sharding-aware restore (params restored directly onto
their mesh shardings).
"""

from __future__ import annotations

import os

import orbax.checkpoint as ocp

from .train import TrainState


def save(path: str, state: TrainState) -> None:
    path = os.path.abspath(path)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, state, force=True)


def restore(path: str, template: TrainState) -> TrainState:
    """Restore into the template's structure/shardings (pass a sharded
    template to restore directly onto the mesh)."""
    path = os.path.abspath(path)
    with ocp.StandardCheckpointer() as ckptr:
        restored = ckptr.restore(path, template)
    return TrainState(*restored) if not isinstance(restored, TrainState) else restored


def latest_step_dir(root: str) -> str | None:
    """Resume helper: newest step_* subdirectory under a run root."""
    if not os.path.isdir(root):
        return None
    steps = [d for d in os.listdir(root) if d.startswith("step_")]
    if not steps:
        return None
    return os.path.join(root, max(steps, key=lambda d: int(d.split("_")[1])))
