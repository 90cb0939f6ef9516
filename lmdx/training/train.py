"""Diffusion training / adapter fine-tuning step.

The reference is inference-only (SURVEY.md §5: no checkpointing, no training
loop), but its GLIGEN adapters are the product of exactly this objective; the
framework therefore ships a first-class epsilon-prediction training step so
grounding adapters (PositionNet + gated self-attention fusers) can be
fine-tuned on TPU pods:

    loss = E_{x0, eps, t} || UNet(sqrt(a_t) x0 + sqrt(1-a_t) eps, t, c) - eps ||^2

Design:
- The step is a pure function jitted over a ("dp", "tp") mesh
  (lmdx/dist/mesh.py): batch rides "dp", transformer matmuls are
  tensor-sharded over "tp"; GSPMD inserts the collectives.
- `trainable` is a path predicate: gradients flow everywhere, but frozen
  params get zero updates (optax.masked) — adapter-only fine-tuning freezes
  everything except `fuser`/`position_net` paths.
- bfloat16 activations, float32 params and optimizer state.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import optax

from ..dist import mesh as meshlib


class TrainState(NamedTuple):
    step: jnp.ndarray
    params: dict
    opt_state: tuple


def gligen_adapter_mask(params) -> dict:
    """Trainable-mask selecting only GLIGEN grounding params (fusers +
    PositionNet), the adapter fine-tuning regime."""
    flat = jax.tree_util.tree_map_with_path(
        lambda path, _: any(
            getattr(p, "key", str(p)) in ("fuser", "position_net") for p in path
        ),
        params,
    )
    return flat


def make_optimizer(
    learning_rate: float = 1e-4,
    weight_decay: float = 0.0,
    trainable_mask=None,
) -> optax.GradientTransformation:
    opt = optax.adamw(learning_rate, weight_decay=weight_decay)
    if trainable_mask is not None:
        opt = optax.multi_transform(
            {"train": opt, "freeze": optax.set_to_zero()},
            jax.tree_util.tree_map(
                lambda t: "train" if t else "freeze", trainable_mask
            ),
        )
    return opt


def init_train_state(params, optimizer: optax.GradientTransformation) -> TrainState:
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=optimizer.init(params),
    )


def make_train_step(
    unet,
    optimizer: optax.GradientTransformation,
    alphas_cumprod: jnp.ndarray,
    objs_fn: Callable | None = None,
) -> Callable:
    """Build the (un-jitted) train step.

    batch: dict with
      x0 (B,H,W,C) clean latents; noise (B,H,W,C); t (B,) int32 train timesteps;
      text_embeddings (B,L,D); optionally gligen boxes/masks/phrase embeddings
      consumed by objs_fn(params, batch) -> (B,M,D) grounding tokens.
    """

    def loss_fn(params, batch):
        a = alphas_cumprod[batch["t"]][:, None, None, None]
        noisy = jnp.sqrt(a) * batch["x0"] + jnp.sqrt(1.0 - a) * batch["noise"]
        objs = objs_fn(params, batch) if objs_fn is not None else None
        eps = unet.apply(
            {"params": params}, noisy, batch["t"], batch["text_embeddings"],
            objs=objs,
        )
        return jnp.mean(jnp.square(eps - batch["noise"]))

    def train_step(state: TrainState, batch) -> tuple[TrainState, jnp.ndarray]:
        loss, grads = jax.value_and_grad(loss_fn)(state.params, batch)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(state.step + 1, params, opt_state), loss

    return train_step


def make_sharded_train_step(unet, optimizer, alphas_cumprod, mesh, objs_fn=None):
    """Jit the train step over a mesh; inputs carry their shardings
    (shard_params/shard_batch) and GSPMD propagates the rest."""
    step = make_train_step(unet, optimizer, alphas_cumprod, objs_fn=objs_fn)
    return jax.jit(step, donate_argnums=(0,))


def shard_state(state: TrainState, mesh) -> TrainState:
    """Tensor-shard params and optimizer moments over the mesh.

    Adam moment trees mirror the param tree, so any opt-state leaf whose
    shape matches its param's gets the param's spec; everything else
    (counts, scalars, set_to_zero placeholders) is replicated.
    """
    specs = meshlib.param_spec(state.params)
    params = meshlib.shard_params(state.params, mesh)

    flat_specs = {
        jax.tree_util.keystr(path): spec
        for path, spec in jax.tree_util.tree_flatten_with_path(specs)[0]
    }
    flat_shapes = {
        jax.tree_util.keystr(path): leaf.shape
        for path, leaf in jax.tree_util.tree_flatten_with_path(state.params)[0]
    }

    def put(path, x):
        # Match the trailing param path inside nested opt-state wrappers.
        key = jax.tree_util.keystr(path)
        spec = jax.sharding.PartitionSpec()
        if hasattr(x, "shape"):
            for pkey, pspec in flat_specs.items():
                if key.endswith(pkey) and flat_shapes[pkey] == x.shape:
                    spec = pspec
                    break
        return jax.device_put(x, jax.sharding.NamedSharding(mesh, spec))

    opt_state = jax.tree_util.tree_map_with_path(put, state.opt_state)
    step = jax.device_put(
        state.step, jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec())
    )
    return TrainState(step, params, opt_state)
