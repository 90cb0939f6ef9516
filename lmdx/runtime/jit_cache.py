"""Persistent XLA compilation cache.

The LMD+ pipeline compiles several large scan segments (including
grad-through-UNet guidance bodies); first-compile costs minutes on TPU.
Enabling jax's persistent cache makes every process after the first start
warm. Call `enable()` early (bench.py and the CLIs do)."""

from __future__ import annotations

import os

import jax

DEFAULT_DIR = os.environ.get("LMDX_JIT_CACHE", "/root/repo/.jax_cache")


def enable(path: str = DEFAULT_DIR) -> None:
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    # 0.35s threshold: a cold driver process runs dozens of small helper
    # jits (encode/decode/compose/vis) whose compiles are individually
    # under the old 2s cutoff but summed to ~15-25s of per-process floor
    # (measured with the tiny-model driver on the 1-core host); persisting
    # them trades pennies of cache size for most of that floor.
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.35)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
