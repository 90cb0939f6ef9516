"""Profiling / tracing — first-class observability.

The reference has no profiling story (SURVEY.md §5: tqdm bars only). Here:

- `trace(dir)` context manager captures an XLA/TPU profile viewable in
  TensorBoard or Perfetto (jax.profiler.trace).
- `annotate(name)` marks host-side phases inside a trace
  (jax.profiler.TraceAnnotation).
- `timed(name)` is a lightweight wall-clock logger for phase timing without
  a profile (what bench.py and the CLIs print with --verbose-timing).
"""

from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/lmdx_trace"):
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    return jax.profiler.TraceAnnotation(name)


class timed:
    """with timed("phase") as t: ...; t.seconds afterwards."""

    def __init__(self, name: str, verbose: bool = True):
        self.name = name
        self.verbose = verbose
        self.seconds = 0.0

    def __enter__(self):
        self.start = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.seconds = time.perf_counter() - self.start
        if self.verbose:
            print(f"[lmdx] {self.name}: {self.seconds:.3f}s", flush=True)
        return False
