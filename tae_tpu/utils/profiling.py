"""Profiling and tracing hooks.

The reference's observability stops at wall-clock meters (SURVEY.md §5). On
TPU the equivalent first-class tools are XLA profiler traces (viewable in
TensorBoard/Perfetto/XProf) plus the same iter/data-time meters
(:mod:`tae_tpu.utils.meters`). This module wraps ``jax.profiler``:

  * ``trace(logdir)`` — context manager capturing a device trace for the
    enclosed steps;
  * ``annotate(name)`` — TraceAnnotation for labelling host-side phases;
  * ``memory_stats()`` — per-device HBM usage (the reference prints CUDA
    max-memory in its loggers, util/misc.py:148).
"""

from __future__ import annotations

import contextlib
from pathlib import Path

import jax


@contextlib.contextmanager
def trace(logdir: str | Path, *, host_tracer: bool = True):
    Path(logdir).mkdir(parents=True, exist_ok=True)
    jax.profiler.start_trace(str(logdir), create_perfetto_link=False)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Label a host-side region in profiler traces."""
    return jax.profiler.TraceAnnotation(name)


def memory_stats() -> dict[str, float]:
    """Per-device memory in MiB (best effort; not all backends report)."""
    out: dict[str, float] = {}
    for d in jax.local_devices():
        stats = getattr(d, "memory_stats", lambda: None)()
        if stats:
            out[str(d)] = stats.get("bytes_in_use", 0) / (1024.0 * 1024.0)
    return out


def fix_random_seeds(seed: int = 31) -> jax.Array:
    """Seed numpy's global RNG and return a JAX PRNG key — the (actually
    used) analogue of the reference's never-called ``fix_random_seeds``
    (util/misc.py:161-165)."""
    import numpy as np

    np.random.seed(seed)
    return jax.random.key(seed)
