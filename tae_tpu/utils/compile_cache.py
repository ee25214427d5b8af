"""Persistent XLA compilation cache setup, shared by bench/profiling
scripts and the CLI drivers.

The traffic-planned int8 Mosaic kernels (ops/int8._plan_blocks) can take
15-20 minutes EACH to compile over the tunneled remote-compile helper, and
the accum-scan train step is similar — a warm cache cuts a cold bench run
from ~45+ min of compiles to seconds, and preemption-resumed runs
(--resume_auto) would otherwise repay the train-step compile every restart.
One helper so the TAE_TPU_COMPILE_CACHE override works everywhere (a
hardcoded path in one script once silently ignored it).
"""

from __future__ import annotations

import os


def enable_compile_cache(default: str | None = None,
                         min_secs: float = 2.0) -> str | None:
    """Point JAX's persistent compilation cache at ``TAE_TPU_COMPILE_CACHE``.

    ``default`` is used when the env var is unset: bench/profiling scripts
    pass the repo-local ``/root/repo/.xla_cache`` (on some rigs only the
    repo survives VM resets; /tmp does not), while the CLI drivers pass
    ``None`` so the cache stays opt-in for users. Returns the enabled path
    or ``None``. Harmless no-op if the backend bypasses the cache.
    """
    path = os.environ.get("TAE_TPU_COMPILE_CACHE", default)
    if not path:
        return None
    try:
        import jax

        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          float(min_secs))
    except Exception:
        return None
    return path
