"""Persistent XLA compilation-cache wiring for production entry points.

tests/conftest.py has used this since round 3 (fast suite 12:57 -> 4:58
warm); round 4 wires the same cache into bench.py, tasks.py and
scripts/generate.py so one-time Mosaic compiles (8.2 min for the MSRVTT
megakernel, ~9.5 min honest-bench init) are paid once per machine, not
once per process.

TPU caveat: in round 3, executing a cache-DESERIALIZED program through the
axon PJRT plugin hung the process (DESIGN.md round-3 second-session log),
so the TPU default is OFF until the round-4 re-probe passes; control it
with ``GIF_COMPILE_CACHE`` = ``1`` (force on), ``0`` (force off), unset =
on for CPU-only processes, off when a TPU platform may initialize.
"""
from __future__ import annotations

import os

__all__ = ["enable_compilation_cache"]


def enable_compilation_cache(cache_dir: str | None = None,
                             min_compile_secs: float = 1.0) -> bool:
    """Point jax at the shared on-disk compilation cache (idempotent;
    must run before the first compilation to be fully effective).

    Returns True when the cache was enabled."""
    import jax

    env = os.environ.get("GIF_COMPILE_CACHE", "").strip()
    if env == "0":
        return False
    if not env:
        # unset: only safe when this process is pinned to CPU (the axon
        # TPU plugin hang, module docstring). jax_platforms is set by
        # callers like tests/measure scripts before this runs.
        if jax.config.jax_platforms != "cpu":
            return False
    if cache_dir is None:
        cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR") or \
            os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__)))), ".cache", "jax")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", str(cache_dir))
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      float(min_compile_secs))
    return True
