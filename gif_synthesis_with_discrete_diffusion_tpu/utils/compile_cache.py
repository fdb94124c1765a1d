"""Persistent XLA compilation-cache wiring for production entry points.

tests/conftest.py has used this since round 3 (fast suite 12:57 -> 4:58
warm); round 4 wires the same cache into bench.py, tasks.py and
scripts/generate.py so one-time Mosaic compiles (8.2 min for the MSRVTT
megakernel, ~9.5 min honest-bench init) are paid once per machine, not
once per process.

TPU status: in round 3, executing a cache-DESERIALIZED program through
the axon PJRT plugin hung the process (DESIGN.md round-3 second-session
log), so the TPU default was OFF for rounds 3-4. The round-5 re-probe
(scripts/compile_cache_probe.py -> COMPILE_CACHE_PROBE.json) could NOT
reproduce the hang: a fresh process deserialized and EXECUTED both an XLA
and a Mosaic program from the cache (123.6s cold -> 0.4s warm XLA
first-call; 0.95s -> 0.06s Mosaic), so the cache now defaults ON
everywhere. ``GIF_COMPILE_CACHE`` = ``0`` force-disables it (the escape
hatch if the hang ever resurfaces), ``1`` forces it on.
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
    if cache_dir is None:
        cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR") or \
            os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__)))), ".cache", "jax")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", str(cache_dir))
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      float(min_compile_secs))
    return True
