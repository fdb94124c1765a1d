"""Multi-host initialization.

The reference's multi-process story is Lightning DDP spawning one process
per GPU over NCCL (SURVEY §2.7). The TPU equivalent is one JAX process per
host with ``jax.distributed.initialize`` — after which every ``jit`` sees
the global device set and the data mesh spans hosts over ICI/DCN
automatically. Single-process runs (the common case here) skip
initialization entirely.
"""
from __future__ import annotations

import os

import jax

from ..utils.logging import get_logger

log = get_logger(__name__)

__all__ = ["initialize_distributed", "is_main_process"]

_initialized = False


def initialize_distributed(coordinator_address: str | None = None,
                           num_processes: int | None = None,
                           process_id: int | None = None) -> bool:
    """Initialize multi-host JAX if configured; returns True if distributed.

    Resolution order: explicit args > JAX_COORDINATOR_ADDRESS env (with
    JAX_NUM_PROCESSES / JAX_PROCESS_ID) > TPU pod auto-detection (argless
    initialize) > single-process no-op.
    """
    global _initialized
    if _initialized:
        return jax.process_count() > 1

    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS")
    if coordinator_address:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes or int(
                os.environ.get("JAX_NUM_PROCESSES", "1")),
            process_id=process_id if process_id is not None else int(
                os.environ.get("JAX_PROCESS_ID", "0")))
        _initialized = True
    elif os.environ.get("GSDD_AUTO_DISTRIBUTED"):
        # on a TPU pod slice, argless initialize auto-discovers peers;
        # opt-in because partial TPU env vars exist on single-host images
        try:
            jax.distributed.initialize()
            _initialized = True
        except Exception as e:
            log.warning("auto distributed init failed (%s); "
                        "continuing single-process", e)
            return False
    else:
        return False
    log.info("distributed: process %d/%d, %d devices",
             jax.process_index(), jax.process_count(), jax.device_count())
    return jax.process_count() > 1


def is_main_process() -> bool:
    try:
        return jax.process_index() == 0
    except Exception:
        return True
