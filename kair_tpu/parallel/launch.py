"""Thin multi-host launcher (SURVEY.md §2.5: the reference's SLURM/NCCL
bootstrap, utils_dist.py:13-59, becomes jax.distributed.initialize — ICI
within a slice, DCN across slices, no rendezvous code of our own)."""

from __future__ import annotations

import os
from typing import Optional


def initialize_multihost(coordinator_address: Optional[str] = None,
                         num_processes: Optional[int] = None,
                         process_id: Optional[int] = None) -> None:
    """Initialize jax.distributed from args or SLURM/standard env vars.

    On TPU pods with the standard runtime, bare `jax.distributed.initialize()`
    autodetects everything; SLURM clusters map SLURM_* vars the same way the
    reference's _init_dist_slurm did (utils_dist.py:31-59)."""
    import jax

    if coordinator_address is None and "SLURM_PROCID" in os.environ:
        process_id = int(os.environ["SLURM_PROCID"])
        num_processes = int(os.environ["SLURM_NTASKS"])
        nodelist = os.environ.get("SLURM_STEP_NODELIST", "localhost")
        head = nodelist.split(",")[0].replace("[", "").split("-")[0]
        port = os.environ.get("MASTER_PORT", "29500")
        coordinator_address = f"{head}:{port}"
    if coordinator_address is not None:
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id)
    else:
        jax.distributed.initialize()


def is_main_process() -> bool:
    import jax
    return jax.process_index() == 0


def master_only(fn):
    """Decorator: run only on process 0 (reference utils_dist.py:100-108)."""
    import functools

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        if is_main_process():
            return fn(*args, **kwargs)
        return None

    return wrapper
