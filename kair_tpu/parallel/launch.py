"""Thin multi-host launcher (SURVEY.md §2.5: the reference's SLURM/NCCL
bootstrap, utils_dist.py:13-59, becomes jax.distributed.initialize — ICI
within a slice, DCN across slices, no rendezvous code of our own)."""

from __future__ import annotations

import os
import re
from typing import Optional


def first_slurm_hostname(nodelist: str) -> str:
    """First hostname of a SLURM nodelist, handling compressed range
    syntax (``node[01-04,07],other5``). Prefers ``scontrol show hostname``
    (the reference's method, utils_dist.py:38-42) and falls back to a
    local parser when scontrol isn't on PATH."""
    import subprocess

    try:
        out = subprocess.run(["scontrol", "show", "hostname", nodelist],
                             capture_output=True, text=True, check=True,
                             timeout=10).stdout
        if out.split():
            return out.split()[0]
    except Exception:
        pass
    # take the first top-level comma-separated entry (commas inside
    # brackets are range separators, not entry separators)
    depth, first = 0, []
    for ch in nodelist:
        if ch == "[":
            depth += 1
        elif ch == "]":
            depth -= 1
        elif ch == "," and depth == 0:
            break
        first.append(ch)
    entry = "".join(first)
    m = re.match(r"^([^\[]*)\[([^\]]+)\](.*)$", entry)
    if not m:
        return entry
    prefix, body, suffix = m.groups()
    # first range element, keeping zero padding: "01-04" -> "01"
    return prefix + body.split(",")[0].split("-")[0] + suffix


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
        head = first_slurm_hostname(nodelist)
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
