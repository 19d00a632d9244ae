"""Multi-host (DCN) initialization.

SURVEY.md §3.9 comm-backend row: the reference is single-process/single-GPU;
the TPU-native answer scales over ICI within a host via ``jax.sharding``
(``parallel.mesh``) and over DCN across hosts via
``jax.distributed.initialize`` — no custom transport. This module is the
thin, testable wrapper that turns that sentence into an executable path:
``run_training.py --multihost`` calls :func:`initialize`, after which
``jax.devices()`` is the GLOBAL device list and the existing ``auto_mesh``
data-parallel sharding spans hosts unchanged (XLA routes the gradient
psum over ICI within a host and DCN across hosts).

Smoke-tested hermetically with two CPU processes
(``tests/test_multihost.py``) — the rebuild's analog of a multi-node test
rig, per SURVEY.md §5.
"""

from __future__ import annotations

import os
from typing import Optional


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Join (or start) the jax.distributed coordination service.

    Arguments default to the standard environment variables
    (``JAX_COORDINATOR_ADDRESS`` / ``JAX_NUM_PROCESSES`` /
    ``JAX_PROCESS_ID``); on TPU pods all three may be None and jax infers
    them from the TPU metadata.
    """

    import jax

    kwargs = {}
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    )
    if coordinator_address:
        kwargs["coordinator_address"] = coordinator_address
    env_np = os.environ.get("JAX_NUM_PROCESSES")
    num_processes = num_processes if num_processes is not None else (
        int(env_np) if env_np else None
    )
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    env_pid = os.environ.get("JAX_PROCESS_ID")
    process_id = process_id if process_id is not None else (
        int(env_pid) if env_pid else None
    )
    if process_id is not None:
        kwargs["process_id"] = process_id
    jax.distributed.initialize(**kwargs)


def process_info() -> str:
    import jax

    return (
        f"process {jax.process_index()}/{jax.process_count()}: "
        f"{len(jax.local_devices())} local of {len(jax.devices())} global devices"
    )
