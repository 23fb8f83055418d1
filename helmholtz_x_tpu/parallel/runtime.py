"""Multi-host runtime scaffolding: jax.distributed initialization + mesh
construction — the replacement for the reference's `mpirun -np N` /
MPI.COMM_WORLD bootstrap (reference: every module imports COMM_WORLD;
runAll.sh launches `mpirun`; SURVEY §2.3 plan).

Single-host (any number of local devices) needs NO initialization — jit and
shard_map already address every local chip.  Multi-host pods/slices call
`initialize_distributed()` once per process before any jax call; each host
then sees the global device set and the same shard_map programs run over
ICI/DCN collectives unchanged.

Launch contract (mirrors `mpirun`'s env): either rely on the TPU pod
metadata (no args needed on Cloud TPU slices) or set
    HELMHOLTZ_X_COORD=host0:port  HELMHOLTZ_X_NPROC=N  HELMHOLTZ_X_PROC=rank
"""

from __future__ import annotations

import os

import numpy as np


_initialized = False


def initialize_distributed(coordinator: str | None = None,
                           num_processes: int | None = None,
                           process_id: int | None = None) -> bool:
    """Initialize the multi-host runtime (idempotent).  Returns True when a
    multi-process runtime was started, False for the single-process case.

    On Cloud TPU slices all three arguments are discovered from the pod
    metadata; elsewhere pass them (or the HELMHOLTZ_X_* env vars)."""
    global _initialized
    import jax

    if _initialized:
        return jax.process_count() > 1
    coordinator = coordinator or os.environ.get("HELMHOLTZ_X_COORD")
    num_processes = num_processes or (
        int(os.environ["HELMHOLTZ_X_NPROC"])
        if "HELMHOLTZ_X_NPROC" in os.environ else None)
    process_id = process_id if process_id is not None else (
        int(os.environ["HELMHOLTZ_X_PROC"])
        if "HELMHOLTZ_X_PROC" in os.environ else None)
    if coordinator is None and num_processes is None and not _on_tpu_pod():
        return False  # single process, nothing to do
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_processes,
                               process_id=process_id)
    _initialized = True
    return jax.process_count() > 1


def _on_tpu_pod() -> bool:
    """True when TPU pod metadata is available for argument-less init."""
    return any(v in os.environ for v in
               ("TPU_WORKER_HOSTNAMES", "MEGASCALE_COORDINATOR_ADDRESS")) \
        and os.environ.get("HELMHOLTZ_X_MULTIHOST", "0") not in ("0", "")


def dof_mesh(n_devices: int | None = None):
    """1-D dof-partition mesh over the first n_devices global devices (all
    when None) — the axis name matches parallel.dist.AXIS."""
    import jax
    from jax.sharding import Mesh

    from .dist import AXIS

    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (AXIS,))
