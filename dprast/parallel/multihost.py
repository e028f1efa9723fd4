"""Multi-host initialisation and pod-scale mesh construction.

The reference is strictly single-process (SURVEY §2: no NCCL/MPI/UCX
anywhere); scaling beyond one host is a new capability of this framework.
JAX's runtime does the heavy lifting: `jax.distributed.initialize` forms
the process group, `jax.devices()` then spans every chip in the slice, and
the same `raster_sharded` shard_map (`dprast.parallel.sharded`) runs
unchanged — its `psum` collectives ride ICI within a host/slice and DCN
across hosts, compiled by XLA.

Typical pod run (same script on every host):

    from dprast.parallel import multihost, make_mesh, raster_sharded
    multihost.initialize()                  # env-driven (GKE/TPU VM)
    mesh = multihost.pod_mesh(points_axis_per_host=True)
    out = raster_sharded(grid, pts, rots, trs, mesh=mesh)
"""

from __future__ import annotations

import os

import jax

from dprast.parallel.sharded import POINTS_AXIS, POSES_AXIS, make_mesh

def _multiprocess_env() -> bool:
    """True when the environment indicates a multi-process launch.  When it
    does (or explicit arguments are given) a failure to form the process
    group is a REAL pod misconfiguration and must surface loudly — silently
    degrading to single-host would have every host compute in isolation."""
    if any(os.environ.get(v) for v in (
            "COORDINATOR_ADDRESS", "JAX_COORDINATOR_ADDRESS",
            "MEGASCALE_COORDINATOR_ADDRESS")):
        return True
    # TPU_WORKER_HOSTNAMES exists on single-host TPU VMs too ("localhost");
    # only >1 comma-separated worker means a pod slice.
    if len([h for h in
            os.environ.get("TPU_WORKER_HOSTNAMES", "").split(",") if h]) > 1:
        return True
    for var in ("SLURM_JOB_NUM_NODES", "OMPI_COMM_WORLD_SIZE"):
        try:
            if int(os.environ.get(var, "1")) > 1:
                return True
        except ValueError:
            pass
    return False


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None) -> None:
    """Form the multi-host process group.

    Must run before any JAX call that initialises the XLA backend (JAX
    requirement) — therefore this function checks
    `jax.distributed.is_initialized()` (pure state read) rather than
    `jax.process_count()` (which would initialise the backend first and
    make group formation impossible).

    Single-process environments (no explicit arguments AND no cluster
    environment variables) return without touching JAX at all.  In a
    configured cluster environment every error from
    `jax.distributed.initialize` propagates — a misconfigured pod must
    fail loudly, not silently degrade to isolated single-host compute.
    """
    if jax.distributed.is_initialized():
        return  # already initialised
    explicit = (coordinator_address is not None or num_processes is not None
                or process_id is not None)
    configured = explicit or _multiprocess_env()
    if not configured:
        return  # single-process run: no group to form, leave JAX untouched
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)


def pod_mesh(points_axis_per_host: bool = True):
    """A ("poses", "points") mesh over every device in the slice.

    With `points_axis_per_host` the "points" axis spans the devices WITHIN
    each host (collectives over it ride ICI) and "poses" spans hosts
    (its gradient psums cross DCN once per step, amortised over the whole
    pose batch) — the layout that keeps the hot forward `psum` of partial
    images off the slow links.
    """
    n = jax.device_count()
    local = jax.local_device_count()
    hosts = max(1, n // max(1, local))
    if points_axis_per_host and n % local == 0:
        return make_mesh(hosts, local)
    return make_mesh(n, 1)
