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

import jax

from dprast.parallel.sharded import POINTS_AXIS, POSES_AXIS, make_mesh


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None) -> None:
    """Form the multi-host process group (no-op if already initialised or
    single-process).  Arguments default to the TPU environment variables,
    as `jax.distributed.initialize` documents."""
    if jax.process_count() > 1:
        return  # already initialised
    try:
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id)
    except (ValueError, RuntimeError):
        # single-process environments (tests, one-host runs) need no group
        pass


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
