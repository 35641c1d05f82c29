"""Multi-host (DCN) orchestration for groupwise registration.

The reference scales cohorts with bash over SLURM — independent processes,
no interconnect (SURVEY §2.7). Here the subject axis spans hosts: every
process holds S/num_processes subjects on its local chips, the groupwise
step's all_gather of template-space maps crosses ICI within a host and DCN
across hosts exactly once per iteration, and psum'd cost tables keep every
process's label updates bit-identical (no coordinator beyond JAX's own).

Usage (one process per host, e.g. under SLURM):

    from newmsm_tpu.parallel import multihost
    multihost.initialize()                  # env-driven; no-op single-host
    mesh = multihost.subjects_device_mesh()
    step = make_group_step(mesh, statics, n_subjects)
    maps = multihost.shard_subjects(maps, mesh)
    ...

JAX's distributed runtime reads COORDINATOR_ADDRESS / NUM_PROCESSES /
PROCESS_ID (or SLURM variables) when arguments are omitted.
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_initialized = False


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None,
               local_device_ids=None) -> None:
    """Bring up the JAX global runtime across hosts (jax.distributed).

    Idempotent; a no-op when running single-process with no coordinator
    configured (the common 1-host case and all tests).

    MUST be called before any backend-initialising JAX call, so the
    already-distributed check reads jax.distributed's own client state
    instead of jax.process_count() (which would initialise the backend and
    make jax.distributed.initialize() raise)."""
    global _initialized
    if _initialized:
        return
    try:
        from jax._src.distributed import global_state
        already = global_state.client is not None
    except Exception:                        # pragma: no cover — jax internals
        already = False
    if already:
        _initialized = True
        return
    import os
    if coordinator_address is None and "COORDINATOR_ADDRESS" not in os.environ \
            and "SLURM_JOB_ID" not in os.environ:
        return                               # single host, nothing to do
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        local_device_ids=local_device_ids,
    )
    _initialized = True


def subjects_device_mesh(axis: str = "subjects") -> Mesh:
    """1-D device mesh over ALL global devices for subject sharding.

    Hosts-outer ordering: devices of the same process are contiguous along
    the axis, so consecutive subjects land on one host and the groupwise
    all_gather's ring crosses DCN only between host-boundary neighbours
    (ICI everywhere else)."""
    devs = sorted(jax.devices(), key=lambda d: (d.process_index, d.id))
    return Mesh(np.array(devs), (axis,))


def shard_subjects(array, mesh: Mesh, axis: str = "subjects"):
    """device_put with the leading (subject) axis sharded over the mesh."""
    return jax.device_put(array, NamedSharding(mesh, P(axis)))


def replicate(array, mesh: Mesh):
    """device_put fully replicated over the mesh."""
    return jax.device_put(array, NamedSharding(mesh, P()))


def global_shard_subjects(local_array, mesh: Mesh, axis: str = "subjects"):
    """Assemble a GLOBAL subject-sharded array from this process's local
    subject slice (the multi-process complement of shard_subjects: each host
    loads only its process_subject_slice of the cohort and contributes it
    here; jax stitches the global array without any host ever holding all
    subjects)."""
    sharding = NamedSharding(mesh, P(axis))
    return jax.make_array_from_process_local_data(sharding, local_array)


def process_subject_slice(n_subjects: int, axis: str = "subjects",
                          mesh: Mesh | None = None) -> slice:
    """The contiguous subject range this process owns under
    subjects_device_mesh sharding — for loading only local subjects' GIFTI
    files from disk (each host reads S/num_processes subjects)."""
    mesh = mesh or subjects_device_mesh(axis)
    n_dev = mesh.devices.size
    if n_subjects % n_dev:
        raise ValueError(
            f"n_subjects={n_subjects} must be divisible by the device count "
            f"{n_dev} for subject sharding (pad the cohort or drop devices); "
            "refusing to silently drop the remainder subjects")
    per_dev = n_subjects // n_dev
    local = [i for i, d in enumerate(mesh.devices.flat)
             if d.process_index == jax.process_index()]
    if not local:
        return slice(0, 0)
    return slice(local[0] * per_dev, (local[-1] + 1) * per_dev)
