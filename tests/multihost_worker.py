"""Worker for the 2-process multi-host smoke test (NOT a pytest module).

Usage: python multihost_worker.py <coordinator_port> <process_id> <num_procs>

Brings up jax.distributed on the CPU backend with 4 virtual devices per
process, builds the same deterministic groupwise problem in every process,
contributes only its local subject slice, runs the production sharded
fusion step across processes (all_gather/psum over DCN in a real
deployment), and prints the resulting energy + labeling checksum.
"""
import os
import sys


def main():
    port, pid, nproc = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
    flags = os.environ.get("XLA_FLAGS", "")
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=4").strip()

    import jax
    jax.config.update("jax_platforms", "cpu")

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

    from newmsm_tpu.parallel import multihost as mh
    # MUST precede any backend-initialising jax call (the round-1 bug)
    mh.initialize(coordinator_address=f"127.0.0.1:{port}",
                  num_processes=nproc, process_id=pid)
    assert jax.process_count() == nproc, jax.process_count()
    assert len(jax.devices()) == 4 * nproc

    import numpy as np
    import jax.numpy as jnp
    from newmsm_tpu.parallel.group_fusion import (build_iteration_tables,
                                                  make_fusion_fn,
                                                  make_partner_fn)
    from test_group_sharded import build_problem

    S = 4 * nproc
    st, trip, maps, cp, spac, K, L = build_problem(S)

    mesh = mh.subjects_device_mesh()
    sl = mh.process_subject_slice(S, mesh=mesh)
    cp_g = mh.global_shard_subjects(cp[sl], mesh)
    spac_g = mh.global_shard_subjects(spac[sl], mesh)
    maps_g = mh.global_shard_subjects(maps[sl], mesh)

    partner_g = make_partner_fn(mesh, st, S)(cp_g)
    # replicated output: every process can read it fully
    partner = np.asarray(partner_g)
    tables = build_iteration_tables(partner, trip, S, K)

    labeling, energy, _ovf = make_fusion_fn(mesh, st, S)(
        maps_g, cp_g, spac_g, jnp.zeros((S * K,), jnp.int32),
        jnp.asarray(partner), tables)
    lab = np.asarray(labeling)
    print(f"RESULT pid={pid} energy={float(energy):.6f} "
          f"labsum={int(lab.sum())} moved={int((lab != 0).sum())}",
          flush=True)


if __name__ == "__main__":
    main()
