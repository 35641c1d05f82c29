"""MCMC sweep throughput on the current device (VERDICT round-2 item #7).

Measures wall time per EFFECTIVE sweep (one geometric draw per triplet) at
the reference's CP-3 scale for proposal block sizes R in {1, 8, 16}, using
total-run timing over enough draws to swamp the dispatch floor. The
reference default is mciters=100000 (mesh_registration.cpp:712-713).
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    if "--cpu" in sys.argv:
        import jax
        jax.config.update("jax_platforms", "cpu")
    from newmsm_tpu.core.cache import enable_compile_cache
    enable_compile_cache()
    import jax
    import jax.numpy as jnp
    from newmsm_tpu.core.mesh import Mesh
    from newmsm_tpu.reg.optimise.coloring import color_groups, face_coloring
    from newmsm_tpu.reg.optimise.mcmc import mcmc_optimise

    print("device:", jax.devices()[0], flush=True)
    cp = Mesh.from_icosphere(3)
    cp.true_rescale(100.0)
    K = cp.nvertices
    trip = np.sort(cp.faces.astype(np.int32), axis=1)
    T, L = trip.shape[0], 19
    groups, gmask = color_groups(face_coloring(trip, K))
    print(f"T={T} triplets, L={L} labels, {groups.shape[0]} colors",
          flush=True)

    rng = np.random.default_rng(1)
    unary = jnp.asarray(rng.normal(size=(L, K)), jnp.float32)
    tcosts = jnp.asarray(np.abs(rng.normal(size=(T, L, L, L))) * 0.1,
                         jnp.float32)
    lab0 = jnp.zeros((K,), jnp.int32)
    key = jax.random.PRNGKey(0)
    args = (unary, tcosts, jnp.asarray(trip), jnp.asarray(groups),
            jnp.asarray(gmask))

    for R in (1, 8, 16):
        draws = 4000 * R if R > 1 else 4000
        # warmup/compile
        mcmc_optimise(lab0, *args, key, R, L, proposals=R
                      ).block_until_ready()
        t0 = time.perf_counter()
        mcmc_optimise(lab0, *args, key, draws, L, proposals=R
                      ).block_until_ready()
        dt = time.perf_counter() - t0
        per = dt / draws * 1e3
        print(f"R={R:2d}: {draws} draws in {dt:.2f}s -> "
              f"{per:.4f} ms/effective-sweep "
              f"(reference 100k draws: {per * 100:.1f}s)", flush=True)


if __name__ == "__main__":
    main()
