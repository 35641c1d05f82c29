"""Stage-level profile of the fusion sweep at ico-6/CP-4 (VERDICT round-4
item #6: with unary at ~5 ms, per-iteration time is dominated by `fusion
optimise` — produce the same stage table round 3 produced for unary, then
spend the biggest lever).

Stages per alpha step (reference work unit Fusion.h:148-202):
  tables   binary_move_tables: u0/u1 gathers + the (T,8) triplet
           8-combination strain tables (rl gathers + closed-form strain)
  icm      the multi-start parallel-ICM binary solve (10 starts vmapped,
           icm_passes x n_colors sequential color-group flips)
  energy   fusion_energy at the final labeling

Each stage is timed as ONE device program looping over sweeps*L alphas
(differential chained dispatch like bench.py, so the ~28 ms tunnel
dispatch floor cancels).

  python scripts/profile_fusion.py [--cpu] [--cp=4] [--data=6]
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def build_problem(cp_res, data_res):
    import jax.numpy as jnp

    from newmsm_tpu.core.mesh import Mesh
    from newmsm_tpu.ops.nearest import build_tables
    from newmsm_tpu.reg import costs as C
    from newmsm_tpu.reg.optimise.fusion import build_fusion_tables
    from newmsm_tpu.reg.sampling_grid import build_sampling_grid

    target = Mesh.from_icosphere(data_res)
    target.true_rescale(100.0)
    cp = Mesh.from_icosphere(cp_res)
    cp.true_rescale(100.0)
    K = cp.nvertices

    sg = build_sampling_grid(min(cp_res + 2, 5), 0.5 * cp.calculate_MaxVD())
    labels = jnp.asarray(sg.samples, jnp.float32)
    L = int(labels.shape[0])
    centre = jnp.asarray(sg.centre, jnp.float32)

    tables_t = build_tables(target.coords, target.faces, target.adjacency[2])
    rng = np.random.default_rng(0)
    src_data = jnp.asarray(rng.normal(size=(1, target.nvertices)),
                           jnp.float32)
    tgt_data = jnp.asarray(rng.normal(size=(1, target.nvertices)),
                           jnp.float32)

    trip = np.sort(cp.faces.astype(np.int32), axis=1)
    triplets = jnp.asarray(trip)
    ftab = build_fusion_tables(trip, K)
    cp_coords = jnp.asarray(cp.coords, jnp.float32)
    orig_cp = cp_coords

    rots, rl = C.rotated_label_positions(cp_coords, labels, centre)
    maxsep = jnp.asarray(cp.max_vertex_distances(), jnp.float32)
    patch_idx, patch_mask, _ = C.build_patches(
        cp_coords, jnp.asarray(target.coords, jnp.float32), maxsep, 1.0, 96)
    unary = C.unary_costs(
        cp_coords, rl, jnp.asarray(target.coords, jnp.float32), patch_idx,
        patch_mask, tables_t, src_data, tgt_data,
        jnp.ones_like(src_data), jnp.ones((K,), jnp.float32),
        simval=2, mode="univariate", lchunk=4).T

    def tfn(la, lb, lc):
        import jax.numpy as jnp

        from newmsm_tpu.core import spherical as sph
        from newmsm_tpu.ops.strain import triangular_strain
        va = rl[triplets[:, 0][:, None], la]
        vb = rl[triplets[:, 1][:, None], lb]
        vc = rl[triplets[:, 2][:, None], lc]
        cur = cp_coords[triplets]
        n_cur = sph.tri_normal(cur[:, 0], cur[:, 1], cur[:, 2])
        n_def = sph.tri_normal(va, vb, vc)
        folded = jnp.sum(n_def * n_cur[:, None, :], axis=-1) < 0.0
        o = orig_cp[triplets]
        ob = jnp.broadcast_to(o[:, None], va.shape[:2] + (3, 3))
        st = triangular_strain(ob, jnp.stack([va, vb, vc], axis=-2),
                               0.4, 1.6, 2.0)
        return jnp.where(folded, 1e7, 0.1 * jnp.power(st, 2.0))

    # production protocol: the binary specialisation (2 gathered positions
    # per corner selected into the 8 combos — model.triplet_combo_fn)
    from newmsm_tpu.reg import costs as C
    from newmsm_tpu.reg.optimise.fusion import _BITS

    class _LT:
        def __init__(self, t, cp, orig):
            self.triplets = t
            self.orig_cp = orig

    def binary_fast(cur3, alpha):
        lt = _LT(triplets, cp_coords, orig_cp)
        combos = []
        for corner in range(3):
            v2 = jnp.stack(
                [rl[triplets[:, corner], cur3[:, corner]],
                 rl[triplets[:, corner],
                    jnp.broadcast_to(alpha, cur3[:, 0].shape)]], axis=1)
            bit = _BITS[:, corner]
            combos.append(jnp.where(bit[None, :, None] == 1,
                                    v2[:, 1:2], v2[:, 0:1]))
        va, vb, vc = combos
        return C.triplet_costs_from_positions(
            va, vb, vc, cp_coords, lt, 0.1, 0.4, 1.6, 2.0, 2.0)

    tfn.binary_fast = binary_fast

    return dict(K=K, L=L, T=trip.shape[0], unary=unary, triplets=triplets,
                ftab=ftab, tfn=tfn, rl=rl)


def timed_program(fn, reps=3):
    """Median wall of a jitted nullary program (already compiled)."""
    fn()                                   # compile + warm
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return sorted(ts)[len(ts) // 2]


def main():
    import jax
    import jax.numpy as jnp
    if "--cpu" in sys.argv:
        jax.config.update("jax_platforms", "cpu")
    from newmsm_tpu.core.cache import enable_compile_cache
    enable_compile_cache()
    if jax.default_backend() == "tpu":
        from newmsm_tpu.ops.pallas_locate import ensure_validated
        ensure_validated()
    cp_res = next((int(a.split("=")[1]) for a in sys.argv
                   if a.startswith("--cp=")), 4)
    data_res = next((int(a.split("=")[1]) for a in sys.argv
                     if a.startswith("--data=")), 6)

    from newmsm_tpu.reg.optimise import fusion as FU

    p = build_problem(cp_res, data_res)
    K, L, T = p["K"], p["L"], p["T"]
    print(f"device: {jax.devices()[0]}  K={K} T={T} L={L} "
          f"n_colors={p['ftab'].vgroups.shape[0]} sweeps=2", flush=True)
    lab0 = jnp.zeros((K,), jnp.int32)
    nsteps = 2 * L

    # ---- full sweep --------------------------------------------------------
    full = jax.jit(lambda lab: FU.fusion_optimize(
        lab, p["unary"], p["triplets"], p["ftab"], p["tfn"],
        jnp.int32(L)))

    def run_full():
        return full(lab0).block_until_ready()
    t_full = timed_program(run_full)

    # ---- tables only -------------------------------------------------------
    # NOTE every staged loop threads a runtime-zero perturbation (acc*1e-37
    # underflows to 0 in f32) through its inputs so XLA can neither hoist
    # the loop-invariant body nor CSE iterations — the same trick bench.py's
    # chained dispatch uses.
    @jax.jit
    def tables_only(lab):
        def body(i, acc):
            alpha = i % L
            labp = lab + (acc * jnp.float32(1e-37)).astype(jnp.int32)
            u0, u1, t8, _ = FU.binary_move_tables(
                labp, alpha, p["unary"], p["triplets"], p["tfn"])
            return acc + u0.sum() + u1.sum() + t8.sum() * jnp.float32(1e-20)
        return jax.lax.fori_loop(0, nsteps, body, jnp.float32(0))

    t_tables = timed_program(lambda: tables_only(lab0).block_until_ready())

    # ---- icm only (tables built once, solve looped) ------------------------
    u0, u1, t8, _ = FU.binary_move_tables(lab0, 0, p["unary"],
                                          p["triplets"], p["tfn"])

    @jax.jit
    def icm_only(lab):
        starts = [jnp.zeros((K,), jnp.int32), jnp.ones((K,), jnp.int32)]
        key = jax.random.PRNGKey(7)
        starts.append(jax.random.bernoulli(key, 0.5, (8, K)).astype(jnp.int32))
        x0b = jnp.concatenate([jnp.stack(starts[:2]), starts[2]])

        def body(i, acc):
            x0 = x0b + (acc * jnp.float32(1e-37)).astype(jnp.int32)
            xs = jax.vmap(lambda x: FU._binary_icm(
                x, u0, u1, t8, None, p["triplets"], None, p["ftab"], 8))(x0)
            es = jax.vmap(lambda x: FU.binary_energy(
                x, u0, u1, t8, None, p["triplets"], None))(xs)
            return acc + es.min() * jnp.float32(1e-20)
        return jax.lax.fori_loop(0, nsteps, body, jnp.float32(0))

    t_icm = timed_program(lambda: icm_only(lab0).block_until_ready())

    # ---- energy eval -------------------------------------------------------
    @jax.jit
    def energy_only(lab):
        def body(i, acc):
            labp = lab + (acc * jnp.float32(1e-37)).astype(jnp.int32)
            return acc + FU.fusion_energy(labp, p["unary"], p["triplets"],
                                          p["tfn"]) * jnp.float32(1e-20)
        return jax.lax.fori_loop(0, nsteps, body, jnp.float32(0))

    t_energy = timed_program(lambda: energy_only(lab0).block_until_ready())

    print(f"full fusion_optimize (2 sweeps x {L} alphas): {t_full*1e3:.1f} ms"
          f"  ({t_full*1e3/nsteps:.2f} ms/alpha)")
    print(f"  tables stage  x{nsteps}: {t_tables*1e3:.1f} ms "
          f"({t_tables*1e3/nsteps:.2f} ms/alpha)")
    print(f"  icm+glue (full - tables): "
          f"{(t_full - t_tables)*1e3/nsteps:.2f} ms/alpha")
    print(f"  energy eval   x{nsteps}: {t_energy*1e3:.1f} ms "
          f"({t_energy*1e3/nsteps:.2f} ms/alpha; not part of "
          "fusion_optimize)")
    if t_icm > t_full:
        print(f"  [isolated icm loop measured {t_icm*1e3/nsteps:.2f} "
              "ms/alpha — OVER-counts: the fixed tables force the "
              "perturbed-start chains to serialise differently than in "
              "the real sweep; the subtraction line above is the honest "
              "stage split]")
    else:
        print(f"  icm stage     x{nsteps}: {t_icm*1e3:.1f} ms "
              f"({t_icm*1e3/nsteps:.2f} ms/alpha)")


if __name__ == "__main__":
    main()
