"""Certify the fusion binary solve against exhaustive enumeration.

The reference solves each binary "keep vs switch-to-alpha" move exactly with
ELC reduction + FastPD max-flow (Fusion.h:122-244). Our replacement is
multi-start parallel ICM (reg/optimise/fusion.py). On 12-node problems every
binary subproblem can be enumerated (2^12 states), so these tests assert the
ICM move energy EQUALS the exact minimum across a full registration's sweeps
— the contract VERDICT demanded instead of the previous "asserted, not
tested" status.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from newmsm_tpu.core.mesh import Mesh
from newmsm_tpu.reg import costs as C
from newmsm_tpu.reg.optimise.fusion import (binary_energy, binary_move_tables,
                                            build_fusion_tables,
                                            fusion_binary_solve)
from newmsm_tpu.reg.sampling_grid import build_sampling_grid

from fixtures import smooth_pattern


def _all_states(K):
    n = 1 << K
    bits = (np.arange(n)[:, None] >> np.arange(K)[None, :]) & 1
    return bits.astype(np.int32)                       # (2^K, K)


def _enum_min(u0, u1, t8, p4, triplets, pairs):
    """Exact minimum of the binary move energy by enumeration."""
    X = _all_states(len(u0))                           # (n,K)
    e = np.where(X == 1, np.asarray(u1)[None], np.asarray(u0)[None]).sum(1)
    if t8 is not None:
        xb = X[:, np.asarray(triplets)]                # (n,T,3)
        idx = xb[..., 0] * 4 + xb[..., 1] * 2 + xb[..., 2]
        e = e + np.take_along_axis(
            np.broadcast_to(np.asarray(t8)[None], idx.shape[:1] + t8.shape),
            idx[..., None], axis=2)[..., 0].sum(1)
    if p4 is not None:
        xp = X[:, np.asarray(pairs)]                   # (n,P,2)
        idx = xp[..., 0] * 2 + xp[..., 1]
        e = e + np.take_along_axis(
            np.broadcast_to(np.asarray(p4)[None], idx.shape[:1] + p4.shape),
            idx[..., None], axis=2)[..., 0].sum(1)
    return float(e.min())


class TestRegistrationSweeps:
    def test_every_move_is_exact_across_registration(self):
        """Full fusion sweeps of a real 12-CP registration problem (unary
        data volume + strain triplets), every alpha's binary solve checked
        against the 4096-state enumeration, CP grid re-deformed between
        outer iterations exactly like the driver."""
        target = Mesh.from_icosphere(3)
        target.true_rescale(100.0)
        cp = Mesh.from_icosphere(0)
        cp.true_rescale(100.0)
        K = cp.nvertices
        assert K == 12

        sg = build_sampling_grid(2, 0.5 * cp.calculate_MaxVD())
        labels = jnp.asarray(sg.samples, jnp.float32)
        L = labels.shape[0]
        centre = jnp.asarray(sg.centre, jnp.float32)

        from newmsm_tpu.ops.nearest import build_tables
        tables_t = build_tables(target.coords, target.faces,
                                target.adjacency[2])
        src_data = jnp.asarray(
            smooth_pattern(target.coords, seed=3)[None], jnp.float32)
        tgt_data = jnp.asarray(
            smooth_pattern(target.coords, seed=4)[None], jnp.float32)
        cfw = jnp.ones_like(src_data)
        absw = jnp.ones((K,), jnp.float32)
        maxsep = jnp.asarray(cp.max_vertex_distances(), jnp.float32)
        src_coords = jnp.asarray(target.coords, jnp.float32)

        trip = np.sort(cp.faces.astype(np.int32), axis=1)
        triplets = jnp.asarray(trip)
        ftab = build_fusion_tables(trip, K)
        orig_cp = jnp.asarray(cp.coords, jnp.float32)

        cp_coords = jnp.asarray(cp.coords, jnp.float32)
        labeling = jnp.zeros((K,), jnp.int32)
        n_checked = n_moved = 0
        for outer in range(2):
            rots, rl = C.rotated_label_positions(cp_coords, labels, centre)
            patch_idx, patch_mask, _ = C.build_patches(
                cp_coords, src_coords, maxsep, 1.0, 128)
            unary = C.unary_costs(
                cp_coords, rl, src_coords, patch_idx, patch_mask, tables_t,
                src_data, tgt_data, cfw, absw, simval=2,
                mode="univariate").T                     # (L,K)

            def tfn(la, lb, lc, rl=rl, cpc=cp_coords):
                rl_nm = rl
                va = rl_nm[triplets[:, 0][:, None], la]
                vb = rl_nm[triplets[:, 1][:, None], lb]
                vc = rl_nm[triplets[:, 2][:, None], lc]
                from newmsm_tpu.core import spherical as sph
                from newmsm_tpu.ops.strain import triangular_strain
                cur = cpc[triplets]
                n_cur = sph.tri_normal(cur[:, 0], cur[:, 1], cur[:, 2])
                n_def = sph.tri_normal(va, vb, vc)
                folded = jnp.sum(n_def * n_cur[:, None, :], axis=-1) < 0.0
                o = orig_cp[triplets]
                ob = jnp.broadcast_to(o[:, None], va.shape[:2] + (3, 3))
                st = triangular_strain(ob, jnp.stack([va, vb, vc], axis=-2),
                                       0.4, 1.6, 2.0)
                return jnp.where(folded, 1e7, 0.1 * jnp.power(st, 2.0))

            for sweep in range(2):
                for alpha in range(L):
                    x = fusion_binary_solve(labeling, alpha, unary, triplets,
                                            ftab, tfn)
                    u0, u1, t8, p4 = binary_move_tables(
                        labeling, alpha, unary, triplets, tfn)
                    e_icm = float(binary_energy(jnp.asarray(x), u0, u1, t8,
                                                p4, triplets, None))
                    e_min = _enum_min(u0, u1, t8, None, trip, None)
                    assert e_icm <= e_min + 1e-4 * max(1.0, abs(e_min)), \
                        (outer, sweep, alpha, e_icm, e_min)
                    n_checked += 1
                    n_moved += int(np.asarray(x).sum())
                    labeling = jnp.where(x == 1, alpha, labeling)

            # apply labeling like the driver: CP_k = RL[k, l_k]
            cp_coords = rl[jnp.arange(K), labeling]

        assert n_checked == 2 * 2 * L
        assert n_moved > 0, "fixture never exercised a non-trivial move"


class TestRandomisedWithPairs:
    @pytest.mark.parametrize("seed", [0, 1, 2, 3, 4, 5, 6, 7])
    def test_random_tables_with_pairs(self, seed):
        """Random (non-submodular-guaranteed) unary/triplet/pair tables on a
        12-node graph: the multi-start ICM must still reach the enumerated
        minimum. This is strictly harder than the registration case (FastPD
        itself is only exact for submodular binaries)."""
        rng = np.random.default_rng(seed)
        K, L = 12, 5
        cpm = Mesh.from_icosphere(0)
        trip = np.sort(cpm.faces.astype(np.int32), axis=1)
        # cross pairs: ring of nodes + a few chords
        pairs = np.array([[i, (i + 1) % K] for i in range(K)]
                         + [[0, 6], [2, 9], [4, 11]], np.int32)
        ftab = build_fusion_tables(trip, K, pairs=pairs)
        triplets = jnp.asarray(trip)
        jp = jnp.asarray(pairs)

        unary = jnp.asarray(rng.normal(size=(L, K)), jnp.float32)
        tvol = jnp.asarray(rng.normal(size=(trip.shape[0], L, L, L)) * 0.5,
                           jnp.float32)
        pvol = jnp.asarray(rng.normal(size=(pairs.shape[0], L, L)) * 0.5,
                           jnp.float32)

        def tfn(la, lb, lc):
            return tvol[jnp.arange(trip.shape[0])[:, None], la, lb, lc]

        def pfn(pa, pb):
            return pvol[jnp.arange(pairs.shape[0])[:, None], pa, pb]

        labeling = jnp.asarray(rng.integers(0, L, size=K), jnp.int32)
        worst_gap = 0.0
        for alpha in range(L):
            # random energies are far harder than registration energies:
            # use the documented fallback (more random restarts)
            x = fusion_binary_solve(labeling, alpha, unary, triplets, ftab,
                                    tfn, pairs=jp, pair_combo_fn=pfn,
                                    n_restarts=16)
            u0, u1, t8, p4 = binary_move_tables(labeling, alpha, unary,
                                                triplets, tfn, jp, pfn)
            e_icm = float(binary_energy(jnp.asarray(x), u0, u1, t8, p4,
                                        triplets, jp))
            e_min = _enum_min(u0, u1, t8, p4, trip, pairs)
            worst_gap = max(worst_gap, e_icm - e_min)
            labeling = jnp.where(x == 1, alpha, labeling)
        # documented bound: ICM multi-start reaches the exact optimum on
        # these instances; if this ever regresses the gap is printed
        assert worst_gap <= 1e-4, worst_gap
