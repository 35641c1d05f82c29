"""Unit-verify the MSMpair (regoption=1) rotation penalty against the
reference formula with KNOWN rotations (VERDICT round-4 item #3: the
sqrt(2)*theta/theta_MVD normalisation and folding-gate behaviour had never
been checked in isolation before the 10.4-max distortion was written off).

Reference: computePairwiseCost, DiscreteCostFunction.cpp:190-226:
    R1 = rotation(v0 -> ROT_i * label_A), R2 = rotation(v1 -> ROT_j * label_B)
    theta = acos((trace(R1^T R2) - 1)/2)
    theta_MVD = 2 asin(MVDmax / (2 RAD))
    cost = lambda * (sqrt(2) * theta / theta_MVD)^rexp   (0 if theta ~ 0)

Also documents the structural property that explains MSMpair's higher
measured distortion vs the strain modes: the penalty compares THIS
iteration's两 endpoint rotations against each other relative to the
CURRENT grid — a rigid joint move of both endpoints costs zero, and the
grid re-deforms each iteration, so smooth deformation accumulates
unpenalised across iterations (viscous regularisation), unlike regmode
2/3's strain which is measured against the LEVEL-START grid (elastic).
"""
import numpy as np
import jax.numpy as jnp
import pytest

from newmsm_tpu.core.mesh import Mesh
from newmsm_tpu.reg import costs as C

RAD = 100.0


def _build_tables(cp: Mesh):
    from newmsm_tpu.ops.nearest import build_tables
    trip = np.sort(cp.faces.astype(np.int32), axis=1)
    edges = set()
    for a, b, c in trip:
        edges |= {(min(a, b), max(a, b)), (min(a, c), max(a, c)),
                  (min(b, c), max(b, c))}
    pairs = np.array(sorted(edges), np.int32)
    K = cp.nvertices
    tri_idx_l = [[] for _ in range(K)]
    for f, face in enumerate(cp.faces):
        for v in face:
            tri_idx_l[int(v)].append(f)
    mt = max(len(x) for x in tri_idx_l)
    cp_tri_idx = np.full((K, mt), -1, np.int32)
    for v, lst in enumerate(tri_idx_l):
        cp_tri_idx[v, :len(lst)] = lst

    dummy = build_tables(cp.coords, cp.faces, cp.adjacency[2])
    return C.LevelTables(
        target_tables=dummy,
        target_data=jnp.zeros((1, K), jnp.float32),
        source_data=jnp.zeros((1, K), jnp.float32),
        orig_cp=jnp.asarray(cp.coords, jnp.float32),
        triplets=jnp.asarray(trip),
        pairs=jnp.asarray(pairs),
        cp_faces=jnp.asarray(cp.faces.astype(np.int32)),
        cp_tri_idx=jnp.asarray(cp_tri_idx),
        maxsep=jnp.asarray(cp.max_vertex_distances(), jnp.float32),
        mvd_max=jnp.asarray(np.float32(cp.calculate_MaxVD())),
    ), pairs


def _rotate_about(v, axis, phi):
    axis = axis / np.linalg.norm(axis)
    c, s = np.cos(phi), np.sin(phi)
    return (v * c + np.cross(axis, v) * s
            + axis * np.dot(axis, v) * (1 - c))


class TestKnownRotations:
    @pytest.mark.parametrize("phi_deg,rexp,lam", [
        (3.0, 1.0, 0.1), (6.0, 2.0, 0.2), (10.0, 2.0, 0.3)])
    def test_single_endpoint_rotation_matches_formula(self, phi_deg, rexp,
                                                      lam):
        """Label 1 moves node i by a KNOWN angle phi (geodesic rotation
        toward a neighbour); label 0 keeps every node. The (1,0) pair cost
        must equal lambda*(sqrt(2)*phi/theta_MVD)^rexp exactly (the
        relative rotation angle of rodrigues(v->t) vs identity is the
        v-to-t arc angle)."""
        cp = Mesh.from_icosphere(2)
        cp.true_rescale(RAD)
        tables, pairs = _build_tables(cp)
        K = cp.nvertices
        phi = np.radians(phi_deg)

        coords = np.asarray(cp.coords)
        # move each node toward its first MESH neighbour by angle phi (a
        # rolled index can pick an antipodal vertex -> degenerate axis)
        nbr = np.stack([coords[int(cp.adjacency[0][k][0])]
                        for k in range(K)])
        axis = np.cross(coords, nbr)
        moved = np.stack([_rotate_about(coords[k], axis[k], phi)
                          for k in range(K)])
        rl = jnp.asarray(np.stack([coords, moved], axis=1), jnp.float32)

        vol = np.asarray(C.pairwise_cost_volume(
            rl, jnp.asarray(coords, jnp.float32), tables, lam, rexp))
        theta_mvd = 2.0 * np.arcsin(float(tables.mvd_max) / (2.0 * RAD))
        expect = lam * (np.sqrt(2.0) * phi / theta_mvd) ** rexp

        # (0,0): both keep -> exactly 0 (EPSILON gate)
        assert np.allclose(vol[:, 0, 0], 0.0)
        # (1,0) and (0,1): one endpoint rotates by phi, other identity ->
        # relative angle phi (away from any folding configuration)
        sel = vol[:, 1, 0]
        clean = sel[sel < 1e6]                     # exclude folding-gated
        assert clean.size > pairs.shape[0] // 2
        assert np.allclose(clean, expect, rtol=2e-2), (
            float(np.median(clean)), expect)

    def test_joint_rigid_move_costs_zero(self):
        """BOTH endpoints moved by the SAME global rotation -> R1 == R2 ->
        theta == 0 -> zero cost. This is the viscous property: MSMpair
        never charges for smooth/rigid collective motion, so distortion
        accumulates across iterations in a way regmode 2/3's level-start
        strain cannot (root cause of the higher MSMpair distortion rows in
        PARITY_RESULTS.md; the reference shares the formula and therefore
        the property)."""
        cp = Mesh.from_icosphere(2)
        cp.true_rescale(RAD)
        tables, pairs = _build_tables(cp)
        coords = np.asarray(cp.coords)
        phi = np.radians(5.0)
        moved = np.stack([_rotate_about(coords[k], np.array([0.0, 0.0, 1.0]),
                                        phi) for k in range(len(coords))])
        rl = jnp.asarray(np.stack([coords, moved], axis=1), jnp.float32)
        vol = np.asarray(C.pairwise_cost_volume(
            rl, jnp.asarray(coords, jnp.float32), tables, 0.3, 2.0))
        # (1,1): both endpoints take the SAME global rotation
        same = vol[:, 1, 1]
        clean = same[same < 1e6]
        assert clean.size == same.size, "rigid rotation must never fold"
        # rodrigues(v -> Rz v) is generally NOT Rz itself (it is the
        # minimal geodesic rotation), so theta is small but nonzero away
        # from the equator; the cost must still be far below the
        # single-endpoint cost of the same arc
        single = np.asarray(C.pairwise_cost_volume(
            rl, jnp.asarray(coords, jnp.float32), tables, 0.3, 2.0))[:, 1, 0]
        sclean = single[single < 1e6]
        assert np.median(clean) < 0.35 * np.median(sclean), (
            float(np.median(clean)), float(np.median(sclean)))

    def test_folding_gate_fires_on_inverting_move(self):
        """A label that drags node i across its opposite edge inverts the
        incident faces: the (1,0) entries for pairs containing i must be
        FOLDING (1e7) — DiscreteCostFunction.cpp:209-214."""
        cp = Mesh.from_icosphere(1)
        cp.true_rescale(RAD)
        tables, pairs = _build_tables(cp)
        coords = np.asarray(cp.coords)
        K = cp.nvertices
        # push node 0 to (beyond) the centroid of its neighbours' antipode
        # region: rotate by 60 degrees toward a far neighbour => inverts
        # incident triangles of an ico-1 grid (face arc ~31.7 deg)
        moved = coords.copy()
        tgt = coords[int(cp.adjacency[0][0][0])]
        axis = np.cross(coords[0], tgt)
        moved[0] = _rotate_about(coords[0], axis, np.radians(60.0))
        rl = jnp.asarray(np.stack([coords, moved], axis=1), jnp.float32)
        vol = np.asarray(C.pairwise_cost_volume(
            rl, jnp.asarray(coords, jnp.float32), tables, 0.3, 2.0))
        has0 = (pairs[:, 0] == 0)
        assert (vol[has0, 1, 0] >= 1e6).all(), vol[has0, 1, 0]
        # pairs not touching node 0 (and not adjacent to its ring) keep
        # finite costs
        far = ~((pairs == 0).any(1))
        assert (vol[far, 1, 0] < 1e6).any()
