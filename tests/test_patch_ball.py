"""Certified candidate-ball pre-prune for build_patches (reg/costs.py).

The pruned path must be EXACTLY equivalent to the dense all-pairs path
(same in-range sets, same masks) whenever patch_candidate_ball issues a
table, and the certificate must refuse wild geometry.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from newmsm_tpu.core.mesh import Mesh
from newmsm_tpu.reg import costs as C


def _bump(res, p):
    """Smooth polar compression warp (monotone, fold-free)."""
    m = Mesh.from_icosphere(res)
    m.true_rescale(100.0)
    c = m.coords.copy()
    r = np.linalg.norm(c, axis=1)
    theta = np.arccos(np.clip(c[:, 2] / r, -1, 1))
    phi = np.arctan2(c[:, 1], c[:, 0])
    theta2 = np.pi * (theta / np.pi) ** p
    m.coords = np.stack([np.sin(theta2) * np.cos(phi),
                         np.sin(theta2) * np.sin(phi),
                         np.cos(theta2)], axis=1) * 100.0
    return m


def _patch_sets(idx, mask):
    idx = np.asarray(idx)
    mask = np.asarray(mask)
    return [frozenset(idx[k][mask[k]].tolist()) for k in range(idx.shape[0])]


@pytest.mark.parametrize("p", [1.0, 1.15])
def test_pruned_equals_dense(p):
    src = _bump(4, p)
    cp = Mesh.from_icosphere(3)
    cp.true_rescale(100.0)
    maxsep = cp.max_vertex_distances().astype(np.float32)
    limits = 1.0 * maxsep
    ball_np = C.patch_candidate_ball(cp.coords, src.coords, src.faces, limits)
    assert ball_np is not None, "certificate must pass for mild warps"
    assert ball_np.shape[1] < src.nvertices // 2

    cpj = jnp.asarray(cp.coords, jnp.float32)
    srcj = jnp.asarray(src.coords, jnp.float32)
    msj = jnp.asarray(maxsep)
    pmax = 256
    idx_d, mask_d, of_d = C.build_patches(cpj, srcj, msj, 1.0, pmax)
    idx_p, mask_p, of_p = C.build_patches(cpj, srcj, msj, 1.0, pmax,
                                          jnp.asarray(ball_np))
    assert _patch_sets(idx_p, mask_p) == _patch_sets(idx_d, mask_d)
    np.testing.assert_array_equal(np.asarray(of_p), np.asarray(of_d))


def test_pruned_overflow_detection_matches_dense():
    src = Mesh.from_icosphere(4)
    src.true_rescale(100.0)
    cp = Mesh.from_icosphere(2)
    cp.true_rescale(100.0)
    maxsep = cp.max_vertex_distances().astype(np.float32)
    ball_np = C.patch_candidate_ball(cp.coords, src.coords, src.faces,
                                     1.0 * maxsep)
    assert ball_np is not None
    cpj = jnp.asarray(cp.coords, jnp.float32)
    srcj = jnp.asarray(src.coords, jnp.float32)
    msj = jnp.asarray(maxsep)
    # tiny pmax so every patch overflows
    _, _, of_d = C.build_patches(cpj, srcj, msj, 1.0, 8)
    _, _, of_p = C.build_patches(cpj, srcj, msj, 1.0, 8,
                                 jnp.asarray(ball_np))
    np.testing.assert_array_equal(np.asarray(of_p), np.asarray(of_d))
    assert bool(np.asarray(of_p).all())


def test_certificate_refuses_wild_geometry():
    src = _bump(4, 2.2)           # extreme polar compression
    cp = Mesh.from_icosphere(2)
    cp.true_rescale(100.0)
    maxsep = cp.max_vertex_distances().astype(np.float32)
    assert C.patch_candidate_ball(cp.coords, src.coords, src.faces,
                                  1.0 * maxsep) is None


def test_certificate_refuses_non_icosphere():
    src = Mesh.from_icosphere(3)
    src.true_rescale(100.0)
    faces = src.faces.copy()
    faces[0] = faces[0][[1, 0, 2]]        # break the canonical face table
    cp = Mesh.from_icosphere(2)
    cp.true_rescale(100.0)
    maxsep = cp.max_vertex_distances().astype(np.float32)
    assert C.patch_candidate_ball(cp.coords, src.coords, faces,
                                  1.0 * maxsep) is None


def test_ball_table_has_no_duplicates():
    tab = C._ball_table_np(4, 162, 6)
    for row in tab:
        real = row[row >= 0]
        assert len(real) == len(set(real.tolist()))
