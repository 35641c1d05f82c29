"""Hyper-elastic strain energies, batched closed form.

Replicates the reference triangle_strain / calculate_triangular_strain
(reg_tools.cpp:551-743): project both triangles to their tangent planes,
form the 2x2 deformation gradient F from edge vectors, take invariants
I1 = tr(F^T F)+1, I3 = det, and evaluate

    W = mu/2 (R^k + R^-k - 2) + kappa/2 (J^k + J^-k - 2)

with J = sqrt(I3) and R the major/minor stretch ratio recovered from
(I1-1)/J. Everything is elementwise arithmetic — no SVD on the hot path —
so the (T, L^3) triplet cost volume is a single fused elementwise kernel.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..core import spherical as sph


def _tangent_frame(normal):
    """calculate_tri from a normal (reg_tools.cpp:267-313) -> (e1, e2)."""
    return sph.tangent_basis_from_normal(normal)


def _project_2d(verts, e1, e2, normal, det_ref):
    """Project triangle vertices (...,3,3) onto [e1,e2] (plus normal for the
    third column which the strain formula ignores). The reference swaps the
    two tangent columns when det([e1 e2 n]) of the ORIGINAL frame is negative
    (reg_tools.cpp:712-727 — note both swaps test the first frame's det;
    reproduced faithfully)."""
    x = jnp.einsum("...ij,...j->...i", verts, e1)
    y = jnp.einsum("...ij,...j->...i", verts, e2)
    swap = det_ref < 0
    xs = jnp.where(swap[..., None], y, x)
    ys = jnp.where(swap[..., None], x, y)
    return xs, ys


def _frame_det(e1, e2, n):
    return jnp.sum(jnp.cross(e1, e2) * n, axis=-1)


def triangle_strain_2d(ax, ay, bx, by, mu, kappa, k_exp):
    """Strain energy from 2-D projected coordinates; a*/b* are (...,3)
    original/final x and y vertex coordinates (reg_tools.cpp:551-597)."""
    c0 = ax[..., 1] - ax[..., 0]
    c1 = ay[..., 1] - ay[..., 0]
    c4 = ax[..., 2] - ax[..., 0]
    c5 = ay[..., 2] - ay[..., 0]
    c0c = bx[..., 1] - bx[..., 0]
    c1c = by[..., 1] - by[..., 0]
    c4c = bx[..., 2] - bx[..., 0]
    c5c = by[..., 2] - by[..., 0]

    # F = edges_final @ inv(edges_orig), 2x2 closed form
    det = c0 * c5 - c4 * c1
    det = jnp.where(jnp.abs(det) > 0, det, 1e-30)
    f11 = (c0c * c5 - c4c * c1) / det
    f12 = (-c0c * c4 + c4c * c0) / det
    f21 = (c1c * c5 - c5c * c1) / det
    f22 = (-c1c * c4 + c5c * c0) / det

    i1 = f11 * f11 + f21 * f21 + f12 * f12 + f22 * f22 + 1.0   # tr(F3D^T F3D)
    i3 = (f11 * f22 - f12 * f21) ** 2                          # det(F3D^T F3D)
    j = jnp.sqrt(jnp.maximum(i3, 1e-30))
    i1st = (i1 - 1.0) / j
    r = jnp.where(i1st <= 2.0, 1.0,
                  0.5 * (i1st + jnp.sqrt(jnp.maximum(i1st * i1st - 4.0, 0.0))))
    rk = jnp.power(r, k_exp)
    jk = jnp.power(j, k_exp)
    return 0.5 * (mu * (rk + 1.0 / rk - 2.0) + kappa * (jk + 1.0 / jk - 2.0))


def triangular_strain(orig_verts, final_verts, mu, kappa, k_exp):
    """calculate_triangular_strain on vertex coordinate triples
    (reg_tools.cpp:698-743). orig/final: (...,3,3) with axis -2 the vertex.
    Returns (...,) strain energies."""
    n_o = sph.tri_normal(orig_verts[..., 0, :], orig_verts[..., 1, :], orig_verts[..., 2, :])
    n_f = sph.tri_normal(final_verts[..., 0, :], final_verts[..., 1, :], final_verts[..., 2, :])
    e1o, e2o = _tangent_frame(n_o)
    e1f, e2f = _tangent_frame(n_f)
    det_o = _frame_det(e1o, e2o, n_o)
    ax, ay = _project_2d(orig_verts, e1o, e2o, n_o, det_o)
    bx, by = _project_2d(final_verts, e1f, e2f, n_f, det_o)  # reference tests det of the FIRST frame for both
    return triangle_strain_2d(ax, ay, bx, by, mu, kappa, k_exp)


def principal_strains_2d(ax, ay, bx, by):
    """Principal (Green-Lagrange) strains of the 2-D deformation, closed form
    (reg_tools.cpp:598-643). Returns (emax, emin)."""
    c0 = ax[..., 1] - ax[..., 0]
    c1 = ay[..., 1] - ay[..., 0]
    c2 = ax[..., 2] - ax[..., 1]
    c3 = ay[..., 2] - ay[..., 1]
    c4 = ax[..., 2] - ax[..., 0]
    c5 = ay[..., 2] - ay[..., 0]
    c0c = bx[..., 1] - bx[..., 0]
    c1c = by[..., 1] - by[..., 0]
    c2c = bx[..., 2] - bx[..., 1]
    c3c = by[..., 2] - by[..., 1]
    c4c = bx[..., 2] - bx[..., 0]
    c5c = by[..., 2] - by[..., 0]

    a = jnp.stack([
        jnp.stack([2 * c0 * c0, 2 * c1 * c1, 4 * c0 * c1], -1),
        jnp.stack([2 * c2 * c2, 2 * c3 * c3, 4 * c2 * c3], -1),
        jnp.stack([2 * c4 * c4, 2 * c5 * c5, 4 * c4 * c5], -1),
    ], -2)
    bvec = jnp.stack([
        c0c**2 + c1c**2 - c0**2 - c1**2,
        c2c**2 + c3c**2 - c2**2 - c3**2,
        c4c**2 + c5c**2 - c4**2 - c5**2,
    ], -1)
    e = jnp.linalg.solve(a, bvec[..., None])[..., 0]
    e11, e22, e12 = e[..., 0], e[..., 1], e[..., 2]
    x = e11 + e22
    y = e11 - e22
    root = jnp.sqrt((y / 2) ** 2 + e12**2)
    return x / 2 + root, x / 2 - root
