"""Vertex-wise principal strain maps (calculate_strains,
reg_tools.cpp:365-549): quadratic surface fit around each vertex, deformation
gradient in curvilinear coordinates, principal stretches from the right
Cauchy-Green tensor (excluding the surface-normal direction).

Output-path only (the hot path uses the closed-form triangle strain), so this
runs host-side in float64 for numerical parity with the reference's NEWMAT
SVD chain.
"""
from __future__ import annotations

import numpy as np

from ..core.mesh import Mesh
from ..core import spherical as sph
import jax.numpy as jnp


def _tangs(normal: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    e1, e2 = sph.vertex_tangent_basis(jnp.asarray(normal[None]))
    return np.asarray(e1)[0], np.asarray(e2)[0]


def vertex_strains(orig: Mesh, final: Mesh, fit_radius: float = 2.0):
    """Returns (4, N): max stretch, min stretch, and the corresponding
    Green strains 0.5*(s^2-1)."""
    n = orig.nvertices
    out = np.zeros((4, n))
    normals_o = orig.vertex_normals()
    coords_o = orig.coords
    coords_f = final.coords

    for idx in range(n):
        kept: np.ndarray
        fit = fit_radius
        while True:
            d = np.linalg.norm(coords_o - coords_o[idx], axis=1)
            dir_ok = normals_o @ normals_o[idx] >= 0
            kept = np.nonzero((d <= fit) & dir_ok)[0]
            if len(kept) > 8:
                break
            fit += 0.5

        normal = normals_o[idx]
        e1, e2 = _tangs(normal)
        # flip normal outward as calculate_tangs does
        if np.dot(normal, coords_o[idx]) < 0:
            normal = -normal
            e1, e2 = _tangs(normal)

        rel_o = coords_o[kept] - coords_o[idx]
        t1 = rel_o @ e1
        t2 = rel_o @ e2
        nn = rel_o @ normal

        alpha = np.stack([np.zeros_like(t1), t1, t2, 0.5 * t1 * t1,
                          0.5 * t2 * t2, t1 * t2], axis=1)
        rel_f = coords_f[kept] - coords_f[idx]
        ft1 = rel_f @ e1
        ft2 = rel_f @ e2
        fn = rel_f @ normal

        pinv = np.linalg.pinv(alpha)
        a = pinv @ nn      # original surface height fit
        b = pinv @ ft1
        c = pinv @ ft2
        dd = pinv @ fn

        dNdT1, dNdT2 = a[1], a[2]
        g1_ref = np.array([1.0, 0.0, dNdT1])
        g2_ref = np.array([0.0, 1.0, dNdT2])
        g3_ref = np.cross(g1_ref, g2_ref)
        g3_ref /= np.linalg.norm(g3_ref)
        G = np.stack([g1_ref, g2_ref, g3_ref], axis=1)
        G_cont = np.linalg.inv(G).T

        g1 = np.array([b[1], c[1], dd[1]])
        g2 = np.array([b[2], c[2], dd[2]])
        g3 = np.cross(g1, g2)
        g3 /= np.linalg.norm(g3)
        g = np.stack([g1, g2, g3], axis=1)

        F = g @ G_cont.T
        Cg = F.T @ F
        w, U = np.linalg.eigh(Cg)
        # eigh ascending; reference SVD gives descending — use magnitudes
        mm = np.abs(g3_ref @ U)
        normal_dir = int(np.argmax(mm))
        idxs = [i for i in range(3) if i != normal_dir]
        s = np.sqrt(np.maximum(w[idxs], 0.0))
        smax, smin = max(s), min(s)
        out[0, idx] = smax
        out[1, idx] = smin
        out[2, idx] = 0.5 * (smax * smax - 1)
        out[3, idx] = 0.5 * (smin * smin - 1)
    return out


def vertex_strains_mesh(orig: Mesh, final: Mesh, fit_radius: float = 2.0) -> Mesh:
    data = vertex_strains(orig, final, fit_radius)
    return Mesh(coords=final.coords.copy(), faces=final.faces, data=data)
