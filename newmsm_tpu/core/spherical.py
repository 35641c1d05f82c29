"""Batched spherical / triangle math as pure jnp functions.

Vectorised re-designs of the reference point/triangle algebra
(point.cpp, triangle.cpp, reg_tools.cpp tangent-basis code). Every function
broadcasts over arbitrary leading batch dimensions; nothing allocates
per-element objects.
"""
from __future__ import annotations

import jax.numpy as jnp

RAD = 100.0
EPSILON = 1e-8


def normalize(v, eps=EPSILON):
    """Safe normalisation: returns v unchanged when ||v|| <= eps
    (reference Point::normalize, point.cpp:26-34)."""
    n = jnp.linalg.norm(v, axis=-1, keepdims=True)
    return jnp.where(n > eps, v / jnp.where(n > eps, n, 1.0), v)


def geodesic(a, b, rad=RAD):
    """Great-circle distance via chord length: 2*R*asin(|a-b| / 2R)
    (used throughout, e.g. DiscreteModel.cpp:82)."""
    chord = jnp.linalg.norm(a - b, axis=-1)
    return 2.0 * rad * jnp.arcsin(jnp.clip(chord / (2.0 * rad), -1.0, 1.0))


def rodrigues(frm, to, eps=EPSILON):
    """Rotation matrix taking unit direction of `frm` to that of `to`.

    Batched replica of estimate_rotation_matrix (point.cpp:97-152) including
    its special cases: identity when aligned; diag(-1) when antipodal with
    degenerate cross product; 2*outer(axis)-I when antipodal otherwise.
    frm/to: (...,3) -> (...,3,3).
    """
    a = normalize(frm, eps)
    b = normalize(to, eps)
    dot = jnp.sum(a * b, axis=-1)
    cross = jnp.cross(a, b)
    cross_n = jnp.linalg.norm(cross, axis=-1)
    axis = normalize(cross, eps)

    eye = jnp.broadcast_to(jnp.eye(3, dtype=a.dtype), a.shape[:-1] + (3, 3))

    # skew-symmetric u from normalised axis
    zero = jnp.zeros_like(axis[..., 0])
    u = jnp.stack(
        [
            jnp.stack([zero, -axis[..., 2], axis[..., 1]], axis=-1),
            jnp.stack([axis[..., 2], zero, -axis[..., 0]], axis=-1),
            jnp.stack([-axis[..., 1], axis[..., 0], zero], axis=-1),
        ],
        axis=-2,
    )
    theta = jnp.arccos(jnp.clip(dot, -1.0, 1.0))
    s = jnp.sin(theta)[..., None, None]
    c = (1.0 - jnp.cos(theta))[..., None, None]
    r_general = eye + u * s + c * (u @ u)

    outer = axis[..., :, None] * axis[..., None, :]
    r_antipodal = 2.0 * outer - eye

    # branch thresholds sized for float32 (the reference's 1e-8 works in
    # double but misroutes the aligned case at f32 precision, which would
    # return -I for the control point at the sampling-grid centre)
    beps = jnp.asarray(1e-6, a.dtype)
    degenerate_axis = cross_n < beps
    aligned = degenerate_axis & (dot > 0)
    anti_degenerate = degenerate_axis & (dot <= 0)
    near_neg = (~degenerate_axis) & (dot < -1.0 + beps)

    r = jnp.where(near_neg[..., None, None], r_antipodal, r_general)
    r = jnp.where(anti_degenerate[..., None, None], -eye, r)
    r = jnp.where(aligned[..., None, None], eye, r)
    return r


def euler_matrix(w1, w2, w3):
    """Euler rotation matrix as in euler_rotate (point.cpp:154-171).

    The reference builds R then applies R.T to vectors; this returns the
    matrix M such that rotated = v @ M (i.e. M = R, rows as reference), so
    ``apply_euler`` below reproduces `R.t() * v`.
    """
    c1, s1 = jnp.cos(w1), jnp.sin(w1)
    c2, s2 = jnp.cos(w2), jnp.sin(w2)
    c3, s3 = jnp.cos(w3), jnp.sin(w3)
    return jnp.array(
        [
            [c2 * c3, -c1 * s3 + s1 * s2 * c3, s1 * s3 + c1 * s2 * c3],
            [c2 * s3, c1 * c3 + s1 * s2 * s3, -s1 * c3 + c1 * s2 * s3],
            [-s2, s1 * c2, c1 * c2],
        ]
    )


def apply_euler(points, w1, w2, w3):
    """Rotate (...,3) points by R(w1,w2,w3).T (point.cpp:167)."""
    m = euler_matrix(w1, w2, w3).astype(points.dtype)
    return points @ m  # (v^T R^T)^T = R v per column convention => v @ R


def project_to_plane(p, v0, v1, v2, eps=EPSILON):
    """Scale p along its ray to the plane of triangle (v0,v1,v2)
    (project_point, point.cpp:46-60). All (...,3)."""
    s1 = normalize(v2 - v0, eps)
    s2 = normalize(v1 - v0, eps)
    n = normalize(jnp.cross(s1, s2), eps)
    denom = jnp.sum(n * p, axis=-1)
    si = jnp.sum(n * v0, axis=-1) / jnp.where(jnp.abs(denom) > 0, denom, 1.0)
    return p * si[..., None]


def tri_area(v0, v1, v2):
    """Triangle area (point.cpp:68-75)."""
    return 0.5 * jnp.linalg.norm(jnp.cross(v1 - v0, v2 - v0), axis=-1)


def tri_normal(v0, v1, v2, eps=EPSILON):
    """Reference triangle normal: normalize((v2-v0) x (v1-v0))
    (triangle.cpp:42-47). Orientation matters for folding checks."""
    return normalize(jnp.cross(v2 - v0, v1 - v0), eps)


def same_side(p1, p2, a, b, eps=EPSILON):
    """same_side test (point.cpp:36-39)."""
    ab = b - a
    c1 = jnp.cross(ab, p1 - a)
    c2 = jnp.cross(ab, p2 - a)
    return jnp.sum(c1 * c2, axis=-1) > -eps


def point_in_triangle(p, a, b, c, eps=EPSILON):
    """(point.cpp:41-44)."""
    return same_side(p, a, b, c, eps) & same_side(p, b, c, a, eps) & same_side(p, c, a, b, eps)


def point_in_triangle_relative(p, a, b, c, rel_tol=1e-4):
    """Scale-aware containment test for f32 kernels: signed sub-areas against
    the face normal, thresholded relative to the squared face area. Unlike the
    reference's absolute -1e-8 epsilon (point.cpp:36-44) this is robust for
    points exactly on an edge at float32 with coordinates of magnitude ~100,
    while agreeing with the reference test away from boundaries."""
    n = jnp.cross(b - a, c - a)
    nn = jnp.sum(n * n, axis=-1)
    s1 = jnp.sum(jnp.cross(c - b, p - b) * n, axis=-1)
    s2 = jnp.sum(jnp.cross(a - c, p - c) * n, axis=-1)
    s3 = jnp.sum(jnp.cross(b - a, p - a) * n, axis=-1)
    tol = -rel_tol * nn
    return (s1 >= tol) & (s2 >= tol) & (s3 >= tol)


def dist_to_triangle_boundary(x0, x1, x2, x3):
    """Triangle::dist_to_point (triangle.cpp:85-122): min distance from x0 to
    the triangle's edges (when the foot falls inside the segment) and
    vertices."""
    big = jnp.asarray(jnp.finfo(x0.dtype).max, dtype=x0.dtype)

    def edge_dist(a, b):
        u = b - a
        t_ok = (jnp.sum((x0 - a) * u, axis=-1) > 0) & (jnp.sum((x0 - b) * u, axis=-1) < 0)
        d = jnp.linalg.norm(jnp.cross(x0 - a, x0 - b), axis=-1) / jnp.maximum(
            jnp.linalg.norm(u, axis=-1), 1e-30
        )
        return jnp.where(t_ok, d, big)

    d = jnp.minimum(edge_dist(x1, x2), jnp.minimum(edge_dist(x1, x3), edge_dist(x2, x3)))
    for v in (x1, x2, x3):
        d = jnp.minimum(d, jnp.linalg.norm(x0 - v, axis=-1))
    return d


def barycentric_weights(v1, v2, v3, p):
    """Barycentric weights of p (projected onto the triangle plane) wrt
    (v1,v2,v3) — calc_barycentric_weights (triangle.cpp:124-143).
    Returns (...,3) weights for (v1,v2,v3)."""
    pp = project_to_plane(p, v1, v2, v3)
    aa = tri_area(pp, v2, v3)
    ab = tri_area(pp, v1, v3)
    ac = tri_area(pp, v1, v2)
    total = aa + ab + ac
    total = jnp.where(total > 0, total, 1.0)
    return jnp.stack([aa, ab, ac], axis=-1) / total[..., None]


def barycentric_interp(v1, v2, v3, p, f1, f2, f3):
    """barycentric_interpolation (triangle.cpp:145-157): areas computed at p
    directly (no plane projection). f* may have trailing feature dims matching
    broadcast."""
    aa = tri_area(p, v2, v3)
    ab = tri_area(p, v1, v3)
    ac = tri_area(p, v1, v2)
    total = aa + ab + ac
    total = jnp.where(total > 0, total, 1.0)
    aa, ab, ac = aa / total, ab / total, ac / total
    return f1 * aa[..., None] + f2 * ab[..., None] + f3 * ac[..., None]


def tangent_basis_from_normal(a, eps=1e-30):
    """Orthonormal tangent pair (e1,e2) to direction `a` — calculate_tri
    (reg_tools.cpp:267-313): e1 = normalize(a x xhat) (fallback yhat),
    e2 = normalize(a x e1)."""
    xhat = jnp.zeros_like(a).at[..., 0].set(1.0)
    yhat = jnp.zeros_like(a).at[..., 1].set(1.0)
    c = jnp.cross(a, xhat)
    use_y = jnp.sum(c * c, axis=-1, keepdims=True) <= eps
    c = jnp.where(use_y, jnp.cross(a, yhat), c)
    e1 = normalize(c)
    e2 = normalize(jnp.cross(a, e1))
    return e1, e2


def vertex_tangent_basis(a):
    """calculate_tangs (reg_tools.cpp:205-265): axis-aligned-free tangent
    basis from a vertex normal `a` (assumed outward)."""
    ax, ay, az = jnp.abs(a[..., 0]), jnp.abs(a[..., 1]), jnp.abs(a[..., 2])

    mag_x = jnp.sqrt(a[..., 2] ** 2 + a[..., 1] ** 2)
    e1_x = jnp.stack(
        [jnp.zeros_like(mag_x), -a[..., 2] / jnp.where(mag_x > 0, mag_x, 1.0),
         a[..., 1] / jnp.where(mag_x > 0, mag_x, 1.0)], axis=-1)
    e1_x = jnp.where((mag_x == 0)[..., None],
                     jnp.stack([jnp.zeros_like(mag_x), jnp.zeros_like(mag_x),
                                jnp.ones_like(mag_x)], axis=-1), e1_x)

    mag_y = jnp.sqrt(a[..., 2] ** 2 + a[..., 0] ** 2)
    e1_y = jnp.stack(
        [-a[..., 2] / jnp.where(mag_y > 0, mag_y, 1.0), jnp.zeros_like(mag_y),
         a[..., 0] / jnp.where(mag_y > 0, mag_y, 1.0)], axis=-1)
    e1_y = jnp.where((mag_y == 0)[..., None],
                     jnp.stack([jnp.zeros_like(mag_y), jnp.zeros_like(mag_y),
                                jnp.ones_like(mag_y)], axis=-1), e1_y)

    mag_z = jnp.sqrt(a[..., 1] ** 2 + a[..., 0] ** 2)
    e1_z = jnp.stack(
        [-a[..., 1] / jnp.where(mag_z > 0, mag_z, 1.0),
         a[..., 0] / jnp.where(mag_z > 0, mag_z, 1.0), jnp.zeros_like(mag_z)], axis=-1)
    e1_z = jnp.where((mag_z == 0)[..., None],
                     jnp.stack([jnp.ones_like(mag_z), jnp.zeros_like(mag_z),
                                jnp.zeros_like(mag_z)], axis=-1), e1_z)

    x_dom = (ax >= ay) & (ax >= az)
    y_dom = (~x_dom) & (ay >= ax) & (ay >= az)
    e1 = jnp.where(x_dom[..., None], e1_x, jnp.where(y_dom[..., None], e1_y, e1_z))
    e2 = normalize(jnp.cross(a, e1))
    return e1, e2
