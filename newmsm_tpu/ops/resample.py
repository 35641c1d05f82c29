"""Spherical resampling kernels: barycentric, adaptive barycentric, nearest
neighbour, geodesic smoothing and warp application.

Re-design of the reference resampler (resampler.cpp) as fixed-shape
gather/scatter compute. The variable-length weight maps of the reference
become (Q, R) padded index/weight tables; the octree is replaced by
`ops.nearest`. Exclusion (EXCL) semantics are preserved exactly: nonzero
mask value == usable vertex, excluded contributions are dropped without
renormalising data weights, and the mask itself is resampled alongside
(resampler.cpp:30-70).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..core import spherical as sph
from ..core.mesh import Mesh
from .nearest import SearchTables, barycentric_coords, build_tables, closest_vertex

RAD = 100.0


# --------------------------------------------------------------------------
# array-level kernels
# --------------------------------------------------------------------------

def apply_weights(idx, w, data):
    """out[:, q] = sum_j w[q,j] * data[:, idx[q,j]] ; idx (Q,J), w (Q,J),
    data (D,N) -> (D,Q). Padding entries must carry w == 0."""
    gathered = data[:, jnp.clip(idx, 0, data.shape[1] - 1)]     # (D,Q,J)
    return jnp.sum(gathered * w[None, :, :], axis=-1)


@functools.partial(jax.jit, static_argnames=("cap", "k", "chunk"))
def adaptive_weights(in_coords, low_coords, in_tables: SearchTables,
                     low_tables: SearchTables, in_vareas, low_vareas,
                     excl_in=None, cap: int = 16, k: int = 3, chunk: int = 4096):
    """Workbench ADAP_BARY_AREA weights (resampler.cpp:72-140).

    Returns (idx (Q,cap) i32 [-1 padded], w (Q,cap) f32) rows summing to 1
    (or all-zero for rows gated out by the exclusion mask).
    """
    Q = low_coords.shape[0]
    Nold = in_coords.shape[0]

    fwd_idx, fwd_w = barycentric_coords(low_coords, in_tables, k=k, chunk=chunk)
    rev_idx, rev_w = barycentric_coords(in_coords, low_tables, k=k, chunk=chunk)

    # transpose the reverse map: rows keyed by low-mesh vertex
    tgt = rev_idx.reshape(-1)                                   # (3*Nold,)
    src = jnp.repeat(jnp.arange(Nold, dtype=jnp.int32), 3)
    wgt = rev_w.reshape(-1)
    order = jnp.argsort(tgt, stable=True)
    tgt_s, src_s, wgt_s = tgt[order], src[order], wgt[order]
    counts = jax.ops.segment_sum(jnp.ones_like(tgt_s), tgt_s, num_segments=Q)
    starts = jnp.cumsum(counts) - counts
    pos = jnp.arange(tgt_s.shape[0]) - starts[tgt_s].astype(jnp.int32)
    keep = pos < cap
    flat = jnp.where(keep, tgt_s * cap + pos, Q * cap)  # out-of-range -> dropped
    rr_idx = jnp.full((Q * cap,), -1, dtype=jnp.int32).at[flat].set(src_s, mode="drop")
    rr_w = jnp.zeros((Q * cap,), dtype=wgt.dtype).at[flat].set(wgt_s, mode="drop")
    rr_idx = rr_idx.reshape(Q, cap)
    rr_w = rr_w.reshape(Q, cap)

    # choose denser map per row (resampler.cpp:105-109)
    use_rev = counts > 3
    pad_cols = cap - 3
    fwd_idx_p = jnp.pad(fwd_idx, ((0, 0), (0, pad_cols)), constant_values=-1)
    fwd_w_p = jnp.pad(fwd_w, ((0, 0), (0, pad_cols)))
    idx = jnp.where(use_rev[:, None], rr_idx, fwd_idx_p)
    w = jnp.where(use_rev[:, None], rr_w, fwd_w_p)
    valid = idx >= 0

    # row gate: closest in-mesh vertex must be usable (resampler.cpp:102,123)
    if excl_in is not None:
        cv = closest_vertex(low_coords, in_tables, k=k, chunk=chunk)
        gate = excl_in[cv] != 0
    else:
        gate = jnp.ones((Q,), dtype=bool)

    # area correction (resampler.cpp:111-137)
    w = w * valid * gate[:, None] * low_vareas[:, None]
    corr = jax.ops.segment_sum(w.reshape(-1),
                               jnp.clip(idx, 0, Nold - 1).reshape(-1),
                               num_segments=Nold)
    corr = jnp.where(corr > 0, corr, 1.0)
    w = w * in_vareas[jnp.clip(idx, 0, Nold - 1)] / corr[jnp.clip(idx, 0, Nold - 1)]
    rowsum = w.sum(axis=1, keepdims=True)
    w = jnp.where(rowsum > 0, w / jnp.where(rowsum > 0, rowsum, 1.0), 0.0)
    return idx, w


@jax.jit
def interpolate_with_exclusion(idx, w, data, excl=None):
    """barycentric_data_interpolation core (resampler.cpp:40-67): excluded
    source contributions dropped WITHOUT renormalising; the mask itself is
    carried through the same weights. Returns (out (D,Q), new_excl (Q,) | None)."""
    if excl is None:
        return apply_weights(idx, w, data), None
    inc = (excl != 0).astype(w.dtype)
    w_data = w * inc[jnp.clip(idx, 0, excl.shape[0] - 1)]
    out = apply_weights(idx, w_data, data)
    new_excl = apply_weights(idx, w_data, excl[None, :])[0]
    return out, new_excl


@functools.partial(jax.jit, static_argnames=("chunk",))
def smooth_kernel(coords, data, sigma, excl=None, chunk: int = 2048):
    """Geodesic Gaussian smoothing (smooth_data, resampler.cpp:169-230).

    Reproduces the reference formula faithfully, including its unit-sphere
    distance scale: neighbour distances are chords of the *unit* sphere fed
    through 2*RAD*asin(c/(2*RAD)), so for typical sigma the kernel is nearly
    uniform over the angular support 4*asin(sigma/(2*RAD)). Data and output
    live on the same mesh (the only use in the reference pipeline).
    Returns (smoothed (D,N), new_excl (N,))."""
    N = coords.shape[0]
    unit = coords / jnp.linalg.norm(coords, axis=1, keepdims=True)
    ang = 4.0 * jnp.arcsin(sigma / (2.0 * RAD))
    cos_ang = jnp.cos(ang)
    norm_const = 1.0 / jnp.sqrt(2.0 * jnp.pi * sigma * sigma)

    pad = (-N) % chunk
    unit_p = jnp.pad(unit, ((0, pad), (0, 0)))
    nchunks = unit_p.shape[0] // chunk

    incl = None if excl is None else (excl != 0)

    def body(uc):
        dots = uc @ unit.T                                      # (c,N)
        mask = dots >= cos_ang
        chord = jnp.sqrt(jnp.maximum(2.0 - 2.0 * dots, 0.0))
        g = 2.0 * RAD * jnp.arcsin(jnp.clip(chord / (2.0 * RAD), -1.0, 1.0))
        wfull = norm_const * jnp.exp(-(g * g) / (2.0 * sigma * sigma)) * mask
        excl_sum = wfull.sum(axis=1)
        if excl is None:
            w = wfull
        else:
            w = wfull * excl[None, :]
        s = w.sum(axis=1)
        out = (w @ data.T).T / jnp.where(s != 0, s, 1.0)        # (D,c)
        new_e = jnp.where(excl_sum != 0, s / jnp.where(excl_sum != 0, excl_sum, 1.0), 0.0)
        return out, new_e

    outs, new_es = jax.lax.map(body, unit_p.reshape(nchunks, chunk, 3))
    out = outs.transpose(1, 0, 2).reshape(data.shape[0], -1)[:, :N]
    new_e = new_es.reshape(-1)[:N]
    if incl is not None:
        # rows whose own vertex is excluded output zero (resampler.cpp:201,222)
        out = jnp.where(incl[None, :], out, 0.0)
        new_e = jnp.where(incl, new_e, 0.0)
    return out, new_e


# --------------------------------------------------------------------------
# mesh-level wrappers (host API used by drivers; numpy in / numpy out)
# --------------------------------------------------------------------------

def _tables(mesh: Mesh) -> SearchTables:
    _, _, tri_idx, _ = mesh.adjacency
    return build_tables(mesh.coords, mesh.faces, tri_idx)


def metric_resample(data_mesh: Mesh, low_mesh: Mesh, excl: np.ndarray | None = None):
    """Adaptive-barycentric metric resampling (metric_resample,
    resampler.cpp:304-309). Returns (new Mesh on low topology with resampled
    data, resampled exclusion mask | None)."""
    in_t = _tables(data_mesh)
    low_t = _tables(low_mesh)
    idx, w = adaptive_weights(
        jnp.asarray(data_mesh.coords, jnp.float32),
        jnp.asarray(low_mesh.coords, jnp.float32),
        in_t, low_t,
        jnp.asarray(data_mesh.vertex_area(), jnp.float32),
        jnp.asarray(low_mesh.vertex_area(), jnp.float32),
        None if excl is None else jnp.asarray(excl, jnp.float32),
        cap=_adaptive_cap(data_mesh.nvertices, low_mesh.nvertices),
    )
    data = jnp.asarray(data_mesh.data, jnp.float32)
    out, new_excl = interpolate_with_exclusion(
        idx, w, data, None if excl is None else jnp.asarray(excl, jnp.float32))
    result = Mesh(coords=low_mesh.coords.copy(), faces=low_mesh.faces,
                  data=np.asarray(out, np.float64))
    return result, (None if new_excl is None else np.asarray(new_excl, np.float64))


def _adaptive_cap(nold: int, nnew: int) -> int:
    return max(16, 4 * (3 * nold // max(nnew, 1) + 1))


def smooth_data(mesh: Mesh, sigma: float, excl: np.ndarray | None = None):
    """Smooth mesh data in place semantics of reference featurespace use
    (orig == sphLow). Returns (new Mesh, new_excl | None)."""
    out, new_e = smooth_kernel(
        jnp.asarray(mesh.coords, jnp.float32),
        jnp.asarray(mesh.data, jnp.float32),
        jnp.asarray(sigma, jnp.float32),
        None if excl is None else jnp.asarray(excl, jnp.float32),
    )
    result = Mesh(coords=mesh.coords.copy(), faces=mesh.faces,
                  data=np.asarray(out, np.float64))
    return result, (None if excl is None else np.asarray(new_e, np.float64))


def nearest_neighbour_interpolation(data_mesh: Mesh, low_mesh: Mesh,
                                    excl: np.ndarray | None = None):
    """(resampler.cpp:232-258)."""
    in_t = _tables(data_mesh)
    nn = closest_vertex(jnp.asarray(low_mesh.coords, jnp.float32), in_t)
    nn = np.asarray(nn)
    data = data_mesh.data[:, nn]
    new_excl = None
    if excl is not None:
        gate = excl[nn] != 0
        data = data * gate[None, :]
        new_excl = np.where(gate, excl[nn], 0.0)
    result = Mesh(coords=low_mesh.coords.copy(), faces=low_mesh.faces, data=data)
    return result, new_excl


def sphere_project_warp(sphere: Mesh, frm: Mesh, to: Mesh) -> Mesh:
    """Express sphere vertices barycentrically in `frm`, re-evaluate in `to`,
    re-project to radius 100 (resampler.cpp:311-328). Returns a new Mesh."""
    new_coords = warp_coords(jnp.asarray(sphere.coords, jnp.float32), _tables(frm),
                             jnp.asarray(to.coords, jnp.float32))
    return Mesh(coords=np.asarray(new_coords, np.float64), faces=sphere.faces,
                data=None if sphere.data is None else sphere.data.copy())


@jax.jit
def warp_coords(coords, frm_tables: SearchTables, to_coords):
    """Device core of sphere_project_warp: (Q,3) -> (Q,3) at radius 100."""
    idx, w = barycentric_coords(coords, frm_tables)
    newp = apply_weights(idx, w, to_coords.T).T                # (Q,3)
    return sph.normalize(newp) * RAD


def surface_resample(anat_orig: Mesh, sph_orig: Mesh, sph_low: Mesh) -> Mesh:
    """Resample an anatomical mesh through sphere correspondence
    (resampler.cpp:284-302)."""
    idx, w = barycentric_coords(jnp.asarray(sph_low.coords, jnp.float32),
                                _tables(sph_orig))
    newp = apply_weights(idx, w, jnp.asarray(anat_orig.coords.T, jnp.float32)).T
    return Mesh(coords=np.asarray(newp, np.float64), faces=sph_low.faces,
                data=None if sph_low.data is None else sph_low.data.copy())


def project_anatomical_mesh(orig: Mesh, target: Mesh, anat: Mesh) -> Mesh:
    """(resampler.cpp:260-282): barycentric weights of orig vertices in
    target, applied to anat coordinates (anat must match target's count)."""
    idx, w = barycentric_coords(jnp.asarray(orig.coords, jnp.float32),
                                _tables(target))
    src = anat if anat.nvertices == target.nvertices else target
    newp = apply_weights(idx, w, jnp.asarray(src.coords.T, jnp.float32)).T
    return Mesh(coords=np.asarray(newp, np.float64), faces=orig.faces,
                data=None if orig.data is None else orig.data.copy())


# --------------------------------------------------------------------------
# batched label-deformed resampling (groupwise hot path)
# --------------------------------------------------------------------------

def vertex_areas_kernel(coords, faces, tri_idx):
    """compute_vertex_area on device: mean incident face area per vertex."""
    v0 = coords[faces[:, 0]]
    v1 = coords[faces[:, 1]]
    v2 = coords[faces[:, 2]]
    areas = 0.5 * jnp.linalg.norm(jnp.cross(v1 - v0, v2 - v0), axis=-1)
    g = areas[jnp.clip(tri_idx, 0, areas.shape[0] - 1)] * (tri_idx >= 0)
    return g.sum(axis=1) / jnp.maximum((tri_idx >= 0).sum(axis=1), 1)


@functools.partial(jax.jit, static_argnames=("cap",))
def label_deformed_maps(dg_coords, dg_data, dg_faces, dg_tri_idx,
                        dg_ring_faces, dg_ring_verts, labels, centre,
                        tmpl_tables: SearchTables, tmpl_vareas, cap: int = 16):
    """(get_patch_data resampling stage, DiscreteGroupModel.cpp:88-121):
    for each label l, displace every data-grid vertex x to
    R(centre->x) @ label_l and adaptive-barycentric resample the data onto
    the template. One jitted call per subject — vmappable/shardable over a
    leading subject axis.

    dg_coords (N,3), dg_data (D,N), labels (L,3) -> (L, D, Nt).
    """
    from ..core import spherical as sphm

    rots = sphm.rodrigues(jnp.broadcast_to(centre, dg_coords.shape), dg_coords)
    deformed = jnp.einsum("nij,lj->lni", rots, labels)           # (L,N,3)

    def one_label(coords_l):
        in_tables = SearchTables(coords=coords_l, faces=dg_faces,
                                 ring_faces=dg_ring_faces,
                                 ring_verts=dg_ring_verts)
        in_vareas = vertex_areas_kernel(coords_l, dg_faces, dg_tri_idx)
        idx, w = adaptive_weights(coords_l, tmpl_tables.coords, in_tables,
                                  tmpl_tables, in_vareas, tmpl_vareas,
                                  None, cap=cap)
        return apply_weights(idx, w, dg_data)                    # (D,Nt)

    return jax.lax.map(one_label, deformed)                      # (L,D,Nt)
