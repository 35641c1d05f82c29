"""Batched nearest-triangle search on (deformed) sphere meshes.

TPU-native replacement for the reference Octree (octree.cpp:156-214): instead
of a pointer tree walked per query, queries are answered in bulk:

  1. k nearest target vertices per query via a dense distance matmul on the
     MXU (chunked over queries; exact, no tree),
  2. candidate triangles = the incident faces of those k vertices (padded
     topology table, gathered),
  3. the reference's containment test per candidate — project the query onto
     the triangle plane, point-in-triangle, boundary distance — picking the
     best contained candidate (octree.cpp tier 1/2),
  4. vertex-distance fallback over the same candidates when no candidate
     contains the projection (octree.cpp:194-208 tier 3).

The containing triangle shares a vertex with one of the k nearest vertices
for any mesh that passes the unfold correctness gate, so this matches the
octree result while being one fused gather/compute pipeline.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core import spherical as sph


class SearchTables(NamedTuple):
    """Device-resident target-mesh tables for nearest search."""
    coords: jax.Array     # (N,3) f32
    faces: jax.Array      # (T,3) i32
    vtx_tri: jax.Array    # (N,MT) i32, padded by repeating the first entry


def build_tables(coords, faces, tri_idx=None, dtype=jnp.float32) -> SearchTables:
    """Host-side table prep. `tri_idx` is the (N,MT) -1-padded incident-face
    table (Mesh.adjacency); padding is replaced by each row's first entry so
    gathers stay in-bounds and duplicates are harmless."""
    coords = np.asarray(coords)
    faces = np.asarray(faces, dtype=np.int32)
    if tri_idx is None:
        from ..core.icosphere import build_adjacency
        _, _, tri_idx, _ = build_adjacency(faces, coords.shape[0])
    tri_idx = np.asarray(tri_idx, dtype=np.int32)
    first = tri_idx[:, :1]
    vtx_tri = np.where(tri_idx >= 0, tri_idx, first)
    return SearchTables(
        coords=jnp.asarray(coords, dtype=dtype),
        faces=jnp.asarray(faces),
        vtx_tri=jnp.asarray(vtx_tri),
    )


def _nearest_k_vertices(q, coords, k):
    """Exact k-nearest target vertices by euclidean distance, via the
    |q-v|^2 = |v|^2 - 2 q.v matmul trick. q: (Q,3), coords: (N,3)."""
    sq = jnp.sum(coords * coords, axis=1)                      # (N,)
    scores = 2.0 * (q @ coords.T) - sq[None, :]                # (Q,N) = -dist^2 + |q|^2
    _, idx = jax.lax.top_k(scores, k)
    return idx                                                 # (Q,k)


def _candidate_select(q, cand_tri, coords, faces, rad):
    """Given candidate triangle ids (Q,C), reproduce the octree choice."""
    tri_v = faces[cand_tri]                                    # (Q,C,3)
    v0 = coords[tri_v[..., 0]]                                 # (Q,C,3)
    v1 = coords[tri_v[..., 1]]
    v2 = coords[tri_v[..., 2]]
    qx = q[:, None, :]

    pp = sph.project_to_plane(qx, v0, v1, v2)
    contained = sph.point_in_triangle_relative(pp, v0, v1, v2)
    d_in = sph.dist_to_triangle_boundary(pp, v0, v1, v2)
    big = jnp.asarray(jnp.finfo(q.dtype).max, q.dtype)
    d_in = jnp.where(contained, d_in, big)
    best_in = jnp.argmin(d_in, axis=1)                         # (Q,)
    found = contained.any(axis=1)

    # tier-3 fallback: geodesic distance to candidate triangle vertices
    # (octree.cpp:194-208)
    def vdist(v):
        chord = jnp.linalg.norm(qx - v, axis=-1)
        return 2.0 * rad * jnp.arcsin(jnp.clip(chord / (2.0 * rad), -1.0, 1.0))

    d_fb = jnp.minimum(vdist(v0), jnp.minimum(vdist(v1), vdist(v2)))
    best_fb = jnp.argmin(d_fb, axis=1)

    sel = jnp.where(found, best_in, best_fb)
    return jnp.take_along_axis(cand_tri, sel[:, None], axis=1)[:, 0]


@functools.partial(jax.jit, static_argnames=("k", "chunk", "rad"))
def nearest_triangle(query, tables: SearchTables, k: int = 3,
                     chunk: int = 4096, rad: float = 100.0):
    """Closest-triangle id per query point. query: (Q,3) -> (Q,) int32.

    Chunked over queries so the (chunk, N) score matrix stays in VMEM-friendly
    tiles; XLA fuses the matmul + top-k per chunk.
    """
    q = query.astype(tables.coords.dtype)
    Q = q.shape[0]
    pad = (-Q) % chunk
    qp = jnp.pad(q, ((0, pad), (0, 0)))
    nchunks = qp.shape[0] // chunk
    qs = qp.reshape(nchunks, chunk, 3)

    def body(qc):
        idx = _nearest_k_vertices(qc, tables.coords, k)        # (c,k)
        cand = tables.vtx_tri[idx]                             # (c,k,MT)
        cand = cand.reshape(chunk, -1)
        return _candidate_select(qc, cand, tables.coords, tables.faces, rad)

    out = jax.lax.map(body, qs).reshape(-1)
    return out[:Q]


@functools.partial(jax.jit, static_argnames=("k", "chunk", "rad"))
def closest_vertex(query, tables: SearchTables, k: int = 3,
                   chunk: int = 4096, rad: float = 100.0):
    """get_closest_vertex_ID (octree.cpp:216-233): euclidean-nearest vertex of
    the closest triangle (NOT the globally nearest vertex)."""
    tri = nearest_triangle(query, tables, k=k, chunk=chunk, rad=rad)
    tv = tables.faces[tri]                                     # (Q,3)
    vcoords = tables.coords[tv]                                # (Q,3,3)
    d = jnp.linalg.norm(vcoords - query[:, None, :].astype(vcoords.dtype), axis=-1)
    sel = jnp.argmin(d, axis=1)
    return jnp.take_along_axis(tv, sel[:, None], axis=1)[:, 0]


@functools.partial(jax.jit, static_argnames=("k", "chunk", "rad"))
def barycentric_coords(query, tables: SearchTables, k: int = 3,
                       chunk: int = 4096, rad: float = 100.0):
    """Closest triangle + barycentric weights per query
    (get_barycentric_weights, resampler.cpp:142-167).
    Returns (vertex_ids (Q,3) i32, weights (Q,3))."""
    tri = nearest_triangle(query, tables, k=k, chunk=chunk, rad=rad)
    tv = tables.faces[tri]
    v0 = tables.coords[tv[:, 0]]
    v1 = tables.coords[tv[:, 1]]
    v2 = tables.coords[tv[:, 2]]
    w = sph.barycentric_weights(v0, v1, v2, query.astype(v0.dtype))
    return tv, w
