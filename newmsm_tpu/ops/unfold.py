"""Mesh untangling (fold removal) as a jitted fixed-shape loop.

Reference semantics (reg_tools.cpp:118-177): a vertex is "folded" when any
incident face normal deviates from the vertex's first incident face normal
by dot <= 0.5; folded vertices move along the negative area-gradient with
per-vertex step halving until locally unfolded, repeated (<=1000 sweeps)
until fold-free.

The reference updates vertices sequentially inside a sweep; here all folded
vertices update in parallel per sweep (each against the current neighbour
positions), which converges to the same fold-free fixed point. The outer
loop terminates when no folds remain (the correctness gate the
registration drivers rely on), at max_iter (the reference's 1000-sweep cap,
reg_tools.cpp:118), or early on a TRUE stall: fold count not improving for
4 consecutive 25-sweep chunks AND max vertex motion below tolerance — the
state in which the reference itself burns its remaining sweeps stepping in
place on everted clusters, leaving the same residual folds.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..core import spherical as sph
from ..core.mesh import Mesh

RAD = 100.0


def _face_normals(coords, faces):
    v0 = coords[faces[:, 0]]
    v1 = coords[faces[:, 1]]
    v2 = coords[faces[:, 2]]
    return sph.tri_normal(v0, v1, v2)


def _folded_mask(coords, faces, tri_idx):
    """check_for_intersections per vertex (reg_tools.cpp:118-129)."""
    fn = _face_normals(coords, faces)                  # (T,3)
    first = fn[tri_idx[:, 0]]                          # (N,3) first incident face
    gathered = fn[jnp.clip(tri_idx, 0, fn.shape[0] - 1)]  # (N,MT,3)
    dots = jnp.sum(gathered * first[:, None, :], axis=-1)
    valid = tri_idx >= 0
    return jnp.any((dots <= 0.5) & valid, axis=1)


def _area_gradients(coords, faces, tri_idx):
    """spatialgradient (reg_tools.cpp:95-116): per vertex, sum over incident
    triangles of the area gradient wrt that vertex."""
    MT = tri_idx.shape[1]
    t = jnp.clip(tri_idx, 0, faces.shape[0] - 1)       # (N,MT)
    fv = faces[t]                                      # (N,MT,3)
    vid = jnp.arange(coords.shape[0])[:, None]
    # rotate face vertices so the own vertex comes last:
    # (v0,v1,v2) with ci==v0 -> (v1,v2,v0); ci==v1 -> (v2,v0,v1); else (v0,v1,v2)
    is0 = fv[..., 0] == vid
    is1 = fv[..., 1] == vid
    a = jnp.where(is0, fv[..., 1], jnp.where(is1, fv[..., 2], fv[..., 0]))
    b = jnp.where(is0, fv[..., 2], jnp.where(is1, fv[..., 0], fv[..., 1]))
    c = jnp.where(is0, fv[..., 0], jnp.where(is1, fv[..., 1], fv[..., 2]))
    va, vb, vc = coords[a], coords[b], coords[c]

    # computeGradientOfBarycentricTriangle(va, vb, vc) (reg_tools.cpp:59-93)
    s1 = sph.normalize(vc - va, eps=1e-10)
    s2 = sph.normalize(vb - va, eps=1e-10)
    n_tri = sph.normalize(jnp.cross(s1, s2), eps=1e-10)
    n_edge = jnp.cross(s2, n_tri)
    flip = jnp.sum(s1 * n_edge, axis=-1) < 0
    n_edge = jnp.where(flip[..., None], -n_edge, n_edge)
    base = jnp.linalg.norm(vb - va, axis=-1)
    dA = n_edge * (0.5 * base)[..., None]
    dA = dA * (tri_idx >= 0)[..., None]
    return jnp.sum(dA, axis=1)                         # (N,3)


@functools.partial(jax.jit, static_argnames=("max_iter", "n_steps"))
def unfold_kernel(coords, faces, tri_idx, vgroups, vgroup_mask, nbr_idx,
                  max_iter: int = 1000, n_steps: int = 11):
    """Returns (coords, n_remaining_folds, iterations).

    vgroups/vgroup_mask: (C,G) conflict-free vertex color groups — a vertex's
    fold state depends only on its 1-ring, so updating one color at a time
    reproduces the reference's sequential-visibility semantics and avoids
    neighbouring folded vertices re-folding each other.

    Where no gradient step unfolds a vertex (the reference then keeps its
    smallest step and stalls on everted clusters, reg_tools.cpp:163-172),
    the vertex instead moves to its 1-ring centroid projected to the sphere
    (a Tutte-style contraction) — this dissolves tangled clusters the
    area-gradient alone cannot."""
    N = coords.shape[0]
    steps = 2.0 ** -jnp.arange(n_steps, dtype=coords.dtype)   # 1, 0.5, ... ~1e-3

    def per_vertex_update(coords, grads, folded):
        # candidate positions per step: (N, S, 3)
        cand = coords[:, None, :] - grads[:, None, :] * steps[None, :, None]
        cand = sph.normalize(cand) * RAD

        # evaluate fold state for each candidate of each folded vertex.
        # incident face normals with only the own vertex replaced:
        fv = faces[jnp.clip(tri_idx, 0, faces.shape[0] - 1)]  # (N,MT,3)
        vid = jnp.arange(N)[:, None, None]

        def normals_for(candidate):
            # candidate: (N,3) position per vertex; others at current coords
            p0 = jnp.where((fv[..., 0:1] == vid), candidate[:, None, :], coords[fv[..., 0]])
            p1 = jnp.where((fv[..., 1:2] == vid), candidate[:, None, :], coords[fv[..., 1]])
            p2 = jnp.where((fv[..., 2:3] == vid), candidate[:, None, :], coords[fv[..., 2]])
            return sph.tri_normal(p0, p1, p2)          # (N,MT,3)

        def fold_state(candidate):
            fnl = normals_for(candidate)
            first = fnl[:, 0, :]
            dots = jnp.sum(fnl * first[:, None, :], axis=-1)
            return jnp.any((dots <= 0.5) & (tri_idx >= 0), axis=1)  # (N,)

        states = jax.vmap(fold_state, in_axes=1, out_axes=1)(cand)  # (N,S)
        # first step that unfolds; else centroid fallback
        ok = ~states
        any_ok = ok.any(axis=1)
        first_ok = jnp.argmax(ok, axis=1)
        sel = jnp.where(any_ok, first_ok, n_steps - 1)
        chosen = jnp.take_along_axis(cand, sel[:, None, None], axis=1)[:, 0, :]

        nb = coords[jnp.clip(nbr_idx, 0, N - 1)] * (nbr_idx >= 0)[..., None]
        centroid = nb.sum(axis=1) / jnp.maximum(
            (nbr_idx >= 0).sum(axis=1), 1)[:, None]
        centroid = sph.normalize(centroid) * RAD
        chosen = jnp.where(any_ok[:, None], chosen, centroid)
        return jnp.where(folded[:, None], chosen, coords)

    n_colors = vgroups.shape[0]

    def cond(state):
        coords, it, nf = state
        return (nf > 0) & (it < max_iter)

    def body(state):
        coords, it, _ = state

        def do_color(c, coords):
            in_group = jnp.zeros((N,), bool).at[
                jnp.where(vgroup_mask[c], vgroups[c], N)].set(True, mode="drop")
            folded = _folded_mask(coords, faces, tri_idx) & in_group
            grads = _area_gradients(coords, faces, tri_idx)
            return per_vertex_update(coords, grads, folded)

        coords = jax.lax.fori_loop(0, n_colors, do_color, coords)
        nf = jnp.sum(_folded_mask(coords, faces, tri_idx))
        return coords, it + 1, nf

    nf0 = jnp.sum(_folded_mask(coords, faces, tri_idx))
    coords, it, nf = jax.lax.while_loop(cond, body, (coords, 0, nf0))
    return coords, nf, it


_GROUP_CACHE: dict = {}


def _vertex_groups(mesh: Mesh):
    key = (mesh.nvertices, mesh.faces.shape[0])
    if key not in _GROUP_CACHE:
        from ..reg.optimise.coloring import color_groups, vertex_coloring_from_faces
        colors = vertex_coloring_from_faces(mesh.faces, mesh.nvertices)
        g, m = color_groups(colors)
        _GROUP_CACHE[key] = (jnp.asarray(g), jnp.asarray(m))
    return _GROUP_CACHE[key]


def unfold(mesh: Mesh, verbose: bool = False, max_iter: int = 1000,
           chunk: int = 25) -> Mesh:
    """Host wrapper: returns a fold-free copy of `mesh`.

    The sweep loop is dispatched in `chunk`-sweep slices with the carry fed
    back through device memory: a single dispatch containing up to 1000
    sweeps over an ico-6 mesh runs for minutes, which remote-TPU runtimes
    kill ("TPU worker crashed" — reproduced deterministically on the
    MSMpair full-scale run, round 4; same failure mode as the groupwise
    host-driven alpha loop). Identical math and results — the while_loop
    condition is simply re-evaluated every `chunk` sweeps, and every slice
    reuses ONE compiled program."""
    nbr_idx, _, tri_idx, _ = mesh.adjacency
    vg, vm = _vertex_groups(mesh)
    coords = jnp.asarray(mesh.coords, jnp.float32)
    faces = jnp.asarray(mesh.faces)
    tri_idx = jnp.asarray(tri_idx)
    nbr_idx = jnp.asarray(nbr_idx)
    it_total = 0
    nf = 0
    stalled = 0
    best_nf = None
    while it_total < max_iter:
        prev = coords
        coords, nf, it = unfold_kernel(
            coords, faces, tri_idx, vg, vm, nbr_idx,
            max_iter=min(chunk, max_iter - it_total))
        it_total += int(it)
        if int(nf) == 0 or int(it) < chunk:
            break
        # stall break: when the fold count stops improving for 4 chunks
        # (100 sweeps) AND the coordinates have stopped moving, the
        # remaining folds are everted clusters neither the gradient step
        # nor the centroid fallback dissolves — the reference burns its
        # full 1000 iterations in this state (reg_tools.cpp:163-172 keeps
        # stepping in place); stopping there gives the same residual-fold
        # outcome without the dead sweeps. A plateaued fold COUNT alone is
        # not enough (ADVICE r4): vertices can keep moving toward a
        # resolution while the count holds, so motion below tolerance is
        # also required before breaking.
        motion = float(jnp.max(jnp.abs(coords - prev)))
        if best_nf is None or int(nf) < best_nf:
            best_nf = int(nf)
            stalled = 0
        elif motion < 1e-3:                      # units of RAD=100 coords
            stalled += 1
            if stalled >= 4:
                break
        else:
            stalled = 0
    if verbose and it_total > 0:
        print(f"unfold: {it_total} sweeps, {int(nf)} residual folds")
    out = mesh.copy()
    out.coords = np.asarray(coords, np.float64)
    return out


def count_folds(mesh: Mesh) -> int:
    _, _, tri_idx, _ = mesh.adjacency
    return int(jnp.sum(_folded_mask(jnp.asarray(mesh.coords, jnp.float32),
                                    jnp.asarray(mesh.faces), jnp.asarray(tri_idx))))
