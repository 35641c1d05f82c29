"""Greedy graph colorings of the control-point grid (host-side, cached).

Parallel label updates need conflict-free groups: MCMC processes triplets
whose vertex sets are disjoint simultaneously; the fusion binary solver
flips vertices that share no triplet/edge simultaneously. Icosphere
topology gives small, stable chromatic numbers (faces ~8-12, vertices ~4-7).
"""
from __future__ import annotations

import functools

import numpy as np


def greedy_color(adjacency: list[set[int]]) -> np.ndarray:
    n = len(adjacency)
    colors = np.full(n, -1, dtype=np.int32)
    for v in range(n):
        used = {colors[u] for u in adjacency[v] if colors[u] >= 0}
        c = 0
        while c in used:
            c += 1
        colors[v] = c
    return colors


def dsatur_color(adjacency: list[set[int]]) -> np.ndarray:
    """DSATUR coloring: picks the most saturation-constrained vertex next.
    Fewer colors than plain greedy (9 vs 11 for icosphere face conflicts),
    and every color saved is one fewer sequential step per optimiser sweep."""
    n = len(adjacency)
    colors = np.full(n, -1, dtype=np.int32)
    sat: list[set[int]] = [set() for _ in range(n)]
    deg = np.array([len(a) for a in adjacency])
    for _ in range(n):
        un = np.where(colors < 0)[0]
        s = np.array([len(sat[v]) for v in un])
        v = un[np.lexsort((-deg[un], -s))[0]]
        c = 0
        while c in sat[v]:
            c += 1
        colors[v] = c
        for u in adjacency[v]:
            sat[u].add(c)
    return colors


def face_coloring(faces: np.ndarray, nverts: int) -> np.ndarray:
    """Color faces so same-color faces share no vertex."""
    vert_faces: list[list[int]] = [[] for _ in range(nverts)]
    for t, (a, b, c) in enumerate(faces):
        vert_faces[a].append(t)
        vert_faces[b].append(t)
        vert_faces[c].append(t)
    adj: list[set[int]] = [set() for _ in range(len(faces))]
    for fs in vert_faces:
        for t in fs:
            adj[t].update(u for u in fs if u != t)
    return dsatur_color(adj)


def vertex_coloring_from_faces(faces: np.ndarray, nverts: int) -> np.ndarray:
    """Color vertices so same-color vertices share no face (distance-1 in the
    triplet hypergraph — stronger than edge coloring, required because a
    triplet couples all three corners)."""
    adj: list[set[int]] = [set() for _ in range(nverts)]
    for a, b, c in faces:
        adj[a].update((b, c))
        adj[b].update((a, c))
        adj[c].update((a, b))
    return greedy_color(adj)


def color_groups(colors: np.ndarray, pad_value: int = -1):
    """Split ids by color into a padded (n_colors, max_group) int32 array +
    mask."""
    ncol = int(colors.max()) + 1
    groups = [np.nonzero(colors == c)[0] for c in range(ncol)]
    gmax = max(len(g) for g in groups)
    out = np.full((ncol, gmax), pad_value, dtype=np.int32)
    mask = np.zeros((ncol, gmax), dtype=bool)
    for c, g in enumerate(groups):
        out[c, : len(g)] = g
        mask[c, : len(g)] = True
    return out, mask
