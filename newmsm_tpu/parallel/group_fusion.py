"""Production subject-sharded groupwise fusion optimisation.

This is THE groupwise optimiser (reg/group.py calls it for any device count,
including 1): the same fusion-move sweep the reference runs through
Fusion::optimize (Fusion.h:122-244) on the DiscreteGroupModel energy
(DiscreteGroupCostFunction.cpp:26-98), distributed over a `subjects` device
mesh:

  - label-deformed template maps (the heaviest per-iteration stage,
    get_patch_data, DiscreteGroupModel.cpp:88-121) are computed
    subject-sharded with NO collectives;
  - cross-subject CP correspondences (estimate_pairs,
    DiscreteGroupModel.cpp:37-55) are computed on device, sharded over the
    first subject, and all_gathered;
  - each fusion alpha step builds the binary move tables in parallel:
    per-subject triplet blocks and per-(a,b) pair blocks are assigned
    round-robin to devices, computed from all_gathered state, and assembled
    by psum of DISJOINT slots — bitwise exact, so results are independent of
    the device count;
  - the binary ICM solve then runs replicated (identical on every device)
    over conflict-free color groups, multi-start like the pairwise solver.

Determinism contract: every per-block computation has shapes independent of
the device count (lax.map over fixed-size slot lists), and cross-device
combination is concatenation or disjoint-slot psum only — never a float
reduction whose order depends on sharding. tests/test_group_sharded.py holds
1-vs-N-device runs to identical labelings and energies.
"""
from __future__ import annotations

import functools
import math
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core import spherical as sph
from ..ops import similarity as simi
from ..ops.nearest import SearchTables, _search
from ..ops.strain import triangular_strain

RAD = 100.0
FOLDING = 1e7
FIX_NAN = 1e7


class GroupLevelStatics(NamedTuple):
    """Per-level constants, replicated on every device."""
    labels: jax.Array         # (L,3)
    centre: jax.Array         # (3,)
    orig_cp: jax.Array        # (K,3) pristine CP grid
    cp_faces: jax.Array       # (T,3) sorted CP faces
    tmpl_coords: jax.Array    # (Nt,3)
    mask_w: Optional[jax.Array]   # (Nt,) |mask| weights or None
    # CP-grid search topology (shared across subjects; coords swapped per call)
    cp_search: SearchTables
    # scalars / statics
    mu: float
    kappa: float
    k_exp: float
    rexp: float
    reglambda: float
    subcorr: float
    simval: int
    percentile: float
    pmax: int
    cprange: float
    fixnan: bool
    sweeps: int = 2
    icm_passes: int = 4
    n_restarts: int = 2


class GroupIterTables(NamedTuple):
    """Per-iteration incidence/coloring tables (host-built from the partner
    map, padded to stable bucket shapes; all replicated)."""
    vgroups: jax.Array          # (C,G) node ids per color, -1 padded
    vgroup_mask: jax.Array      # (C,G)
    vert_tri: jax.Array         # (S*K,MT) incident triplet ids, -1 padded
    vert_tri_corner: jax.Array  # (S*K,MT)
    vert_pair: jax.Array        # (S*K,MP) incident pair ids, -1 padded
    vert_pair_end: jax.Array    # (S*K,MP) own end (0/1)


# --------------------------------------------------------------------------
# canonical pair-block enumeration
# --------------------------------------------------------------------------

def pair_blocks(S: int) -> np.ndarray:
    """(B,2) all (a,b) a<b in lexicographic order; pair id = block*K + v,
    matching the reference's pair construction order
    (DiscreteGroupModel.cpp:37-55 up to its per-vertex interleaving)."""
    return np.array([(a, b) for a in range(S) for b in range(a + 1, S)],
                    np.int32).reshape(-1, 2)


def _round_robin_slots(n_items: int, n_dev: int) -> np.ndarray:
    """(n_dev, n_slots) item ids per device, -1 padded; item i -> device
    i % n_dev, so the per-device slot list is independent of which device
    and the per-slot work has fixed shapes for any device count."""
    n_slots = math.ceil(n_items / n_dev) if n_items else 0
    out = np.full((n_dev, max(1, n_slots)), -1, np.int32)
    for i in range(n_items):
        d, s = i % n_dev, i // n_dev
        out[d, s] = i
    return out


# --------------------------------------------------------------------------
# host-side incidence + coloring (per iteration; partner-dependent)
# --------------------------------------------------------------------------

def _pad_up(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


def _triplet_incidence(cp_faces: np.ndarray, K: int):
    """Vectorised per-vertex (triplet id, corner) incidence lists,
    -1 padded: (K,mt) x2."""
    T = cp_faces.shape[0]
    tids = np.repeat(np.arange(T, dtype=np.int64), 3)
    corners = np.tile(np.arange(3, dtype=np.int32), T)
    verts = cp_faces.reshape(-1).astype(np.int64)
    order = np.argsort(verts, kind="stable")
    v_s, t_s, c_s = verts[order], tids[order], corners[order]
    counts = np.bincount(v_s, minlength=K)
    mt = max(1, int(counts.max()))
    starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
    pos = np.arange(len(v_s)) - starts[v_s]
    vert_tri1 = np.full((K, mt), -1, np.int32)
    vert_corner1 = np.zeros((K, mt), np.int32)
    vert_tri1[v_s, pos] = t_s
    vert_corner1[v_s, pos] = c_s
    return vert_tri1, vert_corner1


def _greedy_color(src_sorted: np.ndarray, dst_sorted: np.ndarray,
                  N: int) -> np.ndarray:
    """First-fit coloring in node order over a CSR edge list (sorted by
    src). Native C++ when built (~ms at cgMSM scale); Python fallback has
    identical output."""
    deg = np.bincount(src_sorted, minlength=N)
    row = np.concatenate([[0], np.cumsum(deg)]).astype(np.int64)
    try:
        from ..native import _geometry
        if _geometry is not None and hasattr(_geometry, "greedy_color"):
            return _geometry.greedy_color(row, dst_sorted.astype(np.int32))
    except ImportError:
        pass
    colors = np.full(N, -1, np.int32)
    stamp = np.full(256, -1, np.int64)
    for n in range(N):
        nb = dst_sorted[row[n]:row[n + 1]]
        cs = colors[nb]
        stamp[cs[cs >= 0]] = n
        c = 0
        while stamp[c] == n:
            c += 1
        colors[n] = c
    return colors


# per-level memo: the partner map usually stabilises after the first
# iterations, and rebuilding tables is pure host work
_ITER_TABLE_CACHE: dict = {}
_ITER_TABLE_CACHE_MAX = 8


def build_iteration_tables(partner: np.ndarray, cp_faces: np.ndarray,
                           S: int, K: int) -> GroupIterTables:
    """Incidence lists + conflict-free node coloring for the groupwise MRF:
    nodes (s,k), per-subject triplet cliques, cross-subject pair edges
    (a*K+v, b*K+partner[a,b,v]). Shapes are padded to buckets so the jitted
    fusion program is stable across iterations. Results are memoised on the
    partner map (it stabilises as the registration converges)."""
    key = (S, K, cp_faces.shape[0],
           hash(np.ascontiguousarray(partner).tobytes()))
    hit = _ITER_TABLE_CACHE.get(key)
    if hit is not None:
        return hit

    blocks = pair_blocks(S)
    B = blocks.shape[0]
    N = S * K
    T = cp_faces.shape[0]

    # ---- triplet incidence: per-subject copy of the CP incidence ---------
    vert_tri1, vert_corner1 = _triplet_incidence(cp_faces, K)
    mt = vert_tri1.shape[1]
    offs = (np.arange(S, dtype=np.int32) * T)[:, None, None]
    vert_tri = np.where(vert_tri1[None] >= 0, vert_tri1[None] + offs,
                        -1).reshape(N, mt)
    vert_tri_corner = np.tile(vert_corner1, (S, 1))

    # ---- pair endpoints (vectorised; no Python loop over Pr) -------------
    a_arr, b_arr = blocks[:, 0], blocks[:, 1]
    v = np.arange(K, dtype=np.int32)
    p_ids = (np.arange(B, dtype=np.int32)[:, None] * K + v[None]).ravel()
    e0 = (a_arr[:, None] * K + v[None]).ravel()
    e1 = (b_arr[:, None] * K + partner[a_arr, b_arr]).ravel().astype(np.int64)

    nodes = np.concatenate([e0.astype(np.int64), e1])
    pid2 = np.concatenate([p_ids, p_ids])
    ends = np.concatenate([np.zeros_like(p_ids), np.ones_like(p_ids)])
    order = np.argsort(nodes, kind="stable")
    nodes_s, pid_s, end_s = nodes[order], pid2[order], ends[order]
    counts = np.bincount(nodes_s, minlength=N)
    mp = _pad_up(max(1, int(counts.max())), 8)
    starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
    pos = np.arange(len(nodes_s)) - starts[nodes_s]
    vert_pair = np.full((N, mp), -1, np.int32)
    vert_pair_end = np.zeros((N, mp), np.int32)
    vert_pair[nodes_s, pos] = pid_s
    vert_pair_end[nodes_s, pos] = end_s

    # ---- coloring: CSR adjacency (triplet + pair edges), greedy ----------
    ta = cp_faces[:, 0][None] + np.arange(S)[:, None] * K
    tb = cp_faces[:, 1][None] + np.arange(S)[:, None] * K
    tc = cp_faces[:, 2][None] + np.arange(S)[:, None] * K
    src = np.concatenate([ta.ravel(), ta.ravel(), tb.ravel(), tb.ravel(),
                          tc.ravel(), tc.ravel(), e0, e1])
    dst = np.concatenate([tb.ravel(), tc.ravel(), ta.ravel(), tc.ravel(),
                          ta.ravel(), tb.ravel(), e1, e0])
    order = np.argsort(src, kind="stable")
    src_s, dst_s = src[order], dst[order]
    colors = _greedy_color(src_s, dst_s, N)

    ncol = int(colors.max()) + 1
    groups_l = [np.nonzero(colors == c)[0] for c in range(ncol)]
    c_pad = _pad_up(ncol, 4)
    g_pad = _pad_up(max(len(g) for g in groups_l), 64)
    vgroups = np.full((c_pad, g_pad), -1, np.int32)
    vmask = np.zeros((c_pad, g_pad), bool)
    for c, g in enumerate(groups_l):
        vgroups[c, :len(g)] = g
        vmask[c, :len(g)] = True

    out = GroupIterTables(
        vgroups=jnp.asarray(vgroups), vgroup_mask=jnp.asarray(vmask),
        vert_tri=jnp.asarray(vert_tri),
        vert_tri_corner=jnp.asarray(vert_tri_corner),
        vert_pair=jnp.asarray(vert_pair),
        vert_pair_end=jnp.asarray(vert_pair_end))
    if len(_ITER_TABLE_CACHE) >= _ITER_TABLE_CACHE_MAX:
        _ITER_TABLE_CACHE.pop(next(iter(_ITER_TABLE_CACHE)))
    _ITER_TABLE_CACHE[key] = out
    return out


# --------------------------------------------------------------------------
# device-side: partner map (estimate_pairs)
# --------------------------------------------------------------------------

def make_partner_fn(mesh: Mesh, st: GroupLevelStatics, S: int):
    """cp (S,K,3) subject-sharded -> partner (S,S,K) replicated:
    partner[a,b,v] = closest CP vertex in subject b's grid to subject a's
    CP v (get_closest_vertex_ID through the deformed grids,
    DiscreteGroupModel.cpp:37-55). Sharded over a; per-(a,b) searches have
    device-count-independent shapes."""
    n_dev = mesh.devices.size
    n_local = S // n_dev

    def run(cp_loc):
        cp_all = jax.lax.all_gather(cp_loc, "subjects", tiled=True)  # (S,K,3)
        shard = jax.lax.axis_index("subjects")

        def one_a(a_local):
            qa = cp_loc[a_local]                       # (K,3)

            def one_b(cp_b):
                # swap in the DEFORMED grid coordinates and drop the
                # pristine/descent shortcuts, which are only valid for the
                # undeformed icosphere — leaving pristine_res set would
                # silently answer the search on the pristine geometry
                # (estimate_pairs queries the deformed grid's octree,
                # DiscreteGroupModel.cpp:37-55)
                tabs = st.cp_search._replace(coords=cp_b, pristine_res=-1,
                                             descent=())
                _, tv, vc = _search(qa, tabs, chunk=min(4096, qa.shape[0]))
                d = jnp.linalg.norm(vc - qa[:, None, :], axis=-1)
                sel = jnp.argmin(d, axis=1)
                return jnp.take_along_axis(tv, sel[:, None], axis=1)[:, 0]

            return jax.lax.map(one_b, cp_all)          # (S,K)

        local = jax.lax.map(one_a, jnp.arange(n_local))   # (nl,S,K)
        return jax.lax.all_gather(local, "subjects", tiled=True)  # (S,S,K)

    from jax import shard_map
    return jax.jit(shard_map(run, mesh=mesh, in_specs=(P("subjects"),),
                             out_specs=P(), check_vma=False))


# --------------------------------------------------------------------------
# device-side: label maps (get_patch_data resampling stage)
# --------------------------------------------------------------------------

def make_maps_fn(mesh: Mesh, st: GroupLevelStatics, dg_topology, cap: int):
    """(dg_coords (S,N,3), dg_data (S,D,N)) sharded -> maps (S,L,D,Nt)
    sharded. Pure local compute; lax.map over local subjects so per-subject
    programs are identical for any device count."""
    from ..ops.resample import label_deformed_maps
    dg_faces, dg_tri_idx, dg_ring_faces, dg_ring_verts, tmpl_tables, \
        tmpl_vareas = dg_topology

    def run(coords_loc, data_loc):
        def one(args):
            c, d = args
            return label_deformed_maps(c, d, dg_faces, dg_tri_idx,
                                       dg_ring_faces, dg_ring_verts,
                                       st.labels, st.centre, tmpl_tables,
                                       tmpl_vareas, cap=cap)
        return jax.lax.map(one, (coords_loc, data_loc))   # (nl,L,D,Nt)

    from jax import shard_map
    return jax.jit(shard_map(run, mesh=mesh,
                             in_specs=(P("subjects"), P("subjects")),
                             out_specs=P("subjects"), check_vma=False))


# --------------------------------------------------------------------------
# device-side: the fusion optimisation step
# --------------------------------------------------------------------------

def _ring_local_pairs(nl: int) -> np.ndarray:
    """(n0,2) local (i,j) i<j pairs for the r=0 (own-block) ring step,
    -1 padded to at least one row."""
    ij = [(i, j) for i in range(nl) for j in range(i + 1, nl)]
    out = np.full((max(1, len(ij)), 2), -1, np.int32)
    for s, (i, j) in enumerate(ij):
        out[s] = (i, j)
    return out


def _block_id(a, b, S: int):
    """Lexicographic pair-block id of (a,b), a<b (pair_blocks order)."""
    return a * S - (a * (a + 1)) // 2 + (b - a - 1)


def make_fusion_fn(mesh: Mesh, st: GroupLevelStatics, S: int,
                   maps_exchange: str = "gather",
                   alpha_loop: str = "auto"):
    """Build the jitted subject-sharded fusion sweep.

    Call: (maps (S,L,D,Nt) sharded, cp (S,K,3) sharded, spac (S,K) sharded,
           labeling (S*K,) replicated, partner (S,S,K) replicated,
           tables: GroupIterTables replicated)
      -> (labeling (S*K,) replicated, energy () replicated,
          patch_need () replicated — MAX in-range template-vertex count over
          all (CP,label) patch requests; > st.pmax means patches were
          truncated and the caller must grow pmax to this and redo)

    maps_exchange — how devices see other subjects' label-deformed template
    maps (the (S,L,D,Nt) tensor, the dominant memory term;
    DiscreteGroupModel.cpp:88-121 is the reference hot spot):

      'gather': one all_gather per fusion call. Bytes-optimal — each
        received subject block (L*D*Nt floats) is reused by ~S partner
        blocks x sweeps*L alpha steps — but every device holds the full
        (S,L,D,Nt) tensor.
      'ring': per-device maps memory stays O(S/n_dev): each alpha step
        rotates the local block around the `subjects` ring (ppermute),
        processing the pair blocks between the resident and visiting
        subjects at each of n_dev//2+1 steps (each unordered block pair of
        device shards meets exactly once; the even-n_dev antipodal step is
        deduplicated by shard order). Identical block costs, assembled by
        the same disjoint-slot psum, so labelings/energies match 'gather'
        bitwise for any device count — at sweeps*L times the all_gather's
        communication volume. Use when the gathered tensor would not fit.

    alpha_loop — where the sweeps*L alpha iteration lives:
      'device': the whole fusion sweep is ONE dispatch (lax.fori_loop) —
        lowest overhead, but at cgMSM scale a single program can run for
        hundreds of seconds, which remote-TPU runtimes kill ("TPU worker
        crashed", reproduced at S=6/K=642/template ico-6).
      'host': one jitted alpha-step program dispatched sweeps*L times with
        the labeling fed back through device memory (dispatches pipeline
        asynchronously; only the final result syncs). Identical math and
        results; per-step dispatch overhead ~ms.
      'auto': 'host' when the estimated per-call work
        sweeps*L*B*K*Nt exceeds ~1e10 (between the known-good and
        known-killed scales), else 'device'.
    """
    if maps_exchange not in ("gather", "ring"):
        raise ValueError(f"unknown maps_exchange {maps_exchange!r}")
    if alpha_loop not in ("device", "host", "auto"):
        raise ValueError(f"unknown alpha_loop {alpha_loop!r}")
    n_dev = mesh.devices.size
    if S % n_dev:
        raise ValueError(f"S={S} not divisible by {n_dev} devices")
    nl = S // n_dev
    K = st.orig_cp.shape[0]
    L = st.labels.shape[0]
    T = st.cp_faces.shape[0]
    blocks = pair_blocks(S)
    B = blocks.shape[0]
    blocks_j = jnp.asarray(blocks)
    subj_slots = jnp.asarray(_round_robin_slots(S, n_dev))    # (n_dev,ns)
    pair_slots = jnp.asarray(_round_robin_slots(B, n_dev))    # (n_dev,nb)
    ring_ij0 = jnp.asarray(_ring_local_pairs(nl))             # (n0,2)
    ring_ij = jnp.stack(jnp.meshgrid(jnp.arange(nl), jnp.arange(nl),
                                     indexing="ij"),
                        axis=-1).reshape(-1, 2).astype(jnp.int32)  # (nl*nl,2)
    n_ring_steps = n_dev // 2 + 1
    from ..reg.optimise.fusion import _BITS

    def triplet_block(s, rl_all, cp_all, lab_sk, alpha):
        """(T,8) binary triplet table for subject s (strain + folding,
        DiscreteGroupCostFunction.cpp:26-52)."""
        tf = st.cp_faces
        cur = lab_sk[s][tf]                             # (T,3)
        la = jnp.where(_BITS[None, :, 0] == 1, alpha, cur[:, 0:1])
        lb = jnp.where(_BITS[None, :, 1] == 1, alpha, cur[:, 1:2])
        lc = jnp.where(_BITS[None, :, 2] == 1, alpha, cur[:, 2:3])
        rl_s = rl_all[s]                                # (K,L,3)
        va = rl_s[tf[:, 0][:, None], la]
        vb = rl_s[tf[:, 1][:, None], lb]
        vc = rl_s[tf[:, 2][:, None], lc]
        cur_tri = cp_all[s][tf]
        n_cur = sph.tri_normal(cur_tri[:, 0], cur_tri[:, 1], cur_tri[:, 2])
        n_def = sph.tri_normal(va, vb, vc)
        folded = jnp.sum(n_def * n_cur[:, None, :], axis=-1) < 0.0
        o = st.orig_cp[tf]
        ob = jnp.broadcast_to(o[:, None], va.shape[:2] + (3, 3))
        strain = triangular_strain(ob, jnp.stack([va, vb, vc], axis=-2),
                                   st.mu, st.kappa, st.k_exp)
        cost = st.subcorr * st.reglambda * jnp.power(strain, st.rexp)
        if st.fixnan:
            cost = jnp.where(jnp.isnan(cost), FIX_NAN, cost)
        return jnp.where(folded, FOLDING, cost)

    def _make_run(mode):
      def run(maps_loc, cp_loc, spac_loc, labeling, partner, tables,
              *alpha_arg):
        shard = jax.lax.axis_index("subjects")
        cp_all = jax.lax.all_gather(cp_loc, "subjects", tiled=True)
        spac_all = jax.lax.all_gather(spac_loc, "subjects", tiled=True)
        maps_all = (jax.lax.all_gather(maps_loc, "subjects", tiled=True)
                    if maps_exchange == "gather" else None)

        rots = sph.rodrigues(
            jnp.broadcast_to(st.centre, cp_all.shape), cp_all)
        rl_all = jnp.einsum("skij,lj->skli", rots, st.labels)  # (S,K,L,3)
        tsq = jnp.sum(st.tmpl_coords ** 2, axis=1)             # (Nt,)

        def patch_of(pos, limit):
            """pos (...,3) -> (idx (...,pmax), geodesic dist (...,pmax),
            n_inrange (...) count of template vertices within `limit` —
            detects silent top-k truncation against st.pmax)."""
            d2 = (tsq - 2.0 * (pos @ st.tmpl_coords.T)
                  + jnp.sum(pos * pos, -1)[..., None])
            chord = jnp.sqrt(jnp.maximum(d2, 0.0))
            dist = 2.0 * RAD * jnp.arcsin(jnp.clip(chord / (2 * RAD), -1, 1))
            n_in = jnp.sum(dist < limit[..., None], axis=-1)
            npad = (-dist.shape[-1]) % 128
            dp = jnp.pad(dist, [(0, 0)] * (dist.ndim - 1) + [(0, npad)],
                         constant_values=jnp.inf)
            neg, idx = jax.lax.top_k(-dp, st.pmax)
            idx = jnp.minimum(idx, dist.shape[-1] - 1)
            return idx, -neg, n_in

        def pair_block_cost(a, b, map_a, map_b, lab_sk, alpha):
            """(K,4) binary pair table for block (a,b), a<b: combos indexed
            x_a*2 + x_b, x=1 means switch to alpha. Reproduces
            DiscreteGroupCostFunction::computePairwiseCost (cpp:54-98):
            overlap of A's and B's template patches at their (possibly
            moved) positions, similarity of the label-deformed maps at A's
            patch vertices. map_a/map_b: the two subjects' (L,D,Nt) label
            maps. Also returns the patch-overflow count (pmax truncation)."""
            part = partner[a, b]                        # (K,)
            cur_a = lab_sk[a]                           # (K,)
            cur_b = lab_sk[b][part]                     # (K,)
            la2 = jnp.stack([cur_a, jnp.full_like(cur_a, alpha)], 1)  # (K,2)
            lb2 = jnp.stack([cur_b, jnp.full_like(cur_b, alpha)], 1)

            lim_a = jnp.broadcast_to(
                (st.cprange * spac_all[a])[:, None], (K, 2))
            pos_a = rl_all[a, jnp.arange(K)[:, None], la2]   # (K,2,3)
            pos_b = rl_all[b, part[:, None], lb2]            # (K,2,3)
            idx_a, dist_a, n_in = patch_of(pos_a, lim_a)     # (K,2,pmax)
            rng_a = dist_a < lim_a[..., None]
            # max in-range count: lets the driver pre-size pmax in ONE
            # rebuild instead of rebuild-per-doubling (need > pmax means
            # this table truncated patches and the iteration must redo)
            overflow = jnp.max(n_in)

            ta = st.tmpl_coords[idx_a]                       # (K,2,pmax,3)
            chord = jnp.linalg.norm(ta[:, :, None] - pos_b[:, None, :, None],
                                    axis=-1)                 # (K,2,2,pmax)
            db = 2.0 * RAD * jnp.arcsin(jnp.clip(chord / (2 * RAD), -1, 1))
            rng_b = db < (st.cprange * spac_all[b][part])[:, None, None, None]
            overlap = rng_a[:, :, None] & rng_b              # (K,2pa,2pb,pmax)

            D = map_a.shape[1]
            dd = jnp.arange(D)
            data_a = map_a[la2[:, :, None, None], dd[None, None, :, None],
                           idx_a[:, :, None, :]]             # (K,2,D,pmax)
            # B's data read at A's patch indices per (pa,pb) combo:
            # (K,2pa,2pb,D,pmax)
            data_a4 = jnp.broadcast_to(data_a[:, :, None],
                                       (K, 2, 2, D, st.pmax))
            db_full = map_b[lb2[:, None, :, None, None],
                            dd[None, None, None, :, None],
                            idx_a[:, :, None, None, :]]      # (K,2,2,D,pmax)
            if st.mask_w is not None:
                w = st.mask_w[idx_a][:, :, None, None, :]
                w = jnp.broadcast_to(w, data_a4.shape)
            else:
                w = jnp.ones_like(data_a4)
            m = jnp.broadcast_to(overlap[:, :, :, None, :],
                                 data_a4.shape).astype(data_a4.dtype)
            per_dim = simi.sim_for_min(data_a4, db_full, w, m, st.simval,
                                       st.percentile)        # (K,2,2,D)
            cost = per_dim.mean(axis=-1)                     # (K,2,2)
            if st.fixnan:
                cost = jnp.where(jnp.isnan(cost), FIX_NAN, cost)
            return cost.reshape(K, 4), overflow

        def build_p4_gather(alpha, lab_sk):
            # round-robin pair blocks over devices, disjoint psum
            def p_slot(slot):
                bid = pair_slots[shard, slot]
                bid_safe = jnp.maximum(bid, 0)
                a = blocks_j[bid_safe, 0]
                b = blocks_j[bid_safe, 1]
                blockv, ovf = pair_block_cost(a, b, maps_all[a], maps_all[b],
                                              lab_sk, alpha)
                valid = bid >= 0
                return (jnp.where(valid, blockv, 0.0), bid_safe,
                        jnp.where(valid, ovf, 0))

            n_ps = pair_slots.shape[1]
            pvals, pids, povf = jax.lax.map(p_slot, jnp.arange(n_ps))
            p4 = jnp.zeros((B, K, 4), pvals.dtype)
            p4 = p4.at[pids].add(pvals)
            return p4, jnp.max(povf)

        def build_p4_ring(alpha, lab_sk):
            """Ring maps exchange: per-device maps memory O(S/n_dev). Step
            r holds the block of shard (shard-r) mod n_dev; pair blocks
            between resident and visiting subjects are computed with the
            SAME pair_block_cost as the gather path and added to their own
            disjoint p4 slots."""
            p4 = jnp.zeros((B, K, 4), jnp.float32)
            ovf_tot = jnp.zeros((), jnp.int32)
            visiting = maps_loc
            perm = [(i, (i + 1) % n_dev) for i in range(n_dev)]
            for r in range(n_ring_steps):
                v_shard = (shard - r) % n_dev

                if r == 0:
                    def one0(ij):
                        i, j = ij[0], ij[1]
                        valid = i >= 0
                        i_s, j_s = jnp.maximum(i, 0), jnp.maximum(j, 0)
                        a = shard * nl + i_s
                        b = shard * nl + j_s
                        blockv, ovf = pair_block_cost(
                            a, b, maps_loc[i_s], maps_loc[j_s], lab_sk, alpha)
                        bid = jnp.where(valid, _block_id(a, b, S), 0)
                        return (jnp.where(valid, blockv, 0.0), bid,
                                jnp.where(valid, ovf, 0))
                    pvals, pids, povf = jax.lax.map(one0, ring_ij0)
                else:
                    # even-n_dev antipodal step: both shard pairs hold each
                    # other; dedup by shard order
                    tie = (2 * r == n_dev)

                    def one(ij):
                        i, j = ij[0], ij[1]
                        ga = shard * nl + i             # resident subject
                        gb = v_shard * nl + j           # visiting subject
                        swap = gb < ga
                        a = jnp.minimum(ga, gb)
                        b = jnp.maximum(ga, gb)
                        m_own = maps_loc[i]
                        m_vis = visiting[j]
                        map_a = jnp.where(swap, m_vis, m_own)
                        map_b = jnp.where(swap, m_own, m_vis)
                        blockv, ovf = pair_block_cost(a, b, map_a, map_b,
                                                      lab_sk, alpha)
                        valid = (shard < v_shard) if tie else True
                        bid = jnp.where(valid, _block_id(a, b, S), 0)
                        return (jnp.where(valid, blockv, 0.0), bid,
                                jnp.where(valid, ovf, 0))
                    pvals, pids, povf = jax.lax.map(one, ring_ij)

                p4 = p4.at[pids].add(pvals)
                ovf_tot = jnp.maximum(ovf_tot, jnp.max(povf))
                if r + 1 < n_ring_steps:
                    visiting = jax.lax.ppermute(visiting, "subjects", perm)
            return p4, ovf_tot

        def build_tables_for(alpha, lab_sk):
            # t8: round-robin subject blocks, disjoint psum
            def t_slot(slot):
                s = subj_slots[shard, slot]
                s_safe = jnp.maximum(s, 0)
                blockv = triplet_block(s_safe, rl_all, cp_all, lab_sk, alpha)
                return jnp.where(s >= 0, blockv, 0.0), s_safe

            n_ts = subj_slots.shape[1]
            tvals, tids = jax.lax.map(t_slot, jnp.arange(n_ts))
            t8 = jnp.zeros((S, T, 8), tvals.dtype)
            t8 = t8.at[tids].add(tvals)       # duplicates impossible: slots
            t8 = jax.lax.psum(t8, "subjects").reshape(S * T, 8)

            p4, ovf = (build_p4_gather(alpha, lab_sk)
                       if maps_exchange == "gather"
                       else build_p4_ring(alpha, lab_sk))
            p4 = jax.lax.psum(p4, "subjects").reshape(B * K, 4)
            ovf = jax.lax.pmax(ovf, "subjects")
            return t8, p4, ovf

        # global triplet / pair endpoint tables for the replicated ICM
        trip_nodes = (st.cp_faces[None] + (jnp.arange(S) * K)[:, None, None]
                      ).reshape(S * T, 3)
        a_arr = blocks_j[:, 0]
        b_arr = blocks_j[:, 1]

        def pair_endpoints(partner):
            e0 = (a_arr[:, None] * K + jnp.arange(K)[None]).reshape(-1)
            e1 = (b_arr[:, None] * K + partner[a_arr, b_arr]).reshape(-1)
            return jnp.stack([e0, e1], 1)               # (B*K,2)

        pair_nodes = pair_endpoints(partner)

        def binary_icm(x0, t8, p4):
            from ..reg.optimise.fusion import _binary_icm
            ft = _IcmTables(tables)
            return _binary_icm(x0, jnp.zeros((S * K,)), jnp.zeros((S * K,)),
                               t8, p4, trip_nodes, pair_nodes, ft,
                               st.icm_passes)

        def alpha_step(labeling, alpha):
            lab_sk = labeling.reshape(S, K)
            t8, p4, ovf = build_tables_for(alpha, lab_sk)
            N = S * K
            # greedy-data start: switch wherever the pair (similarity) term
            # alone prefers alpha at x=0 — the group analogue of the
            # single-pair greedy-unary start that closes the oracle-found
            # block-move gaps (fusion.fusion_binary_solve round-5 note;
            # the group binary has no explicit unary, its data term lives
            # in the p4 pair blocks)
            ipr = tables.vert_pair
            pe = tables.vert_pair_end
            ip_s = jnp.where(ipr >= 0, ipr, 0)
            wp = jnp.where(pe == 0, 2, 1)
            d_p = (p4[ip_s, wp] - p4[ip_s, 0]) * (ipr >= 0)
            greedy = (d_p.sum(axis=1) < 0).astype(jnp.int32)
            starts = [jnp.zeros((N,), jnp.int32), jnp.ones((N,), jnp.int32),
                      greedy]
            if st.n_restarts > 0:
                key = jax.random.fold_in(jax.random.PRNGKey(7), alpha)
                starts.append(jax.random.bernoulli(
                    key, 0.5, (st.n_restarts, N)).astype(jnp.int32))
                x0 = jnp.concatenate([jnp.stack(starts[:3]), starts[3]])
            else:
                x0 = jnp.stack(starts)
            xs = jax.vmap(lambda x: binary_icm(x, t8, p4))(x0)

            def benergy(x):
                xb = x[trip_nodes]
                e = jnp.sum(t8[jnp.arange(S * T),
                               xb[:, 0] * 4 + xb[:, 1] * 2 + xb[:, 2]])
                xp = x[pair_nodes]
                return e + jnp.sum(p4[jnp.arange(B * K),
                                      xp[:, 0] * 2 + xp[:, 1]])

            es = jax.vmap(benergy)(xs)
            x = xs[jnp.argmin(es)]
            return jnp.where(x == 1, alpha, labeling), ovf

        if mode == "step":
            # one alpha step (host-driven loop); alpha is a traced scalar so
            # every step reuses ONE compiled program
            return alpha_step(labeling, alpha_arg[0])

        if mode == "energy":
            # final energy at the labeling: combo-0 ("keep all") sums of a
            # fresh table build (alpha value irrelevant for combo 0)
            t8f, p4f, ovf_f = build_tables_for(0, labeling.reshape(S, K))
            return jnp.sum(t8f[:, 0]) + jnp.sum(p4f[:, 0]), ovf_f

        def body(i, carry):
            labeling, ovf_acc = carry
            labeling, ovf = alpha_step(labeling, i % L)
            return labeling, jnp.maximum(ovf_acc, ovf)

        labeling, overflow = jax.lax.fori_loop(
            0, st.sweeps * L, body, (labeling, jnp.zeros((), jnp.int32)))

        t8f, p4f, ovf_f = build_tables_for(0, labeling.reshape(S, K))
        energy = jnp.sum(t8f[:, 0]) + jnp.sum(p4f[:, 0])
        return labeling, energy, jnp.maximum(overflow, ovf_f)

      return run

    from jax import shard_map
    pspec = P("subjects")
    base_specs = (pspec, pspec, pspec, P(), P(), GroupIterTables(*([P()] * 6)))

    if alpha_loop == "auto":
        Nt = st.tmpl_coords.shape[0]
        work = st.sweeps * L * B * K * Nt
        alpha_loop = "host" if work > 1e10 else "device"

    if alpha_loop == "device":
        return jax.jit(shard_map(
            _make_run("full"), mesh=mesh, in_specs=base_specs,
            out_specs=(P(), P(), P()), check_vma=False))

    step_fn = jax.jit(shard_map(
        _make_run("step"), mesh=mesh, in_specs=base_specs + (P(),),
        out_specs=(P(), P()), check_vma=False))
    energy_fn = jax.jit(shard_map(
        _make_run("energy"), mesh=mesh, in_specs=base_specs,
        out_specs=(P(), P()), check_vma=False))

    def call(maps, cp, spac, labeling, partner, tables):
        ovfs = []
        for i in range(st.sweeps * L):
            labeling, ovf = step_fn(maps, cp, spac, labeling, partner,
                                    tables, jnp.int32(i % L))
            ovfs.append(ovf)       # stays on device; dispatches pipeline
        energy, ovf_f = energy_fn(maps, cp, spac, labeling, partner, tables)
        overflow = ovf_f
        for o in ovfs:
            overflow = jnp.maximum(overflow, o)
        return labeling, energy, overflow

    return call


def make_apply_fn(mesh: Mesh, st: GroupLevelStatics, S: int, cp_mesh,
                  dg_mesh, sharded: bool = False):
    """Batched apply-labeling stage (the group driver's per-subject
    unfold + sphere_project_warp host loop, group_mesh_registration.cpp:
    104-115, de-hosted: VERDICT round-2 item #6).

    Call: (dg_coords (S,N,3), cp (S,K,3), labeling (S*K,) replicated)
      -> (dg_coords', cp', spac' (S,K))

    Per subject: CP_k <- R_k . label_{l_k} (applyLabeling), unfold the CP
    grid, warp the data-grid sphere through (old CP -> new CP), unfold it,
    and recompute the per-CP spacings (get_spacings).

    sharded=False (default): ONE program batched over all S subjects on the
    mesh's first device — the unfold while_loop body compiles differently
    under single-device vs SPMD partitioning (fusion/FMA formation), so a
    subject-sharded apply is only reproducible to ~1 ulp across device
    counts; the fixed-layout default keeps the driver's device-count
    bitwise-invariance guarantee. sharded=True distributes subjects over
    the full mesh (use at scale where the ~1e-5 coordinate jitter between
    device counts is acceptable).
    """
    from ..ops.resample import warp_coords
    from ..ops.unfold import unfold_kernel
    from ..reg.optimise.coloring import (color_groups,
                                         vertex_coloring_from_faces)
    from jax.sharding import Mesh as JMesh

    if not sharded:
        mesh = JMesh(np.asarray(mesh.devices.flat[:1]), ("subjects",))
    n_dev = mesh.devices.size
    K = st.orig_cp.shape[0]

    def topo(m):
        nbr_idx, _, tri_idx, _ = m.adjacency
        colors = vertex_coloring_from_faces(m.faces, m.nvertices)
        g, gm = color_groups(colors)
        return (jnp.asarray(m.faces.astype(np.int32)), jnp.asarray(tri_idx),
                jnp.asarray(g), jnp.asarray(gm), jnp.asarray(nbr_idx))

    cp_topo = topo(cp_mesh)
    dg_topo = topo(dg_mesh)

    def run(dg_loc, cp_loc, labeling):
        shard = jax.lax.axis_index("subjects")
        nl = S // n_dev
        lab_sk = labeling.reshape(S, K)

        def one(args):
            s_local, dg_c, cp_c = args
            s = shard * nl + s_local
            rots = sph.rodrigues(jnp.broadcast_to(st.centre, cp_c.shape),
                                 cp_c)
            rl = jnp.einsum("kij,lj->kli", rots, st.labels)   # (K,L,3)
            new_cp = rl[jnp.arange(K), lab_sk[s]]             # (K,3)
            new_cp, _, _ = unfold_kernel(new_cp, *cp_topo)

            frm = st.cp_search._replace(coords=cp_c, pristine_res=-1,
                                        descent=())
            warped = warp_coords(dg_c, frm, new_cp)
            warped, _, _ = unfold_kernel(warped, *dg_topo)

            nb = new_cp[jnp.clip(cp_topo[4], 0, K - 1)]
            chord = jnp.linalg.norm(nb - new_cp[:, None, :], axis=2)
            d = 2 * RAD * jnp.arcsin(jnp.clip(chord / (2 * RAD), -1, 1))
            spac = jnp.where(cp_topo[4] >= 0, d, 0.0).max(axis=1)
            return warped, new_cp, spac

        return jax.lax.map(one, (jnp.arange(nl), dg_loc, cp_loc))

    from jax import shard_map
    pspec = P("subjects")
    inner = jax.jit(shard_map(run, mesh=mesh,
                              in_specs=(pspec, pspec, P()),
                              out_specs=(pspec, pspec, pspec),
                              check_vma=False))
    in_sh = NamedSharding(mesh, pspec)
    rep_sh = NamedSharding(mesh, P())

    def apply(dg_coords, cp, labeling):
        # reshard onto the apply mesh (no-op when sharded=True); the caller
        # re-puts outputs onto its own mesh
        return inner(jax.device_put(dg_coords, in_sh),
                     jax.device_put(cp, in_sh),
                     jax.device_put(labeling, rep_sh))

    return apply


class _IcmTables:
    """Adapter: GroupIterTables -> the FusionTables attribute surface that
    reg/optimise/fusion._binary_icm consumes."""
    def __init__(self, t: GroupIterTables):
        self.vgroups = t.vgroups
        self.vgroup_mask = t.vgroup_mask
        self.vert_tri = t.vert_tri
        self.vert_tri_corner = t.vert_tri_corner
        self.vert_pair = t.vert_pair
        self.vert_pair_end = t.vert_pair_end
