"""Dense MRF cost volumes for discrete surface registration.

The reference evaluates costs one (node,label) at a time through virtual
calls + octree queries (DiscreteCostFunction.cpp); here each term is one
batched kernel producing the full tensor the optimisers consume:

  unary    (K, L)        patch rotate -> nearest-triangle resample -> sim
  triplet  (T, ...)      folding gate + closed-form strain (+ triclique sim)
  pairwise (P, L, L)     label-rotation difference + folding gate

All shapes are static per level; patches are padded index lists with masks.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core import spherical as sph
from ..ops import similarity as simi
from ..ops.nearest import SearchTables, barycentric_coords
from ..ops.strain import triangular_strain

RAD = 100.0
FOLDING = 1e7
FIX_NAN = 1e7
# slack added to the in-range limit when counting patch members for the
# overflow (grow-pmax) signal: absorbs the ~1e-3 matmul-form score noise so
# capacity growth errs on the side of keeping every in-range vertex
_OVERFLOW_GUARD = 1e-2


class LevelTables(NamedTuple):
    """Static per-level device state."""
    target_tables: SearchTables     # data-grid target mesh (fixed per level)
    target_data: jax.Array          # (D,N)
    source_data: jax.Array          # (D,N)
    orig_cp: jax.Array              # (K,3) level-start CP grid (pristine ico)
    triplets: jax.Array             # (T,3) sorted CP vertex ids
    pairs: jax.Array                # (Pr,2) CP edges
    cp_faces: jax.Array             # (T,3) CP faces in native order
    cp_tri_idx: jax.Array           # (K,MT) incident CP faces, -1 padded
    maxsep: jax.Array               # (K,) per-CP max spacing (level init)
    mvd_max: jax.Array              # scalar


# --------------------------------------------------------------------------
# patches
# --------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("pmax",))
def build_patches(cp_coords, src_coords, maxsep, cprange, pmax: int,
                  ball=None):
    """In-range source vertices per control point (within_controlpt_range,
    DiscreteCostFunction.cpp:102-107): geodesic distance < cprange*maxsep_k.
    Returns (idx (K,pmax), mask (K,pmax), overflow (K,) bool).

    `ball`: optional (K,C) i32 candidate table (-1 padded) restricting the
    search per CP — a provably-covering graph ball built host-side by
    `patch_candidate_ball`. Cuts the dominant all-pairs distance + top_k
    work by N/C (~20x at ico-5/CP-3) with EXACT in-range semantics: the
    caller only passes a ball whose pristine cover radius certifies that no
    in-range vertex can lie outside it (see patch_candidate_ball)."""
    if ball is not None:
        K, C = ball.shape
        pad_c = max(pmax, C + ((-C) % 128)) - C
        cand = jnp.pad(ball, ((0, 0), (0, pad_c)), constant_values=-1)
        valid = cand >= 0
        cc = src_coords[jnp.maximum(cand, 0)]          # (K,C',3) row gather
        diff = cc - cp_coords[:, None, :]
        chord = jnp.sqrt(jnp.maximum(jnp.sum(diff * diff, -1), 0.0))
        dist = 2.0 * RAD * jnp.arcsin(jnp.clip(chord / (2.0 * RAD), -1.0, 1.0))
        dist = jnp.where(valid, dist, jnp.inf)
        limit = (cprange * maxsep)[:, None]
        _, sel = jax.lax.top_k(-dist, pmax)            # (K,pmax) nearest-first
        idx = jnp.take_along_axis(cand, sel, axis=1)
        d_sel = jnp.take_along_axis(dist, sel, axis=1)
        mask = d_sel < limit
        overflow = (dist < limit + _OVERFLOW_GUARD).sum(axis=1) > pmax
        return jnp.maximum(idx, 0).astype(jnp.int32), mask, overflow
    # dense path: matmul-form scores rank candidates (fast but noisy); the
    # in-range mask is then decided on EXACT gathered small-difference
    # distances — the reference's arithmetic (within_controlpt_range
    # computes |p-q| directly). HIGHEST is mandatory: the TPU MXU's bf16
    # default makes the cancellation |cp|^2-2cp.src+|src|^2 noisy by ~40
    # units^2 at RAD=100 (~1 unit of distance near the patch boundary),
    # enough to push true in-range vertices out of the top-k ranking
    # (observed on-chip, round 4); with f32 the noise is ~1e-3 and the
    # _OVERFLOW_GUARD covers it
    chord2 = (jnp.sum(cp_coords**2, axis=1)[:, None]
              - 2.0 * jnp.matmul(cp_coords, src_coords.T,
                                 precision=jax.lax.Precision.HIGHEST)
              + jnp.sum(src_coords**2, axis=1)[None, :])
    chord_n = jnp.sqrt(jnp.maximum(chord2, 0.0))
    dist_n = 2.0 * RAD * jnp.arcsin(jnp.clip(chord_n / (2.0 * RAD), -1.0, 1.0))
    limit = (cprange * maxsep)[:, None]
    # lane-align the top_k axis (slow TPU codegen otherwise)
    npad = (-dist_n.shape[1]) % 128
    neg = jnp.pad(-dist_n, ((0, 0), (0, npad)), constant_values=-jnp.inf)
    _, idx = jax.lax.top_k(neg, pmax)                  # (K,pmax) nearest-first
    idx = jnp.minimum(idx, dist_n.shape[1] - 1)
    diff = src_coords[idx] - cp_coords[:, None, :]
    chord = jnp.sqrt(jnp.maximum(jnp.sum(diff * diff, -1), 0.0))
    d_sel = 2.0 * RAD * jnp.arcsin(jnp.clip(chord / (2.0 * RAD), -1.0, 1.0))
    mask = d_sel < limit
    # the noisy ranking can only lose an in-range vertex when the patch is
    # within score-noise of capacity, so the guarded count triggers the
    # caller's pmax-growth loop there
    overflow = (dist_n < limit + _OVERFLOW_GUARD).sum(axis=1) > pmax
    return idx.astype(jnp.int32), mask, overflow


@functools.lru_cache(maxsize=None)
def _ball_table_np(res: int, n_centres: int, depth: int):
    """(n_centres, C) graph-ball candidate table on the pristine level-`res`
    icosphere, -1 padded: for centre vertex k (CP ids are a prefix of the
    fine ids — subdivision appends midpoints), all fine vertices within
    `depth` edges of k."""
    import numpy as np
    from ..core.icosphere import icosphere
    nbr = icosphere(res).nbr_idx
    try:
        from ..native import _geometry
        tab = _geometry.bfs_ball(np.ascontiguousarray(nbr, np.int32),
                                 n_centres, depth)
    except ImportError:
        rows = []
        for v in range(n_centres):
            seen = {v}
            frontier = [v]
            for _ in range(depth):
                nxt = []
                for a in frontier:
                    for b in nbr[a]:
                        if b >= 0 and int(b) not in seen:
                            seen.add(int(b))
                            nxt.append(int(b))
                frontier = nxt
            rows.append(sorted(seen))
        cmax = max(len(r) for r in rows)
        tab = np.empty((n_centres, cmax), np.int32)
        for v, r in enumerate(rows):
            tab[v, : len(r)] = r
            tab[v, len(r):] = v
    # self-padding duplicates -> -1 (duplicate patch members would double-
    # count in the similarity reductions)
    eq = tab == np.arange(n_centres, dtype=tab.dtype)[:, None]
    tab = tab.copy()
    tab[eq & (np.cumsum(eq, axis=1) > 1)] = -1
    return tab


@functools.lru_cache(maxsize=None)
def _ball_cover_np(res: int, n_centres: int, depth: int) -> float:
    """Certified pristine cover radius of `_ball_table_np(res,n_centres,
    depth)` at RAD: the minimum over centres of the arc distance from the
    centre to its NEAREST non-ball vertex. Any query within this radius of
    centre k (pristine geometry) is guaranteed to be a ball member."""
    import numpy as np
    from ..core.icosphere import icosphere
    tab = _ball_table_np(res, n_centres, depth)
    u = icosphere(res).coords.astype(np.float64)
    cover = np.inf
    chunk = 256
    for s in range(0, n_centres, chunk):
        e = min(s + chunk, n_centres)
        cosd = np.clip(u[s:e] @ u.T, -1.0, 1.0)        # (c,N)
        dist = RAD * np.arccos(cosd)
        t = tab[s:e]
        in_ball = np.zeros_like(dist, bool)
        rr, cc = np.nonzero(t >= 0)
        in_ball[rr, t[rr, cc]] = True
        dist[in_ball] = np.inf
        cover = min(cover, float(dist.min()))
    return cover


def patch_candidate_ball(cp_coords, src_coords, faces, limits, rad=RAD):
    """Host-side: build a candidate ball table for `build_patches` together
    with its exactness certificate, or return None when the certificate
    fails (caller then uses the dense path).

    The in-range test runs on the DEFORMED source sphere; the ball is a
    graph ball around pristine vertex k. Certificate: for any source vertex
    v with deformed arc distance d(cp_k, v) <= limit_k, its pristine arc
    distance to vertex k is bounded by walking the deformed mesh path —
      arc_pri(k, v) <= mesh_pri(k, v) <= s_max * mesh_def(k, v)
                    <= s_max * (detour * (d0_k + limit_k) + slack * e_max)
    with s_max the max per-edge deformed/pristine stretch, d0_k the
    deformed distance from CP k to source vertex k, detour=1.3 the
    hex-lattice path-over-arc factor (2/sqrt(3)=1.155 with margin) and
    slack=4 edges of quantisation. The smallest BFS depth whose certified
    pristine cover radius (`_ball_cover_np`) exceeds this bound is used.
    Registration warps pass the unfold gate and are mildly deformed, so the
    certificate holds with wide margin in practice; wild geometry falls
    back to the exact dense path (None).
    """
    import numpy as np
    from ..core.icosphere import _NVERT_TO_RES, icosphere
    src_coords = np.asarray(src_coords)
    cp_coords = np.asarray(cp_coords)
    faces = np.asarray(faces)
    N, K = src_coords.shape[0], cp_coords.shape[0]
    res = _NVERT_TO_RES.get(N)
    if res is None or K > N:
        return None
    ico = icosphere(res)
    if ico.faces.shape != faces.shape or not np.array_equal(ico.faces, faces):
        return None
    pri = ico.coords * rad
    ev = np.concatenate([faces[:, [0, 1]], faces[:, [1, 2]],
                         faces[:, [2, 0]]])
    d_def = np.linalg.norm(src_coords[ev[:, 0]] - src_coords[ev[:, 1]],
                           axis=1)
    d_pri = np.linalg.norm(pri[ev[:, 0]] - pri[ev[:, 1]], axis=1)
    s_max = float((d_def / np.maximum(d_pri, 1e-30)).max())
    if not np.isfinite(s_max) or s_max > 2.0:
        return None
    e_max = float(
        2.0 * rad * np.arcsin(np.clip(d_def.max() / (2.0 * rad), -1, 1)))
    chord0 = np.linalg.norm(cp_coords - src_coords[:K], axis=1)
    d0 = 2.0 * rad * np.arcsin(np.clip(chord0 / (2.0 * rad), -1, 1))
    r_req = float(s_max * (1.3 * (d0 + np.asarray(limits)).max()
                           + 4.0 * e_max))
    for depth in (4, 6, 8, 10, 12, 14, 16):
        if _ball_cover_np(res, K, depth) > r_req:
            tab = _ball_table_np(res, K, depth)
            if tab.shape[1] >= N // 2:
                return None                    # no useful pruning
            return tab
    return None


def max_inrange_count(cp_coords, src_coords, limits, rad=RAD,
                      chunk=512) -> int:
    """Host-side exact max over CPs of the in-range source-vertex count
    (sizes the pmax patch capacity so the hot kernel carries no avoidable
    padding lanes — at CP-3/ico-5 the true max is ~69 vs the old
    density-formula 128, i.e. 46% of the unary work was padding)."""
    import numpy as np
    cp_coords = np.asarray(cp_coords, np.float64)
    src_coords = np.asarray(src_coords, np.float64)
    uc = cp_coords / np.linalg.norm(cp_coords, axis=1, keepdims=True)
    uv = src_coords / np.linalg.norm(src_coords, axis=1, keepdims=True)
    lim = np.asarray(limits, np.float64)
    best = 0
    for s in range(0, len(uc), chunk):
        d = rad * np.arccos(np.clip(uc[s:s + chunk] @ uv.T, -1.0, 1.0))
        best = max(best, int((d < lim[s:s + chunk, None]).sum(1).max()))
    return best


def rotated_label_positions(cp_coords, labels, centre):
    """RL[k,l] = R(centre -> CP_k) @ label_l (DiscreteModel.cpp:310-319,
    applyLabeling :264-269). Returns (rots (K,3,3), rl (K,L,3))."""
    rots = sph.rodrigues(jnp.broadcast_to(centre, cp_coords.shape), cp_coords)
    # HIGHEST: coordinate-carrying contraction must not drop to MXU bf16
    rl = jnp.einsum("kij,lj->kli", rots, labels,
                    precision=jax.lax.Precision.HIGHEST)
    return rots, rl


# --------------------------------------------------------------------------
# unary data term
# --------------------------------------------------------------------------

def _resample_target(points, tables: SearchTables, target_data):
    """Barycentric-interpolate target data at `points` (...,3).
    Returns (..., D).

    Pristine-icosphere targets take the fused SoA locate path (zero search
    gathers); deformed targets fall back to the hierarchical search. Data is
    gathered face-major — one contiguous (3*D)-float row per query — because
    TPU row gathers sustain ~10x the bandwidth of per-vertex element
    gathers."""
    from ..ops.nearest import _search, resample_pristine
    if tables.pristine_res >= 0:
        return resample_pristine(points, tables, target_data)
    shape = points.shape[:-1]
    flat = points.reshape(-1, 3)
    tri, _, vc = _search(flat, tables)
    w = sph.barycentric_weights(vc[:, 0], vc[:, 1], vc[:, 2],
                                flat.astype(vc.dtype))
    face_data = target_data.T[tables.faces]            # (T,3,D)
    vals = face_data[tri]                              # (Q,3,D) row gather
    out = jnp.einsum("qj,qjd->qd", w, vals)
    return out.reshape(shape + (target_data.shape[0],))


@functools.partial(jax.jit, static_argnames=("simval", "mode", "lchunk",
                                             "fblk", "return_miss"))
def unary_costs(cp_coords, rl, src_coords, patch_idx, patch_mask,
                tables: SearchTables, src_data, target_data, cfweights,
                abs_weights, simval: int, percentile=0.75,
                mode: str = "univariate", lchunk: int = 4,
                fblk: int = 0, limits=None, return_miss: bool = False):
    """Unary cost volume (K,L).

    mode:
      'univariate'  — weighted sim of scalar patches
                      (DiscreteCostFunction.cpp:325-383)
      'multivariate'— mean over patch of per-vertex feature-vector sim
                      (:385-458)
      'patchwise'   — mean over channels of per-channel patch sim (:620-692)

    rl: (K,L,3) rotated label positions. cfweights: (Dw,N) source-space
    weighting (Dw == 1 or D).

    fblk > 0 enables the block-contiguous target-data gather
    (ops/blocked.py) with a per-CP budget of fblk blocks; requires `limits`
    (K,) = the in-range patch radii (cprange*maxsep, units at RAD) so the
    block selection can certify cover of every rotated patch point, and
    REQUIRES return_miss=True: the blocked gather zero-fills missed
    queries, so discarding the miss counter would be a silent cap
    (ADVICE r4 — no-silent-caps is enforced by the API, not caller
    convention). With return_miss=True the certificate-miss count is also
    returned (must be 0; drivers treat nonzero like patch overflow).
    """
    if fblk > 0 and not return_miss:
        raise ValueError("unary_costs: fblk > 0 requires return_miss=True "
                         "(the miss counter is the only signal that the "
                         "block-gather certificate failed)")
    K, L = rl.shape[0], rl.shape[1]
    P = patch_idx.shape[1]
    D = src_data.shape[0]

    # per-(k,l) patch rotation: current CP position -> label position
    # (computeUnaryCost, DiscreteCostFunction.cpp:378-383)
    rot = sph.rodrigues(jnp.broadcast_to(cp_coords[:, None, :], rl.shape), rl)

    pts = src_coords[patch_idx]                        # (K,P,3)
    src_patch = src_data[:, patch_idx]                 # (D,K,P)
    w_patch = cfweights[:, patch_idx]                  # (Dw,K,P)
    m = patch_mask.astype(src_data.dtype)

    use_blocked = fblk > 0 and tables.pristine_res >= 3 and limits is not None
    if use_blocked:
        from ..ops import blocked as blk_ops
        _, centres_np, caps_np = blk_ops.owner_tables(tables.pristine_res)
        centres = jnp.asarray(centres_np)
        caps = jnp.asarray(caps_np)
        # every query for CP k lies within limit_k of one of its rotated
        # label positions (the patch rotation maps cp -> rl exactly, and
        # arcs are rotation-invariant), so the selection radius around the
        # rl cloud is exactly the patch radius
        rlu = rl * jax.lax.rsqrt(
            jnp.maximum(jnp.sum(rl * rl, -1, keepdims=True), 1e-30))
        dmin = jnp.min(blk_ops._arc(
            jnp.einsum("kli,ni->kln", rlu, centres,
                       precision=jax.lax.Precision.HIGHEST)),
            axis=1)                                     # (K,nfb)
        hit = dmin < (limits[:, None] / RAD + caps[None, :]
                      + blk_ops._SEL_EPS)
        big = jnp.asarray(jnp.inf, dmin.dtype)
        dmm = jnp.where(hit, dmin, big)
        npad = (-dmm.shape[1]) % 128
        dmp = jnp.pad(dmm, ((0, 0), (0, npad)), constant_values=big)
        _, fb_sel = jax.lax.top_k(-dmp, fblk)           # (K,fblk)
        fb_ok = jnp.take_along_axis(dmp, fb_sel, axis=1) < big
        fb_sel = jnp.where(fb_ok, fb_sel, 0).astype(jnp.int32)
        fb_overflow = hit.sum(axis=1) > fblk            # (K,)
        fdb = target_data.T[tables.faces].reshape(-1, 64, 3, D)

    def per_lchunk(rot_c):
        # rot_c: (K,lc,3,3)
        if tables.pristine_res >= 0:
            # SoA rotate + fused resample: all arrays (K,lc,P) keep the
            # patch axis on the 128-wide lane dimension
            from ..ops.nearest import locate_bary_soa, resample_pristine_soa
            px = pts[:, None, :, 0]
            py = pts[:, None, :, 1]
            pz = pts[:, None, :, 2]
            r = rot_c[..., None]                               # (K,lc,3,3,1)
            qx = r[:, :, 0, 0] * px + r[:, :, 0, 1] * py + r[:, :, 0, 2] * pz
            qy = r[:, :, 1, 0] * px + r[:, :, 1, 1] * py + r[:, :, 1, 2] * pz
            qz = r[:, :, 2, 0] * px + r[:, :, 2, 1] * py + r[:, :, 2, 2] * pz
            if use_blocked:
                lc = rot_c.shape[1]
                fid, w0, w1, w2 = locate_bary_soa(qx, qy, qz,
                                                  tables.pristine_res)
                qmask = jnp.broadcast_to(patch_mask[:, None, :],
                                         (K, lc, P)).reshape(K, lc * P)
                vals, miss = blk_ops.gather_face_data_blocked(
                    fid.reshape(K, lc * P), w0.reshape(K, lc * P),
                    w1.reshape(K, lc * P), w2.reshape(K, lc * P),
                    qmask, fb_sel, fb_ok, fdb)
                tgt = vals.reshape(K, lc, P, D)
            else:
                miss = jnp.zeros((K,), jnp.int32)
                tgt = resample_pristine_soa(qx, qy, qz, tables, target_data)
        else:
            miss = jnp.zeros((K,), jnp.int32)
            tgt = None
        if tgt is None:
            rpts = jnp.einsum("klij,kpj->klpi", rot_c, pts,
                              precision=jax.lax.Precision.HIGHEST)
            tgt = _resample_target(rpts, tables, target_data)  # (K,lc,P,D)
        if mode == "univariate":
            a = jnp.broadcast_to(src_patch[0][:, None, :], tgt.shape[:3])
            b = tgt[..., 0]
            w = jnp.broadcast_to(w_patch[0][:, None, :], a.shape)
            mask = jnp.broadcast_to(m[:, None, :], a.shape)
            return simi.sim_for_min(a, b, w, mask, simval, percentile), miss
        if mode == "multivariate":
            # sim across the feature axis per vertex, mean over patch
            a = jnp.broadcast_to(src_patch.transpose(1, 2, 0)[:, None], tgt.shape)
            wd = w_patch.transpose(1, 2, 0)            # (K,P,Dw)
            if wd.shape[-1] != D:
                wd = jnp.broadcast_to(wd[..., :1], wd.shape[:-1] + (D,))
            w = jnp.broadcast_to(wd[:, None], tgt.shape)
            maskd = jnp.ones_like(a)
            per_vtx = simi.sim_for_min(a, tgt, w, maskd, simval, percentile)  # (K,lc,P)
            mm = m[:, None, :]
            cnt = jnp.maximum(mm.sum(-1), 1.0)
            return jnp.sum(per_vtx * mm, axis=-1) / cnt, miss
        if mode == "patchwise":
            # per-channel sim across patch, mean over channels
            a = src_patch.transpose(1, 0, 2)[:, None]          # (K,1,D,P)
            b = tgt.transpose(0, 1, 3, 2)                      # (K,lc,D,P)
            a = jnp.broadcast_to(a, b.shape)
            w = jnp.broadcast_to(w_patch[0][:, None, None, :], b.shape)
            mask = jnp.broadcast_to(m[:, None, None, :], b.shape)
            per_ch = simi.sim_for_min(a, b, w, mask, simval, percentile)  # (K,lc,D)
            return per_ch.mean(axis=-1), miss
        raise ValueError(mode)

    pad = (-L) % lchunk
    # edge-replicate the padded label slots: zero-padded rotations would send
    # padded queries to the origin, tripping the blocked-gather miss counter
    # with phantom misses (outputs for padded slots are sliced off either way)
    rot_p = jnp.pad(rot, ((0, 0), (0, pad), (0, 0), (0, 0)), mode="edge")
    chunks = rot_p.reshape(K, -1, lchunk, 3, 3).transpose(1, 0, 2, 3, 4)
    out, miss = jax.lax.map(per_lchunk, chunks)        # (nc,K,lc), (nc,K)
    out = out.transpose(1, 0, 2).reshape(K, -1)[:, :L]
    costs = abs_weights[:, None] * out
    if return_miss:
        overflow_or_miss = miss.sum(0) + (fb_overflow.astype(jnp.int32)
                                          if use_blocked else 0)
        return costs, overflow_or_miss
    return costs


# --------------------------------------------------------------------------
# triplet regulariser
# --------------------------------------------------------------------------

def triplet_combo_costs(rl, cp_coords, tables: LevelTables, la, lb, lc,
                        reglambda, mu, kappa, k_exp, rexp, fixnan=False,
                        lambda_scale=1.0):
    """Triplet cost for explicit per-triplet label choices.

    la/lb/lc: (T, C) label indices per triplet corner. Returns (T, C).
    Reproduces computeTripletCost (DiscreteCostFunction.cpp:135-188) for
    regmode 2/3 (spherical strain): folding gate vs the CURRENT CP grid,
    strain vs the level-start grid, cost = lambda * strain^rexp.
    `lambda_scale` covers the groupwise `subcorr` factor.
    """
    t = tables.triplets
    va = rl[t[:, 0][:, None], la]                      # (T,C,3)
    vb = rl[t[:, 1][:, None], lb]
    vc = rl[t[:, 2][:, None], lc]
    return triplet_costs_from_positions(
        va, vb, vc, cp_coords, tables, reglambda, mu, kappa, k_exp, rexp,
        fixnan=fixnan, lambda_scale=lambda_scale)


def triplet_costs_from_positions(va, vb, vc, cp_coords,
                                 tables: LevelTables, reglambda, mu, kappa,
                                 k_exp, rexp, fixnan=False,
                                 lambda_scale=1.0):
    """Strain triplet cost from explicit corner POSITIONS (T,C,3) — the
    shared body of triplet_combo_costs, also fed by the binary-move fast
    path that builds the 8 combos from 2 gathered positions per corner
    (the (T,8) label gathers were 94% of the fusion tables stage on-chip,
    scripts/profile_fusion.py round 5)."""
    t = tables.triplets
    cur = cp_coords[t]                                 # (T,3,3)
    n_cur = sph.tri_normal(cur[:, 0], cur[:, 1], cur[:, 2])    # (T,3)
    n_def = sph.tri_normal(va, vb, vc)
    folded = jnp.sum(n_def * n_cur[:, None, :], axis=-1) < 0.0

    orig = tables.orig_cp[t]                           # (T,3,3)
    orig_b = jnp.broadcast_to(orig[:, None], va.shape[:2] + (3, 3))
    deformed = jnp.stack([va, vb, vc], axis=-2)
    strain = triangular_strain(orig_b, deformed, mu, kappa, k_exp)
    cost = reglambda * lambda_scale * jnp.power(strain, rexp)
    if fixnan:
        cost = jnp.where(jnp.isnan(cost), FIX_NAN, cost)
    return jnp.where(folded, FOLDING * reglambda, cost)


def triplet_volume_arrays(rl, trip, cur, orig, reglambda, mu, kappa, k_exp,
                          rexp):
    """(Tc, L^3) strain cost block from explicit per-triplet arrays.
    trip (Tc,3) CP vertex ids into rl; cur/orig (Tc,3,3) current/level-start
    corner coords. Shardable over the leading axis."""
    L = rl.shape[1]
    la = jnp.repeat(jnp.arange(L), L * L)
    lb = jnp.tile(jnp.repeat(jnp.arange(L), L), L)
    lc = jnp.tile(jnp.arange(L), L * L)
    va = rl[trip[:, 0][:, None], la[None, :]]
    vb = rl[trip[:, 1][:, None], lb[None, :]]
    vc = rl[trip[:, 2][:, None], lc[None, :]]
    n_cur = sph.tri_normal(cur[:, 0], cur[:, 1], cur[:, 2])
    n_def = sph.tri_normal(va, vb, vc)
    folded = jnp.sum(n_def * n_cur[:, None, :], axis=-1) < 0.0
    orig_b = jnp.broadcast_to(orig[:, None], va.shape[:2] + (3, 3))
    deformed = jnp.stack([va, vb, vc], axis=-2)
    strain = triangular_strain(orig_b, deformed, mu, kappa, k_exp)
    cost = reglambda * jnp.power(strain, rexp)
    return jnp.where(folded, FOLDING * reglambda, cost)


@functools.partial(jax.jit, static_argnames=("tchunk",))
def triplet_cost_volume(rl, cp_coords, tables: LevelTables, reglambda, mu,
                        kappa, k_exp, rexp, tchunk: int = 256):
    """Full (T, L, L, L) strain cost volume for MCMC, chunked over T."""
    L = rl.shape[1]
    T = tables.triplets.shape[0]

    pad = (-T) % tchunk
    trip_p = jnp.pad(tables.triplets, ((0, pad), (0, 0)))
    cur_p = jnp.pad(cp_coords[tables.triplets], ((0, pad), (0, 0), (0, 0)))
    orig_p = jnp.pad(tables.orig_cp[tables.triplets], ((0, pad), (0, 0), (0, 0)))

    def body(args):
        t, cur, orig = args                            # (tc,3),(tc,3,3),(tc,3,3)
        return triplet_volume_arrays(rl, t, cur, orig, reglambda, mu, kappa,
                                     k_exp, rexp)

    n = trip_p.shape[0] // tchunk
    out = jax.lax.map(body, (trip_p.reshape(n, tchunk, 3),
                             cur_p.reshape(n, tchunk, 3, 3),
                             orig_p.reshape(n, tchunk, 3, 3)))
    return out.reshape(-1, L, L, L)[:T]


# --------------------------------------------------------------------------
# pairwise regulariser (regmode 1 / FastPD path)
# --------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("pchunk",))
def pairwise_cost_volume(rl, cp_coords, tables: LevelTables, reglambda, rexp,
                         pchunk: int = 128):
    """(Pr, L, L) rotation-difference regulariser with folding gate
    (computePairwiseCost, DiscreteCostFunction.cpp:190-226).

    Folding is checked on the faces incident to the pair's FIRST node with
    both endpoints moved, against the level-start grid normals — matching the
    reference's use of _oCPgrid."""
    L = rl.shape[1]
    Pr = tables.pairs.shape[0]
    eps = 1e-8

    rot_node = sph.rodrigues(
        jnp.broadcast_to(cp_coords[:, None, :], rl.shape), rl)   # (K,L,3,3)

    theta_mvd = 2.0 * jnp.arcsin(tables.mvd_max / (2.0 * RAD))
    cpf = tables.cp_faces
    o_n = sph.tri_normal(tables.orig_cp[cpf[:, 0]], tables.orig_cp[cpf[:, 1]],
                         tables.orig_cp[cpf[:, 2]])    # level-start normals

    pad = (-Pr) % pchunk
    pairs_p = jnp.pad(tables.pairs, ((0, pad), (0, 0)))

    def body(pr):
        i, j = pr[:, 0], pr[:, 1]                      # (pc,)
        r1 = rot_node[i]                               # (pc,L,3,3)
        r2 = rot_node[j]
        tr = jnp.einsum("paij,pbij->pab", r1, r2)      # trace(R1^T R2)
        cos_t = jnp.clip((tr - 1.0) / 2.0, -1.0, 1.0)
        theta = jnp.arccos(cos_t)
        smooth = reglambda * jnp.power(jnp.sqrt(2.0) * theta / theta_mvd, rexp)
        active = jnp.abs(1.0 - cos_t) > eps            # rotations differ

        # folding gate: faces incident to node i with endpoints i,j moved,
        # tested against the level-start normals (only when active)
        fidx = tables.cp_tri_idx[i]                    # (pc,MT)
        fv = cpf[jnp.clip(fidx, 0, cpf.shape[0] - 1)]  # (pc,MT,3)
        base = cp_coords[fv]                           # (pc,MT,3v,3)
        o_norm = o_n[jnp.clip(fidx, 0, cpf.shape[0] - 1)]

        pi = rl[i]                                     # (pc,L,3)
        pj = rl[j]
        is_i = (fv == i[:, None, None])                # (pc,MT,3v)
        is_j = (fv == j[:, None, None])
        # coords per (pc,MT,3v,La,Lb,3)
        out = jnp.broadcast_to(
            base[:, :, :, None, None, :],
            base.shape[:3] + (L, L, 3))
        out = jnp.where(is_i[..., None, None, None],
                        pi[:, None, None, :, None, :], out)
        out = jnp.where(is_j[..., None, None, None],
                        pj[:, None, None, None, :, :], out)
        n_new = sph.tri_normal(out[:, :, 0], out[:, :, 1], out[:, :, 2])
        dot = jnp.sum(n_new * o_norm[:, :, None, None, :], axis=-1)
        valid = (fidx >= 0)[:, :, None, None]
        fold_any = jnp.any((dot < 0.0) & valid, axis=1)    # (pc,L,L)
        return jnp.where(active, jnp.where(fold_any, FOLDING, smooth), 0.0)

    n = pairs_p.shape[0] // pchunk
    out = jax.lax.map(body, pairs_p.reshape(n, pchunk, 2))
    return out.reshape(-1, L, L)[:Pr]


# --------------------------------------------------------------------------
# triclique likelihood (--triclique)
# --------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("fmax",))
def build_face_patches(src_coords, cp_tables: SearchTables, fmax: int):
    """Assign each source vertex to its closest CP-grid face and invert to
    padded per-face index lists (HO get_source_data,
    DiscreteCostFunction.cpp:468-485).
    Returns (face_idx (F,fmax) i32, mask (F,fmax), overflow (F,))."""
    from ..ops.nearest import nearest_triangle
    F = cp_tables.faces.shape[0]
    N = src_coords.shape[0]
    face_of = nearest_triangle(src_coords, cp_tables)            # (N,)
    order = jnp.argsort(face_of, stable=True)
    f_sorted = face_of[order]
    counts = jax.ops.segment_sum(jnp.ones_like(f_sorted), f_sorted,
                                 num_segments=F)
    starts = jnp.cumsum(counts) - counts
    pos = jnp.arange(N) - starts[f_sorted].astype(jnp.int64 if N > 2**31 else jnp.int32)
    keep = pos < fmax
    flat = jnp.where(keep, f_sorted * fmax + pos, F * fmax)
    idx = jnp.full((F * fmax,), 0, jnp.int32).at[flat].set(
        order.astype(jnp.int32), mode="drop").reshape(F, fmax)
    mask = jnp.zeros((F * fmax,), bool).at[flat].set(True, mode="drop").reshape(F, fmax)
    return idx, mask, counts > fmax


def triclique_likelihood(cp_coords, rl, tables: LevelTables, face_idx,
                         face_mask, src_coords, abs_weights, cfweights,
                         la, lb, lc, simval: int, percentile=0.75,
                         multivariate: bool = False):
    """Triangular-patch likelihood (HO*::triplet_likelihood,
    DiscreteCostFunction.cpp:487-531 / :565-618): project each patch point
    onto the CURRENT CP triangle's plane, re-evaluate its barycentric
    position at the deformed corners, re-project to the sphere, resample the
    target there and compare with the source patch. la/lb/lc: (T,C).
    Returns (T,C)."""
    t = tables.triplets
    Pf = face_idx.shape[1]
    src_pts = src_coords[face_idx]                               # (T,Pf,3)

    cp0 = cp_coords[t[:, 0]][:, None, :]
    cp1 = cp_coords[t[:, 1]][:, None, :]
    cp2 = cp_coords[t[:, 2]][:, None, :]
    sp = sph.project_to_plane(src_pts, cp0, cp1, cp2)            # (T,Pf,3)

    # barycentric areas at sp wrt the CURRENT triangle (triangle.cpp:159-172)
    aa = sph.tri_area(sp, cp1, cp2)
    ab = sph.tri_area(sp, cp0, cp2)
    ac = sph.tri_area(sp, cp0, cp1)
    tot = aa + ab + ac
    tot = jnp.where(tot > 0, tot, 1.0)
    wa, wb, wc = aa / tot, ab / tot, ac / tot                    # (T,Pf)

    na = rl[t[:, 0][:, None], la]                                # (T,C,3)
    nb = rl[t[:, 1][:, None], lb]
    nc = rl[t[:, 2][:, None], lc]
    newp = (na[:, :, None, :] * wa[:, None, :, None]
            + nb[:, :, None, :] * wb[:, None, :, None]
            + nc[:, :, None, :] * wc[:, None, :, None])          # (T,C,Pf,3)
    newp = sph.normalize(newp) * RAD

    tgt = _resample_target(newp, tables.target_tables,
                           tables.target_data)                   # (T,C,Pf,D)
    src_patch = tables.source_data[:, face_idx]                  # (D,T,Pf)
    w_patch = cfweights[:, face_idx]                             # (Dw,T,Pf)
    m = face_mask.astype(tgt.dtype)

    if not multivariate:
        a = jnp.broadcast_to(src_patch[0][:, None, :], tgt.shape[:3])
        b = tgt[..., 0]
        w = jnp.broadcast_to(w_patch[0][:, None, :], a.shape)
        mask = jnp.broadcast_to(m[:, None, :], a.shape)
        sim = simi.sim_for_min(a, b, w, mask, simval, percentile)  # (T,C)
    else:
        D = tgt.shape[-1]
        a = jnp.broadcast_to(src_patch.transpose(1, 2, 0)[:, None], tgt.shape)
        wd = w_patch.transpose(1, 2, 0)
        if wd.shape[-1] != D:
            wd = jnp.broadcast_to(wd[..., :1], wd.shape[:-1] + (D,))
        w = jnp.broadcast_to(wd[:, None], tgt.shape)
        maskd = jnp.ones_like(a)
        per_vtx = simi.sim_for_min(a, tgt, w, maskd, simval, percentile)
        mm = m[:, None, :]
        cnt = jnp.maximum(mm.sum(-1), 1.0)
        sim = jnp.sum(per_vtx * mm, axis=-1) / cnt

    aw = (abs_weights[t[:, 0]] + abs_weights[t[:, 1]]
          + abs_weights[t[:, 2]])[:, None] / 3.0
    return aw * sim


# --------------------------------------------------------------------------
# anatomical (aMSM) regulariser, regmode 5
# --------------------------------------------------------------------------

class AnatTables(NamedTuple):
    """Static aMSM state (resample_anatomy, mesh_registration.cpp:250-332)."""
    lineage: jax.Array        # (T, Fd) descendant anat faces per CP face
    anat_faces: jax.Array     # (Ta,3) anat-ico faces
    anat_bary: jax.Array      # (Va,3) barycentric weights wrt parent CP tri
    anat_parent: jax.Array    # (Va,3) CP vertex ids the weights refer to
    anat_sphere: SearchTables  # pristine anat-res sphere (aICO)
    anat_target: jax.Array    # (Va,3) reference anatomical coords
    anat_orig: jax.Array      # (Va,3) input anatomical coords (resampled)


def anatomical_triplet_costs(cp_coords, rl, tables: LevelTables,
                             anat: AnatTables, la, lb, lc, reglambda, mu,
                             kappa, k_exp, rexp, fixnan=False):
    """regmode 5 triplet cost (computeTripletCost case 4/5 + deform_anatomy,
    DiscreteCostFunction.cpp:169-182,255-301): move anat vertices with the
    deformed CP corners via their subdivision barycentrics, re-project
    through the pristine anat sphere onto the reference anatomy, and average
    the strain of the descendant anatomical faces. Returns (T,C)."""
    from ..ops.nearest import barycentric_coords

    t = tables.triplets
    T, C = la.shape
    Fd = anat.lineage.shape[1]

    # folding gate on the CP triangle itself (same as spherical path)
    va = rl[t[:, 0][:, None], la]
    vb = rl[t[:, 1][:, None], lb]
    vc = rl[t[:, 2][:, None], lc]
    cur = cp_coords[t]
    n_cur = sph.tri_normal(cur[:, 0], cur[:, 1], cur[:, 2])
    n_def = sph.tri_normal(va, vb, vc)
    folded = jnp.sum(n_def * n_cur[:, None, :], axis=-1) < 0.0

    # anat vertices of the descendant faces: (T,Fd,3v)
    fv = anat.anat_faces[anat.lineage]
    wgt = anat.anat_bary[fv]                         # (T,Fd,3v,3w)
    par = anat.anat_parent[fv]                       # (T,Fd,3v,3w) CP ids

    # each anat vertex moves with its OWN parent face's corners: corners
    # belonging to this triplet take their deformed positions, others stay
    # at the current CP grid. (The reference zeroes mismatched corners via
    # std::map default-construction, a documented bug — deform_anatomy,
    # DiscreteCostFunction.cpp:255-301 "bugs expected"; keeping neighbours
    # fixed is the well-defined completion of the same semantics.)
    base = cp_coords[par]                            # (T,Fd,3v,3w,3)
    full_shape = la.shape[:2] + base.shape[1:]       # (T,C,Fd,3v,3w,3)
    newp = jnp.broadcast_to(base[:, None], full_shape)
    for corner, vdef in ((0, va), (1, vb), (2, vc)):
        is_c = (par == t[:, corner][:, None, None, None])   # (T,Fd,3v,3w)
        newp = jnp.where(is_c[:, None, ..., None],
                         vdef[:, :, None, None, None, :], newp)
    newp = jnp.sum(newp * wgt[:, None, ..., None], axis=-2)
    # newp: (T,C,Fd,3v,3) — NOT renormalised (reference keeps the raw
    # barycentric combination before the sphere lookup)

    flat = newp.reshape(-1, 3)
    tv, w = barycentric_coords(flat, anat.anat_sphere)
    trans = jnp.sum(anat.anat_target[tv] * w[..., None], axis=1)
    trans = trans.reshape(T, C, Fd, 3, 3)

    orig = anat.anat_orig[fv]                        # (T,Fd,3v,3)
    orig_b = jnp.broadcast_to(orig[:, None], trans.shape)
    strain = triangular_strain(orig_b, trans, mu, kappa, k_exp)  # (T,C,Fd)
    cost = strain.mean(axis=-1)
    cost = reglambda * jnp.power(cost, rexp)
    if fixnan:
        cost = jnp.where(jnp.isnan(cost), FIX_NAN, cost)
    return jnp.where(folded, FOLDING * reglambda, cost)
