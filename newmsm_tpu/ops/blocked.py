"""Block-contiguous gathers for the unary hot path.

The unary kernel's two remaining bottlenecks (round-4 on-chip profile,
docs/PERFORMANCE.md) are gather issue rate, not bandwidth or FLOPs:

  1. build_patches gathered ~0.5M candidate-coordinate rows per call, and
  2. the target resample gathered one 12-byte face-data row per
     (CP,label,point) query — 1.17M rows at the bench shape.

TPU row gathers sustain ~240M rows/s regardless of row size, so the fix is
fewer, larger rows. The icosphere subdivision numbering makes that possible:
face ids are emitted depth-first (child k of face f is 4f+k,
core/icosphere._retessellate), so **64 consecutive face ids form exactly the
descendant set of one level-(res-3) ancestor face** — a spatially tight cap
(max radius 0.19 rad at ico-5). This module exploits that two ways:

  * **Patch building** (`build_patches_blocked`): each vertex is assigned to
    the block of its first containing face ("owner block", ≤45 owners per
    block). Per control point, the blocks whose cap intersects the in-range
    ball are selected (a tiny dense distance + top-B), then candidate
    coordinates arrive as (B, G, 3) contiguous block rows instead of
    per-vertex rows. Block centres/caps are recomputed per call FROM THE
    DEFORMED coordinates, so the cover certificate
    (arc(cp,v) < limit  =>  arc(cp,centre_b) < limit + cap_b)
    is exact for any warp — no pristine-geometry assumption. Overflowing the
    static block budget B is reported, never silently truncated.

  * **Resample data gather** (`gather_face_data_blocked`): for the pristine
    target the located face id's high bits (fid >> 6) name the block; the
    per-CP block list turns the 1.17M-row gather into a (K·B)-row block
    gather plus two tiny one-hot contractions that run on the MXU:
    value[q] = sum_b onehot(block_q==blk[b]) * (W[q,:] @ fdb[b]) with
    W the (64*3)-wide weighted sub-index one-hot. Queries are certified to
    land in selected blocks (a query is inside its located face, whose
    vertices bound the block cap); a miss counter is still returned so the
    no-silent-caps discipline holds end to end.

Reference work unit: DiscreteCostFunction.cpp:353-383 (patch gather + octree
resample per (CP,label)); octree.cpp:156-214.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

RAD = 100.0
_G = 48          # owner-group padding (measured max owners = 45, all res)
_BLOCK = 64      # faces per block == one level-(res-3) ancestor subtree


@functools.lru_cache(maxsize=None)
def owner_tables(res: int):
    """Static per-resolution tables (numpy, host-cached):
    vgroup (nfb, G) i32 — vertex ids owned by each face block, -1 padded;
    centres (nfb, 3) f32 — pristine block cap centres (unit);
    caps (nfb,) f32 — pristine arc cap radius covering every VERTEX of every
    face in the block (hence every point of every face: a spherical cap is
    geodesically convex for radius < pi/2)."""
    from ..core.icosphere import icosphere
    ico = icosphere(res)
    c = np.asarray(ico.coords, np.float64)
    c = c / np.linalg.norm(c, axis=1, keepdims=True)
    F = np.asarray(ico.faces, np.int64)
    T = F.shape[0]
    nfb = -(-T // _BLOCK)
    first_face = np.full(c.shape[0], 1 << 30, np.int64)
    for j in range(3):
        np.minimum.at(first_face, F[:, j], np.arange(T))
    owner_blk = first_face >> 6
    # diagnose overflow BEFORE filling: the in-loop store would raise a
    # bare IndexError first and the descriptive error would never surface
    # (ADVICE r4)
    counts = np.bincount(owner_blk, minlength=nfb)
    if counts.max() > _G:
        raise AssertionError(f"owner group overflow: {counts.max()} > {_G}")
    vgroup = np.full((nfb, _G), -1, np.int32)
    fill = np.zeros(nfb, np.int32)
    for v, b in enumerate(owner_blk):
        vgroup[b, fill[b]] = v
        fill[b] += 1
    fv = c[F].reshape(T, 3, 3)
    centres = np.zeros((nfb, 3))
    caps = np.zeros(nfb)
    for b in range(nfb):
        pts = fv[b * _BLOCK:(b + 1) * _BLOCK].reshape(-1, 3)
        ctr = pts.mean(0)
        ctr /= np.linalg.norm(ctr)
        centres[b] = ctr
        caps[b] = np.arccos(np.clip(pts @ ctr, -1.0, 1.0)).max()
    return (vgroup, centres.astype(np.float32),
            (caps + 1e-6).astype(np.float32))


def suggest_block_budget(res: int, limit_arc: float, margin: float = 0.05,
                         minimum: int = 8) -> int:
    """Host-side static block budget B for a selection radius `limit_arc`
    (radians): the max over a dense set of query points x of
    |{b : arc(x, centre_b) < limit_arc + cap_b + margin}| — exactly the
    runtime hit criterion — rounded up to 8. Query points = the block
    centres plus the res-min(res,3) icosphere vertices (cap-boundary worst
    cases sit between centres). The runtime overflow flag still guards the
    (deformation-driven) residual risk; `margin` absorbs moderate warps and
    the runtime safety slack without a regrow."""
    from ..core.icosphere import icosphere
    _, centres, caps = owner_tables(res)
    v = icosphere(min(res, 3)).coords
    v = v / np.linalg.norm(v, axis=1, keepdims=True)
    x = np.concatenate([centres, v.astype(np.float32)])
    d = np.arccos(np.clip(x @ centres.T, -1.0, 1.0))
    hit = d < (limit_arc + caps[None, :] + margin)
    need = int(hit.sum(axis=1).max())
    need = max(minimum, min(centres.shape[0], need))
    return -(-need // 8) * 8


def _unit(x):
    return x * jax.lax.rsqrt(jnp.maximum(jnp.sum(x * x, -1, keepdims=True),
                                         1e-30))


def _arc(cosv):
    return jnp.arccos(jnp.clip(cosv, -1.0, 1.0))


def deformed_block_geometry(src_coords, vgroup):
    """Per-call block centres/caps from the DEFORMED source coordinates.
    src_coords (N,3); vgroup (nfb,G). Returns (grp_xyz (nfb,G,3) unit,
    valid (nfb,G) bool, centres (nfb,3) unit, caps (nfb,) arc radians)."""
    valid = vgroup >= 0
    grp = src_coords[jnp.maximum(vgroup, 0)]            # (nfb,G,3) row gather
    gu = _unit(grp)
    vm = valid[..., None].astype(gu.dtype)
    ctr = _unit(jnp.sum(gu * vm, axis=1))               # (nfb,3)
    cosd = jnp.sum(gu * ctr[:, None, :], axis=-1)
    caps = jnp.max(jnp.where(valid, _arc(cosd), 0.0), axis=1) + 1e-6
    return grp, valid, ctr, caps


# safety slack (radians) on block-selection hit tests: covers f32 rounding of
# the arccos/matmul chain with orders of magnitude to spare (the budget
# margin in suggest_block_budget already accounts for it)
_SEL_EPS = 2e-3


def select_blocks(qunit, radii_arc, centres, caps, B: int):
    """Blocks whose cap intersects each query ball. qunit (K,3) unit;
    radii_arc (K,); centres (nfb,3); caps (nfb,). Returns (blk (K,B) i32
    nearest-first, sel (K,B) bool, overflow (K,) bool)."""
    # HIGHEST: bf16 MXU noise on unit dots is ~2e-3 of cos, far above the
    # selection slack
    d = _arc(jnp.matmul(qunit, centres.T,
                        precision=jax.lax.Precision.HIGHEST))   # (K,nfb)
    hit = d < (radii_arc[:, None] + caps[None, :] + _SEL_EPS)
    big = jnp.asarray(jnp.inf, d.dtype)
    dm = jnp.where(hit, d, big)
    npad = (-dm.shape[1]) % 128
    dmp = jnp.pad(dm, ((0, 0), (0, npad)), constant_values=big)
    _, blk = jax.lax.top_k(-dmp, B)                     # (K,B)
    sel = jnp.take_along_axis(dmp, blk, axis=1) < big
    overflow = hit.sum(axis=1) > B
    return jnp.where(sel, blk, 0).astype(jnp.int32), sel, overflow


@functools.partial(jax.jit, static_argnames=("pmax", "res", "B"))
def build_patches_blocked(cp_coords, src_coords, maxsep, cprange,
                          pmax: int, res: int, B: int):
    """Drop-in replacement for costs.build_patches (same contract: idx
    (K,pmax) nearest-first, mask (K,pmax), overflow (K,)) using owner-block
    candidate gathers. Exact in-range semantics for ANY deformation:
    the cover certificate uses block caps computed from the deformed
    coordinates themselves."""
    vgroup, _, _ = owner_tables(res)
    vgroup = jnp.asarray(vgroup)
    grp, valid, ctr, caps = deformed_block_geometry(src_coords, vgroup)

    limit = cprange * maxsep                            # (K,) units at RAD
    limit_arc = limit / RAD
    qu = _unit(cp_coords)
    blk, sel, ovf_b = select_blocks(qu, limit_arc, ctr, caps, B)

    cand_ids = vgroup[blk]                              # (K,B,G) row gather
    cand_xyz = grp[blk]                                 # (K,B,G,3) row gather
    ok = valid[blk] & sel[..., None]                    # (K,B,G)

    diff = cand_xyz - cp_coords[:, None, None, :]
    chord = jnp.sqrt(jnp.maximum(jnp.sum(diff * diff, -1), 0.0))
    dist = 2.0 * RAD * jnp.arcsin(jnp.clip(chord / (2.0 * RAD), -1.0, 1.0))
    K = cp_coords.shape[0]
    dist = jnp.where(ok, dist, jnp.inf).reshape(K, -1)  # (K,B*G)
    flat_ids = jnp.maximum(cand_ids, 0).reshape(K, -1)

    npad = (-dist.shape[1]) % 128
    distp = jnp.pad(dist, ((0, 0), (0, npad)), constant_values=jnp.inf)
    _, sel_q = jax.lax.top_k(-distp, pmax)              # (K,pmax)
    sel_q = jnp.minimum(sel_q, dist.shape[1] - 1)
    idx = jnp.take_along_axis(flat_ids, sel_q, axis=1)
    d_sel = jnp.take_along_axis(dist, sel_q, axis=1)
    mask = d_sel < limit[:, None]
    # guarded overflow count mirrors build_patches' dense path
    guard = 1e-2
    overflow = ((dist < limit[:, None] + guard).sum(axis=1) > pmax) | ovf_b
    return idx.astype(jnp.int32), mask, overflow


def gather_face_data_blocked(fid, w0, w1, w2, qmask, blk, sel,
                             face_data_blocks):
    """Resolve located faces to barycentric-interpolated target values via
    per-CP block tables (MXU one-hot contraction instead of 1-row-per-query
    gathers).

    fid/w0/w1/w2/qmask: (K, Q) — located face id, barycentric weights, and
    validity of each query (padded patch slots are excluded from the miss
    count). blk/sel: (K, B) selected target blocks per CP.
    face_data_blocks: (nfb, 64, 3, D) — target face-major data, reshaped so
    one block row is contiguous.

    Returns (vals (K, Q, D), miss (K,) int32 — queries whose block was not
    selected; certified to be 0, counted anyway)."""
    K, Q = fid.shape
    B = blk.shape[1]
    D = face_data_blocks.shape[-1]
    dt = w0.dtype

    fdb = face_data_blocks[blk]                       # (K,B,64,3,D) row gather
    bid = fid >> 6
    sub = fid & 63

    oh_b = ((bid[:, :, None] == blk[:, None, :]) & sel[:, None, :])  # (K,Q,B)
    miss = jnp.sum((~jnp.any(oh_b, axis=2)) & qmask, axis=1,
                   dtype=jnp.int32)                   # (K,)

    # sub-index one-hot (exact 0/1), contracted against the block tables on
    # the MXU: tmp[k,q,b,c] = oh_m[k,q,:] @ fdb[k,b,:,c] with c = (corner,
    # dim). One 64-wide contraction (not the 192-wide weighted form: the
    # weighted one-hot operand costs 3x the bytes of oh_m and its HBM
    # traffic dominated the kernel on-chip)
    m_iota = jax.lax.broadcasted_iota(jnp.int32, (K, Q, 64), 2)
    oh_m = (sub[:, :, None] == m_iota).astype(dt)     # (K,Q,64)
    fdb2 = fdb.reshape(K, B, 64, 3 * D)
    tmp = jnp.einsum("kqm,kbmc->kqbc", oh_m, fdb2,
                     precision=jax.lax.Precision.HIGHEST)      # (K,Q,B,3D)
    sel3 = jnp.sum(tmp * oh_b[..., None].astype(dt), axis=2)   # (K,Q,3D)
    sel3 = sel3.reshape(K, Q, 3, D)
    w = jnp.stack([w0, w1, w2], axis=-1)              # (K,Q,3)
    vals = jnp.sum(sel3 * w[..., None], axis=2)       # (K,Q,D)
    return vals, miss
