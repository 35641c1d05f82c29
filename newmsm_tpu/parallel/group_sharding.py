"""Multi-chip groupwise registration: subject sharding over a device mesh.

The groupwise MRF's natural distribution axis is subjects (SURVEY §2.7):
per-subject state (label-deformed template maps (S,L,D,Nt), CP coords
(S,K,3), triplet strain terms) lives on the subject's device; cross-subject
pair costs need every pair of subjects' maps, provided by an all_gather of
the (L,D,Nt) blocks over ICI; energies and node-label cost tables reduce
with psum so every device applies identical label updates.

This module provides the sharded one-iteration step used by
__graft_entry__.dryrun_multichip and (in tests) the shard-count invariance
check: results are independent of the device count because the psum'd
cost tables are exact.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core import spherical as sph
from ..ops.strain import triangular_strain
from ..ops import similarity as simi

RAD = 100.0
FOLDING = 1e7


class GroupStepStatics(NamedTuple):
    """Replicated static tables for the sharded step."""
    cp_faces: jax.Array       # (Tcp,3) sorted
    orig_cp: jax.Array        # (K,3)
    tmpl_coords: jax.Array    # (Nt,3)
    centre: jax.Array         # (3,)
    labels: jax.Array         # (L,3)
    vgroups: jax.Array        # (C,G) CP-vertex color groups (per subject)
    vgroup_mask: jax.Array    # (C,G)
    pair_partner: jax.Array   # (S,S,K) partner CP vertex of (a,b,v)
    mu: float
    kappa: float
    k_exp: float
    rexp: float
    reglambda: float
    simval: int
    pmax: int
    cprange: float


def make_group_step(mesh: Mesh, statics: GroupStepStatics, n_subjects: int):
    """Build the jitted subject-sharded one-iteration label update.

    Inputs at call time:
      maps      (S,L,D,Nt)  subject-sharded label-deformed feature maps
      cp        (S,K,3)     subject-sharded control grids
      spacings  (S,K)       subject-sharded per-CP spacings
      labeling  (S*K,)      replicated current labels

    Returns the updated (replicated) labeling. Cross-subject pair terms use
    an all_gather of maps/cp over the 'subjects' axis; per-(node,label) cost
    tables psum over shards; updates are applied color-group-sequentially so
    every device stays bit-identical.
    """
    st = statics
    S = n_subjects
    K = st.orig_cp.shape[0]
    L = st.labels.shape[0]
    n_local = S // mesh.shape["subjects"]

    def local_node_costs(maps_all, cp_all, spac_all, cp_loc, spac_loc, lab, shard):
        """(n_local*K, L) cost of assigning each label to each local node,
        with all other nodes at `lab`."""
        # rotated label positions for local subjects: (nl,K,L,3)
        rots = sph.rodrigues(
            jnp.broadcast_to(st.centre, cp_loc.shape), cp_loc)
        rl_loc = jnp.einsum("skij,lj->skli", rots, st.labels)

        # rl for ALL subjects at their CURRENT labels (needed as the fixed
        # context of triplet corners): (S,K,3)
        rots_all = sph.rodrigues(
            jnp.broadcast_to(st.centre, cp_all.shape), cp_all)
        rl_all = jnp.einsum("skij,lj->skli", rots_all, st.labels)
        lab_sk = lab.reshape(S, K)
        cur_pos = jnp.take_along_axis(
            rl_all, lab_sk[:, :, None, None].repeat(3, -1), axis=2)[:, :, 0, :]

        # --- triplet terms (subject-local) --------------------------------
        # for each local subject s, face t=(a,b,c), label l at corner j:
        # strain of the triangle with corner j moved to rl_loc[s,corner,l]
        tf = st.cp_faces                                   # (T,3)
        subj_ids = shard * n_local + jnp.arange(n_local)
        cur_loc = cur_pos[subj_ids]                        # (nl,K,3)

        def corner_cost(corner):
            own = tf[:, corner]                            # (T,)
            others = jnp.stack([tf[:, j] for j in range(3) if j != corner], 1)
            vo = cur_loc[:, others]                        # (nl,T,2,3)
            vown = rl_loc[:, own]                          # (nl,T,L,3)
            v_all = jnp.concatenate([
                vown[:, :, :, None, :],
                jnp.broadcast_to(vo[:, :, None, :, :],
                                 vo.shape[:2] + (L, 2, 3))], axis=3)
            # reorder to face order (corner position)
            order = {0: [0, 1, 2], 1: [1, 0, 2], 2: [1, 2, 0]}[corner]
            verts = v_all[:, :, :, order, :]               # (nl,T,L,3,3)
            cur_tri = cp_all[subj_ids][:, tf]              # (nl,T,3,3)
            n_cur = sph.tri_normal(cur_tri[..., 0, :], cur_tri[..., 1, :],
                                   cur_tri[..., 2, :])
            n_def = sph.tri_normal(verts[..., 0, :], verts[..., 1, :],
                                   verts[..., 2, :])
            folded = jnp.sum(n_def * n_cur[:, :, None, :], -1) < 0
            orig = jnp.broadcast_to(st.orig_cp[tf][None, :, None],
                                    verts.shape)
            strain = triangular_strain(orig, verts, st.mu, st.kappa, st.k_exp)
            cost = 0.1 * S * st.reglambda * jnp.power(strain, st.rexp)
            return jnp.where(folded, FOLDING, cost)        # (nl,T,L)

        node_cost = jnp.zeros((n_local, K, L))
        for corner in range(3):
            node_cost = node_cost.at[:, tf[:, corner]].add(corner_cost(corner))

        # --- cross-subject pair terms -------------------------------------
        # for each local subject a, vertex v, label l: cost vs every other
        # subject b at b's current label, over A's template patch
        def pair_cost_for(a_local):
            a = shard * n_local + a_local
            rl_a = rl_loc[a_local]                         # (K,L,3)
            d2 = (jnp.sum(st.tmpl_coords**2, 1)[None, None, :]
                  - 2.0 * rl_a @ st.tmpl_coords.T
                  + jnp.sum(rl_a**2, -1)[..., None])
            dist = 2 * RAD * jnp.arcsin(
                jnp.clip(jnp.sqrt(jnp.maximum(d2, 0)) / (2 * RAD), -1, 1))
            npad = (-dist.shape[-1]) % 128   # lane-align top_k axis
            dp = jnp.pad(dist, [(0, 0)] * (dist.ndim - 1) + [(0, npad)],
                         constant_values=jnp.inf)
            neg, idx = jax.lax.top_k(-dp, st.pmax)         # (K,L,pmax)
            idx = jnp.minimum(idx, dist.shape[-1] - 1)
            rng_a = (-neg) < (st.cprange * spac_all[a])[:, None, None]
            da = maps_all[a]                               # (L,D,Nt)
            data_a = da[jnp.arange(L)[None, :, None, None],
                        jnp.arange(da.shape[1])[None, None, :, None],
                        idx[:, :, None, :]]                # (K,L,D,pmax)

            total = jnp.zeros((K, L))
            for b in range(S):
                partner = st.pair_partner[a, b]            # (K,)
                lab_b = lab_sk[b, partner]                 # (K,)
                pos_b = cur_pos[b, partner]                # (K,3)
                chord = jnp.linalg.norm(
                    st.tmpl_coords[idx] - pos_b[:, None, None, :], axis=-1)
                db = 2 * RAD * jnp.arcsin(jnp.clip(chord / (2 * RAD), -1, 1))
                rng_b = db < (st.cprange * spac_all[b, partner])[:, None, None]
                overlap = (rng_a & rng_b)[:, :, None, :]
                db_dat = maps_all[b, lab_b[:, None, None, None],
                                  jnp.arange(da.shape[1])[None, None, :, None],
                                  idx[:, :, None, :]]
                m = jnp.broadcast_to(overlap, data_a.shape).astype(data_a.dtype)
                w = jnp.ones_like(data_a)
                per_dim = simi.sim_for_min(data_a, db_dat, w, m, st.simval)
                cost_b = per_dim.mean(-1)                  # (K,L)
                total = total + jnp.where(b == a, 0.0, cost_b)
            return total

        pair_costs = jnp.stack([pair_cost_for(al) for al in range(n_local)])
        return node_cost + pair_costs                      # (nl,K,L)

    def step(maps_loc, cp_loc, spac_loc, labeling):
        shard = jax.lax.axis_index("subjects")
        maps_all = jax.lax.all_gather(maps_loc, "subjects", tiled=True)
        cp_all = jax.lax.all_gather(cp_loc, "subjects", tiled=True)
        spac_all = jax.lax.all_gather(spac_loc, "subjects", tiled=True)

        local = local_node_costs(maps_all, cp_all, spac_all, cp_loc, spac_loc,
                                 labeling, shard)          # (nl,K,L)
        # scatter into the global table and psum so all devices see all nodes
        table = jnp.zeros((S, K, L))
        subj_ids = shard * n_local + jnp.arange(n_local)
        table = table.at[subj_ids].set(local)
        table = jax.lax.psum(table, "subjects").reshape(S * K, L)

        # greedy color-group update (identical on every device)
        def do_color(c, lab):
            nodes_v = statics.vgroups[c]
            gmask = statics.vgroup_mask[c]
            # apply to this CP-vertex color in EVERY subject simultaneously
            # (cross-subject pairs link different subjects, but the psum'd
            # table already includes their current-label context)
            full_nodes = (jnp.arange(S)[:, None] * K
                          + jnp.where(gmask, nodes_v, 0)[None, :])
            best = jnp.argmin(table[full_nodes], axis=-1)
            return lab.at[jnp.where(gmask[None, :], full_nodes, S * K)].set(
                jnp.where(gmask[None, :], best, 0), mode="drop")

        labeling = jax.lax.fori_loop(0, statics.vgroups.shape[0], do_color,
                                     labeling)
        return labeling

    from jax import shard_map
    pspec = P("subjects")
    return jax.jit(shard_map(
        step, mesh=mesh,
        in_specs=(pspec, pspec, pspec, P()),
        out_specs=P(),
        check_vma=False,
    ))
