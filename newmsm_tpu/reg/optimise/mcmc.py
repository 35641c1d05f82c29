"""Monte-Carlo label optimisation over triplets (mcmc_opt.h:29-134),
re-designed for parallel hardware.

The reference sweeps triplets sequentially, greedily taking the best of the
8 keep/replace combinations of one geometric-distributed proposal per
triplet. Here each sweep processes conflict-free *color groups* of triplets
in parallel (faces in a group share no vertex), with updates visible across
groups inside the sweep — same greedy dynamics, deterministic under a
counter-based PRNG (the reference uses an unseeded random_device; SURVEY §4
flags seeding as a required deviation for shard-invariance).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def truncated_geometric(key, p, num_labels, shape):
    """Geometric(p) truncated to [0, num_labels): the reference redraws until
    label < num_labels (mcmc_opt.h:52). Inverse-CDF sampling of the
    conditioned distribution is equivalent."""
    q = 1.0 - p
    u = jax.random.uniform(key, shape)
    total = 1.0 - jnp.power(q, num_labels)
    k = jnp.floor(jnp.log1p(-u * total) / jnp.log(q)).astype(jnp.int32)
    return jnp.clip(k, 0, num_labels - 1)


# combination table: per case, does each corner take the proposal?
# (mcmc_opt.h:58-122) — index bit order (A,B,C), case c = (a<<2)|(b<<1)|c
_TAKE = jnp.array([[0, 0, 0], [0, 0, 1], [0, 1, 0], [0, 1, 1],
                   [1, 0, 0], [1, 0, 1], [1, 1, 0], [1, 1, 1]], jnp.int32)


@functools.partial(jax.jit,
                   static_argnames=("mciters", "num_labels", "proposals"))
def mcmc_optimise(labeling, unary, tcosts, triplets, groups, group_mask,
                  key, mciters: int, num_labels: int, dist_param=0.8,
                  proposals: int = 1):
    """Run `mciters` per-triplet proposal draws (the reference's sweep
    count, mesh_registration.cpp:712).

    labeling: (K,) int32; unary: (L,K) label-major as the reference stores it;
    tcosts: (T,L,L,L); triplets: (T,3); groups/group_mask: (C,G) triplet ids
    per color. Returns final labeling.

    Throughput design: everything loop-invariant is hoisted out of the
    sweep, the dense 4-D triplet-cost lookup becomes a ROW gather — the 8
    keep/replace combinations are the corners of a {cur,prop}^3 cube, so the
    4 contiguous (t,la,lb,:) rows cover all of them and the lc selection
    happens in-register via one-hot contraction (random element gathers from
    the multi-MB cost volume are ~3x slower on TPU) — and the per-sweep PRNG
    is one batched draw for ALL color groups.

    `proposals` (R): evaluate R geometric draws per triplet per color step
    and greedily take the best of the R*8 keep/replace combinations. The
    per-sweep cost is dominated by the sequential 9-color latency chain
    (~7 ms per dispatched sweep at CP-3/L=19 on one v5e, measured
    single-dispatch over 4000 sweeps — rounds 1-2's "0.50 ms/sweep" was a
    differential-timing artifact), so blocking R draws into one step
    retires R proposals at near-constant step latency: measured 0.88 ms
    per draw at R=8 and 0.117 ms at R=128, taking the reference default
    mciters=100000 from ~690 s to ~12 s. R=1 is exactly the reference's
    one-draw-per-sweep schedule; R>1 draws the same distribution in blocks
    (documented deviation: greedy best-of-block instead of greedy
    per-draw — equal or lower energy per draw).
    """
    n_colors, G = groups.shape
    K = labeling.shape[0]
    L = num_labels
    R = proposals
    n_sweeps = -(-mciters // R)

    # static per-call tables (hoisted: computed once per program, not per sweep)
    t_safe = jnp.where(group_mask, groups, 0)              # (C,G)
    corners = triplets[t_safe]                             # (C,G,3)
    scatter_idx = jnp.where(group_mask[..., None], corners,
                            K).reshape(n_colors, G * 3)    # (C,3G) K=dropped
    trows = tcosts.reshape(-1, L)                          # row = (t,la,lb,:)
    urows = unary.T                                        # (K,L)
    eye = jnp.eye(L, dtype=tcosts.dtype)

    def sweep(i, carry):
        labeling, key = carry
        sub = jax.random.fold_in(key, i)
        props = truncated_geometric(sub, dist_param, L,
                                    (n_colors, G, R))      # (C,G,R)

        def do_color(c, labeling):
            prop = props[c]                                # (G,R)
            nabc = corners[c]                              # (G,3)
            cur = labeling[nabc]                           # (G,3)  [gather 1]
            curR = jnp.broadcast_to(cur[:, None, :], (G, R, 3))
            la2 = jnp.stack([curR[..., 0], prop], -1)      # (G,R,2)
            lb2 = jnp.stack([curR[..., 1], prop], -1)
            lc2 = jnp.stack([curR[..., 2], prop], -1)
            # 4 cost rows per (triplet, draw): (la,lb) in {cur,p_r}^2
            rows = ((t_safe[c][:, None, None, None] * L
                     + la2[..., :, None]) * L
                    + lb2[..., None, :])                   # (G,R,2,2)
            tr = trows[rows.reshape(G, R * 4)].reshape(G, R, 2, 2, L)
            oh_c = eye[lc2]                                # (G,R,2,L)
            tc = jnp.einsum("grabl,grcl->grabc", tr, oh_c).reshape(G, R * 8)
            # unary rows per corner node, labels selected in-register
            ur = urows[nabc]                               # (G,3,L) [gather 3]
            oh_a = eye[la2]
            oh_b = eye[lb2]
            ua = jnp.einsum("gl,gral->gra", ur[:, 0], oh_a)  # (G,R,2)
            ub = jnp.einsum("gl,grbl->grb", ur[:, 1], oh_b)
            uc = jnp.einsum("gl,grcl->grc", ur[:, 2], oh_c)
            un = (ua[..., :, None, None] + ub[..., None, :, None]
                  + uc[..., None, None, :]).reshape(G, R * 8) / 3.0
            # combo bit order (a,b,c): idx = r*8 + a*4 + b*2 + c,
            # bit=1 -> take draw r's proposal
            best = jnp.argmin(tc + un, axis=1)             # (G,)
            r_sel = best // 8
            combo = best % 8
            bits = jnp.stack([combo // 4, (combo // 2) % 2, combo % 2], 1)
            p_sel = jnp.take_along_axis(prop, r_sel[:, None], axis=1)
            newl = jnp.where(bits == 1,
                             jnp.broadcast_to(p_sel, (G, 3)), cur)
            # corners within a color are disjoint -> conflict-free [scatter]
            return labeling.at[scatter_idx[c]].set(
                newl.reshape(-1), mode="drop")

        labeling = jax.lax.fori_loop(0, n_colors, do_color, labeling)
        return labeling, key

    labeling, key = jax.lax.fori_loop(0, n_sweeps, sweep, (labeling, key))
    return labeling


@jax.jit
def total_energy(labeling, unary, tcosts, triplets):
    """evaluateTotalCostSum for the triplet MRF
    (DiscreteCostFunction.cpp:55-77). unary is (L,K) label-major."""
    un = jnp.sum(unary[labeling, jnp.arange(labeling.shape[0])])
    tc = jnp.sum(tcosts[jnp.arange(triplets.shape[0]),
                        labeling[triplets[:, 0]],
                        labeling[triplets[:, 1]],
                        labeling[triplets[:, 2]]])
    return un + tc
