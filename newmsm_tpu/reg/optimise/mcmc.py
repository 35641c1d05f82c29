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


@functools.partial(jax.jit, static_argnames=("mciters", "num_labels"))
def mcmc_optimise(labeling, unary, tcosts, triplets, groups, group_mask,
                  key, mciters: int, num_labels: int, dist_param=0.8):
    """Run `mciters` sweeps.

    labeling: (K,) int32; unary: (L,K) label-major as the reference stores it;
    tcosts: (T,L,L,L); triplets: (T,3); groups/group_mask: (C,G) triplet ids
    per color. Returns final labeling.
    """
    n_colors = groups.shape[0]
    L = num_labels

    def eval_combo(labels_a, labels_b, labels_c, t_ids):
        na = triplets[t_ids, 0]
        nb = triplets[t_ids, 1]
        nc = triplets[t_ids, 2]
        tc = tcosts[t_ids, labels_a, labels_b, labels_c]
        un = (unary[labels_a, na] + unary[labels_b, nb] + unary[labels_c, nc]) / 3.0
        return tc + un

    def sweep(i, carry):
        labeling, key = carry

        def do_color(c, carry):
            labeling, key = carry
            key, sub = jax.random.split(key)
            t_ids = groups[c]                           # (G,)
            gmask = group_mask[c]
            t_safe = jnp.where(gmask, t_ids, 0)
            prop = truncated_geometric(sub, dist_param, L, t_ids.shape)

            na = triplets[t_safe, 0]
            nb = triplets[t_safe, 1]
            nc = triplets[t_safe, 2]
            cur_a = labeling[na]
            cur_b = labeling[nb]
            cur_c = labeling[nc]

            # 8 combinations (G,8)
            la = jnp.where(_TAKE[None, :, 0] == 1, prop[:, None], cur_a[:, None])
            lb = jnp.where(_TAKE[None, :, 1] == 1, prop[:, None], cur_b[:, None])
            lc = jnp.where(_TAKE[None, :, 2] == 1, prop[:, None], cur_c[:, None])
            costs = eval_combo(la, lb, lc, t_safe[:, None])
            best = jnp.argmin(costs, axis=1)            # (G,)

            new_a = jnp.take_along_axis(la, best[:, None], 1)[:, 0]
            new_b = jnp.take_along_axis(lb, best[:, None], 1)[:, 0]
            new_c = jnp.take_along_axis(lc, best[:, None], 1)[:, 0]

            # within a color group corners are disjoint -> conflict-free scatter
            lab = labeling
            lab = lab.at[jnp.where(gmask, na, lab.shape[0])].set(
                jnp.where(gmask, new_a, 0), mode="drop")
            lab = lab.at[jnp.where(gmask, nb, lab.shape[0])].set(
                jnp.where(gmask, new_b, 0), mode="drop")
            lab = lab.at[jnp.where(gmask, nc, lab.shape[0])].set(
                jnp.where(gmask, new_c, 0), mode="drop")
            return lab, key

        return jax.lax.fori_loop(0, n_colors, do_color, (labeling, key))

    labeling, key = jax.lax.fori_loop(0, mciters, sweep, (labeling, key))
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
