"""Multi-chip pairwise registration: cost-volume sharding over a device mesh.

The pairwise MRF has no subject axis; its scale-out axes are the cost-volume
rows (SURVEY §2.7 / §5 "long-context"): control-point vertices for the unary
(K,L) volume and CP faces for the triplet (T,L^3) volume. Both are
embarrassingly row-parallel: each chip owns a contiguous row range, the
(small) source/target tables are replicated, and the only collective is the
implicit all-gather of the sharded output — there is no halo because patches
gather from the replicated source arrays.

Reference counterpart: the OpenMP `parallel for` over CP vertices/triplets
(DiscreteCostFunction.cpp:240,246) — here the "threads" are chips.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..reg import costs as C


def pad_rows(arr, n_shards: int, fill=None):
    """Pad the leading axis to a multiple of n_shards (shard_map needs equal
    shards; K=642 etc. are not multiples of 8). Padding repeats the last row
    unless `fill` is given."""
    n = arr.shape[0]
    pad = (-n) % n_shards
    if pad == 0:
        return arr
    if fill is None:
        tail = jnp.broadcast_to(arr[-1:], (pad,) + arr.shape[1:])
    else:
        tail = jnp.full((pad,) + arr.shape[1:], fill, arr.dtype)
    return jnp.concatenate([arr, tail], axis=0)


def make_sharded_unary(mesh: Mesh, tables, src_data, tgt_data, cfweights,
                       simval: int, mode: str, pmax: int, cprange: float,
                       axis: str = "cps", percentile: float = 0.75):
    """Jitted CP-sharded unary cost volume.

    Closes over the replicated statics (search tables, feature data). The
    returned fn(cp_coords (K,3), labels (L,3), centre (3,), maxsep (K,),
    abs_weights (K,)) -> (K, L) matches reg.costs.unary_costs output.
    """
    n_shards = mesh.shape[axis]

    def local(cp_loc, labels, centre, maxsep_loc, absw_loc, src_coords):
        rots, rl = C.rotated_label_positions(cp_loc, labels, centre)
        patch_idx, patch_mask, _ = C.build_patches(
            cp_loc, src_coords, maxsep_loc, cprange, pmax)
        return C.unary_costs.__wrapped__(
            cp_loc, rl, src_coords, patch_idx, patch_mask, tables,
            src_data, tgt_data, cfweights, absw_loc,
            simval=simval, percentile=percentile, mode=mode)

    sharded = shard_map(
        local, mesh=mesh,
        in_specs=(P(axis), P(), P(), P(axis), P(axis), P()),
        out_specs=P(axis),
        check_vma=False,
    )

    @jax.jit
    def fn(cp_coords, labels, centre, maxsep, abs_weights, src_coords):
        K = cp_coords.shape[0]
        out = sharded(pad_rows(cp_coords, n_shards),
                      labels, centre,
                      pad_rows(maxsep, n_shards),
                      pad_rows(abs_weights, n_shards, fill=0.0),
                      src_coords)
        return out[:K]

    return fn


def make_sharded_triplet_volume(mesh: Mesh, reglambda, mu, kappa, k_exp,
                                rexp, axis: str = "cps"):
    """Jitted face-sharded (T,L,L,L) strain cost volume.

    fn(rl (K,L,3) replicated, triplets (T,3), cur (T,3,3), orig (T,3,3))
    -> (T,L,L,L), numerically identical to reg.costs.triplet_cost_volume.
    """
    n_shards = mesh.shape[axis]

    def local(rl, trip, cur, orig):
        L = rl.shape[1]
        out = C.triplet_volume_arrays(rl, trip, cur, orig, reglambda, mu,
                                      kappa, k_exp, rexp)
        return out.reshape(-1, L, L, L)

    sharded = shard_map(
        local, mesh=mesh,
        in_specs=(P(), P(axis), P(axis), P(axis)),
        out_specs=P(axis),
        check_vma=False,
    )

    @jax.jit
    def fn(rl, triplets, cur, orig):
        T = triplets.shape[0]
        out = sharded(rl,
                      pad_rows(triplets, n_shards),
                      pad_rows(cur, n_shards),
                      pad_rows(orig, n_shards))
        return out[:T]

    return fn
