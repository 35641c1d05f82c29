"""Rigid (rotational) pre-alignment (Rigid_cost_function,
rigid_costfunction.cpp).

The reference maximises a tangent-plane Gaussian-weighted similarity between
each source vertex and its angular neighbourhood on the target, by
finite-difference gradient ascent over 3 Euler angles with step/spacing
annealing. Here the cost is one fused masked-matmul kernel (no sparse
kernel matrix, no incremental neighbourhood updates — the neighbourhood is
recomputed exactly on every evaluation), and the annealing loop is kept
verbatim on the host.

Similarity semantics match sparsesimkernel's rigid path
(similarities.cpp:27-103): columns are compared after removing the
mean-vector (global row mean for univariate data, per-vertex feature mean
for multivariate), giving a centered-cosine; simval 1 uses -SSD.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..core import spherical as sph
from ..core.mesh import Mesh

RAD = 100.0


@functools.partial(jax.jit, static_argnames=("simval", "chunk"))
def rigid_cost(angles, src_coords, src_data_c, tgt_coords, tgt_data_c,
               cos_ang, min_sigma, simval: int, chunk: int = 2048):
    """Total similarity of the rotated source against the target.

    src_data_c/tgt_data_c: (D,N) mean-removed feature columns.
    cos_ang: neighbourhood gate cos(2*asin(4*MVD/(2*RAD))).
    """
    rot = sph.apply_euler(src_coords, angles[0], angles[1], angles[2])
    tgt_unit = tgt_coords / jnp.linalg.norm(tgt_coords, axis=1, keepdims=True)

    src_norm = jnp.linalg.norm(src_data_c, axis=0)              # (Ns,)
    tgt_norm = jnp.linalg.norm(tgt_data_c, axis=0)              # (Nt,)

    N = rot.shape[0]
    pad = (-N) % chunk
    rot_p = jnp.pad(rot, ((0, pad), (0, 0)))
    srcn_p = jnp.pad(src_norm, (0, pad))
    srcd_p = jnp.pad(src_data_c, ((0, 0), (0, pad)))

    def body(args):
        rc, sn, sd = args                                       # (c,3),(c,),(D,c)
        unit = rc / jnp.linalg.norm(rc, axis=1, keepdims=True)
        dots = unit @ tgt_unit.T                                # (c,Nt)
        nbh = dots >= cos_ang

        # tangent-plane offsets: origin is the radial point, so the source's
        # own tangent coords are ~0 and the distance is the target's tangent
        # offset (WLS_simgradient, rigid_costfunction.cpp:60-85)
        e1, e2 = sph.vertex_tangent_basis(unit)
        origin = rc                                             # radial * RAD
        diff = tgt_coords[None, :, :] - origin[:, None, :]
        d1 = jnp.einsum("cnk,ck->cn", diff, e1)
        d2 = jnp.einsum("cnk,ck->cn", diff, e2)
        y1 = jnp.einsum("ck,ck->c", rc - origin, e1)[:, None]
        y2 = jnp.einsum("ck,ck->c", rc - origin, e2)[:, None]
        dist2 = (d1 - y1) ** 2 + (d2 - y2) ** 2
        w = jnp.exp(-dist2 / (2.0 * min_sigma * min_sigma))
        w = jnp.where((dist2 > 0) & nbh, w, 0.0)

        if simval == 1:
            # -SSD(i,j) = -sqrt(sum_d (a-b)^2)/D  (similarities.cpp:89-103)
            a2 = jnp.sum(sd * sd, axis=0)[:, None]
            b2 = jnp.sum(tgt_data_c * tgt_data_c, axis=0)[None, :]
            ab = sd.T @ tgt_data_c
            simm = -jnp.sqrt(jnp.maximum(a2 + b2 - 2 * ab, 0.0)) / sd.shape[0]
        else:
            ab = sd.T @ tgt_data_c                              # (c,Nt)
            denom = sn[:, None] * tgt_norm[None, :]
            simm = jnp.where(denom > 0, ab / jnp.where(denom > 0, denom, 1.0), 0.0)

        wsum = w.sum(axis=1)
        jp = jnp.where(wsum > 0, (w * simm).sum(axis=1) / jnp.where(wsum > 0, wsum, 1.0), 0.0)
        return jp

    jps = jax.lax.map(body, (rot_p.reshape(-1, chunk, 3),
                             srcn_p.reshape(-1, chunk),
                             srcd_p.reshape(srcd_p.shape[0], -1, chunk).transpose(1, 0, 2)))
    return jnp.sum(jps.reshape(-1)[:N])


def _center_columns(data: np.ndarray) -> np.ndarray:
    """meanvector removal (similarities.cpp:105-125): global mean for
    univariate rows, per-column mean across features for multivariate."""
    if data.shape[0] == 1:
        return data - data.mean()
    return data - data.mean(axis=0, keepdims=True)


def rigid_align(sph_reg: Mesh, sph_orig: Mesh, feat, cfg, iters: int,
                simval: int, verbose: bool = False) -> Mesh:
    """Run the annealed finite-difference ascent (run,
    rigid_costfunction.cpp:164-228). Returns the rotated source sphere."""
    src = sph_reg.copy()
    mvd = src.calculate_MeanVD()
    min_sigma = mvd
    cos_ang = float(np.cos(2 * np.arcsin(4 * mvd / (2 * RAD))))

    src_c = jnp.asarray(_center_columns(feat.get_input_data()), jnp.float32)
    tgt_c = jnp.asarray(_center_columns(feat.get_reference_data()), jnp.float32)
    tgt_coords = jnp.asarray(sph_orig.coords, jnp.float32)

    def cost(coords, a1, a2, a3):
        return float(rigid_cost(jnp.asarray([a1, a2, a3], jnp.float32),
                                coords, src_c, tgt_coords, tgt_c,
                                cos_ang, min_sigma, simval))

    coords = jnp.asarray(src.coords, jnp.float32)
    spacing = cfg.gradsampling
    stepsize = cfg.stepsize
    grad_zero = cost(coords, 0, 0, 0)
    mingrad = grad_zero
    rec_init = grad_zero
    rec_final = 0.0
    min_iter = 0
    loop = 0

    # one device program per spacing level: the reference's inner loop makes
    # 4 host-synced cost evaluations per iteration (rigid_costfunction.cpp:
    # 176-222), which is dispatch-floor-bound over the remote tunnel; the
    # math below is the same loop as a lax.while_loop
    @functools.partial(jax.jit, static_argnames=("n_iters",))
    def sweep(coords, per, step0, grad_zero, mingrad, min_iter, rec_final,
              loop_base, n_iters: int):
        def cost_d(coords, a1, a2, a3):
            a = jnp.stack([a1, a2, a3]).astype(jnp.float32)
            return rigid_cost.__wrapped__(a, coords, src_c, tgt_coords,
                                          tgt_c, cos_ang, min_sigma, simval)

        z = jnp.float32(0)

        def body(carry):
            (it, coords, grad_zero, mingrad, min_iter, rec_final, step,
             done) = carry
            per_f = jnp.float32(per)
            g = jnp.stack([
                cost_d(coords, per_f, z, z) - grad_zero,
                cost_d(coords, z, per_f, z) - grad_zero,
                cost_d(coords, z, z, per_f) - grad_zero,
            ]) / per_f
            n = jnp.linalg.norm(g)
            g = jnp.where(n > 0, g / jnp.where(n > 0, n, 1.0), g)
            euler = step * g

            new_coords = sph.apply_euler(coords, euler[0], euler[1], euler[2])
            new_grad = cost_d(new_coords, z, z, z)

            improved = new_grad > mingrad
            mingrad_n = jnp.where(improved, new_grad, mingrad)
            total_it = loop_base + it
            min_iter_n = jnp.where(improved, total_it, min_iter)
            rec_final_n = jnp.where(improved, mingrad_n, rec_final)
            revert = (total_it - min_iter_n) > 0
            step_n = jnp.where(revert, step * 0.5, step)
            coords_n = jnp.where(revert, coords, new_coords)
            # the reference keeps the NEW cost in grad_zero even when the
            # move is reverted (rigid_costfunction.cpp:203-218)
            grad_n = new_grad
            done_n = step_n < 1e-3

            # when already done, pass everything through unchanged
            keep = lambda new, old: jnp.where(done, old, new)
            return (it + 1, keep(coords_n, coords), keep(grad_n, grad_zero),
                    keep(mingrad_n, mingrad), keep(min_iter_n, min_iter),
                    keep(rec_final_n, rec_final), keep(step_n, step),
                    jnp.logical_or(done, done_n))

        def cond(carry):
            return carry[0] <= n_iters

        init = (jnp.int32(1), coords, grad_zero, mingrad, min_iter,
                rec_final, jnp.float32(step0), jnp.bool_(False))
        out = jax.lax.while_loop(cond, body, init)
        return out[1], out[2], out[3], out[4], out[5]

    grad_zero = jnp.float32(grad_zero)
    mingrad = jnp.float32(mingrad)
    min_iter_d = jnp.int32(0)
    rec_final_d = jnp.float32(0.0)
    while spacing > 0.05:
        coords, grad_zero, mingrad, min_iter_d, rec_final_d = sweep(
            coords, spacing, stepsize, grad_zero, mingrad, min_iter_d,
            rec_final_d, jnp.int32(loop * iters), n_iters=iters)
        loop += 1
        spacing *= 0.5
    rec_final = float(rec_final_d)

    if verbose and rec_final != 0.0:
        print(f"  rigid: improvement "
              f"{abs((rec_final - rec_init) / rec_final) * 100:.2f}%")
    out = src.copy()
    out.coords = np.asarray(coords, np.float64)
    return out
