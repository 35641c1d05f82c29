"""Discrete MRF model state and per-iteration setup for pairwise
registration (NonLinearSRegDiscreteModel, DiscreteModel.cpp).

Holds the per-level static tables (LevelTables, fusion tables, sampling
grid) and produces per-iteration device inputs: labels, rotations, patches,
cost-function weighting. The optimiser entry points consume these.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core.mesh import Mesh
from ..ops import resample as rsp
from ..ops.nearest import build_tables
from . import costs as C
from .optimise.coloring import color_groups, face_coloring
from .optimise.fusion import FusionTables, build_fusion_tables
from .sampling_grid import SamplingGrid, build_sampling_grid, rescale_labels

RAD = 100.0


@dataclass
class ModelConfig:
    simval: int = 2
    reglambda: float = 0.0
    iters: int = 3
    sg_res: int = 4
    regmode: int = 3
    mu: float = 0.4          # --shearmod
    kappa: float = 1.6       # --bulkmod
    k_exp: float = 2.0       # --k_exponent
    rexp: float = 2.0        # --regexp
    cprange: float = 1.0
    percentile: float = 0.75
    triclique: bool = False
    patchwise: bool = False
    rescale_labels: bool = False
    multivariate: bool = False
    mcparam: float = 0.8
    fixnan: bool = False
    pmax: int = 0            # 0 -> auto from grid ratio
    labeldist: float = 0.5   # _labeldist (DiscreteModel.h:167)
    bucket_labels: bool = True   # pad label sets to one per-level shape so
    #                              the even/odd label alternation reuses ONE
    #                              compiled program (fusion path only; the
    #                              MCMC volume is cubic in L, never padded)


class PairwiseModel:
    """Per-level discrete model; pure-device hot path, host orchestration."""

    def __init__(self, cfg: ModelConfig, cp_grid: Mesh, source: Mesh,
                 target: Mesh, feat_src: np.ndarray, feat_ref: np.ndarray):
        self.cfg = cfg
        self.cp_grid = cp_grid.copy()        # current CP grid (moves)
        self.orig_cp = cp_grid.copy()        # level-start grid (_oCPgrid/_ORIG)
        self.source = source.copy()          # warped source datagrid (moves)
        self.target = target
        K = cp_grid.nvertices

        # per-CP max spacing, level init (DiscreteModel.cpp:72-89)
        self.maxsep = cp_grid.max_vertex_distances()
        self.mvd_max = cp_grid.calculate_MaxVD()
        self.max_label_dist = cfg.labeldist * self.mvd_max

        self.sampling = build_sampling_grid(cfg.sg_res, self.max_label_dist)
        self.centre = jnp.asarray(self.sampling.centre, jnp.float32)

        # triplets: sorted CP face ids (DiscreteModel.cpp:293-308)
        trip = np.sort(cp_grid.faces.astype(np.int32), axis=1)
        self.triplets_np = trip
        # pairs: CP edges (DiscreteModel.cpp:271-291)
        edges = set()
        for a, b, c in cp_grid.faces:
            for e in ((a, b), (b, c), (a, c)):
                edges.add((min(e), max(e)))
        self.pairs_np = np.array(sorted(edges), dtype=np.int32)

        _, _, cp_tri_idx, _ = cp_grid.adjacency

        self.tables = C.LevelTables(
            target_tables=build_tables(target.coords, target.faces,
                                       target.adjacency[2]),
            target_data=jnp.asarray(feat_ref, jnp.float32),
            source_data=jnp.asarray(feat_src, jnp.float32),
            orig_cp=jnp.asarray(cp_grid.coords, jnp.float32),
            triplets=jnp.asarray(trip),
            pairs=jnp.asarray(self.pairs_np),
            cp_faces=jnp.asarray(cp_grid.faces.astype(np.int32)),
            cp_tri_idx=jnp.asarray(cp_tri_idx),
            maxsep=jnp.asarray(self.maxsep, jnp.float32),
            mvd_max=jnp.asarray(self.mvd_max, jnp.float32),
        )

        self.pairwise_mode = cfg.regmode == 1
        self.fusion_tables: FusionTables = build_fusion_tables(
            trip if not self.pairwise_mode else np.zeros((0, 3), np.int32),
            K, pairs=self.pairs_np if self.pairwise_mode else None)
        fcolors = face_coloring(trip, K)
        self.face_groups, self.face_group_mask = color_groups(fcolors)

        # block-contiguous gather budgets (ops/blocked.py): the patch build
        # needs the SOURCE datagrid to be icosphere topology; the unary data
        # gather needs the TARGET to be a pristine icosphere. Both hold for
        # every standard config (datagrid levels are icospheres); warped or
        # foreign meshes fall back to the exact dense/ball paths.
        from ..core.icosphere import _NVERT_TO_RES, icosphere
        from ..ops import blocked as BLK
        lim_arc = float(cfg.cprange * np.max(self.maxsep)) / RAD
        sres = _NVERT_TO_RES.get(source.nvertices)
        if (sres is not None and sres >= 3
                and np.array_equal(icosphere(sres).faces, source.faces)):
            self.src_res = sres
            self.patch_B = BLK.suggest_block_budget(sres, lim_arc)
        else:
            self.src_res = None
            self.patch_B = 0
        # the unary gather's block selection unions caps over the WHOLE
        # rotated-label cloud (unary_costs takes min-over-labels distance),
        # so its budget must cover limit + label spread, not just the patch
        # radius (observed as a fallback-triggering overflow at CP-2 scale)
        tres = self.tables.target_tables.pristine_res
        label_arc = float(self.max_label_dist) / RAD
        self.unary_fblk = (BLK.suggest_block_budget(tres,
                                                    lim_arc + label_arc)
                           if tres >= 3 else 0)

        if cfg.pmax:
            self.pmax = cfg.pmax
        else:
            # exact level-init count + 25% deformation margin, rounded to 16
            # (the overflow loop still grows on later-iteration compression)
            cnt = C.max_inrange_count(
                self.cp_grid.coords, source.coords,
                cfg.cprange * np.asarray(self.tables.maxsep))
            self.pmax = int(min(source.nvertices,
                                max(32, -(-int(cnt * 1.25) // 16) * 16)))
        self.iter = 1
        self.scale = 1.0
        self.labeling = np.zeros(K, np.int32)
        self._warned_overflow = False
        self.anat: "C.AnatTables | None" = None   # set by driver for regmode 5
        if cfg.triclique:
            density = source.nvertices / self.triplets_np.shape[0]
            self.fmax = int(min(source.nvertices, max(16, 6 * density)))
        else:
            self.fmax = 0

    # -- per-iteration pieces ------------------------------------------------

    def current_labels(self) -> np.ndarray:
        """Label set for this iteration (DiscreteModel.cpp:242-248):
        barycentres on odd iters, vertices on even; or rescaled grid."""
        cfg = self.cfg
        if cfg.rescale_labels:
            if self.scale >= 0.25:
                labels = rescale_labels(self.sampling, self.sampling.samples,
                                        self.scale)
            else:
                self.scale = 1.0
                labels = self.sampling.samples
            self.scale *= 0.8
            return labels
        return (self.sampling.samples if self.iter % 2 == 0
                else self.sampling.barycentres)

    def setup_iteration(self, cfweights: np.ndarray):
        """Prepare device inputs for one outer iteration
        (setupCostFunction, DiscreteModel.cpp:216-262)."""
        cfg = self.cfg
        labels = self.current_labels()
        self.num_labels = len(labels)      # REAL label count (alpha range)
        if cfg.bucket_labels:
            # shape bucketing: pad to the max over this level's label sets
            # (samples/barycentres alternate per iteration,
            # DiscreteModel.cpp:242-248) with copies of label 0 so all
            # per-iteration programs share ONE compiled shape; the alpha
            # loop only visits the real prefix (traced trip count)
            bucket = (len(self.sampling.samples) if cfg.rescale_labels else
                      max(len(self.sampling.samples),
                          len(self.sampling.barycentres)))
            if len(labels) < bucket:
                pad = np.broadcast_to(labels[0:1],
                                      (bucket - len(labels), 3))
                labels = np.concatenate([labels, pad], axis=0)
        self.labels_np = labels
        K = self.cp_grid.nvertices
        self.labeling = np.zeros(K, np.int32)

        cp = jnp.asarray(self.cp_grid.coords, jnp.float32)
        src = jnp.asarray(self.source.coords, jnp.float32)
        lbl = jnp.asarray(labels, jnp.float32)

        rots, rl = C.rotated_label_positions(cp, lbl, self.centre)

        def _patches():
            if self.patch_B:
                # block-contiguous candidate gather; certificate-exact for
                # any warp (ops/blocked.py)
                from ..ops.blocked import build_patches_blocked
                return build_patches_blocked(
                    cp, src, self.tables.maxsep, cfg.cprange, self.pmax,
                    self.src_res, self.patch_B)
            # certified candidate ball: prunes the all-pairs distance +
            # top_k (None -> exact dense path when the certificate fails)
            ball_np = C.patch_candidate_ball(
                np.asarray(cp), np.asarray(src), self.source.faces,
                cfg.cprange * np.asarray(self.tables.maxsep))
            ball = None if ball_np is None else jnp.asarray(ball_np)
            return C.build_patches(cp, src, self.tables.maxsep, cfg.cprange,
                                   self.pmax, ball)

        patch_idx, patch_mask, overflow = _patches()
        # the reference's patches are uncapped vectors
        # (DiscreteCostFunction.cpp:334-351): on overflow, grow pmax (and the
        # block budget, which the same flag reports) and rebuild rather than
        # silently dropping in-range vertices
        for _ in range(6):
            if not bool(overflow.any()):
                break
            # grow by 1.5x rounded to 16 (not 2x): every new pmax shape pays
            # a recompile, but the adaptive initial size is already close
            self.pmax = min(src.shape[0],
                            max(self.pmax + 16,
                                -(-int(self.pmax * 1.5) // 16) * 16))
            if self.patch_B:
                self.patch_B += 8
            if not self._warned_overflow:
                print(f"patch capacity overflow: growing pmax to {self.pmax}")
                self._warned_overflow = True
            patch_idx, patch_mask, overflow = _patches()

        # AbsoluteWeights: max-over-dims of cfweights resampled to CP grid
        # (resample_weights, DiscreteCostFunction.cpp:303-323)
        absw_src = cfweights.max(axis=0)
        if absw_src.min() == absw_src.max():
            # uniform weighting (the default): resampling a constant field
            # returns the constant — skip the per-iteration resample
            absw = np.full(K, absw_src.flat[0])
        else:
            carrier = Mesh(coords=self.source.coords, faces=self.source.faces,
                           data=absw_src[None, :])
            absw = rsp.metric_resample(carrier, self.cp_grid)[0].data[0]

        s = dict(
            cp=cp, src=src, labels=lbl, rots=rots, rl=rl,
            patch_idx=patch_idx, patch_mask=patch_mask,
            cfweights=jnp.asarray(cfweights, jnp.float32),
            abs_weights=jnp.asarray(absw, jnp.float32),
        )
        if cfg.triclique:
            # per-CP-face source patches (rebuilt each iteration: the CP
            # grid moves; HO get_source_data, DiscreteCostFunction.cpp:468)
            cp_search = build_tables(self.cp_grid.coords, self.cp_grid.faces,
                                     self.cp_grid.adjacency[2])
            fidx, fmask, foverflow = C.build_face_patches(src, cp_search,
                                                          self.fmax)
            if not self._warned_overflow and bool(foverflow.any()):
                print("warning: face patch capacity overflow; increase fmax")
                self._warned_overflow = True
            s["face_idx"], s["face_mask"] = fidx, fmask
        self.iter += 1
        return s

    def unary(self, s) -> jax.Array:
        cfg = self.cfg
        mode = ("patchwise" if cfg.patchwise else
                "multivariate" if cfg.multivariate else "univariate")
        if cfg.triclique:
            # triclique mode has no unary data term (DiscreteCostFunction.h:220)
            return jnp.zeros((s["cp"].shape[0], s["labels"].shape[0]), jnp.float32)
        if self.unary_fblk:
            limits = cfg.cprange * self.tables.maxsep
            costs, miss = C.unary_costs(
                s["cp"], s["rl"], s["src"], s["patch_idx"], s["patch_mask"],
                self.tables.target_tables, self.tables.source_data,
                self.tables.target_data, s["cfweights"], s["abs_weights"],
                cfg.simval, cfg.percentile, mode=mode,
                fblk=self.unary_fblk, limits=limits, return_miss=True)
            if not int(jnp.sum(miss)):
                return costs
            # certificate miss (should not happen: covers are exact) — grow
            # the budget for next time and recompute exactly now
            print(f"unary block-gather miss; falling back to exact path "
                  f"(fblk {self.unary_fblk} -> {self.unary_fblk + 8})")
            self.unary_fblk += 8
        return C.unary_costs(
            s["cp"], s["rl"], s["src"], s["patch_idx"], s["patch_mask"],
            self.tables.target_tables, self.tables.source_data,
            self.tables.target_data, s["cfweights"], s["abs_weights"],
            cfg.simval, cfg.percentile, mode=mode)

    def triplet_combo_fn(self, s):
        cfg = self.cfg
        rl, cp = s["rl"], s["cp"]

        def regulariser(la, lb, lc):
            if cfg.regmode in (4, 5) and self.anat is not None:
                return C.anatomical_triplet_costs(
                    cp, rl, self.tables, self.anat, la, lb, lc,
                    cfg.reglambda, cfg.mu, cfg.kappa, cfg.k_exp, cfg.rexp,
                    fixnan=cfg.fixnan)
            return C.triplet_combo_costs(
                rl, cp, self.tables, la, lb, lc, cfg.reglambda, cfg.mu,
                cfg.kappa, cfg.k_exp, cfg.rexp, fixnan=cfg.fixnan)

        if not cfg.triclique:
            if cfg.regmode in (2, 3):
                t = self.tables.triplets

                def binary_fast(cur3, alpha):
                    """(T,8) strain tables from 2 gathered positions per
                    corner (see fusion.binary_move_tables)."""
                    from .optimise.fusion import _BITS
                    combos = []
                    for corner in range(3):
                        v2 = jnp.stack(
                            [rl[t[:, corner], cur3[:, corner]],
                             rl[t[:, corner],
                                jnp.broadcast_to(alpha, cur3[:, 0].shape)]],
                            axis=1)                     # (T,2,3)
                        bit = _BITS[:, corner]          # (8,)
                        combos.append(jnp.where(bit[None, :, None] == 1,
                                                v2[:, 1:2], v2[:, 0:1]))
                    va, vb, vc = combos                 # (T,8,3) each
                    return C.triplet_costs_from_positions(
                        va, vb, vc, cp, self.tables, cfg.reglambda, cfg.mu,
                        cfg.kappa, cfg.k_exp, cfg.rexp, fixnan=cfg.fixnan)

                regulariser.binary_fast = binary_fast
            return regulariser

        def fn(la, lb, lc):
            lik = C.triclique_likelihood(
                cp, rl, self.tables, s["face_idx"], s["face_mask"], s["src"],
                s["abs_weights"], s["cfweights"], la, lb, lc, cfg.simval,
                cfg.percentile, multivariate=cfg.multivariate
                and not cfg.patchwise)
            return lik + regulariser(la, lb, lc)
        return fn

    def pair_combo_fn(self, s):
        cfg = self.cfg
        vol = C.pairwise_cost_volume(s["rl"], s["cp"], self.tables,
                                     cfg.reglambda, cfg.rexp)

        def fn(pa, pb):
            pr = jnp.arange(self.tables.pairs.shape[0])[:, None]
            return vol[pr, pa, pb]
        return fn

    def apply_labeling(self, labeling: np.ndarray, s) -> None:
        """CP_k <- ROT_k @ label_{l_k} (applyLabeling, DiscreteModel.cpp:264)."""
        rl = np.asarray(s["rl"])
        self.cp_grid.coords = rl[np.arange(rl.shape[0]), labeling].astype(np.float64)
