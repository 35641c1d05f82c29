"""Groupwise registration (Group_Mesh_registration + DiscreteGroupModel +
DiscreteGroupCostFunction; group_mesh_registration.cpp, DiscreteGroupModel.cpp,
DiscreteGroupCostFunction.cpp).

N subjects' spheres are co-registered simultaneously: MRF nodes are
(subject, control-point) pairs, triplets are per-subject CP faces with strain
regularisation (scaled by subcorr = 0.1*S), and pairs are cross-subject
correspondences whose cost is the similarity of the subjects' label-deformed
feature maps over the overlap of their template-space patches. HOCR fusion
moves only (the reference rejects other optimisers, group_...cpp:85-89).

TPU mapping: the subject axis is the distribution axis. All per-subject
state is stored subject-major — `label_maps (S,L,D,Nt)`, CP coords (S,K,3) —
so the heavy per-iteration stages (map resampling, pair-cost evaluation) can
shard over devices with `jax.sharding`; cross-subject pair costs read two
subjects' maps, which an all-gather of the (L,D,Nt) blocks provides (see
parallel/group_sharding.py and __graft_entry__.dryrun_multichip).
"""
from __future__ import annotations

import os
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core.mesh import Mesh
from ..core import io as mio
from ..core import spherical as sph
from ..ops import resample as rsp
from ..ops.nearest import build_tables, closest_vertex
from ..ops import similarity as simi
from ..ops.unfold import unfold
from . import costs as C
from . import featurespace as fsp
from .config import RegConfig, parse_config
from .optimise.fusion import build_fusion_tables, fusion_optimize, fusion_energy
from .sampling_grid import build_sampling_grid

RAD = 100.0
FOLDING = 1e7
FIX_NAN = 1e7


class GroupMeshRegistration:
    def __init__(self):
        self.meshes: List[Mesh] = []
        self.data_paths: List[str] = []
        self.datasets: List[np.ndarray] = []
        self.template: Optional[Mesh] = None
        self.mask: Optional[np.ndarray] = None
        self.outdir = "./"
        self.surf_format = ".surf.gii"
        self.data_format = ".func.gii"
        self.verbose = False
        self.debug = False
        self.energy_log: list = []
        self.metrics_path: Optional[str] = None   # JSONL per-iteration metrics

    def _log_metrics(self, **kw):
        """Structured observability (SURVEY §5), same JSONL contract as the
        pairwise driver: one JSON line per event."""
        if self.metrics_path:
            import json
            with open(self.metrics_path, "a") as f:
                f.write(json.dumps(kw) + "\n")

    # ---- inputs ----------------------------------------------------------
    def set_inputs(self, meshes: List[Mesh] | List[str]):
        self.meshes = []
        for m in meshes:
            mesh = Mesh.load(m) if isinstance(m, str) else m.copy()
            mesh.recentre()
            mesh.true_rescale(RAD)
            self.meshes.append(mesh)

    def set_data_list(self, data: List[np.ndarray] | List[str]):
        self.datasets = []
        for i, d in enumerate(data):
            if isinstance(d, str):
                self.datasets.append(mio.load_data(d, self.meshes[i]))
            else:
                self.datasets.append(np.atleast_2d(d))

    def set_template(self, mesh: Mesh | str):
        m = Mesh.load(mesh) if isinstance(mesh, str) else mesh.copy()
        m.recentre()
        m.true_rescale(RAD)
        self.template = m

    def set_mask(self, mask: np.ndarray | str):
        self.mask = (mio.load_data(mask, self.template)[0]
                     if isinstance(mask, str) else np.asarray(mask))

    # ---- main ------------------------------------------------------------
    def run_multiresolutions(self, config: RegConfig | str | None = None):
        cfg = config if isinstance(config, RegConfig) else parse_config(config)
        self.cfg = cfg
        S = len(self.meshes)
        if S < 2:
            raise ValueError("groupwise mode needs at least 2 subjects")
        if self.template is None:
            raise ValueError("groupwise mode needs a template sphere")

        self.sph_reg: Optional[List[Mesh]] = None
        for level in range(cfg.levels):
            self.level = level + 1
            if cfg.cost[level] in ("RIGID", "AFFINE"):
                raise ValueError(
                    "AFFINE/RIGID is not supported in groupwise mode")
            if self.verbose:
                print(f"-- groupwise level {self.level}/{cfg.levels}")
            self._initialize_level(level)
            self._evaluate(level)

        self._write_outputs()
        return self.sph_reg

    # ---- level setup -----------------------------------------------------
    def _initialize_level(self, level: int):
        cfg = self.cfg
        S = len(self.meshes)
        self.feat = fsp.initialise(
            self.meshes, self.datasets, cfg.datagrid[level],
            [cfg.sigma_in[level]] * S, exclude=cfg.exclude, cut=cfg.cut,
            thresholds=tuple(cfg.cutthreshold),
            intensity_norm=cfg.intensity_norm, variance_norm=cfg.variance_norm)
        self.sph_orig = Mesh(coords=self.feat.grid.coords.copy(),
                             faces=self.feat.grid.faces)

        control = Mesh.from_icosphere(cfg.cpgrid[level])
        control.recentre()
        control.true_rescale(RAD)
        self.control = control
        K = control.nvertices

        self.max_label_dist = 0.5 * control.calculate_MaxVD()
        self.sampling = build_sampling_grid(cfg.sampgrid[level],
                                            self.max_label_dist)
        self.centre = jnp.asarray(self.sampling.centre, jnp.float32)

        trip = np.sort(control.faces.astype(np.int32), axis=1)
        self.cp_triplets = trip
        self.T_cp = trip.shape[0]

        # per-subject state
        if self.sph_reg is None or self.sph_reg[0].nvertices != self.sph_orig.nvertices:
            prev = self.sph_reg
            self.sph_reg = [Mesh(coords=self.sph_orig.coords.copy(),
                                 faces=self.sph_orig.faces) for _ in range(S)]
            if prev is not None:
                # project previous level's warps onto the new data grid
                icotmp = Mesh.from_icosphere(prev[0].get_resolution())
                icotmp.true_rescale(RAD)
                for s in range(S):
                    warped = rsp.sphere_project_warp(self.sph_orig, icotmp, prev[s])
                    self.sph_reg[s] = unfold(warped, self.verbose)
        self.cp_grids = [control.copy() for _ in range(S)]
        if getattr(self, "_prev_cp_warp", None):
            pass

        # global node numbering: subject * K + vertex
        full_trip = np.concatenate([trip + s * K for s in range(S)], axis=0)
        self.full_triplets = full_trip

        self.fusion_tables = build_fusion_tables(full_trip, S * K)

        # subject-major template tables
        self.template_tables = build_tables(self.template.coords,
                                            self.template.faces,
                                            self.template.adjacency[2])
        # patch capacity: template verts within range*spacing of a CP
        nt = self.template.nvertices
        frac = (cfg.cprange * control.calculate_MaxVD())**2 / (4 * RAD**2)
        self.pmax = int(min(nt, max(64, 2.5 * frac * nt)))
        if self.verbose:
            print(f"   S={S} K={K} labels={len(self.sampling.samples)} "
                  f"pmax={self.pmax}")

    # ---- outer loop ------------------------------------------------------
    def _evaluate(self, level: int):
        cfg = self.cfg
        S = len(self.meshes)
        K = self.control.nvertices
        energy = 0.0
        labels = self.sampling.samples          # groupwise uses vertices only
        L = len(labels)
        lbl = jnp.asarray(labels, jnp.float32)

        import time as _time
        for it in range(cfg.iters[level]):
            t0 = _time.perf_counter()
            state = self._setup_iteration(lbl)
            labeling = jnp.zeros((S * K,), jnp.int32)

            if self.debug:
                # per-iteration mesh dumps (DiscreteModel.cpp:234-240 analog)
                for s in range(S):
                    self.sph_reg[s].save(
                        self._out(f"SOURCE-{s}-{self.level}-{it}.surf.gii"))
                    self.cp_grids[s].save(
                        self._out(f"CPgrid-{s}-{self.level}-{it}.surf.gii"))

            tfn = self._triplet_combo_fn(state)
            pfn = self._pair_combo_fn(state)
            zero_unary = jnp.zeros((L, S * K), jnp.float32)

            t1 = _time.perf_counter()
            labeling = fusion_optimize(
                labeling, zero_unary, jnp.asarray(self.full_triplets),
                self.fusion_tables, tfn, L,
                pairs=state["pairs"], pair_combo_fn=pfn)
            newenergy = float(fusion_energy(
                labeling, zero_unary, jnp.asarray(self.full_triplets), tfn,
                pairs=state["pairs"], pair_combo_fn=pfn))
            labeling = np.asarray(labeling)
            t2 = _time.perf_counter()
            self.energy_log.append((self.level, it, newenergy))
            changed = float((labeling != 0).mean())
            if self.verbose:
                print(f"  iter {it}: energy {newenergy:.4f} "
                      f"({changed:.0%} nodes moved)  "
                      f"[setup {t1 - t0:.2f}s opt {t2 - t1:.2f}s]")
            self._log_metrics(event="iter", level=self.level, iter=it,
                              energy=newenergy, changed=changed,
                              setup_s=round(t1 - t0, 4),
                              opt_s=round(t2 - t1, 4))

            if it > 1 and (energy - newenergy < newenergy * 0.01):
                break

            # apply labeling per subject (DiscreteGroupModel + group driver)
            rl = np.asarray(state["rl"])        # (S,K,L,3)
            for s in range(S):
                prev_cp = self.cp_grids[s].copy()
                new_coords = rl[s][np.arange(K), labeling[s * K:(s + 1) * K]]
                new_cp = Mesh(coords=new_coords.astype(np.float64),
                              faces=self.control.faces)
                new_cp = unfold(new_cp, self.verbose)
                self.sph_reg[s] = unfold(rsp.sphere_project_warp(
                    self.sph_reg[s], prev_cp, new_cp), self.verbose)
                self.cp_grids[s] = new_cp
            energy = newenergy

    # ---- per-iteration device state --------------------------------------
    def _setup_iteration(self, lbl):
        cfg = self.cfg
        S = len(self.meshes)
        K = self.control.nvertices
        L = lbl.shape[0]

        cp = jnp.asarray(np.stack([g.coords for g in self.cp_grids]), jnp.float32)

        # per-subject rotations + rotated label positions (S,K,L,3)
        rots = sph.rodrigues(jnp.broadcast_to(self.centre, cp.shape), cp)
        rl = jnp.einsum("skij,lj->skli", rots, lbl)

        # per-subject spacings (S,K)
        spacings = np.stack([g.max_vertex_distances() for g in self.cp_grids])

        # cross-subject pairs (estimate_pairs, DiscreteGroupModel.cpp:37-55)
        pairs = []
        cp_tables = [build_tables(g.coords, g.faces, g.adjacency[2])
                     for g in self.cp_grids]
        nearest = np.stack([
            np.stack([np.asarray(closest_vertex(
                jnp.asarray(self.cp_grids[a].coords, jnp.float32), cp_tables[b]))
                for b in range(S)]) for a in range(S)])   # (S_a, S_b, K)
        for a in range(S):
            for b in range(a + 1, S):
                pairs.append(np.stack([a * K + np.arange(K, dtype=np.int64),
                                       b * K + nearest[a, b]], axis=1))
        pairs = (np.concatenate(pairs).astype(np.int32) if pairs
                 else np.zeros((0, 2), np.int32))
        # pair endpoints change every iteration (closest-CP matching), so the
        # fusion incidence/coloring tables are rebuilt with them
        self.fusion_tables = build_fusion_tables(self.full_triplets, S * K,
                                                 pairs=pairs)

        # label-deformed feature maps on the template (get_patch_data,
        # DiscreteGroupModel.cpp:88-121): each datapoint moves to
        # R(centre->datapoint) @ label; resample data onto template space.
        maps = self._label_maps(lbl)            # (S,L,D,Nt)

        return dict(cp=cp, rl=rl, labels=lbl, pairs=jnp.asarray(pairs),
                    spacings=jnp.asarray(spacings, jnp.float32), maps=maps)

    def _label_maps(self, lbl):
        """(S,L,D,Nt) label-deformed template maps — one jitted kernel per
        subject (vmappable/shardable over subjects; the heaviest per-iteration
        stage, SURVEY §2.7)."""
        import jax as _jax
        from ..ops.resample import label_deformed_maps, vertex_areas_kernel
        from ..ops.nearest import build_tables as _bt

        S = len(self.meshes)
        dg0 = self.sph_reg[0]
        _, _, dg_tri_idx, _ = dg0.adjacency
        dg_tables = _bt(dg0.coords, dg0.faces, dg_tri_idx)
        tmpl_t = self.template_tables
        tmpl_vareas = jnp.asarray(self.template.vertex_area(), jnp.float32)
        cap = rsp._adaptive_cap(dg0.nvertices, self.template.nvertices)

        out = []
        for s in range(S):
            coords = jnp.asarray(self.sph_reg[s].coords, jnp.float32)
            data = jnp.asarray(self.feat.data[s], jnp.float32)
            maps = label_deformed_maps(
                coords, data, dg_tables.faces, jnp.asarray(dg_tri_idx),
                dg_tables.ring_faces, dg_tables.ring_verts, lbl, self.centre,
                tmpl_t, tmpl_vareas, cap=cap)
            out.append(maps)
        return jnp.stack(out)                            # (S,L,D,Nt)

    # ---- cost callbacks --------------------------------------------------
    def _triplet_combo_fn(self, state):
        cfg = self.cfg
        S = len(self.meshes)
        K = self.control.nvertices
        rl = state["rl"].reshape(S * K, -1, 3)   # node-major
        cp_flat = state["cp"].reshape(S * K, 3)
        orig = jnp.asarray(self.control.coords, jnp.float32)
        trip = jnp.asarray(self.full_triplets)
        subcorr = 0.1 * S                        # DiscreteGroupCostFunction.h:45
        lam = cfg.reglambda[self.level - 1]

        def fn(la, lb, lc):
            va = rl[trip[:, 0][:, None], la]
            vb = rl[trip[:, 1][:, None], lb]
            vc = rl[trip[:, 2][:, None], lc]
            cur = cp_flat[trip]
            n_cur = sph.tri_normal(cur[:, 0], cur[:, 1], cur[:, 2])
            n_def = sph.tri_normal(va, vb, vc)
            folded = jnp.sum(n_def * n_cur[:, None, :], axis=-1) < 0.0
            o = orig[trip % K]                   # per-subject original grid
            orig_b = jnp.broadcast_to(o[:, None], va.shape[:2] + (3, 3))
            deformed = jnp.stack([va, vb, vc], axis=-2)
            from ..ops.strain import triangular_strain
            strain = triangular_strain(orig_b, deformed, cfg.shearmod,
                                       cfg.bulkmod, cfg.k_exponent)
            cost = subcorr * lam * jnp.power(strain, cfg.regexp)
            if cfg.fixnan:
                cost = jnp.where(jnp.isnan(cost), FIX_NAN, cost)
            return jnp.where(folded, FOLDING, cost)
        return fn

    def _pair_combo_fn(self, state):
        cfg = self.cfg
        S = len(self.meshes)
        K = self.control.nvertices
        simval = cfg.simval[self.level - 1]
        rl = state["rl"]                         # (S,K,L,3)
        maps = state["maps"]                     # (S,L,D,Nt)
        spac = state["spacings"]                 # (S,K)
        pairs = state["pairs"]                   # (Pr,2) global node ids
        tmpl = jnp.asarray(self.template.coords, jnp.float32)
        mask_w = (jnp.abs(jnp.asarray(self.mask, jnp.float32))
                  if self.mask is not None else None)
        pmax = self.pmax
        cprange = cfg.cprange
        percentile = cfg.percentile

        sa = pairs[:, 0] // K
        va = pairs[:, 0] % K
        sb = pairs[:, 1] // K
        vb = pairs[:, 1] % K

        def patch(s, v, l):
            """Top-pmax nearest template verts of RL[s,v,l] + in-range mask."""
            c = rl[s, v, l]                      # (...,3)
            d2 = (jnp.sum(tmpl**2, axis=1) - 2.0 * (c @ tmpl.T)
                  + jnp.sum(c * c, axis=-1)[..., None])
            chord = jnp.sqrt(jnp.maximum(d2, 0.0))
            dist = 2.0 * RAD * jnp.arcsin(jnp.clip(chord / (2 * RAD), -1, 1))
            npad = (-dist.shape[-1]) % 128   # lane-align top_k axis
            dp = jnp.pad(dist, [(0, 0)] * (dist.ndim - 1) + [(0, npad)],
                         constant_values=jnp.inf)
            neg, idx = jax.lax.top_k(-dp, pmax)
            idx = jnp.minimum(idx, dist.shape[-1] - 1)
            in_range = (-neg) < cprange * spac[s, v][..., None]
            return idx, in_range

        def fn(pa, pb):
            # pa/pb: (Pr,C) label indices
            idx_a, rng_a = patch(sa[:, None], va[:, None], pa)   # (Pr,C,pmax)
            _, rng_b_at_a = None, None
            # B's in-range test evaluated AT A's patch indices:
            cb = rl[sb[:, None], vb[:, None], pb]                # (Pr,C,3)
            ta = tmpl[idx_a]                                     # (Pr,C,pmax,3)
            chord = jnp.linalg.norm(ta - cb[:, :, None, :], axis=-1)
            db = 2.0 * RAD * jnp.arcsin(jnp.clip(chord / (2 * RAD), -1, 1))
            rng_b = db < (cprange * spac[sb, vb])[:, None, None]

            overlap = rng_a & rng_b                              # (Pr,C,pmax)
            da = maps[sa[:, None, None, None], pa[:, :, None, None],
                      jnp.arange(maps.shape[2])[None, None, :, None],
                      idx_a[:, :, None, :]]                      # (Pr,C,D,pmax)
            db_ = maps[sb[:, None, None, None], pb[:, :, None, None],
                       jnp.arange(maps.shape[2])[None, None, :, None],
                       idx_a[:, :, None, :]]
            if mask_w is not None:
                w = mask_w[idx_a][:, :, None, :]
                w = jnp.broadcast_to(w, da.shape)
            else:
                w = jnp.ones_like(da)
            m = jnp.broadcast_to(overlap[:, :, None, :], da.shape).astype(da.dtype)
            per_dim = simi.sim_for_min(da, db_, w, m, simval, percentile)
            cost = per_dim.mean(axis=-1)                         # mean over dims
            if cfg.fixnan:
                cost = jnp.where(jnp.isnan(cost), FIX_NAN, cost)
            return cost
        return fn

    # ---- outputs ---------------------------------------------------------
    def _out(self, name: str) -> str:
        d = os.path.dirname(self.outdir)
        if d:
            os.makedirs(d, exist_ok=True)
        return self.outdir + name

    def _write_outputs(self):
        self.transformed_data = []
        for s, mesh in enumerate(self.meshes):
            warped = rsp.sphere_project_warp(mesh, self.sph_orig, self.sph_reg[s])
            warped.save(self._out(f"sphere-{s}.reg" + self.surf_format))
            carrier = Mesh(coords=warped.coords, faces=warped.faces,
                           data=self.datasets[s])
            res, _ = rsp.metric_resample(carrier, self.template)
            res.save(self._out(f"transformed_and_reprojected-{s}"
                               + self.data_format))
            self.transformed_data.append(res.data)
