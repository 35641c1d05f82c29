"""Pairwise multiresolution registration driver (Mesh_registration,
mesh_registration.cpp): level loop, warp propagation, discrete outer loop,
and output writing.
"""
from __future__ import annotations

import os
from typing import Optional

import jax.numpy as jnp
import numpy as np

from ..core.mesh import Mesh, create_exclusion
from ..core import io as mio
from ..ops import resample as rsp
from ..ops import histogram as hst
from ..ops.unfold import unfold
from . import featurespace as fsp
from .config import RegConfig, parse_config
from .model import ModelConfig, PairwiseModel
from .optimise import mcmc as MC
from .optimise import fusion as FU
from . import costs as C

RAD = 100.0


class MeshRegistration:
    """Pairwise registration: input sphere + data -> warped sphere aligned to
    the reference sphere + data."""

    def __init__(self):
        self.in_mesh: Optional[Mesh] = None
        self.ref_mesh: Optional[Mesh] = None
        self.in_data: Optional[np.ndarray] = None
        self.ref_data: Optional[np.ndarray] = None
        self.in_cfweight: Optional[np.ndarray] = None
        self.ref_cfweight: Optional[np.ndarray] = None
        self.transformed_mesh: Optional[Mesh] = None
        self.in_anat: Optional[Mesh] = None
        self.ref_anat: Optional[Mesh] = None
        self.outdir = "./"
        self.surf_format = ".surf.gii"
        self.data_format = ".func.gii"
        self.verbose = False
        self.debug = False
        self.energy_log: list = []
        self.metrics_path: Optional[str] = None   # JSONL per-iteration metrics

    def _log_metrics(self, **kw):
        """Structured observability (SURVEY §5): one JSON line per event —
        energy, label-change %, stage wall-times — replacing the reference's
        --verbose couts with something machine-readable."""
        if self.metrics_path:
            import json
            with open(self.metrics_path, "a") as f:
                f.write(json.dumps(kw) + "\n")

    # ---- inputs ----------------------------------------------------------
    def set_input(self, mesh: Mesh | str):
        m = Mesh.load(mesh) if isinstance(mesh, str) else mesh.copy()
        m.recentre()
        m.true_rescale(RAD)
        self.in_mesh = m

    def set_reference(self, mesh: Mesh | str):
        m = Mesh.load(mesh) if isinstance(mesh, str) else mesh.copy()
        m.recentre()
        m.true_rescale(RAD)
        self.ref_mesh = m

    def is_sparse(self, sp: bool = True):
        """Input data files are spconvert-format sparse connectivity
        matrices (mesh_registration.h:61; vestigial in the reference —
        newmsm's CLI never sets it — kept for API parity)."""
        self._issparse = bool(sp)

    def set_input_data(self, data: np.ndarray | str):
        self.in_data = (mio.load_data(data, self.in_mesh,
                                      sparse=getattr(self, "_issparse", False))
                        if isinstance(data, str) else np.atleast_2d(data))

    def set_reference_data(self, data: np.ndarray | str):
        self.ref_data = (mio.load_data(data, self.ref_mesh,
                                       sparse=getattr(self, "_issparse", False))
                         if isinstance(data, str) else np.atleast_2d(data))

    def set_transformed(self, mesh: Mesh | str):
        m = Mesh.load(mesh) if isinstance(mesh, str) else mesh.copy()
        self.transformed_mesh = m

    def set_input_cfweighting(self, w: np.ndarray | str):
        self.in_cfweight = (mio.load_data(w, self.in_mesh)
                            if isinstance(w, str) else np.atleast_2d(w))

    def set_reference_cfweighting(self, w: np.ndarray | str):
        self.ref_cfweight = (mio.load_data(w, self.ref_mesh)
                             if isinstance(w, str) else np.atleast_2d(w))

    def set_anatomical(self, in_anat: Mesh | str, ref_anat: Mesh | str):
        self.in_anat = Mesh.load(in_anat) if isinstance(in_anat, str) else in_anat
        self.ref_anat = Mesh.load(ref_anat) if isinstance(ref_anat, str) else ref_anat

    def set_output_format(self, fmt: str):
        if fmt == "GIFTI":
            self.surf_format, self.data_format = ".surf.gii", ".func.gii"
        elif fmt == "ASCII":
            self.surf_format, self.data_format = ".asc", ".dpv"
        elif fmt == "ASCII_MAT":
            self.surf_format, self.data_format = ".asc", ".txt"
        else:
            self.surf_format, self.data_format = ".vtk", ".txt"

    # ---- main entry ------------------------------------------------------
    def run_multiresolutions(self, config: RegConfig | str | None = None):
        # prove the Pallas locate kernel on the real backend once, before
        # any trace could bake in the unvalidated fallback (VERDICT r3 #1)
        from ..ops.pallas_locate import ensure_validated
        ensure_validated()
        if getattr(self, "profile_dir", None):
            # device-level tracing (SURVEY §5): one perfetto/xplane trace of
            # the whole run, viewable in TensorBoard / xprof
            import jax
            with jax.profiler.trace(self.profile_dir):
                return self._run_multiresolutions(config)
        return self._run_multiresolutions(config)

    def _run_multiresolutions(self, config: RegConfig | str | None = None):
        cfg = config if isinstance(config, RegConfig) else parse_config(config)
        self.cfg = cfg
        self.verbose = self.verbose or cfg.verbose
        if self.in_mesh is None or self.in_data is None:
            raise ValueError("input mesh and data must be set")
        if self.ref_mesh is None:
            self.ref_mesh = self.in_mesh.copy()
        if self.ref_data is None:
            self.ref_data = self.in_data.copy()

        self.sph_reg: Optional[Mesh] = None
        for level in range(cfg.levels):
            self.level = level + 1
            if self.verbose:
                print(f"-- level {self.level}/{cfg.levels} "
                      f"({cfg.cost[level]}, datagrid {cfg.datagrid[level]})")
            self._initialize_level(level)
            self._evaluate(level)
            if self.metrics_path and self.sph_reg is not None:
                # per-level warp distortion (diagnosis aid: which level
                # spends the deformation budget)
                from ..eval import metrics as _em
                areal, shape = _em.distortion_maps(self.sph_orig,
                                                   self.sph_reg)
                self._log_metrics(event="level_distortion",
                                  level=self.level,
                                  **{k: round(v, 4) for k, v in
                                     _em.distortion_stats(areal,
                                                          shape).items()})

        self._write_outputs()
        return self.sph_reg

    # ---- per-level -------------------------------------------------------
    def _initialize_level(self, level: int):
        cfg = self.cfg
        self.feat = fsp.initialise(
            [self.in_mesh, self.ref_mesh], [self.in_data, self.ref_data],
            cfg.datagrid[level], [cfg.sigma_in[level], cfg.sigma_ref[level]],
            exclude=cfg.exclude, cut=cfg.cut, thresholds=tuple(cfg.cutthreshold),
            intensity_norm=cfg.intensity_norm, variance_norm=cfg.variance_norm)
        self.sph_orig = Mesh(coords=self.feat.grid.coords.copy(),
                             faces=self.feat.grid.faces)

        # downsampled cfweightings (downsample_cfweighting,
        # mesh_registration.cpp:334-350)
        self.sphin_cfw = self._downsample_cfw(self.in_cfweight,
                                              self.feat.get_input_excl())
        self.sphref_cfw = self._downsample_cfw(self.ref_cfweight,
                                               self.feat.get_reference_excl())

        if cfg.cost[level] in ("RIGID", "AFFINE"):
            self.model = None
            return

        mc = ModelConfig(
            simval=cfg.simval[level], reglambda=cfg.reglambda[level],
            iters=cfg.iters[level], sg_res=cfg.sampgrid[level],
            regmode=cfg.regmode, mu=cfg.shearmod, kappa=cfg.bulkmod,
            k_exp=cfg.k_exponent, rexp=cfg.regexp, cprange=cfg.cprange,
            percentile=cfg.percentile, triclique=cfg.triclique,
            patchwise=cfg.patchwise, rescale_labels=cfg.rescaleL,
            multivariate=self.feat.dim > 1, mcparam=cfg.mcparam,
            fixnan=cfg.fixnan,
            bucket_labels=cfg.dopt != "MCMC")
        control = Mesh.from_icosphere(cfg.cpgrid[level])
        control.recentre()
        control.true_rescale(RAD)
        target = Mesh(coords=self.sph_orig.coords.copy(), faces=self.sph_orig.faces)
        self.model = PairwiseModel(mc, control, self.sph_orig, target,
                                   self.feat.get_input_data(),
                                   self.feat.get_reference_data())
        # regmode 4 is rejected at config parse (mesh_registration.cpp:102)
        if self.in_anat is not None and cfg.regmode == 5:
            self.model.anat = self._resample_anatomy(level, control)
        elif cfg.regmode == 5:
            raise ValueError("--regoption 5 requires anatomical meshes")

    def _resample_anatomy(self, level: int, control: Mesh):
        """Static aMSM tables (resample_anatomy, mesh_registration.cpp:250-332):
        anat-res icosphere with face lineage back to the CP grid, per-vertex
        barycentrics wrt the parent CP triangle, and the input/reference
        anatomies resampled onto it through the sphere correspondences."""
        import jax.numpy as jnp
        from ..core.icosphere import face_lineage_across, icosphere
        from ..ops.nearest import build_tables
        from .costs import AnatTables
        from ..core import spherical as sphm

        cfg = self.cfg
        cp_res = cfg.cpgrid[level]
        anat_res = cfg.anatgrid[level]
        if self.in_anat.nvertices != self.in_mesh.nvertices or \
                self.ref_anat.nvertices != self.ref_mesh.nvertices:
            raise ValueError("anatomical mesh resolution inconsistent with "
                             "spherical mesh resolution")

        a_ico = Mesh.from_icosphere(anat_res)
        lineage = face_lineage_across(cp_res, anat_res)          # (T, 4^d)

        # per anat-vertex barycentrics wrt the parent CP face's corners —
        # iterate parent faces in order so later parents overwrite shared
        # boundary vertices exactly like the reference loop (cpp:309-327)
        cpc = control.coords
        bary = np.zeros((a_ico.nvertices, 3))
        parent = np.zeros((a_ico.nvertices, 3), np.int32)
        for t in range(lineage.shape[0]):
            ids = control.faces[t]
            v0, v1, v2 = cpc[ids[0]], cpc[ids[1]], cpc[ids[2]]
            verts = np.unique(a_ico.faces[lineage[t]])
            w = np.asarray(sphm.barycentric_weights(
                jnp.asarray(v0)[None], jnp.asarray(v1)[None],
                jnp.asarray(v2)[None], jnp.asarray(a_ico.coords[verts])))
            bary[verts] = w
            parent[verts] = ids

        anat_orig = rsp.surface_resample(self.in_anat, self.in_mesh, a_ico)
        anat_target = rsp.surface_resample(self.ref_anat, self.ref_mesh, a_ico)

        return AnatTables(
            lineage=jnp.asarray(lineage),
            anat_faces=jnp.asarray(a_ico.faces.astype(np.int32)),
            anat_bary=jnp.asarray(bary, jnp.float32),
            anat_parent=jnp.asarray(parent),
            anat_sphere=build_tables(a_ico.coords, a_ico.faces,
                                     a_ico.adjacency[2]),
            anat_target=jnp.asarray(anat_target.coords, jnp.float32),
            anat_orig=jnp.asarray(anat_orig.coords, jnp.float32),
        )

    def _downsample_cfw(self, cfw, excl):
        if excl is not None:
            src = cfw if cfw is not None else excl[None, :]
            carrier = Mesh(coords=self.in_mesh.coords, faces=self.in_mesh.faces,
                           data=np.atleast_2d(src))
            out, _ = rsp.nearest_neighbour_interpolation(carrier, self.sph_orig, excl)
            return out.data
        if cfw is not None:
            carrier = Mesh(coords=self.in_mesh.coords, faces=self.in_mesh.faces,
                           data=np.atleast_2d(cfw))
            out, _ = rsp.nearest_neighbour_interpolation(carrier, self.sph_orig)
            return out.data
        return np.ones((1, self.sph_orig.nvertices))

    def _evaluate(self, level: int):
        self.sph_reg = self._project_cpgrid()
        if self.cfg.cost[level] in ("RIGID", "AFFINE"):
            from .rigid import rigid_align
            self.sph_reg = rigid_align(
                self.sph_reg, self.sph_orig, self.feat, self.cfg,
                iters=self.cfg.iters[level], simval=self.cfg.simval[level],
                verbose=self.verbose)
        else:
            self._run_discrete_opt(level)

    def _project_cpgrid(self) -> Mesh:
        """Warp propagation across levels (project_CPgrid,
        mesh_registration.cpp:131-162)."""
        sph_in = Mesh(coords=self.sph_orig.coords.copy(), faces=self.sph_orig.faces)
        if self.level == 1:
            if self.transformed_mesh is not None:
                sph_in = rsp.sphere_project_warp(sph_in, self.in_mesh,
                                                 self.transformed_mesh)
                if self.model is not None:
                    self.model.cp_grid = unfold(rsp.sphere_project_warp(
                        self.model.cp_grid, self.in_mesh, self.transformed_mesh),
                        self.verbose)
        elif self.sph_reg is not None:
            prev = self.sph_reg
            icotmp = Mesh.from_icosphere(prev.get_resolution())
            icotmp.true_rescale(RAD)
            incurrent = rsp.sphere_project_warp(self.in_mesh, icotmp, prev)
            sph_in = rsp.sphere_project_warp(sph_in, self.in_mesh, incurrent)
            if self.model is not None:
                self.model.cp_grid = unfold(rsp.sphere_project_warp(
                    self.model.cp_grid, self.in_mesh, incurrent), self.verbose)
        return unfold(sph_in, self.verbose)

    def _combine_weighting(self) -> np.ndarray:
        """(combine_weighting, mesh_registration.cpp:234-248)."""
        n = self.sph_reg.nvertices
        if self.in_cfweight is not None and self.ref_cfweight is not None:
            carrier = Mesh(coords=self.model.target.coords,
                           faces=self.model.target.faces, data=self.sphref_cfw)
            resampled = rsp.metric_resample(carrier, self.sph_reg)[0].data
            a, b = self.sphin_cfw, resampled
            rows = min(a.shape[0], b.shape[0])
            base = a if a.shape[0] >= b.shape[0] else b
            out = base.copy()
            out[:rows] = (a[:rows] + b[:rows]) / 2.0
            return out
        return np.ones((1, n))

    def _run_discrete_opt(self, level: int):
        import time as _time
        cfg = self.cfg
        model = self.model
        energy = 0.0
        for it in range(cfg.iters[level]):
            t_setup = _time.perf_counter()
            cfw = self._combine_weighting()
            model.source = self.sph_reg      # reset_meshspace
            s = model.setup_iteration(cfw)

            if self.debug:
                # per-iteration mesh dumps (DiscreteModel.cpp:234-240)
                self.sph_reg.save(self._out(f"SOURCE-{self.level}-{it}.surf.gii"))
                model.cp_grid.save(self._out(f"CPgrid-{self.level}-{it}.surf.gii"))
                if it == 0:
                    model.target.save(self._out(f"TARGET-{self.level}.surf.gii"))

            dopt = cfg.dopt
            t_opt = _time.perf_counter()
            labeling = jnp.asarray(model.labeling)
            if dopt == "MCMC":
                unary = (model.unary(s).T
                         if not cfg.triclique else
                         jnp.zeros((s["labels"].shape[0], s["cp"].shape[0]),
                                   jnp.float32))
                tcosts = C.triplet_cost_volume(
                    s["rl"], s["cp"], model.tables, cfg.reglambda[level],
                    cfg.shearmod, cfg.bulkmod, cfg.k_exponent, cfg.regexp)
                import jax
                key = jax.random.PRNGKey(42 + 1000 * self.level + it)
                labeling = MC.mcmc_optimise(
                    labeling, unary, tcosts, model.tables.triplets,
                    jnp.asarray(model.face_groups),
                    jnp.asarray(model.face_group_mask), key,
                    mciters=cfg.mciters[level],
                    num_labels=int(s["labels"].shape[0]),
                    dist_param=cfg.mcparam,
                    proposals=min(128, max(1, cfg.mciters[level])))
                newenergy = float(MC.total_energy(labeling, unary, tcosts,
                                                  model.tables.triplets))
            elif dopt in ("HOCR", "FastPD"):
                unary = model.unary(s).T                    # (L,K)
                tfn = model.triplet_combo_fn(s)
                if model.pairwise_mode:
                    pfn = model.pair_combo_fn(s)
                    # num_labels is passed TRACED: the padded label shape is
                    # one bucket per level, the alpha loop's trip count the
                    # real label count — one compiled program per level
                    labeling = FU.fusion_optimize(
                        labeling, unary,
                        jnp.zeros((0, 3), jnp.int32), model.fusion_tables,
                        lambda la, lb, lc: jnp.zeros(la.shape, jnp.float32),
                        jnp.int32(model.num_labels),
                        pairs=model.tables.pairs, pair_combo_fn=pfn)
                    newenergy = float(FU.fusion_energy(
                        labeling, unary, jnp.zeros((0, 3), jnp.int32),
                        lambda la, lb, lc: jnp.zeros(la.shape, jnp.float32),
                        pairs=model.tables.pairs, pair_combo_fn=pfn))
                    if self.metrics_path:
                        # MSMpair folding-gate activity (VERDICT r4 #3):
                        # how many (pair,la,lb) entries the FOLDING gate
                        # blocks, and whether the CHOSEN labeling ever
                        # lands on a gated entry (must be 0)
                        vol = C.pairwise_cost_volume(
                            s["rl"], s["cp"], model.tables,
                            cfg.reglambda[level], cfg.regexp)
                        gated = int(jnp.sum(vol >= 1e6))
                        lab_j = jnp.asarray(labeling)
                        pr = model.tables.pairs
                        chosen = vol[jnp.arange(pr.shape[0]),
                                     lab_j[pr[:, 0]], lab_j[pr[:, 1]]]
                        self._log_metrics(
                            event="fold_gate", level=self.level, iter=it,
                            gated_entries=gated,
                            gated_fraction=round(
                                gated / float(vol.size), 6),
                            chosen_gated=int(jnp.sum(chosen >= 1e6)))
                else:
                    labeling = FU.fusion_optimize(
                        labeling, unary, model.tables.triplets,
                        model.fusion_tables, tfn,
                        jnp.int32(model.num_labels))
                    newenergy = float(FU.fusion_energy(
                        labeling, unary, model.tables.triplets, tfn))
            else:
                raise ValueError(f"unknown optimiser {dopt}")

            labeling = np.asarray(labeling)
            t_done = _time.perf_counter()
            self.energy_log.append((self.level, it, newenergy))
            changed = float((labeling != 0).mean())
            if self.verbose:
                print(f"  iter {it}: energy {newenergy:.6f} "
                      f"({changed:.0%} nodes moved)  "
                      f"[setup {t_opt - t_setup:.2f}s opt {t_done - t_opt:.2f}s]")
            self._log_metrics(event="iter", level=self.level, iter=it,
                              energy=newenergy, changed=changed,
                              setup_s=round(t_opt - t_setup, 4),
                              opt_s=round(t_done - t_opt, 4))

            # convergence (mesh_registration.cpp:206-214)
            if (it > 2 and (it - 1) % 2 == 0
                    and energy - newenergy < 0.001 and dopt != "MCMC"):
                break

            prev_cp = model.cp_grid.copy()
            model.apply_labeling(labeling, s)
            new_cp = model.cp_grid
            self.sph_reg = rsp.sphere_project_warp(self.sph_reg, prev_cp, new_cp)
            new_cp = unfold(new_cp, self.verbose)
            model.cp_grid = new_cp
            self.sph_reg = unfold(self.sph_reg, self.verbose)
            energy = newenergy
            self._log_metrics(event="warp", level=self.level, iter=it,
                              warp_s=round(_time.perf_counter() - t_done, 4))

    # ---- outputs ---------------------------------------------------------
    def _out(self, name: str) -> str:
        """Output path: `outdir` is a basename PREFIX like the reference's
        -o (newmsm writes <outbase>sphere.reg...); a trailing separator makes
        it a directory."""
        d = os.path.dirname(self.outdir)
        if d:
            os.makedirs(d, exist_ok=True)
        return self.outdir + name

    def _write_outputs(self):
        # transform (mesh_registration.cpp:352-356)
        warped_in = rsp.sphere_project_warp(self.in_mesh, self.sph_orig,
                                            self.sph_reg)
        self.warped_input = warped_in
        warped_in.save(self._out("sphere.reg" + self.surf_format))
        self.sph_reg.save(self._out("sphere.LR.reg" + self.surf_format))
        self._save_transformed_data()

    def _save_transformed_data(self):
        """(save_transformed_data, mesh_registration.cpp:358-408)."""
        cfg = self.cfg
        data = self.in_data.copy()
        refdata = self.ref_data.copy()
        in_excl = ref_excl = None
        if cfg.exclude:
            m_in = Mesh(coords=self.in_mesh.coords, faces=self.in_mesh.faces,
                        data=data)
            m_ref = Mesh(coords=self.ref_mesh.coords, faces=self.ref_mesh.faces,
                         data=refdata)
            in_excl = create_exclusion(m_in, *cfg.cutthreshold)
            ref_excl = create_exclusion(m_ref, *cfg.cutthreshold)
        if cfg.intensity_norm:
            data = hst.multivariate_histogram_normalization(
                data, refdata, in_excl, ref_excl)

        carrier = Mesh(coords=self.warped_input.coords,
                       faces=self.warped_input.faces, data=data)
        out, _ = rsp.metric_resample(carrier, self.ref_mesh, in_excl)
        out.save(self._out("transformed_and_reprojected" + self.data_format))
        self.transformed_data = out.data

        if self.in_anat is not None and self.ref_anat is not None:
            anat_trans = rsp.project_anatomical_mesh(
                self.warped_input, self.ref_mesh, self.ref_anat)
            anat_trans.save(self._out("anat.reg.surf.gii"))
            from .strains_output import vertex_strains_mesh
            strains = vertex_strains_mesh(self.in_anat, anat_trans)
            strains.save(self._out("STRAINS.func.gii"))
