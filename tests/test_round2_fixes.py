"""Round-2 parity/robustness fixes: regmode-4 rejection, config list-length
validation, spconvert duplicate summing, subject-slice divisibility, the
descent deformation gate, dedrift identity, and group-driver observability."""
import json
import os

import numpy as np
import pytest

from newmsm_tpu.core.mesh import Mesh
from newmsm_tpu.reg.config import RegConfig, parse_config

from fixtures import smooth_pattern, rotation_matrix


def _write_config(tmp_path, lines):
    p = tmp_path / "conf"
    p.write_text("\n".join(lines) + "\n")
    return str(p)


class TestConfigValidation:
    def test_regmode4_rejected(self, tmp_path):
        # DiscreteCostFunction.cpp:102 / mesh_registration.cpp:102
        conf = _write_config(tmp_path, [
            "--opt=DISCRETE", "--dopt=HOCR", "--regoption=4"])
        with pytest.raises(ValueError, match="regoption 4 has been removed"):
            parse_config(conf)

    def test_regmode5_accepted_at_parse(self, tmp_path):
        conf = _write_config(tmp_path, [
            "--opt=DISCRETE", "--dopt=HOCR", "--regoption=5"])
        assert parse_config(conf).regmode == 5

    def test_anatgrid_length_validated(self, tmp_path):
        # mesh_registration.cpp:758-783 list-length contract
        conf = _write_config(tmp_path, [
            "--opt=DISCRETE,DISCRETE", "--dopt=HOCR",
            "--anatgrid=4"])
        with pytest.raises(ValueError, match="anatgrid"):
            parse_config(conf)

    def test_mciters_length_validated(self, tmp_path):
        conf = _write_config(tmp_path, [
            "--opt=DISCRETE,DISCRETE", "--dopt=MCMC",
            "--mciters=100"])
        with pytest.raises(ValueError, match="mciters"):
            parse_config(conf)


class TestReadSpmat:
    def test_duplicates_sum_and_dim_row_preserved(self, tmp_path):
        # MATLAB spconvert: duplicate triplets SUM; the trailing
        # `nrows ncols 0` row is dimensions only and must not zero a real
        # entry at (nrows, ncols)
        from newmsm_tpu.core.io import read_spmat
        p = tmp_path / "m.txt"
        p.write_text("1 1 2.0\n1 1 3.0\n2 3 7.0\n2 3 0\n")
        out = read_spmat(str(p))
        assert out.shape == (2, 3)
        assert out[0, 0] == pytest.approx(5.0)      # duplicates summed
        assert out[1, 2] == pytest.approx(7.0)      # not zeroed by dim row

    def test_plain_triplets(self, tmp_path):
        from newmsm_tpu.core.io import read_spmat
        p = tmp_path / "m.txt"
        p.write_text("1 2 1.5\n3 1 -2.0\n3 2 0\n")   # last row zero value
        out = read_spmat(str(p))
        assert out.shape == (3, 2)
        assert out[0, 1] == pytest.approx(1.5)
        assert out[2, 0] == pytest.approx(-2.0)


class TestSubjectSlice:
    def test_non_divisible_raises(self):
        from newmsm_tpu.parallel.multihost import (process_subject_slice,
                                                   subjects_device_mesh)
        mesh = subjects_device_mesh()
        n_dev = mesh.devices.size
        with pytest.raises(ValueError, match="divisible"):
            process_subject_slice(n_dev + 1, mesh=mesh)

    def test_divisible_covers_all(self):
        from newmsm_tpu.parallel.multihost import (process_subject_slice,
                                                   subjects_device_mesh)
        mesh = subjects_device_mesh()
        n_dev = mesh.devices.size
        sl = process_subject_slice(2 * n_dev, mesh=mesh)
        assert sl == slice(0, 2 * n_dev)   # single-process owns everything


class TestDescentGate:
    def _bump(self, res=3, p=1.0):
        """Fold-free meridian reparametrisation theta -> pi*(theta/pi)^p:
        monotone (no folds) but with unbounded compression at the pole for
        p > 1 — exactly the regime where the descent ball loses exactness."""
        m = Mesh.from_icosphere(res)
        m.true_rescale(100.0)
        c = m.coords.copy()
        r = np.linalg.norm(c, axis=1)
        theta = np.arccos(np.clip(c[:, 2] / r, -1, 1))
        phi = np.arctan2(c[:, 1], c[:, 0])
        theta2 = np.pi * (theta / np.pi) ** p
        c = np.stack([np.sin(theta2) * np.cos(phi),
                      np.sin(theta2) * np.sin(phi),
                      np.cos(theta2)], axis=1) * 100.0
        m.coords = c
        return m

    def test_mild_warp_keeps_descent(self):
        from newmsm_tpu.ops.nearest import build_tables
        m = self._bump(3, p=1.05)
        t = build_tables(m.coords, m.faces, m.adjacency[2])
        assert t.descent, "mild deformation should keep the fast descent path"

    def test_strong_warp_drops_descent(self):
        from newmsm_tpu.ops.nearest import (_max_edge_stretch, build_tables,
                                            _DESCENT_MAX_STRETCH)
        from newmsm_tpu.core.icosphere import icosphere
        m = self._bump(3, p=2.2)
        stretch = _max_edge_stretch(m.coords, m.faces,
                                    icosphere(3).coords * 100.0)
        assert stretch > _DESCENT_MAX_STRETCH   # fixture really is extreme
        t = build_tables(m.coords, m.faces, m.adjacency[2])
        assert t.descent == ()

    def test_dense_path_exact_on_strong_warp(self):
        """Stress test: on the gated (dense) path the selection must equal a
        brute-force pass of the same reference tier rules (octree.cpp:156-214)
        over ALL triangles — i.e. the 2-ring-of-nearest-vertex candidate set
        loses nothing even under extreme deformation."""
        import jax.numpy as jnp
        from newmsm_tpu.core import spherical as sph
        from newmsm_tpu.ops.nearest import _search, _select, build_tables
        m = self._bump(3, p=2.2)
        t = build_tables(m.coords, m.faces, m.adjacency[2])
        rng = np.random.default_rng(0)
        fv = m.coords[m.faces]
        w = rng.dirichlet([1, 1, 1], size=m.faces.shape[0])
        q = jnp.asarray(np.einsum("tj,tjc->tc", w, fv), jnp.float32)

        tri, _, _ = _search(q, t)

        # brute force: every SAME-SIDE triangle is a candidate for every
        # query (central projection hits antipodal triangle planes at
        # negative ray scale — those are artifacts a local candidate set can
        # never produce, so exclude them by masking far-side candidates)
        Tn = m.faces.shape[0]
        cand = jnp.broadcast_to(jnp.arange(Tn, dtype=jnp.int32)[None],
                                (q.shape[0], Tn))
        tv_all = jnp.broadcast_to(jnp.asarray(m.faces.astype(np.int32))[None],
                                  (q.shape[0], Tn, 3))
        vc_base = jnp.asarray(fv, jnp.float32)             # (Tn,3,3)
        centroid = vc_base.mean(axis=1)                    # (Tn,3)
        far = (q @ centroid.T) < 0.0                       # (Q,Tn)
        # push far-side candidates out of contention by moving their coords
        # to the query's antipode (projection fails containment there)
        anti = jnp.broadcast_to(-q[:, None, None, :], (q.shape[0], Tn, 3, 3))
        vc_all = jnp.where(far[..., None, None], anti,
                           jnp.broadcast_to(vc_base[None],
                                            (q.shape[0], Tn, 3, 3)))
        tri_bf, _, vc_bf = _select(q, cand, tv_all, vc_all, 100.0)

        # equality up to genuine ties: accept when the query's distance to
        # both selected triangles matches
        same = np.asarray(tri) == np.asarray(tri_bf)
        if not same.all():
            pp = sph.project_to_plane(q[:, None, :], vc_bf[:, None, 0],
                                      vc_bf[:, None, 1], vc_bf[:, None, 2])
            d_bf = np.linalg.norm(np.asarray(pp[:, 0]) - np.asarray(q), axis=1)
            _, _, vc_got = _search(q, t)
            pp2 = sph.project_to_plane(q[:, None, :], vc_got[:, None, 0],
                                       vc_got[:, None, 1], vc_got[:, None, 2])
            d_got = np.linalg.norm(np.asarray(pp2[:, 0]) - np.asarray(q), axis=1)
            bad = ~same & (np.abs(d_bf - d_got) > 1e-3)
            assert not bad.any(), (bad.sum(), d_bf[bad], d_got[bad])


class TestDedriftIdentity:
    def test_identical_warps_dedrift_to_identity(self):
        """run_gMSM.sh:70-117 contract: if every subject carries the SAME
        warp, the average IS that warp and dedrifting must return every
        subject to the identity (original sphere)."""
        from newmsm_tpu.pipelines.gmsm import dedrift
        orig = Mesh.from_icosphere(3)
        orig.true_rescale(100.0)
        warped = []
        for _ in range(4):
            m = orig.copy()
            R = rotation_matrix([0.2, 1.0, -0.4], 9.0)
            c = m.coords @ R.T
            # add a smooth non-rigid component so the warp is not a pure
            # rotation (harder case than TestDedrift's)
            c[:, 0] += 2.0 * np.sin(c[:, 1] / 40.0)
            c /= np.linalg.norm(c, axis=1, keepdims=True) / 100.0
            m.coords = c
            warped.append(m)
        ded = dedrift(warped, orig)
        for m in ded:
            assert np.abs(m.coords - orig.coords).max() < 1.0, \
                np.abs(m.coords - orig.coords).max()


class TestGroupObservability:
    def test_metrics_jsonl_and_debug_dumps(self, tmp_path):
        from newmsm_tpu.reg.group import GroupMeshRegistration
        from test_group import group_config, make_group
        meshes, datasets = make_group(2, res=2)
        gmr = GroupMeshRegistration()
        gmr.set_inputs(meshes)
        gmr.set_data_list(datasets)
        gmr.set_template(Mesh.from_icosphere(2))
        gmr.outdir = str(tmp_path) + "/"
        gmr.debug = True
        gmr.metrics_path = str(tmp_path / "metrics.jsonl")
        cfg = group_config(iters=1)
        cfg.datagrid = [2]
        cfg.sampgrid = [2]
        gmr.run_multiresolutions(cfg)

        lines = [json.loads(l) for l in
                 open(gmr.metrics_path).read().splitlines()]
        iters = [l for l in lines if l["event"] == "iter"]
        assert iters and {"energy", "changed", "setup_s", "opt_s"} <= set(iters[0])
        dumps = [f for f in os.listdir(tmp_path) if f.startswith(("SOURCE-",
                                                                  "CPgrid-"))]
        assert len(dumps) == 4   # 2 subjects x (SOURCE + CPgrid) x 1 iter
