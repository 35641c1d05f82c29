import numpy as np
import pytest

from newmsm_tpu.core.mesh import Mesh
from newmsm_tpu.reg.config import RegConfig
from newmsm_tpu.reg.group import GroupMeshRegistration

from fixtures import smooth_pattern, rotation_matrix, alignment_correlation


def group_config(iters=3, lam=0.1):
    cfg = RegConfig()
    cfg.cost = ["DISCRETE"]
    cfg.simval = [2]
    cfg.iters = [iters]
    cfg.sigma_in = [0.0]
    cfg.sigma_ref = [0.0]
    cfg.reglambda = [lam]
    cfg.datagrid = [3]
    cfg.cpgrid = [1]
    cfg.sampgrid = [3]
    cfg.anatgrid = [3]
    cfg.mciters = [50]
    cfg.dopt = "HOCR"
    cfg.regmode = 3
    return cfg


def make_group(n_subjects=3, res=3, degrees=8.0, seed=0):
    """Subjects share one pattern, each rotated a different way."""
    meshes, datasets = [], []
    axes = [[1, 0.2, 0], [0, 1, 0.3], [0.2, 0, 1], [1, 1, 0], [0, 1, 1]]
    for s in range(n_subjects):
        m = Mesh.from_icosphere(res)
        R = rotation_matrix(axes[s % len(axes)], degrees * (s - n_subjects / 2))
        data = smooth_pattern(m.coords @ R.T, seed)[None, :]
        meshes.append(m)
        datasets.append(data)
    return meshes, datasets


def mean_pairwise_corr(maps):
    cors = []
    for i in range(len(maps)):
        for j in range(i + 1, len(maps)):
            cors.append(alignment_correlation(maps[i], maps[j]))
    return float(np.mean(cors))


class TestGroupwise:
    def test_group_improves_coalignment(self):
        meshes, datasets = make_group(3, degrees=8.0)
        gmr = GroupMeshRegistration()
        gmr.set_inputs(meshes)
        gmr.set_data_list(datasets)
        gmr.set_template(Mesh.from_icosphere(3))
        gmr.verbose = True
        import tempfile
        gmr.outdir = tempfile.mkdtemp() + "/"
        gmr.run_multiresolutions(group_config(iters=3))

        before = mean_pairwise_corr(datasets)
        after = mean_pairwise_corr(gmr.transformed_data)
        assert after > before, (before, after)

    def test_group_requires_multiple_subjects(self):
        gmr = GroupMeshRegistration()
        gmr.set_inputs([Mesh.from_icosphere(2)])
        gmr.set_data_list([np.zeros((1, 162))])
        gmr.set_template(Mesh.from_icosphere(2))
        with pytest.raises(ValueError):
            gmr.run_multiresolutions(group_config())

    def test_group_rejects_rigid(self):
        meshes, datasets = make_group(2)
        gmr = GroupMeshRegistration()
        gmr.set_inputs(meshes)
        gmr.set_data_list(datasets)
        gmr.set_template(Mesh.from_icosphere(3))
        cfg = group_config()
        cfg.cost = ["RIGID"]
        with pytest.raises(ValueError):
            gmr.run_multiresolutions(cfg)


class TestGroupExtras:
    def test_group_mask_weighting(self):
        meshes, datasets = make_group(2, degrees=6.0)
        gmr = GroupMeshRegistration()
        gmr.set_inputs(meshes)
        gmr.set_data_list(datasets)
        tmpl = Mesh.from_icosphere(3)
        gmr.set_template(tmpl)
        mask = (tmpl.coords[:, 2] < 0).astype(float)
        gmr.set_mask(mask)
        import tempfile
        gmr.outdir = tempfile.mkdtemp() + "/"
        gmr.run_multiresolutions(group_config(iters=2))
        assert len(gmr.transformed_data) == 2

    def test_group_two_levels(self):
        meshes, datasets = make_group(2, degrees=6.0, res=4)
        cfg = group_config(iters=2)
        cfg.cost = ["DISCRETE", "DISCRETE"]
        cfg.simval = [2, 2]; cfg.iters = [2, 2]
        cfg.sigma_in = [0.0, 0.0]; cfg.sigma_ref = [0.0, 0.0]
        cfg.reglambda = [0.1, 0.1]
        cfg.datagrid = [3, 4]; cfg.cpgrid = [1, 2]
        cfg.sampgrid = [3, 4]; cfg.anatgrid = [3, 4]
        cfg.mciters = [50, 50]
        gmr = GroupMeshRegistration()
        gmr.set_inputs(meshes)
        gmr.set_data_list(datasets)
        gmr.set_template(Mesh.from_icosphere(4))
        import tempfile
        gmr.outdir = tempfile.mkdtemp() + "/"
        gmr.run_multiresolutions(cfg)
        before = mean_pairwise_corr(datasets)
        after = mean_pairwise_corr(gmr.transformed_data)
        assert after > before, (before, after)
