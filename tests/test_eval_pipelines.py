import numpy as np
import pytest

from newmsm_tpu.core.mesh import Mesh
from newmsm_tpu.eval import metrics
from newmsm_tpu.pipelines.gmsm import run_gmsm, run_cgmsm, dedrift
from newmsm_tpu.tools.resample_tools import main as tools_main

from fixtures import smooth_pattern, rotation_matrix
from test_group import make_group, group_config, mean_pairwise_corr


class TestMetrics:
    def test_identity_distortion_zero(self):
        m = Mesh.from_icosphere(3)
        areal, shape = metrics.distortion_maps(m, m)
        np.testing.assert_allclose(areal, 0.0, atol=1e-4)
        np.testing.assert_allclose(shape, 0.0, atol=1e-4)

    def test_uniform_scale_areal_only(self):
        m = Mesh.from_icosphere(3)
        m2 = m.copy()
        m2.coords = m.coords * 2.0
        areal, shape = metrics.distortion_maps(m, m2)
        np.testing.assert_allclose(areal, 2.0, atol=1e-3)   # log2(4)
        np.testing.assert_allclose(shape, 0.0, atol=1e-3)

    def test_dice_overlap(self):
        a = np.arange(100.0)
        assert metrics.dice_overlap(a, a) == pytest.approx(1.0)
        b = -a
        assert metrics.dice_overlap(a, b) < 0.2

    def test_stats_keys(self):
        m = Mesh.from_icosphere(2)
        m2 = m.copy()
        m2.coords = m.coords * 1.1
        areal, shape = metrics.distortion_maps(m, m2)
        st = metrics.distortion_stats(areal, shape)
        assert set(st) == {"areal_mean", "areal_max", "areal_95", "areal_98",
                           "shape_mean", "shape_max"}


class TestDedrift:
    def test_common_rotation_removed(self):
        # all subjects share the same rotation drift: dedrifting should
        # bring every sphere back near the original
        orig = Mesh.from_icosphere(3)
        R = rotation_matrix([0, 0, 1], 8.0)
        warped = []
        for _ in range(3):
            m = orig.copy()
            m.coords = m.coords @ R.T
            warped.append(m)
        ded = dedrift(warped, orig)
        for m in ded:
            assert np.abs(m.coords - orig.coords).max() < 1.5


class TestGMSMPipeline:
    def test_full_pipeline(self, tmp_path):
        meshes, datasets = make_group(3, degrees=8.0)
        res = run_gmsm(meshes, datasets, Mesh.from_icosphere(3),
                       group_config(iters=2), outdir=str(tmp_path) + "/")
        before = mean_pairwise_corr(datasets)
        assert res.stats["cc"] > before
        assert res.mean_map.shape[1] == 642
        assert np.isfinite(res.stats["areal_mean"])
        import os
        assert os.path.exists(str(tmp_path) + "/mean.func.gii")

    def test_cgmsm_tree(self):
        meshes, datasets = make_group(4, degrees=6.0)
        groups = {"A": [0, 1], "B": [2, 3]}
        ds = {i: (meshes[i], datasets[i]) for i in range(4)}
        state = run_cgmsm(groups, [("A", "B", "AB")], ds,
                          Mesh.from_icosphere(3), group_config(iters=2))
        assert set(state["AB"]["members"]) == {0, 1, 2, 3}
        assert state["AB"]["mean"].shape[1] == 642


class TestResampleTools:
    def test_metric_resample_tool(self, tmp_path):
        hi = Mesh.from_icosphere(4)
        hi.save(str(tmp_path / "hi.surf.gii"))
        carrier = Mesh(coords=hi.coords, faces=hi.faces,
                       data=smooth_pattern(hi.coords, 1)[None])
        carrier.save(str(tmp_path / "hi.func.gii"))
        lo = Mesh.from_icosphere(3)
        lo.save(str(tmp_path / "lo.surf.gii"))
        rc = tools_main(["metric-resample", str(tmp_path / "hi.surf.gii"),
                        str(tmp_path / "hi.func.gii"), str(tmp_path / "lo.surf.gii"),
                        str(tmp_path / "out.func.gii")])
        assert rc == 0
        from newmsm_tpu.core import io as mio
        out = mio.load_data(str(tmp_path / "out.func.gii"), lo)
        expected = smooth_pattern(lo.coords, 1)
        assert np.corrcoef(out[0], expected)[0, 1] > 0.99

    def test_applywarp_tool(self, tmp_path):
        sphere = Mesh.from_icosphere(3)
        grid = Mesh.from_icosphere(2)
        rot = grid.copy()
        R = rotation_matrix([0, 1, 0], 5.0)
        rot.coords = grid.coords @ R.T
        sphere.save(str(tmp_path / "s.surf.gii"))
        grid.save(str(tmp_path / "g.surf.gii"))
        rot.save(str(tmp_path / "r.surf.gii"))
        rc = tools_main(["applywarp", str(tmp_path / "s.surf.gii"),
                        str(tmp_path / "g.surf.gii"), str(tmp_path / "r.surf.gii"),
                        str(tmp_path / "w.surf.gii")])
        assert rc == 0
        w = Mesh.load(str(tmp_path / "w.surf.gii"))
        np.testing.assert_allclose(w.coords, sphere.coords @ R.T, atol=0.6)


class TestReports:
    def test_csv_roundtrip_and_plot(self, tmp_path):
        from newmsm_tpu.eval import reports
        stats = {"A": {"cc": 0.8, "dice": 0.6, "areal_mean": 0.2,
                       "areal_max": 1.0, "areal_95": 0.5, "areal_98": 0.6,
                       "shape_mean": 0.4, "shape_max": 1.5},
                 "B": {"cc": 0.7, "dice": 0.5, "areal_mean": 0.3,
                       "areal_max": 1.2, "areal_95": 0.6, "areal_98": 0.7,
                       "shape_mean": 0.5, "shape_max": 1.8}}
        p = str(tmp_path / "stats.csv")
        reports.group_stats_csv(stats, p)
        back = reports.read_group_stats_csv(p)
        assert back["A"]["cc"] == pytest.approx(0.8)
        rng = np.random.default_rng(0)
        png = str(tmp_path / "dist.png")
        reports.plot_distortions(
            {"A": [rng.normal(size=100)], "B": [rng.normal(size=100)]}, png)
        import os
        assert os.path.getsize(png) > 1000
