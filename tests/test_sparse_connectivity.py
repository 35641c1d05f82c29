"""Sparse connectivity path (VERDICT round-2 item #9): ico-6-scale
connectomes load, prep, and register without ever materialising the dense
matrix (core/sparse.py). The reference's own --issparse path is vestigial
(featurespace.cpp:67-72 overwrites the SpMat with densified mesh pvalues);
this is the working equivalent."""
import numpy as np
import pytest
import scipy.sparse as sp

from newmsm_tpu.core import sparse as spc
from newmsm_tpu.core.mesh import Mesh


def random_connectome(n_rows, n_cols, nnz_per_col, seed=0):
    rng = np.random.default_rng(seed)
    rows = rng.integers(0, n_rows, size=(n_cols, nnz_per_col)).ravel()
    cols = np.repeat(np.arange(n_cols), nnz_per_col)
    vals = np.abs(rng.normal(size=rows.shape))
    return sp.coo_matrix((vals, (rows, cols)),
                         shape=(n_rows, n_cols)).tocsr()


class TestSparseOps:
    def test_load_roundtrip_matches_dense_reader(self, tmp_path):
        from newmsm_tpu.core.io import read_spmat
        rng = np.random.default_rng(0)
        r = rng.integers(1, 20, 40)
        c = rng.integers(1, 15, 40)
        v = rng.normal(size=40)
        path = tmp_path / "mat.txt"
        with open(path, "w") as f:
            for i in range(40):
                f.write(f"{r[i]} {c[i]} {v[i]:.8f}\n")
            f.write("20 15 0\n")
        dense = read_spmat(str(path))
        sparse = spc.load_sparse(str(path))
        assert sparse.shape == (20, 15)
        np.testing.assert_allclose(np.asarray(sparse.todense()), dense,
                                   atol=1e-6)

    def test_resample_columns_matches_dense_metric_resample(self):
        from newmsm_tpu.ops.resample import metric_resample
        src = Mesh.from_icosphere(3)
        src.true_rescale(100.0)
        dst = Mesh.from_icosphere(2)
        dst.true_rescale(100.0)
        C = random_connectome(50, src.nvertices, 5)
        Cr = spc.resample_columns(C, src, dst)
        assert sp.issparse(Cr) and Cr.shape == (50, dst.nvertices)
        carrier = Mesh(coords=src.coords, faces=src.faces,
                       data=np.asarray(C.todense()))
        ref, _ = metric_resample(carrier, dst)
        np.testing.assert_allclose(np.asarray(Cr.todense()),
                                   np.asarray(ref.data), atol=1e-4)

    def test_smooth_columns_matches_dense_smooth(self):
        from newmsm_tpu.ops.resample import smooth_data
        m = Mesh.from_icosphere(2)
        m.true_rescale(100.0)
        C = random_connectome(30, m.nvertices, 4)
        Cs = spc.smooth_columns(C, m, sigma=8.0)
        carrier = Mesh(coords=m.coords, faces=m.faces,
                       data=np.asarray(C.todense()))
        ref, _ = smooth_data(carrier, 8.0)
        np.testing.assert_allclose(np.asarray(Cs.todense()),
                                   np.asarray(ref.data), atol=1e-4)

    def test_pearson_columns_exact(self):
        C = random_connectome(200, 30, 8, seed=1)
        D = np.asarray(C.todense())
        ia = np.arange(10)
        ib = np.arange(10, 20)
        got = spc.pearson_columns(C, C, ia, ib)
        for k in range(10):
            ref = np.corrcoef(D[:, ia[k]], D[:, ib[k]])[0, 1]
            assert got[k] == pytest.approx(ref, abs=1e-10)


class TestIco6Registration:
    def test_ico6_connectome_registers_without_densifying(self, tmp_path):
        """A 40962x40962 connectome (dense would be ~13 GB) drives a real
        discrete registration through sparse prep + seed-feature reduction.
        Peak memory stays at the sparse nnz + (F,N) features."""
        from newmsm_tpu.reg.driver import MeshRegistration
        from newmsm_tpu.reg.config import RegConfig

        n6 = 40962
        sphere6 = Mesh.from_icosphere(6)
        sphere6.true_rescale(100.0)
        C = random_connectome(n6, n6, 10, seed=2)       # ~410k nnz
        assert C.shape == (n6, n6)

        # prep entirely sparse: resample onto the ico-3 datagrid
        dg = Mesh.from_icosphere(3)
        dg.true_rescale(100.0)
        Cr = spc.resample_columns(C, sphere6, dg)
        assert sp.issparse(Cr) and Cr.shape == (n6, dg.nvertices)

        # seed-feature reduction: (F, N) dense, F << R
        seeds = np.linspace(0, n6 - 1, 8).astype(int)
        feats = spc.seed_features(Cr, seeds)
        assert feats.shape == (8, dg.nvertices)

        # smooth the reduced features to give the synthetic connectome
        # spatial structure worth aligning, then register a rotated
        # resampling of the same pattern
        import jax.numpy as jnp
        from newmsm_tpu.ops.nearest import barycentric_coords, build_tables
        from newmsm_tpu.ops.resample import apply_weights, smooth_data
        carrier = Mesh(coords=dg.coords, faces=dg.faces, data=feats)
        sm, _ = smooth_data(carrier, 12.0)
        ref_data = np.asarray(sm.data)
        from fixtures import rotation_matrix
        R = rotation_matrix([0.2, 1.0, 0.1], 8.0)
        tabs = build_tables(dg.coords, dg.faces, dg.adjacency[2])
        idx, w = barycentric_coords(
            jnp.asarray(dg.coords @ R.T, jnp.float32), tabs)
        in_data = np.asarray(apply_weights(idx, w,
                                           jnp.asarray(ref_data, jnp.float32)))

        cfg = RegConfig()
        cfg.cost = ["DISCRETE"]
        cfg.simval = [2]
        cfg.iters = [2]
        cfg.sigma_in = [0.0]
        cfg.sigma_ref = [0.0]
        cfg.reglambda = [0.1]
        cfg.datagrid = [3]
        cfg.cpgrid = [1]
        cfg.sampgrid = [3]
        cfg.anatgrid = [3]
        cfg.mciters = [0]
        cfg.dopt = "HOCR"
        cfg.regmode = 3

        mr = MeshRegistration()
        mr.set_input(Mesh(coords=dg.coords.copy(), faces=dg.faces))
        mr.set_reference(Mesh(coords=dg.coords.copy(), faces=dg.faces))
        mr.set_input_data(in_data)
        mr.set_reference_data(ref_data)
        mr.outdir = str(tmp_path) + "/"
        mr.run_multiresolutions(cfg)

        before = np.corrcoef(in_data.ravel(), ref_data.ravel())[0, 1]
        after = np.corrcoef(np.asarray(mr.transformed_data).ravel(),
                            ref_data.ravel())[0, 1]
        assert after > before, (before, after)
