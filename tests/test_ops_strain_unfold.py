import numpy as np
import jax.numpy as jnp
import pytest

from newmsm_tpu.core.mesh import Mesh
from newmsm_tpu.ops import strain as strn
from newmsm_tpu.ops import unfold as ufd
from newmsm_tpu.ops import similarity as simi
from newmsm_tpu.ops import histogram as hst


def tri(*pts):
    return jnp.asarray(np.array(pts, dtype=np.float64)[None], jnp.float32)


class TestStrain:
    def test_identity_zero(self):
        a = tri([0, 0, 0], [1, 0, 0], [0, 1, 0])
        w = np.asarray(strn.triangular_strain(a, a, mu=0.4, kappa=1.6, k_exp=2.0))
        np.testing.assert_allclose(w, 0.0, atol=1e-5)

    def test_rotation_invariant(self):
        from scipy.spatial.transform import Rotation
        a = np.array([[0, 0, 0], [1.3, 0, 0], [0.2, 1.1, 0]])
        R = Rotation.from_euler("xyz", [20, -35, 60], degrees=True).as_matrix()
        b = a @ R.T + np.array([5, 6, 7.0])
        w = np.asarray(strn.triangular_strain(
            jnp.asarray(a[None], jnp.float32), jnp.asarray(b[None], jnp.float32),
            0.4, 1.6, 2.0))
        np.testing.assert_allclose(w, 0.0, atol=1e-4)

    def test_isotropic_scaling_bulk_only(self):
        # uniform scale s: R = 1, J = s^2 -> W = kappa/2 (J^k + J^-k - 2)
        a = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0.0]])
        s = 1.3
        b = a * s
        mu, kappa, k = 0.4, 1.6, 2.0
        w = float(strn.triangular_strain(jnp.asarray(a[None], jnp.float32),
                                         jnp.asarray(b[None], jnp.float32), mu, kappa, k)[0])
        J = s * s
        expected = 0.5 * kappa * (J**k + J**-k - 2)
        np.testing.assert_allclose(w, expected, rtol=1e-4)

    def test_pure_shear_mu_only(self):
        # area-preserving stretch (x*s, y/s): J = 1, R = s^2
        a = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0.0]])
        s = 1.4
        b = a * np.array([s, 1 / s, 1.0])
        mu, kappa, k = 0.4, 1.6, 2.0
        w = float(strn.triangular_strain(jnp.asarray(a[None], jnp.float32),
                                         jnp.asarray(b[None], jnp.float32), mu, kappa, k)[0])
        R = s * s
        expected = 0.5 * mu * (R**k + R**-k - 2)
        np.testing.assert_allclose(w, expected, rtol=1e-3)

    def test_principal_strains_for_uniaxial_stretch(self):
        a = np.array([[0, 0.0], [1, 0], [0, 1]])
        s = 1.2
        b = a * np.array([s, 1.0])
        ax, ay = jnp.asarray(a[None, :, 0]), jnp.asarray(a[None, :, 1])
        bx, by = jnp.asarray(b[None, :, 0]), jnp.asarray(b[None, :, 1])
        emax, emin = strn.principal_strains_2d(ax, ay, bx, by)
        # Green strain: E = (s^2 - 1)/2 along x, 0 along y
        np.testing.assert_allclose(float(emax[0]), (s * s - 1) / 2, rtol=1e-5)
        np.testing.assert_allclose(float(emin[0]), 0.0, atol=1e-5)


class TestVertexStrainsVectorised:
    def test_vectorised_matches_reference_loop(self):
        """The round-5 vectorised vertex_strains (exact k-NN candidates,
        batched quadratic fits/eigh) must reproduce the reference-shaped
        per-vertex loop bit-for-bit-close on a folded anatomical pair —
        the loop stalled the aMSM output stage for tens of minutes at
        ico-6 (O(N^2) distances + one JAX dispatch per vertex)."""
        from newmsm_tpu.reg import strains_output as SO
        m = Mesh.from_icosphere(3)
        m.true_rescale(100.0)
        anat = m.copy()
        u = np.asarray(m.coords) / 100.0
        fold = np.sin(u @ np.array([2.0, 1.0, 3.0]))
        anat.coords = m.coords * (1.0 + 0.08 * fold)[:, None] \
            * np.array([1.0, 1.0, 0.85])
        fin = anat.copy()
        fin.coords = anat.coords * (
            1.0 + 0.05 * np.cos(u @ np.array([1.0, 3.0, 2.0])))[:, None]
        vec = SO.vertex_strains(anat, fin, 2.0)
        loop, _ = SO._vertex_strains_loop(anat, fin, 2.0)
        np.testing.assert_allclose(vec, loop, atol=1e-10)
        assert np.isfinite(vec).all()


class TestUnfold:
    def test_clean_mesh_untouched(self):
        m = Mesh.from_icosphere(2)
        assert ufd.count_folds(m) == 0
        out = ufd.unfold(m)
        np.testing.assert_allclose(out.coords, m.coords, atol=1e-4)

    def test_folded_vertex_recovered(self):
        m = Mesh.from_icosphere(2)
        # push a vertex across its neighbours to create a fold
        nbr_idx, nbr_cnt, _, _ = m.adjacency
        v = 40
        nbrs = nbr_idx[v][nbr_idx[v] >= 0]
        centroid = m.coords[nbrs].mean(axis=0)
        # reflect vertex through the opposite side of its 1-ring
        m.coords[v] = centroid + 3.0 * (m.coords[nbrs[0]] - centroid)
        m.coords[v] *= 100.0 / np.linalg.norm(m.coords[v])
        assert ufd.count_folds(m) > 0
        out = ufd.unfold(m)
        assert ufd.count_folds(out) == 0
        np.testing.assert_allclose(np.linalg.norm(out.coords, axis=1), 100.0, atol=1e-3)


class TestSimilarity:
    def test_weighted_corr_perfect(self):
        a = jnp.asarray(np.random.default_rng(0).normal(size=(5, 32)))
        w = jnp.ones((5, 32))
        mask = jnp.ones((5, 32))
        r = np.asarray(simi.weighted_corr(a, 2.0 * a + 1.0, w, mask))
        np.testing.assert_allclose(r, 1.0, atol=1e-5)
        cost = np.asarray(simi.sim_for_min(a, 2 * a + 1, w, mask, 2))
        np.testing.assert_allclose(cost, 0.0, atol=1e-5)

    def test_corr_respects_mask(self):
        rng = np.random.default_rng(1)
        a = rng.normal(size=40)
        b = 3 * a + rng.normal(size=40) * 0.01
        b[30:] = rng.normal(size=10) * 10  # garbage in padded region
        mask = np.zeros(40)
        mask[:30] = 1
        r = float(simi.weighted_corr(jnp.asarray(a[None]), jnp.asarray(b[None]),
                                     jnp.ones((1, 40)), jnp.asarray(mask[None]))[0])
        assert r > 0.999

    def test_ssd(self):
        a = jnp.asarray([[1.0, 2.0, 3.0, 99.0]])
        b = jnp.asarray([[1.5, 2.5, 3.5, -99.0]])
        mask = jnp.asarray([[1.0, 1, 1, 0]])
        w = jnp.ones((1, 4))
        # sqrt(3*0.25)/3
        np.testing.assert_allclose(float(simi.weighted_ssd(a, b, w, mask)[0]),
                                   np.sqrt(0.75) / 3, rtol=1e-5)

    def test_dice_identical_top_quartile(self):
        rng = np.random.default_rng(2)
        a = rng.normal(size=(1, 64))
        d = float(simi.dice(jnp.asarray(a), jnp.asarray(a), jnp.ones((1, 64)), 0.75)[0])
        assert d == pytest.approx(0.0, abs=1e-6)

    def test_dice_disjoint(self):
        a = np.concatenate([np.ones(16), np.zeros(48)])
        b = np.concatenate([np.zeros(48), np.ones(16)])
        d = float(simi.dice(jnp.asarray(a[None]), jnp.asarray(b[None]),
                            jnp.ones((1, 64)), 0.75)[0])
        assert d == pytest.approx(1.0, abs=1e-6)


class TestHistogram:
    def test_match_shifts_distribution(self):
        rng = np.random.default_rng(3)
        src = rng.normal(5.0, 2.0, size=(1, 4000))
        ref = rng.normal(-1.0, 0.5, size=(1, 4000))
        out = hst.multivariate_histogram_normalization(src, ref)
        assert abs(out.mean() - ref.mean()) < 0.1
        assert abs(out.std() - ref.std()) < 0.1

    def test_match_monotone(self):
        rng = np.random.default_rng(4)
        src = rng.normal(size=(1, 1000))
        ref = rng.normal(size=(1, 1000)) * 3
        out = hst.multivariate_histogram_normalization(src, ref)
        order_in = np.argsort(src[0])
        assert (np.diff(out[0][order_in]) >= -1e-9).all()

    def test_variance_normalise_excl(self):
        rng = np.random.default_rng(5)
        data = rng.normal(7.0, 3.0, size=(2, 500))
        excl = np.ones(500)
        excl[::5] = 0.0
        out = hst.variance_normalise(data, excl)
        incl = excl != 0
        np.testing.assert_allclose(out[:, incl].mean(axis=1), 0.0, atol=1e-12)
        np.testing.assert_allclose(out[:, incl].std(axis=1, ddof=1), 1.0, atol=1e-12)
        np.testing.assert_array_equal(out[:, ~incl], data[:, ~incl])
