import numpy as np
import jax.numpy as jnp
import pytest

from newmsm_tpu.core.mesh import Mesh
from newmsm_tpu.core import spherical as sph
from newmsm_tpu.ops import nearest as nst
from newmsm_tpu.ops import resample as rsp


def warped_icosphere(res, amplitude=0.05, seed=0):
    """Smoothly warped icosphere at radius 100 (synthetic deformed sphere)."""
    m = Mesh.from_icosphere(res)
    c = m.coords / 100.0
    warp = np.stack([
        np.sin(3 * c[:, 0]) * np.cos(2 * c[:, 1]),
        np.sin(2 * c[:, 1]) * np.cos(3 * c[:, 2]),
        np.sin(2 * c[:, 2]) * np.cos(2 * c[:, 0]),
    ], axis=1)
    new = c + amplitude * warp
    new /= np.linalg.norm(new, axis=1, keepdims=True)
    m.coords = new * 100.0
    return m


def brute_force_closest_triangle(q, mesh):
    """Reference octree tier-1 logic in numpy float64, over ALL triangles."""
    v0 = mesh.coords[mesh.faces[:, 0]]
    v1 = mesh.coords[mesh.faces[:, 1]]
    v2 = mesh.coords[mesh.faces[:, 2]]

    def project(p):
        s1 = v2 - v0
        s1 = s1 / np.linalg.norm(s1, axis=1, keepdims=True)
        s2 = v1 - v0
        s2 = s2 / np.linalg.norm(s2, axis=1, keepdims=True)
        n = np.cross(s1, s2)
        n /= np.linalg.norm(n, axis=1, keepdims=True)
        si = np.sum(n * v0, axis=1) / np.sum(n * p[None, :], axis=1)
        return p[None, :] * si[:, None]

    def same_side(p1, p2, a, b):
        c1 = np.cross(b - a, p1 - a)
        c2 = np.cross(b - a, p2 - a)
        return np.sum(c1 * c2, axis=1) > -1e-8

    centroid = (v0 + v1 + v2) / 3.0
    results = []
    for p in q:
        pp = project(p)
        # restrict to local triangles, as the reference octree leaf does:
        # the planar ray-projection also "contains" antipodal faces
        local = np.linalg.norm(centroid - p[None, :], axis=1) < 25.0
        cont = (same_side(pp, v0, v1, v2) & same_side(pp, v1, v2, v0)
                & same_side(pp, v2, v0, v1)) & local
        d = np.full(len(v0), np.inf)
        for t in np.nonzero(cont)[0]:
            dmin = np.inf
            x0 = pp[t]
            for a, b in ((v0[t], v1[t]), (v0[t], v2[t]), (v1[t], v2[t])):
                u = b - a
                if np.dot(x0 - a, u) > 0 and np.dot(x0 - b, u) < 0:
                    dmin = min(dmin, np.linalg.norm(np.cross(x0 - a, x0 - b)) / np.linalg.norm(u))
            for vv in (v0[t], v1[t], v2[t]):
                dmin = min(dmin, np.linalg.norm(x0 - vv))
            d[t] = dmin
        results.append(np.argmin(d) if np.isfinite(d).any() else -1)
    return np.array(results)


class TestNearest:
    def test_matches_bruteforce_on_deformed_sphere(self):
        target = warped_icosphere(3, amplitude=0.08)
        rng = np.random.default_rng(7)
        q = rng.normal(size=(100, 3))
        q = q / np.linalg.norm(q, axis=1, keepdims=True) * 100.0

        tables = nst.build_tables(target.coords, target.faces, target.adjacency[2])
        got = np.asarray(nst.nearest_triangle(jnp.asarray(q, jnp.float32), tables))
        want = brute_force_closest_triangle(q, target)

        ok = want >= 0
        agree = got[ok] == want[ok]
        # allow rare boundary ties: when disagreeing, the resampled position
        # must still be equivalent (projected point within both triangles)
        assert agree.mean() > 0.97, f"only {agree.mean():.2%} agreement"
        for i in np.nonzero(~agree)[0]:
            t1, t2 = got[ok][i], want[ok][i]
            shared = len(set(target.faces[t1]) & set(target.faces[t2]))
            assert shared >= 1, "disagreeing triangles are not even adjacent"

    def test_closest_vertex_identity(self):
        m = Mesh.from_icosphere(3)
        tables = nst.build_tables(m.coords, m.faces, m.adjacency[2])
        cv = np.asarray(nst.closest_vertex(jnp.asarray(m.coords, jnp.float32), tables))
        np.testing.assert_array_equal(cv, np.arange(m.nvertices))

    def test_barycentric_partition(self):
        m = Mesh.from_icosphere(3)
        tables = nst.build_tables(m.coords, m.faces, m.adjacency[2])
        rng = np.random.default_rng(1)
        q = rng.normal(size=(64, 3))
        q = q / np.linalg.norm(q, axis=1, keepdims=True) * 100.0
        idx, w = nst.barycentric_coords(jnp.asarray(q, jnp.float32), tables)
        w = np.asarray(w)
        np.testing.assert_allclose(w.sum(axis=1), 1.0, atol=1e-4)
        assert (w > -1e-3).all()
        # reconstructing the query from weights lands on the triangle plane
        recon = np.einsum("qj,qjk->qk", w, m.coords[np.asarray(idx)])
        np.testing.assert_allclose(np.linalg.norm(recon, axis=1), 100.0, rtol=0.01)


class TestResample:
    def test_constant_preserved(self):
        hi = Mesh.from_icosphere(4)
        hi.set_data(np.full((1, hi.nvertices), 3.25))
        lo = Mesh.from_icosphere(3)
        out, _ = rsp.metric_resample(hi, lo)
        np.testing.assert_allclose(out.data, 3.25, atol=1e-4)

    def test_smooth_function_roundtrip(self):
        hi = Mesh.from_icosphere(4)
        f = np.sin(hi.coords[:, 0] / 20.0) * np.cos(hi.coords[:, 1] / 30.0)
        hi.set_data(f)
        lo = Mesh.from_icosphere(3)
        out, _ = rsp.metric_resample(hi, lo)
        expected = np.sin(lo.coords[:, 0] / 20.0) * np.cos(lo.coords[:, 1] / 30.0)
        # adaptive-barycentric downsampling is an area-weighted local average,
        # so it deviates from the point sample by O(spacing^2 * curvature)
        err = np.abs(out.data[0] - expected)
        assert err.max() < 0.12, err.max()
        assert err.mean() < 0.02, err.mean()

    def test_upsample(self):
        lo = Mesh.from_icosphere(3)
        f = np.sin(lo.coords[:, 0] / 20.0)
        lo.set_data(f)
        hi = Mesh.from_icosphere(4)
        out, _ = rsp.metric_resample(lo, hi)
        expected = np.sin(hi.coords[:, 0] / 20.0)
        # bounded by the linear-interpolation error h^2 |f''| / 8 ~ 0.085
        assert np.abs(out.data[0] - expected).max() < 0.09

    def test_exclusion_zeroes_and_mask_resampled(self):
        hi = Mesh.from_icosphere(4)
        hi.set_data(np.ones((1, hi.nvertices)))
        excl = np.ones(hi.nvertices)
        excl[hi.coords[:, 2] > 0] = 0.0   # exclude northern hemisphere
        lo = Mesh.from_icosphere(3)
        out, new_excl = rsp.metric_resample(hi, lo, excl)
        north = lo.coords[:, 2] > 20
        south = lo.coords[:, 2] < -20
        assert np.abs(out.data[0][north]).max() < 1e-5
        np.testing.assert_allclose(out.data[0][south], 1.0, atol=1e-4)
        assert new_excl is not None
        assert new_excl[north].max() < 1e-5
        np.testing.assert_allclose(new_excl[south], 1.0, atol=1e-4)

    def test_nn_interpolation(self):
        hi = Mesh.from_icosphere(4)
        hi.set_data(np.arange(hi.nvertices, dtype=float))
        lo = Mesh.from_icosphere(3)
        out, _ = rsp.nearest_neighbour_interpolation(hi, lo)
        # first 642 hi vertices coincide with lo vertices (nested icospheres)
        np.testing.assert_array_equal(out.data[0][:642], np.arange(642))

    def test_sphere_project_warp_identity(self):
        m = Mesh.from_icosphere(3)
        grid = Mesh.from_icosphere(2)
        warped = rsp.sphere_project_warp(m, grid, grid)
        np.testing.assert_allclose(warped.coords, m.coords, atol=2e-3)

    def test_sphere_project_warp_rotation(self):
        # warping through a rotated control grid rotates the sphere
        from scipy.spatial.transform import Rotation
        R = Rotation.from_euler("z", 10, degrees=True).as_matrix()
        m = Mesh.from_icosphere(3)
        grid = Mesh.from_icosphere(2)
        grid_rot = grid.copy()
        grid_rot.coords = grid.coords @ R.T
        warped = rsp.sphere_project_warp(m, grid, grid_rot)
        np.testing.assert_allclose(warped.coords, m.coords @ R.T, atol=0.5)

    def test_smoothing_preserves_constant_and_reduces_variance(self):
        # note: the smoothing support angle is 4*asin(sigma/200); sigma must
        # exceed ~half the vertex spacing for any neighbours to be included
        m = Mesh.from_icosphere(4)
        rng = np.random.default_rng(5)
        noisy = np.sin(m.coords[:, 0] / 15) + 0.5 * rng.normal(size=m.nvertices)
        m.set_data(np.stack([np.full(m.nvertices, 2.0), noisy]))
        out, _ = rsp.smooth_data(m, sigma=10.0)
        np.testing.assert_allclose(out.data[0], 2.0, atol=1e-4)
        assert np.var(out.data[1] - np.sin(m.coords[:, 0] / 15)) < 0.25 * np.var(
            noisy - np.sin(m.coords[:, 0] / 15))

    def test_surface_resample(self):
        anat = Mesh.from_icosphere(3)
        anat.coords = anat.coords * 0.7  # "anatomical" mesh: shrunken sphere
        sph_orig = Mesh.from_icosphere(3)
        lo = Mesh.from_icosphere(2)
        out = rsp.surface_resample(anat, sph_orig, lo)
        np.testing.assert_allclose(np.linalg.norm(out.coords, axis=1), 70.0, rtol=1e-3)


class TestPristineLocate:
    """Analytic subdivision-descent point location (ops/nearest.py
    _locate_pristine_soa) — including the fid/corner consistency guarantee
    under jit for queries exactly on face boundaries (the lax.scan-carry
    materialisation; fused recompute desynchronised them)."""

    def test_matches_search_on_random_queries(self):
        import dataclasses
        import jax.numpy as jnp
        from newmsm_tpu.core.mesh import Mesh
        from newmsm_tpu.ops import nearest as NN

        m = Mesh.from_icosphere(4)
        m.true_rescale(100.0)
        t = NN.build_tables(m.coords, m.faces)
        assert t.pristine_res == 4
        rng = np.random.default_rng(7)
        q = rng.normal(size=(2000, 3))
        q = q / np.linalg.norm(q, axis=1, keepdims=True) * 100.0
        qf = jnp.asarray(q, jnp.float32)
        data = np.sin(m.coords[:, 0] / 15.0)

        tv_p, w_p = NN.barycentric_coords(qf, t)
        tv_d, w_d = NN.barycentric_coords(
            qf, dataclasses.replace(t, pristine_res=-1))
        vp = (data[np.asarray(tv_p)] * np.asarray(w_p)).sum(1)
        vd = (data[np.asarray(tv_d)] * np.asarray(w_d)).sum(1)
        np.testing.assert_allclose(vp, vd, atol=5e-5)

    def test_fid_corner_consistency_on_vertex_queries(self):
        """Queries exactly at mesh vertices lie on many face boundaries —
        under jit the chosen face and the barycentric weights must stay
        consistent (reconstruction lands back on the query)."""
        import jax
        import jax.numpy as jnp
        from newmsm_tpu.core.mesh import Mesh
        from newmsm_tpu.ops import nearest as NN

        m = Mesh.from_icosphere(4)
        m.true_rescale(100.0)
        t = NN.build_tables(m.coords, m.faces)
        q = jnp.asarray(m.coords, jnp.float32)       # every vertex

        @jax.jit
        def interp_positions(q):
            tv, w = NN.barycentric_coords(q, t)
            return jnp.sum(t.coords[tv] * w[..., None], axis=1)

        rec = np.asarray(interp_positions(q))
        err = np.linalg.norm(rec - np.asarray(q), axis=1)
        assert err.max() < 1e-2, err.max()

    def test_resample_pristine_partition_of_unity(self):
        import jax.numpy as jnp
        from newmsm_tpu.core.mesh import Mesh
        from newmsm_tpu.ops import nearest as NN

        m = Mesh.from_icosphere(3)
        m.true_rescale(100.0)
        t = NN.build_tables(m.coords, m.faces)
        ones = jnp.ones((1, m.nvertices), jnp.float32)
        rng = np.random.default_rng(1)
        q = rng.normal(size=(500, 3))
        q = q / np.linalg.norm(q, axis=1, keepdims=True) * 100.0
        out = NN.resample_pristine(jnp.asarray(q, jnp.float32), t, ones)
        np.testing.assert_allclose(np.asarray(out), 1.0, atol=1e-5)
