import numpy as np
import jax.numpy as jnp
import pytest

from newmsm_tpu.core.icosphere import icosphere, resolution_from_nvertices, face_lineage_across
from newmsm_tpu.core.mesh import Mesh, create_exclusion
from newmsm_tpu.core import spherical as sph


class TestIcosphere:
    @pytest.mark.parametrize("res,nv,nt", [(0, 12, 20), (1, 42, 80), (2, 162, 320),
                                           (3, 642, 1280), (4, 2562, 5120)])
    def test_counts(self, res, nv, nt):
        ico = icosphere(res)
        assert ico.nvertices == nv
        assert ico.ntriangles == nt
        assert resolution_from_nvertices(nv) == res

    def test_unit_radius(self):
        ico = icosphere(3)
        np.testing.assert_allclose(np.linalg.norm(ico.coords, axis=1), 1.0, atol=1e-12)

    def test_valences(self):
        ico = icosphere(3)
        # 12 original vertices have valence 5, the rest 6
        assert (ico.nbr_cnt == 5).sum() == 12
        assert (ico.nbr_cnt == 6).sum() == ico.nvertices - 12
        assert (ico.tri_cnt == ico.nbr_cnt).all()

    def test_euler_characteristic(self):
        ico = icosphere(4)
        edges = set()
        for a, b, c in ico.faces:
            for e in ((a, b), (b, c), (a, c)):
                edges.add((min(e), max(e)))
        assert ico.nvertices - len(edges) + ico.ntriangles == 2

    def test_first_hexavalent(self):
        assert icosphere(2).first_hexavalent_vertex() == 12

    def test_lineage(self):
        lin = face_lineage_across(2, 4)
        assert lin.shape == (320, 16)
        # children partition the fine faces exactly
        assert np.sort(lin.ravel()).tolist() == list(range(5120))

    def test_faces_consistent_orientation(self):
        # all face normals should point inward or outward consistently:
        # reference normal convention (v2-v0)x(v1-v0); centroid dot normal
        # must have the same sign for all faces
        ico = icosphere(3)
        v0, v1, v2 = (ico.coords[ico.faces[:, i]] for i in range(3))
        n = np.cross(v2 - v0, v1 - v0)
        centroid = (v0 + v1 + v2) / 3
        signs = np.sign(np.sum(n * centroid, axis=1))
        assert (signs == signs[0]).all()


class TestSpherical:
    def test_rodrigues_basic(self):
        rng = np.random.default_rng(0)
        a = rng.normal(size=(50, 3))
        b = rng.normal(size=(50, 3))
        r = np.asarray(sph.rodrigues(jnp.asarray(a), jnp.asarray(b)))
        an = a / np.linalg.norm(a, axis=1, keepdims=True)
        bn = b / np.linalg.norm(b, axis=1, keepdims=True)
        rotated = np.einsum("nij,nj->ni", r, an)
        np.testing.assert_allclose(rotated, bn, atol=1e-5)
        # orthonormality
        rtr = np.einsum("nji,njk->nik", r, r)
        np.testing.assert_allclose(rtr, np.broadcast_to(np.eye(3), rtr.shape), atol=1e-5)

    def test_rodrigues_identity(self):
        a = jnp.array([[0.0, 0.0, 1.0]])
        r = np.asarray(sph.rodrigues(a, a))
        np.testing.assert_allclose(r[0], np.eye(3), atol=1e-7)

    def test_barycentric_partition_of_unity(self):
        rng = np.random.default_rng(1)
        v1 = rng.normal(size=(20, 3)) + np.array([5, 0, 0])
        v2 = rng.normal(size=(20, 3)) + np.array([0, 5, 0])
        v3 = rng.normal(size=(20, 3)) + np.array([0, 0, 5])
        # interior points
        u = rng.uniform(0.1, 0.4, size=(20, 1))
        v = rng.uniform(0.1, 0.4, size=(20, 1))
        p = v1 * u + v2 * v + v3 * (1 - u - v)
        w = np.asarray(sph.barycentric_weights(jnp.asarray(v1), jnp.asarray(v2),
                                               jnp.asarray(v3), jnp.asarray(p)))
        np.testing.assert_allclose(w.sum(axis=1), 1.0, atol=1e-5)
        np.testing.assert_allclose(w, np.concatenate([u, v, 1 - u - v], axis=1), atol=1e-4)

    def test_project_to_plane(self):
        v1 = jnp.array([[1.0, 0.0, 0.0]]) * 3
        v2 = jnp.array([[0.0, 1.0, 0.0]]) * 3
        v3 = jnp.array([[0.0, 0.0, 1.0]]) * 3
        p = jnp.array([[1.0, 1.0, 1.0]])
        proj = np.asarray(sph.project_to_plane(p, v1, v2, v3))
        np.testing.assert_allclose(proj[0], [1, 1, 1], atol=1e-6)

    def test_point_in_triangle(self):
        v1 = jnp.array([[1.0, 0.0, 0.0]])
        v2 = jnp.array([[0.0, 1.0, 0.0]])
        v3 = jnp.array([[0.0, 0.0, 1.0]])
        inside = jnp.array([[1 / 3, 1 / 3, 1 / 3]])
        outside = jnp.array([[-0.5, 0.75, 0.75]])
        assert bool(sph.point_in_triangle(inside, v1, v2, v3)[0])
        assert not bool(sph.point_in_triangle(outside, v1, v2, v3)[0])

    def test_euler_matrix_orthonormal(self):
        m = np.asarray(sph.euler_matrix(0.3, -0.2, 0.7))
        np.testing.assert_allclose(m @ m.T, np.eye(3), atol=1e-6)

    def test_geodesic_antipodal(self):
        a = jnp.array([[100.0, 0, 0]])
        b = jnp.array([[-100.0, 0, 0]])
        np.testing.assert_allclose(float(sph.geodesic(a, b)[0]), np.pi * 100.0, rtol=1e-5)

    def test_tangent_bases(self):
        rng = np.random.default_rng(2)
        a = sph.normalize(jnp.asarray(rng.normal(size=(30, 3))))
        for fn in (sph.tangent_basis_from_normal, sph.vertex_tangent_basis):
            e1, e2 = fn(a)
            np.testing.assert_allclose(np.sum(np.asarray(e1) * np.asarray(a), axis=1), 0, atol=1e-5)
            np.testing.assert_allclose(np.sum(np.asarray(e2) * np.asarray(a), axis=1), 0, atol=1e-5)
            np.testing.assert_allclose(np.sum(np.asarray(e1) * np.asarray(e2), axis=1), 0, atol=1e-5)
            np.testing.assert_allclose(np.linalg.norm(np.asarray(e1), axis=1), 1, atol=1e-5)


class TestMesh:
    def test_icosphere_mesh(self):
        m = Mesh.from_icosphere(2)
        assert m.nvertices == 162
        np.testing.assert_allclose(np.linalg.norm(m.coords, axis=1), 100.0, atol=1e-9)
        assert m.get_resolution() == 2

    def test_mvd(self):
        m = Mesh.from_icosphere(2)
        maxvd = m.calculate_MaxVD()
        meanvd = m.calculate_MeanVD()
        assert 0 < meanvd < maxvd < 40.0  # ico2 spacing ~ 16-20 units on R=100

    def test_recentre(self):
        m = Mesh.from_icosphere(2)
        m.coords += np.array([5.0, -3.0, 2.0])
        m.recentre()
        assert np.linalg.norm(m.estimate_origin()) < 1e-6

    def test_vertex_normals_outward(self):
        m = Mesh.from_icosphere(2)
        n = m.vertex_normals()
        dots = np.sum(n * m.coords / 100.0, axis=1)
        assert (np.abs(dots) > 0.99).all()
        assert (np.sign(dots) == np.sign(dots[0])).all()

    def test_exclusion(self):
        m = Mesh.from_icosphere(1)
        m.set_data(np.linspace(-1, 1, m.nvertices))
        mask = create_exclusion(m, 0.0, 0.0001)
        inside = (m.data[0] >= -1e-8) & (m.data[0] <= 0.0001 + 1e-8)
        np.testing.assert_array_equal(mask, (~inside).astype(float))


class TestIO:
    def test_gifti_surface_roundtrip(self, tmp_path):
        m = Mesh.from_icosphere(2)
        p = str(tmp_path / "test.surf.gii")
        m.save(p)
        m2 = Mesh.load(p)
        np.testing.assert_allclose(m2.coords, m.coords, atol=1e-3)
        np.testing.assert_array_equal(m2.faces, m.faces)

    def test_gifti_metric_roundtrip(self, tmp_path):
        from newmsm_tpu.core import io as mio
        m = Mesh.from_icosphere(1)
        m.set_data(np.random.default_rng(3).normal(size=(4, m.nvertices)))
        p = str(tmp_path / "test.func.gii")
        m.save(p)
        data = mio.load_data(p, m)
        np.testing.assert_allclose(data, m.data, atol=1e-5)

    def test_ascii_roundtrip(self, tmp_path):
        m = Mesh.from_icosphere(1)
        m.set_data(np.arange(m.nvertices, dtype=float))
        p = str(tmp_path / "test.asc")
        m.save(p)
        m2 = Mesh.load(p)
        np.testing.assert_allclose(m2.coords, m.coords, atol=1e-5)
        np.testing.assert_array_equal(m2.faces, m.faces)
        np.testing.assert_allclose(m2.data[0], m.data[0], atol=1e-5)

    def test_vtk_roundtrip(self, tmp_path):
        m = Mesh.from_icosphere(1)
        p = str(tmp_path / "test.vtk")
        m.save(p)
        m2 = Mesh.load(p)
        np.testing.assert_allclose(m2.coords, m.coords, atol=1e-5)
        np.testing.assert_array_equal(m2.faces, m.faces)


class TestSparseData:
    """spconvert-format sparse connectivity loading (read_spmat; reference
    set_data issparse branch, reg_tools.cpp:846-855)."""

    def test_round_trip(self, tmp_path):
        import numpy as np
        from newmsm_tpu.core.io import read_spmat, load_data
        from newmsm_tpu.core.mesh import Mesh

        m = Mesh.from_icosphere(0)            # 12 vertices
        rng = np.random.default_rng(0)
        dense = np.zeros((5, 12))
        idx = rng.integers(0, 5, 20), rng.integers(0, 12, 20)
        dense[idx] = rng.normal(size=20)
        lines = [f"{r+1} {c+1} {dense[r, c]:.17g}"
                 for r, c in zip(*np.nonzero(dense))]
        lines.append("5 12 0")                # dimension row
        p = tmp_path / "conn.txt"
        p.write_text("\n".join(lines) + "\n")

        got = read_spmat(str(p))
        np.testing.assert_allclose(got, dense)
        viadata = load_data(str(p), m, sparse=True)
        assert viadata.shape == (5, 12)

    def test_driver_setter(self, tmp_path):
        import numpy as np
        from newmsm_tpu.core.mesh import Mesh
        from newmsm_tpu.reg.driver import MeshRegistration

        m = Mesh.from_icosphere(0)
        p = tmp_path / "conn.txt"
        p.write_text("1 1 2.5\n2 12 -1.0\n3 12 0\n")
        mr = MeshRegistration()
        mr.set_input(m)
        mr.is_sparse()
        mr.set_input_data(str(p))
        assert mr.in_data.shape == (3, 12)
        assert mr.in_data[0, 0] == 2.5
