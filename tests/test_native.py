import numpy as np
import pytest

from newmsm_tpu import native
from newmsm_tpu.core.icosphere import icosphere
from newmsm_tpu.core.mesh import Mesh

from test_ops_nearest_resample import warped_icosphere

pytestmark = pytest.mark.skipif(not native.HAVE_NATIVE,
                                reason="native extension not built")


class TestNativeGeometry:
    def test_adjacency_matches_python(self):
        ico = icosphere(4)
        ni, nc, ti, tc = native._geometry.adjacency(ico.faces, ico.nvertices)
        np.testing.assert_array_equal(ni, ico.nbr_idx)
        np.testing.assert_array_equal(ti, ico.tri_idx)
        np.testing.assert_array_equal(nc, ico.nbr_cnt)
        np.testing.assert_array_equal(tc, ico.tri_cnt)

    def test_bvh_agrees_with_device_kernel(self):
        import jax.numpy as jnp
        from newmsm_tpu.ops import nearest as nst
        target = warped_icosphere(3, amplitude=0.06)
        rng = np.random.default_rng(11)
        q = rng.normal(size=(300, 3))
        q = q / np.linalg.norm(q, axis=1, keepdims=True) * 100.0

        golden = native.nearest_triangle_exact(target.coords, target.faces, q)
        tables = nst.build_tables(target.coords, target.faces, target.adjacency[2])
        got = np.asarray(nst.nearest_triangle(jnp.asarray(q, jnp.float32), tables))
        agree = (golden == got).mean()
        assert agree > 0.97, f"{agree:.2%}"
        for i in np.nonzero(golden != got)[0]:
            shared = len(set(target.faces[golden[i]]) & set(target.faces[got[i]]))
            assert shared >= 1

    def test_bvh_exact_on_vertices(self):
        m = Mesh.from_icosphere(3)
        tri = native.nearest_triangle_exact(m.coords, m.faces, m.coords[:50])
        for v in range(50):
            assert v in m.faces[tri[v]]
