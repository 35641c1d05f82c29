import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh as JMesh, NamedSharding, PartitionSpec as P

from newmsm_tpu.core.mesh import Mesh
from newmsm_tpu.reg.sampling_grid import build_sampling_grid


class TestPairwiseSharding:
    """CP/face-row sharding of the pairwise cost volumes matches the
    single-device kernels exactly (parallel/pairwise_sharding.py)."""

    def _problem(self):
        from newmsm_tpu.ops.nearest import build_tables
        from newmsm_tpu.reg import costs as C

        target = Mesh.from_icosphere(3)
        target.true_rescale(100.0)
        cp = Mesh.from_icosphere(1)
        cp.true_rescale(100.0)
        sg = build_sampling_grid(3, 0.5 * cp.calculate_MaxVD())
        labels = jnp.asarray(sg.barycentres, jnp.float32)
        centre = jnp.asarray(sg.centre, jnp.float32)
        tables = build_tables(target.coords, target.faces)
        rng = np.random.default_rng(3)
        N = target.nvertices
        src_data = jnp.asarray(rng.normal(size=(1, N)), jnp.float32)
        tgt_data = jnp.asarray(rng.normal(size=(1, N)), jnp.float32)
        cfw = jnp.ones((1, N), jnp.float32)
        return target, cp, sg, labels, centre, tables, src_data, tgt_data, cfw

    def test_unary_matches_single_device(self):
        from newmsm_tpu.parallel.pairwise_sharding import make_sharded_unary
        from newmsm_tpu.reg import costs as C

        (target, cp, sg, labels, centre, tables,
         src_data, tgt_data, cfw) = self._problem()
        K = cp.nvertices
        maxsep = jnp.asarray(cp.max_vertex_distances(), jnp.float32)
        absw = jnp.ones((K,), jnp.float32)
        cp_coords = jnp.asarray(cp.coords, jnp.float32)
        src_coords = jnp.asarray(target.coords, jnp.float32)

        rots, rl = C.rotated_label_positions(cp_coords, labels, centre)
        pi, pm, _ = C.build_patches(cp_coords, src_coords, maxsep, 1.0, 64)
        ref = C.unary_costs(cp_coords, rl, src_coords, pi, pm, tables,
                            src_data, tgt_data, cfw, absw, simval=2,
                            mode="univariate")

        mesh = JMesh(np.array(jax.devices()[:8]), ("cps",))
        fn = make_sharded_unary(mesh, tables, src_data, tgt_data, cfw,
                                simval=2, mode="univariate", pmax=64,
                                cprange=1.0)
        out = fn(cp_coords, labels, centre, maxsep, absw, src_coords)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=0, atol=2e-5)

    def test_triplet_volume_matches_single_device(self):
        from newmsm_tpu.parallel.pairwise_sharding import (
            make_sharded_triplet_volume)
        from newmsm_tpu.reg import costs as C

        (target, cp, sg, labels, centre, tables,
         src_data, tgt_data, cfw) = self._problem()
        cp_coords = jnp.asarray(cp.coords, jnp.float32)
        rots, rl = C.rotated_label_positions(cp_coords, labels, centre)
        trip = jnp.asarray(np.sort(cp.faces.astype(np.int32), axis=1))
        cur = cp_coords[trip]
        orig = cp_coords[trip]

        ref = C.triplet_volume_arrays(rl, trip, cur, orig, 0.2, 0.4, 1.6,
                                      2.0, 2.0)
        L = rl.shape[1]
        ref = np.asarray(ref).reshape(-1, L, L, L)

        mesh = JMesh(np.array(jax.devices()[:8]), ("cps",))
        fn = make_sharded_triplet_volume(mesh, 0.2, 0.4, 1.6, 2.0, 2.0)
        out = np.asarray(fn(rl, trip, cur, orig))
        # sharded fusion reorders f32 FMAs; strains agree to ~1e-5 relative
        np.testing.assert_allclose(out, ref, rtol=5e-4, atol=1e-5)


class TestMultihost:
    """Single-process behaviour of the multi-host helpers
    (parallel/multihost.py); true DCN spans need >1 process (see
    tests/test_multihost_smoke.py for the 2-process bring-up)."""

    def test_mesh_and_slices(self):
        from newmsm_tpu.parallel import multihost as mh
        mh.initialize()                       # no-op single host
        mesh = mh.subjects_device_mesh()
        assert mesh.devices.size == len(jax.devices())
        S = 2 * mesh.devices.size
        sl = mh.process_subject_slice(S, mesh=mesh)
        assert sl == slice(0, S)              # one process owns everything

    def test_shard_and_fusion_step(self):
        from newmsm_tpu.parallel import multihost as mh
        from newmsm_tpu.parallel.group_fusion import (
            build_iteration_tables, make_fusion_fn, make_partner_fn)
        from test_group_sharded import build_problem
        S = 8
        st, trip, maps, cp, spac, K, L = build_problem(S)
        mesh = mh.subjects_device_mesh()
        cpd = mh.shard_subjects(jnp.asarray(cp), mesh)
        partner = np.asarray(make_partner_fn(mesh, st, S)(cpd))
        tables = build_iteration_tables(partner, trip, S, K)
        labeling, energy, _ovf = make_fusion_fn(mesh, st, S)(
            mh.shard_subjects(jnp.asarray(maps), mesh), cpd,
            mh.shard_subjects(jnp.asarray(spac), mesh),
            jnp.zeros((S * K,), jnp.int32), jnp.asarray(partner), tables)
        out = np.asarray(labeling)
        assert out.shape == (S * K,)
        assert out.min() >= 0 and out.max() < L and float(energy) == float(energy)
