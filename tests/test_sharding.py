import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh as JMesh, NamedSharding, PartitionSpec as P

from newmsm_tpu.core.mesh import Mesh
from newmsm_tpu.parallel.group_sharding import GroupStepStatics, make_group_step
from newmsm_tpu.reg.optimise.coloring import color_groups, vertex_coloring_from_faces
from newmsm_tpu.reg.sampling_grid import build_sampling_grid


def build_problem(S):
    control = Mesh.from_icosphere(1)
    template = Mesh.from_icosphere(2)
    K, Nt, D = control.nvertices, template.nvertices, 1
    sg = build_sampling_grid(3, 0.5 * control.calculate_MaxVD())
    labels = np.asarray(sg.samples, np.float32)
    trip = np.sort(control.faces.astype(np.int32), axis=1)
    colors = vertex_coloring_from_faces(trip, K)
    vg, vm = color_groups(colors)
    partner = np.broadcast_to(np.arange(K, dtype=np.int32), (S, S, K)).copy()
    statics = GroupStepStatics(
        cp_faces=jnp.asarray(trip),
        orig_cp=jnp.asarray(control.coords, jnp.float32),
        tmpl_coords=jnp.asarray(template.coords, jnp.float32),
        centre=jnp.asarray(sg.centre, jnp.float32),
        labels=jnp.asarray(labels),
        vgroups=jnp.asarray(vg), vgroup_mask=jnp.asarray(vm),
        pair_partner=jnp.asarray(partner),
        mu=0.4, kappa=1.6, k_exp=2.0, rexp=2.0, reglambda=0.1,
        simval=2, pmax=32, cprange=1.0,
    )
    rng = np.random.default_rng(0)
    maps = rng.normal(size=(S, len(labels), D, Nt)).astype(np.float32)
    cp = np.broadcast_to(control.coords.astype(np.float32), (S, K, 3)).copy()
    spac = np.broadcast_to(control.max_vertex_distances().astype(np.float32),
                           (S, K)).copy()
    labeling = np.zeros((S * K,), np.int32)
    return statics, maps, cp, spac, labeling, len(labels), K


def run_on(n_devices, statics, maps, cp, spac, labeling, S):
    devices = np.array(jax.devices()[:n_devices])
    mesh = JMesh(devices, ("subjects",))
    step = make_group_step(mesh, statics, S)
    sh = NamedSharding(mesh, P("subjects"))
    out = step(jax.device_put(jnp.asarray(maps), sh),
               jax.device_put(jnp.asarray(cp), sh),
               jax.device_put(jnp.asarray(spac), sh),
               jnp.asarray(labeling))
    return np.asarray(out)


class TestShardInvariance:
    def test_1_2_4_8_devices_identical(self):
        S = 8
        statics, maps, cp, spac, labeling, L, K = build_problem(S)
        results = {}
        for nd in (1, 2, 4, 8):
            results[nd] = run_on(nd, statics, maps, cp, spac, labeling, S)
        for nd in (2, 4, 8):
            np.testing.assert_array_equal(results[1], results[nd]), nd
        # and the update actually did something
        assert (results[1] != 0).any()
        assert results[1].min() >= 0 and results[1].max() < L


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
    (parallel/multihost.py); true DCN spans need >1 process."""

    def test_mesh_and_slices(self):
        from newmsm_tpu.parallel import multihost as mh
        mh.initialize()                       # no-op single host
        mesh = mh.subjects_device_mesh()
        assert mesh.devices.size == len(jax.devices())
        S = 2 * mesh.devices.size
        sl = mh.process_subject_slice(S, mesh=mesh)
        assert sl == slice(0, S)              # one process owns everything

    def test_shard_and_step(self):
        from newmsm_tpu.parallel import multihost as mh
        statics, maps, cp, spac, labeling, L, K = build_problem(8)
        mesh = mh.subjects_device_mesh()
        step = make_group_step(mesh, statics, 8)
        out = step(mh.shard_subjects(jnp.asarray(maps), mesh),
                   mh.shard_subjects(jnp.asarray(cp), mesh),
                   mh.shard_subjects(jnp.asarray(spac), mesh),
                   jnp.asarray(labeling))
        assert np.asarray(out).shape == (8 * K,)
