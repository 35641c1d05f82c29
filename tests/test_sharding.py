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
