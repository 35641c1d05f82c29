"""Production multi-chip groupwise: shard-count invariance at both the
optimiser level and the full driver level (VERDICT round-1 item #1).

The contract: the subject-sharded fusion step (parallel/group_fusion.py)
assembles its binary move tables from device-count-independent per-block
programs combined only by concatenation / disjoint-slot psum, so labelings
and energies are IDENTICAL (not merely close) for any device count.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh as JMesh, NamedSharding, PartitionSpec as P

from newmsm_tpu.core.mesh import Mesh
from newmsm_tpu.parallel.group_fusion import (GroupLevelStatics,
                                              build_iteration_tables,
                                              make_fusion_fn,
                                              make_partner_fn, pair_blocks)
from newmsm_tpu.reg.sampling_grid import build_sampling_grid

from fixtures import smooth_pattern, rotation_matrix


def build_problem(S, seed=0):
    from newmsm_tpu.ops.nearest import build_tables
    control = Mesh.from_icosphere(1)
    control.true_rescale(100.0)
    template = Mesh.from_icosphere(2)
    template.true_rescale(100.0)
    K, Nt, D = control.nvertices, template.nvertices, 1
    sg = build_sampling_grid(3, 0.5 * control.calculate_MaxVD())
    labels = np.asarray(sg.samples, np.float32)
    trip = np.sort(control.faces.astype(np.int32), axis=1)
    cp_search = build_tables(control.coords, control.faces,
                             control.adjacency[2])
    st = GroupLevelStatics(
        labels=jnp.asarray(labels),
        centre=jnp.asarray(sg.centre, jnp.float32),
        orig_cp=jnp.asarray(control.coords, jnp.float32),
        cp_faces=jnp.asarray(trip),
        tmpl_coords=jnp.asarray(template.coords, jnp.float32),
        mask_w=None, cp_search=cp_search,
        mu=0.4, kappa=1.6, k_exp=2.0, rexp=2.0, reglambda=0.1,
        subcorr=0.1 * S, simval=2, percentile=0.75, pmax=32, cprange=1.0,
        fixnan=False)

    rng = np.random.default_rng(seed)
    cp = np.broadcast_to(np.asarray(control.coords, np.float32),
                         (S, K, 3)).copy()
    cp += rng.normal(size=cp.shape).astype(np.float32) * 1.5
    cp /= np.linalg.norm(cp, axis=-1, keepdims=True) / 100.0
    spac = np.broadcast_to(np.asarray(control.max_vertex_distances(),
                                      np.float32), (S, K)).copy()
    maps = rng.normal(size=(S, len(labels), D, Nt)).astype(np.float32)
    return st, trip, maps, cp, spac, K, len(labels)


class TestOptimiserShardInvariance:
    def test_1_2_4_8_devices_identical(self):
        S = 8
        st, trip, maps, cp, spac, K, L = build_problem(S)
        lab0 = jnp.zeros((S * K,), jnp.int32)
        results = {}
        for nd in (1, 2, 4, 8):
            mesh = JMesh(np.array(jax.devices()[:nd]), ("subjects",))
            sh = NamedSharding(mesh, P("subjects"))
            cpd = jax.device_put(jnp.asarray(cp), sh)
            spacd = jax.device_put(jnp.asarray(spac), sh)
            mapsd = jax.device_put(jnp.asarray(maps), sh)
            partner = np.asarray(make_partner_fn(mesh, st, S)(cpd))
            tables = build_iteration_tables(partner, trip, S, K)
            labeling, energy, _ovf = make_fusion_fn(mesh, st, S)(
                mapsd, cpd, spacd, lab0, jnp.asarray(partner), tables)
            results[nd] = (np.asarray(labeling), float(energy), partner)

        lab1, e1, part1 = results[1]
        assert (lab1 != 0).any(), "fixture never moved a node"
        assert lab1.min() >= 0 and lab1.max() < L
        for nd in (2, 4, 8):
            labn, en, partn = results[nd]
            np.testing.assert_array_equal(part1, partn)
            np.testing.assert_array_equal(lab1, labn)
            assert e1 == en, (e1, en)

    def test_ring_exchange_matches_gather_all_device_counts(self):
        """maps_exchange='ring' (per-device maps memory O(S/n_dev), ppermute
        block rotation) produces the same labelings/energies as the gather
        path for every device count (VERDICT round-2 item #2)."""
        S = 8
        st, trip, maps, cp, spac, K, L = build_problem(S, seed=5)
        lab0 = jnp.zeros((S * K,), jnp.int32)
        ref = None
        for nd in (1, 2, 4, 8):
            mesh = JMesh(np.array(jax.devices()[:nd]), ("subjects",))
            sh = NamedSharding(mesh, P("subjects"))
            cpd = jax.device_put(jnp.asarray(cp), sh)
            spacd = jax.device_put(jnp.asarray(spac), sh)
            mapsd = jax.device_put(jnp.asarray(maps), sh)
            partner = np.asarray(make_partner_fn(mesh, st, S)(cpd))
            tables = build_iteration_tables(partner, trip, S, K)
            args = (mapsd, cpd, spacd, lab0, jnp.asarray(partner), tables)
            lg, eg, _ = make_fusion_fn(mesh, st, S, maps_exchange="gather")(*args)
            lr, er, _ = make_fusion_fn(mesh, st, S, maps_exchange="ring")(*args)
            np.testing.assert_array_equal(np.asarray(lg), np.asarray(lr))
            assert float(eg) == float(er), (nd, float(eg), float(er))
            if ref is None:
                ref = (np.asarray(lg), float(eg))
            else:
                np.testing.assert_array_equal(ref[0], np.asarray(lg))
                assert ref[1] == float(eg)

    def test_ring_program_never_materialises_full_maps(self):
        """Structural guarantee for the O(S/n_dev) memory claim: the ring
        program's HLO contains no full (S,L,D,Nt) maps-shaped all-gather,
        while the gather program does."""
        S = 8
        nd = 4
        st, trip, maps, cp, spac, K, L = build_problem(S, seed=5)
        lab0 = jnp.zeros((S * K,), jnp.int32)
        mesh = JMesh(np.array(jax.devices()[:nd]), ("subjects",))
        sh = NamedSharding(mesh, P("subjects"))
        cpd = jax.device_put(jnp.asarray(cp), sh)
        spacd = jax.device_put(jnp.asarray(spac), sh)
        mapsd = jax.device_put(jnp.asarray(maps), sh)
        partner = np.asarray(make_partner_fn(mesh, st, S)(cpd))
        tables = build_iteration_tables(partner, trip, S, K)
        args = (mapsd, cpd, spacd, lab0, jnp.asarray(partner), tables)

        Nt = maps.shape[-1]
        full_shape = f"f32[{S},{L},1,{Nt}]"     # the replicated maps tensor
        hlo_ring = make_fusion_fn(mesh, st, S, maps_exchange="ring"
                                  ).lower(*args).compile().as_text()
        hlo_gather = make_fusion_fn(mesh, st, S, maps_exchange="gather"
                                    ).lower(*args).compile().as_text()
        ring_gathers = [l for l in hlo_ring.splitlines()
                        if "all-gather" in l and full_shape in l]
        gather_gathers = [l for l in hlo_gather.splitlines()
                          if "all-gather" in l and full_shape in l]
        assert not ring_gathers, ring_gathers[:2]
        assert gather_gathers, "gather path should all-gather the maps"
        assert "collective-permute" in hlo_ring

    def test_patch_overflow_counter(self):
        """A deliberately tight pmax must be detected and counted, not
        silently truncated (VERDICT round-2 item #8)."""
        S = 4
        st, trip, maps, cp, spac, K, L = build_problem(S, seed=1)
        lab0 = jnp.zeros((S * K,), jnp.int32)
        mesh = JMesh(np.array(jax.devices()[:1]), ("subjects",))
        partner = np.asarray(make_partner_fn(mesh, st, S)(jnp.asarray(cp)))
        tables = build_iteration_tables(partner, trip, S, K)
        args = (jnp.asarray(maps), jnp.asarray(cp), jnp.asarray(spac), lab0,
                jnp.asarray(partner), tables)

        _, _, need_ok = make_fusion_fn(mesh, st, S)(*args)
        st_tight = st._replace(pmax=2)      # patches are far bigger than 2
        _, _, need_tight = make_fusion_fn(mesh, st_tight, S)(*args)
        # the returned value is the MAX in-range need: within capacity on
        # the sized run, above it on the tight run — and the tight run's
        # reported need pre-sizes a single rebuild
        assert int(need_ok) <= st.pmax, (int(need_ok), st.pmax)
        # (exact value can differ between runs: truncated costs change the
        # labeling trajectory and hence later patch positions)
        assert int(need_tight) > 2

    def test_partner_matches_host_closest_vertex(self):
        """Device-side estimate_pairs == the host closest_vertex loop the
        round-1 driver ran (DiscreteGroupModel.cpp:37-55 semantics)."""
        from newmsm_tpu.ops.nearest import build_tables, closest_vertex
        S = 4
        st, trip, maps, cp, spac, K, L = build_problem(S, seed=3)
        mesh = JMesh(np.array(jax.devices()[:4]), ("subjects",))
        sh = NamedSharding(mesh, P("subjects"))
        partner = np.asarray(make_partner_fn(mesh, st, S)(
            jax.device_put(jnp.asarray(cp), sh)))

        control = Mesh.from_icosphere(1)
        control.true_rescale(100.0)
        for a in range(S):
            for b in range(S):
                tabs = build_tables(cp[b], control.faces,
                                    control.adjacency[2])
                ref = np.asarray(closest_vertex(
                    jnp.asarray(cp[a], jnp.float32), tabs))
                np.testing.assert_array_equal(partner[a, b], ref, err_msg=f"{a},{b}")

    def test_partner_respects_strong_deformation(self):
        """Regression: the partner search must answer on the DEFORMED CP
        grids (DiscreteGroupModel.cpp:37-55). A stale pristine_res on the
        swapped-coords tables silently answered on the pristine icosphere —
        only caught under deformations big enough to change the Voronoi
        assignment."""
        from newmsm_tpu.ops.nearest import build_tables, closest_vertex
        S = 2
        st, trip, maps, cp, spac, K, L = build_problem(S, seed=7)
        control = Mesh.from_icosphere(1)
        control.true_rescale(100.0)
        rng = np.random.default_rng(11)
        cp = np.broadcast_to(np.asarray(control.coords, np.float32),
                             (S, K, 3)).copy()
        cp += rng.normal(size=cp.shape).astype(np.float32) * 25.0
        cp /= np.linalg.norm(cp, axis=-1, keepdims=True) / 100.0

        mesh = JMesh(np.array(jax.devices()[:1]), ("subjects",))
        partner = np.asarray(make_partner_fn(mesh, st, S)(jnp.asarray(cp)))
        for a in range(S):
            for b in range(S):
                tabs = build_tables(cp[b], control.faces,
                                    control.adjacency[2])
                ref = np.asarray(closest_vertex(
                    jnp.asarray(cp[a], jnp.float32), tabs))
                np.testing.assert_array_equal(partner[a, b], ref,
                                              err_msg=f"{a},{b}")


class TestDriverShardInvariance:
    def _run_driver(self, meshes, datasets, max_devices):
        from newmsm_tpu.reg.group import GroupMeshRegistration
        from test_group import group_config
        import tempfile
        gmr = GroupMeshRegistration()
        gmr.max_devices = max_devices
        gmr.set_inputs([m.copy() for m in meshes])
        gmr.set_data_list([d.copy() for d in datasets])
        gmr.set_template(Mesh.from_icosphere(2))
        gmr.outdir = tempfile.mkdtemp() + "/"
        cfg = group_config(iters=2)
        cfg.datagrid = [2]
        cfg.sampgrid = [2]
        gmr.run_multiresolutions(cfg)
        return gmr

    def test_full_registration_1_vs_8_devices(self):
        """S=8 synthetic subjects registered through the REAL driver on a
        1-device vs an 8-device mesh: identical energies and identical
        registered spheres (the VERDICT 'done' criterion)."""
        from test_group import make_group
        meshes, datasets = make_group(8, res=2, degrees=6.0)
        g1 = self._run_driver(meshes, datasets, max_devices=1)
        g8 = self._run_driver(meshes, datasets, max_devices=8)

        assert g1.device_mesh.devices.size == 1
        assert g8.device_mesh.devices.size == 8
        assert [e for (_, _, e) in g1.energy_log] == \
               [e for (_, _, e) in g8.energy_log]
        for s in range(8):
            np.testing.assert_array_equal(g1.sph_reg[s].coords,
                                          g8.sph_reg[s].coords)

    def test_sharded_apply_close_to_default(self):
        """apply_sharded=True distributes the unfold+warp stage over the
        mesh; results match the fixed-device default to float32 fusion
        noise (see make_apply_fn docstring)."""
        from test_group import make_group
        meshes, datasets = make_group(8, res=2, degrees=6.0)
        g_fix = self._run_driver(meshes, datasets, max_devices=8)
        from newmsm_tpu.reg.group import GroupMeshRegistration
        from test_group import group_config
        import tempfile
        g_sh = GroupMeshRegistration()
        g_sh.max_devices = 8
        g_sh.apply_sharded = True
        g_sh.set_inputs([m.copy() for m in meshes])
        g_sh.set_data_list([d.copy() for d in datasets])
        g_sh.set_template(Mesh.from_icosphere(2))
        g_sh.outdir = tempfile.mkdtemp() + "/"
        cfg = group_config(iters=2)
        cfg.datagrid = [2]
        cfg.sampgrid = [2]
        g_sh.run_multiresolutions(cfg)
        for s in range(8):
            np.testing.assert_allclose(g_fix.sph_reg[s].coords,
                                       g_sh.sph_reg[s].coords, atol=1e-2)

    def test_registration_improves_coalignment_s8(self):
        from test_group import make_group, mean_pairwise_corr
        meshes, datasets = make_group(8, res=2, degrees=6.0)
        g8 = self._run_driver(meshes, datasets, max_devices=8)
        before = mean_pairwise_corr(datasets)
        after = mean_pairwise_corr(g8.transformed_data)
        assert after > before, (before, after)

    def test_s16_ico4_groupwise_scale(self):
        """Beyond-toy scale in CI (VERDICT round-2 item #6): S=16 subjects,
        ico-4 data grids, 8 devices, through the full driver — improves
        co-alignment with fold-free warps and no patch overflow."""
        import json
        import tempfile
        from newmsm_tpu.ops.unfold import count_folds
        from newmsm_tpu.reg.group import GroupMeshRegistration
        from test_group import group_config, make_group, mean_pairwise_corr

        meshes, datasets = make_group(16, res=4, degrees=6.0)
        g = GroupMeshRegistration()
        g.max_devices = 8
        g.set_inputs(meshes)
        g.set_data_list(datasets)
        g.set_template(Mesh.from_icosphere(4))
        out = tempfile.mkdtemp()
        g.outdir = out + "/"
        g.metrics_path = out + "/metrics.jsonl"
        cfg = group_config(iters=2)
        cfg.datagrid = [4]
        cfg.sampgrid = [4]
        cfg.cpgrid = [2]
        g.run_multiresolutions(cfg)

        before = mean_pairwise_corr(datasets)
        after = mean_pairwise_corr(g.transformed_data)
        assert after > before + 0.05, (before, after)
        for s in range(16):
            assert count_folds(g.sph_reg[s]) == 0
        rows = [json.loads(l) for l in open(g.metrics_path)]
        assert all(r["patch_overflow"] == 0 for r in rows
                   if r["event"] == "iter"), rows
