"""2-process multi-host smoke test (VERDICT round-1 item #10): the DCN code
path — jax.distributed bring-up + the production sharded group fusion step
spanning processes — runs somewhere before real multi-host hardware sees it.

Launches two subprocesses that each own 4 CPU devices / 4 subjects of an
S=8 problem, and asserts both report the same energy/labeling — which must
also equal a single-process 8-device run of the identical problem.
"""
import os
import re
import socket
import subprocess
import sys

import numpy as np
import pytest


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _parse(line):
    m = re.search(r"energy=([-\d.]+) labsum=(\d+) moved=(\d+)", line)
    assert m, line
    return float(m.group(1)), int(m.group(2)), int(m.group(3))


class TestTwoProcessBringup:
    def test_two_processes_agree_with_single_process(self):
        port = _free_port()
        worker = os.path.join(os.path.dirname(__file__),
                              "multihost_worker.py")
        env = {k: v for k, v in os.environ.items()
               if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
        procs = [subprocess.Popen(
            [sys.executable, worker, str(port), str(pid), "2"],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            env=env) for pid in (0, 1)]
        outs = []
        for p in procs:
            try:
                out, err = p.communicate(timeout=600)
            except subprocess.TimeoutExpired:
                p.kill()
                out, err = p.communicate()
                pytest.fail(f"worker timed out; out={out[-2000:]} "
                            f"err={err[-2000:]}")
            assert p.returncode == 0, (out[-2000:], err[-3000:])
            outs.append(out)

        res = [_parse(next(l for l in o.splitlines() if "RESULT" in l))
               for o in outs]
        assert res[0] == res[1], res

        # single-process 8-device reference on the identical problem
        import jax
        import jax.numpy as jnp
        from newmsm_tpu.parallel.group_fusion import (
            build_iteration_tables, make_fusion_fn, make_partner_fn)
        from jax.sharding import Mesh as JMesh, NamedSharding, PartitionSpec as P
        from test_group_sharded import build_problem

        S = 8
        st, trip, maps, cp, spac, K, L = build_problem(S)
        mesh = JMesh(np.array(jax.devices()[:8]), ("subjects",))
        sh = NamedSharding(mesh, P("subjects"))
        cpd = jax.device_put(jnp.asarray(cp), sh)
        partner = np.asarray(make_partner_fn(mesh, st, S)(cpd))
        tables = build_iteration_tables(partner, trip, S, K)
        labeling, energy, _ovf = make_fusion_fn(mesh, st, S)(
            jax.device_put(jnp.asarray(maps), sh), cpd,
            jax.device_put(jnp.asarray(spac), sh),
            jnp.zeros((S * K,), jnp.int32), jnp.asarray(partner), tables)
        lab = np.asarray(labeling)
        ref = (round(float(energy), 6), int(lab.sum()),
               int((lab != 0).sum()))
        assert res[0] == pytest.approx(ref), (res[0], ref)

    def test_full_driver_two_processes_matches_single(self, tmp_path):
        """The FULL GroupMeshRegistration (featurespace -> iterations ->
        outputs) across 2 processes: per-host subject loading, global
        sharded arrays, owned-only outputs — energies and registered
        spheres match the single-process run (VERDICT round-2 item #4)."""
        port = _free_port()
        worker = os.path.join(os.path.dirname(__file__),
                              "multihost_worker.py")
        outdir = str(tmp_path) + "/mp."
        env = {k: v for k, v in os.environ.items()
               if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
        procs = [subprocess.Popen(
            [sys.executable, worker, str(port), str(pid), "2", "driver",
             outdir],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            env=env) for pid in (0, 1)]
        outs = []
        for p in procs:
            try:
                out, err = p.communicate(timeout=900)
            except subprocess.TimeoutExpired:
                p.kill()
                out, err = p.communicate()
                pytest.fail(f"worker timed out; out={out[-2000:]} "
                            f"err={err[-2000:]}")
            assert p.returncode == 0, (out[-2000:], err[-3000:])
            outs.append(next(l for l in out.splitlines() if "DRIVER" in l))

        e = [re.search(r"energies=\[([^\]]*)\]", o).group(1) for o in outs]
        assert e[0] == e[1], outs          # replicated energies agree

        # single-process reference on the identical problem (sharded apply
        # to match the multi-process layout)
        from newmsm_tpu.core.mesh import Mesh
        from newmsm_tpu.reg.group import GroupMeshRegistration
        from test_group import group_config, make_group
        meshes, datasets = make_group(8, res=2, degrees=6.0)
        g = GroupMeshRegistration()
        g.apply_sharded = True
        g.set_inputs(meshes)
        g.set_data_list(datasets)
        g.set_template(Mesh.from_icosphere(2))
        g.outdir = str(tmp_path) + "/sp."
        cfg = group_config(iters=2)
        cfg.datagrid = [2]
        cfg.sampgrid = [2]
        g.run_multiresolutions(cfg)
        ref_e = ",".join(f"{en:.6f}" for (_, _, en) in g.energy_log)
        assert e[0] == ref_e, (e[0], ref_e)

        # every subject's registered sphere written exactly once across the
        # two processes, matching the single-process result
        for s in range(8):
            mp_mesh = Mesh.load(outdir + f"sphere-{s}.reg.surf.gii")
            np.testing.assert_allclose(mp_mesh.coords, g.sph_reg[s].coords,
                                       atol=1e-4)
