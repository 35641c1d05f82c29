"""Groupwise lambda sweep (VERDICT r3 item #4: distortion overshoot).

Runs the fast-scale parity cohort through typical (once) and groupwise at a
range of regularisation strengths, reporting CC/DICE and areal distortion
means plus the groupwise/typical areal ratio. The reference's guidance is
that groupwise lambda should sit "somewhere between 0.2-0.5"
(docs/guide.md:386); its published NODE2078 rows show a 1.5x areal-mean
ratio (guide.md:437-439).

Usage: JAX_PLATFORMS=cpu python scripts/sweep_group_lambda.py [--scale fast]
"""
from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax
    # the environment pre-imports jax, so JAX_PLATFORMS is too late; pin the
    # backend explicitly (bench.py has the same note)
    jax.config.update("jax_platforms", "cpu")
    from newmsm_tpu.core.cache import enable_compile_cache
    enable_compile_cache()
    from newmsm_tpu.core.mesh import Mesh
    from newmsm_tpu.eval import metrics
    from newmsm_tpu.eval.synth import synth_cohort
    from newmsm_tpu.pipelines.gmsm import run_gmsm
    from newmsm_tpu.reg.driver import MeshRegistration

    sys.path.insert(0, os.path.dirname(__file__))
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
    import test_parity as TP

    S, RES = TP.S, TP.RES
    meshes, datasets, template_data = synth_cohort(RES, S, seed=0,
                                                   warp_deg=6.0)
    template = Mesh.from_icosphere(RES)
    template.true_rescale(100.0)
    before = TP.channel_stats(datasets)
    print("before:", json.dumps(before), flush=True)

    import tempfile
    tdir = tempfile.mkdtemp(prefix="sweep_")

    t_maps, t_dists = [], []
    for s in range(S):
        mr = MeshRegistration()
        mr.set_input(meshes[s].copy())
        mr.set_reference(meshes[s].copy())
        mr.set_input_data(datasets[s])
        mr.set_reference_data(template_data)
        mr.outdir = os.path.join(tdir, f"t{s}.")
        mr.run_multiresolutions(TP.typical_config())
        t_maps.append(np.asarray(mr.transformed_data))
        areal, shape = metrics.distortion_maps(mr.in_mesh, mr.warped_input)
        t_dists.append(metrics.distortion_stats(areal, shape))
    typical = TP.channel_stats(t_maps)
    t_areal = float(np.mean([d["areal_mean"] for d in t_dists]))
    print("typical:", json.dumps({**typical, "areal_mean": t_areal}),
          flush=True)

    for lam in (0.2, 0.3, 0.4, 0.6):
        cfg = TP.groupwise_config()
        cfg.reglambda = [lam] * len(cfg.reglambda)
        res = run_gmsm([m.copy() for m in meshes],
                       [d.copy() for d in datasets], template, cfg,
                       dedrift_warps=True)
        group = TP.channel_stats(res.resampled_data)
        g_dists = [metrics.distortion_stats(*metrics.distortion_maps(
            meshes[s], res.dedrifted_spheres[s])) for s in range(S)]
        g_areal = float(np.mean([d["areal_mean"] for d in g_dists]))
        g_max = float(np.mean([d["areal_max"] for d in g_dists]))
        print(f"groupwise lam={lam}:",
              json.dumps({**group, "areal_mean": g_areal,
                          "areal_max": g_max,
                          "ratio_vs_typical": round(g_areal / t_areal, 3)}),
              flush=True)


if __name__ == "__main__":
    main()
