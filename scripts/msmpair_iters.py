"""MSMpair iteration-budget experiment (round-5 root-cause confirmation).

The lambda sweep showed full-scale MSMpair distortion is lambda-INSENSITIVE
(areal mean 1.5-1.8 at x1/x3/x10) while 40-85% of nodes keep moving every
iteration at every lambda: the pairwise penalty charges only THIS
iteration's relative rotations, so collective smooth drifts are free and
the per-iteration re-anchoring makes total deformation a function of how
long the walk runs. Prediction: distortion tracks the iteration budget.
This script runs the verbatim config with the discrete budget cut
50,5,10,10 -> 50,2,3,3 on subject 0.
"""
import json, os, sys, tempfile, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

def main():
    import jax
    if "--cpu" in sys.argv:
        jax.config.update("jax_platforms", "cpu")
    from newmsm_tpu.core.cache import enable_compile_cache
    enable_compile_cache()
    from newmsm_tpu.eval import metrics
    from newmsm_tpu.eval.synth import synth_cohort
    from newmsm_tpu.reg.config import parse_config
    from newmsm_tpu.reg.driver import MeshRegistration

    fast = "--fast" in sys.argv
    res = 4 if fast else 6
    meshes, datasets, template_data = synth_cohort(res, 1, seed=0)
    cfg = parse_config("/root/reference/config/basic_configs/config_standard_MSMpair")
    cfg.iters = [50, 2, 3, 3]
    if fast:
        cfg.cpgrid = [0, 1, 2, 2]; cfg.datagrid = [3, 3, 4, 4]
        cfg.sampgrid = [0, 3, 4, 4]
    mr = MeshRegistration()
    mr.set_input(meshes[0]); mr.set_reference(meshes[0].copy())
    mr.set_input_data(datasets[0]); mr.set_reference_data(template_data)
    td = tempfile.mkdtemp(prefix="msmpair_iters_")
    mr.outdir = td + "/"
    mr.metrics_path = td + "/m.jsonl"
    t0 = time.perf_counter()
    mr.run_multiresolutions(cfg)
    d = metrics.distortion_stats(*metrics.distortion_maps(mr.in_mesh,
                                                          mr.warped_input))
    cc = metrics.cross_correlation(mr.transformed_data[0], template_data[0])
    out = {"iters": cfg.iters, "cc_sulc": round(float(cc), 4),
           "wall_s": round(time.perf_counter() - t0, 1), **d}
    print(json.dumps(out), flush=True)
    with open(os.path.join(os.path.dirname(__file__), "..",
                           "msmpair_iters.json"), "w") as f:
        json.dump(out, f, indent=1)

if __name__ == "__main__":
    main()
