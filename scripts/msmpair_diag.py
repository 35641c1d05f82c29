"""MSMpair (regoption=1) distortion diagnosis (VERDICT round-4 item #3).

Round 4's full-scale MSMpair row showed areal |log2| max 10.4 and was
written off as "expected character" without evidence. This script collects
the evidence:

  * runs the verbatim reference `config_standard_MSMpair` on parity-cohort
    subjects with --metrics, recording the per-iteration FOLDING-gate
    counters (how many (pair,la,lb) entries are gated; whether the chosen
    labeling ever lands on a gated entry — must be 0),
  * sweeps lambda one decade (x1, x3, x10 on the config's per-level
    values) and reports CC + distortion per lambda,

together with tests/test_msmpair_normalization.py (the formula matches the
reference exactly; a joint rigid move of both endpoints costs zero) this
root-causes the distortion: the pairwise penalty is VISCOUS — it charges
only for this iteration's rotation DIFFERENCES relative to the current
grid, so smooth deformation accumulates unpenalised across iterations,
unlike regmode 2/3's elastic level-start strain. Reference:
DiscreteCostFunction.cpp:190-226.

  python scripts/msmpair_diag.py          # full scale on the device
  python scripts/msmpair_diag.py --fast   # reduced CI-scale smoke
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

REF_CFG = "/root/reference/config/basic_configs/config_standard_MSMpair"


def run_one(meshes, datasets, template_data, cfg, subjects, tag, outdir):
    from newmsm_tpu.eval import metrics
    from newmsm_tpu.reg.driver import MeshRegistration

    rows = []
    for s in subjects:
        t0 = time.perf_counter()
        mr = MeshRegistration()
        mr.set_input(meshes[s].copy())
        mr.set_reference(meshes[s].copy())
        mr.set_input_data(datasets[s])
        mr.set_reference_data(template_data)
        mr.outdir = os.path.join(outdir, f"{tag}.s{s}.")
        mr.metrics_path = os.path.join(outdir, f"{tag}.s{s}.metrics.jsonl")
        mr.run_multiresolutions(cfg)
        wall = time.perf_counter() - t0
        areal, shape = metrics.distortion_maps(mr.in_mesh, mr.warped_input)
        d = metrics.distortion_stats(areal, shape)
        cc = metrics.cross_correlation(mr.transformed_data[0],
                                       template_data[0])
        fold = dict(gated_max=0, gated_frac_max=0.0, chosen_gated_total=0)
        with open(mr.metrics_path) as f:
            for line in f:
                ev = json.loads(line)
                if ev.get("event") == "fold_gate":
                    fold["gated_max"] = max(fold["gated_max"],
                                            ev["gated_entries"])
                    fold["gated_frac_max"] = max(fold["gated_frac_max"],
                                                 ev["gated_fraction"])
                    fold["chosen_gated_total"] += ev["chosen_gated"]
        rows.append(dict(subject=s, wall_s=round(wall, 1),
                         cc_sulc=round(float(cc), 4), **d, **fold))
        print(f"  {tag} s{s}: {wall:.0f}s cc={cc:.4f} "
              f"areal_mean={d['areal_mean']:.3f} max={d['areal_max']:.2f} "
              f"gate(max_entries={fold['gated_max']}, "
              f"chosen_gated={fold['chosen_gated_total']})", flush=True)
    agg = {k: float(np.mean([r[k] for r in rows]))
           for k in ("cc_sulc", "areal_mean", "areal_max", "areal_95",
                     "shape_mean", "shape_max")}
    agg["chosen_gated_total"] = int(sum(r["chosen_gated_total"]
                                        for r in rows))
    agg["gated_frac_max"] = max(r["gated_frac_max"] for r in rows)
    return {"rows": rows, **agg}


def main():
    fast = "--fast" in sys.argv
    import jax
    if "--cpu" in sys.argv:
        jax.config.update("jax_platforms", "cpu")
    from newmsm_tpu.core.cache import enable_compile_cache
    enable_compile_cache()
    import tempfile

    from newmsm_tpu.eval.synth import synth_cohort
    from newmsm_tpu.reg.config import parse_config

    res = 4 if fast else 6
    subjects = [0] if fast else [0, 1]
    print(f"device: {jax.devices()[0]}  ico-{res} subjects={subjects}",
          flush=True)
    meshes, datasets, template_data = synth_cohort(res, max(subjects) + 1,
                                                   seed=0)
    outdir = tempfile.mkdtemp(prefix="msmpair_diag_")
    out = {"fast": fast, "res": res}

    for mult in (1.0, 3.0, 10.0):
        cfg = parse_config(REF_CFG)
        cfg.reglambda = [l * mult for l in cfg.reglambda]
        if fast:
            cfg.iters = [4] * len(cfg.iters)
            cfg.cpgrid = [min(g, 2) if g else 0 for g in cfg.cpgrid]
            cfg.datagrid = [min(g, 4) for g in cfg.datagrid]
            cfg.sampgrid = [min(g, 4) if g else 0 for g in cfg.sampgrid]
        tag = f"lam_x{mult:g}"
        print(f"== {tag} (lambda={cfg.reglambda})", flush=True)
        out[tag] = run_one(meshes, datasets, template_data, cfg, subjects,
                           tag, outdir)

    root = os.path.join(os.path.dirname(__file__), "..")
    path = os.path.join(root, "msmpair_diag.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", path, flush=True)


if __name__ == "__main__":
    main()
