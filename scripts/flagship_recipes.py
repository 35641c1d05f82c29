"""End-to-end runs of the reference's flagship recipe families
(VERDICT round-4 item #2: BASELINE configs #2 and #3 were parsed but never
EXECUTED at full scale).

Two phases, both using the reference's shipped config files VERBATIM:

  amsm        config/NeuroImage2017_configs/aMSM_STR_longitudinal_alignment
              (--regoption=5 --anatgrid=4,5,6 --triclique, 3 levels
              CPgrid 2/3/4, datagrid 4/5/6) on a synthetic longitudinal
              pair (eval.synth.longitudinal_pair: grown, deeper-folded
              timepoint-2 anatomy) at ico-6.
  multimodal  config/HCP_multimodal_alignment/MSMAllStrainFinalconf1to1_1to3_2
              (--regoption=3 --triclique, 3 levels) with a D=10-channel
              MSMAll-like cohort (eval.synth.multimodal_cohort: sulc, curv,
              myelin-like + 7 RSN-like maps) at ico-6, subject->template.

Writes results to flagship_results.json and appends the quality rows to
PARITY_RESULTS.md (via the same stats pipeline as parity_harness).
Phase selection/resume mirrors parity_harness: --phases=amsm,multimodal;
completed phases merge from the existing JSON.

  python scripts/flagship_recipes.py            # full scale on the device
  python scripts/flagship_recipes.py --fast     # reduced CI-scale smoke
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

AMSM_CFG = "/root/reference/config/NeuroImage2017_configs/aMSM_STR_longitudinal_alignment"
MULTI_CFG = "/root/reference/config/HCP_multimodal_alignment/MSMAllStrainFinalconf1to1_1to3_2"


def _load_cfg(path, fast):
    from newmsm_tpu.reg.config import parse_config
    cfg = parse_config(path)
    if fast:
        cfg.iters = [2] * len(cfg.iters)
        cfg.cpgrid = [min(g, 2) for g in cfg.cpgrid]
        cfg.datagrid = [min(g, 3) for g in cfg.datagrid]
        cfg.sampgrid = [min(g, 3) for g in cfg.sampgrid]
        if cfg.anatgrid:
            cfg.anatgrid = [min(g, 3) for g in cfg.anatgrid]
    return cfg


def run_amsm(fast, verbose=True):
    """aMSM longitudinal alignment with the reference config verbatim."""
    import tempfile

    from newmsm_tpu.core.mesh import Mesh
    from newmsm_tpu.eval import metrics
    from newmsm_tpu.eval.synth import longitudinal_pair
    from newmsm_tpu.reg.driver import MeshRegistration

    res = 4 if fast else 6
    cfg = _load_cfg(AMSM_CFG, fast)
    (in_mesh, in_data, in_anat, ref_mesh, ref_data, ref_anat) = \
        longitudinal_pair(res, seed=0)

    t0 = time.perf_counter()
    mr = MeshRegistration()
    mr.set_input(in_mesh)
    mr.set_input_data(in_data)
    mr.set_reference(ref_mesh)
    mr.set_reference_data(ref_data)
    mr.set_anatomical(in_anat, ref_anat)
    tdir = tempfile.mkdtemp(prefix="flagship_amsm_")
    mr.outdir = tdir + "/"
    mr.verbose = verbose
    mr.run_multiresolutions(cfg)
    wall = time.perf_counter() - t0

    before = metrics.cross_correlation(in_data[0], ref_data[0])
    after = metrics.cross_correlation(mr.transformed_data[0], ref_data[0])
    areal, shape = metrics.distortion_maps(mr.in_mesh, mr.warped_input)
    dist = metrics.distortion_stats(areal, shape)
    # aMSM extras (mesh_registration.cpp:397-407): deformed anatomy + the
    # 4-row STRAINS map must exist and be finite
    anat_reg = Mesh.load(os.path.join(tdir, "anat.reg.surf.gii"))
    strains = Mesh.load(os.path.join(tdir, "STRAINS.func.gii"))
    assert strains.data.shape[0] == 4 and np.isfinite(strains.data).all()
    # anatomical alignment: anat.reg is the tp2 anatomy carried to the
    # INPUT vertex set through the recovered warp (project_anatomical_mesh)
    # — after registration its radial fold profile should line up with the
    # tp1 anatomy's vertex-for-vertex; before = raw tp2 vs tp1
    r_reg = np.linalg.norm(anat_reg.coords, axis=1)
    r_ref = np.linalg.norm(ref_anat.coords, axis=1)
    r_in = np.linalg.norm(in_anat.coords, axis=1)
    anat_cc = metrics.cross_correlation(r_reg, r_in)
    anat_cc_before = metrics.cross_correlation(r_ref, r_in)
    out = {"config": os.path.basename(AMSM_CFG), "res": res,
           "wall_s": round(wall, 1),
           "cc_sulc_before": round(float(before), 4),
           "cc_sulc_after": round(float(after), 4),
           "anat_radial_cc_before": round(float(anat_cc_before), 4),
           "anat_radial_cc_after": round(float(anat_cc), 4),
           "strain_rows_finite": True, **dist}
    return out


def run_multimodal(fast, verbose=True):
    """HCP MSMAll-class multimodal recipe, D=10 channels, S subjects ->
    template; reports per-channel-family CC/DICE + distortion stats."""
    import tempfile

    from newmsm_tpu.eval import metrics
    from newmsm_tpu.eval.synth import multimodal_cohort
    from newmsm_tpu.reg.driver import MeshRegistration

    res, S, D = (3, 2, 6) if fast else (6, 3, 10)
    cfg = _load_cfg(MULTI_CFG, fast)
    meshes, datasets, template_data = multimodal_cohort(res, S, n_channels=D,
                                                        seed=0)
    tdir = tempfile.mkdtemp(prefix="flagship_multi_")
    maps, dists, walls = [], [], []
    for s in range(S):
        t0 = time.perf_counter()
        mr = MeshRegistration()
        mr.set_input(meshes[s].copy())
        mr.set_reference(meshes[s].copy())
        mr.set_input_data(datasets[s])
        mr.set_reference_data(template_data)
        mr.outdir = os.path.join(tdir, f"s{s}.")
        mr.verbose = verbose
        mr.run_multiresolutions(cfg)
        walls.append(time.perf_counter() - t0)
        maps.append(np.asarray(mr.transformed_data))
        areal, shape = metrics.distortion_maps(mr.in_mesh, mr.warped_input)
        dists.append(metrics.distortion_stats(areal, shape))
        if verbose:
            print(f"  multimodal subject {s}: {walls[-1]:.1f}s", flush=True)

    out = {"config": os.path.basename(MULTI_CFG), "res": res, "S": S, "D": D,
           "wall_s_per_subject": round(float(np.mean(walls)), 1)}
    ccs_b, ccs_a = [], []
    for d in range(D):
        b = float(np.mean([metrics.cross_correlation(datasets[s][d],
                                                     template_data[d])
                           for s in range(S)]))
        a = float(np.mean([metrics.cross_correlation(maps[s][d],
                                                     template_data[d])
                           for s in range(S)]))
        ccs_b.append(b)
        ccs_a.append(a)
    out["cc_before_mean"] = round(float(np.mean(ccs_b)), 4)
    out["cc_after_mean"] = round(float(np.mean(ccs_a)), 4)
    out["cc_after_per_channel"] = [round(c, 4) for c in ccs_a]
    out["cc_before_per_channel"] = [round(c, 4) for c in ccs_b]
    for key in dists[0]:
        out[key] = float(np.mean([d[key] for d in dists]))
    return out


def append_markdown(out, path):
    header = ("## Flagship recipe rows (round 5, reference configs "
              "verbatim, one TPU v5e)")
    with open(path) as f:
        if header in f.read():
            print("flagship section already in PARITY_RESULTS.md — edit "
                  "manually to update (results are in flagship_full.json)",
                  flush=True)
            return
    lines = ["", header, ""]
    if "amsm" in out:
        a = out["amsm"]
        lines += [
            f"- **aMSM** (`{a['config']}`, regoption=5 + anatgrid + "
            f"triclique, ico-{a['res']}, {a['wall_s']}s): sulc CC "
            f"{a['cc_sulc_before']:.3f} -> {a['cc_sulc_after']:.3f}; "
            f"anatomy radial-profile CC {a['anat_radial_cc_before']:.3f} -> "
            f"{a['anat_radial_cc_after']:.3f}; areal |log2| mean "
            f"{a['areal_mean']:.3f} max {a['areal_max']:.3f}; STRAINS "
            "output finite (4 rows).",
        ]
    if "multimodal" in out:
        m = out["multimodal"]
        lines += [
            f"- **HCP multimodal** (`{m['config']}`, triclique, D={m['D']} "
            f"channels, S={m['S']}, ico-{m['res']}, "
            f"{m['wall_s_per_subject']}s/subject): mean CC over channels "
            f"{m['cc_before_mean']:.3f} -> {m['cc_after_mean']:.3f}; areal "
            f"|log2| mean {m['areal_mean']:.3f} max {m['areal_max']:.3f}.",
        ]
    with open(path, "a") as f:
        f.write("\n".join(lines) + "\n")


def main():
    fast = "--fast" in sys.argv
    phases = {"amsm", "multimodal"}
    for a in sys.argv:
        if a.startswith("--phases="):
            phases = set(a.split("=", 1)[1].split(","))
    import jax
    if "--cpu" in sys.argv:
        jax.config.update("jax_platforms", "cpu")
    from newmsm_tpu.core.cache import enable_compile_cache
    enable_compile_cache()
    print(f"device: {jax.devices()[0]}  fast={fast}", flush=True)

    root = os.path.join(os.path.dirname(__file__), "..")
    tag = "fast" if fast else "full"
    json_path = os.path.join(root, f"flagship_{tag}.json")
    prev = {}
    if os.path.exists(json_path):
        with open(json_path) as f:
            prev = json.load(f)
    out = {"fast": fast}

    if "amsm" in phases:
        t0 = time.perf_counter()
        out["amsm"] = run_amsm(fast)
        print(f"amsm ({time.perf_counter()-t0:.0f}s):",
              json.dumps(out["amsm"]), flush=True)
    elif "amsm" in prev:
        out["amsm"] = prev["amsm"]

    if "multimodal" in phases:
        t0 = time.perf_counter()
        out["multimodal"] = run_multimodal(fast)
        print(f"multimodal ({time.perf_counter()-t0:.0f}s):",
              json.dumps(out["multimodal"]), flush=True)
    elif "multimodal" in prev:
        out["multimodal"] = prev["multimodal"]

    with open(json_path, "w") as f:
        json.dump(out, f, indent=1)
    if not fast:
        append_markdown(out, os.path.join(root, "PARITY_RESULTS.md"))
        print("appended PARITY_RESULTS.md", flush=True)


if __name__ == "__main__":
    main()
