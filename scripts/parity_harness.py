"""Registration-quality parity harness (VERDICT round-2 item #3).

Reproduces the reference's gMSM-vs-typical evaluation protocol
(gMSM_scripts/gMSM_tutorial/{gw_MSM.sh,typical_MSM.sh,compare_stats.py};
published results docs/guide.md:429-440) on a synthetic cohort with
HCP-like sulc/curv statistics (newmsm_tpu.eval.synth — real HCP data
cannot ship with the repo):

  typical:   each subject registered pairwise to the group template with
             the reference's config_standard_MSM_strain.
  groupwise: all subjects co-registered with the gMSM tutorial config,
             dedrifted (run_gMSM.sh semantics).
  stats:     mean pairwise CC + DICE@75pct per channel on the
             transformed_and_reprojected maps, plus |log2| areal/shape
             distortion statistics — compare_stats.py line-for-line
             semantics via newmsm_tpu.eval.metrics.

Writes/updates PARITY_RESULTS.md at the repo root. Usage:

  python scripts/parity_harness.py                # full (ico-6, S=6) on TPU
  python scripts/parity_harness.py --fast         # reduced CI-scale run
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

TYPICAL_CONFIG = """\
--simval=2,2,2,2
--sigma_in=2,4,2,1
--sigma_ref=2,4,2,1
--lambda=0,0.2,0.2,0.2
--it=50,20,25,25
--opt=AFFINE,DISCRETE,DISCRETE,DISCRETE
--CPgrid=0,2,3,4
--SGgrid=0,4,5,6
--datagrid=5,5,5,6
--regoption=3
--regexp=2
--dopt=HOCR
--VN
--k_exponent=2
--bulkmod=1.6
--shearmod=0.4
--rescaleL
"""
# config/basic_configs/config_standard_MSM_strain (the reference's standard
# pairwise strain recipe; flag values are the file-format contract)

GROUPWISE_CONFIG = """\
--simval=2,2,2
--sigma_in=0,0,0
--sigma_ref=0,0,0
--lambda=0.3,0.3,0.3
--it=9,9,9
--opt=DISCRETE,DISCRETE,DISCRETE
--CPgrid=2,3,4
--SGgrid=4,5,6
--datagrid=4,5,6
--regoption=3
--regexp=2
--dopt=HOCR
--k_exponent=2
--bulkmod=1.6
--shearmod=0.4
"""
# the gMSM tutorial example config (docs/guide.md:394-411), with lambda
# raised 0.2 -> 0.3 inside the reference's recommended groupwise band of
# 0.2-0.5 (guide.md:386): the round-4 sweep (scripts/sweep_group_lambda.py)
# showed 0.2 spends ~1.65x typical's areal distortion and 0.3 lands at the
# reference's published ~1.5x pattern (guide.md:437-439) at equal CC/DICE

FAST_TYPICAL = TYPICAL_CONFIG.replace(
    "--it=50,20,25,25", "--it=20,4,4,4").replace(
    "--datagrid=5,5,5,6", "--datagrid=3,3,4,4").replace(
    "--CPgrid=0,2,3,4", "--CPgrid=0,1,2,2").replace(
    "--SGgrid=0,4,5,6", "--SGgrid=0,3,4,4").replace(
    "--sigma_in=2,4,2,1", "--sigma_in=2,4,2,2").replace(
    "--sigma_ref=2,4,2,1", "--sigma_ref=2,4,2,2")

FAST_GROUPWISE = GROUPWISE_CONFIG.replace(
    "--it=9,9,9", "--it=4,4,4").replace(
    "--datagrid=4,5,6", "--datagrid=3,4,4").replace(
    "--CPgrid=2,3,4", "--CPgrid=1,2,2").replace(
    "--SGgrid=4,5,6", "--SGgrid=3,4,4")

# the reference's SECOND shipped basic config: pairwise-rotation regulariser
# (regoption=1) solved by the FastPD-replacement path (VERDICT r3 item #6).
# Parsed verbatim from the reference file when present.
_MSMPAIR_REF = "/root/reference/config/basic_configs/config_standard_MSMpair"
MSMPAIR_CONFIG = """\
--sigma_in=6,6,4,2
--sigma_ref=6,6,4,2
--lambda=0,0.1,0.2,0.3
--it=50,5,10,10
--opt=AFFINE,DISCRETE,DISCRETE,DISCRETE
--CPgrid=0,2,3,4
--SGgrid=0,4,5,6
--datagrid=5,5,5,6
--regoption=1
"""

FAST_MSMPAIR = MSMPAIR_CONFIG.replace(
    "--it=50,5,10,10", "--it=20,3,3,3").replace(
    "--datagrid=5,5,5,6", "--datagrid=3,3,4,4").replace(
    "--CPgrid=0,2,3,4", "--CPgrid=0,1,2,2").replace(
    "--SGgrid=0,4,5,6", "--SGgrid=0,3,4,4").replace(
    "--sigma_in=6,6,4,2", "--sigma_in=4,4,2,2").replace(
    "--sigma_ref=6,6,4,2", "--sigma_ref=4,4,2,2")


def _cfg(text):
    import tempfile
    from newmsm_tpu.reg.config import parse_config
    with tempfile.NamedTemporaryFile("w", suffix=".txt", delete=False) as f:
        f.write(text)
        path = f.name
    cfg = parse_config(path)
    os.unlink(path)
    return cfg


def channel_stats(maps, percentile=75.0):
    """Per-channel mean pairwise CC and DICE (compare_stats.py:44-66)."""
    from newmsm_tpu.eval import metrics
    out = {}
    for d, name in enumerate(("sulc", "curv")):
        ch = [m[d] for m in maps]
        out[f"cc_{name}"] = metrics.mean_pairwise_cc(ch)
        out[f"dice_{name}"] = metrics.mean_pairwise_dice(ch, percentile)
    return out


def run_typical(meshes, datasets, template_data, cfg, verbose=True):
    from newmsm_tpu.eval import metrics
    from newmsm_tpu.reg.driver import MeshRegistration
    import tempfile

    maps, dists = [], []
    tdir = tempfile.TemporaryDirectory(prefix="parity_typical_")
    for s in range(len(meshes)):
        t0 = time.perf_counter()
        mr = MeshRegistration()
        mr.set_input(meshes[s].copy())
        mr.set_reference(meshes[s].copy())
        mr.set_input_data(datasets[s])
        mr.set_reference_data(template_data)
        mr.outdir = os.path.join(tdir.name, f"s{s}.")
        mr.run_multiresolutions(cfg)
        maps.append(np.asarray(mr.transformed_data))
        areal, shape = metrics.distortion_maps(mr.in_mesh, mr.warped_input)
        dists.append(metrics.distortion_stats(areal, shape))
        if verbose:
            print(f"  typical subject {s}: {time.perf_counter()-t0:.1f}s "
                  f"cc_sulc={metrics.cross_correlation(maps[-1][0], template_data[0]):.4f}",
                  flush=True)
    stats = channel_stats(maps)
    for key in dists[0]:
        stats[key] = float(np.mean([d[key] for d in dists]))
    return stats


def run_groupwise(meshes, datasets, template, cfg, verbose=True):
    from newmsm_tpu.eval import metrics
    from newmsm_tpu.pipelines.gmsm import run_gmsm
    t0 = time.perf_counter()
    res = run_gmsm([m.copy() for m in meshes], [d.copy() for d in datasets],
                   template, cfg, verbose=verbose, dedrift_warps=True)
    if verbose:
        print(f"  groupwise: {time.perf_counter()-t0:.1f}s", flush=True)
    stats = channel_stats(res.resampled_data)
    dists = []
    for s, m in enumerate(res.dedrifted_spheres):
        areal, shape = metrics.distortion_maps(meshes[s], m)
        dists.append(metrics.distortion_stats(areal, shape))
    for key in dists[0]:
        stats[key] = float(np.mean([d[key] for d in dists]))
    return stats


def fmt_row(stats):
    return (f"| {stats['cc_sulc']:.4f} | {stats['dice_sulc']:.4f} "
            f"| {stats['cc_curv']:.4f} | {stats['dice_curv']:.4f} "
            f"| {stats['areal_mean']:.4f} | {stats['areal_max']:.3f} "
            f"| {stats['areal_95']:.4f} | {stats['areal_98']:.4f} "
            f"| {stats['shape_mean']:.4f} | {stats['shape_max']:.3f} |")


def main():
    fast = "--fast" in sys.argv
    # phase selection / resume: long TPU runs can die mid-phase (tunnel
    # worker restarts); completed phases are merged from the existing
    # parity_<tag>.json so only the missing ones re-run.
    phases = {"typical", "msmpair", "groupwise"}
    for a in sys.argv:
        if a.startswith("--phases="):
            phases = set(a.split("=", 1)[1].split(","))
    import jax
    if "--cpu" in sys.argv:
        # the environment pre-imports jax; env vars are too late
        jax.config.update("jax_platforms", "cpu")
    from newmsm_tpu.core.cache import enable_compile_cache
    enable_compile_cache()
    from newmsm_tpu.core.mesh import Mesh
    from newmsm_tpu.eval.synth import synth_cohort

    S = 4 if fast else 6
    res = 4 if fast else 6
    print(f"device: {jax.devices()[0]}  cohort: S={S} ico-{res}", flush=True)
    meshes, datasets, template_data = synth_cohort(res, S, seed=0)
    template = Mesh.from_icosphere(res)
    template.true_rescale(100.0)

    before = channel_stats(datasets)
    before.update(areal_mean=0.0, areal_max=0.0, areal_95=0.0, areal_98=0.0,
                  shape_mean=0.0, shape_max=0.0)   # identity warp
    print("before:", json.dumps(before), flush=True)

    tag = "fast" if fast else "full"
    root = os.path.join(os.path.dirname(__file__), "..")
    json_path = os.path.join(root, f"parity_{tag}.json")
    prev = {}
    if os.path.exists(json_path):
        with open(json_path) as f:
            prev = json.load(f)

    out = {"fast": fast, "S": S, "res": res, "before": before}

    if "typical" in phases:
        out["typical"] = run_typical(
            meshes, datasets, template_data,
            _cfg(FAST_TYPICAL if fast else TYPICAL_CONFIG))
    elif "typical" in prev:
        out["typical"] = prev["typical"]
    else:
        raise SystemExit("typical phase neither requested nor in prior JSON")
    print("typical:", json.dumps(out["typical"]), flush=True)

    if "msmpair" in phases:
        if fast or not os.path.exists(_MSMPAIR_REF):
            pair_cfg = _cfg(FAST_MSMPAIR)
        else:
            from newmsm_tpu.reg.config import parse_config
            pair_cfg = parse_config(_MSMPAIR_REF)   # the reference file, verbatim
        out["msmpair"] = run_typical(meshes, datasets, template_data,
                                     pair_cfg)
    elif "msmpair" in prev:
        out["msmpair"] = prev["msmpair"]
    if "msmpair" in out:
        print("msmpair:", json.dumps(out["msmpair"]), flush=True)

    if "groupwise" in phases:
        out["groupwise"] = run_groupwise(
            meshes, datasets, template,
            _cfg(FAST_GROUPWISE if fast else GROUPWISE_CONFIG))
    elif "groupwise" in prev:
        out["groupwise"] = prev["groupwise"]
    else:
        raise SystemExit("groupwise phase neither requested nor in prior JSON")
    print("groupwise:", json.dumps(out["groupwise"]), flush=True)

    with open(json_path, "w") as f:
        json.dump(out, f, indent=1)
    write_markdown(out, os.path.join(root, "PARITY_RESULTS.md"))
    print("wrote PARITY_RESULTS.md", flush=True)


def write_markdown(out, path):
    lines = [
        "# PARITY_RESULTS — registration quality vs the reference protocol",
        "",
        "Synthetic HCP-like cohort (`newmsm_tpu.eval.synth`, sulc+curv "
        "channels, smooth per-subject warps + idiosyncratic folds), "
        f"S={out['S']} subjects on the ico-{out['res']} sphere. "
        "Evaluation protocol = the reference's compare_stats.py "
        "(mean pairwise CC, DICE of top-25% masks, |log2| areal/shape "
        "distortion; gMSM_scripts/gMSM_tutorial/compare_stats.py), "
        "configs = config_standard_MSM_strain (typical) and the gMSM "
        "tutorial config (groupwise)." + (" REDUCED (--fast) scale."
                                          if out["fast"] else ""),
        "",
        "| run | CC sulc | DICE sulc | CC curv | DICE curv | areal mean "
        "| areal max | areal 95% | areal 98% | shape mean | shape max |",
        "|---|---|---|---|---|---|---|---|---|---|---|",
        "| unregistered " + fmt_row(out["before"]),
        "| typical (subject->template) " + fmt_row(out["typical"]),
        ("| MSMpair (regoption=1, FastPD path) " + fmt_row(out["msmpair"])
         if "msmpair" in out else ""),
        "| groupwise (gMSM + dedrift) " + fmt_row(out["groupwise"]),
        "",
        "Groupwise/typical areal-mean ratio: "
        f"**{out['groupwise']['areal_mean'] / max(out['typical']['areal_mean'], 1e-9):.2f}x** "
        "(reference's published NODE2078 ratio: 1.53x, guide.md:437-439; "
        "groupwise lambda=0.3 inside the recommended 0.2-0.5 band, "
        "guide.md:386 — see scripts/sweep_group_lambda.py).",
        "",
        "Reference's published HCP numbers for group NODE2078 "
        "(docs/guide.md:429-440 — different data, so magnitudes are not "
        "directly comparable; the *pattern* to match is groupwise > typical "
        "on CC/DICE at moderate extra distortion):",
        "",
        "| run | CC sulc | DICE sulc | CC curv | DICE curv | areal mean "
        "| areal max | areal 95% | areal 98% | shape mean | shape max |",
        "|---|---|---|---|---|---|---|---|---|---|---|",
        "| typical | 0.722 | 0.6028 | 0.2469 | 0.4056 | 0.1707 | 0.6959 "
        "| 0.3755 | 0.4272 | 0.4109 | 1.69 |",
        "| groupwise | 0.8011 | 0.67 | 0.5337 | 0.5684 | 0.2604 | 1.209 "
        "| 0.587 | 0.6701 | 0.544 | 1.801 |",
        "",
        "Tracked per round; tests/test_parity.py enforces regression "
        "thresholds on the reduced-scale run.",
        "",
    ]
    # preserve the hand-maintained analysis sections (round-4/5 notes,
    # flagship rows, diagnosis writeups) that live after the tables: a
    # regeneration must never clobber them (round-5 near-miss)
    preserved = ""
    try:
        with open(path) as f:
            old = f.read()
        marker = "## Round-4 full-scale notes"
        if marker in old:
            preserved = old[old.index(marker):]
    except FileNotFoundError:
        pass
    if preserved:
        lines += [preserved.rstrip()]
    # drop empty strings produced by a missing optional row (they would
    # split the markdown table)
    cleaned = []
    for i, l in enumerate(lines):
        if l == "" and 0 < i < len(lines) - 1 and lines[i - 1].startswith("|") \
                and lines[i + 1].startswith("|"):
            continue
        cleaned.append(l)
    with open(path, "w") as f:
        f.write("\n".join(cleaned))


if __name__ == "__main__":
    main()
