"""Registration-quality regression gates (VERDICT round-2 item #3).

Mini-scale version of scripts/parity_harness.py: a synthetic HCP-like
cohort (eval/synth.py) pushed through the REAL typical (pairwise,
config_standard_MSM_strain structure) and groupwise (gMSM tutorial config
structure) paths, scored with the reference's compare_stats.py protocol
(eval/metrics.py). Hard thresholds — not "after > before" — so quality
regressions fail CI. Full-scale numbers are tracked in PARITY_RESULTS.md.
"""
import numpy as np
import pytest

from newmsm_tpu.core.mesh import Mesh
from newmsm_tpu.eval import metrics
from newmsm_tpu.eval.synth import synth_cohort
from newmsm_tpu.reg.config import RegConfig


S, RES = 4, 3


@pytest.fixture(scope="module")
def cohort():
    meshes, datasets, template_data = synth_cohort(RES, S, seed=0,
                                                   warp_deg=6.0)
    template = Mesh.from_icosphere(RES)
    template.true_rescale(100.0)
    return meshes, datasets, template, template_data


def channel_stats(maps):
    out = {}
    for d, name in enumerate(("sulc", "curv")):
        ch = [m[d] for m in maps]
        out[f"cc_{name}"] = metrics.mean_pairwise_cc(ch)
        out[f"dice_{name}"] = metrics.mean_pairwise_dice(ch)
    return out


def typical_config():
    # config_standard_MSM_strain structure at ico-3 scale
    cfg = RegConfig()
    cfg.cost = ["AFFINE", "DISCRETE", "DISCRETE"]
    cfg.simval = [2, 2, 2]
    cfg.iters = [10, 3, 3]
    cfg.sigma_in = [2.0, 2.0, 1.0]
    cfg.sigma_ref = [2.0, 2.0, 1.0]
    cfg.reglambda = [0.0, 0.2, 0.2]
    cfg.datagrid = [3, 3, 3]
    cfg.cpgrid = [0, 1, 2]
    cfg.sampgrid = [0, 3, 4]
    cfg.anatgrid = [3, 3, 3]
    cfg.mciters = [0, 0, 0]
    cfg.dopt = "HOCR"
    cfg.regmode = 3
    cfg.variance_norm = True
    return cfg


def groupwise_config():
    # gMSM tutorial config structure at ico-3 scale. lambda=0.3: the
    # reference recommends 0.2-0.5 for groupwise (guide.md:386); the round-4
    # sweep (scripts/sweep_group_lambda.py) measured areal ratios 1.65 /
    # 1.49 / 1.48 / 1.36 at lambda 0.2 / 0.3 / 0.4 / 0.6 with CC/DICE above
    # typical throughout — 0.3 reproduces the reference's published ~1.5x
    # groupwise-vs-typical distortion pattern (guide.md:437-439)
    cfg = RegConfig()
    cfg.cost = ["DISCRETE", "DISCRETE"]
    cfg.simval = [2, 2]
    cfg.iters = [4, 4]
    cfg.sigma_in = [0.0, 0.0]
    cfg.sigma_ref = [0.0, 0.0]
    cfg.reglambda = [0.3, 0.3]
    cfg.datagrid = [3, 3]
    cfg.cpgrid = [1, 2]
    cfg.sampgrid = [3, 4]
    cfg.anatgrid = [3, 3]
    cfg.mciters = [0, 0]
    cfg.dopt = "HOCR"
    cfg.regmode = 3
    return cfg


class TestQualityParity:
    def test_typical_and_groupwise_thresholds(self, cohort, tmp_path):
        from newmsm_tpu.pipelines.gmsm import run_gmsm
        from newmsm_tpu.reg.driver import MeshRegistration

        meshes, datasets, template, template_data = cohort
        before = channel_stats(datasets)

        # ---- typical: subject -> template pairwise ----
        t_maps, t_dists = [], []
        for s in range(S):
            mr = MeshRegistration()
            mr.set_input(meshes[s].copy())
            mr.set_reference(meshes[s].copy())
            mr.set_input_data(datasets[s])
            mr.set_reference_data(template_data)
            mr.outdir = str(tmp_path / f"t{s}.")
            mr.run_multiresolutions(typical_config())
            t_maps.append(np.asarray(mr.transformed_data))
            areal, shape = metrics.distortion_maps(mr.in_mesh,
                                                   mr.warped_input)
            t_dists.append(metrics.distortion_stats(areal, shape))
        typical = channel_stats(t_maps)

        # ---- groupwise gMSM + dedrift ----
        res = run_gmsm([m.copy() for m in meshes],
                       [d.copy() for d in datasets], template,
                       groupwise_config(), dedrift_warps=True)
        group = channel_stats(res.resampled_data)
        g_dists = [metrics.distortion_stats(*metrics.distortion_maps(
            meshes[s], res.dedrifted_spheres[s])) for s in range(S)]

        # ---- hard gates (set below the 2026-08-20 round-4 calibration so
        # genuine regressions fail while numeric jitter passes) ----
        # measured at calibration (scripts/sweep_group_lambda.py, lam=0.3):
        # before cc_sulc 0.646 / cc_curv 0.162;
        # typical cc_sulc 0.713 dice 0.599 areal 0.137;
        # groupwise cc_sulc 0.811 dice 0.696 cc_curv 0.453 areal 0.204
        assert typical["cc_sulc"] > before["cc_sulc"] + 0.03
        assert typical["cc_sulc"] >= 0.69, typical
        assert typical["dice_sulc"] >= 0.57, typical
        assert group["cc_sulc"] >= 0.77, group
        assert group["dice_sulc"] >= 0.64, group
        assert group["cc_curv"] >= before["cc_curv"] + 0.05, (before, group)

        # distortion bounded: mean |log2 areal| below the reference's
        # published groupwise level plus headroom (guide.md:437-439), and —
        # the VERDICT r3 gate — the groupwise/typical areal-mean RATIO near
        # the reference's published 1.5x (0.2604/0.1707), not the round-3
        # 2.2x overshoot. Calibration: ratio 1.49 at lambda=0.3.
        t_areal = np.mean([d["areal_mean"] for d in t_dists])
        g_areal = np.mean([d["areal_mean"] for d in g_dists])
        assert t_areal <= 0.30, t_areal
        assert g_areal <= 0.40, g_areal
        assert g_areal <= 1.75 * t_areal, (g_areal, t_areal)

        # warps stay fold-free (the sanitizer gate)
        from newmsm_tpu.ops.unfold import count_folds
        for m in res.dedrifted_spheres:
            assert count_folds(m) == 0

    def test_msmpair_lambda_response_and_gate(self, cohort, tmp_path):
        """MSMpair (regoption=1) gate (VERDICT r4 #3): at CI scale the
        pairwise penalty must respond to lambda (distortion strictly
        decreasing over a 10x raise), the chosen labeling must NEVER land
        on a FOLDING-gated entry, and the lam-x3 distortion must sit
        within ~2x of the strain-typical level. Full-scale behaviour
        (lambda-insensitive viscous churn) is root-caused in
        PARITY_RESULTS.md — it is a property of the reference's own
        energy, so CI gates the regime where lambda verifiably bites."""
        import json

        from newmsm_tpu.reg.driver import MeshRegistration

        meshes, datasets, template, template_data = cohort

        def run(lmult, tag):
            cfg = RegConfig()
            cfg.cost = ["AFFINE", "DISCRETE", "DISCRETE"]
            cfg.simval = [2, 2, 2]
            cfg.iters = [10, 3, 3]
            cfg.sigma_in = [2.0, 2.0, 1.0]
            cfg.sigma_ref = [2.0, 2.0, 1.0]
            cfg.reglambda = [0.0, 0.1 * lmult, 0.2 * lmult]
            cfg.datagrid = [3, 3, 3]
            cfg.cpgrid = [0, 1, 2]
            cfg.sampgrid = [0, 3, 4]
            cfg.anatgrid = [3, 3, 3]
            cfg.mciters = [0, 0, 0]
            cfg.dopt = "HOCR"
            cfg.regmode = 1
            mr = MeshRegistration()
            mr.set_input(meshes[0].copy())
            mr.set_reference(meshes[0].copy())
            mr.set_input_data(datasets[0])
            mr.set_reference_data(template_data)
            mr.outdir = str(tmp_path / f"p{tag}.")
            mr.metrics_path = str(tmp_path / f"p{tag}.jsonl")
            mr.run_multiresolutions(cfg)
            d = metrics.distortion_stats(*metrics.distortion_maps(
                mr.in_mesh, mr.warped_input))
            chosen_gated = 0
            with open(mr.metrics_path) as f:
                for line in f:
                    ev = json.loads(line)
                    if ev.get("event") == "fold_gate":
                        chosen_gated += ev["chosen_gated"]
            cc = metrics.cross_correlation(mr.transformed_data[0],
                                           template_data[0])
            return d["areal_mean"], chosen_gated, float(cc)

        a1, g1, cc1 = run(1.0, "x1")
        a10, g10, cc10 = run(10.0, "x10")
        assert g1 == 0 and g10 == 0, (g1, g10)
        assert a10 < a1, (a1, a10)              # lambda bites at CI scale
        a3, g3, cc3 = run(3.0, "x3")
        assert g3 == 0
        # within ~2x of the strain-typical CI level (~0.14 at calibration)
        assert a3 <= 0.30, (a1, a3, a10)
        assert cc3 > 0.60, cc3
