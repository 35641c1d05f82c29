"""Full-scale groupwise distortion gate (VERDICT round-4 item #4).

The CI-scale gate in tests/test_parity.py pins the groupwise/typical
areal-mean ratio <=1.75x at reduced scale; this nightly runs the round-5
matched-CC protocol at FULL scale (S=6, ico-6, confound-corrected 'hf'
cohort — scripts/group_full_diag.py) and gates the matched-CC lambda row:
groupwise must beat typical on CC while spending <=1.75x its areal
distortion (the published reference pattern is 1.53x at matched data;
full-scale round-5 measurements, group_full_diag.json: lambda=0.3 ratio
2.30x at CC far above typical, lambda=0.8 -> 1.83x, lambda=1.2 -> 1.638x
with CC still +0.08/+0.21 above typical — the matched-CC point).

Hours-long on the CPU backend, so gated behind NEWMSM_NIGHTLY=1 (runs in
~1 h on a TPU chip with a warm compile cache).
"""
import json
import os
import subprocess
import sys

import pytest

nightly = pytest.mark.skipif(
    os.environ.get("NEWMSM_NIGHTLY", "") != "1",
    reason="full-scale parity run; set NEWMSM_NIGHTLY=1 to run")

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@nightly
def test_hf_matched_cc_ratio_full_scale(tmp_path):
    env = dict(os.environ)
    out_json = os.path.join(ROOT, "group_full_diag.json")
    r = subprocess.run(
        [sys.executable, os.path.join(ROOT, "scripts", "group_full_diag.py"),
         "--phases=hf"],
        capture_output=True, text=True, timeout=4 * 3600, env=env)
    assert r.returncode == 0, r.stderr[-3000:]
    with open(out_json) as f:
        d = json.load(f)
    ty = d["hf_typical"]
    gw = d["hf_groupwise_lam1.2"]
    # matched-CC: groupwise still equal-or-better on CC/DICE...
    assert gw["cc_sulc"] >= ty["cc_sulc"], (gw["cc_sulc"], ty["cc_sulc"])
    assert gw["cc_curv"] >= ty["cc_curv"], (gw["cc_curv"], ty["cc_curv"])
    # ...at the verdict's full-scale distortion bound (measured 1.638)
    assert gw["ratio_vs_typical"] <= 1.75, gw["ratio_vs_typical"]
