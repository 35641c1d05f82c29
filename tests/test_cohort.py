"""Cohort tooling: extract_info / gen_order / run_cohort / register_dataset
(gMSM_scripts/extract_info.py, gen_order.py, *_dataset.sh,
newMSM_HCP_to_template_v2.sh)."""
import os

import numpy as np
import pytest

from newmsm_tpu.core.mesh import Mesh
from newmsm_tpu.pipelines import cohort
from newmsm_tpu.reg.config import RegConfig

from fixtures import smooth_pattern, rotation_matrix
from test_group import group_config, make_group


def _toy_cohort():
    """Groups A(12) B(11) C(3) D(10); full hierarchy
        (A,B)->N1, (C,D)->N2, (N1,N2)->ROOT.
    With min_size=10, C is dropped, so N2 collapses onto D."""
    groups = {
        "A": [f"a{i}" for i in range(12)],
        "B": [f"b{i}" for i in range(11)],
        "C": [f"c{i}" for i in range(3)],
        "D": [f"d{i}" for i in range(10)],
    }
    hierarchy = [("A", "B", "N1"), ("C", "D", "N2"), ("N1", "N2", "ROOT")]
    return groups, hierarchy


class TestExtractInfo:
    def test_prune_and_splice(self):
        groups, hierarchy = _toy_cohort()
        st = cohort.extract_info(groups, hierarchy, "ROOT", min_size=10)
        assert set(st.groups) == {"A", "B", "D"}
        # N2 had a single studied child -> spliced out (lone-leaf collapse)
        assert st.tree == [("A", "B", "N1"), ("N1", "D", "ROOT")]
        assert st.group_sizes["N1"] == 23
        assert st.group_sizes["ROOT"] == 33
        assert len(st.subjects) == 33

    def test_children_before_parents(self):
        groups, hierarchy = _toy_cohort()
        st = cohort.extract_info(groups, hierarchy, "ROOT", min_size=10)
        seen = set(st.groups)
        for left, right, root in st.tree:
            assert left in seen and right in seen
            seen.add(root)

    def test_csv_roundtrip(self, tmp_path):
        groups, hierarchy = _toy_cohort()
        cl = tmp_path / "clusters.csv"
        with open(cl, "w") as f:
            n = 0
            for g, subs in groups.items():
                for s in subs:
                    f.write(f"{n},{s},{g}\n")
                    n += 1
        hi = tmp_path / "hier.csv"
        with open(hi, "w") as f:
            for l, r, ro in hierarchy:
                f.write(f"{l},{r},{ro}\n")
        st = cohort.extract_info(str(cl), str(hi), "ROOT", min_size=10)
        assert set(st.groups) == {"A", "B", "D"}
        cohort.write_study_files(st, str(tmp_path / "work"))
        lines = open(tmp_path / "work" / "group_list.txt").read().splitlines()
        assert sorted(lines) == ["A,12", "B,11", "D,10"]
        assert len(open(tmp_path / "work" /
                        "subjects_in_study.txt").read().split()) == 33

    def test_no_groups_raises(self):
        groups, hierarchy = _toy_cohort()
        with pytest.raises(ValueError):
            cohort.extract_info(groups, hierarchy, "ROOT", min_size=100)


class TestGenOrder:
    def test_rows_and_blocks(self):
        groups, hierarchy = _toy_cohort()
        st = cohort.extract_info(groups, hierarchy, "ROOT", min_size=10)
        order, blocks = cohort.gen_order(st.groups, st.tree)
        # every subject of A and B registered at N1 (reference row format,
        # gen_order.py:49-59), then N1's members + D's at ROOT
        regs = [r for r in order if r.startswith("0,")]
        means = [r for r in order if r.startswith("1,")]
        assert "0,a0,A,B,N1" in regs and "0,b0,B,A,N1" in regs
        assert "1,NA,A,B,N1" in means and "1,NA,N1,D,ROOT" in means
        # N1 registrations: 23 rows; ROOT: 23 (N1 members) + 10 (D) rows
        assert len(regs) == 23 + 33
        # ROOT depends on mean N1 -> its registrations are in a later block
        b_of = {}
        for i, b in enumerate(blocks):
            for row in b:
                b_of[row] = i
        assert b_of["1,NA,A,B,N1"] < b_of["0,a0,N1,D,ROOT"]
        assert b_of["0,a0,A,B,N1"] < b_of["1,NA,A,B,N1"]

    def test_any_row_order_accepted(self):
        # rows read back from the lexicographically sorted study CSV are not
        # children-first; gen_order re-sorts topologically
        groups, hierarchy = _toy_cohort()
        st = cohort.extract_info(groups, hierarchy, "ROOT", min_size=10)
        fwd = cohort.gen_order(st.groups, st.tree)
        rev = cohort.gen_order(st.groups, list(reversed(st.tree)))
        assert fwd == rev

    def test_unknown_group_raises(self):
        groups, hierarchy = _toy_cohort()
        st = cohort.extract_info(groups, hierarchy, "ROOT", min_size=10)
        with pytest.raises(ValueError):
            cohort.gen_order(st.groups, [("A", "NOPE", "N1")])

    def test_deep_chain_hierarchy_no_recursion_limit(self):
        # chain-like dendrogram far past the default recursion limit
        depth = 5000
        groups = {"A": [f"a{i}" for i in range(12)],
                  "B": [f"b{i}" for i in range(11)]}
        hierarchy = [("A", "B", "n0")]
        for i in range(depth):
            hierarchy.append((f"n{i}", f"leaf{i}", f"n{i+1}"))
        st = cohort.extract_info(groups, hierarchy, f"n{depth}", min_size=10)
        # every chain node has a single studied child -> spliced to one row
        assert st.tree == [("A", "B", "n0")]


class TestRunCohort:
    def test_end_to_end_from_csv_inputs(self):
        # 2 kept groups of 2 subjects + 1 dropped singleton group
        meshes, datasets = make_group(4, res=3, degrees=6.0)
        subs = {}
        for i in range(4):
            subs[f"s{i}"] = (meshes[i], datasets[i])
        extra = Mesh.from_icosphere(3)
        subs["tiny"] = (extra, smooth_pattern(extra.coords, 9)[None, :])
        groups = {"G1": ["s0", "s1"], "G2": ["s2", "s3"], "G3": ["tiny"]}
        hierarchy = [("G1", "G2", "N1"), ("N1", "G3", "ROOT")]
        template = Mesh.from_icosphere(3)
        result = cohort.run_cohort(groups, hierarchy, "ROOT", subs, template,
                                   group_config(iters=2), min_size=2)
        assert result.study.tree == [("G1", "G2", "N1")]
        # state is keyed purely by group/node id (no smuggled entries)
        assert all(isinstance(v, dict) for v in result.state.values())
        assert set(result["N1"]["members"]) == {"s0", "s1", "s2", "s3"}
        assert result["N1"]["mean"].shape[-1] == template.nvertices


class TestRegisterDataset:
    def test_batch_pairwise(self, tmp_path):
        mesh = Mesh.from_icosphere(3)
        template = smooth_pattern(mesh.coords, seed=3)[None, :]
        R = rotation_matrix([0.3, 1.0, 0.2], 8.0)
        data = {
            "subA": smooth_pattern(mesh.coords @ R.T, seed=3)[None, :],
            "subB": smooth_pattern(mesh.coords @ R, seed=3)[None, :],
        }
        cfg = RegConfig()
        cfg.cost = ["DISCRETE"]
        cfg.simval = [2]
        cfg.iters = [2]
        cfg.sigma_in = [0.0]
        cfg.sigma_ref = [0.0]
        cfg.reglambda = [0.1]
        cfg.datagrid = [3]
        cfg.cpgrid = [1]
        cfg.sampgrid = [3]
        cfg.anatgrid = [3]
        cfg.mciters = [50]
        cfg.dopt = "HOCR"
        cfg.regmode = 3
        out = str(tmp_path) + "/"
        res = cohort.register_dataset(["subA", "subB"], mesh, template, cfg,
                                      data, outdir=out)
        assert not res.failed
        assert set(res.per_subject) == {"subA", "subB"}
        for s in ("subA", "subB"):
            st = res.per_subject[s]
            assert st["cc"] > 0.4
            assert {"areal_mean", "shape_mean"} <= set(st)
            assert os.path.exists(out + f"{s}.MSM.sphere.reg.surf.gii")
            assert os.path.exists(out + f"{s}.MSM.sphere.distortion.func.gii")

    def test_failure_isolated(self, tmp_path):
        mesh = Mesh.from_icosphere(2)
        template = smooth_pattern(mesh.coords, seed=3)[None, :]

        def get(subject):
            if subject == "bad":
                raise RuntimeError("corrupt input")
            return template

        res = cohort.register_dataset(["bad"], mesh, template,
                                      group_config(iters=1), get)
        assert "bad" in res.failed and not res.per_subject
