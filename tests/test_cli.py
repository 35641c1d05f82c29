import os
import subprocess
import sys
import tempfile

import numpy as np
import pytest

from newmsm_tpu.core.mesh import Mesh
from newmsm_tpu.cli import main as cli_main

from fixtures import make_pair, alignment_correlation


@pytest.fixture(scope="module")
def gifti_pair(tmp_path_factory):
    d = tmp_path_factory.mktemp("cli")
    inp, ind, ref, refd = make_pair(res=3, rot_degrees=10.0, seed=2)
    paths = {}
    for name, mesh, data in (("in", inp, ind), ("ref", ref, refd)):
        mp = str(d / f"{name}.surf.gii")
        dp = str(d / f"{name}.func.gii")
        mesh.save(mp)
        carrier = Mesh(coords=mesh.coords, faces=mesh.faces, data=data)
        carrier.save(dp)
        paths[name] = (mp, dp)
    conf = str(d / "conf")
    with open(conf, "w") as f:
        f.write("--opt=DISCRETE\n--simval=2\n--it=3\n--sigma_in=0\n"
                "--sigma_ref=0\n--lambda=0.1\n--datagrid=3\n--CPgrid=2\n"
                "--SGgrid=4\n--regoption=3\n--dopt=HOCR\n")
    return d, paths, conf, (ind, refd)


class TestCLI:
    def test_pairwise_run(self, gifti_pair):
        d, paths, conf, (ind, refd) = gifti_pair
        out = str(d / "out_")
        rc = cli_main(["--inmesh", paths["in"][0], "--refmesh", paths["ref"][0],
                       "--indata", paths["in"][1], "--refdata", paths["ref"][1],
                       "-o", out, "--conf", conf])
        assert rc == 0
        for suffix in ("sphere.reg.surf.gii", "sphere.LR.reg.surf.gii",
                       "transformed_and_reprojected.func.gii"):
            assert os.path.exists(out + suffix), suffix
        # registered output improves alignment
        from newmsm_tpu.core import io as mio
        ref = Mesh.load(paths["ref"][0])
        res = mio.load_data(out + "transformed_and_reprojected.func.gii", ref)
        assert alignment_correlation(res, refd) > alignment_correlation(ind, refd)

    def test_printoptions(self, capsys):
        assert cli_main(["-p"]) == 0
        out = capsys.readouterr().out
        assert "--lambda" in out and "--CPgrid" in out

    def test_missing_inmesh_errors(self):
        assert cli_main([]) == 1

    def test_trans_initialisation(self, gifti_pair):
        # use a previous output as --trans: should start pre-aligned
        d, paths, conf, (ind, refd) = gifti_pair
        out = str(d / "out_")
        out2 = str(d / "out2_")
        rc = cli_main(["--inmesh", paths["in"][0], "--refmesh", paths["ref"][0],
                       "--indata", paths["in"][1], "--refdata", paths["ref"][1],
                       "-o", out2, "--conf", conf,
                       "--trans", out + "sphere.reg.surf.gii"])
        assert rc == 0
        assert os.path.exists(out2 + "sphere.reg.surf.gii")
