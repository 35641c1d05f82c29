import numpy as np
import pytest

from newmsm_tpu.core.mesh import Mesh
from newmsm_tpu.reg.config import RegConfig
from newmsm_tpu.reg.driver import MeshRegistration

from fixtures import make_pair, alignment_correlation
from test_registration import small_config


class TestTriclique:
    def test_triclique_registration_improves(self):
        inp, ind, ref, refd = make_pair(res=3, rot_degrees=10.0, seed=4)
        cfg = small_config("HOCR", iters=3)
        cfg.triclique = True
        mr = MeshRegistration()
        mr.set_input(inp)
        mr.set_input_data(ind)
        mr.set_reference(ref)
        mr.set_reference_data(refd)
        import tempfile
        mr.outdir = tempfile.mkdtemp() + "/"
        mr.run_multiresolutions(cfg)
        before = alignment_correlation(ind, refd)
        after = alignment_correlation(mr.transformed_data, refd)
        assert after > before, (before, after)


class TestAnatomical:
    def make_anat(self, mesh, squash=0.6):
        """Synthetic 'anatomical' surface: squashed sphere (ellipsoid)."""
        anat = mesh.copy()
        anat.coords = mesh.coords * np.array([1.0, 1.0, squash])
        return anat

    def test_amsm_registration_runs(self):
        inp, ind, ref, refd = make_pair(res=3, rot_degrees=8.0, seed=6)
        cfg = small_config("HOCR", iters=2)
        cfg.regmode = 5
        cfg.anatgrid = [3]
        mr = MeshRegistration()
        mr.set_input(inp)
        mr.set_input_data(ind)
        mr.set_reference(ref)
        mr.set_reference_data(refd)
        mr.set_anatomical(self.make_anat(inp), self.make_anat(ref))
        import tempfile, os
        mr.outdir = tempfile.mkdtemp() + "/"
        mr.run_multiresolutions(cfg)
        before = alignment_correlation(ind, refd)
        after = alignment_correlation(mr.transformed_data, refd)
        # hard gate (measured 0.820 -> 0.987 at calibration, 2026-08-19):
        # anatomical regularisation must still permit strong alignment
        assert after > before + 0.10, (before, after)
        assert after >= 0.95, after
        # aMSM extras written (mesh_registration.cpp:397-407)
        assert os.path.exists(mr.outdir + "anat.reg.surf.gii")
        assert os.path.exists(mr.outdir + "STRAINS.func.gii")
        strains = Mesh.load(mr.outdir + "STRAINS.func.gii")
        assert strains.data.shape[0] == 4
        assert np.isfinite(strains.data).all()

    def test_amsm_requires_anat(self):
        inp, ind, ref, refd = make_pair(res=3, seed=6)
        cfg = small_config("HOCR", iters=1)
        cfg.regmode = 5
        mr = MeshRegistration()
        mr.set_input(inp)
        mr.set_input_data(ind)
        mr.set_reference(ref)
        mr.set_reference_data(refd)
        with pytest.raises(ValueError):
            mr.run_multiresolutions(cfg)
