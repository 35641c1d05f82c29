import numpy as np
import pytest

from newmsm_tpu.core.mesh import Mesh
from newmsm_tpu.reg.driver import MeshRegistration

from fixtures import make_pair, smooth_pattern, rotation_matrix, alignment_correlation
from test_registration import small_config


def make_multivariate_pair(res=3, rot_degrees=10.0, seeds=(0, 1, 2)):
    ref = Mesh.from_icosphere(res)
    R = rotation_matrix([0.3, 1.0, 0.2], rot_degrees)
    inp = Mesh.from_icosphere(res)
    ref_data = np.stack([smooth_pattern(ref.coords, s) for s in seeds])
    in_data = np.stack([smooth_pattern(inp.coords @ R.T, s) for s in seeds])
    return inp, in_data, ref, ref_data


def run(mr_cfg, inp, ind, ref, refd):
    mr = MeshRegistration()
    mr.set_input(inp)
    mr.set_input_data(ind)
    mr.set_reference(ref)
    mr.set_reference_data(refd)
    import tempfile
    mr.outdir = tempfile.mkdtemp() + "/"
    mr.run_multiresolutions(mr_cfg)
    return mr


class TestMultivariate:
    def test_multivariate_improves(self):
        inp, ind, ref, refd = make_multivariate_pair()
        mr = run(small_config("HOCR", iters=3), inp, ind, ref, refd)
        before = alignment_correlation(ind, refd)
        after = alignment_correlation(mr.transformed_data, refd)
        assert after > before, (before, after)
        assert mr.transformed_data.shape[0] == 3

    def test_patchwise_improves(self):
        inp, ind, ref, refd = make_multivariate_pair(seeds=(3, 4))
        cfg = small_config("HOCR", iters=3)
        cfg.patchwise = True
        mr = run(cfg, inp, ind, ref, refd)
        before = alignment_correlation(ind, refd)
        after = alignment_correlation(mr.transformed_data, refd)
        assert after > before, (before, after)


class TestLabelVariants:
    def test_rescale_labels(self):
        inp, ind, ref, refd = make_pair(res=3, rot_degrees=10.0, seed=8)
        cfg = small_config("HOCR", iters=4)
        cfg.rescaleL = True
        mr = run(cfg, inp, ind, ref, refd)
        before = alignment_correlation(ind, refd)
        after = alignment_correlation(mr.transformed_data, refd)
        assert after > before, (before, after)

    def test_ssd_simval(self):
        inp, ind, ref, refd = make_pair(res=3, rot_degrees=8.0, seed=9)
        mr = run(small_config("HOCR", iters=3, simval=1), inp, ind, ref, refd)
        before = alignment_correlation(ind, refd)
        after = alignment_correlation(mr.transformed_data, refd)
        assert after > before - 0.02

    def test_cfweighting(self):
        # zero weights on half the sphere: registration should still improve
        # the weighted hemisphere
        inp, ind, ref, refd = make_pair(res=3, rot_degrees=8.0, seed=10)
        w = (inp.coords[:, 2] < 0).astype(float)[None, :]
        mr = MeshRegistration()
        mr.set_input(inp)
        mr.set_input_data(ind)
        mr.set_reference(ref)
        mr.set_reference_data(refd)
        mr.set_input_cfweighting(w)
        mr.set_reference_cfweighting(w)
        import tempfile
        mr.outdir = tempfile.mkdtemp() + "/"
        mr.run_multiresolutions(small_config("HOCR", iters=3))
        south = ref.coords[:, 2] < -20
        before = alignment_correlation(ind[:, south], refd[:, south])
        after = alignment_correlation(mr.transformed_data[:, south], refd[:, south])
        assert after > before - 0.02
