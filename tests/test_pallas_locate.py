"""Fused Pallas locate kernel (ops/pallas_locate.py) vs the XLA scan path.

Runs in interpreter mode on the CPU test backend — same arithmetic as the
XLA path, so fid/weights must agree EXACTLY (on the TPU the kernel differs
only by FMA/rsqrt rounding at face boundaries; its containment quality was
measured identical to the XLA path, docs/PERFORMANCE.md round 3).
"""
import functools

import numpy as np
import jax.numpy as jnp
import pytest

from newmsm_tpu.ops import nearest as nst
from newmsm_tpu.ops import pallas_locate as PL


def _queries(n, seed=0, radius=100.0):
    rng = np.random.default_rng(seed)
    q = rng.normal(size=(n, 3)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    return q * radius


@pytest.mark.parametrize("res", [0, 2, 5])
def test_locate_matches_xla_path(res):
    q = _queries(2000, seed=res)
    px, py, pz = (jnp.asarray(q[:, i]) for i in range(3))
    fid_p, w0p, w1p, w2p = PL.locate_bary_pallas(px, py, pz, res,
                                                 interpret=True)
    u = q / np.linalg.norm(q, axis=1, keepdims=True)
    ux, uy, uz = (jnp.asarray(u[:, i]) for i in range(3))
    fid_x, va, vb, vc = nst._locate_pristine_soa(ux, uy, uz, res)
    w0x, w1x, w2x = nst._bary_weights_soa((ux, uy, uz), va, vb, vc)
    np.testing.assert_array_equal(np.asarray(fid_p), np.asarray(fid_x))
    for wp, wx in ((w0p, w0x), (w1p, w1x), (w2p, w2x)):
        np.testing.assert_allclose(np.asarray(wp), np.asarray(wx),
                                   atol=1e-5, rtol=0)


def test_locate_weights_partition_of_unity_at_vertices():
    # queries exactly at icosphere vertices sit on face boundaries: any
    # incident face is valid, weights must still sum to 1 with the mass on
    # the shared vertex
    from newmsm_tpu.core.icosphere import icosphere
    res = 3
    ico = icosphere(res)
    q = ico.coords[:100].astype(np.float32) * 100.0
    px, py, pz = (jnp.asarray(q[:, i]) for i in range(3))
    fid, w0, w1, w2 = PL.locate_bary_pallas(px, py, pz, res, interpret=True)
    fid = np.asarray(fid)
    W = np.stack([w0, w1, w2], 1)
    np.testing.assert_allclose(W.sum(1), 1.0, atol=1e-5)
    # the face must be incident to the vertex and carry its weight
    fv = ico.faces[fid]                                   # (Q,3)
    hit = fv == np.arange(100)[:, None]
    assert hit.any(axis=1).all()
    np.testing.assert_allclose(W[hit], 1.0, atol=1e-4)


def test_resample_pristine_uses_kernel_when_enabled(monkeypatch):
    """resample_pristine_soa must produce the same values through the Pallas
    path as through the XLA path."""
    from newmsm_tpu.core.mesh import Mesh
    target = Mesh.from_icosphere(3)
    tables = nst.build_tables(target.coords, target.faces,
                              target.adjacency[2])
    rng = np.random.default_rng(1)
    data = jnp.asarray(rng.normal(size=(2, target.nvertices)), jnp.float32)
    q = _queries(500, seed=7)
    px, py, pz = (jnp.asarray(q[:, i]) for i in range(3))

    ref = nst.resample_pristine_soa(px, py, pz, tables, data)

    calls = []
    real = PL.locate_bary_pallas

    def fake(px, py, pz, res, **kw):
        calls.append(res)
        return real(px, py, pz, res, interpret=True)

    monkeypatch.setattr(PL, "use_pallas", lambda: True)
    monkeypatch.setattr(PL, "locate_bary_pallas", fake)
    out = nst.resample_pristine_soa(px, py, pz, tables, data)
    assert calls == [3]
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)


def test_use_pallas_gate(monkeypatch):
    monkeypatch.setenv("NEWMSM_PALLAS", "0")
    assert PL.use_pallas() is False
    monkeypatch.setenv("NEWMSM_PALLAS", "1")
    assert PL.use_pallas() is True
    monkeypatch.delenv("NEWMSM_PALLAS")
    # CPU test backend -> off by default
    assert PL.use_pallas() is False
