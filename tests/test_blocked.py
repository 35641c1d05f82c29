"""Block-contiguous gather paths (ops/blocked.py) vs the direct paths.

The blocked paths are pure performance reformulations: build_patches_blocked
must return the same in-range patch SETS as build_patches, and the blocked
unary gather must reproduce unary_costs bitwise-close with zero certificate
misses — on pristine and warped sources.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from newmsm_tpu.core.icosphere import icosphere
from newmsm_tpu.ops import blocked as B
from newmsm_tpu.ops.nearest import build_tables
from newmsm_tpu.reg import costs as C
from newmsm_tpu.reg.sampling_grid import build_sampling_grid

RAD = 100.0


def _warp(coords, amp=0.08, seed=3):
    rng = np.random.default_rng(seed)
    ax = rng.normal(size=3)
    ax /= np.linalg.norm(ax)
    u = coords / np.linalg.norm(coords, axis=1, keepdims=True)
    ang = amp * np.sin(3.0 * u @ ax)
    k = np.cross(np.broadcast_to(ax, u.shape), u)
    w = (u * np.cos(ang)[:, None] + k * np.sin(ang)[:, None]
         + np.outer((u @ ax) * (1 - np.cos(ang)), ax))
    return (RAD * w / np.linalg.norm(w, axis=1, keepdims=True)).astype(
        np.float32)


@pytest.fixture(scope="module")
def setup():
    src_res, cp_res = 4, 2
    ico_s = icosphere(src_res)
    ico_c = icosphere(cp_res)
    src = (RAD * ico_s.coords).astype(np.float32)
    cp = (RAD * ico_c.coords).astype(np.float32)
    from newmsm_tpu.core.mesh import Mesh
    cpm = Mesh.from_icosphere(cp_res)
    maxsep = cpm.max_vertex_distances().astype(np.float32)
    return src_res, cp_res, ico_s, src, cp, maxsep


def _patch_sets_equal(idx_a, mask_a, idx_b, mask_b):
    for k in range(idx_a.shape[0]):
        sa = set(np.asarray(idx_a[k])[np.asarray(mask_a[k])].tolist())
        sb = set(np.asarray(idx_b[k])[np.asarray(mask_b[k])].tolist())
        assert sa == sb, f"patch set mismatch at CP {k}"


def test_owner_tables_cover_every_vertex():
    vg, centres, caps = B.owner_tables(4)
    ids = np.asarray(vg)[np.asarray(vg) >= 0]
    assert sorted(ids.tolist()) == list(range(icosphere(4).coords.shape[0]))
    # every owned vertex is inside its block cap
    c = icosphere(4).coords
    c = c / np.linalg.norm(c, axis=1, keepdims=True)
    for b in range(vg.shape[0]):
        own = vg[b][vg[b] >= 0]
        d = np.arccos(np.clip(c[own] @ centres[b], -1, 1))
        assert (d <= caps[b]).all()


@pytest.mark.parametrize("deform", [False, True])
def test_build_patches_blocked_matches_dense(setup, deform):
    src_res, _, _, src, cp, maxsep = setup
    if deform:
        src = _warp(src)
        cp = _warp(cp)
    pmax = 224
    bb = B.suggest_block_budget(src_res, float(maxsep.max()) / RAD)
    idx_d, mask_d, ovf_d = C.build_patches(
        jnp.asarray(cp), jnp.asarray(src), jnp.asarray(maxsep), 1.0, pmax)
    idx_b, mask_b, ovf_b = B.build_patches_blocked(
        jnp.asarray(cp), jnp.asarray(src), jnp.asarray(maxsep), 1.0, pmax,
        src_res, bb)
    assert not bool(np.asarray(ovf_d).any())
    assert not bool(np.asarray(ovf_b).any())
    _patch_sets_equal(idx_b, mask_b, idx_d, mask_d)


def test_build_patches_blocked_overflow_flag(setup):
    src_res, _, _, src, cp, maxsep = setup
    # absurd radius: every block is needed, B=8 must overflow, not truncate
    big = np.full_like(maxsep, 2.5 * RAD)
    _, _, ovf = B.build_patches_blocked(
        jnp.asarray(cp), jnp.asarray(src), jnp.asarray(big), 1.0, 64,
        src_res, 8)
    assert bool(np.asarray(ovf).all())


@pytest.mark.parametrize("deform", [False, True])
@pytest.mark.parametrize("mode", ["univariate", "multivariate"])
def test_unary_blocked_matches_direct(setup, deform, mode):
    src_res, cp_res, ico_s, src, cp, maxsep = setup
    if deform:
        src = _warp(src)   # target stays pristine (the blocked requirement)
    rng = np.random.default_rng(0)
    D = 2 if mode == "multivariate" else 1
    N = src.shape[0]
    K = cp.shape[0]
    src_data = rng.normal(size=(D, N)).astype(np.float32)
    tgt_data = rng.normal(size=(D, N)).astype(np.float32)

    tables = build_tables(RAD * ico_s.coords, ico_s.faces, ico_s.tri_idx)
    assert tables.pristine_res == src_res

    from newmsm_tpu.core.mesh import Mesh
    cpm = Mesh.from_icosphere(cp_res)
    sg = build_sampling_grid(cp_res + 2, 0.5 * cpm.calculate_MaxVD())
    labels = jnp.asarray(np.asarray(sg.barycentres, np.float32))
    centre = jnp.asarray(np.asarray(sg.centre, np.float32))

    _, rl = C.rotated_label_positions(jnp.asarray(cp), labels, centre)
    pmax = 224
    pi, pm, _ = C.build_patches(jnp.asarray(cp), jnp.asarray(src),
                                jnp.asarray(maxsep), 1.0, pmax)
    cfw = jnp.ones((1, N), jnp.float32)
    absw = jnp.ones((K,), jnp.float32)
    limits = jnp.asarray(1.0 * maxsep)

    direct = C.unary_costs(jnp.asarray(cp), rl, jnp.asarray(src), pi, pm,
                           tables, jnp.asarray(src_data),
                           jnp.asarray(tgt_data), cfw, absw, simval=2,
                           mode=mode)
    bb = B.suggest_block_budget(src_res, float(maxsep.max()) / RAD)
    blocked, miss = C.unary_costs(jnp.asarray(cp), rl, jnp.asarray(src), pi,
                                  pm, tables, jnp.asarray(src_data),
                                  jnp.asarray(tgt_data), cfw, absw, simval=2,
                                  mode=mode, fblk=bb, limits=limits,
                                  return_miss=True)
    assert int(np.asarray(miss).sum()) == 0
    np.testing.assert_allclose(np.asarray(blocked), np.asarray(direct),
                               rtol=2e-5, atol=2e-6)


def test_unary_blocked_odd_label_count_pads_safely(setup):
    """L not divisible by lchunk exercises the edge-replicated rot padding
    (zero padding would produce phantom certificate misses)."""
    src_res, cp_res, ico_s, src, cp, maxsep = setup
    rng = np.random.default_rng(1)
    N, K = src.shape[0], cp.shape[0]
    src_data = rng.normal(size=(1, N)).astype(np.float32)
    tgt_data = rng.normal(size=(1, N)).astype(np.float32)
    tables = build_tables(RAD * ico_s.coords, ico_s.faces, ico_s.tri_idx)
    from newmsm_tpu.core.mesh import Mesh
    cpm = Mesh.from_icosphere(cp_res)
    sg = build_sampling_grid(cp_res + 2, 0.5 * cpm.calculate_MaxVD())
    labels = jnp.asarray(np.asarray(sg.barycentres[:7], np.float32))
    centre = jnp.asarray(np.asarray(sg.centre, np.float32))
    _, rl = C.rotated_label_positions(jnp.asarray(cp), labels, centre)
    pi, pm, _ = C.build_patches(jnp.asarray(cp), jnp.asarray(src),
                                jnp.asarray(maxsep), 1.0, 224)
    cfw = jnp.ones((1, N), jnp.float32)
    absw = jnp.ones((K,), jnp.float32)
    bb = B.suggest_block_budget(src_res, float(maxsep.max()) / RAD)
    out, miss = C.unary_costs(jnp.asarray(cp), rl, jnp.asarray(src), pi, pm,
                              tables, jnp.asarray(src_data),
                              jnp.asarray(tgt_data), cfw, absw, simval=2,
                              lchunk=4, fblk=bb,
                              limits=jnp.asarray(1.0 * maxsep),
                              return_miss=True)
    assert int(np.asarray(miss).sum()) == 0
    assert out.shape == (K, 7)
