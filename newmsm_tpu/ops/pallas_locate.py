"""Fused Pallas TPU kernel for pristine-icosphere point location.

The XLA path (`ops.nearest._locate_pristine_soa`) expresses the 4-way
subdivision descent as a lax.scan so the (fid, corners) carry materialises
between levels. That materialisation plus the layout moves of the (c,9)
corner carry leave the VPU at ~6% utilisation (docs/PERFORMANCE.md, round-3
profile). Inside a single Pallas kernel every level's values are SSA
registers and no carry ever touches memory: base-face argmax -> `res`
unrolled subdivision steps -> barycentric weights, all on (block, 128) f32
tiles.

Both paths share the robust per-level child selection
(`nearest._child_select_soa`, argmax of min edge-plane containment): the
round-3 strict half-plane test misrouted exactly-on-boundary queries under
FMA-contraction differences, producing faces non-incident to vertex queries
(the failure the round-3 partition-of-unity test caught).

Semantics match the reference octree + barycentric pipeline
(octree.cpp:156-214, triangle.cpp:124-143) exactly as the XLA path does;
ties on face boundaries may resolve to a different incident face than the
XLA path under different rounding, which is value-equivalent for resampling
(the shared vertices carry the weight).

The kernel runs only on TPU backends AND only after passing an on-device
Pallas-vs-XLA probe (`ensure_validated()` — interpret-mode CPU tests do not
cover Mosaic lowering); callers gate on `use_pallas()` and fall back to the
XLA path elsewhere (tests force `interpret=True` on CPU).
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 128


_VALIDATED: dict = {}    # backend name -> bool (on-device Pallas==XLA proof)


def use_pallas() -> bool:
    """True when the fused locate kernel should be used: a TPU default
    backend (the kernel is Mosaic/TPU-only — pltpu.VMEM) that has PASSED the
    on-device Pallas-vs-XLA validation probe (`ensure_validated`), unless
    disabled via NEWMSM_PALLAS=0 (or forced via =1, e.g. for interpret-mode
    tests).

    NOTE: callers read this at trace time inside jitted functions, so the
    env var must be set (and `ensure_validated()` run) before the first
    compilation — changing either later has no effect on cached traces."""
    flag = os.environ.get("NEWMSM_PALLAS", "").strip()
    if flag == "0":
        return False
    if flag == "1":
        return True
    if jax.default_backend() != "tpu":
        return False
    ok = _VALIDATED.get("tpu")
    if ok is None:
        # mid-trace and never validated: cannot launch the probe here.
        # Fall back to the XLA path for this trace; drivers/bench call
        # ensure_validated() up front so this only happens for direct
        # library use. (the trace-state API moved across jax versions:
        # trace_state_clean() pre-0.5, trace_ctx.is_top_level() on 0.9 —
        # treat "cannot tell" as mid-trace.)
        try:
            clean = jax.core.trace_ctx.is_top_level()
        except AttributeError:
            try:
                clean = jax.core.trace_state_clean()
            except Exception:
                clean = False
        if not clean:
            return False
        ok = ensure_validated()
    return bool(ok)


_CERT_SOURCES = ("ops/pallas_locate.py", "ops/nearest.py")
_PROVENANCE: dict = {}   # backend -> "probe" | "cert:<date>"


def validation_provenance() -> str | None:
    """How the current verdict was obtained: "probe" (ran in this process)
    or "cert:<date>" (certificate from an earlier probe of identical code
    on an identical device kind — see core/certs.py)."""
    return _PROVENANCE.get("tpu")


def ensure_validated(force: bool = False) -> bool:
    """Prove the Pallas kernel equivalent to the XLA scan path ON THE
    CURRENT DEFAULT BACKEND and record whether the kernel may be used.

    Interpret-mode CPU tests do not cover Mosaic lowering, so the real
    backend must prove itself: a probe batch of random directions plus
    exact icosphere vertices (the boundary-tie worst case) goes through
    both paths at res=4. Face ids may legitimately differ at exact boundary
    ties, so the gate checks VALUE equivalence — the weight-reconstructed
    positions agree, weights are a partition of unity, and every returned
    face actually carries the query's weight mass.

    The verdict is a pure function of (this code, device kind, jax
    version), so it is cached as a certificate (core/certs.py); a matching
    certificate skips the probe (tens of seconds of tunnel round-trips —
    what made BENCH_r04 uncapturable). ``force=True`` always re-probes.
    """
    backend = jax.default_backend()
    if backend != "tpu":
        return False
    ok = _VALIDATED.get("tpu")
    if ok is not None and not force:
        return ok

    from ..core import certs
    key = certs.probe_key(_CERT_SOURCES)
    if not force:
        cert = certs.lookup("pallas_locate", key)
        if cert is not None:
            _VALIDATED["tpu"] = bool(cert["ok"])
            _PROVENANCE["tpu"] = f"cert:{cert['date']}"
            return bool(cert["ok"])

    import numpy as np
    from ..core.icosphere import icosphere
    from . import nearest as nst

    res = 4
    ico = icosphere(res)
    rng = np.random.default_rng(0)
    q = rng.normal(size=(1024, 3)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    q = np.concatenate([q, ico.coords[:512].astype(np.float32)])
    px, py, pz = (jnp.asarray(q[:, i]) for i in range(3))

    fid_p, w0p, w1p, w2p = locate_bary_pallas(px, py, pz, res)
    fid_x, va, vb, vc = nst._locate_pristine_soa(px, py, pz, res)
    w0x, w1x, w2x = nst._bary_weights_soa((px, py, pz), va, vb, vc)

    fid_p = np.asarray(fid_p)
    Wp = np.stack([np.asarray(w0p), np.asarray(w1p), np.asarray(w2p)], 1)
    Wx = np.stack([np.asarray(w0x), np.asarray(w1x), np.asarray(w2x)], 1)
    pos_p = (ico.coords[ico.faces[fid_p]] * Wp[..., None]).sum(1)
    pos_x = (ico.coords[ico.faces[np.asarray(fid_x)]] * Wx[..., None]).sum(1)

    # 2e-4 on the unit sphere: tight enough to catch MXU-precision-class
    # drift (the round-4 probe caught the XLA path's bf16 corner matmul at
    # 1.2e-3), loose enough for legitimate rsqrt rounding differences
    ok = (np.abs(Wp.sum(1) - 1.0).max() < 1e-4
          and np.abs(pos_p - pos_x).max() < 2e-4
          and np.abs(Wp.min()) >= -1e-4)
    # vertex queries: the face must be incident and carry the mass
    hit = ico.faces[fid_p[1024:]] == np.arange(512)[:, None]
    ok = ok and bool(hit.any(axis=1).all()) and bool(
        (np.abs(Wp[1024:][hit] - 1.0) < 1e-3).all())

    _VALIDATED["tpu"] = bool(ok)
    _PROVENANCE["tpu"] = "probe"
    certs.record("pallas_locate", key, bool(ok))
    if not ok:
        import warnings
        warnings.warn("newmsm_tpu: Pallas locate kernel FAILED on-device "
                      "validation against the XLA path; falling back to the "
                      "XLA locate. Set NEWMSM_PALLAS=1 to force.")
    return bool(ok)


def _base_face_constants():
    """Base icosahedron face corner coords and inward edge normals as plain
    Python floats (compiled into the kernel)."""
    from .nearest import _base_face_tables
    bc, bn = _base_face_tables()         # (20,3,3) corners, (20,3,3) normals
    return bc.tolist(), bn.tolist()


def _locate_kernel(res: int, ux_ref, uy_ref, uz_ref,
                   fid_ref, w0_ref, w1_ref, w2_ref):
    bc, bn = _base_face_constants()

    px, py, pz = ux_ref[:], uy_ref[:], uz_ref[:]
    inv = jax.lax.rsqrt(px * px + py * py + pz * pz)
    ux, uy, uz = px * inv, py * inv, pz * inv

    # base face: running first-max argmax over the 20 faces of
    # min-over-3-edges inward dot (ops.nearest._locate_pristine_soa).
    # Only (best, fid) are carried; the corners are selected afterwards from
    # the single barriered fid so they can never follow a different branch
    # (on-boundary ties are between faces that all contain the point, so a
    # best/fid desync is benign — a corner/fid desync is not).
    best = None
    fid = jnp.zeros(ux.shape, jnp.int32)
    for f in range(20):
        s = None
        for e in range(3):
            nxc, nyc, nzc = bn[f][e]
            d = ux * nxc + uy * nyc + uz * nzc
            s = d if s is None else jnp.minimum(s, d)
        if best is None:
            best = s
        else:
            upd = s > best
            best = jnp.where(upd, s, best)
            fid = jnp.where(upd, f, fid)
    corners = [jnp.full(ux.shape, bc[0][v][i], ux.dtype)
               for v in range(3) for i in range(3)]
    for f in range(1, 20):
        hit = fid == f
        corners = [jnp.where(hit, bc[f][v][i], corners[3 * v + i])
                   for v in range(3) for i in range(3)]

    vax, vay, vaz, vbx, vby, vbz, vcx, vcy, vcz = corners

    def mid(ax, ay, az, bx, by, bz):
        x, y, z = ax + bx, ay + by, az + bz
        s = jax.lax.rsqrt(x * x + y * y + z * z)
        return x * s, y * s, z * s

    def cross(a, b):
        return (a[1] * b[2] - a[2] * b[1],
                a[2] * b[0] - a[0] * b[2],
                a[0] * b[1] - a[1] * b[0])

    from .nearest import _child_select_soa

    for _ in range(res):
        m01 = mid(vax, vay, vaz, vbx, vby, vbz)
        m12 = mid(vbx, vby, vbz, vcx, vcy, vcz)
        m02 = mid(vax, vay, vaz, vcx, vcy, vcz)

        # child k of face f lives at 4f+k (icosphere._retessellate):
        # k=0 centre (m01,m12,m02), k=1 corner v0 (m02,v0,m01),
        # k=2 corner v2 (m12,v2,m02), k=3 corner v1 (m01,v1,m12).
        # Robust argmax-of-containment selection shared with the XLA scan
        # path (nearest._child_select_soa) so both paths agree exactly.
        k = _child_select_soa((ux, uy, uz),
                              (vax, vay, vaz), (vbx, vby, vbz),
                              (vcx, vcy, vcz), m01, m12, m02,
                              barrier=False)
        fid = 4 * fid + k
        is_a, is_b, is_c = k == 1, k == 3, k == 2

        def sel4(a_val, b_val, c_val, ctr):
            return jnp.where(is_a, a_val,
                             jnp.where(is_b, b_val,
                                       jnp.where(is_c, c_val, ctr)))

        na = tuple(sel4(m02[i], m01[i], m12[i], m01[i]) for i in range(3))
        nb = tuple(sel4((vax, vay, vaz)[i], (vbx, vby, vbz)[i],
                        (vcx, vcy, vcz)[i], m12[i]) for i in range(3))
        nc = tuple(sel4(m01[i], m12[i], m02[i], m02[i]) for i in range(3))
        vax, vay, vaz = na
        vbx, vby, vbz = nb
        vcx, vcy, vcz = nc

    # barycentric weights (ops.nearest._bary_weights_soa,
    # triangle.cpp:124-143): scale u onto the triangle plane, sub-areas
    u = (ux, uy, uz)
    va, vb, vc = (vax, vay, vaz), (vbx, vby, vbz), (vcx, vcy, vcz)

    def dot(a, b):
        return a[0] * b[0] + a[1] * b[1] + a[2] * b[2]

    def sub(a, b):
        return (a[0] - b[0], a[1] - b[1], a[2] - b[2])

    n = cross(sub(vc, va), sub(vb, va))
    denom = dot(n, u)
    denom = jnp.where(jnp.abs(denom) > 0, denom, 1.0)
    si = dot(n, va) / denom
    pp = (u[0] * si, u[1] * si, u[2] * si)

    def area(a, b, c):
        cr = cross(sub(b, a), sub(c, a))
        return 0.5 * jnp.sqrt(dot(cr, cr))

    aa = area(pp, vb, vc)
    ab = area(pp, va, vc)
    ac = area(pp, va, vb)
    total = aa + ab + ac
    total = jnp.where(total > 0, total, 1.0)

    fid_ref[:] = fid
    w0_ref[:] = aa / total
    w1_ref[:] = ab / total
    w2_ref[:] = ac / total


@functools.partial(jax.jit,
                   static_argnames=("res", "block_rows", "interpret"))
def locate_bary_pallas(px, py, pz, res: int, block_rows: int = 256,
                       interpret: bool = False):
    """Fused locate + barycentric weights on the pristine level-`res`
    icosphere. px/py/pz: (...) query components, any radius. Returns
    (fid (...) i32, w0, w1, w2) — the face id and the barycentric weight of
    each of its three vertices in face vertex order."""
    shape = px.shape
    dt = px.dtype
    q = px.size
    rows = -(-q // _LANES)
    grid = -(-rows // block_rows)
    pad = grid * block_rows * _LANES - q

    def prep(a):
        # pad with 1.0 (not 0): padded lanes would otherwise compute
        # rsqrt(0)=inf -> NaN through the kernel; harmless while padded rows
        # are sliced off, but a trap for any future cross-lane reduction
        return jnp.pad(a.reshape(-1), (0, pad),
                       constant_values=1.0).reshape(-1, _LANES)

    spec = pl.BlockSpec((block_rows, _LANES), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    out2 = (grid * block_rows, _LANES)
    fid, w0, w1, w2 = pl.pallas_call(
        functools.partial(_locate_kernel, res),
        grid=(grid,),
        in_specs=[spec, spec, spec],
        out_specs=(spec, spec, spec, spec),
        out_shape=(jax.ShapeDtypeStruct(out2, jnp.int32),
                   jax.ShapeDtypeStruct(out2, dt),
                   jax.ShapeDtypeStruct(out2, dt),
                   jax.ShapeDtypeStruct(out2, dt)),
        interpret=interpret,
    )(prep(px), prep(py), prep(pz))

    def post(a):
        return a.reshape(-1)[:q].reshape(shape)

    return post(fid), post(w0), post(w1), post(w2)
