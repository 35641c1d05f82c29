"""Measure the reference-class C++/OpenMP unary work unit on this host.

The actual `newmsm` binary cannot run in this image (FSL stack absent), so
`native/_geometry.bench_unary` — a faithful, optimized C++ implementation of
its computeUnaryCost work unit (patch rotate -> BVH nearest-triangle ->
barycentric -> weighted Pearson; DiscreteCostFunction.cpp:353-383, double
precision, OpenMP) — stands in for the reference's hardware class. This
script measures it at bench.py's exact shapes (K=642, L=19, P=96, target
ico-5) for 1..ncpu threads and prints per-thread rates plus the 8-core-class
extrapolation used as bench.py's vs_baseline denominator.

Run on the CPU backend; JAX is only used to build identical inputs.
"""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np


def build_native_inputs():
    import jax.numpy as jnp
    from newmsm_tpu.core.mesh import Mesh
    from newmsm_tpu.reg import costs as C
    from newmsm_tpu.reg.sampling_grid import build_sampling_grid

    target = Mesh.from_icosphere(5)
    cp = Mesh.from_icosphere(3)
    K, N = cp.nvertices, target.nvertices
    sg = build_sampling_grid(5, 0.5 * cp.calculate_MaxVD())
    labels = np.asarray(sg.barycentres, np.float32)
    rng = np.random.default_rng(0)
    src_data = rng.normal(size=(1, N)).astype(np.float32)
    tgt_data = rng.normal(size=(1, N)).astype(np.float32)

    cpj = jnp.asarray(cp.coords, jnp.float32)
    srcj = jnp.asarray(target.coords, jnp.float32)
    msj = jnp.asarray(cp.max_vertex_distances().astype(np.float32))
    _, rl = C.rotated_label_positions(
        cpj, jnp.asarray(labels), jnp.asarray(np.asarray(sg.centre, np.float32)))
    pidx, pmask, _ = C.build_patches(cpj, srcj, msj, 1.0, 96)
    pidx = np.asarray(pidx)
    return dict(
        tgt_coords=np.ascontiguousarray(target.coords, np.float64),
        tgt_faces=np.ascontiguousarray(target.faces, np.int32),
        tgt_data=np.ascontiguousarray(tgt_data[0], np.float64),
        cp=np.ascontiguousarray(cp.coords, np.float64),
        rl=np.ascontiguousarray(np.asarray(rl), np.float64),
        patch_pts=np.ascontiguousarray(target.coords[pidx], np.float64),
        patch_data=np.ascontiguousarray(src_data[0][pidx], np.float64),
        mask=np.ascontiguousarray(np.asarray(pmask), np.uint8),
        K=K, L=rl.shape[1],
    )


def measure(threads: int, reps: int = 3):
    from newmsm_tpu.native import _geometry
    inp = build_native_inputs()
    # warmup (page-in, BVH build happens inside each call)
    _geometry.bench_unary(inp["tgt_coords"], inp["tgt_faces"], inp["tgt_data"],
                          inp["cp"], inp["rl"], inp["patch_pts"],
                          inp["patch_data"], inp["mask"], 1, threads)
    t, _ = _geometry.bench_unary(inp["tgt_coords"], inp["tgt_faces"],
                                 inp["tgt_data"], inp["cp"], inp["rl"],
                                 inp["patch_pts"], inp["patch_data"],
                                 inp["mask"], reps, threads)
    return t, inp["K"] * inp["L"]


def main():
    ncpu = os.cpu_count() or 1
    rows = []
    for threads in sorted({1, 2, ncpu}):
        t, work = measure(threads)
        rows.append({"threads": threads, "sec_per_volume": round(t, 4),
                     "vertex_labels_per_sec": round(work / t, 1)})
        print(f"threads={threads}: {t*1e3:.1f} ms/volume "
              f"({work / t:,.0f} vertex-labels/s)")
    # 8-core-class extrapolation from the best measured point, assuming the
    # same per-core rate (the reference reports near-linear OpenMP scaling:
    # 25% single-thread -> 5% multicore, README.md:7)
    best = max(rows, key=lambda r: r["vertex_labels_per_sec"])
    rate8 = best["vertex_labels_per_sec"] / best["threads"] * 8
    print(f"8-core-class estimate: {rate8:,.0f} vertex-labels/s")
    print(json.dumps({"rows": rows, "est_8core_vls": round(rate8, 1)}))


if __name__ == "__main__":
    main()
