"""Groupwise scale measurement on the virtual CPU device mesh.

Produces the VERDICT-round-3 item-5 evidence: per-iteration setup/optimise
wall-clock and per-device maps-tensor bytes at 1/2/4/8 devices (fixed S),
and ring-vs-gather timing at a shape where the gathered maps tensor would
exceed a small memory budget (forcing the ring path).

IMPORTANT caveat recorded with the results: the host has ~1.2 cores of real
throughput, so virtual-device wall-clock measures partitioning OVERHEAD,
not parallel speedup — per-device memory and collective-bytes are the
transferable quantities; ICI-scale efficiency remains an extrapolation
until multi-chip hardware is available (BASELINE.md north star).

Usage: python scripts/bench_group_scale.py [--s N] [--res R] [--out FILE]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np


def run_once(S, res, n_dev, iters=2, maps_budget=None):
    """One groupwise level through the production driver at n_dev devices.
    Returns per-iteration timings and memory accounting."""
    import tempfile

    from newmsm_tpu.core.mesh import Mesh
    from newmsm_tpu.reg.group import GroupMeshRegistration
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                    "..", "tests"))
    from test_group import group_config, make_group

    meshes, datasets = make_group(S, res=res, degrees=6.0)
    g = GroupMeshRegistration()
    g.max_devices = n_dev
    if maps_budget is not None:
        g.maps_memory_budget = maps_budget
    g.set_inputs(meshes)
    g.set_data_list(datasets)
    g.set_template(Mesh.from_icosphere(res))
    out = tempfile.mkdtemp()
    g.outdir = out + "/"
    g.metrics_path = out + "/metrics.jsonl"
    cfg = group_config(iters=iters)
    cfg.datagrid = [res]
    cfg.sampgrid = [res]
    cfg.cpgrid = [max(1, res - 2)]
    t0 = time.perf_counter()
    g.run_multiresolutions(cfg)
    wall = time.perf_counter() - t0

    rows = [json.loads(l) for l in open(g.metrics_path)]
    iter_rows = [r for r in rows if r.get("event") == "iter"]
    L = len(np.asarray(g.level_statics.labels))
    D = datasets[0].shape[0] if datasets[0].ndim > 1 else 1
    Nt = g.template.nvertices
    maps_bytes_full = S * L * D * Nt * 4
    exchange = getattr(g, "_maps_exchange_used", "gather")
    per_dev = (maps_bytes_full if exchange == "gather"
               else 3 * (S // n_dev) * L * D * Nt * 4)
    return {
        "n_dev": n_dev, "S": S, "res": res, "exchange": exchange,
        "wall_s": round(wall, 2),
        "t_setup_mean": round(float(np.mean([r["setup_s"] for r in iter_rows])), 3)
        if iter_rows else None,
        "t_opt_mean": round(float(np.mean([r["opt_s"] for r in iter_rows])), 3)
        if iter_rows else None,
        "maps_bytes_full": maps_bytes_full,
        "maps_bytes_per_device": per_dev,
        "patch_overflow_total": sum(r.get("patch_overflow", 0)
                                    for r in iter_rows),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--s", type=int, default=16)
    ap.add_argument("--res", type=int, default=4)
    ap.add_argument("--out", default="")
    args = ap.parse_args()

    results = {"device_sweep": [], "ring_vs_gather": []}
    for n_dev in (1, 2, 4, 8):
        if args.s % n_dev:
            continue
        r = run_once(args.s, args.res, n_dev)
        print(json.dumps(r), flush=True)
        results["device_sweep"].append(r)

    # ring vs gather at the same shape: force ring via a tiny maps budget
    for label, budget in (("gather", None), ("ring", 1)):
        r = run_once(args.s, args.res, 8, maps_budget=budget)
        r["forced"] = label
        print(json.dumps(r), flush=True)
        results["ring_vs_gather"].append(r)

    if args.out:
        with open(args.out, "w") as f:
            json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
