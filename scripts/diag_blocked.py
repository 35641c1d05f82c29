"""On-chip diagnostic for the blocked gather paths: where does the bench
mismatch come from (patch sets vs unary gather), and what does each blocked
stage cost?"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    if "--cpu" in sys.argv:
        import jax
        jax.config.update("jax_platforms", "cpu")
    from newmsm_tpu.core.cache import enable_compile_cache
    enable_compile_cache()
    import jax
    import jax.numpy as jnp
    from bench import build_inputs
    from newmsm_tpu.ops.blocked import (build_patches_blocked,
                                        suggest_block_budget)
    from newmsm_tpu.ops.nearest import build_tables
    from newmsm_tpu.reg import costs as C

    print("device:", jax.devices()[0], flush=True)
    if jax.devices()[0].platform == "tpu":
        from newmsm_tpu.ops.pallas_locate import ensure_validated
        print("pallas validated:", ensure_validated(), flush=True)

    inp = build_inputs()
    tables = build_tables(inp["tables"]["coords"], inp["tables"]["faces"],
                          inp["tables"]["tri"])
    cp = jnp.asarray(inp["cp_coords"])
    src = jnp.asarray(inp["src_coords"])
    labels = jnp.asarray(inp["labels"])
    centre = jnp.asarray(inp["centre"])
    maxsep = jnp.asarray(inp["maxsep"])
    src_data = jnp.asarray(inp["src_data"])
    tgt_data = jnp.asarray(inp["tgt_data"])
    cfw = jnp.ones_like(src_data)
    absw = jnp.ones((inp["K"],), jnp.float32)
    pmax, K, L = inp["pmax"], inp["K"], inp["L"]
    res = 5
    bb = suggest_block_budget(res, float(np.max(inp["maxsep"])) / 100.0)
    limits = 1.0 * maxsep
    print("block budget:", bb, flush=True)

    _, rl = C.rotated_label_positions(cp, labels, centre)

    # --- patch sets: dense vs blocked, on this backend ---
    pi_d, pm_d, ov_d = C.build_patches(cp, src, maxsep, 1.0, pmax)
    pi_b, pm_b, ov_b = build_patches_blocked(cp, src, maxsep, 1.0, pmax,
                                             res, bb)
    pi_d, pm_d, pi_b, pm_b = map(np.asarray, (pi_d, pm_d, pi_b, pm_b))
    print("patch overflow dense/blocked:", int(np.asarray(ov_d).sum()),
          int(np.asarray(ov_b).sum()))
    nd = pm_d.sum(1); nb = pm_b.sum(1)
    diff_count = int((nd != nb).sum())
    mism = 0
    for k in range(K):
        sa = set(pi_d[k][pm_d[k]].tolist())
        sb = set(pi_b[k][pm_b[k]].tolist())
        if sa != sb:
            mism += 1
    print(f"patch sets: {mism}/{K} CPs differ; count-diff rows {diff_count}",
          flush=True)

    # --- unary on IDENTICAL patches: direct vs blocked ---
    pi, pm = jnp.asarray(pi_d), jnp.asarray(pm_d)
    u_direct = C.unary_costs(cp, rl, src, pi, pm, tables, src_data, tgt_data,
                             cfw, absw, simval=2, mode="univariate", lchunk=4)
    u_blk, miss = C.unary_costs(cp, rl, src, pi, pm, tables, src_data,
                                tgt_data, cfw, absw, simval=2,
                                mode="univariate", lchunk=4, fblk=bb,
                                limits=limits, return_miss=True)
    err = float(jnp.max(jnp.abs(u_blk - u_direct)))
    print(f"unary blocked vs direct (same patches): max err {err:.3e}, "
          f"miss {int(jnp.sum(miss))}", flush=True)

    # --- stage timings (differential chained dispatch) ---
    def timed(name, fn, *args, n_long=12, n_short=2, iters=3):
        def chain(n):
            @jax.jit
            def run(*a):
                def body(i, acc):
                    aa = list(a)
                    for j, x in enumerate(aa):
                        if jnp.issubdtype(x.dtype, jnp.floating):
                            aa[j] = x + acc * 1e-37
                            break
                    out = fn(*aa)
                    s = sum(jnp.sum(x).astype(jnp.float32)
                            for x in jax.tree_util.tree_leaves(out))
                    return acc + s
                return jax.lax.fori_loop(0, n, body, jnp.float32(0))
            return run
        short, long_ = chain(n_short), chain(n_long)
        float(short(*args)); float(long_(*args))
        ts = tl = 0.0
        for _ in range(iters):
            t0 = time.perf_counter(); float(short(*args)); ts += time.perf_counter() - t0
            t0 = time.perf_counter(); float(long_(*args)); tl += time.perf_counter() - t0
        per = (tl - ts) / ((n_long - n_short) * iters)
        print(f"{name:46s} {per * 1e3:9.3f} ms", flush=True)
        return per

    timed("build_patches_blocked", lambda c, s: build_patches_blocked(
        c, s, maxsep, 1.0, pmax, res, bb)[:2], cp, src)
    timed("build_patches ball", lambda c, s: C.build_patches(
        c, s, maxsep, 1.0, pmax)[:2], cp, src)
    timed("unary blocked (fixed patches)",
          lambda c, r: C.unary_costs(c, r, src, pi, pm, tables, src_data,
                                     tgt_data, cfw, absw, simval=2,
                                     mode="univariate", lchunk=4, fblk=bb,
                                     limits=limits, return_miss=True),
          cp, rl)
    timed("unary direct (fixed patches)",
          lambda c, r: C.unary_costs(c, r, src, pi, pm, tables, src_data,
                                     tgt_data, cfw, absw, simval=2,
                                     mode="univariate", lchunk=4),
          cp, rl)

    def full_blocked(c, s):
        _, rl2 = C.rotated_label_positions(c, labels, centre)
        a, b, _ = build_patches_blocked(c, s, maxsep, 1.0, pmax, res, bb)
        out, _ = C.unary_costs(c, rl2, s, a, b, tables, src_data, tgt_data,
                               cfw, absw, simval=2, mode="univariate",
                               lchunk=4, fblk=bb, limits=limits,
                               return_miss=True)
        return out
    timed("FULL blocked", full_blocked, cp, src)


if __name__ == "__main__":
    main()
