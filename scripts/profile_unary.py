"""Stage-by-stage profile of the unary cost-volume hot path on the current
default device (TPU under axon; pass --cpu for the host baseline).

Times each sub-stage with the same differential chained-dispatch trick as
bench.py (cancels the ~28 ms tunnel dispatch floor), so the numbers are pure
device time. Used to attack VERDICT round-1 weak #1 (vs_baseline == 1.0).
"""
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
    from newmsm_tpu.ops.nearest import build_tables, resample_pristine_soa
    from newmsm_tpu.reg import costs as C

    print("device:", jax.devices()[0], flush=True)
    if jax.devices()[0].platform == "tpu":
        from newmsm_tpu.ops.pallas_locate import ensure_validated
        print("pallas validated:", ensure_validated(), flush=True)
    inp = build_inputs()
    tables = build_tables(inp["tables"]["coords"], inp["tables"]["faces"],
                          inp["tables"]["tri"])
    cp_coords = jnp.asarray(inp["cp_coords"])
    src_coords = jnp.asarray(inp["src_coords"])
    labels = jnp.asarray(inp["labels"])
    centre = jnp.asarray(inp["centre"])
    maxsep = jnp.asarray(inp["maxsep"])
    src_data = jnp.asarray(inp["src_data"])
    tgt_data = jnp.asarray(inp["tgt_data"])
    cfw = jnp.ones_like(src_data)
    absw = jnp.ones((inp["K"],), jnp.float32)
    pmax = inp["pmax"]
    K, L = inp["K"], inp["L"]

    def timed(name, fn, *args, n_long=12, n_short=2, iters=3):
        """fn(*args) -> pytree; time per call via chained fori_loop diff."""
        def chain(n):
            @jax.jit
            def run(*a):
                def body(i, acc):
                    # thread the carry into the first float input so XLA can
                    # neither hoist nor parallelise iterations (acc*1e-37
                    # underflows to 0 at runtime, bench.py:time_fn)
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
        print(f"{name:42s} {per * 1e3:9.3f} ms", flush=True)
        return per

    ball_np = C.patch_candidate_ball(
        inp["cp_coords"], inp["src_coords"], inp["tables"]["faces"],
        1.0 * np.asarray(inp["maxsep"]))
    ball = None if ball_np is None else jnp.asarray(ball_np)
    print("ball:", None if ball_np is None else ball_np.shape, flush=True)

    # stage 0: full bench fn (as bench.py runs it: ball pre-prune on)
    def full(cp, src):
        rots, rl = C.rotated_label_positions(cp, labels, centre)
        pi, pm, _ = C.build_patches(cp, src, maxsep, 1.0, pmax, ball)
        return C.unary_costs(cp, rl, src, pi, pm, tables, src_data, tgt_data,
                             cfw, absw, simval=2, mode="univariate", lchunk=4)
    timed("full (bench fn)", full, cp_coords, src_coords)

    # stage 1: build_patches alone
    timed("build_patches (ball)", lambda cp, src: C.build_patches(
        cp, src, maxsep, 1.0, pmax, ball)[:2], cp_coords, src_coords)
    timed("build_patches (dense top_k)", lambda cp, src: C.build_patches(
        cp, src, maxsep, 1.0, pmax)[:2], cp_coords, src_coords)

    # stage 2: rotated label positions
    timed("rotated_label_positions", lambda cp: C.rotated_label_positions(
        cp, labels, centre)[1], cp_coords)

    # stage 3: unary_costs with precomputed patches
    rots, rl0 = C.rotated_label_positions(cp_coords, labels, centre)
    pi0, pm0, _ = C.build_patches(cp_coords, src_coords, maxsep, 1.0, pmax)
    pi0, pm0, rl0 = map(jax.block_until_ready, (pi0, pm0, rl0))
    for lc in (1, 4, 19):
        timed(f"unary_costs only (lchunk={lc})",
              lambda cp, rl, pi, pm, _lc=lc: C.unary_costs(
                  cp, rl, src_coords, pi, pm, tables, src_data, tgt_data,
                  cfw, absw, simval=2, mode="univariate", lchunk=_lc),
              cp_coords, rl0, pi0, pm0)

    # stage 4: resample only, full (K,L,P) query set
    pts = src_coords[pi0]                              # (K,P,3)

    def resample_only(cp, rl, pts):
        from newmsm_tpu.core import spherical as sph
        rot = sph.rodrigues(jnp.broadcast_to(cp[:, None, :], rl.shape), rl)
        px = pts[:, None, :, 0]; py = pts[:, None, :, 1]; pz = pts[:, None, :, 2]
        r = rot[..., None]
        qx = r[:, :, 0, 0] * px + r[:, :, 0, 1] * py + r[:, :, 0, 2] * pz
        qy = r[:, :, 1, 0] * px + r[:, :, 1, 1] * py + r[:, :, 1, 2] * pz
        qz = r[:, :, 2, 0] * px + r[:, :, 2, 1] * py + r[:, :, 2, 2] * pz
        return resample_pristine_soa(qx, qy, qz, tables, tgt_data)
    timed("rotate+resample full (K,L,P)", resample_only, cp_coords, rl0,
          jax.block_until_ready(pts))

    # stage 5: locate only (no data gather): reuse resample but with weights
    from newmsm_tpu.ops.nearest import _locate_pristine_soa, _bary_weights_soa

    def locate_only(cp, rl, pts):
        from newmsm_tpu.core import spherical as sph
        rot = sph.rodrigues(jnp.broadcast_to(cp[:, None, :], rl.shape), rl)
        px = pts[:, None, :, 0]; py = pts[:, None, :, 1]; pz = pts[:, None, :, 2]
        r = rot[..., None]
        qx = r[:, :, 0, 0] * px + r[:, :, 0, 1] * py + r[:, :, 0, 2] * pz
        qy = r[:, :, 1, 0] * px + r[:, :, 1, 1] * py + r[:, :, 1, 2] * pz
        qz = r[:, :, 2, 0] * px + r[:, :, 2, 1] * py + r[:, :, 2, 2] * pz
        sh = qx.shape
        qx, qy, qz = qx.reshape(-1), qy.reshape(-1), qz.reshape(-1)
        inv = jax.lax.rsqrt(qx * qx + qy * qy + qz * qz)
        u = (qx * inv, qy * inv, qz * inv)
        fid, va, vb, vc = _locate_pristine_soa(*u, tables.pristine_res)
        w0, w1, w2 = _bary_weights_soa(u, va, vb, vc)
        return fid.astype(jnp.float32) * 1e-9 + w0 + w1 + w2
    timed("rotate+locate+weights (no gather, XLA)", locate_only, cp_coords,
          rl0, jax.block_until_ready(pts))

    # stage 5b: Pallas fused locate+weights on the same query set
    from newmsm_tpu.ops.pallas_locate import locate_bary_pallas, use_pallas
    if use_pallas():
        def locate_pallas(cp, rl, pts):
            from newmsm_tpu.core import spherical as sph
            rot = sph.rodrigues(jnp.broadcast_to(cp[:, None, :], rl.shape), rl)
            px = pts[:, None, :, 0]; py = pts[:, None, :, 1]; pz = pts[:, None, :, 2]
            r = rot[..., None]
            qx = r[:, :, 0, 0] * px + r[:, :, 0, 1] * py + r[:, :, 0, 2] * pz
            qy = r[:, :, 1, 0] * px + r[:, :, 1, 1] * py + r[:, :, 1, 2] * pz
            qz = r[:, :, 2, 0] * px + r[:, :, 2, 1] * py + r[:, :, 2, 2] * pz
            fid, w0, w1, w2 = locate_bary_pallas(
                qx.reshape(-1), qy.reshape(-1), qz.reshape(-1),
                tables.pristine_res)
            return fid.astype(jnp.float32) * 1e-9 + w0 + w1 + w2
        timed("rotate+locate+weights (no gather, Pallas)", locate_pallas,
              cp_coords, rl0, jax.block_until_ready(pts))

    # stage 6: approx_max_k patch variant
    def build_patches_approx(cp, src):
        RAD = 100.0
        chord2 = (jnp.sum(cp**2, axis=1)[:, None] - 2.0 * cp @ src.T
                  + jnp.sum(src**2, axis=1)[None, :])
        chord = jnp.sqrt(jnp.maximum(chord2, 0.0))
        dist = 2.0 * RAD * jnp.arcsin(jnp.clip(chord / (2.0 * RAD), -1, 1))
        limit = (1.0 * maxsep)[:, None]
        _, idx = jax.lax.approx_max_k(-dist, pmax, recall_target=0.95,
                                      aggregate_to_topk=True)
        d_sel = jnp.take_along_axis(dist, idx, axis=1)
        return idx.astype(jnp.int32), d_sel < limit
    timed("build_patches (approx_max_k)", build_patches_approx,
          cp_coords, src_coords)


if __name__ == "__main__":
    main()
