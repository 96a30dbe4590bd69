"""Probe: where the Yc-stage (hop1+expand+pa+compress) time actually goes.

probe_pa.py showed the planar pa compute standalone runs at ~2 Tmadd/s
(0.03-0.04 ms at 83k) while the in-pipeline "+pa" increment measured
0.26 ms — the cost must live at the Pallas boundaries (ue / Fe
materialization + transposes) or the old stage split was noise.  This
probe times the EXACT production Yc stage and surgical variants with
wide loop spans (signal >> tunnel jitter):

  full      production __call__ (all stages)
  yc        production Yc stage only (hop1+expand+pa+compress)
  yc-nopa   same but Fe := ue (skips planar pa + both transposes)
  yc-noexp  same but ue := broadcast of Xw row 0 (skips expand kernel)
  comb      production combine only

Usage: python scripts/probe_pipeline.py [N]
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def slope(make, *args, lo=10, hi=210):
    f_lo, f_hi = make(lo), make(hi)
    float(f_lo(*args))
    float(f_hi(*args))
    ts = {}
    for key, f in (("lo", f_lo), ("hi", f_hi)):
        best = []
        for _ in range(5):
            t0 = time.perf_counter()
            float(f(*args))
            best.append(time.perf_counter() - t0)
        ts[key] = float(min(best))
    if ts["hi"] < 1.5 * ts["lo"]:
        print("  (weak)", ts)
    return max((ts["hi"] - ts["lo"]) / (hi - lo), 1e-9)


def main():
    import jax
    import jax.numpy as jnp

    from tpufem.ops import packed_kernels as pk
    from tpufem.ops.packed import (ROW, PackedPartialOperator, _chunk_offsets,
                                   pa_apply_planar)
    from tpufem.utils import meshgen

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 24
    coords, conn = meshgen.box_tet10(n, n, n)
    N = coords.shape[0]
    M = conn.shape[0]
    op = PackedPartialOperator.build(
        jnp.asarray(coords, jnp.float32), conn, "c3d10", 200e9, 0.3,
        n_nodes=N)
    m = op.plan.meta
    nnz = M * (3 * m.nodes_per_elem) ** 2
    X0 = jnp.asarray(op.plan.pack_np(
        np.random.default_rng(0).standard_normal((N, 3)).astype(np.float32)))
    print(f"c_groups={m.c_groups} cv_widths sums="
          f"{[sum(w) for w in m.cv_widths]} b_groups={m.b_groups} "
          f"crows={op.flags.cluster_rows} brows={op.flags.block_rows}",
          flush=True)

    def yc_stage(opx, Xp, mode):
        """Production Yc loop with surgical stage replacements.

        PINNED to ops/packed.py PackedPartialOperator.__call__/_yc_chunk
        as of round 4 — this mirrors the production stage structure by
        hand so modes can replace individual stages; if packed.py's
        pipeline changes, update this or the probe numbers are
        misleading (ADVICE r3)."""
        fl = opx.flags
        lam, mu = opx.lam_mu
        Yc = jnp.zeros((m.n_clusters, ROW), Xp.dtype)
        for gi, ((s, nn, wk), cc) in enumerate(zip(m.c_groups,
                                                   fl.cluster_rows)):
            if wk == 0 or nn == 0:
                continue
            offs, roff, rem = _chunk_offsets(nn, cc)

            def one(loc, nn2, gi=gi, s=s, wk=wk):
                bs = s + loc
                sl = lambda a: jax.lax.dynamic_slice_in_dim(a, bs, nn2, 0)
                Xw = Xp[sl(opx.plan.win_nodes)[:, :wk]]
                if mode == "noexp":
                    ue = jnp.broadcast_to(
                        Xw[:, :1, :].reshape(nn2, 1, ROW)[:, :, :1],
                        (nn2, 3, m.lanes)) * 1.0
                else:
                    ue = pk.expand(Xw, sl(opx.plan.wslot), sl(opx.plan.jslot),
                                   sl(opx.plan.lconn))
                if mode == "nopa":
                    Fe = ue
                else:
                    ue3 = opx._lanes_to_planar(ue, m.nodes_per_elem,
                                               m.elems_per_cluster)
                    Jc = jax.lax.dynamic_slice_in_dim(opx.Jinv, bs, nn2, 2)
                    Wc = jax.lax.dynamic_slice_in_dim(opx.W, bs, nn2, 1)
                    fe3 = pa_apply_planar(ue3, Jc, Wc, opx.dN.array, lam, mu)
                    Fe = opx._planar_to_lanes(fe3, m.lanes)
                ci = jax.lax.dynamic_slice_in_dim(opx.plan.cinc[gi], loc,
                                                  nn2, 0)
                return pk.compress_gather(Fe, ci, m.cv_widths[gi])

            for off in offs:
                Yc = jax.lax.dynamic_update_slice_in_dim(
                    Yc, one(off, cc), s + off, 0)
            if rem:
                Yc = jax.lax.dynamic_update_slice_in_dim(
                    Yc, one(roff, rem), s + roff, 0)
        return Yc

    def make_mode(mode):
        def mk(iters):
            @jax.jit
            def f(opx, X):
                def body(i, v):
                    Xp = jnp.concatenate([v, jnp.zeros((1, ROW), v.dtype)])
                    y = yc_stage(opx, Xp, mode)[: X.shape[0]]
                    return y * jax.lax.rsqrt(jnp.mean(jnp.square(y)) + 1e-30)
                return jnp.sum(jax.lax.fori_loop(0, iters, body, X))
            return f
        return mk

    def make_full(iters):
        @jax.jit
        def f(opx, X):
            def body(i, v):
                y = opx(v)
                return y * jax.lax.rsqrt(jnp.mean(jnp.square(y)) + 1e-30)
            return jnp.sum(jax.lax.fori_loop(0, iters, body, X))
        return f

    def make_comb(iters):
        B = m.n_clusters
        reps_b = -(-B // m.n_blocks)

        @jax.jit
        def f(opx, X):
            Yc0 = jnp.tile(X, (reps_b, 1))[:B]

            def body(i, v):
                y = opx._combine(v)                      # [Nb, ROW]
                y = y * jax.lax.rsqrt(jnp.mean(jnp.square(y)) + 1e-30)
                return jnp.tile(y, (reps_b, 1))[:B]
            return jnp.sum(jax.lax.fori_loop(0, iters, body, Yc0))
        return f

    rows = [("full", slope(make_full, op, X0)),
            ("yc", slope(make_mode("yc"), op, X0)),
            ("yc-nopa", slope(make_mode("nopa"), op, X0)),
            ("yc-noexp", slope(make_mode("noexp"), op, X0)),
            ("comb", slope(make_comb, op, X0))]
    for name, t in rows:
        print(f"{name:10s} {t * 1e3:8.3f} ms   {nnz / t / 1e9:7.1f} Gnnz/s",
              flush=True)


if __name__ == "__main__":
    main()
