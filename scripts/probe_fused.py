"""Measure the fused cluster-stage kernel vs the staged pipeline.

Usage: python scripts/probe_fused.py [N] [modes...]
Builds an N^3 box_tet10 mesh, checks the fused kernel (ops.fused_kernels)
against the staged expand/pa/compress pipeline, and times full SpMV
applies via the guarded two-point loop-length slope (tunnel-safe).
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def slope(make, *args, lo=5, hi=45):
    f_lo, f_hi = make(lo), make(hi)
    float(f_lo(*args))
    float(f_hi(*args))
    ts = {}
    for key, f, n in (("lo", f_lo, lo), ("hi", f_hi, hi)):
        best = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(f(*args))
            best.append(time.perf_counter() - t0)
        ts[key] = float(np.median(best))
    return max((ts["hi"] - ts["lo"]) / (hi - lo), 1e-9)


def fused_apply(op, JinvB, WB, X, mode):
    import jax
    import jax.numpy as jnp

    from tpufem.ops import fused_kernels as fk
    from tpufem.ops import packed_kernels as pk
    from tpufem.ops.packed import ROW, _chunk_offsets, pa_apply_planar

    m = op.plan.meta
    lam, mu = op.lam_mu
    Xp = jnp.concatenate([X, jnp.zeros((1, ROW), X.dtype)], axis=0)
    Yc = jnp.zeros((m.n_clusters, ROW), X.dtype)
    for gi, ((s, n, wk), cc) in enumerate(zip(m.c_groups,
                                              op.flags.cluster_rows)):
        if wk == 0 or n == 0:
            continue

        def chunk(loc, nn, gi=gi, s=s, wk=wk):
            bs = s + loc
            sl = lambda a: jax.lax.dynamic_slice_in_dim(a, bs, nn, 0)
            Xw = Xp[sl(op.plan.win_nodes)[:, :wk]]
            ci = jax.lax.dynamic_slice_in_dim(op.plan.cinc[gi], loc, nn, 0)
            if mode == "planar":
                ue3 = pk.expand_planar(
                    Xw, sl(op.plan.wslot), sl(op.plan.jslot),
                    sl(op.plan.lconn), m.nodes_per_elem, m.elems_per_cluster)
                Jc = jax.lax.dynamic_slice_in_dim(op.Jinv, bs, nn, 2)
                Wc = jax.lax.dynamic_slice_in_dim(op.W, bs, nn, 1)
                fe3 = pa_apply_planar(ue3, Jc, Wc, op.dN.array, lam, mu)
                return pk.compress_planar(fe3, ci, m.cv_widths[gi])
            return fk.fused_yc(
                Xw, sl(op.plan.wslot), sl(op.plan.jslot), sl(op.plan.lconn),
                ci, sl(JinvB), sl(WB), op.dN.array, lam, mu,
                m.cv_widths[gi], k=m.nodes_per_elem,
                E_c=m.elems_per_cluster, mode=mode)

        offs, roff, rem = _chunk_offsets(n, cc)
        for off in offs:
            Yc = jax.lax.dynamic_update_slice_in_dim(
                Yc, chunk(off, cc), s + off, 0)
        if rem:
            Yc = jax.lax.dynamic_update_slice_in_dim(
                Yc, chunk(roff, rem), s + roff, 0)
    return op._combine(Yc)


def main():
    import jax
    import jax.numpy as jnp

    from tpufem.ops.packed import PackedPartialOperator
    from tpufem.utils import meshgen

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 24
    modes = sys.argv[2:] or ["narrow", "dense"]
    coords, conn = meshgen.box_tet10(n, n, n)
    N = coords.shape[0]
    M = conn.shape[0]
    print(f"mesh: {M} c3d10 elements, {N} nodes", flush=True)
    t0 = time.perf_counter()
    op = PackedPartialOperator.build(
        jnp.asarray(coords, jnp.float32), conn, "c3d10", 200e9, 0.3,
        n_nodes=N)
    print(f"build: {time.perf_counter() - t0:.1f} s", flush=True)
    m = op.plan.meta
    print(f"B={m.n_clusters} Nb={m.n_blocks} Wn={m.win_n} Wc={m.win_c} "
          f"c_groups={m.c_groups} b_groups={m.b_groups}", flush=True)

    # cluster-major geometry for the fused kernel
    qJ = op.Jinv.shape[0]
    q = op.W.shape[0]
    JinvB = jnp.transpose(op.Jinv, (2, 0, 1, 3)).reshape(
        m.n_clusters, qJ * 9, m.elems_per_cluster)
    WB = jnp.transpose(op.W, (1, 0, 2))

    X0 = jnp.asarray(op.plan.pack_np(
        np.random.default_rng(0).standard_normal((N, 3)).astype(np.float32)))

    F_ref = np.asarray(jax.jit(lambda X: op(X))(X0))
    scale = np.abs(F_ref).max()
    nnz = M * (3 * m.nodes_per_elem) ** 2

    def make_staged(iters):
        @jax.jit
        def f(X):
            def body(i, v):
                return op(v) * (1.0 / jnp.float32(3 * m.nodes_per_elem))
            return jnp.sum(jax.lax.fori_loop(0, iters, body, X))
        return f

    t = slope(make_staged, X0)
    print(f"staged  {t * 1e3:8.3f} ms   {nnz / t / 1e9:7.1f} Gnnz/s",
          flush=True)

    for mode in modes:
        Ff = np.asarray(jax.jit(
            lambda X, mode=mode: fused_apply(op, JinvB, WB, X, mode))(X0))
        err = np.abs(Ff - F_ref).max() / scale
        print(f"mode={mode}: max rel err vs staged = {err:.2e}", flush=True)

        def make_fused(iters, mode=mode):
            @jax.jit
            def f(X):
                def body(i, v):
                    return fused_apply(op, JinvB, WB, v, mode) * (
                        1.0 / jnp.float32(3 * m.nodes_per_elem))
                return jnp.sum(jax.lax.fori_loop(0, iters, body, X))
            return f

        t = slope(make_fused, X0)
        print(f"fused/{mode:7s} {t * 1e3:8.3f} ms   "
              f"{nnz / t / 1e9:7.1f} Gnnz/s", flush=True)


if __name__ == "__main__":
    main()
