"""Stage-by-stage SpMV breakdown on the real chip (perf work, not a test).

Usage: python scripts/profile_spmv.py [stage ...]
Stages (default all):
  full      clustered SpMV end to end
  gather    Uc = u[l2g]
  expand    one-hot expand einsum
  gemv      batched per-element GEMV against K
  compress  one-hot compress einsum
  combine   cross-cluster classed binned reduce
  bf16      full SpMV with K stored bf16 (f32 accumulate)
  partial   ClusteredPartialOperator (geometry-factor) full SpMV
  rowop     MatrixFreeOperator (row gather + binned reduce) full SpMV
  cgiter    one full PCG iteration
Each prints ms/op via the two-point loop-length slope (tunnel-safe).
"""
from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    import tpufem
    from tpufem.ops.clustered import ClusteredOperator, ClusteredPartialOperator
    from tpufem.ops.operator import MatrixFreeOperator
    from tpufem.ops.scatter import ScatterPlan
    from tpufem.solvers.cg import cg
    from tpufem.solvers.constraints import Constraints
    from tpufem.utils import meshgen
    from tpufem.utils.profiling import timed

    stages = sys.argv[1:] or ["full", "gather", "expand", "gemv", "compress",
                              "combine", "bf16", "partial", "rowop", "cgiter"]
    n = 24
    coords, conn = meshgen.box_tet10(n, n, n)
    N, M, k = coords.shape[0], conn.shape[0], conn.shape[1]
    d = 3 * k
    coords_j = jnp.asarray(coords, jnp.float32)
    conn_j = jnp.asarray(conn)
    K = jax.jit(lambda c, cj: tpufem.solid.stiffness(
        c, cj, "c3d10", 200e9, 0.3))(coords_j, conn_j)
    op = ClusteredOperator.build(K, conn, N, 3, elems_per_cluster=32)
    plan_c = op.plan
    m = plan_c.meta
    B, L, E_c = m.n_clusters, m.l_max, m.elems_per_cluster
    rng = np.random.default_rng(0)
    u0 = jnp.asarray(rng.standard_normal((N, 3)), jnp.float32)
    print(f"mesh: M={M} N={N} B={B} E_c={E_c} L={L} d={d}")

    def slope(make, *args, lo=5, hi=45):
        t1 = timed(make(lo), *args)
        t2 = timed(make(hi), *args)
        return max((t2 - t1) / (hi - lo), 1e-12)

    def report(name, t, nbytes=0.0):
        gnnz = M * d * d / t / 1e9
        bw = f" | {nbytes / t / 1e9:7.1f} GB/s" if nbytes else ""
        print(f"{name:10s}: {t*1e3:7.3f} ms | {gnnz:6.1f} Gnnz/s{bw}")

    def loop(stage_fn):
        """iterate stage_fn keeping a data dependence through the carry."""
        def make(iters):
            @jax.jit
            def f(opx, u):
                def body(i, v):
                    s = stage_fn(opx, v)
                    return v + 1e-30 * s
                return jnp.sum(jax.lax.fori_loop(0, iters, body, u))
            return f
        return make

    if "full" in stages:
        t = slope(loop(lambda o, v: jnp.sum(o(v))), op, u0)
        report("full", t, M * d * d * 4)

    if "gather" in stages:
        t = slope(loop(lambda o, v: jnp.sum(v[o.plan.l2g])), op, u0)
        report("gather", t, B * L * 12)

    if "expand" in stages:
        def st(o, v):
            Uc = v[o.plan.l2g]
            oh = o.plan.onehot(v.dtype)
            return jnp.sum(jnp.einsum("bel,blc->bec", oh, Uc))
        tg = slope(loop(lambda o, v: jnp.sum(v[o.plan.l2g])), op, u0)
        t = slope(loop(st), op, u0)
        report("expand", t - tg)

    if "gemv" in stages:
        ue0 = jnp.asarray(rng.standard_normal((B, E_c, d)), jnp.float32)

        def make(iters):
            @jax.jit
            def f(Kx, ue):
                def body(i, v):
                    Fe = jnp.einsum("beij,bej->bei", Kx, v)
                    return v + 1e-30 * jnp.sum(Fe)
                return jnp.sum(jax.lax.fori_loop(0, iters, body, ue))
            return f
        t = slope(make, op.K, ue0)
        report("gemv", t, M * d * d * 4)

    if "compress" in stages:
        Fe0 = jnp.asarray(rng.standard_normal((B, E_c * k, 3)), jnp.float32)
        lc = plan_c.lconn.reshape(B, -1)

        def make(iters):
            @jax.jit
            def f(lcx, Fe):
                iota = jax.lax.broadcasted_iota(jnp.int32, (1, 1, L), 2)
                def body(i, v):
                    oh = (lcx[:, :, None] == iota).astype(v.dtype)
                    Yc = jnp.einsum("bel,bec->blc", oh, v)
                    return v + 1e-30 * jnp.sum(Yc)
                return jnp.sum(jax.lax.fori_loop(0, iters, body, Fe))
            return f
        t = slope(make, lc, Fe0)
        report("compress", t)

    if "combine" in stages:
        Yc0 = jnp.asarray(rng.standard_normal((B * L, 3)), jnp.float32)

        def make(iters):
            @jax.jit
            def f(px, Yc):
                def body(i, v):
                    out = px.combine(v)
                    return v + 1e-30 * jnp.sum(out)
                return jnp.sum(jax.lax.fori_loop(0, iters, body, Yc))
            return f
        t = slope(make, plan_c, Yc0)
        report("combine", t, (B * L + N) * 12)

    if "bf16" in stages:
        op16 = ClusteredOperator(K=op.K.astype(jnp.bfloat16), plan=plan_c)

        def st(o, v):
            Uc = v[o.plan.l2g]
            oh = o.plan.onehot(jnp.bfloat16)
            ue = jnp.einsum("bel,blc->bec", oh, Uc.astype(jnp.bfloat16),
                            preferred_element_type=jnp.float32)
            Fe = jnp.einsum("beij,bej->bei", o.K,
                            ue.reshape(B, E_c, -1).astype(jnp.bfloat16),
                            preferred_element_type=jnp.float32)
            Yc = jnp.einsum("bel,bec->blc", oh.astype(jnp.float32),
                            Fe.reshape(B, -1, 3))
            return jnp.sum(o.plan.combine(Yc.reshape(B * L, 3)))
        t = slope(loop(st), op16, u0)
        report("bf16", t, M * d * d * 2)

    if "partial" in stages:
        pop = ClusteredPartialOperator.build(
            coords_j, conn, "c3d10", 200e9, 0.3, plan=plan_c)
        print(f"partial: affine Jinv q={pop.Jinv.shape[1]} "
              f"W q={pop.W.shape[1]}")
        t = slope(loop(lambda o, v: jnp.sum(o(v))), pop, u0)
        report("partial", t)

    if "rowop" in stages:
        sp = ScatterPlan.build(conn, N, 3)
        rop = MatrixFreeOperator(K=K, plan=sp)
        t = slope(loop(lambda o, v: jnp.sum(o(v))), rop, u0)
        report("rowop", t, M * d * d * 4)

    if "cgiter" in stages:
        fixed = meshgen.boundary_nodes(coords, 2, 0.0)
        cons = Constraints.fixed(N, fixed, 3, dtype=np.float32)
        dg = op.diagonal()
        Minv = jnp.where(dg != 0, 1.0 / jnp.where(dg == 0, 1.0, dg),
                         0.0).reshape(N, 3)
        b = np.zeros((N, 3), np.float32)
        b[meshgen.boundary_nodes(coords, 2, 1.0), 2] = -1e3
        bj = jnp.asarray(b)

        def make(iters):
            @jax.jit
            def f(opx, consx, minvx, bb):
                u, info = cg(opx, bb, constraints=consx, M_inv=minvx,
                             tol=0.0, max_iter=iters, record_history=False)
                return jnp.sum(u) + info.residual_norm
            return f
        t1 = timed(make(10), op, cons, Minv, bj)
        t2 = timed(make(60), op, cons, Minv, bj)
        t = max((t2 - t1) / 50, 1e-12)
        print(f"{'cgiter':10s}: {t*1e3:7.3f} ms | {1/t:6.1f} iter/s")


if __name__ == "__main__":
    main()
