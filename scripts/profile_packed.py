"""Stage-by-stage packed-operator SpMV breakdown on the real chip.

Usage: python scripts/profile_packed.py [N]
Times cumulative prefixes of the apply pipeline via the two-point
loop-length slope (tunnel-safe), so stage cost = difference of adjacent
rows:
  hop1       bucketed window row pre-gather Xw = Xp[win_nodes]
  +expand    + Pallas lane-gather expand to element slots
  +pa        + planar partial-assembly element compute
  +compress  + incidence gather-compress to slot sums (full Yc stage)
  cgather    combine-side row pre-gather Ycp[winc] alone
  combine    full combine (gather + Pallas lane-gather reduce)
  full       whole apply
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def slope(make, *args, lo=5, hi=45):
    import jax

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


def main():
    import jax
    import jax.numpy as jnp

    from tpufem.ops import packed_kernels as pk
    from tpufem.ops.packed import ROW, PackedPartialOperator, pa_apply_planar
    from tpufem.utils import meshgen

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 24
    coords, conn = meshgen.box_tet10(n, n, n)
    N = coords.shape[0]
    op = PackedPartialOperator.build(
        jnp.asarray(coords, jnp.float32), conn, "c3d10", 200e9, 0.3,
        n_nodes=N)
    m = op.plan.meta
    X0 = jnp.asarray(op.plan.pack_np(
        np.random.default_rng(0).standard_normal((N, 3)).astype(np.float32)))

    def yc_prefix(opx, Xp, depth):
        """Yc-stage pipeline truncated at `depth` (1=hop1 .. 4=compress)."""
        from tpufem.ops.packed import _chunk_offsets
        fl = opx.flags
        acc = jnp.float32(0.0)
        for gi, ((s, nn, wk), cc) in enumerate(zip(m.c_groups,
                                                   fl.cluster_rows)):
            if wk == 0 or nn == 0:
                continue
            offs, roff, rem = _chunk_offsets(nn, cc)

            def one(loc, nn2, gi=gi, s=s, wk=wk):
                bs = s + loc
                sl = lambda a: jax.lax.dynamic_slice_in_dim(a, bs, nn2, 0)
                Xw = Xp[sl(opx.plan.win_nodes)[:, :wk]]
                if depth == 1:
                    return jnp.sum(Xw)
                ue = pk.expand(Xw, sl(opx.plan.wslot), sl(opx.plan.jslot),
                               sl(opx.plan.lconn))
                if depth == 2:
                    return jnp.sum(ue)
                ue3 = opx._lanes_to_planar(ue, m.nodes_per_elem,
                                           m.elems_per_cluster)
                Jc = jax.lax.dynamic_slice_in_dim(opx.Jinv, bs, nn2, 2)
                Wc = jax.lax.dynamic_slice_in_dim(opx.W, bs, nn2, 1)
                lam, mu = opx.lam_mu
                fe3 = pa_apply_planar(ue3, Jc, Wc, opx.dN.array, lam, mu)
                if depth == 3:
                    return jnp.sum(fe3)
                Fe = opx._planar_to_lanes(fe3, m.lanes)
                ci = jax.lax.dynamic_slice_in_dim(opx.plan.cinc[gi], loc,
                                                  nn2, 0)
                return jnp.sum(pk.compress_gather(Fe, ci, m.cv_widths[gi]))

            for off in offs:
                acc = acc + one(off, cc)
            if rem:
                acc = acc + one(roff, rem)
        return acc

    def make_depth(depth):
        def mk(iters):
            @jax.jit
            def f(opx, X):
                def body(i, a):
                    Xp = jnp.concatenate(
                        [X * (1.0 + 1e-9 * a), jnp.zeros((1, ROW), X.dtype)])
                    return a + yc_prefix(opx, Xp, depth) * 1e-9
                return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))
            return f
        return mk

    def make_cgather(iters):
        @jax.jit
        def f(opx, X):
            def body(i, a):
                Ycp = jnp.concatenate(
                    [X[: m.n_clusters] * (1.0 + 1e-9 * a),
                     jnp.zeros((1, ROW), X.dtype)])
                from tpufem.ops.packed import _chunk_offsets
                s_ = jnp.float32(0.0)
                for (s, nn, wk), bc in zip(m.b_groups,
                                           opx.flags.block_rows):
                    if wk == 0 or nn == 0:
                        continue

                    def one(bs, nn2, wk=wk):
                        wc = jax.lax.dynamic_slice_in_dim(
                            opx.plan.winc, bs, nn2, 0)[:, :wk]
                        return jnp.sum(Ycp[wc])

                    offs, roff, rem = _chunk_offsets(nn, bc)
                    for off in offs:
                        s_ = s_ + one(s + off, bc)
                    if rem:
                        s_ = s_ + one(s + roff, rem)
                return a + s_ * 1e-9
            return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))
        return f

    def make_combine(iters):
        @jax.jit
        def f(opx, X):
            def body(i, a):
                Yc = X[: m.n_clusters] * (1.0 + 1e-9 * a)
                return a + jnp.sum(opx._combine(Yc)) * 1e-9
            return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))
        return f

    def make_full(iters):
        @jax.jit
        def f(opx, X):
            def body(i, v):
                return opx(v) * (1.0 / jnp.float32(3 * m.nodes_per_elem))
            return jnp.sum(jax.lax.fori_loop(0, iters, body, X))
        return f

    rows = [("hop1", slope(make_depth(1), op, X0)),
            ("+expand", slope(make_depth(2), op, X0)),
            ("+pa", slope(make_depth(3), op, X0)),
            ("+compress", slope(make_depth(4), op, X0)),
            ("cgather", slope(make_cgather, op, X0)),
            ("combine", slope(make_combine, op, X0)),
            ("full", slope(make_full, op, X0))]
    nnz = conn.shape[0] * (3 * m.nodes_per_elem) ** 2
    for name, t in rows:
        print(f"{name:10s} {t * 1e3:8.3f} ms   {nnz / t / 1e9:7.1f} Gnnz/s")


if __name__ == "__main__":
    main()
