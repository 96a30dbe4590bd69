"""Stage split of the fused packed SpMV at scale: cluster stage vs
combine (Ycw gather vs combine kernel).

Usage: python scripts/probe_combine_split.py [n] [cache_dir]
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def slope(make, *args, lo=2, hi=10, reps=3):
    f_lo, f_hi = make(lo), make(hi)
    float(f_lo(*args))
    float(f_hi(*args))
    ts = {}
    for key, f in (("lo", f_lo), ("hi", f_hi)):
        best = []
        for _ in range(reps):
            t0 = time.perf_counter()
            float(f(*args))
            best.append(time.perf_counter() - t0)
        ts[key] = float(min(best))
    return max((ts["hi"] - ts["lo"]) / (hi - lo), 1e-9)


def main():
    import jax
    import jax.numpy as jnp

    from tpufem.ops import packed_kernels as pk
    from tpufem.ops.packed import (ROW, PackedPartialOperator, PackedPlan,
                                   _chunk_offsets)

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 95
    cdir = (sys.argv[2] if len(sys.argv) > 2 else
            os.path.join(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__))), ".bench_cache", f"tet10_n{n}"))
    coords = np.load(os.path.join(cdir, "coords.npy"))
    conn = np.load(os.path.join(cdir, "conn.npy"))
    plan = PackedPlan.load(os.path.join(cdir, "plan"))
    N, (M, k) = coords.shape[0], conn.shape
    m = plan.meta
    geom = (np.load(os.path.join(cdir, "geomJ.npy")),
            np.load(os.path.join(cdir, "geomW.npy")))
    op = PackedPartialOperator.build(
        jnp.asarray(coords, jnp.float32), conn, "c3d10", 200e9, 0.3,
        n_nodes=N, plan=plan, fuse="dense", geometry=geom)
    X0 = jnp.asarray(plan.pack_np(np.random.default_rng(0).standard_normal(
        (N, 3)).astype(np.float32)))
    nnz = M * (3 * k) ** 2
    print(f"M={M} B={m.n_clusters} Nb={m.n_blocks}", flush=True)

    def yc_only(opx, X):
        """Cluster stage only (hop1 gather + fused kernel).

        The chunk scaffolding mirrors PackedPartialOperator.__call__ but
        the per-chunk work is the PRODUCTION _yc_chunk / _combine methods
        — only the loop shell is duplicated here, so probe numbers track
        packed.py (ADVICE r3 drift concern)."""
        fl = opx.flags
        Xp = jnp.concatenate([X, jnp.zeros((1, ROW), X.dtype)], axis=0)
        Yc = jnp.zeros((m.n_clusters, ROW), X.dtype)
        for gi, ((s, nn, wk), cc) in enumerate(zip(m.c_groups,
                                                   fl.cluster_rows)):
            if wk == 0 or nn == 0:
                continue
            offs, roff, rem = _chunk_offsets(nn, cc)
            for off in offs:
                Yc = jax.lax.dynamic_update_slice_in_dim(
                    Yc, opx._yc_chunk(Xp, gi, s, off, cc, wk), s + off, 0)
            if rem:
                Yc = jax.lax.dynamic_update_slice_in_dim(
                    Yc, opx._yc_chunk(Xp, gi, s, roff, rem, wk), s + roff, 0)
        return Yc

    def combine_only(opx, Yc):
        return jnp.sum(opx._combine(Yc))

    def ycw_only(opx, Yc):
        """Ycw row gathers of the combine, summed cheaply (no kernel)."""
        fl = opx.flags
        Ycp = jnp.concatenate([Yc, jnp.zeros((1, ROW), Yc.dtype)], axis=0)
        acc = jnp.zeros((), Yc.dtype)
        for (s, nn, wk), bc in zip(m.b_groups, fl.block_rows):
            if wk == 0 or nn == 0:
                continue
            offs, roff, rem = _chunk_offsets(nn, bc)
            for off in offs:
                wc = jax.lax.dynamic_slice_in_dim(
                    opx.plan.winc, s + off, bc, 0)[:, :wk]
                acc = acc + jnp.sum(Ycp[wc][:, :, ::128])
            if rem:
                wc = jax.lax.dynamic_slice_in_dim(
                    opx.plan.winc, s + roff, rem, 0)[:, :wk]
                acc = acc + jnp.sum(Ycp[wc][:, :, ::128])
        return acc

    Yc0 = jax.jit(yc_only)(op, X0)
    Yc0 = Yc0 * jax.lax.rsqrt(jnp.mean(jnp.square(Yc0)) + 1e-30)

    def mk_loop(fn, renorm=True):
        def mk(iters):
            @jax.jit
            def f(opx, V):
                def body(i, v):
                    y = fn(opx, v)
                    if renorm:
                        return y * jax.lax.rsqrt(
                            jnp.mean(jnp.square(y)) + 1e-30)
                    return v * (1.0 + 1e-12 * y)      # y scalar
                return jnp.sum(jax.lax.fori_loop(0, iters, body, V))
            return lambda V: f(op, V)
        return mk

    t_full = slope(mk_loop(lambda o, v: o(v)), X0)
    print(f"full apply    {t_full * 1e3:8.2f} ms  "
          f"{nnz / t_full / 1e9:6.1f} Gnnz/s", flush=True)
    t_yc = slope(mk_loop(lambda o, v: jax.lax.dynamic_slice_in_dim(
        yc_only(o, v), 0, m.n_blocks, 0)), X0)
    print(f"cluster stage {t_yc * 1e3:8.2f} ms", flush=True)
    t_comb = slope(mk_loop(combine_only, renorm=False), Yc0)
    print(f"combine       {t_comb * 1e3:8.2f} ms", flush=True)
    t_ycw = slope(mk_loop(ycw_only, renorm=False), Yc0)
    print(f"ycw gather    {t_ycw * 1e3:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
