"""Fused vs staged packed SpMV at the north-star scale (cached plan).

Usage: python scripts/probe_scale_fused.py [n] [cache_dir]
Loads the PackedPlan cache written by bench.py / build_plan_cache (default
.bench_cache/tet10_n{n}), builds the operator once (fused layout), derives
the staged-layout twin by transposing the geometry on device, and times
full SpMV applies via the guarded two-point slope (tunnel-safe).
"""
from __future__ import annotations

import dataclasses
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def slope(make, *args, lo=2, hi=8, reps=3):
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

    from tpufem.ops.packed import PackedPartialOperator, PackedPlan

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 95
    cdir = (sys.argv[2] if len(sys.argv) > 2 else
            os.path.join(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__))), ".bench_cache", f"tet10_n{n}"))
    t0 = time.perf_counter()
    coords = np.load(os.path.join(cdir, "coords.npy"))
    conn = np.load(os.path.join(cdir, "conn.npy"))
    plan = PackedPlan.load(os.path.join(cdir, "plan"))
    print(f"cache load: {time.perf_counter() - t0:.1f} s", flush=True)
    N, (M, k) = coords.shape[0], conn.shape
    m = plan.meta
    print(f"mesh: {M} c3d10 elements, {N} nodes; B={m.n_clusters} "
          f"Nb={m.n_blocks} Wn={m.win_n} Wc={m.win_c}", flush=True)
    print(f"c_groups={m.c_groups}", flush=True)
    print(f"b_groups={m.b_groups}", flush=True)

    t0 = time.perf_counter()
    gJ, gW = os.path.join(cdir, "geomJ.npy"), os.path.join(cdir, "geomW.npy")
    geom = ((np.load(gJ), np.load(gW))
            if os.path.exists(gJ) and os.path.exists(gW) else None)
    op_f = PackedPartialOperator.build(
        jnp.asarray(coords, jnp.float32), conn, "c3d10", 200e9, 0.3,
        n_nodes=N, plan=plan, fuse="dense", geometry=geom)
    if geom is None:
        np.save(gJ, np.asarray(op_f.Jinv))
        np.save(gW, np.asarray(op_f.W))
    print(f"operator build (geometry{' cache' if geom else ''}): "
          f"{time.perf_counter() - t0:.1f} s", flush=True)
    B, E_c = plan.meta.n_clusters, plan.meta.elems_per_cluster
    qJ = op_f.Jinv.shape[1] // 9
    Jp, Wp = jax.jit(lambda J, W: (
        jnp.transpose(J.reshape(B, qJ, 9, E_c), (1, 2, 0, 3)),
        jnp.transpose(W, (1, 0, 2))))(op_f.Jinv, op_f.W)
    op_s = dataclasses.replace(
        op_f, Jinv=Jp, W=Wp,
        flags=dataclasses.replace(op_f.flags, fuse=""))

    X0 = jnp.asarray(plan.pack_np(np.random.default_rng(0).standard_normal(
        (N, 3)).astype(np.float32)))
    nnz = M * (3 * k) ** 2

    apply = jax.jit(lambda opx, X: opx(X))
    F_s = np.asarray(apply(op_s, X0))
    F_f = np.asarray(apply(op_f, X0))
    err = np.abs(F_f - F_s).max() / np.abs(F_s).max()
    print(f"fused vs staged max rel err: {err:.2e}", flush=True)

    def make(op):
        def mk(iters):
            @jax.jit
            def f(opx, X):
                def body(i, v):
                    y = opx(v)
                    return y * jax.lax.rsqrt(jnp.mean(jnp.square(y)) + 1e-30)
                return jnp.sum(jax.lax.fori_loop(0, iters, body, X))
            return lambda X: f(op, X)
        return mk

    for name, op in (("staged", op_s), ("fused/dense", op_f)):
        t = slope(make(op), X0)
        print(f"{name:12s} {t * 1e3:8.2f} ms   {nnz / t / 1e9:7.1f} Gnnz/s",
              flush=True)


if __name__ == "__main__":
    main()
