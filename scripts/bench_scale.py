"""North-star scale bench: SpMV + PCG at multi-million elements, one chip.

Usage: python scripts/bench_scale.py [n] [precond]
n = box divisions (6 n^3 c3d10 elements): 95 -> 5.14M, 119 -> 10.11M.
Wide loop-length separations so tunnel jitter cannot fake the slope
(BENCH_r02 lesson).  Prints one JSON line.
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from tpufem.ops.packed import PackedPartialOperator, PackedSystem
    from tpufem.utils import meshgen

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 95
    precond = sys.argv[2] if len(sys.argv) > 2 else "jacobi"

    t0 = time.time()
    coords, conn = meshgen.box_tet10(n, n, n)
    t_mesh = time.time() - t0
    N, (M, k) = coords.shape[0], conn.shape
    d = 3 * k
    print(f"mesh {M} elems / {N} nodes in {t_mesh:.1f} s", flush=True)

    t0 = time.time()
    op = PackedPartialOperator.build(jnp.asarray(coords, jnp.float32), conn,
                                     "c3d10", 200e9, 0.3, n_nodes=N)
    t_build = time.time() - t0
    print(f"plan+geometry build {t_build:.1f} s", flush=True)

    X0 = jnp.asarray(op.plan.pack_np(
        np.random.default_rng(0).standard_normal((N, 3)).astype(np.float32)))

    def make(iters):
        @jax.jit
        def f(opx, u):
            def body(i, v):
                y = opx(v)
                return y * jax.lax.rsqrt(jnp.mean(jnp.square(y)) + 1e-30)
            return jnp.sum(jax.lax.fori_loop(0, iters, body, u))
        return f

    def timed(fn, args, reps=3):
        float(fn(*args))
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            float(fn(*args))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    lo, hi = 2, 22
    t_lo = timed(make(lo), (op, X0))
    t_hi = timed(make(hi), (op, X0))
    t_spmv = (t_hi - t_lo) / (hi - lo)
    assert t_hi > 1.5 * t_lo, (t_lo, t_hi)
    print(f"spmv {t_spmv * 1e3:.1f} ms  "
          f"{M * d * d / t_spmv / 1e9:.1f} Gnnz/s", flush=True)

    t0 = time.time()
    sys_ = PackedSystem(op, fixed_nodes=meshgen.boundary_nodes(coords, 2, 0),
                        precondition=precond)
    t_pre = time.time() - t0
    b = np.zeros((N, 3), np.float32)
    b[meshgen.boundary_nodes(coords, 2, 1.0), 2] = -1e3

    def pcg_time(iters, reps=3):
        ts = []
        for _ in range(reps + 1):
            t0 = time.perf_counter()
            _, info = sys_.solve(b, tol=0.0, max_iter=iters)
            float(info.residual_norm)
            assert int(info.iterations) == iters
            ts.append(time.perf_counter() - t0)
        return min(ts[1:])       # first call compiles

    # wide span: transient allocator/tunnel stalls have produced
    # back-to-back calls with ~identical wall time at narrow spans
    c_lo, c_hi = pcg_time(3), pcg_time(53)
    t_cg = (c_hi - c_lo) / 50
    assert c_hi > 1.5 * c_lo, (c_lo, c_hi)
    print(f"pcg {t_cg * 1e3:.1f} ms/iter  {1.0 / t_cg:.1f} it/s", flush=True)

    # converged solve for the record (env-gated: BENCH_SOLVE=1 — a full
    # multi-thousand-iteration solve; long runs have tripped tunnel
    # worker restarts, so keep the default run short)
    t_solve = rn = None
    info = None
    if os.environ.get("BENCH_SOLVE"):
        t0 = time.perf_counter()
        u, info = sys_.solve(b, tol=1e-5, max_iter=20000)
        rn = float(info.residual_norm)
        t_solve = time.perf_counter() - t0
    print(json.dumps({
        "metric": "scale_spmv_nnz_per_s", "value": M * d * d / t_spmv,
        "unit": "nnz/s/chip", "vs_baseline": None,
        "extras": {
            "elements": M, "nodes": N, "precondition": precond,
            "spmv_seconds": t_spmv, "cg_iters_per_s": 1.0 / t_cg,
            "mesh_seconds": t_mesh, "plan_build_seconds": t_build,
            "precond_build_seconds": t_pre,
            "solve_iterations": (int(info.iterations)
                                 if info is not None else None),
            "solve_status": int(info.status) if info is not None else None,
            "solve_seconds": t_solve, "residual": rn,
        }}))


if __name__ == "__main__":
    main()
