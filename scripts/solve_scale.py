"""Converged north-star solve: c3d10 box, f64-verified residual.

The acceptance bar (BASELINE.md north star) is a >=10M-element 2nd-order
tet ASSEMBLE+PCG — an actual converged solve.  Plain f32 PCG cannot
converge to 1e-6 at this scale (measured: breakdown at the ~2e-3
kappa*eps_f32 envelope, PERFORMANCE.md round 5), so this runs the
mixed-precision refinement (solvers/refine.py): f32 packed PCG inner
solves + f64 true-residual outer loop.  Prints a JSON summary: wall
time, inner iterations, refinement cycles, f64 true relative residual,
tip-deflection sanity.  Reference flow at scale:
solver_example.ipynb cells 4-11 / solver/solver.py:80-130.

Usage: python scripts/solve_scale.py [n=95] [precond=block] [tol_rel=1e-6]
  n=95  -> 5.14M elements / 6.97M nodes; n=119 -> 10.11M / 13.65M.
Plan/geometry come from .bench_cache/tet10_n{n} (built if absent).
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 95
    precond = sys.argv[2] if len(sys.argv) > 2 else "block"
    tol_rel = float(sys.argv[3]) if len(sys.argv) > 3 else 1e-6
    inner_tol = float(os.environ.get("SOLVE_INNER_TOL", "5e-3"))
    # 500-iteration chunks are stable at 5.14M but a ~90 s single
    # execution at 10.11M crashed the TPU worker twice; 250 is stable
    every = int(os.environ.get("SOLVE_EVERY", "250" if n >= 100 else "500"))
    inner_max = int(os.environ.get("SOLVE_INNER_MAX",
                                   "2000" if n >= 100 else "1500"))

    import jax
    jax.config.update("jax_enable_x64", True)   # f64 outer loop
    import jax.numpy as jnp
    from tpufem.ops.packed import (PackedPlan, PackedPartialOperator,
                                   PackedSystem)
    from tpufem.solvers.refine import RefinedSystem
    from tpufem.utils import meshgen

    t00 = time.time()
    root = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".bench_cache")
    cdir = os.path.join(root, f"tet10_n{n}")
    plan = geom = None
    if os.path.isdir(os.path.join(cdir, "plan")):
        sc = np.load(os.path.join(cdir, "coords.npy"))
        scn = np.load(os.path.join(cdir, "conn.npy"))
        plan = PackedPlan.load(os.path.join(cdir, "plan"))
        gJ, gW = os.path.join(cdir, "geomJ.npy"), os.path.join(cdir, "geomW.npy")
        if os.path.exists(gJ) and os.path.exists(gW):
            geom = (np.load(gJ), np.load(gW))
    else:
        sc, scn = meshgen.box_tet10(n, n, n)
        plan = PackedPlan.build(sc, scn, sc.shape[0])
    N = sc.shape[0]
    M, k = scn.shape
    op = PackedPartialOperator.build(sc, scn, "c3d10", 200e9, 0.3,
                                     n_nodes=N, plan=plan, geometry=geom,
                                     dtype=jnp.float32)
    fixed = meshgen.boundary_nodes(sc, 2, 0.0)
    top = meshgen.boundary_nodes(sc, 2, 1.0)
    sys_ = PackedSystem(op, fixed_nodes=fixed, precondition=precond)
    ref = RefinedSystem(sys_, sc, scn, "c3d10", 200e9, 0.3,
                        cache_path=os.path.join(cdir, "refine_geom.npz")
                        if os.path.isdir(cdir) else None)
    t_setup = time.time() - t00
    print(f"setup (cache load + operators): {t_setup:.1f}s", flush=True)

    b = np.zeros((N, 3), np.float32)
    b[top, 2] = -1e3
    bnorm = float(np.linalg.norm(b))

    # warm: AOT-compile the chunked solver (no execution, no extra
    # buffers — a 2-iteration plain solve OOM'd at 10.11M on top of the
    # refinement residency), then one SpMV apply to complete the lazy
    # plan/geometry transfers
    t0 = time.time()
    sys_.warm_chunked(b, tol=inner_tol, every=every)
    X0 = jnp.asarray(op.plan.pack_np(np.zeros((N, 3), np.float32)))
    float(jax.jit(lambda o, x: jnp.sum(o(x)))(op, X0))
    print(f"warmup (transfer+compile): {time.time() - t0:.1f}s", flush=True)

    t0 = time.time()
    u, info = ref.solve(
        b, tol_rel=tol_rel, inner_tol=inner_tol,
        inner_max_iter=inner_max, every=every,
        progress=lambda cy, it, rr: print(
            f"  cycle {cy} (inner iters {it}): TRUE rel residual {rr:.3e} "
            f"[{time.time() - t0:.0f}s]", flush=True))
    t_solve = time.time() - t0
    u_np = np.asarray(u[jnp.asarray(top) * 3 + 2])
    out = {
        "mesh": f"box_tet10({n})", "elements": M, "nodes": N,
        "precondition": precond, "tol_rel": tol_rel,
        "b_norm": bnorm,
        "true_residual_norm": info.residual_norm,
        "rel_residual": info.rel_residual,
        "converged": info.converged,
        "cycles": info.cycles,
        "iterations": info.inner_iterations,
        "solve_seconds": t_solve,
        "iters_per_s": (info.inner_iterations / t_solve
                        if t_solve > 0 else None),
        "setup_seconds": t_setup,
        "tip_uz_mean": float(u_np.mean()),
        "tip_uz_min": float(u_np.min()),
        "outer_history_rel": [float(x) / bnorm for x in info.outer_history],
    }
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
