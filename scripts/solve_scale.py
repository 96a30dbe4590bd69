"""Converged north-star solve: c3d10 box, packed PCG to relative tol.

The acceptance bar (BASELINE.md north star) is a >=10M-element 2nd-order
tet ASSEMBLE+PCG — an actual converged solve, not SpMV throughput.  This
script runs it end to end on one chip and prints a JSON summary: wall
time, iteration count, residual reduction, and a displacement sanity
check (tip deflection of the z-loaded box cantilever, reference flow
solver_example.ipynb cells 4-11 / solver/solver.py:80-130 at scale).

Usage: python scripts/solve_scale.py [n=95] [precond=block] [tol_rel=1e-6]
  n=95  -> 5.14M elements / 6.97M nodes
  n=119 -> 10.11M elements / 13.65M nodes
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
    max_iter = int(os.environ.get("SOLVE_MAX_ITER", "12000"))

    import jax
    import jax.numpy as jnp
    from tpufem.ops.packed import (PackedPlan, PackedPartialOperator,
                                   PackedSystem)
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
                                     n_nodes=N, plan=plan, geometry=geom)
    t_setup = time.time() - t00
    print(f"setup (load plan+geometry, build operator): {t_setup:.1f}s",
          flush=True)

    fixed = meshgen.boundary_nodes(sc, 2, 0.0)
    top = meshgen.boundary_nodes(sc, 2, 1.0)
    sys_ = PackedSystem(op, fixed_nodes=fixed, precondition=precond)
    b = np.zeros((N, 3), np.float32)
    b[top, 2] = -1e3
    bnorm = float(np.linalg.norm(b))
    tol = tol_rel * bnorm

    # warm: compile + lazy plan transfer on a 2-iteration call, then AOT
    # compile of the chunked program (a single multi-thousand-iteration
    # XLA execution crashed the TPU worker; chunks of `every` are exact)
    every = int(os.environ.get("SOLVE_EVERY", "500"))
    t0 = time.time()
    _, info_w = sys_.solve(b, tol=0.0, max_iter=2)
    float(info_w.residual_norm)
    sys_.warm_chunked(b, tol=tol, every=every)
    print(f"warmup (transfer+compile): {time.time() - t0:.1f}s", flush=True)

    t0 = time.time()
    u, info = sys_.solve_chunked(
        b, tol=tol, max_iter=max_iter, every=every,
        progress=lambda it, rn: print(
            f"  iter {it}: ||r|| {rn:.4e} (rel {rn / bnorm:.2e}) "
            f"[{time.time() - t0:.0f}s]", flush=True))
    rnorm = float(info.residual_norm)       # forces completion
    t_solve = time.time() - t0
    iters = int(info.iterations)
    hist = np.asarray(info.history)
    hist = hist[np.isfinite(hist)]
    u_np = np.asarray(u[top, 2])
    out = {
        "mesh": f"box_tet10({n})", "elements": M, "nodes": N,
        "precondition": precond, "tol_rel": tol_rel,
        "b_norm": bnorm, "residual_norm": rnorm,
        "rel_residual": rnorm / bnorm,
        "converged": bool(rnorm <= tol),
        "iterations": iters, "solve_seconds": t_solve,
        "iters_per_s": iters / t_solve if t_solve > 0 else None,
        "setup_seconds": t_setup,
        "tip_uz_mean": float(u_np.mean()),
        "tip_uz_min": float(u_np.min()),
        "residual_first10": [float(x) for x in hist[:10]],
        "residual_last5": [float(x) for x in hist[-5:]],
    }
    print(json.dumps(out), flush=True)
    hp = os.path.join(cdir, f"solve_history_{precond}.npy")
    try:
        np.save(hp, hist)
    except OSError:
        pass


if __name__ == "__main__":
    main()
