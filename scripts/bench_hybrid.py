"""Config-4 hybrid (Schur substructuring) benchmark — subdivision.ipynb
cells 9-15 at real scale.

Usage: python scripts/bench_hybrid.py [n] [n_parts]
Default n=26 -> 105k c3d4 elements, 32 parts.  Reports build wall time
(partition / per-part sparse assembly / Cholesky), interface size, solve
time + interface-CG iterations, and the residual vs a matrix-free PCG
reference solution.
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from tpufem.elements import solid
    from tpufem.ops.operator import MatrixFreeOperator, diagonal_preconditioner
    from tpufem.ops.scatter import ScatterPlan
    from tpufem.parallel.partition import partition_elements
    from tpufem.solvers.cg import cg
    from tpufem.solvers.constraints import Constraints
    from tpufem.solvers.hybrid import build_hybrid
    from tpufem.utils import meshgen

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 26
    n_parts = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    coords, conn = meshgen.box_tet(n, n, n)
    N, M = coords.shape[0], conn.shape[0]
    fixed = meshgen.boundary_nodes(coords, 2, 0.0)
    print(f"mesh: M={M} c3d4, N={N}, parts={n_parts}", flush=True)

    t0 = time.time()
    how = os.environ.get("HYBRID_PART", "rcb")
    if how == "rcb":
        from tpufem.parallel.partition import rcb_partition
        labels = rcb_partition(coords, conn, n_parts)
    elif how == "morton":
        from tpufem.parallel.partition import morton_partition
        labels = morton_partition(coords, conn, n_parts)
    else:
        labels, _ = partition_elements(conn, "c3d4", n_parts, 0,
                                       balanced=True)
    t_part = time.time() - t0
    sizes = np.bincount(labels, minlength=n_parts)
    print(f"partition: {t_part:.1f}s  part sizes min/max={sizes.min()}/"
          f"{sizes.max()}", flush=True)

    t0 = time.time()
    precond = os.environ.get("HYBRID_PRECOND", "bdd")
    sys_ = build_hybrid(coords, conn, "c3d4", 200e9, 0.3, n_parts,
                        fixed_nodes=fixed, labels=labels, dtype=jnp.float32,
                        precondition=precond,
                        slim=bool(int(os.environ.get("HYBRID_SLIM", "1"))),
                        interior_inverse=bool(int(
                            os.environ.get("HYBRID_INV", "1"))),
                        matrix_free_gg=bool(int(
                            os.environ.get("HYBRID_MF", "1"))))
    t_build = time.time() - t0
    m = sys_.meta
    print(f"build (assembly+cholesky): {t_build:.1f}s  interface nodes="
          f"{m.n_interface}  nI_max={m.nI_max} nG_max={m.nG_max}",
          flush=True)

    b = np.zeros((N, 3), np.float32)
    b[meshgen.boundary_nodes(coords, 2, 1.0), 0] = 1e3
    bj = jnp.asarray(b).at[jnp.asarray(fixed)].set(0.0)
    tol = float(os.environ.get("HYBRID_TOL", "1e-4"))
    max_iter = int(os.environ.get("HYBRID_MAXIT", "800"))
    # probe one Schur matvec to size the chunk length (keep every chunk
    # execution well under the TPU worker watchdog)
    mv = jax.jit(lambda sy, v: jnp.sum(sy.schur_matvec(v)))
    v0 = jnp.zeros((int(sys_.g_nodes.shape[0]), 3), jnp.float32
                   ).at[0, 0].set(1.0)
    t0 = time.time()
    float(mv(sys_, v0))
    t_mv_c = time.time() - t0
    t0 = time.time()
    float(mv(sys_, v0))
    t_mv = time.time() - t0
    print(f"schur_matvec: compile+1st {t_mv_c:.2f}s, warm {t_mv * 1e3:.1f}ms",
          flush=True)
    every = int(os.environ.get(
        "HYBRID_EVERY", str(max(8, min(400, int(20.0 / max(t_mv, 1e-4)))))))
    print(f"chunk length: {every}", flush=True)
    t0 = time.time()
    # chunked: no single XLA execution beyond `every` interface-CG
    # iterations (a 2500-iteration one-shot at 1M/512 crashed the worker)
    u, info = sys_.solve_chunked(bj, tol=tol, max_iter=max_iter,
                                 every=every,
                                 progress=lambda d, rn_: print(
                                     f"  iface-CG {d}: ||r||={rn_:.3e}",
                                     flush=True))
    rn = float(info.residual_norm)
    t_solve1 = time.time() - t0
    t0 = time.time()
    u, info = sys_.solve_chunked(bj, tol=tol, max_iter=max_iter,
                                 every=every)
    float(info.residual_norm)
    t_solve = time.time() - t0
    print(f"solve: compile+run {t_solve1:.1f}s, warm {t_solve:.2f}s, "
          f"interface-CG iters={int(info.iterations)} status="
          f"{int(info.status)} ||r_S||={rn:.3e}", flush=True)

    ref = os.environ.get("HYBRID_REF", "1")
    if ref == "0":
        return
    if ref == "packed":
        # at 1M elements the ScatterPlan reference would need a multi-
        # minute single execution (worker-watchdog risk); the flagship
        # packed operator + chunked PCG is the safe monolithic reference
        from tpufem.ops.packed import PackedPartialOperator, PackedSystem
        pop = PackedPartialOperator.build(coords, conn, "c3d4", 200e9, 0.3,
                                          n_nodes=N)
        psys = PackedSystem(pop, fixed_nodes=fixed)
        nb = float(np.linalg.norm(np.asarray(b, np.float64)))
        tol_rel = float(os.environ.get("HYBRID_REF_TOLREL", "1e-5"))
        u_ref, info_ref = psys.solve_chunked(
            jnp.asarray(b), tol=tol_rel * nb,
            max_iter=int(os.environ.get("HYBRID_REF_MAXIT", "20000")),
            every=500)
        ur = np.asarray(u_ref)
        err = np.abs(np.asarray(u) - ur).max() / np.abs(ur).max()
        print(f"vs packed PCG ({int(info_ref.iterations)} iters, status "
              f"{int(info_ref.status)}): rel displacement diff {err:.2e}",
              flush=True)
        return

    # reference: matrix-free PCG
    K = solid.stiffness(jnp.asarray(coords, jnp.float32), jnp.asarray(conn),
                        "c3d4", 200e9, 0.3)
    op = MatrixFreeOperator(K=K, plan=ScatterPlan.build(conn, N, 3))
    cons = Constraints.fixed(N, fixed, 3, dtype=np.float32)
    Minv = diagonal_preconditioner([op]).reshape(N, 3)
    u_ref, info_ref = jax.jit(lambda f: cg(
        op, f, constraints=cons, M_inv=Minv, tol=1e-3, max_iter=8000,
        dot_dtype=jnp.float32))(jnp.asarray(b))
    ur = np.asarray(u_ref)
    err = np.abs(np.asarray(u) - ur).max() / np.abs(ur).max()
    print(f"vs matrix-free PCG ({int(info_ref.iterations)} iters): "
          f"rel displacement diff {err:.2e}", flush=True)


if __name__ == "__main__":
    main()
