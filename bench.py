"""Benchmark: matrix-free SpMV / assembly / CG throughput on the real chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "extras"}.

Primary metric: matrix-free SpMV throughput in element-nnz/s on the
flagship c3d10 workload (nnz = M * d^2 multiply-adds actually performed —
the reference's hottest path, solver/element.py:429-464).  The reference
publishes no numbers (BASELINE.md), so vs_baseline is measured against a
torch-CPU implementation of the reference's own gather/bmm/index_add
pipeline, scaled to the same element count.

Timing notes for the axon-tunneled TPU backend:
* ``block_until_ready`` does NOT synchronize — every timed program returns
  a scalar that is read back to host (forces completion).
* There is a constant multi-ms tunnel round-trip per call; loop kernels are
  timed at two iteration counts and differenced (slope method) so the
  constant cancels.
* Operators/plans are passed as pytree ARGUMENTS, never closed over —
  closure constants are baked into the HLO and overflow the remote-compile
  request size on large meshes.
"""
from __future__ import annotations

import json
import os
import time

import numpy as np


def _timed_scalar(fn, *args, reps: int = 3) -> float:
    """Median wall time of float(fn(*args)) — host readback forces sync."""
    float(fn(*args))  # warm / compile
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(fn(*args))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main():
    import jax
    import jax.numpy as jnp

    import tpufem
    from tpufem.ops.clustered import ClusteredOperator
    from tpufem.ops.operator import MatrixFreeOperator, diagonal_preconditioner
    from tpufem.ops.scatter import ScatterPlan
    from tpufem.solvers.cg import cg
    from tpufem.solvers.constraints import Constraints
    from tpufem.utils import meshgen

    n = int(os.environ.get("BENCH_N", "24"))  # 6*n^3 c3d10 elements
    coords, conn = meshgen.box_tet10(n, n, n)
    N, M, k = coords.shape[0], conn.shape[0], conn.shape[1]
    d = 3 * k
    coords_j = jnp.asarray(coords, jnp.float32)
    conn_j = jnp.asarray(conn)

    # --- assembly throughput (slope over repeat count) ------------------
    def make_assemble(reps):
        @jax.jit
        def f(c, cj):
            def body(i, acc):
                K = tpufem.solid.stiffness(c * (1.0 + 1e-7 * i), cj, "c3d10",
                                           200e9, 0.3)
                return acc + jnp.sum(K[:, 0, 0])
            return jax.lax.fori_loop(0, reps, body, jnp.float32(0.0))
        return f

    t1 = _timed_scalar(make_assemble(1), coords_j, conn_j)
    t4 = _timed_scalar(make_assemble(4), coords_j, conn_j)
    t_asm = max((t4 - t1) / 3, 1e-9)
    elems_per_s = M / t_asm

    K = jax.jit(lambda c, cj: tpufem.solid.stiffness(c, cj, "c3d10", 200e9,
                                                     0.3))(coords_j, conn_j)
    plan = ScatterPlan.build(conn, N, 3)
    # headline operator: cluster-structured (MXU one-hot local gather/scatter)
    op = ClusteredOperator.build(K, conn, N, 3, elems_per_cluster=32)

    # --- SpMV throughput (slope over loop length) -----------------------
    def make_spmv(iters):
        @jax.jit
        def f(opx, u):
            def body(i, v):
                return opx(v) * (1.0 / jnp.float32(d))
            return jnp.sum(jax.lax.fori_loop(0, iters, body, u))
        return f

    u0 = jnp.asarray(np.random.default_rng(0).standard_normal((N, 3)),
                     jnp.float32)
    I1, I2 = 5, 45
    tA = _timed_scalar(make_spmv(I1), op, u0)
    tB = _timed_scalar(make_spmv(I2), op, u0)
    t_spmv = max((tB - tA) / (I2 - I1), 1e-9)
    nnz = M * d * d
    nnz_per_s = nnz / t_spmv

    # --- CG iterations/s (slope over max_iter) --------------------------
    fixed = meshgen.boundary_nodes(coords, 2, 0.0)
    cons = Constraints.fixed(N, fixed, 3, dtype=np.float32)
    dg = op.diagonal()
    Minv = jnp.where(jnp.abs(dg) > 0, 1.0 / jnp.where(dg == 0, 1.0, dg),
                     0.0).reshape(N, 3)

    def make_cg(iters):
        @jax.jit
        def f(opx, consx, minvx, b):
            u, info = cg(opx, b, constraints=consx, M_inv=minvx, tol=0.0,
                         max_iter=iters, record_history=False)
            return jnp.sum(u) + info.residual_norm
        return f

    b = np.zeros((N, 3), np.float32)
    b[meshgen.boundary_nodes(coords, 2, 1.0), 2] = -1e3
    bj = jnp.asarray(b)
    c1 = _timed_scalar(make_cg(10), op, cons, Minv, bj)
    c2 = _timed_scalar(make_cg(60), op, cons, Minv, bj)
    t_cg = max((c2 - c1) / 50, 1e-9)
    cg_iters_per_s = 1.0 / t_cg

    # --- torch-CPU baseline (reference pipeline, small workload) -------
    vs_baseline = None
    try:
        import torch
        torch.set_num_threads(os.cpu_count() or 1)
        Ms = min(M, 20000)
        Kt = torch.from_numpy(np.asarray(K[:Ms], np.float32).copy())
        conn_t = torch.from_numpy(conn[:Ms].astype(np.int64))
        ut = torch.randn(N, 3)
        dofs = (conn_t.unsqueeze(-1) * 3 +
                torch.arange(3).view(1, 1, 3)).view(Ms, -1)

        def torch_spmv():
            u_local = ut.reshape(-1)[dofs]
            F_local = torch.bmm(Kt, u_local.unsqueeze(-1)).squeeze(-1)
            F = torch.zeros(N * 3)
            F.index_add_(0, dofs.reshape(-1), F_local.reshape(-1))
            return F

        torch_spmv()
        t0 = time.perf_counter()
        reps = 5
        for _ in range(reps):
            torch_spmv()
        t_torch = (time.perf_counter() - t0) / reps
        torch_nnz_per_s = Ms * d * d / t_torch
        vs_baseline = nnz_per_s / torch_nnz_per_s
    except Exception:
        vs_baseline = None

    result = {
        "metric": "spmv_element_nnz_per_s",
        "value": nnz_per_s,
        "unit": "nnz/s/chip",
        "vs_baseline": vs_baseline,
        "extras": {
            "elements": M,
            "nodes": N,
            "element_type": "c3d10",
            "operator": "clustered(E_c=32)",
            "assembly_elements_per_s": elems_per_s,
            "cg_iters_per_s": cg_iters_per_s,
            "spmv_seconds": t_spmv,
            "spmv_hbm_gbps_est": (M * d * d * 4) / t_spmv / 1e9,
            "backend": jax.default_backend(),
            "baseline": "torch-cpu reference gather/bmm/index_add pipeline",
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
