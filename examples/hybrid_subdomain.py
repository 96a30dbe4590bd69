"""Hybrid iterative+direct subdomain solve (the subdivision.ipynb workload,
with the outer interface iteration the reference never finished).

    python examples/hybrid_subdomain.py [n_parts]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import sys
import time

import numpy as np
import jax.numpy as jnp

import tpufem
from tpufem.parallel.partition import compute_subdivisions


def main(n_parts=None):
    coords, conn = tpufem.meshgen.box_tet(8, 8, 8)
    N, M = coords.shape[0], conn.shape[0]
    if n_parts is None:
        # the reference's memory-budget heuristic (subdivision.ipynb cell 7)
        n_parts = max(2, compute_subdivisions(N * 3, memory_gb=0.001))
    print(f"mesh: {N} nodes, {M} c3d4 elements, {n_parts} subdomains")
    fixed = tpufem.meshgen.boundary_nodes(coords, 2, 0.0)
    b = np.zeros((N, 3))
    b[tpufem.meshgen.boundary_nodes(coords, 2, 1.0), 2] = -1e5

    t0 = time.time()
    sys_ = tpufem.build_hybrid(coords, conn, "c3d4", 200e9, 0.3, n_parts,
                               fixed_nodes=fixed)
    print(f"setup (partition + batched Cholesky): {time.time() - t0:.2f}s; "
          f"interface nodes: {sys_.meta.n_interface}")
    t0 = time.time()
    import jax
    u, info = jax.jit(lambda f: sys_.solve(f, tol=1e-10, max_iter=500))(
        jnp.asarray(b, sys_.chol.dtype))
    jax.block_until_ready(u)
    print(f"interface CG: {time.time() - t0:.2f}s status={int(info.status)} "
          f"outer iters={int(info.iterations)}")
    print("max |u| =", float(jnp.max(jnp.abs(u))))


if __name__ == "__main__":
    main(*(int(a) for a in sys.argv[1:]))
