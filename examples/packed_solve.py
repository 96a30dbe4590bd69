"""The flagship fast path: packed-layout PCG on one chip, then the same
operator sharded over every available device.

The packed operator (ops.packed) is the speed-of-light SpMV of this
framework — dense [rows, 384] tiles, Pallas lane-gather kernels, geometry
factors instead of element stiffness (10M-element 2nd-order meshes fit on
one 16 GB chip).  PackedSystem wraps it with constraints and a scalar- or
3x3 node-block-Jacobi preconditioner; parallel.packed_dist shards the
identical math over a device mesh with block-granular ghost-row exchange.

    python examples/packed_solve.py [n]          # 6 n^3 c3d10 elements
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from tpufem.ops.packed import PackedPartialOperator, PackedSystem
from tpufem.utils import meshgen


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 12
    coords, conn = meshgen.box_tet10(n, n, 2 * n, 1.0, 1.0, 2.0)
    N, (M, k) = coords.shape[0], conn.shape
    print(f"mesh: {M} c3d10 elements, {N} nodes")

    dtype = (jnp.float64 if jax.config.jax_enable_x64 else jnp.float32)
    interpret = jax.default_backend() != "tpu"
    t0 = time.time()
    op = PackedPartialOperator.build(jnp.asarray(coords, dtype), conn,
                                     "c3d10", 200e9, 0.3, n_nodes=N,
                                     interpret=interpret)
    print(f"operator build: {time.time() - t0:.2f} s "
          f"(geometry factors only — no element stiffness)")

    fixed = meshgen.boundary_nodes(coords, 2, 0.0)
    b = np.zeros((N, 3), np.float32)
    b[meshgen.boundary_nodes(coords, 2, 2.0), 2] = -1e3

    for precond in ("jacobi", "block"):
        sys_ = PackedSystem(op, fixed_nodes=fixed, precondition=precond)
        t0 = time.time()
        u, info = sys_.solve(b, tol=1e-6, max_iter=20000)
        print(f"{precond:7s}: status={int(info.status)} "
              f"iters={int(info.iterations)} "
              f"solve={time.time() - t0:.2f} s "
              f"tip uz={float(np.asarray(u)[:, 2].min()):.3e}")

    # same solve, sharded over every device (1 device = degenerate case)
    from tpufem.parallel.packed_dist import build_packed_halo_fem

    fem, part = build_packed_halo_fem(coords, conn, "c3d10", 200e9, 0.3,
                                      fixed_nodes=fixed,
                                      precondition="block")
    bX = jnp.asarray(part.pack_np(
        b.astype(np.asarray(fem.free_mask).dtype)))
    uX, info = fem.pcg(bX, tol=1e-6, max_iter=20000)
    u_d = part.unpack_np(np.asarray(uX))
    print(f"distributed ({fem.mesh.devices.size} devices): "
          f"status={int(info.status)} iters={int(info.iterations)} "
          f"tip uz={u_d[:, 2].min():.3e}")


if __name__ == "__main__":
    main()
