"""Multi-chip distributed PCG over all available devices.

On a CPU host, force an 8-device virtual mesh first:
    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python examples/distributed_solve.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time

import numpy as np
import jax
import jax.numpy as jnp

import tpufem


def main():
    print("devices:", jax.devices())
    coords, conn = tpufem.meshgen.box_tet(8, 8, 16, 1.0, 1.0, 2.0)
    N = coords.shape[0]
    fixed = tpufem.meshgen.boundary_nodes(coords, 2, 0.0)
    fem, part = tpufem.build_distributed_fem(coords, conn, "c3d4", 200e9, 0.3,
                                             fixed_nodes=fixed)
    print(f"partitioned over {fem.mesh.devices.size} device(s); "
          f"{part.meta.elems_per_part} elems/part, "
          f"{part.meta.block_rows} owned rows/part")
    b = np.zeros((N, 3))
    b[tpufem.meshgen.boundary_nodes(coords, 2, 2.0), 0] = 1e6
    t0 = time.time()
    u_new, info = fem.pcg(part.to_new(jnp.asarray(b, fem.K.dtype)),
                          tol=1e-6, max_iter=3000)
    jax.block_until_ready(u_new)
    u = np.asarray(part.to_old(u_new))
    print(f"pcg: {time.time() - t0:.2f}s status={int(info.status)} "
          f"iters={int(info.iterations)}")
    print("max |u| =", np.abs(u).max())


if __name__ == "__main__":
    main()
