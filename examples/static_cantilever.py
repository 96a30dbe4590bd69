"""End-to-end static solve: c3d10 cantilever under gravity, stress output.

Mirrors the reference solver_example.ipynb flow (load mesh -> stiffness ->
constrained CG -> nodal von Mises -> visualize/export) on generated data.

    python examples/static_cantilever.py [out.vtk]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

import tpufem


def main(out_path="cantilever_result.vtk"):
    E, nu, rho = 200e9, 0.3, 7800.0
    coords, conn = tpufem.meshgen.box_tet10(6, 6, 18, 0.5, 0.5, 2.0)
    N, M = coords.shape[0], conn.shape[0]
    print(f"mesh: {N} nodes, {M} c3d10 elements")

    np_dtype = np.float32 if jax.default_backend() == "tpu" else np.float64
    dtype = jnp.dtype(np_dtype)
    cj = jnp.asarray(coords, dtype)
    conn_j = jnp.asarray(conn)
    plan = tpufem.ScatterPlan.build(conn, N, 3)
    fixed = tpufem.meshgen.boundary_nodes(coords, 2, 0.0)
    cons = tpufem.Constraints.fixed(N, fixed, 3, dtype=np_dtype)

    # gravity load via lumped mass
    Mlump = tpufem.solid.lumped_mass(cj, conn_j, "c3d10", rho)
    g_elem = jnp.zeros((M, 30), dtype).at[:, 2::3].set(-9.81 * Mlump[:, 2::3])
    b = plan.scatter(g_elem).reshape(N, 3)

    def solve(c, bb):
        K = tpufem.solid.stiffness(c, conn_j, "c3d10", E, nu)
        op = tpufem.MatrixFreeOperator(K=K, plan=plan)
        Minv = tpufem.diagonal_preconditioner([op])
        return tpufem.cg(op, bb, constraints=cons, M_inv=Minv, tol=1e-6,
                         max_iter=4000)

    t0 = time.time()
    u, info = jax.jit(solve)(cj, b)
    u.block_until_ready()
    print(f"solve: {time.time() - t0:.2f}s  status={int(info.status)} "
          f"iters={int(info.iterations)} ||r||={float(info.residual_norm):.3e}")

    tens, vm = tpufem.solid.element_stress(cj, conn_j, u, "c3d10", E, nu)
    nvm = tpufem.solid.node_vm_stress(N, conn_j, vm)
    tip = int(np.argmax(coords[:, 2]))
    print(f"tip deflection uz = {float(u[tip, 2]):.4e} m, "
          f"max nodal vM = {tpufem.human_readable_number(float(jnp.max(nvm)))} Pa")

    tpufem.vtk_io.write_vtk(out_path, coords, {"c3d10": conn},
                            point_data={"displacement": np.asarray(u),
                                        "von_mises": np.asarray(nvm)})
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main(*(sys.argv[1:] or []))
