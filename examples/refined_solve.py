"""Mixed-precision refined solve: f64-verified residuals at f32 speed.

The round-5 north-star workflow (PERFORMANCE.md): plain f32 PCG cannot
converge past the ~kappa*eps_f32 envelope at multi-million-element
scale (measured breakdown at 5.14M), so production solves run f32
packed PCG corrections inside an f64 true-residual outer loop.  This
example runs it end to end on a small mesh; scripts/solve_scale.py is
the same flow at 5.14M / 10.11M elements (where it measures 5.2e-7 /
3.1e-7 true relative residuals on one v5e chip).

Run: python examples/refined_solve.py
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_enable_x64", True)   # the f64 outer loop needs x64

import jax.numpy as jnp  # noqa: E402

from tpufem.ops.packed import PackedPartialOperator, PackedSystem  # noqa: E402
from tpufem.solvers.refine import RefinedSystem  # noqa: E402
from tpufem.utils import meshgen  # noqa: E402


def main():
    coords, conn = meshgen.box_tet10(6, 6, 12, 1.0, 1.0, 2.0)
    N = coords.shape[0]
    interpret = jax.default_backend() != "tpu"
    op = PackedPartialOperator.build(coords, conn, "c3d10", 200e9, 0.3,
                                     n_nodes=N, dtype=jnp.float32,
                                     interpret=interpret)
    fixed = meshgen.boundary_nodes(coords, 2, 0.0)
    system = PackedSystem(op, fixed_nodes=fixed, precondition="jacobi")
    refined = RefinedSystem(system, coords, conn, "c3d10", 200e9, 0.3)

    b = np.zeros((N, 3), np.float32)
    b[meshgen.boundary_nodes(coords, 2, 2.0), 0] = 1e3   # shear the tip

    u, info = refined.solve(
        b, tol_rel=1e-8, inner_tol=1e-2, inner_max_iter=3000,
        progress=lambda cy, it, rr: print(
            f"cycle {cy}: inner iters {it}, TRUE rel residual {rr:.3e}"))
    print(f"converged={info.converged} cycles={info.cycles} "
          f"inner_iterations={info.inner_iterations} "
          f"true rel residual={info.rel_residual:.3e}")
    tip = np.asarray(u[jnp.asarray(meshgen.boundary_nodes(coords, 2, 2.0))
                       * 3 + 0])
    print(f"tip ux mean {tip.mean():.4e} (f64-accurate displacement)")


if __name__ == "__main__":
    main()
