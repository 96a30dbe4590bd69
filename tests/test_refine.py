"""Mixed-precision iterative refinement: f64-verified converged solves."""
import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp
import scipy.sparse.linalg as spla

from tpufem.elements import solid
from tpufem.ops.packed import PackedPartialOperator, PackedSystem
from tpufem.ops.scatter import element_dofs
from tpufem.solvers.refine import RefinedSystem
from tpufem.utils import meshgen

E, NU = 200e9, 0.3


def test_refined_solve_reaches_f64_tolerance():
    """f32 inner PCG + f64 outer refinement reaches 1e-8 TRUE relative
    residual — far below the f32 storage envelope — and matches the f64
    direct solution."""
    coords, conn = meshgen.box_tet10(3, 3, 3)
    N = coords.shape[0]
    op = PackedPartialOperator.build(jnp.asarray(coords, jnp.float32), conn,
                                     "c3d10", E, NU, n_nodes=N,
                                     interpret=True)
    fixed = meshgen.boundary_nodes(coords, 2, 0.0)
    sys_ = PackedSystem(op, fixed_nodes=fixed, precondition="jacobi")
    ref = RefinedSystem(sys_, coords, conn, "c3d10", E, NU,
                        chunk_elems=100,          # exercise chunking
                        geometry_dtype=jnp.float64)
    assert len(ref.op64.chunks) > 1
    b = np.zeros((N, 3), np.float32)
    b[meshgen.boundary_nodes(coords, 2, 1.0), 2] = -1e3
    u, info = ref.solve(b, tol_rel=1e-8, inner_tol=1e-2,
                        inner_max_iter=3000, every=500)
    assert info.converged, info
    assert info.rel_residual <= 1e-8
    assert info.cycles >= 2                       # genuinely iterative
    # f64 ground truth
    K = np.asarray(solid.stiffness(jnp.asarray(coords, jnp.float64),
                                   jnp.asarray(conn), "c3d10", E, NU))
    dofs = element_dofs(conn, 3)
    d = dofs.shape[1]
    rows = np.repeat(dofs, d, axis=1).ravel()
    cols = np.tile(dofs, (1, d)).ravel()
    A = sp.coo_matrix((K.ravel(), (rows, cols)), shape=(N * 3, N * 3)).tocsr()
    mask = np.ones(N * 3, bool)
    mask[(np.asarray(fixed)[:, None] * 3 + np.arange(3)).ravel()] = False
    u_ref = np.zeros(N * 3)
    u_ref[mask] = spla.spsolve(A[mask][:, mask].tocsc(),
                               np.asarray(b, np.float64).reshape(-1)[mask])
    u_ref = u_ref.reshape(N, 3)
    np.testing.assert_allclose(np.asarray(u).reshape(N, 3), u_ref,
                               rtol=1e-6,
                               atol=1e-9 * np.abs(u_ref).max())
