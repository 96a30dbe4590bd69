"""Clustered operator == row-gather operator."""
import jax.numpy as jnp
import numpy as np
import pytest

from tpufem.elements import solid
from tpufem.ops.clustered import ClusteredOperator, ClusterPlan
from tpufem.ops.operator import MatrixFreeOperator
from tpufem.ops.scatter import ScatterPlan
from tpufem.utils import meshgen

E, NU = 200.0, 0.3


@pytest.mark.parametrize("etype,mesh", [
    ("c3d4", lambda: meshgen.box_tet(3, 3, 3)),
    ("c3d10", lambda: meshgen.box_tet10(2, 2, 3)),
    ("c3d8", lambda: meshgen.box_hex(3, 3, 3)),
])
def test_clustered_matches_row_gather(etype, mesh):
    coords, conn = mesh()
    N = coords.shape[0]
    K = solid.stiffness(jnp.asarray(coords), jnp.asarray(conn), etype, E, NU)
    op1 = MatrixFreeOperator(K=K, plan=ScatterPlan.build(conn, N, 3))
    op2 = ClusteredOperator.build(K, conn, N, 3)
    u = jnp.asarray(np.random.default_rng(0).standard_normal((N, 3)))
    F1 = np.asarray(op1(u))
    F2 = np.asarray(op2(u))
    np.testing.assert_allclose(F2, F1, rtol=1e-10, atol=1e-12 * np.abs(F1).max())
    d1 = np.asarray(op1.diagonal())
    d2 = np.asarray(op2.diagonal())
    np.testing.assert_allclose(d2, d1, rtol=1e-10, atol=1e-12 * np.abs(d1).max())


def test_clustered_deterministic():
    coords, conn = meshgen.box_tet10(2, 2, 2)
    N = coords.shape[0]
    K = solid.stiffness(jnp.asarray(coords), jnp.asarray(conn), "c3d10", E, NU)
    op = ClusteredOperator.build(K, conn, N, 3)
    u = jnp.asarray(np.random.default_rng(1).standard_normal((N, 3)))
    import jax
    f = jax.jit(op.__call__)
    assert np.array_equal(np.asarray(f(u)), np.asarray(f(u)))


def test_clustered_in_cg():
    import jax
    from tpufem.solvers import cg as cgmod
    from tpufem.solvers.cg import cg
    from tpufem.solvers.constraints import Constraints

    coords, conn = meshgen.box_tet10(2, 2, 2)
    N = coords.shape[0]
    K = solid.stiffness(jnp.asarray(coords), jnp.asarray(conn), "c3d10", E, NU)
    op = ClusteredOperator.build(K, conn, N, 3)
    d = op.diagonal()
    Minv = jnp.where(jnp.abs(d) > 0, 1.0 / jnp.where(d == 0, 1.0, d), 0.0
                     ).reshape(N, 3)
    fixed = meshgen.boundary_nodes(coords, 2, 0.0)
    cons = Constraints.fixed(N, fixed, 3)
    b = np.zeros((N, 3))
    b[meshgen.boundary_nodes(coords, 2, 1.0), 0] = 0.01
    u, info = jax.jit(lambda bb: cg(op, bb, constraints=cons, M_inv=Minv,
                                    tol=1e-11, max_iter=2000))(jnp.asarray(b))
    assert int(info.status) == cgmod.CONVERGED

    op_ref = MatrixFreeOperator(K=K, plan=ScatterPlan.build(conn, N, 3))
    u2, _ = cg(op_ref, jnp.asarray(b), constraints=cons, tol=1e-11,
               max_iter=2000)
    np.testing.assert_allclose(np.asarray(u), np.asarray(u2), rtol=1e-6,
                               atol=1e-10 * np.abs(np.asarray(u2)).max())


def test_clustered_partial_matches():
    from tpufem.ops.clustered import ClusteredPartialOperator

    coords, conn = meshgen.box_tet10(2, 2, 3)
    # curve it so Jinv varies per ip
    rng = np.random.default_rng(5)
    interior = np.all((coords > 1e-9) & (coords < np.array([1, 1, 1]) - 1e-9),
                      axis=1)
    coords2 = coords.copy()
    coords2[interior] += 0.01 * rng.standard_normal((interior.sum(), 3))
    N = coords2.shape[0]
    K = solid.stiffness(jnp.asarray(coords2), jnp.asarray(conn), "c3d10", E, NU)
    op_ref = MatrixFreeOperator(K=K, plan=ScatterPlan.build(conn, N, 3))
    op = ClusteredPartialOperator.build(jnp.asarray(coords2), conn, "c3d10",
                                        E, NU, n_nodes=N)
    u = jnp.asarray(np.random.default_rng(0).standard_normal((N, 3)))
    F1 = np.asarray(op_ref(u))
    F2 = np.asarray(op(u))
    np.testing.assert_allclose(F2, F1, rtol=1e-9, atol=1e-11 * np.abs(F1).max())
    d1 = np.asarray(op_ref.diagonal())
    d2 = np.asarray(op.diagonal())
    np.testing.assert_allclose(d2, d1, rtol=1e-9, atol=1e-11 * np.abs(d1).max())
