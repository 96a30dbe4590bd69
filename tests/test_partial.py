"""Partial-assembly operator == assembled-K operator."""
import jax.numpy as jnp
import numpy as np
import pytest

from tpufem.elements import solid
from tpufem.ops.operator import MatrixFreeOperator
from tpufem.ops.partial import PartialAssemblyOperator
from tpufem.ops.scatter import ScatterPlan
from tpufem.utils import meshgen

E, NU = 200.0, 0.3


def _curve(coords, seed=3):
    rng = np.random.default_rng(seed)
    c = coords.copy()
    interior = np.all((c > 1e-9) & (c < 1 - 1e-9), axis=1)
    c[interior] += 0.02 * rng.standard_normal((interior.sum(), 3))
    return c


@pytest.mark.parametrize("etype,mesh,distort", [
    ("c3d4", lambda: meshgen.box_tet(3, 3, 3), False),
    ("c3d10", lambda: meshgen.box_tet10(2, 2, 2), False),
    ("c3d10", lambda: meshgen.box_tet10(2, 2, 2), True),
    ("c3d8", lambda: meshgen.box_hex(3, 3, 3), True),
    ("c3d6", lambda: meshgen.box_wedge(2, 2, 2), True),
    ("c3d20", lambda: meshgen.hex8_to_hex20(*meshgen.box_hex(1, 1, 2)), True),
])
def test_partial_matches_assembled(etype, mesh, distort):
    coords, conn = mesh()
    if distort:
        coords = _curve(coords)
    N = coords.shape[0]
    cj = jnp.asarray(coords)
    conn_j = jnp.asarray(conn)
    K = solid.stiffness(cj, conn_j, etype, E, NU)
    plan = ScatterPlan.build(conn, N, 3)
    op_k = MatrixFreeOperator(K=K, plan=plan)
    op_p = PartialAssemblyOperator.build(cj, conn, etype, E, NU, plan=plan)
    u = jnp.asarray(np.random.default_rng(0).standard_normal((N, 3)))
    F1 = np.asarray(op_k(u))
    F2 = np.asarray(op_p(u))
    np.testing.assert_allclose(F2, F1, rtol=1e-9, atol=1e-11 * np.abs(F1).max())
    d1 = np.asarray(op_k.diagonal())
    d2 = np.asarray(op_p.diagonal())
    np.testing.assert_allclose(d2, d1, rtol=1e-9, atol=1e-11 * np.abs(d1).max())


def test_affine_detection():
    coords, conn = meshgen.box_tet10(2, 2, 2)
    op = PartialAssemblyOperator.build(jnp.asarray(coords), conn, "c3d10",
                                       E, NU, n_nodes=coords.shape[0])
    assert op.meta.affine            # straight-sided promotion -> affine
    assert op.Jinv.shape[1] == 1
    curved = _curve(coords)
    op2 = PartialAssemblyOperator.build(jnp.asarray(curved), conn, "c3d10",
                                        E, NU, n_nodes=curved.shape[0])
    assert not op2.meta.affine


def test_partial_in_cg():
    from tpufem.solvers import cg as cgmod
    from tpufem.solvers.cg import cg
    from tpufem.solvers.constraints import Constraints

    coords, conn = meshgen.box_tet10(2, 2, 2)
    N = coords.shape[0]
    plan = ScatterPlan.build(conn, N, 3)
    op = PartialAssemblyOperator.build(jnp.asarray(coords), conn, "c3d10",
                                       E, NU, plan=plan)
    fixed = meshgen.boundary_nodes(coords, 2, 0.0)
    cons = Constraints.fixed(N, fixed, 3)
    b = np.zeros((N, 3))
    b[meshgen.boundary_nodes(coords, 2, 1.0), 0] = 0.01
    Minv = jnp.where(jnp.abs(op.diagonal()) > 0, 1.0 / op.diagonal(), 0.0
                     ).reshape(N, 3)
    u, info = cg(op, jnp.asarray(b), constraints=cons, M_inv=Minv,
                 tol=1e-11, max_iter=2000)
    assert int(info.status) == cgmod.CONVERGED
    # cross-check vs assembled-K CG
    K = solid.stiffness(jnp.asarray(coords), jnp.asarray(conn), "c3d10", E, NU)
    op_k = MatrixFreeOperator(K=K, plan=plan)
    u2, _ = cg(op_k, jnp.asarray(b), constraints=cons, tol=1e-11,
               max_iter=2000)
    np.testing.assert_allclose(np.asarray(u), np.asarray(u2), rtol=1e-6,
                               atol=1e-10 * np.abs(np.asarray(u2)).max())
