"""BSR assembly + SpMV vs scipy and the matrix-free operator."""
import jax.numpy as jnp
import numpy as np

from tpufem.elements import solid
from tpufem.ops import assembly
from tpufem.ops.operator import MatrixFreeOperator
from tpufem.ops.scatter import ScatterPlan
from tpufem.utils import meshgen

E, NU = 200.0, 0.3


def _setup(n=2):
    coords, conn = meshgen.box_tet(n, n, n)
    K = solid.stiffness(jnp.asarray(coords), jnp.asarray(conn), "c3d4", E, NU)
    s = assembly.build_bsr_structure(conn, coords.shape[0], 3)
    A = assembly.assemble_bsr(K, conn.shape[1], s)
    return coords, conn, K, A


def test_bsr_matches_scipy_dense():
    coords, conn, K, A = _setup()
    N = coords.shape[0]
    S = assembly.to_scipy(A).toarray()
    # independent dense assembly
    ref = np.zeros((N * 3, N * 3))
    dofs = (conn[:, :, None] * 3 + np.arange(3)).reshape(conn.shape[0], -1)
    Kn = np.asarray(K)
    for m in range(conn.shape[0]):
        ref[np.ix_(dofs[m], dofs[m])] += Kn[m]
    np.testing.assert_allclose(S, ref, rtol=1e-12, atol=1e-12 * np.abs(ref).max())


def test_bsr_matvec_matches_matrix_free():
    coords, conn, K, A = _setup(3)
    N = coords.shape[0]
    plan = ScatterPlan.build(conn, N, 3)
    op = MatrixFreeOperator(K=K, plan=plan)
    u = np.random.default_rng(0).standard_normal((N, 3))
    y_bsr = np.asarray(assembly.bsr_matvec(A, jnp.asarray(u)))
    y_mf = np.asarray(op(jnp.asarray(u)))
    np.testing.assert_allclose(y_bsr, y_mf, rtol=1e-10,
                               atol=1e-12 * np.abs(y_mf).max())


def test_bsr_diagonal():
    coords, conn, K, A = _setup()
    d = np.asarray(A.diagonal())
    ref = assembly.to_scipy(A).toarray().diagonal()
    np.testing.assert_allclose(d, ref, rtol=1e-12)


def test_assemble_dense_matches_bsr():
    coords, conn, K, A = _setup()
    N = coords.shape[0]
    dense = np.asarray(assembly.assemble_dense(K, conn, N, 3))
    np.testing.assert_allclose(dense, assembly.to_scipy(A).toarray(),
                               rtol=1e-12)


def test_bsr_reassembly_is_fast_path():
    """Same structure, new values (geometry update) — no host round trip."""
    coords, conn = meshgen.box_tet(2, 2, 2)
    N = coords.shape[0]
    s = assembly.build_bsr_structure(conn, N, 3)
    K1 = solid.stiffness(jnp.asarray(coords), jnp.asarray(conn), "c3d4", E, NU)
    K2 = solid.stiffness(jnp.asarray(coords * 2.0), jnp.asarray(conn), "c3d4",
                         E, NU)
    A1 = assembly.assemble_bsr(K1, 4, s)
    A2 = assembly.assemble_bsr(K2, 4, s)
    # scaling coords by 2: volume x8, B x1/2 => K scales by 2
    np.testing.assert_allclose(np.asarray(A2.data), 2 * np.asarray(A1.data),
                               rtol=1e-9)
