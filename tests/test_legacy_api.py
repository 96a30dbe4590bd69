"""Reference-compatible API surface (solvers.legacy, elements.dispatch)."""
import jax.numpy as jnp
import numpy as np

from tpufem.elements import dispatch, solid
from tpufem.solvers import legacy
from tpufem.utils import meshgen

E, NU = 200.0, 0.3


def _setup(n=2):
    coords, conn = meshgen.box_tet(n, n, n)
    K = solid.stiffness(jnp.asarray(coords), jnp.asarray(conn), "c3d4", E, NU)
    fixed = meshgen.boundary_nodes(coords, 2, 0.0)
    b = np.zeros((coords.shape[0], 3))
    b[meshgen.boundary_nodes(coords, 2, 1.0), 0] = 0.01
    return coords, conn, K, fixed, b


def test_stable_cg_and_final_solver_agree():
    coords, conn, K, fixed, b = _setup()
    u1 = legacy.stable_conjugate_gradient_solver(K, conn, b, fixed,
                                                 tol=1e-12, max_iter=1000)
    u2 = legacy.final_solver(K, conn, b, fixed, tol=1e-12, max_iter=1000)
    np.testing.assert_allclose(np.asarray(u1), np.asarray(u2), rtol=1e-8,
                               atol=1e-12)


def test_pcg_and_diag_preconditioner():
    coords, conn, K, fixed, b = _setup()
    N = coords.shape[0]
    Minv = legacy.compute_diagonal_preconditioner(K, conn, N, dtype=np.float64)
    assert Minv.shape == (N, 3)
    # mask fixed dofs so the unconstrained legacy PCG stays SPD-consistent
    bb = b.copy()
    u = legacy.preconditioned_conjugate_gradient_solver(
        K, conn, bb, Minv, tol=1e-10, max_iter=50, dtype=np.float64)
    assert np.isfinite(np.asarray(u)).all()


def test_bicgstab_and_gmres_solver():
    coords, conn, K, fixed, b = _setup()
    u1 = legacy.bicgstab_solver(K, conn, b, fixed, tol=1e-10, max_iter=1000,
                                dtype=np.float64)
    u2 = legacy.gmres_solver(K, conn, b * 0.0, tol=1e-8, max_iter=100,
                             restart=20, dtype=np.float64)
    np.testing.assert_allclose(np.asarray(u2), 0.0, atol=1e-12)
    ref = legacy.stable_conjugate_gradient_solver(K, conn, b, fixed,
                                                  tol=1e-12, max_iter=2000)
    np.testing.assert_allclose(np.asarray(u1), np.asarray(ref), rtol=1e-4,
                               atol=1e-8 * np.abs(np.asarray(ref)).max())


def test_constrained_and_load_list_solvers():
    coords, conn, K, fixed, b = _setup()
    N = coords.shape[0]
    spc = [{"node": int(n), "dofs": [0, 1, 2], "value": 0.0} for n in fixed]
    u1 = legacy.constrained_conjugate_gradient_solver(
        K, conn, b, [], spc, tol=1e-12, max_iter=2000)
    loads = [{"node": int(n), "force": [0.01, 0, 0]}
             for n in meshgen.boundary_nodes(coords, 2, 1.0)]
    u2 = legacy.new_constrained_conjugate_gradient_solver(
        K, conn, N, [], [], spc, loads, tol=1e-12, max_iter=2000)
    np.testing.assert_allclose(np.asarray(u1), np.asarray(u2), rtol=1e-7,
                               atol=1e-12)


def test_parsers_match_reference_shapes():
    spc = [{"node": 3, "dofs": [0, 2], "value": 1.5}]
    n, d, v = legacy.parse_spc_list(spc)
    assert n.shape == (2,) and float(v[0]) == 1.5
    r2 = [{"master": 1, "slaves": [4, 5], "dofs": [0, 1, 2]}]
    s, m, dd = legacy.parse_rbe2_list(r2)
    assert s.shape == (6,)
    r3 = [{"master": 0, "slaves": [1, 2], "dofs": [0], "weights": [1.0, 3.0]}]
    out = legacy.parse_rbe3_list(r3)
    assert out[0].shape == (2,) and float(out[5][0]) == 4.0


def test_newton_and_modal_wrappers():
    coords, conn, K, fixed, b = _setup()
    N = coords.shape[0]
    u = legacy.newton_raphson_solver(lambda u: K, conn, b, tol=1e-6,
                                     max_iter=5, dtype=np.float64)
    assert np.isfinite(np.asarray(u)).all()
    Mloc = solid.mass(jnp.asarray(coords), jnp.asarray(conn), "c3d4", 2.0)
    lam, modes = legacy.vectorized_modal_solver(K, Mloc, conn, fixed, N,
                                                num_eigs=3, max_iter=8,
                                                dtype=np.float64)
    assert lam.shape == (3,) and float(lam[0]) > 0


def test_dispatch_wrappers():
    coords, conn = meshgen.box_tet(1, 1, 1)
    pts, w = dispatch.integral_points("c3d10")
    assert pts.shape[1] == 3
    J = dispatch.compute_jacobian(coords, conn, "c3d4")
    assert J.shape == (conn.shape[0], 1, 3, 3)
    B = dispatch.compute_B_matrix(coords, conn, "c3d4")
    assert B.shape[2:] == (6, 4, 3)
    K1 = dispatch.compute_K_matrix(coords, conn, "c3d4", E, NU)
    from tpufem.core.materials import elasticity_matrix
    K2 = dispatch.compute_K_matrix(coords, conn, "c3d4", E, NU,
                                   D=elasticity_matrix(E, NU))
    np.testing.assert_allclose(np.asarray(K1), np.asarray(K2), rtol=1e-9)
    Mc = dispatch.compute_M_matrix(coords, conn, "c3d4", 2.0)
    Ml = dispatch.compute_M_matrix(coords, conn, "c3d4", 2.0, lumped=True)
    np.testing.assert_allclose(np.asarray(Mc).sum() / 3, 2.0, rtol=1e-9)
    np.testing.assert_allclose(np.asarray(Ml).sum() / 3, 2.0, rtol=1e-9)
    t, vm = dispatch.compute_element_stress(coords, conn,
                                            np.zeros_like(coords), E, NU,
                                            "c3d4")
    np.testing.assert_allclose(np.asarray(vm), 0.0, atol=1e-12)


def test_per_ip_stiffness_sums_to_single():
    coords, conn = meshgen.box_tet10(1, 1, 1)
    Kp = dispatch.compute_K_matrix(coords, conn, "c3d10", E, NU, single=False)
    from tpufem.elements.tables import quadrature
    _, w = quadrature("c3d10")
    K1 = dispatch.compute_K_matrix(coords, conn, "c3d10", E, NU)
    Ksum = np.einsum("q,qmij->mij", w, np.asarray(Kp))
    np.testing.assert_allclose(Ksum, np.asarray(K1), rtol=1e-9,
                               atol=1e-10 * np.abs(np.asarray(K1)).max())


def test_compute_volumes_dispatch():
    coords, conn = meshgen.box_wedge(2, 2, 2)
    V = dispatch.compute_volumes(coords, conn, "c3d6")
    np.testing.assert_allclose(np.asarray(V).sum(), 1.0, rtol=1e-10)
