"""Hybrid subdomain (Schur substructuring) solver vs direct solve."""
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp
import scipy.sparse.linalg as spla

from tpufem.elements import solid
from tpufem.ops.scatter import element_dofs
from tpufem.solvers import cg as cgmod
from tpufem.solvers.hybrid import build_hybrid, hybrid_solve
from tpufem.utils import meshgen

E, NU = 200.0, 0.3


def _direct(coords, conn, fixed, b):
    N = coords.shape[0]
    K = np.asarray(solid.stiffness(jnp.asarray(coords), jnp.asarray(conn),
                                   "c3d4", E, NU))
    dofs = element_dofs(conn, 3)
    d = dofs.shape[1]
    rows = np.repeat(dofs, d, axis=1).ravel()
    cols = np.tile(dofs, (1, d)).ravel()
    A = sp.coo_matrix((K.ravel(), (rows, cols)), shape=(N * 3, N * 3)).tocsr()
    mask = np.ones(N * 3, bool)
    for n in fixed:
        mask[3 * n:3 * n + 3] = False
    u = np.zeros(N * 3)
    u[mask] = spla.spsolve(A[mask][:, mask].tocsc(), b.reshape(-1)[mask])
    return u.reshape(N, 3)


def test_hybrid_matches_direct():
    coords, conn = meshgen.box_tet(3, 3, 3)
    N = coords.shape[0]
    fixed = meshgen.boundary_nodes(coords, 2, 0.0)
    b = np.zeros((N, 3))
    b[meshgen.boundary_nodes(coords, 2, 1.0), 0] = 0.02
    u, info = hybrid_solve(coords, conn, "c3d4", E, NU, b, n_parts=4,
                           fixed_nodes=fixed, tol=1e-12, max_iter=500)
    assert int(info.status) == cgmod.CONVERGED
    u_ref = _direct(coords, conn, fixed, b)
    np.testing.assert_allclose(np.asarray(u), u_ref, rtol=1e-7,
                               atol=1e-10 * np.abs(u_ref).max())


def test_hybrid_interface_cg_is_cheap():
    """Interface CG converges in far fewer iterations than plain CG dofs."""
    coords, conn = meshgen.box_tet(3, 3, 6, 1, 1, 2)
    N = coords.shape[0]
    fixed = meshgen.boundary_nodes(coords, 2, 0.0)
    b = np.zeros((N, 3))
    b[meshgen.boundary_nodes(coords, 2, 2.0), 2] = -1.0
    u, info = hybrid_solve(coords, conn, "c3d4", E, NU, b, n_parts=2,
                           fixed_nodes=fixed, tol=1e-11, max_iter=500)
    assert int(info.status) == cgmod.CONVERGED
    sys_ = build_hybrid(coords, conn, "c3d4", E, NU, 2, fixed_nodes=fixed)
    # outer iterations bounded by interface dof count
    assert int(info.iterations) <= sys_.meta.n_interface * 3
    u_ref = _direct(coords, conn, fixed, b)
    np.testing.assert_allclose(np.asarray(u), u_ref, rtol=1e-6,
                               atol=1e-9 * np.abs(u_ref).max())


def test_hybrid_single_part_degenerates_to_direct():
    """n_parts=1: everything except fixed nodes is interior -> 1 iteration."""
    coords, conn = meshgen.box_tet(2, 2, 2)
    N = coords.shape[0]
    fixed = meshgen.boundary_nodes(coords, 2, 0.0)
    b = np.zeros((N, 3))
    b[meshgen.boundary_nodes(coords, 2, 1.0), 1] = 1.0
    u, info = hybrid_solve(coords, conn, "c3d4", E, NU, b, n_parts=1,
                           fixed_nodes=fixed, tol=1e-12, max_iter=200)
    u_ref = _direct(coords, conn, fixed, b)
    np.testing.assert_allclose(np.asarray(u), u_ref, rtol=1e-8,
                               atol=1e-10 * np.abs(u_ref).max())


def test_hybrid_nn_and_bdd_preconditioners():
    """Neumann-Neumann and BDD (rigid coarse) interface preconditioning:
    correct solutions and fewer interface-CG iterations than Jacobi
    (VERDICT r3 item 6)."""
    import jax

    coords, conn = meshgen.box_tet(4, 4, 8, 1, 1, 2)
    N = coords.shape[0]
    fixed = meshgen.boundary_nodes(coords, 2, 0.0)
    b = np.zeros((N, 3))
    b[meshgen.boundary_nodes(coords, 2, 2.0), 0] = 1.0
    u_ref = _direct(coords, conn, fixed, b)
    iters = {}
    for precond in ("jacobi", "nn", "bdd"):
        sys_ = build_hybrid(coords, conn, "c3d4", E, NU, 8,
                            fixed_nodes=fixed, precondition=precond)
        bj = jnp.asarray(b).at[jnp.asarray(np.asarray(fixed))].set(0.0)
        u, info = jax.jit(lambda sy, ff: sy.solve(
            ff, tol=1e-11, max_iter=800))(sys_, bj)
        assert int(info.status) == cgmod.CONVERGED, precond
        iters[precond] = int(info.iterations)
        np.testing.assert_allclose(np.asarray(u), u_ref, rtol=1e-6,
                                   atol=1e-9 * np.abs(u_ref).max(),
                                   err_msg=precond)
    # Measured spectra (box_tet(3,3,6), 6 parts): cond(MS) jacobi 883,
    # nn 3788 (no coarse coupling -> lambda_min collapses), bdd 80.
    # The scalable preconditioner is bdd; nn is its local building block.
    assert iters["bdd"] < iters["jacobi"]
    assert iters["bdd"] <= iters["nn"]
    print("iters:", iters)


def test_hybrid_bdd_iterations_bounded_in_parts():
    """The rigid-body coarse space keeps iteration growth mild as the
    part count increases (the scalability property Jacobi lacks)."""
    import jax

    coords, conn = meshgen.box_tet(4, 4, 12, 1, 1, 3)
    N = coords.shape[0]
    fixed = meshgen.boundary_nodes(coords, 2, 0.0)
    b = np.zeros((N, 3))
    b[meshgen.boundary_nodes(coords, 2, 3.0), 2] = -1.0
    its = []
    for n_parts in (3, 12):
        sys_ = build_hybrid(coords, conn, "c3d4", E, NU, n_parts,
                            fixed_nodes=fixed, precondition="bdd")
        bj = jnp.asarray(b).at[jnp.asarray(np.asarray(fixed))].set(0.0)
        u, info = jax.jit(lambda sy, ff: sy.solve(
            ff, tol=1e-10, max_iter=800))(sys_, bj)
        assert int(info.status) == cgmod.CONVERGED
        its.append(int(info.iterations))
    # 4x the parts must cost at most ~2x the iterations
    assert its[1] <= 2 * its[0] + 10, its


def test_hybrid_interior_inverse_matches():
    """interior_inverse=True (GEMV against K_II^-1) == the Cholesky path."""
    import jax.numpy as jnp
    from tpufem.solvers.hybrid import build_hybrid
    from tpufem.utils import meshgen
    coords, conn = meshgen.box_tet(4, 4, 4)
    fixed = meshgen.boundary_nodes(coords, 2, 0.0)
    b = np.zeros((coords.shape[0], 3))
    b[meshgen.boundary_nodes(coords, 2, 1.0), 0] = 1e3
    b[np.asarray(fixed)] = 0.0
    kw = dict(fixed_nodes=fixed, seed=0, precondition="bdd")
    s1 = build_hybrid(coords, conn, "c3d4", 200e9, 0.3, 4, **kw)
    s2 = build_hybrid(coords, conn, "c3d4", 200e9, 0.3, 4,
                      interior_inverse=True, slim=True, **kw)
    u1, i1 = s1.solve(jnp.asarray(b), tol=1e-8, max_iter=400)
    u2, i2 = s2.solve(jnp.asarray(b), tol=1e-8, max_iter=400)
    assert int(i1.status) == 1 and int(i2.status) == 1
    np.testing.assert_allclose(np.asarray(u2), np.asarray(u1), rtol=1e-6,
                               atol=1e-8 * np.abs(np.asarray(u1)).max())


def test_hybrid_matrix_free_interface_matches():
    """matrix_free_gg=True (global-operator interface matvec, no stored
    Schur blocks) == the dense-S path."""
    import jax.numpy as jnp
    from tpufem.solvers.hybrid import build_hybrid
    from tpufem.utils import meshgen
    coords, conn = meshgen.box_tet(4, 4, 4)
    fixed = meshgen.boundary_nodes(coords, 2, 0.0)
    N = coords.shape[0]
    b = np.zeros((N, 3))
    b[meshgen.boundary_nodes(coords, 2, 1.0), 0] = 1e3
    b[np.asarray(fixed)] = 0.0
    kw = dict(fixed_nodes=fixed, seed=0, precondition="bdd")
    s1 = build_hybrid(coords, conn, "c3d4", 200e9, 0.3, 4, **kw)
    s2 = build_hybrid(coords, conn, "c3d4", 200e9, 0.3, 4, slim=True,
                      interior_inverse=True, matrix_free_gg=True, **kw)
    assert s2.S is None and s2.mf_op is not None
    # matvec parity on a random interface vector
    rng = np.random.default_rng(0)
    v = jnp.asarray(rng.standard_normal((int(s1.g_nodes.shape[0]), 3)))
    sv1 = np.asarray(s1.schur_matvec(v))
    sv2 = np.asarray(s2.schur_matvec(v))
    np.testing.assert_allclose(sv2, sv1, rtol=1e-9,
                               atol=1e-10 * np.abs(sv1).max())
    u1, i1 = s1.solve(jnp.asarray(b), tol=1e-8, max_iter=400)
    u2, i2 = s2.solve(jnp.asarray(b), tol=1e-8, max_iter=400)
    assert int(i1.status) == 1 and int(i2.status) == 1
    np.testing.assert_allclose(np.asarray(u2), np.asarray(u1), rtol=1e-5,
                               atol=1e-7 * np.abs(np.asarray(u1)).max())


def test_hybrid_interior_inverse_f32_accuracy():
    """ADVICE r4: interior_inverse replaces backward-stable triangular
    solves with GEMV against explicit K_II^-1 in the SOLUTION path, and
    the flagship 1M config runs it in f32 — measure the forward error at
    a refined mesh instead of assuming it.  Accuracy bar: the f32
    interior-inverse solution must sit within the storage-precision
    envelope (~kappa * eps_f32) of the f64 direct solution, and its TRUE
    residual through an independently assembled operator must be small."""
    import jax.numpy as jnp
    coords, conn = meshgen.box_tet(6, 6, 12, 1.0, 1.0, 2.0)
    N = coords.shape[0]
    fixed = meshgen.boundary_nodes(coords, 2, 0.0)
    b = np.zeros((N, 3), np.float32)
    b[meshgen.boundary_nodes(coords, 2, 2.0), 0] = 1e3
    b[np.asarray(fixed)] = 0.0
    s = build_hybrid(coords, conn, "c3d4", 200e9, 0.3, 8,
                     fixed_nodes=fixed, seed=0, precondition="bdd",
                     interior_inverse=True, slim=True, dtype=np.float32)
    u, info = s.solve(jnp.asarray(b), tol=1e-4 * np.linalg.norm(b),
                      max_iter=400)
    assert int(info.status) == 1
    u = np.asarray(u, np.float64)
    # f64 ground truth through the same (f64) stiffness
    u_ref = _direct_scaled(coords, conn, fixed, b.astype(np.float64))
    rel = (np.abs(u - u_ref).max() / np.abs(u_ref).max())
    # independent true residual (f64 assembled operator)
    K = np.asarray(solid.stiffness(jnp.asarray(coords), jnp.asarray(conn),
                                   "c3d4", 200e9, 0.3))
    dofs = element_dofs(conn, 3)
    d = dofs.shape[1]
    rows = np.repeat(dofs, d, axis=1).ravel()
    cols = np.tile(dofs, (1, d)).ravel()
    A = sp.coo_matrix((K.ravel(), (rows, cols)), shape=(N * 3, N * 3)).tocsr()
    mask = np.ones(N * 3, bool)
    mask[(np.asarray(fixed)[:, None] * 3 + np.arange(3)).ravel()] = False
    r = b.reshape(-1)[mask] - (A[mask][:, mask] @ u.reshape(-1)[mask])
    rres = np.linalg.norm(r) / np.linalg.norm(b)
    print(f"f32 interior-inverse: rel err {rel:.2e}, true res {rres:.2e}")
    assert rel < 5e-3, rel       # storage-precision envelope
    assert rres < 5e-3, rres


def _direct_scaled(coords, conn, fixed, b):
    N = coords.shape[0]
    K = np.asarray(solid.stiffness(jnp.asarray(coords), jnp.asarray(conn),
                                   "c3d4", 200e9, 0.3))
    dofs = element_dofs(conn, 3)
    d = dofs.shape[1]
    rows = np.repeat(dofs, d, axis=1).ravel()
    cols = np.tile(dofs, (1, d)).ravel()
    A = sp.coo_matrix((K.ravel(), (rows, cols)), shape=(N * 3, N * 3)).tocsr()
    mask = np.ones(N * 3, bool)
    mask[(np.asarray(fixed)[:, None] * 3 + np.arange(3)).ravel()] = False
    u = np.zeros(N * 3)
    u[mask] = spla.spsolve(A[mask][:, mask].tocsc(), b.reshape(-1)[mask])
    return u.reshape(N, 3)


def test_hybrid_slim_jacobi_matches():
    """jacobi + slim + interior_inverse + matrix_free_gg (the 1M-element
    single-chip config-4 memory configuration: no dense K_GG, no Schur
    blocks, no NN/BDD S_p^-1 — resident blocks are K_II^-1 and K_IG
    only) == the plain jacobi dense path."""
    import jax.numpy as jnp
    from tpufem.solvers.hybrid import build_hybrid
    from tpufem.utils import meshgen
    coords, conn = meshgen.box_tet(4, 4, 4)
    fixed = meshgen.boundary_nodes(coords, 2, 0.0)
    N = coords.shape[0]
    b = np.zeros((N, 3))
    b[meshgen.boundary_nodes(coords, 2, 1.0), 0] = 1e3
    b[np.asarray(fixed)] = 0.0
    kw = dict(fixed_nodes=fixed, seed=0, precondition="jacobi")
    s1 = build_hybrid(coords, conn, "c3d4", 200e9, 0.3, 4, **kw)
    s2 = build_hybrid(coords, conn, "c3d4", 200e9, 0.3, 4, slim=True,
                      interior_inverse=True, matrix_free_gg=True, **kw)
    assert s2.mf_op is not None and s2.Kinv is not None
    assert s2.Sinv is None                       # still the Jacobi M
    assert s2.K_GG.shape[-1] == 1                # slim placeholder
    assert s2.chol.shape[-1] == 1                # factor released
    rng = np.random.default_rng(0)
    v = jnp.asarray(rng.standard_normal((int(s1.g_nodes.shape[0]), 3)))
    np.testing.assert_allclose(np.asarray(s2.schur_matvec(v)),
                               np.asarray(s1.schur_matvec(v)), rtol=1e-9,
                               atol=1e-10)
    u1, i1 = s1.solve(jnp.asarray(b), tol=1e-8, max_iter=400)
    u2, i2 = s2.solve(jnp.asarray(b), tol=1e-8, max_iter=400)
    assert int(i1.status) == 1 and int(i2.status) == 1
    np.testing.assert_allclose(np.asarray(u2), np.asarray(u1), rtol=1e-6,
                               atol=1e-8 * np.abs(np.asarray(u1)).max())


def test_hybrid_slim_jacobi_requires_mf():
    from tpufem.solvers.hybrid import build_hybrid
    from tpufem.utils import meshgen
    import pytest
    coords, conn = meshgen.box_tet(2, 2, 2)
    with pytest.raises(ValueError, match="matrix_free_gg"):
        build_hybrid(coords, conn, "c3d4", 200e9, 0.3, 2,
                     precondition="jacobi", slim=True)


def test_hybrid_solve_chunked_matches():
    """Chunked interface CG (exact resume continuation) == one-shot
    solve() — same converged solution from bounded-length programs."""
    import jax.numpy as jnp
    from tpufem.solvers.hybrid import build_hybrid
    from tpufem.utils import meshgen
    coords, conn = meshgen.box_tet(4, 4, 4)
    fixed = meshgen.boundary_nodes(coords, 2, 0.0)
    N = coords.shape[0]
    b = np.zeros((N, 3))
    b[meshgen.boundary_nodes(coords, 2, 1.0), 0] = 1e3
    b[np.asarray(fixed)] = 0.0
    sys_ = build_hybrid(coords, conn, "c3d4", 200e9, 0.3, 4,
                        fixed_nodes=fixed, seed=0, precondition="jacobi")
    u1, i1 = sys_.solve(jnp.asarray(b), tol=1e-8, max_iter=400)
    u2, i2 = sys_.solve_chunked(jnp.asarray(b), tol=1e-8, max_iter=400,
                                every=7)
    assert int(i1.status) == 1 and int(i2.status) == 1
    # chunked restarts refresh the true residual, so iteration counts may
    # differ by a few; the solutions must agree
    assert abs(int(i2.iterations) - int(i1.iterations)) <= 10
    np.testing.assert_allclose(np.asarray(u2), np.asarray(u1), rtol=1e-6,
                               atol=1e-8 * np.abs(np.asarray(u1)).max())
