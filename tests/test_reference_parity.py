"""Reference-parity harness: run the reference's OWN solver semantics on
torch-CPU and assert tpufem matches it iteration-by-iteration.

BASELINE.md acceptance: "match reference residual histories and displacement
fields within float32/float64 tolerance" on the anchor config (config 1 =
small c3d4 mesh, fixed nodes, point loads — mirrors solver_example.ipynb).

The torch code below is an independent implementation of the reference's
documented algorithms (NOT an import of or copy from the reference):

* element stiffness: c3d4 analytic-gradient formula K = B^T D B * V with B
  from the inverse of the [1 x y z] node matrix
  (reference compute_c3d4_B_matrix / compute_c3d4_K_matrix,
  solver/element.py:835-904);
* matrix-free SpMV: gather -> bmm -> index_add
  (reference compute_nodal_forces, solver/element.py:429-464);
* plain CG with fixed-node zeroing, alpha = rs/(pAp + eps), absolute tol on
  sqrt(rs_new), early exits on non-SPD / NaN
  (reference stable_conjugate_gradient_solver, solver/solver.py:144-229).
"""
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from tpufem.elements import solid
from tpufem.ops.operator import MatrixFreeOperator
from tpufem.ops.scatter import ScatterPlan
from tpufem.solvers.cg import cg
from tpufem.solvers.constraints import Constraints
from tpufem.utils import meshgen

E, NU = 200e9, 0.3


# --------------------------------------------------------------------------
# Reference algorithms, re-implemented in torch-f64 on CPU
# --------------------------------------------------------------------------

def ref_c3d4_stiffness(coords, conn):
    """K [M,12,12] per the reference's analytic c3d4 formulation
    (solver/element.py:835-904): gradients from inv([1 | x]), K = B^T D B V."""
    X = torch.as_tensor(coords, dtype=torch.float64)[torch.as_tensor(
        conn, dtype=torch.long)]                                  # [M,4,3]
    M = X.shape[0]
    A = torch.cat([torch.ones(M, 4, 1, dtype=torch.float64), X], dim=2)
    Ainv = torch.linalg.inv(A)                                    # [M,4,4]
    grads = Ainv[:, 1:4, :].transpose(1, 2)                       # [M,4,3]
    V = torch.abs(torch.linalg.det(A)) / 6.0                      # [M]
    B = torch.zeros(M, 6, 12, dtype=torch.float64)
    for k in range(4):
        gx, gy, gz = grads[:, k, 0], grads[:, k, 1], grads[:, k, 2]
        B[:, 0, 3 * k + 0] = gx
        B[:, 1, 3 * k + 1] = gy
        B[:, 2, 3 * k + 2] = gz
        B[:, 3, 3 * k + 0] = gy
        B[:, 3, 3 * k + 1] = gx
        B[:, 4, 3 * k + 1] = gz
        B[:, 4, 3 * k + 2] = gy
        B[:, 5, 3 * k + 0] = gz
        B[:, 5, 3 * k + 2] = gx
    lam = E * NU / ((1 + NU) * (1 - 2 * NU))
    mu = E / (2 * (1 + NU))
    D = torch.zeros(6, 6, dtype=torch.float64)
    D[:3, :3] = lam
    D[0, 0] = D[1, 1] = D[2, 2] = lam + 2 * mu
    D[3, 3] = D[4, 4] = D[5, 5] = mu
    return torch.einsum("mri,rs,msj,m->mij", B, D, B, V)


def ref_nodal_forces(K, conn, u):
    """gather -> bmm -> index_add (solver/element.py:429-464)."""
    conn = torch.as_tensor(conn, dtype=torch.long)
    M = conn.shape[0]
    dofs = (conn.unsqueeze(-1) * 3
            + torch.arange(3).view(1, 1, 3)).view(M, -1)          # [M,12]
    u_loc = u.reshape(-1)[dofs]
    F_loc = torch.bmm(K, u_loc.unsqueeze(-1)).squeeze(-1)
    F = torch.zeros(u.numel(), dtype=u.dtype)
    F.index_add_(0, dofs.reshape(-1), F_loc.reshape(-1))
    return F.reshape(u.shape)


def ref_stable_cg(K, conn, F, fixed, tol=1e-10, max_iter=1000, eps=1e-30):
    """Reference CG semantics (solver/solver.py:144-229) + residual history."""
    N = F.shape[0]
    u = torch.zeros(N, 3, dtype=torch.float64)
    u[fixed] = 0.0
    r = F - ref_nodal_forces(K, conn, u)
    r[fixed] = 0.0
    p = r.clone()
    rs_old = torch.sum(r * r)
    hist = [float(torch.sqrt(rs_old))]
    for i in range(max_iter):
        Ap = ref_nodal_forces(K, conn, p)
        pAp = torch.sum(p * Ap)
        if pAp.abs() < eps or pAp < 0.0:
            break
        alpha = rs_old / (pAp + eps)
        if torch.isnan(alpha) or torch.isinf(alpha):
            break
        u += alpha * p
        u[fixed] = 0.0
        r -= alpha * Ap
        r[fixed] = 0.0
        rs_new = torch.sum(r * r)
        hist.append(float(torch.sqrt(rs_new)))
        if torch.sqrt(rs_new) < tol:
            break
        beta = rs_new / (rs_old + eps)
        if torch.isnan(beta) or torch.isinf(beta):
            break
        p = r + beta * p
        p[fixed] = 0.0
        rs_old = rs_new
    return u, np.asarray(hist)


# --------------------------------------------------------------------------
# Anchor config 1: small c3d4 mesh, one face fixed, point loads on the
# opposite face (mirrors solver_example.ipynb / BASELINE.json configs[0])
# --------------------------------------------------------------------------

@pytest.fixture(scope="module")
def anchor():
    coords, conn = meshgen.box_tet(4, 4, 4)
    N = coords.shape[0]
    fixed = meshgen.boundary_nodes(coords, 2, 0.0)
    F = np.zeros((N, 3))
    F[meshgen.boundary_nodes(coords, 2, 1.0), 0] = 1e6   # shear point loads
    F[meshgen.boundary_nodes(coords, 2, 1.0), 2] = -2e6
    return coords, conn, N, fixed, F


def test_element_stiffness_matches_reference_formula(anchor):
    coords, conn, N, fixed, F = anchor
    K_ref = ref_c3d4_stiffness(coords, conn).numpy()
    K_ours = np.asarray(solid.stiffness(jnp.asarray(coords),
                                        jnp.asarray(conn), "c3d4", E, NU))
    np.testing.assert_allclose(K_ours, K_ref, rtol=1e-10,
                               atol=1e-10 * np.abs(K_ref).max())


def test_residual_history_matches_reference(anchor):
    """Iteration-by-iteration parity with the reference's own CG (f64)."""
    coords, conn, N, fixed, F = anchor
    K_t = ref_c3d4_stiffness(coords, conn)
    tol, max_iter = 1e-4, 400   # absolute tol (reference semantics)
    u_ref, hist_ref = ref_stable_cg(K_t, conn, torch.as_tensor(F), fixed,
                                    tol=tol, max_iter=max_iter)

    K = solid.stiffness(jnp.asarray(coords), jnp.asarray(conn), "c3d4", E, NU)
    plan = ScatterPlan.build(conn, N, 3)
    op = MatrixFreeOperator(K=K, plan=plan)
    cons = Constraints.fixed(N, fixed, 3, dtype=np.float64)
    u, info = cg(op, jnp.asarray(F), constraints=cons, tol=tol,
                 max_iter=max_iter)

    hist = np.asarray(info.history)
    n_ref = hist_ref.size
    assert abs(int(info.iterations) - (n_ref - 1)) <= 3, (
        f"iteration count differs: ours {int(info.iterations)}, "
        f"reference {n_ref - 1}")
    # Same Krylov trajectory down to ~3e-3 relative residual reduction
    # (measured: identical to 1e-9 until iteration 68 of 147 on this
    # config).  Below that, summation-order roundoff amplified by kappa(K)
    # makes ANY two exact-CG implementations diverge pointwise — the
    # invariants that survive are the iteration count and the solution.
    mask = hist_ref > 3e-3 * hist_ref[0]
    n_cmp = min(n_ref, hist.size)
    np.testing.assert_allclose(hist[:n_cmp][mask[:n_cmp]],
                               hist_ref[:n_cmp][mask[:n_cmp]], rtol=1e-6)
    # displacement field parity (measured 2.8e-14 relative on this config)
    np.testing.assert_allclose(np.asarray(u), u_ref.numpy(), rtol=1e-7,
                               atol=1e-11 * np.abs(u_ref.numpy()).max())


def test_f32_solution_within_reference_tolerance(anchor):
    """BASELINE acceptance: the f32 TPU-policy solve lands within f32
    tolerance of the reference's f64 displacement field."""
    coords, conn, N, fixed, F = anchor
    K_t = ref_c3d4_stiffness(coords, conn)
    u_ref, _ = ref_stable_cg(K_t, conn, torch.as_tensor(F), fixed,
                             tol=1e-6, max_iter=2000)
    K = solid.stiffness(jnp.asarray(coords, jnp.float32),
                        jnp.asarray(conn), "c3d4", E, NU)
    plan = ScatterPlan.build(conn, N, 3)
    op = MatrixFreeOperator(K=K, plan=plan)
    cons = Constraints.fixed(N, fixed, 3, dtype=np.float32)
    u, info = cg(op, jnp.asarray(F, jnp.float32), constraints=cons,
                 tol=1e-2, max_iter=4000, dot_dtype=jnp.float64)
    ref = u_ref.numpy()
    err = np.abs(np.asarray(u) - ref).max() / np.abs(ref).max()
    assert err < 5e-4, f"f32 vs reference-f64 relative error {err:.2e}"
