"""Matrix-free operator vs assembled scipy, and the CG family."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse as sp
import scipy.sparse.linalg as spla

from tpufem.elements import solid
from tpufem.ops.operator import MatrixFreeOperator, diagonal_preconditioner
from tpufem.ops.scatter import ScatterPlan, element_dofs
from tpufem.solvers import cg as cgmod
from tpufem.solvers.cg import cg, masked_cg
from tpufem.solvers.constraints import Constraints
from tpufem.utils import meshgen

E, NU = 200.0, 0.3


def _problem(etype="c3d4", n=3):
    if etype == "c3d4":
        coords, conn = meshgen.box_tet(n, n, n)
    else:
        coords, conn = meshgen.box_tet10(n, n, n)
    K = solid.stiffness(jnp.asarray(coords), jnp.asarray(conn), etype, E, NU)
    plan = ScatterPlan.build(conn, coords.shape[0], 3)
    op = MatrixFreeOperator(K=K, plan=plan)
    return coords, conn, K, op


def _assemble_scipy(K, conn, n_nodes):
    K = np.asarray(K)
    dofs = element_dofs(conn, 3)
    M, d = dofs.shape
    rows = np.repeat(dofs, d, axis=1).ravel()
    cols = np.tile(dofs, (1, d)).ravel()
    A = sp.coo_matrix((K.ravel(), (rows, cols)),
                      shape=(n_nodes * 3, n_nodes * 3)).tocsr()
    return A


def test_spmv_matches_scipy():
    coords, conn, K, op = _problem()
    A = _assemble_scipy(K, conn, coords.shape[0])
    rng = np.random.default_rng(0)
    u = rng.standard_normal((coords.shape[0], 3))
    F = np.asarray(op(jnp.asarray(u)))
    np.testing.assert_allclose(F.reshape(-1), A @ u.reshape(-1), rtol=1e-10,
                               atol=1e-10 * np.abs(F).max())


def test_spmv_deterministic_bitwise():
    coords, conn, K, op = _problem()
    u = jnp.asarray(np.random.default_rng(1).standard_normal((coords.shape[0], 3)))
    f = jax.jit(op.__call__)
    F1 = np.asarray(f(u))
    F2 = np.asarray(f(u))
    assert np.array_equal(F1, F2)
    # element order permutation must not change the result beyond fp-assoc:
    # the plan fixes the reduction order via stable sort, so identical input
    # order => identical bits; also check vs unsorted .at[].add reference
    Fref = np.asarray(
        jnp.zeros(coords.shape[0] * 3)
        .at[op.plan.dofs.reshape(-1)]
        .add(jnp.einsum("mij,mj->mi", K, u.reshape(-1)[op.plan.dofs]).reshape(-1))
    )
    np.testing.assert_allclose(F1.reshape(-1), Fref, rtol=1e-12)


def test_diagonal_preconditioner_matches_assembled():
    coords, conn, K, op = _problem()
    A = _assemble_scipy(K, conn, coords.shape[0])
    Minv = np.asarray(diagonal_preconditioner([op]))
    d = A.diagonal()
    np.testing.assert_allclose(Minv.reshape(-1), 1.0 / d, rtol=1e-10)


@pytest.mark.parametrize("use_precond", [False, True])
def test_cg_matches_direct_solve(use_precond):
    coords, conn, K, op = _problem()
    N = coords.shape[0]
    fixed = meshgen.boundary_nodes(coords, axis=2, value=0.0)
    cons = Constraints.fixed(N, fixed, 3)
    b = np.zeros((N, 3))
    top = meshgen.boundary_nodes(coords, axis=2, value=1.0)
    b[top, 0] = 0.01  # shear load on top face
    Minv = jnp.asarray(diagonal_preconditioner([op])) if use_precond else None

    u, info = cg(op, jnp.asarray(b), constraints=cons, M_inv=Minv,
                 tol=1e-12, max_iter=2000)
    assert int(info.status) == cgmod.CONVERGED

    # direct reference: eliminate fixed DOFs
    A = _assemble_scipy(K, conn, N).tolil()
    mask = np.ones(N * 3, bool)
    for n in fixed:
        mask[3 * n:3 * n + 3] = False
    Ared = A.tocsr()[mask][:, mask]
    bred = b.reshape(-1)[mask]
    ured = spla.spsolve(Ared.tocsc(), bred)
    u_full = np.zeros(N * 3)
    u_full[mask] = ured
    np.testing.assert_allclose(np.asarray(u).reshape(-1), u_full,
                               rtol=1e-6, atol=1e-9 * np.abs(u_full).max())


def test_cg_residual_history_monotone_tail():
    coords, conn, K, op = _problem()
    N = coords.shape[0]
    fixed = meshgen.boundary_nodes(coords, axis=2, value=0.0)
    cons = Constraints.fixed(N, fixed, 3)
    b = np.zeros((N, 3))
    b[meshgen.boundary_nodes(coords, axis=2, value=1.0), 2] = 1.0
    u, info = cg(op, jnp.asarray(b), constraints=cons, tol=1e-10, max_iter=500)
    h = np.asarray(info.history)
    it = int(info.iterations)
    assert np.isfinite(h[: it + 1]).all()
    assert h[it] < 1e-10


def test_masked_cg_matches_indexed_cg():
    coords, conn, K, op = _problem()
    N = coords.shape[0]
    fixed = meshgen.boundary_nodes(coords, axis=2, value=0.0)
    cons = Constraints.fixed(N, fixed, 3)
    mask = np.ones((N, 3))
    mask[fixed] = 0.0
    b = np.zeros((N, 3))
    b[meshgen.boundary_nodes(coords, axis=2, value=1.0), 1] = 0.5
    u1, _ = cg(op, jnp.asarray(b), constraints=cons, tol=1e-12, max_iter=2000)
    u2, _ = masked_cg(op, jnp.asarray(b), jnp.asarray(mask), tol=1e-12,
                      max_iter=2000)
    np.testing.assert_allclose(np.asarray(u1), np.asarray(u2), rtol=1e-8,
                               atol=1e-12)


def test_cg_with_spc_values_and_rbe2():
    """Prescribed displacement via SPC + RBE2 master-slave coupling."""
    coords, conn, K, op = _problem()
    N = coords.shape[0]
    bottom = meshgen.boundary_nodes(coords, axis=2, value=0.0)
    top = meshgen.boundary_nodes(coords, axis=2, value=1.0)
    spc = [{"node": int(n), "dofs": [0, 1, 2], "value": 0.0} for n in bottom]
    spc += [{"node": int(n), "dofs": [2], "value": 0.01} for n in top]
    cons = Constraints.build(N, 3, spc_list=spc)
    b = jnp.zeros((N, 3))
    u, info = cg(op, b, constraints=cons, tol=1e-12, max_iter=3000)
    u = np.asarray(u)
    np.testing.assert_allclose(u[top, 2], 0.01, atol=1e-12)
    np.testing.assert_allclose(u[bottom], 0.0, atol=1e-12)
    # interior stretches roughly linearly in z
    mid = np.nonzero(np.abs(coords[:, 2] - 2 / 3) < 1e-9)[0]
    assert np.all(u[mid, 2] > 0.004) and np.all(u[mid, 2] < 0.009)

    # rbe2: slave copies master
    master = int(top[0])
    slaves = [int(n) for n in top[1:3]]
    cons2 = Constraints.build(
        N, 3,
        spc_list=[{"node": int(n), "dofs": [0, 1, 2], "value": 0.0} for n in bottom],
        rbe2_list=[{"master": master, "slaves": slaves, "dofs": [0, 1, 2]}])
    b2 = np.zeros((N, 3))
    b2[master, 2] = 1.0
    u2, _ = cg(op, jnp.asarray(b2), constraints=cons2, tol=1e-10, max_iter=3000)
    u2 = np.asarray(u2)
    for s in slaves:
        np.testing.assert_allclose(u2[s], u2[master], atol=1e-12)


def test_constraints_rbe3_weighted_average():
    N = 10
    cons = Constraints.build(
        N, 3,
        rbe3_list=[{"master": 0, "slaves": [1, 2, 3], "dofs": [0, 1, 2],
                    "weights": [1.0, 2.0, 1.0]}])
    u = np.zeros((N, 3))
    u[1] = [1.0, 0, 0]
    u[2] = [2.0, 1.0, 0]
    u[3] = [3.0, 0, 4.0]
    out = np.asarray(cons.apply_state(jnp.asarray(u)))
    np.testing.assert_allclose(out[0], [(1 + 4 + 3) / 4, 2 / 4, 4 / 4])


def test_packed_and_chunked_scatter_match_sorted(monkeypatch):
    """Packed / chunked+packed combine modes == sorted segment sum."""
    from tpufem.ops import scatter as sc

    coords, conn = meshgen.box_tet(4, 4, 4)
    N = coords.shape[0]
    p1 = ScatterPlan.build(conn, N, 3)                # plain single-level
    assert p1.combine.meta.pack == 1 and not p1.combine.meta.chunked
    # force row packing (table budget below n_rows)
    monkeypatch.setattr(sc, "_TAKE_FAST_ROWS", 200)
    monkeypatch.setattr(sc, "_PACK_ABOVE_ROWS", 200)
    p2 = ScatterPlan.build(conn, N, 3)
    assert p2.combine.meta.pack > 1 and not p2.combine.meta.chunked
    # force chunking + packing + recursive child plan
    monkeypatch.setattr(sc, "_TAKE_FAST_ROWS", 40)
    monkeypatch.setattr(sc, "_MAX_PACK", 2)
    monkeypatch.setattr(sc, "_CHUNK_ABOVE_ROWS", 80)
    p3 = ScatterPlan.build(conn, N, 3)
    assert p3.combine.meta.chunked and p3.combine.child is not None
    Fe = jnp.asarray(np.random.default_rng(0).standard_normal(
        (conn.shape[0], 12)))
    ref = np.asarray(p1.scatter_sorted(Fe))
    for p in (p1, p2, p3):
        y = np.asarray(p.scatter(Fe))
        np.testing.assert_allclose(y, ref, rtol=1e-12)
        assert np.array_equal(y, np.asarray(p.scatter(Fe)))  # deterministic


def test_comp_vdot_accuracy():
    """Double-f32 compensated dot: f64-quality on cancellation-heavy data
    where plain f32 summation loses everything."""
    import jax
    import jax.numpy as jnp
    from tpufem.solvers.cg import comp_vdot
    rng = np.random.default_rng(1)
    n = 1 << 20
    big = rng.standard_normal(n // 2).astype(np.float32) * 1e7
    a = np.concatenate([big, -big]).astype(np.float32)
    a += rng.standard_normal(n).astype(np.float32)
    c = np.ones(n, np.float32)
    ref = float(np.sum(a.astype(np.float64)))
    comp = float(jax.jit(comp_vdot)(jnp.asarray(a, jnp.float32),
                                    jnp.asarray(c, jnp.float32)))
    plain = float(jnp.sum(jnp.asarray(a, jnp.float32)))
    assert abs(plain - ref) / abs(ref) > 1e-2      # plain f32 fails here
    assert abs(comp - ref) / abs(ref) < 1e-6


def test_cg_compensated_dots_match_f64():
    """cg(dot_dtype='compensated') follows the f64-dot trajectory in f32
    storage (the TPU wide-scalar policy where x64 cannot reach Mosaic)."""
    import jax.numpy as jnp
    from tpufem.elements import solid
    from tpufem.ops.operator import MatrixFreeOperator
    from tpufem.ops.scatter import ScatterPlan
    from tpufem.solvers.cg import cg
    from tpufem.solvers.constraints import Constraints
    from tpufem.utils import meshgen
    coords, conn = meshgen.box_tet(3, 3, 6, 1.0, 1.0, 2.0)
    N = coords.shape[0]
    K = solid.stiffness(jnp.asarray(coords, jnp.float32),
                        jnp.asarray(conn), "c3d4", 200e9, 0.3)
    op = MatrixFreeOperator(K=K, plan=ScatterPlan.build(conn, N, 3))
    fixed = meshgen.boundary_nodes(coords, 2, 0.0)
    cons = Constraints.fixed(N, fixed, 3, dtype=np.float32)
    b = np.zeros((N, 3), np.float32)
    b[meshgen.boundary_nodes(coords, 2, 2.0), 0] = 1e3
    u1, i1 = cg(op, jnp.asarray(b), constraints=cons, tol=1e-3,
                max_iter=2000, dot_dtype=jnp.float64)
    u2, i2 = cg(op, jnp.asarray(b), constraints=cons, tol=1e-3,
                max_iter=2000, dot_dtype="compensated")
    assert int(i1.status) == 1 and int(i2.status) == 1
    assert abs(int(i1.iterations) - int(i2.iterations)) <= 5
    np.testing.assert_allclose(np.asarray(u2), np.asarray(u1), rtol=2e-3,
                               atol=1e-5 * np.abs(np.asarray(u1)).max())
