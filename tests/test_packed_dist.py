"""Distributed packed-layout operator vs the single-device packed op."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpufem.ops.packed import PackedPartialOperator
from tpufem.parallel.dist import make_mesh_1d
from tpufem.parallel.packed_dist import (PackedDistPartition, PackedHaloFEM,
                                         build_packed_halo_fem)
from tpufem.utils import meshgen

E, NU = 200e9, 0.3


def _curve(coords):
    c = coords.copy()
    c[:, 0] += 0.05 * np.sin(2.0 * c[:, 1]) * c[:, 2]
    return c


@pytest.mark.parametrize("n_parts", [2, 8])
def test_packed_dist_spmv_matches_single(n_parts):
    coords, conn = meshgen.box_tet10(4, 4, 6)
    coords = _curve(coords)
    N = coords.shape[0]
    mesh = make_mesh_1d(n_parts)
    fem, part = build_packed_halo_fem(coords, conn, "c3d10", E, NU,
                                      mesh=mesh, precondition=False)
    # single-device packed operator with the SAME (unbucketed) plan order
    op1 = PackedPartialOperator.build(jnp.asarray(coords), conn, "c3d10",
                                      E, NU, n_nodes=N, interpret=True,
                                      window_buckets=0)
    u = np.random.default_rng(0).standard_normal((N, 3))
    F1 = np.asarray(op1.plan.unpack(op1(op1.plan.pack(jnp.asarray(u)))))
    X = jnp.asarray(part.pack_np(u))
    F = part.unpack_np(np.asarray(fem.spmv(X)))
    # same per-cluster math, same fixed pull-order combine; the two are
    # different XLA programs (geometry computed in different batch
    # paddings), so allow fp reassociation roundoff
    np.testing.assert_allclose(F, F1, rtol=1e-12,
                               atol=1e-13 * np.abs(F1).max())


def test_packed_dist_spmv_deterministic():
    coords, conn = meshgen.box_tet10(3, 3, 6)
    mesh = make_mesh_1d(4)
    fem, part = build_packed_halo_fem(coords, conn, "c3d10", E, NU,
                                      mesh=mesh, precondition=False)
    u = np.random.default_rng(1).standard_normal((coords.shape[0], 3))
    X = jnp.asarray(part.pack_np(u))
    F1 = np.asarray(fem.spmv(X))
    F2 = np.asarray(fem.spmv(X))
    np.testing.assert_array_equal(F1, F2)


def test_packed_dist_interior_split_nontrivial():
    """Interior clusters exist and their windows index OWNED blocks only."""
    coords, conn = meshgen.box_tet10(6, 6, 12)
    part = PackedDistPartition.build(coords, conn, "c3d10", E, NU, 2)
    m = part.meta
    assert m.interior_cut > 0
    win = np.asarray(part.win_nodes)[:, : m.interior_cut]
    # local-ext ids < Nbp are owned; the pad value Nbp+Gx reads a zero row
    assert ((win < m.Nbp) | (win == m.Nbp + m.Gx)).all()


def test_packed_dist_block_jacobi():
    """Distributed block-Jacobi PCG: same solution, <= iterations vs the
    distributed scalar Jacobi, and the block planes match the
    single-device operator's."""
    from tpufem.ops.packed import BlockJacobi
    coords, conn = meshgen.box_tet10(3, 3, 6, 1.0, 1.0, 2.0)
    N = coords.shape[0]
    fixed = meshgen.boundary_nodes(coords, 2, 0.0)
    b = np.zeros((N, 3))
    b[meshgen.boundary_nodes(coords, 2, 2.0), 0] = 1e3
    mesh = make_mesh_1d(4)
    fem_j, part = build_packed_halo_fem(coords, conn, "c3d10", E, NU,
                                        mesh=mesh, fixed_nodes=fixed,
                                        precondition="jacobi")
    fem_b, _ = build_packed_halo_fem(coords, conn, "c3d10", E, NU,
                                     mesh=mesh, fixed_nodes=fixed,
                                     precondition="block")
    bX = jnp.asarray(part.pack_np(b))
    u_j, info_j = fem_j.pcg(bX, tol=1e-8, max_iter=4000)
    u_b, info_b = fem_b.pcg(bX, tol=1e-8, max_iter=4000)
    assert int(info_j.status) == 1 and int(info_b.status) == 1
    assert int(info_b.iterations) <= int(info_j.iterations)
    np.testing.assert_allclose(part.unpack_np(np.asarray(u_b)),
                               part.unpack_np(np.asarray(u_j)), rtol=1e-4,
                               atol=1e-7 * np.abs(np.asarray(u_j)).max())
    # distributed block planes == single-device BlockJacobi's (unpacked)
    op1 = PackedPartialOperator.build(jnp.asarray(coords), conn, "c3d10",
                                      E, NU, n_nodes=N, interpret=True)
    mask_n = np.ones((N, 3))
    mask_n[fixed] = 0.0
    bj = BlockJacobi.build(op1, mask=op1.plan.pack(jnp.asarray(mask_n)))
    inv_d, inv_o = fem_b.M_inv
    np.testing.assert_allclose(
        part.unpack_np(np.asarray(inv_d)),
        np.asarray(op1.plan.unpack(bj.inv_d)), rtol=1e-9, atol=1e-24)
    np.testing.assert_allclose(
        part.unpack_np(np.asarray(inv_o)),
        np.asarray(op1.plan.unpack(bj.inv_o)), rtol=1e-9,
        atol=1e-12 * np.abs(np.asarray(bj.inv_o)).max())


def test_packed_dist_pcg_matches_dense_reference():
    from tpufem.elements import solid
    from tpufem.ops.operator import MatrixFreeOperator
    from tpufem.ops.scatter import ScatterPlan
    from tpufem.solvers.cg import cg
    from tpufem.solvers.constraints import Constraints

    coords, conn = meshgen.box_tet10(3, 3, 6, 1.0, 1.0, 2.0)
    N = coords.shape[0]
    fixed = meshgen.boundary_nodes(coords, 2, 0.0)
    b = np.zeros((N, 3))
    b[meshgen.boundary_nodes(coords, 2, 2.0), 0] = 1e3

    mesh = make_mesh_1d(8)
    fem, part = build_packed_halo_fem(coords, conn, "c3d10", E, NU,
                                      mesh=mesh, fixed_nodes=fixed)
    bX = jnp.asarray(part.pack_np(b))
    uX, info = fem.pcg(bX, tol=1e-8, max_iter=4000)
    assert int(info.status) == 1
    u = part.unpack_np(np.asarray(uX))

    K = solid.stiffness(jnp.asarray(coords), jnp.asarray(conn), "c3d10",
                        E, NU)
    op = MatrixFreeOperator(K=K, plan=ScatterPlan.build(conn, N, 3))
    cons = Constraints.fixed(N, fixed, 3, dtype=np.float64)
    d = op.diagonal().reshape(N, 3)
    Minv = jnp.where(jnp.abs(d) > 0, 1.0 / d, 0.0)
    u_ref, _ = cg(op, jnp.asarray(b), constraints=cons, M_inv=Minv,
                  tol=1e-8, max_iter=4000)
    np.testing.assert_allclose(u, np.asarray(u_ref), rtol=1e-5,
                               atol=1e-8 * np.abs(np.asarray(u_ref)).max())
