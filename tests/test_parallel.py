"""Partitioning + distributed operator/PCG on the 8-device CPU mesh."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpufem.elements import solid
from tpufem.ops.operator import MatrixFreeOperator
from tpufem.ops.scatter import ScatterPlan
from tpufem.parallel import partition as part_mod
from tpufem.parallel.dist import (DistFEM, DistPartition,
                                  build_distributed_fem, make_mesh_1d)
from tpufem.solvers import cg as cgmod
from tpufem.solvers.cg import cg
from tpufem.solvers.constraints import Constraints
from tpufem.topology.faces import element_dual_graph
from tpufem.utils import meshgen

E, NU = 200.0, 0.3


def test_region_growing_covers_and_balances():
    coords, conn = meshgen.box_tet(4, 4, 4)
    M = conn.shape[0]
    labels, seeds = part_mod.partition_elements(conn, "c3d4", 8, seed=0)
    assert labels.shape == (M,)
    assert labels.min() >= 0 and labels.max() == 7
    sizes = np.bincount(labels, minlength=8)
    assert sizes.min() > 0
    # deterministic
    labels2, _ = part_mod.partition_elements(conn, "c3d4", 8, seed=0)
    np.testing.assert_array_equal(labels, labels2)


def test_partition_parts_are_connected():
    coords, conn = meshgen.box_tet(4, 4, 4)
    labels, _ = part_mod.partition_elements(conn, "c3d4", 4, seed=1)
    edge = element_dual_graph(conn, "c3d4")
    import scipy.sparse as sp
    import scipy.sparse.csgraph as csg
    for p in range(4):
        sel = np.nonzero(labels == p)[0]
        remap = -np.ones(conn.shape[0], dtype=np.int64)
        remap[sel] = np.arange(sel.size)
        mask = (labels[edge[0]] == p) & (labels[edge[1]] == p)
        sub = sp.coo_matrix(
            (np.ones(mask.sum()), (remap[edge[0][mask]], remap[edge[1][mask]])),
            shape=(sel.size, sel.size))
        ncomp, _ = csg.connected_components(sub, directed=False)
        assert ncomp == 1, f"part {p} disconnected"


def test_owner_of_nodes():
    coords, conn = meshgen.box_tet(2, 2, 2)
    labels, _ = part_mod.partition_elements(conn, "c3d4", 4, seed=0)
    owner = part_mod.owner_of_nodes(conn, labels, coords.shape[0])
    assert owner.shape == (coords.shape[0],)
    # every node's owner is the min label among its elements
    for n in range(coords.shape[0]):
        elems = np.nonzero((conn == n).any(axis=1))[0]
        assert owner[n] == labels[elems].min()


def test_compute_subdivisions_parity():
    # parity with subdivision.ipynb cell 7 heuristic
    assert part_mod.compute_subdivisions(100000, 10) == 2


@pytest.fixture(scope="module")
def dist_fixture():
    coords, conn = meshgen.box_tet(3, 3, 3)
    N = coords.shape[0]
    fixed = meshgen.boundary_nodes(coords, 2, 0.0)
    fem, part = build_distributed_fem(coords, conn, "c3d4", E, NU,
                                      fixed_nodes=fixed)
    return coords, conn, N, fixed, fem, part


def test_distributed_spmv_matches_single_device(dist_fixture):
    coords, conn, N, fixed, fem, part = dist_fixture
    assert fem.mesh.devices.size == 8
    rng = np.random.default_rng(0)
    u = rng.standard_normal((N, 3))
    u_new = part.to_new(jnp.asarray(u))
    F_new = fem.spmv(u_new)
    F_dist = np.asarray(part.to_old(F_new))

    K = solid.stiffness(jnp.asarray(coords), jnp.asarray(conn), "c3d4", E, NU)
    plan = ScatterPlan.build(conn, N, 3)
    op = MatrixFreeOperator(K=K, plan=plan)
    F_ref = np.asarray(op(jnp.asarray(u)))
    np.testing.assert_allclose(F_dist, F_ref, rtol=1e-10,
                               atol=1e-12 * np.abs(F_ref).max())


def test_distributed_spmv_padding_rows_zero(dist_fixture):
    coords, conn, N, fixed, fem, part = dist_fixture
    u_new = part.to_new(jnp.asarray(np.ones((N, 3))))
    F_new = np.asarray(fem.spmv(u_new))
    pad = np.asarray(part.old_from_new) < 0
    np.testing.assert_allclose(F_new[pad], 0.0, atol=1e-12)


def test_distributed_pcg_matches_single_device(dist_fixture):
    coords, conn, N, fixed, fem, part = dist_fixture
    b = np.zeros((N, 3))
    b[meshgen.boundary_nodes(coords, 2, 1.0), 0] = 0.02
    u_new, info = fem.pcg(part.to_new(jnp.asarray(b)), tol=1e-12,
                          max_iter=2000)
    assert int(info.status) == cgmod.CONVERGED
    u_dist = np.asarray(part.to_old(u_new))

    K = solid.stiffness(jnp.asarray(coords), jnp.asarray(conn), "c3d4", E, NU)
    plan = ScatterPlan.build(conn, N, 3)
    op = MatrixFreeOperator(K=K, plan=plan)
    cons = Constraints.fixed(N, fixed, 3)
    u_ref, info_ref = cg(op, jnp.asarray(b), constraints=cons, tol=1e-12,
                         max_iter=2000)
    np.testing.assert_allclose(u_dist, np.asarray(u_ref), rtol=1e-7,
                               atol=1e-10 * np.abs(np.asarray(u_ref)).max())


def test_distributed_pcg_bitwise_stable(dist_fixture):
    coords, conn, N, fixed, fem, part = dist_fixture
    b = np.zeros((N, 3))
    b[meshgen.boundary_nodes(coords, 2, 1.0), 2] = 1.0
    bn = part.to_new(jnp.asarray(b))
    u1, _ = fem.pcg(bn, tol=1e-10, max_iter=500)
    u2, _ = fem.pcg(bn, tol=1e-10, max_iter=500)
    assert np.array_equal(np.asarray(u1), np.asarray(u2))


def test_distributed_different_part_counts_agree():
    """2-part and 8-part runs agree to fp tolerance (not bitwise)."""
    coords, conn = meshgen.box_tet(2, 2, 4)
    N = coords.shape[0]
    fixed = meshgen.boundary_nodes(coords, 2, 0.0)
    b = np.zeros((N, 3))
    b[meshgen.boundary_nodes(coords, 2, 1.0), 1] = 0.5
    sols = []
    for nparts in (2, 8):
        mesh = make_mesh_1d(nparts)
        fem, part = build_distributed_fem(coords, conn, "c3d4", E, NU,
                                          mesh=mesh, fixed_nodes=fixed)
        u_new, info = fem.pcg(part.to_new(jnp.asarray(b)), tol=1e-12,
                              max_iter=3000)
        assert int(info.status) == cgmod.CONVERGED
        sols.append(np.asarray(part.to_old(u_new)))
    np.testing.assert_allclose(sols[0], sols[1], rtol=1e-8, atol=1e-12)


def test_morton_partition_balance():
    from tpufem.parallel.partition import morton_partition
    from tpufem.utils import meshgen
    coords, conn = meshgen.box_tet(6, 6, 6)
    labels = morton_partition(coords, conn, 7)
    sizes = np.bincount(labels, minlength=7)
    assert labels.shape[0] == conn.shape[0]
    assert sizes.max() - sizes.min() <= 1          # exact balance
    assert sizes.sum() == conn.shape[0]
