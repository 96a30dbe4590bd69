"""Halo-exchange distributed operator vs all-gather DistFEM."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpufem.elements import solid
from tpufem.ops.operator import MatrixFreeOperator
from tpufem.ops.scatter import ScatterPlan
from tpufem.parallel.dist import build_distributed_fem, make_mesh_1d
from tpufem.parallel.halo import build_halo_fem
from tpufem.solvers import cg as cgmod
from tpufem.utils import meshgen

E, NU = 200.0, 0.3


@pytest.fixture(scope="module")
def halo_fixture():
    coords, conn = meshgen.box_tet(3, 3, 3)
    N = coords.shape[0]
    fixed = meshgen.boundary_nodes(coords, 2, 0.0)
    fem, part = build_halo_fem(coords, conn, "c3d4", E, NU,
                               fixed_nodes=fixed)
    return coords, conn, N, fixed, fem, part


def test_halo_spmv_matches_single_device(halo_fixture):
    coords, conn, N, fixed, fem, part = halo_fixture
    rng = np.random.default_rng(0)
    u = rng.standard_normal((N, 3))
    F_new = fem.spmv(part.to_new(jnp.asarray(u)))
    F_halo = np.asarray(part.to_old(F_new))
    op = MatrixFreeOperator(
        K=solid.stiffness(jnp.asarray(coords), jnp.asarray(conn), "c3d4", E, NU),
        plan=ScatterPlan.build(conn, N, 3))
    F_ref = np.asarray(op(jnp.asarray(u)))
    np.testing.assert_allclose(F_halo, F_ref, rtol=1e-10,
                               atol=1e-12 * np.abs(F_ref).max())


def test_halo_pcg_matches_allgather_scheme(halo_fixture):
    coords, conn, N, fixed, fem, part = halo_fixture
    b = np.zeros((N, 3))
    b[meshgen.boundary_nodes(coords, 2, 1.0), 0] = 0.02
    u_new, info = fem.pcg(part.to_new(jnp.asarray(b)), tol=1e-12,
                          max_iter=2000)
    assert int(info.status) == cgmod.CONVERGED
    u_halo = np.asarray(part.to_old(u_new))

    fem2, part2 = build_distributed_fem(coords, conn, "c3d4", E, NU,
                                        fixed_nodes=fixed)
    u2_new, info2 = fem2.pcg(part2.to_new(jnp.asarray(b)), tol=1e-12,
                             max_iter=2000)
    u_ag = np.asarray(part2.to_old(u2_new))
    np.testing.assert_allclose(u_halo, u_ag, rtol=1e-8, atol=1e-12)


def test_halo_traffic_smaller_than_allgather(halo_fixture):
    coords, conn, N, fixed, fem, part = halo_fixture
    m = part.meta
    halo_rows = len(m.rounds) * m.halo_width
    assert halo_rows < m.n_parts * m.block_rows  # less than full vector


def test_halo_deterministic(halo_fixture):
    coords, conn, N, fixed, fem, part = halo_fixture
    b = np.zeros((N, 3))
    b[meshgen.boundary_nodes(coords, 2, 1.0), 2] = 1.0
    bn = part.to_new(jnp.asarray(b))
    u1, _ = fem.pcg(bn, tol=1e-10, max_iter=300)
    u2, _ = fem.pcg(bn, tol=1e-10, max_iter=300)
    assert np.array_equal(np.asarray(u1), np.asarray(u2))
