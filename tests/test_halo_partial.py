"""Distributed partial-assembly (geometry-factor) halo operator."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpufem.elements import solid
from tpufem.ops.operator import MatrixFreeOperator
from tpufem.ops.scatter import ScatterPlan
from tpufem.parallel.dist import make_mesh_1d
from tpufem.parallel.halo_partial import (HaloPartialPartition,
                                          build_halo_partial_fem)
from tpufem.solvers.cg import cg
from tpufem.solvers.constraints import Constraints
from tpufem.utils import meshgen

E, NU = 200e9, 0.3


def _curve(coords):
    c = coords.copy()
    c[:, 0] += 0.04 * np.sin(2.0 * c[:, 1]) * c[:, 2]
    return c


@pytest.mark.parametrize("etype,mesh,distort", [
    ("c3d10", lambda: meshgen.box_tet10(3, 3, 4), False),
    ("c3d10", lambda: meshgen.box_tet10(3, 3, 4), True),
    ("c3d4", lambda: meshgen.box_tet(5, 4, 4), False),
])
def test_halo_partial_spmv_matches_single(etype, mesh, distort):
    coords, conn = mesh()
    if distort:
        coords = _curve(coords)
    N = coords.shape[0]
    dmesh = make_mesh_1d(8)
    fem, part = build_halo_partial_fem(coords, conn, etype, E, NU,
                                       mesh=dmesh, precondition=False)

    K = solid.stiffness(jnp.asarray(coords), jnp.asarray(conn), etype, E, NU)
    op = MatrixFreeOperator(K=K, plan=ScatterPlan.build(conn, N, 3))
    u = np.random.default_rng(0).standard_normal((N, 3))
    F_ref = np.asarray(op(jnp.asarray(u)))
    u_new = part.to_new(jnp.asarray(u))
    F = np.asarray(part.to_old(fem.spmv(u_new)))
    np.testing.assert_allclose(F, F_ref, rtol=1e-9,
                               atol=1e-11 * np.abs(F_ref).max())


def test_halo_partial_pcg_matches_single():
    coords, conn = meshgen.box_tet10(3, 3, 4)
    N = coords.shape[0]
    fixed = meshgen.boundary_nodes(coords, 2, 0.0)
    b = np.zeros((N, 3))
    b[meshgen.boundary_nodes(coords, 2, 4.0 / 3.0), 0] = 1e3

    dmesh = make_mesh_1d(8)
    fem, part = build_halo_partial_fem(coords, conn, "c3d10", E, NU,
                                       mesh=dmesh, fixed_nodes=fixed)
    b_new = part.to_new(jnp.asarray(b))
    u_new, info = fem.pcg(b_new, tol=1e-9, max_iter=3000,
                          dot_dtype=jnp.float64)
    assert int(info.status) == 1
    u = np.asarray(part.to_old(u_new))

    K = solid.stiffness(jnp.asarray(coords), jnp.asarray(conn), "c3d10",
                        E, NU)
    op = MatrixFreeOperator(K=K, plan=ScatterPlan.build(conn, N, 3))
    cons = Constraints.fixed(N, fixed, 3, dtype=np.float64)
    d = op.diagonal().reshape(N, 3)
    Minv = jnp.where(jnp.abs(d) > 0, 1.0 / d, 0.0)
    u_ref, _ = cg(op, jnp.asarray(b), constraints=cons, M_inv=Minv,
                  tol=1e-9, max_iter=3000)
    np.testing.assert_allclose(u, np.asarray(u_ref), rtol=1e-6,
                               atol=1e-9 * np.abs(np.asarray(u_ref)).max())


def test_halo_partial_deterministic_and_partcount_stable():
    coords, conn = meshgen.box_tet10(3, 3, 4)
    N = coords.shape[0]
    u = np.random.default_rng(1).standard_normal((N, 3))
    outs = {}
    for nparts in (2, 8):
        dmesh = make_mesh_1d(nparts)
        fem, part = build_halo_partial_fem(coords, conn, "c3d10", E, NU,
                                           mesh=dmesh, precondition=False)
        u_new = part.to_new(jnp.asarray(u))
        F1 = np.asarray(part.to_old(fem.spmv(u_new)))
        F2 = np.asarray(part.to_old(fem.spmv(u_new)))
        np.testing.assert_array_equal(F1, F2)      # bitwise across runs
        outs[nparts] = F1
    np.testing.assert_allclose(outs[2], outs[8], rtol=1e-10,
                               atol=1e-12 * np.abs(outs[8]).max())


def test_halo_partial_memory_model():
    """The partition never materializes element stiffness: per-part state
    is geometry factors only (qJ*9 + q floats per element)."""
    coords, conn = meshgen.box_tet10(3, 3, 4)
    from tpufem.parallel.partition import partition_elements
    labels, _ = partition_elements(conn, "c3d10", 4, 0)
    part = HaloPartialPartition.build(coords, conn, "c3d10", E, NU,
                                      labels, 4)
    m = part.meta
    assert part.Jinv.shape == (4, m.elems_per_part, m.n_qj, 9)
    assert m.n_qj == 1   # straight-sided tet10 promotes to affine
    assert part.W.shape == (4, m.elems_per_part, m.n_q)
    bytes_per_elem = (m.n_qj * 9 + m.n_q) * part.W.dtype.itemsize
    assert bytes_per_elem <= 160


def test_halo_partial_hierarchical_2level():
    """2-level (hosts x chips) mesh: hierarchical partition + (dcn, ici)
    axes + DCN-separated exchange rounds match the single-device op."""
    from tpufem.parallel.dist import make_mesh_2d
    coords, conn = meshgen.box_tet10(3, 3, 4)
    N = coords.shape[0]
    dmesh = make_mesh_2d((2, 4))
    fem, part = build_halo_partial_fem(coords, conn, "c3d10", E, NU,
                                       mesh=dmesh, part_shape=(2, 4),
                                       precondition=False)
    m = part.meta
    assert m.part_shape == (2, 4) and m.n_parts == 8
    # round structure: each round is a partial permutation, DCN first
    host = lambda p: p // 4  # noqa: E731
    kinds = []
    for prs in m.rounds:
        srcs = [s for s, _ in prs]
        dsts = [d for _, d in prs]
        assert len(set(srcs)) == len(srcs) and len(set(dsts)) == len(dsts)
        kind = {host(s) != host(d) for s, d in prs}
        assert len(kind) == 1            # never mixes DCN and ICI pairs
        kinds.append(kind.pop())
    assert kinds == sorted(kinds, reverse=True)   # DCN rounds first
    assert m.ici_pairs > 0

    K = solid.stiffness(jnp.asarray(coords), jnp.asarray(conn), "c3d10",
                        E, NU)
    op = MatrixFreeOperator(K=K, plan=ScatterPlan.build(conn, N, 3))
    u = np.random.default_rng(2).standard_normal((N, 3))
    F_ref = np.asarray(op(jnp.asarray(u)))
    u_new = part.to_new(jnp.asarray(u))
    F = np.asarray(part.to_old(fem.spmv(u_new)))
    np.testing.assert_allclose(F, F_ref, rtol=1e-9,
                               atol=1e-11 * np.abs(F_ref).max())
    # whole-PCG path compiles and runs on the 2-axis mesh
    fixed = meshgen.boundary_nodes(coords, 2, 0.0)
    fem2, part2 = build_halo_partial_fem(coords, conn, "c3d10", E, NU,
                                         mesh=dmesh, part_shape=(2, 4),
                                         fixed_nodes=fixed)
    b = np.zeros((N, 3))
    b[meshgen.boundary_nodes(coords, 2, 4.0 / 3.0), 0] = 1e3
    u_new2, info = fem2.pcg(part2.to_new(jnp.asarray(b)), tol=1e-9,
                            max_iter=3000, dot_dtype=jnp.float64)
    assert int(info.status) == 1


def test_hierarchical_partition_localizes_dcn_traffic():
    """Host-grouped partitioning ships fewer halo rows over DCN than a
    flat partition mapped onto the same (2, 4) hierarchy."""
    coords, conn = meshgen.box_tet(8, 8, 8)
    from tpufem.parallel.partition import (hierarchical_partition,
                                           partition_elements)
    hier, _ = hierarchical_partition(conn, "c3d4", (2, 4), 0)
    flat, _ = partition_elements(conn, "c3d4", 8, 0)
    ph = HaloPartialPartition.build(coords, conn, "c3d4", E, NU, hier, 8,
                                    part_shape=(2, 4))
    pf = HaloPartialPartition.build(coords, conn, "c3d4", E, NU, flat, 8,
                                    part_shape=(2, 4))
    assert ph.meta.dcn_halo_rows < pf.meta.dcn_halo_rows
    assert set(np.unique(hier)) <= set(range(8))


def test_interior_boundary_split_nontrivial():
    """On a real-size partition the static interior batch is the majority
    of each part's elements (the overlap split has something to overlap)."""
    coords, conn = meshgen.box_tet(10, 10, 10)
    from tpufem.parallel.partition import partition_elements
    labels, _ = partition_elements(conn, "c3d4", 2, 0)
    part = HaloPartialPartition.build(coords, conn, "c3d4", E, NU, labels, 2)
    m = part.meta
    # interior_cut is the MIN over parts; compare against the smallest
    # part (region growing yields unbalanced parts with ragged boundaries)
    min_part = int(np.bincount(labels, minlength=2).min())
    assert m.interior_cut > 0.5 * min_part
    # interior elements reference owned rows only (the no-ghost-dependence
    # property the overlap relies on)
    cl = np.asarray(part.conn_local)[:, : m.interior_cut]
    assert cl.max() < m.block_rows
