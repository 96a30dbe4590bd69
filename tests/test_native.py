"""Native C++ mesh-ops: exact agreement with the numpy fallback paths."""
import numpy as np
import pytest

from tpufem import native
from tpufem.ops.scatter import ScatterPlan, element_dofs
from tpufem.parallel import partition as part_mod
from tpufem.topology import edges, faces
from tpufem.utils import meshgen

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native toolchain unavailable")


def _with_native_disabled(fn):
    import tpufem.native as nat
    lib, tried = nat._LIB, nat._TRIED
    nat._LIB, nat._TRIED = None, True
    try:
        return fn()
    finally:
        nat._LIB, nat._TRIED = lib, tried


@pytest.mark.parametrize("etype,mesh", [
    ("c3d4", lambda: meshgen.box_tet(3, 3, 3)),
    ("c3d8", lambda: meshgen.box_hex(3, 2, 2)),
    ("c3d6", lambda: meshgen.box_wedge(2, 2, 3)),
])
def test_boundary_and_shared_faces_match_numpy(etype, mesh):
    coords, conn = mesh()
    nat_b = faces.boundary_faces(conn, etype)
    np_b = _with_native_disabled(lambda: faces.boundary_faces(conn, etype))
    for kind in np_b:
        np.testing.assert_array_equal(nat_b[kind][0], np_b[kind][0])
        np.testing.assert_array_equal(nat_b[kind][1], np_b[kind][1])
    nat_s = faces.shared_faces(conn, etype)
    np_s = _with_native_disabled(lambda: faces.shared_faces(conn, etype))
    np.testing.assert_array_equal(nat_s, np_s)


def test_radix_argsort_matches_stable_argsort():
    rng = np.random.default_rng(0)
    keys = rng.integers(0, 1 << 20, size=100000).astype(np.int32)
    perm = native.radix_argsort(keys)
    ref = np.argsort(keys, kind="stable")
    np.testing.assert_array_equal(perm, ref)


def test_scatter_plan_same_with_and_without_native():
    coords, conn = meshgen.box_tet(3, 3, 3)
    p1 = ScatterPlan.build(conn, coords.shape[0], 3)
    p2 = _with_native_disabled(
        lambda: ScatterPlan.build(conn, coords.shape[0], 3))
    np.testing.assert_array_equal(np.asarray(p1.perm), np.asarray(p2.perm))
    np.testing.assert_array_equal(np.asarray(p1.segments),
                                  np.asarray(p2.segments))


def test_unique_edges_match():
    coords, conn = meshgen.box_tet(2, 2, 2)
    e1 = edges.element_to_edge(conn, "c3d4")
    e2 = _with_native_disabled(lambda: edges.element_to_edge(conn, "c3d4"))
    np.testing.assert_array_equal(e1, e2)


def test_region_growing_matches_python():
    coords, conn = meshgen.box_tet(3, 3, 3)
    l1, s1 = part_mod.partition_elements(conn, "c3d4", 4, seed=0)
    l2, s2 = _with_native_disabled(
        lambda: part_mod.partition_elements(conn, "c3d4", 4, seed=0))
    np.testing.assert_array_equal(s1, s2)
    np.testing.assert_array_equal(l1, l2)


def test_native_speedup_on_larger_mesh():
    """Native face extraction should beat numpy unique comfortably."""
    import time
    coords, conn = meshgen.box_tet(12, 12, 12)  # ~10k elems x 4 faces
    t0 = time.perf_counter()
    faces.shared_faces(conn, "c3d4")
    t_nat = time.perf_counter() - t0
    t0 = time.perf_counter()
    _with_native_disabled(lambda: faces.shared_faces(conn, "c3d4"))
    t_np = time.perf_counter() - t0
    # don't be strict in CI noise; just require it's not slower than numpy x2
    assert t_nat < t_np * 2
