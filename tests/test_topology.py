"""Topology layer: boundary faces, normals, shared faces, edges, conversion."""
import numpy as np
import pytest

from tpufem.elements import solid
from tpufem.topology import convert, diagnostics, edges, faces
from tpufem.utils import meshgen
import jax.numpy as jnp


def test_tet_invariant_2S_plus_K():
    """2*S + K = 4*M (reference doc invariant, solver/element.py:5)."""
    coords, conn = meshgen.box_tet(3, 3, 3)
    M = conn.shape[0]
    K = faces.boundary_faces(conn, "c3d4")["tri"][0].shape[0]
    S = faces.shared_faces(conn, "c3d4").shape[0]
    assert 2 * S + K == 4 * M


def test_boundary_faces_count_unit_cube():
    # 3x3x3 box: each cube face has 3*3 squares x 2 tris = 18 tris, 6 faces
    coords, conn = meshgen.box_tet(3, 3, 3)
    tri, opp = faces.boundary_faces(conn, "c3d4")["tri"]
    assert tri.shape[0] == 6 * 9 * 2
    # all boundary nodes lie on the cube surface
    on_surf = np.any((np.abs(coords) < 1e-12) | (np.abs(coords - 1) < 1e-12),
                     axis=1)
    assert on_surf[tri.reshape(-1)].all()
    # opposite nodes are interior to the element, never on that face
    assert not np.any(opp[:, None] == tri)


def test_outward_normals_unit_cube():
    coords, conn = meshgen.box_tet(2, 2, 2)
    tri, n = faces.outward_surface_normals(coords, conn, "c3d4")["tri"]
    centers = coords[tri].mean(axis=1)
    # outward normal points away from the cube center
    to_out = centers - 0.5
    assert (np.einsum("kd,kd->k", n, to_out) > 0).all()
    np.testing.assert_allclose(np.linalg.norm(n, axis=1), 1.0, atol=1e-12)


@pytest.mark.parametrize("etype,mesh", [
    ("c3d4", lambda: meshgen.box_tet(2, 2, 2)),
    ("c3d8", lambda: meshgen.box_hex(2, 2, 2)),
    ("c3d6", lambda: meshgen.box_wedge(2, 2, 2)),
])
def test_face_normals_area_closed_surface(etype, mesh):
    """Per-element area vectors of a closed polyhedron sum to zero, and
    boundary areas sum to the cube surface area."""
    coords, conn = mesh()
    na = faces.face_normals_area(coords, conn, etype)
    total = sum(n.sum(axis=1) for n in na.values())
    np.testing.assert_allclose(total, 0.0, atol=1e-12)


def test_shared_faces_pair_consistency():
    coords, conn = meshgen.box_tet(2, 2, 2)
    sf = faces.shared_faces(conn, "c3d4")
    # the two (element, face) entries must reference the same node set
    for k in range(min(sf.shape[0], 50)):
        (e1, f1), (e2, f2) = sf[k]
        face1 = np.sort(conn[e1][faces.TET_FACES[f1]])
        face2 = np.sort(conn[e2][faces.TET_FACES[f2]])
        np.testing.assert_array_equal(face1, face2)
    assert not np.any(sf[:, 0, 0] == sf[:, 1, 0])


def test_element_dual_graph_counts():
    coords, conn = meshgen.box_tet(2, 2, 2)
    g = faces.element_dual_graph(conn, "c3d4")
    S = faces.shared_faces(conn, "c3d4").shape[0]
    assert g.shape == (2, S)


def test_node_curvatures_sphere_like():
    coords, conn = meshgen.box_tet(2, 2, 2)
    curv = faces.node_curvatures(coords, conn, "c3d4")
    # interior nodes have zero curvature (no boundary faces)
    interior = np.all((coords > 1e-12) & (coords < 1 - 1e-12), axis=1)
    np.testing.assert_allclose(curv[interior], 0.0, atol=1e-12)
    # corner node at origin: mean of normals points outward (negative octant)
    corner = np.nonzero(np.all(np.abs(coords) < 1e-12, axis=1))[0][0]
    assert (curv[corner] < 0).all()


def test_element_to_edge_counts():
    coords, conn = meshgen.box_tet(1, 1, 1)
    e = edges.element_to_edge(conn, "c3d4")
    assert e.shape[0] == 2
    # unit cube Kuhn: 8 corners, edges = 12 cube edges + 6 face diagonals + 1 body = 19
    assert e.shape[1] == 19
    assert (e[0] < e[1]).all()


def test_shell_shared_and_boundary_edges():
    coords, quads = meshgen.grid_quad(3, 2)
    se = edges.shared_edges(quads, "s4")
    be, opp = edges.boundary_edges(quads, "s4")
    # 3x2 grid: interior edges = 2*3 + 1*... horizontal: 3 cols * 1 interior
    # rows? count: total edges = 3*2*4/..; easier: Euler-ish check
    total_edges = (3 + 1) * 2 + (2 + 1) * 3  # vertical + horizontal = 17
    assert se.shape[0] + be.shape[0] == total_edges
    assert be.shape[0] == 2 * (3 + 2)
    coords_t, tris = meshgen.grid_tri(2, 2)
    se3 = edges.shared_edges(tris, "s3")
    be3, _ = edges.boundary_edges(tris, "s3")
    assert be3.shape[0] == 8
    assert se3.shape[0] == (2 * (2 + 1) * 2 + 4) - 8  # all edges minus boundary... sanity
    assert (se3.shape[0] + be3.shape[0]) == 16


@pytest.mark.parametrize("etype,mesh,n_sub", [
    ("c3d10", lambda: meshgen.box_tet10(1, 1, 1), 8),
    ("c3d8", lambda: meshgen.box_hex(1, 1, 2), 6),
    ("c3d6", lambda: meshgen.box_wedge(1, 1, 2), 3),
])
def test_to_c3d4_volume_preserved(etype, mesh, n_sub):
    coords, conn = mesh()
    tets = convert.to_c3d4(conn, etype)
    assert tets.shape == (conn.shape[0] * n_sub, 4)
    p = coords[tets]
    vols = np.abs(np.linalg.det(p[:, 1:4] - p[:, 0:1])) / 6.0
    np.testing.assert_allclose(vols.sum(), 1.0, rtol=1e-10)


def test_c3d4_to_c3d10_roundtrip_and_sets():
    coords, conn = meshgen.box_tet(2, 2, 2)
    rbe2 = meshgen.boundary_nodes(coords, axis=2, value=0.0)
    nc, nconn, rbe2_new, rbe3_new = convert.c3d4_to_c3d10(coords, conn,
                                                          rbe2_ids=rbe2)
    assert nconn.shape[1] == 10
    # midside nodes are midpoints of their edges
    mid = nc[nconn[:, 4]]
    np.testing.assert_allclose(mid, (nc[nconn[:, 0]] + nc[nconn[:, 1]]) / 2)
    # volume preserved under c3d10 kernel
    V = np.asarray(solid.volumes(jnp.asarray(nc), jnp.asarray(nconn),
                                 etype="c3d10"))
    np.testing.assert_allclose(V.sum(), 1.0, rtol=1e-10)
    # propagated rbe2: all new members sit at z=0
    assert rbe2_new.shape[0] > rbe2.shape[0]
    np.testing.assert_allclose(nc[rbe2_new][:, 2], 0.0, atol=1e-12)
    assert rbe3_new is None


def test_shell_extrude():
    coords, quads = meshgen.grid_quad(2, 2)
    coords2, tris = meshgen.grid_tri(2, 2)
    c3, wedges, hexes = convert.shell_extrude(coords, tri=None, quad=quads,
                                              thickness=0.1)
    assert hexes.shape == (4, 8) and wedges.shape == (0, 6)
    # flat plate: top/bottom offset by +-0.05 in z
    N = coords.shape[0]
    np.testing.assert_allclose(np.abs(c3[:N, 2]), 0.05, atol=1e-12)
    np.testing.assert_allclose(c3[N:, 2] - c3[:N, 2], 0.1, atol=1e-12)
    V = np.asarray(solid.volumes(jnp.asarray(c3), jnp.asarray(hexes),
                                 etype="c3d8"))
    np.testing.assert_allclose(V.sum(), 0.1, rtol=1e-6)  # eps in normal avg


def test_force_balance_diagnostics():
    """Uniform stress field: interior-face force residual is exactly zero."""
    coords, conn = meshgen.box_tet(2, 2, 2)
    A = np.array([[1e-3, 2e-4, 0], [2e-4, -1e-3, 1e-4], [0, 1e-4, 5e-4]])
    u = coords @ A.T
    tens, _ = solid.element_stress(jnp.asarray(coords), jnp.asarray(conn),
                                   jnp.asarray(u), "c3d4", 200.0, 0.3)
    ff = diagnostics.element_face_forces(coords, conn, "c3d4",
                                         np.asarray(tens))
    res = diagnostics.shared_face_force_residual(conn, "c3d4", ff)
    np.testing.assert_allclose(res, 0.0, atol=1e-10)
    # and every element is itself in equilibrium (closed surface):
    np.testing.assert_allclose(ff.sum(axis=1), 0.0, atol=1e-10)
