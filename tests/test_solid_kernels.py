"""Solid element kernel validation: stiffness, mass, stress."""
import jax.numpy as jnp
import numpy as np
import pytest

from tpufem.core.materials import elasticity_matrix
from tpufem.elements import solid, tables
from tpufem.utils import meshgen

E, NU = 200.0, 0.3


def _mesh(etype):
    if etype == "c3d4":
        return meshgen.box_tet(2, 2, 2)
    if etype == "c3d10":
        return meshgen.box_tet10(1, 1, 1)
    if etype == "c3d8":
        return meshgen.box_hex(2, 2, 2)
    if etype == "c3d20":
        return meshgen.hex8_to_hex20(*meshgen.box_hex(1, 1, 2))
    if etype == "c3d6":
        return meshgen.box_wedge(2, 2, 2)
    if etype == "c3d15":
        return meshgen.wedge6_to_wedge15(*meshgen.box_wedge(1, 1, 2))
    raise ValueError(etype)


def _distort(coords, scale=0.08, seed=0):
    """Perturb interior geometry so Jacobians are nontrivial."""
    rng = np.random.default_rng(seed)
    c = coords.copy()
    h = 1.0 / 6.0
    interior = np.all((c > 1e-9) & (c < 1 - 1e-9), axis=1)
    c[interior] += scale * h * rng.standard_normal((interior.sum(), 3))
    return c


ALL = list(tables.SOLID_TYPES)


@pytest.mark.parametrize("etype", ALL)
def test_stiffness_symmetry_and_rigid_body(etype):
    coords, conn = _mesh(etype)
    coords = jnp.asarray(coords)
    conn = jnp.asarray(conn)
    K = np.asarray(solid.stiffness(coords, conn, etype, E, NU))
    # symmetry
    np.testing.assert_allclose(K, np.swapaxes(K, 1, 2), atol=1e-9 * np.abs(K).max())
    # rigid translations and rotations are in the null space
    Xe = np.asarray(coords)[np.asarray(conn)]  # [M,k,3]
    k = Xe.shape[1]
    for t in np.eye(3):
        u = np.tile(t, (K.shape[0], k))
        np.testing.assert_allclose(
            np.einsum("mij,mj->mi", K, u), 0.0, atol=1e-8 * np.abs(K).max())
    # rotation about z: u = omega x X
    omega = np.array([0.3, -0.2, 0.9])
    u_rot = np.cross(omega, Xe).reshape(K.shape[0], -1)
    np.testing.assert_allclose(
        np.einsum("mij,mj->mi", K, u_rot), 0.0, atol=1e-7 * np.abs(K).max())


@pytest.mark.parametrize("etype", ALL)
def test_stiffness_psd(etype):
    coords, conn = _mesh(etype)
    K = np.asarray(solid.stiffness(jnp.asarray(_distort(coords)),
                                   jnp.asarray(conn), etype, E, NU))
    w = np.linalg.eigvalsh(K)
    assert w.min() > -1e-8 * w.max()


@pytest.mark.parametrize("etype", ALL)
def test_isotropic_fast_path_equals_bmat_path(etype):
    coords, conn = _mesh(etype)
    coords = jnp.asarray(_distort(coords))
    conn = jnp.asarray(conn)
    K1 = np.asarray(solid.stiffness(coords, conn, etype, E, NU))
    D = elasticity_matrix(E, NU)
    K2 = np.asarray(solid.stiffness_bmat(coords, conn, etype, D))
    np.testing.assert_allclose(K1, K2, rtol=1e-9, atol=1e-9 * np.abs(K1).max())


@pytest.mark.parametrize("etype", ALL)
def test_volumes(etype):
    coords, conn = _mesh(etype)
    V = np.asarray(solid.volumes(jnp.asarray(coords), jnp.asarray(conn),
                                 etype=etype))
    assert V.min() > 0
    np.testing.assert_allclose(V.sum(), 1.0, rtol=1e-10)


def test_c3d4_stiffness_analytic():
    """Unit right tet vs dense B^T D B V computed independently with numpy."""
    coords = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1]], float)
    conn = np.array([[0, 1, 2, 3]], np.int32)
    K = np.asarray(solid.stiffness(jnp.asarray(coords), jnp.asarray(conn),
                                   "c3d4", E, NU))[0]
    # independent construction
    grads = {0: [-1, -1, -1], 1: [1, 0, 0], 2: [0, 1, 0], 3: [0, 0, 1]}
    B = np.zeros((6, 12))
    for a, node in enumerate([0, 1, 2, 3]):
        gx, gy, gz = grads[node]
        B[0, 3 * a] = gx
        B[1, 3 * a + 1] = gy
        B[2, 3 * a + 2] = gz
        B[3, 3 * a] = gy
        B[3, 3 * a + 1] = gx
        B[4, 3 * a + 1] = gz
        B[4, 3 * a + 2] = gy
        B[5, 3 * a] = gz
        B[5, 3 * a + 2] = gx
    D = elasticity_matrix(E, NU)
    K_ref = (B.T @ D @ B) * (1 / 6)
    np.testing.assert_allclose(K, K_ref, rtol=1e-10, atol=1e-10)


@pytest.mark.parametrize("etype", ALL)
def test_patch_uniform_strain_stress(etype):
    """Linear displacement field -> exact uniform stress on any mesh."""
    coords, conn = _mesh(etype)
    coords = _distort(coords)
    A = np.array([[2e-3, 1e-3, 0.0], [1e-3, -1e-3, 5e-4], [0.0, 5e-4, 3e-3]])
    u = coords @ A.T  # symmetric A => strain = A
    tens, vm = solid.element_stress(jnp.asarray(coords), jnp.asarray(conn),
                                    jnp.asarray(u), etype, E, NU)
    eps_voigt = np.array([A[0, 0], A[1, 1], A[2, 2],
                          2 * A[0, 1], 2 * A[1, 2], 2 * A[0, 2]])
    sig = elasticity_matrix(E, NU) @ eps_voigt
    expected = np.array([[sig[0], sig[3], sig[5]],
                         [sig[3], sig[1], sig[4]],
                         [sig[5], sig[4], sig[2]]])
    np.testing.assert_allclose(np.asarray(tens),
                               np.broadcast_to(expected, tens.shape),
                               rtol=1e-8, atol=1e-8 * np.abs(sig).max())


@pytest.mark.parametrize("etype", ALL)
def test_mass_total_and_lumped(etype):
    coords, conn = _mesh(etype)
    rho = 7.8
    Mc = np.asarray(solid.mass(jnp.asarray(coords), jnp.asarray(conn), etype, rho))
    # total mass per coordinate direction = rho * total volume
    np.testing.assert_allclose(Mc.sum() / 3, rho * 1.0, rtol=1e-9)
    np.testing.assert_allclose(Mc, np.swapaxes(Mc, 1, 2), atol=1e-12 * np.abs(Mc).max())
    Ml = np.asarray(solid.lumped_mass(jnp.asarray(coords), jnp.asarray(conn),
                                      etype, rho))
    assert Ml.min() > 0
    np.testing.assert_allclose(Ml.sum() / 3, rho * 1.0, rtol=1e-9)


def test_stiffness_matches_reference_formula_c3d8():
    """Cross-check c3d8 against a hand-rolled per-element numpy pipeline
    mirroring the reference loop structure (solver/element.py:1754-1803)."""
    coords, conn = _mesh("c3d8")
    coords = _distort(coords, scale=0.15, seed=4)
    K = np.asarray(solid.stiffness(jnp.asarray(coords), jnp.asarray(conn),
                                   "c3d8", E, NU))
    pts, wts = tables.quadrature("c3d8")
    D = elasticity_matrix(E, NU)
    Xe = coords[conn]
    K_ref = np.zeros_like(K)
    for q in range(8):
        _, dN = tables.shape_values("c3d8", pts[q:q + 1])
        dN = dN[0]  # [8,3]
        J = np.einsum("ka,mkb->mab", dN, Xe)
        detJ = np.linalg.det(J)
        g = np.einsum("mij,kj->mki", np.linalg.inv(J), dN)  # [M,8,3]
        B = np.zeros((K.shape[0], 6, 24))
        for i in range(8):
            gx, gy, gz = g[:, i, 0], g[:, i, 1], g[:, i, 2]
            B[:, 0, 3 * i] = gx
            B[:, 1, 3 * i + 1] = gy
            B[:, 2, 3 * i + 2] = gz
            B[:, 3, 3 * i] = gy
            B[:, 3, 3 * i + 1] = gx
            B[:, 4, 3 * i + 1] = gz
            B[:, 4, 3 * i + 2] = gy
            B[:, 5, 3 * i] = gz
            B[:, 5, 3 * i + 2] = gx
        K_ref += np.einsum("mri,rs,msj->mij", B, D, B) * (wts[q] * detJ)[:, None, None]
    np.testing.assert_allclose(K, K_ref, rtol=1e-9, atol=1e-9 * np.abs(K).max())


@pytest.mark.parametrize("etype,mesh", [
    ("c3d10", lambda: meshgen.box_tet10(2, 2, 2)),
    ("c3d8", lambda: meshgen.box_hex(2, 2, 3)),
    ("c3d6", lambda: meshgen.box_wedge(2, 2, 2)),
])
def test_stiffness_isotropic_closed_form(etype, mesh):
    """The no-B closed form == B^T D B for isotropic D (exact identity)."""
    coords, conn = mesh()
    c = coords.copy()
    c[:, 0] += 0.04 * np.sin(2.0 * c[:, 1]) * c[:, 2]
    K_new = np.asarray(solid.stiffness_isotropic(
        jnp.asarray(c), jnp.asarray(conn), etype, E, NU))
    K_ref = np.asarray(solid.stiffness(
        jnp.asarray(c), jnp.asarray(conn), etype, E, NU))
    np.testing.assert_allclose(K_new, K_ref, rtol=1e-12,
                               atol=1e-13 * np.abs(K_ref).max())


@pytest.mark.parametrize("etype,mesh", [
    ("c3d4", lambda: meshgen.box_tet(3, 3, 3)),
    ("c3d10", lambda: meshgen.box_tet10(2, 2, 2)),
    ("c3d8", lambda: meshgen.box_hex(3, 3, 3)),
    ("c3d6", lambda: meshgen.box_wedge(3, 3, 3)),
])
def test_stiffness_fused_pallas_matches(etype, mesh):
    """Fused Pallas stiffness kernel == the einsum pipeline (interpret
    mode on curved meshes; compiled-on-TPU timing lives in
    scripts/bench_stiffness.py)."""
    from tpufem.ops.stiffness_kernels import stiffness_fused
    coords, conn = mesh()
    c = coords.copy()
    c[:, 0] += 0.04 * np.sin(2.0 * c[:, 1]) * c[:, 2]
    K_f = np.asarray(stiffness_fused(jnp.asarray(c), conn, etype, E, NU,
                                     interpret=True))
    K_r = np.asarray(solid.stiffness(jnp.asarray(c), jnp.asarray(conn),
                                     etype, E, NU))
    np.testing.assert_allclose(K_f, K_r, rtol=1e-11,
                               atol=1e-12 * np.abs(K_r).max())
