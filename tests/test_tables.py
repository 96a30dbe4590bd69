"""Shape-function table correctness: the foundation everything rests on."""
import numpy as np
import pytest

from tpufem.elements import tables


ALL_TYPES = list(tables.SOLID_TYPES) + list(tables.SHELL_TYPES)


def _random_points(etype, n=40, seed=0):
    rng = np.random.default_rng(seed)
    dim = 2 if etype in tables.SHELL_TYPES else 3
    if etype in ("c3d4", "c3d10"):
        # random barycentric interior points
        p = rng.dirichlet(np.ones(4), size=n)[:, :3]
    elif etype in ("c3d6", "c3d15"):
        tri = rng.dirichlet(np.ones(3), size=n)[:, :2]
        t = rng.uniform(-1, 1, size=(n, 1))
        p = np.concatenate([tri, t], axis=1)
    elif etype == "s3":
        p = rng.dirichlet(np.ones(3), size=n)[:, :2]
    else:  # hex / quad in [-1, 1]^dim
        p = rng.uniform(-1, 1, size=(n, dim))
    return p


@pytest.mark.parametrize("etype", ALL_TYPES)
def test_partition_of_unity(etype):
    p = _random_points(etype)
    N, dN = tables.shape_values(etype, p)
    assert N.shape[1] == tables.N_NODES[etype]
    np.testing.assert_allclose(N.sum(axis=1), 1.0, atol=1e-12)
    np.testing.assert_allclose(dN.sum(axis=1), 0.0, atol=1e-12)


@pytest.mark.parametrize("etype", ALL_TYPES)
def test_kronecker_delta_at_nodes(etype):
    """N_i(node_j) = delta_ij — pins down node ordering."""
    node_xi = _reference_nodes(etype)
    N, _ = tables.shape_values(etype, node_xi)
    np.testing.assert_allclose(N, np.eye(tables.N_NODES[etype]), atol=1e-12)


def _reference_nodes(etype):
    if etype == "c3d4":
        return np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1]], float)
    if etype == "c3d10":
        c = _reference_nodes("c3d4")
        edges = [(0, 1), (1, 2), (2, 0), (0, 3), (1, 3), (2, 3)]
        mids = np.array([(c[a] + c[b]) / 2 for a, b in edges])
        return np.concatenate([c, mids])
    if etype == "c3d8":
        return tables._HEX_CORNERS.copy()
    if etype == "c3d20":
        c = tables._HEX_CORNERS
        mids = np.array([(c[a] + c[b]) / 2 for a, b in tables._C3D20_EDGES])
        return np.concatenate([c, mids])
    if etype == "c3d6":
        tri = np.array([[0, 0], [1, 0], [0, 1]], float)
        bot = np.concatenate([tri, -np.ones((3, 1))], axis=1)
        top = np.concatenate([tri, np.ones((3, 1))], axis=1)
        return np.concatenate([bot, top])
    if etype == "c3d15":
        c = _reference_nodes("c3d6")
        e_bot = [(0, 1), (1, 2), (2, 0)]
        e_top = [(3, 4), (4, 5), (5, 3)]
        e_ver = [(0, 3), (1, 4), (2, 5)]
        mids = np.array([(c[a] + c[b]) / 2 for a, b in e_bot + e_top + e_ver])
        return np.concatenate([c, mids])
    if etype == "s3":
        return np.array([[0, 0], [1, 0], [0, 1]], float)
    if etype == "s4":
        return np.array([[-1, -1], [1, -1], [1, 1], [-1, 1]], float)
    raise ValueError(etype)


@pytest.mark.parametrize("etype", ALL_TYPES)
def test_gradient_matches_finite_difference(etype):
    p = _random_points(etype, n=5, seed=3)
    N, dN = tables.shape_values(etype, p)
    h = 1e-6
    dim = p.shape[1]
    for d in range(dim):
        pp, pm = p.copy(), p.copy()
        pp[:, d] += h
        pm[:, d] -= h
        Np, _ = tables.shape_values(etype, pp)
        Nm, _ = tables.shape_values(etype, pm)
        fd = (Np - Nm) / (2 * h)
        np.testing.assert_allclose(dN[:, :, d], fd, atol=1e-6)


@pytest.mark.parametrize("etype,expected", [
    ("c3d4", 1 / 6), ("c3d10", 1 / 6), ("c3d8", 8.0), ("c3d20", 8.0),
    ("c3d6", 1.0), ("c3d15", 1.0), ("s3", 0.5), ("s4", 4.0),
])
def test_quadrature_weight_sum(etype, expected):
    """Weights sum to the reference-domain volume (SURVEY.md 2.7: the
    reference's c3d10 rule sums to 0.45 and its c3d6 rule to 2 — both are
    deliberately corrected here)."""
    for rule in ("default", "mass"):
        _, w = tables.quadrature(etype, rule)
        np.testing.assert_allclose(w.sum(), expected, rtol=1e-12)


@pytest.mark.parametrize("etype,degree", [
    ("c3d4", 1), ("c3d10", 2), ("c3d8", 3), ("c3d20", 3),
    ("c3d6", 2), ("c3d15", 2),
])
def test_quadrature_polynomial_exactness(etype, degree):
    """Default rules integrate polynomials needed for affine stiffness."""
    pts, w = tables.quadrature(etype, "default")

    def integrate(f):
        return (w * f(pts)).sum()

    if etype in ("c3d4", "c3d10"):
        # int over ref tet of x = 1/24; of x^2 = 1/60; of xy = 1/120
        np.testing.assert_allclose(integrate(lambda p: p[:, 0]), 1 / 24, rtol=1e-10)
        if degree >= 2:
            np.testing.assert_allclose(integrate(lambda p: p[:, 0] ** 2), 1 / 60, rtol=1e-10)
            np.testing.assert_allclose(integrate(lambda p: p[:, 0] * p[:, 1]), 1 / 120, rtol=1e-10)
    elif etype in ("c3d8", "c3d20"):
        np.testing.assert_allclose(integrate(lambda p: p[:, 0] ** 2), 8 / 3, rtol=1e-10)
        np.testing.assert_allclose(integrate(lambda p: p[:, 0] ** 2 * p[:, 1] ** 2), 8 / 9, rtol=1e-10)
    else:  # wedges: tri (deg 2) x line (deg 3)
        np.testing.assert_allclose(integrate(lambda p: p[:, 0] ** 2), 2 / 12, rtol=1e-10)
        np.testing.assert_allclose(integrate(lambda p: p[:, 2] ** 2), 1 / 3, rtol=1e-10)


def test_mass_rules_are_higher_order():
    # c3d10 mass rule must integrate quartics (N_i N_j): Keast11 is degree 4.
    pts, w = tables.quadrature("c3d10", "mass")
    # Exact: int over unit tet of x^a = a!/(a+3)!  (so x^4 -> 4!/7!)
    import math
    exact = math.factorial(4) / math.factorial(7)
    np.testing.assert_allclose((w * pts[:, 0] ** 4).sum(), exact, rtol=1e-8)
