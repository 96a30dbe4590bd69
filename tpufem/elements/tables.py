"""Shape-function and quadrature tables for all element types.

Everything here is host-side numpy evaluated once at setup; the resulting
``[q, k]`` / ``[q, k, 3]`` arrays become compile-time constants inside jitted
kernels (no per-integration-point Python loops at trace time, unlike the
reference which rebuilds dN tensors per ip — solver/element.py:1026-1060).

Node orderings follow the reference's documented ABAQUS/VTK conventions:

* c3d4  — reference solver/element.py:765-776  (N = xi, eta, zeta, 1-x-e-z)
* c3d10 — reference solver/element.py:940-961  (edges 01,12,20,03,13,23)
* c3d8  — reference solver/element.py:1536-1554 (trilinear, +-1 cube)
* c3d20 — VTK/ABAQUS serendipity ordering: edges 8-11 bottom (01,12,23,30),
  12-15 top (45,56,67,74), 16-19 vertical (04,15,26,37).  NOTE: the
  reference's own doc block (solver/element.py:1806-1851) and its dN table
  disagree with each other and contain invalid vertical-edge functions; we
  use the standard serendipity basis validated by partition-of-unity and
  linear-completeness tests instead.
* c3d6  — reference solver/element.py:2482-2509 ((r,s) triangle x t in [-1,1])
* c3d15 — quadratic wedge, VTK ordering: 6-8 bottom edges (01,12,20),
  9-11 top edges (34,45,53), 12-14 vertical (03,14,25).  The reference
  declares but never implements this type (solver/element.py:2679).
* s3/s4 — reference solver/shell.py:174-183, 471-481 (2D in-plane coords).

Quadrature: standard consistent rules.  The reference's ad-hoc 11-point
c3d10 rule (weights summing to 0.45, solver/element.py:995-1024) and its
c3d6 triangle weights summing to 1 instead of 1/2 (solver/element.py:2448)
are intentionally NOT replicated; correctness is established against exact
volumes and analytic stiffness instead (SURVEY.md section 2.7).
"""
from __future__ import annotations

import dataclasses
import itertools
from typing import Callable, Dict, Tuple

import numpy as np

# ---------------------------------------------------------------------------
# Element registry
# ---------------------------------------------------------------------------

SOLID_TYPES = ("c3d4", "c3d10", "c3d8", "c3d20", "c3d6", "c3d15")
SHELL_TYPES = ("s3", "s4")

N_NODES: Dict[str, int] = {
    "c3d4": 4, "c3d10": 10, "c3d8": 8, "c3d20": 20, "c3d6": 6, "c3d15": 15,
    "s3": 3, "s4": 4,
}

DOF_PER_NODE = {**{t: 3 for t in SOLID_TYPES}, **{t: 6 for t in SHELL_TYPES}}


def dof_per_element(etype: str) -> int:
    return N_NODES[etype] * DOF_PER_NODE[etype]


# ---------------------------------------------------------------------------
# Shape functions (numpy, vectorized over quadrature points)
# ---------------------------------------------------------------------------

def _shape_c3d4(p):
    # Positively-oriented barycentric assignment: N0 = 1-xi-eta-zeta at
    # vertex 0.  (The reference pins N3 = 1-xi-eta-zeta instead,
    # solver/element.py:765-776 — an orientation-reversing map for
    # VTK-positively-oriented tets; node identities are identical so meshes
    # are interchangeable, but detJ here is positive for valid elements.)
    xi, eta, zeta = p[:, 0], p[:, 1], p[:, 2]
    N = np.stack([1 - xi - eta - zeta, xi, eta, zeta], axis=1)
    q = p.shape[0]
    dN = np.zeros((q, 4, 3))
    dN[:, 0, :] = -1.0
    dN[:, 1, 0] = 1.0
    dN[:, 2, 1] = 1.0
    dN[:, 3, 2] = 1.0
    return N, dN


def _shape_c3d10(p):
    # L0=1-xi-eta-zeta, L1=xi, L2=eta, L3=zeta (see _shape_c3d4 note);
    # edge nodes 4..9 on edges 01,12,20,03,13,23 as the reference
    # (solver/element.py:940-948).
    xi, eta, zeta = p[:, 0], p[:, 1], p[:, 2]
    L = np.stack([1 - xi - eta - zeta, xi, eta, zeta], axis=1)  # [q,4]
    dL = np.array([[-1, -1, -1], [1, 0, 0], [0, 1, 0], [0, 0, 1]], dtype=float)
    corners = L * (2 * L - 1)  # [q,4]
    edges = [(0, 1), (1, 2), (2, 0), (0, 3), (1, 3), (2, 3)]
    mids = np.stack([4 * L[:, a] * L[:, b] for a, b in edges], axis=1)
    N = np.concatenate([corners, mids], axis=1)  # [q,10]
    q = p.shape[0]
    dN = np.zeros((q, 10, 3))
    for i in range(4):
        dN[:, i, :] = (4 * L[:, i:i + 1] - 1) * dL[i]
    for m, (a, b) in enumerate(edges):
        dN[:, 4 + m, :] = 4 * (L[:, a:a + 1] * dL[b] + L[:, b:b + 1] * dL[a])
    return N, dN


_HEX_CORNERS = np.array([
    [-1, -1, -1], [1, -1, -1], [1, 1, -1], [-1, 1, -1],
    [-1, -1, 1], [1, -1, 1], [1, 1, 1], [-1, 1, 1],
], dtype=float)


def _shape_c3d8(p):
    xi = p[:, None, :]                    # [q,1,3]
    s = _HEX_CORNERS[None, :, :]          # [1,8,3]
    f = 1 + s * xi                        # [q,8,3]
    N = 0.125 * f[:, :, 0] * f[:, :, 1] * f[:, :, 2]
    dN = np.zeros((p.shape[0], 8, 3))
    dN[:, :, 0] = 0.125 * s[:, :, 0] * f[:, :, 1] * f[:, :, 2]
    dN[:, :, 1] = 0.125 * f[:, :, 0] * s[:, :, 1] * f[:, :, 2]
    dN[:, :, 2] = 0.125 * f[:, :, 0] * f[:, :, 1] * s[:, :, 2]
    return N, dN


# C3D20 edge list in VTK/ABAQUS order: (node_a, node_b) for midside 8..19.
_C3D20_EDGES = [(0, 1), (1, 2), (2, 3), (3, 0),
                (4, 5), (5, 6), (6, 7), (7, 4),
                (0, 4), (1, 5), (2, 6), (3, 7)]


def _shape_c3d20(p):
    q = p.shape[0]
    N = np.zeros((q, 20))
    dN = np.zeros((q, 20, 3))
    xi, eta, zeta = p[:, 0], p[:, 1], p[:, 2]
    # Corners: N = (1/8)(1+s0 xi)(1+s1 eta)(1+s2 zeta)(s0 xi + s1 eta + s2 zeta - 2)
    for i, (s0, s1, s2) in enumerate(_HEX_CORNERS):
        f0, f1, f2 = 1 + s0 * xi, 1 + s1 * eta, 1 + s2 * zeta
        g = s0 * xi + s1 * eta + s2 * zeta - 2
        N[:, i] = 0.125 * f0 * f1 * f2 * g
        dN[:, i, 0] = 0.125 * s0 * f1 * f2 * (g + f0)
        dN[:, i, 1] = 0.125 * s1 * f0 * f2 * (g + f1)
        dN[:, i, 2] = 0.125 * s2 * f0 * f1 * (g + f2)
    # Midside: the edge-varying coordinate has exponent 2.
    coords = np.stack([xi, eta, zeta], axis=1)  # [q,3]
    for m, (a, b) in enumerate(_C3D20_EDGES):
        sa, sb = _HEX_CORNERS[a], _HEX_CORNERS[b]
        var_axis = int(np.nonzero(sa != sb)[0][0])
        s_fix = sa.copy()
        s_fix[var_axis] = 0.0
        v = coords[:, var_axis]
        f_fix = [1 + s_fix[ax] * coords[:, ax] for ax in range(3) if ax != var_axis]
        N[:, 8 + m] = 0.25 * (1 - v**2) * f_fix[0] * f_fix[1]
        d = np.zeros((q, 3))
        d[:, var_axis] = 0.25 * (-2 * v) * f_fix[0] * f_fix[1]
        other_axes = [ax for ax in range(3) if ax != var_axis]
        d[:, other_axes[0]] = 0.25 * (1 - v**2) * s_fix[other_axes[0]] * f_fix[1]
        d[:, other_axes[1]] = 0.25 * (1 - v**2) * f_fix[0] * s_fix[other_axes[1]]
        dN[:, 8 + m, :] = d
    return N, dN


def _shape_c3d6(p):
    r, s, t = p[:, 0], p[:, 1], p[:, 2]
    q = p.shape[0]
    L = np.stack([1 - r - s, r, s], axis=1)  # triangle coords [q,3]
    dL = np.array([[-1.0, -1.0], [1.0, 0.0], [0.0, 1.0]])
    N = np.zeros((q, 6))
    dN = np.zeros((q, 6, 3))
    for i in range(3):
        N[:, i] = 0.5 * L[:, i] * (1 - t)
        N[:, 3 + i] = 0.5 * L[:, i] * (1 + t)
        dN[:, i, :2] = 0.5 * (1 - t)[:, None] * dL[i]
        dN[:, i, 2] = -0.5 * L[:, i]
        dN[:, 3 + i, :2] = 0.5 * (1 + t)[:, None] * dL[i]
        dN[:, 3 + i, 2] = 0.5 * L[:, i]
    return N, dN


def _shape_c3d15(p):
    r, s, t = p[:, 0], p[:, 1], p[:, 2]
    q = p.shape[0]
    L = np.stack([1 - r - s, r, s], axis=1)          # [q,3]
    dL = np.array([[-1.0, -1.0], [1.0, 0.0], [0.0, 1.0]])  # [3,2]
    N = np.zeros((q, 15))
    dN = np.zeros((q, 15, 3))
    one = np.ones_like(t)
    for i in range(3):
        Li, dLi = L[:, i], dL[i]
        # bottom corner i: Li((2Li-1)(1-t) - (1-t^2))/2
        N[:, i] = 0.5 * Li * ((2 * Li - 1) * (1 - t) - (1 - t**2))
        dN[:, i, :2] = (0.5 * ((4 * Li - 1) * (1 - t) - (1 - t**2)))[:, None] * dLi
        dN[:, i, 2] = 0.5 * Li * (-(2 * Li - 1) + 2 * t)
        # top corner i+3: Li((2Li-1)(1+t) - (1-t^2))/2
        N[:, 3 + i] = 0.5 * Li * ((2 * Li - 1) * (1 + t) - (1 - t**2))
        dN[:, 3 + i, :2] = (0.5 * ((4 * Li - 1) * (1 + t) - (1 - t**2)))[:, None] * dLi
        dN[:, 3 + i, 2] = 0.5 * Li * ((2 * Li - 1) + 2 * t)
    tri_edges = [(0, 1), (1, 2), (2, 0)]
    for m, (a, b) in enumerate(tri_edges):
        La, Lb = L[:, a], L[:, b]
        dLab = (La[:, None] * dL[b] + Lb[:, None] * dL[a])
        # bottom edge 6+m: 2 La Lb (1-t)
        N[:, 6 + m] = 2 * La * Lb * (1 - t)
        dN[:, 6 + m, :2] = 2 * (1 - t)[:, None] * dLab
        dN[:, 6 + m, 2] = -2 * La * Lb
        # top edge 9+m: 2 La Lb (1+t)
        N[:, 9 + m] = 2 * La * Lb * (1 + t)
        dN[:, 9 + m, :2] = 2 * (1 + t)[:, None] * dLab
        dN[:, 9 + m, 2] = 2 * La * Lb
    for i in range(3):
        Li, dLi = L[:, i], dL[i]
        # vertical 12+i: Li (1 - t^2)
        N[:, 12 + i] = Li * (1 - t**2)
        dN[:, 12 + i, :2] = (1 - t**2)[:, None] * dLi * one[:, None]
        dN[:, 12 + i, 2] = -2 * Li * t
    return N, dN


def _shape_s3(p):
    xi, eta = p[:, 0], p[:, 1]
    N = np.stack([1 - xi - eta, xi, eta], axis=1)
    dN = np.tile(np.array([[-1.0, -1.0], [1.0, 0.0], [0.0, 1.0]]), (p.shape[0], 1, 1))
    return N, dN


def _shape_s4(p):
    xi, eta = p[:, 0], p[:, 1]
    signs = np.array([[-1, -1], [1, -1], [1, 1], [-1, 1]], dtype=float)
    f0 = 1 + signs[None, :, 0] * xi[:, None]
    f1 = 1 + signs[None, :, 1] * eta[:, None]
    N = 0.25 * f0 * f1
    dN = np.zeros((p.shape[0], 4, 2))
    dN[:, :, 0] = 0.25 * signs[None, :, 0] * f1
    dN[:, :, 1] = 0.25 * f0 * signs[None, :, 1]
    return N, dN


_SHAPE_FNS: Dict[str, Callable] = {
    "c3d4": _shape_c3d4, "c3d10": _shape_c3d10, "c3d8": _shape_c3d8,
    "c3d20": _shape_c3d20, "c3d6": _shape_c3d6, "c3d15": _shape_c3d15,
    "s3": _shape_s3, "s4": _shape_s4,
}


def shape_values(etype: str, points: np.ndarray):
    """Return (N[q,k], dN[q,k,dim]) at the given natural coordinates."""
    return _SHAPE_FNS[etype](np.asarray(points, dtype=np.float64))


# ---------------------------------------------------------------------------
# Quadrature rules
# ---------------------------------------------------------------------------

def _gauss_1d(n: int):
    return np.polynomial.legendre.leggauss(n)


def _tensor_rule_hex(n: int):
    x, w = _gauss_1d(n)
    pts, wts = [], []
    for i in range(n):
        for j in range(n):
            for k in range(n):
                pts.append([x[i], x[j], x[k]])
                wts.append(w[i] * w[j] * w[k])
    return np.array(pts), np.array(wts)


# Keast rules on the reference tetrahedron with natural coords (L0,L1,L2);
# weights sum to 1/6 (the reference tet volume).
def _tet_rule(n: int):
    if n == 1:
        return np.array([[0.25, 0.25, 0.25]]), np.array([1.0 / 6.0])
    if n == 4:
        a = 0.5854101966249685
        b = 0.13819660112501052
        pts = np.array([[a, b, b], [b, a, b], [b, b, a], [b, b, b]])
        return pts, np.full(4, 1.0 / 24.0)
    if n == 5:
        # degree 3, Keast: centroid (negative weight) + 4 points
        pts = np.concatenate([
            np.array([[0.25, 0.25, 0.25]]),
            np.array([[0.5, 1 / 6, 1 / 6], [1 / 6, 0.5, 1 / 6],
                      [1 / 6, 1 / 6, 0.5], [1 / 6, 1 / 6, 1 / 6]]),
        ])
        wts = np.concatenate([np.array([-4.0 / 30.0]), np.full(4, 0.075)])
        return pts, wts
    if n == 11:
        # Keast degree-4 rule (11 points): centroid + 4 corner-biased +
        # 6 edge-midpoint-biased points; weights sum to 1/6.
        pts = [[0.25, 0.25, 0.25]]
        wts = [-0.0131555555555556]
        a = 0.0714285714285714  # 1/14
        b = 1.0 - 3.0 * a       # 11/14
        w = 0.0076222222222222
        for perm in [(b, a, a), (a, b, a), (a, a, b), (a, a, a)]:
            pts.append(list(perm))
            wts.append(w)
        c = 0.399403576166799
        d = 0.100596423833201
        w2 = 0.0248888888888889
        # 6 points: two coords = c, two = d (4 coords with L3 implied)
        full = sorted(set(itertools.permutations([c, c, d, d])))
        for combo in full:
            pts.append(list(combo[:3]))  # L3 = combo[3] implied
            wts.append(w2)
        return np.array(pts), np.array(wts)
    raise ValueError(f"no {n}-point tet rule")


def _tri_rule(n: int):
    """Triangle rules in (xi, eta); weights sum to 1/2."""
    if n == 1:
        return np.array([[1 / 3, 1 / 3]]), np.array([0.5])
    if n == 3:
        pts = np.array([[1 / 6, 1 / 6], [2 / 3, 1 / 6], [1 / 6, 2 / 3]])
        return pts, np.full(3, 1.0 / 6.0)
    if n == 6:
        a, wa = 0.445948490915965, 0.111690794839005
        b, wb = 0.091576213509771, 0.054975871827661
        pts = np.array([
            [a, a], [1 - 2 * a, a], [a, 1 - 2 * a],
            [b, b], [1 - 2 * b, b], [b, 1 - 2 * b],
        ])
        wts = np.array([wa] * 3 + [wb] * 3)
        return pts, wts
    raise ValueError(f"no {n}-point triangle rule")


def _wedge_rule(n_tri: int, n_line: int):
    tp, tw = _tri_rule(n_tri)
    lp, lw = _gauss_1d(n_line)
    pts, wts = [], []
    for i in range(tp.shape[0]):
        for j in range(n_line):
            pts.append([tp[i, 0], tp[i, 1], lp[j]])
            wts.append(tw[i] * lw[j])
    return np.array(pts), np.array(wts)


# Reference compat: the 11-point hand-picked c3d10 rule
# (solver/element.py:995-1024).  Kept only for behavioral parity studies.
_REF_C3D10_POINTS = np.array([
    [0.25, 0.25, 0.25], [0.1, 0.1, 0.1], [0.1, 0.1, 0.7], [0.1, 0.7, 0.1],
    [0.7, 0.1, 0.1], [0.1, 0.4, 0.4], [0.4, 0.1, 0.4], [0.4, 0.4, 0.1],
    [0.3, 0.3, 0.3], [0.2, 0.2, 0.6], [0.2, 0.6, 0.2],
])
_REF_C3D10_WEIGHTS = np.array(
    [0.1, 0.05, 0.05, 0.05, 0.05, 0.03, 0.03, 0.03, 0.02, 0.02, 0.02])


def quadrature(etype: str, rule: str = "default") -> Tuple[np.ndarray, np.ndarray]:
    """Return (points[q, dim], weights[q]) for an element type.

    Named rules: "default", "reduced", "full", "mass" plus "ref11" for c3d10.
    """
    et = etype.lower()
    if et == "c3d4":
        return _tet_rule(4 if rule == "mass" else 1)
    if et == "c3d10":
        if rule == "ref11":
            return _REF_C3D10_POINTS.copy(), _REF_C3D10_WEIGHTS.copy()
        if rule in ("mass", "full"):
            return _tet_rule(11)
        return _tet_rule(4)
    if et == "c3d8":
        if rule == "reduced":
            return _tensor_rule_hex(1)
        return _tensor_rule_hex(2)
    if et == "c3d20":
        if rule == "reduced":
            return _tensor_rule_hex(2)
        return _tensor_rule_hex(3)
    if et == "c3d6":
        if rule == "reduced":
            return np.array([[1 / 3, 1 / 3, 0.0]]), np.array([1.0])
        return _wedge_rule(3, 2)
    if et == "c3d15":
        if rule in ("mass", "full"):
            return _wedge_rule(6, 3)
        return _wedge_rule(3, 2)
    if et == "s3":
        if rule in ("mass", "full"):
            p, w = _tri_rule(3)
        else:
            p, w = _tri_rule(1)
        return p, w
    if et == "s4":
        x, wx = _gauss_1d(2)
        pts, wts = [], []
        for i in range(2):
            for j in range(2):
                pts.append([x[i], x[j]])
                wts.append(wx[i] * wx[j])
        return np.array(pts), np.array(wts)
    raise ValueError(f"Unsupported element type: {etype}")


@dataclasses.dataclass(frozen=True)
class ElementTable:
    """Precomputed per-(type, rule) constants used by kernels."""

    etype: str
    points: np.ndarray   # [q, dim]
    weights: np.ndarray  # [q]
    N: np.ndarray        # [q, k]
    dN: np.ndarray       # [q, k, dim]

    @property
    def n_nodes(self) -> int:
        return N_NODES[self.etype]

    @property
    def n_ip(self) -> int:
        return self.points.shape[0]


def element_table(etype: str, rule: str = "default") -> ElementTable:
    et = etype.lower()
    if et == "c3d8i":  # reference alias (solver/element.py:383)
        et = "c3d8"
    pts, wts = quadrature(et, rule)
    N, dN = shape_values(et, pts)
    return ElementTable(et, pts, wts, N, dN)
