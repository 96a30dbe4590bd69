"""Material models: isotropic 3D elasticity and Kirchhoff shell stiffness.

Voigt convention (matches reference solver/element.py:835-880 B-matrix rows
and solver/element.py:308-330 stress-vector layout):

    strain = [e_xx, e_yy, e_zz, g_xy, g_yz, g_zx]   (engineering shears)
    stress = [s_xx, s_yy, s_zz, s_xy, s_yz, s_zx]

The 6x6 isotropic D (reference solver/element.py:282-306) is invariant to the
shear-row ordering, so the same matrix serves either convention.
"""
from __future__ import annotations

from typing import Tuple

import numpy as np


def lame_parameters(E: float, nu: float) -> Tuple[float, float]:
    """(lambda, mu) from Young's modulus and Poisson ratio."""
    lam = E * nu / ((1.0 + nu) * (1.0 - 2.0 * nu))
    mu = E / (2.0 * (1.0 + nu))
    return lam, mu


def elasticity_matrix(E: float, nu: float, dtype=np.float64) -> np.ndarray:
    """Isotropic 6x6 Voigt D with stress = D @ strain.

    Host-side constant (numpy): folded into jitted kernels as a literal.
    Mirrors reference ``compute_elasticity_matrix`` (solver/element.py:282).
    """
    lam, mu = lame_parameters(E, nu)
    D = np.zeros((6, 6), dtype=dtype)
    D[:3, :3] = lam
    D[0, 0] = D[1, 1] = D[2, 2] = lam + 2.0 * mu
    D[3, 3] = D[4, 4] = D[5, 5] = mu
    return D


def kirchhoff_D_matrix(membrane, bending, dtype=np.float64) -> np.ndarray:
    """Decoupled membrane+bending 6x6 shell stiffness.

    ``membrane``/``bending`` are (E, nu, thickness) triples; mirrors reference
    ``compute_kirchoff_D_matrix`` (solver/shell.py:15-39):
    membrane block a = E t/(1-nu^2), bending block b = E t^3/(12 (1-nu^2)).
    """
    E_m, nu_m, t_m = (float(v) for v in membrane)
    E_b, nu_b, t_b = (float(v) for v in bending)
    a = E_m * t_m / (1.0 - nu_m**2)
    b = E_b * t_b**3 / (12.0 * (1.0 - nu_b**2))
    D = np.zeros((6, 6), dtype=dtype)
    D[0, 0] = D[1, 1] = a
    D[0, 1] = D[1, 0] = nu_m * a
    D[2, 2] = a * (1.0 - nu_m) / 2.0
    D[3, 3] = D[4, 4] = b
    D[3, 4] = D[4, 3] = nu_b * b
    D[5, 5] = b * (1.0 - nu_b) / 2.0
    return D
