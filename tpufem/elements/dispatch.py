"""String-keyed dispatch wrappers — API parity with the reference's generic
entry points (solver/element.py:355-427: integral_points, compute_Jacobian,
compute_shape_gradients, compute_B_matrix, compute_K_matrix,
compute_element_stress, compute_M_matrix, to_c3d4, to_2nd_order).

These are thin conveniences over the batched kernels in elements.solid /
elements.shell; performance-sensitive code should call those directly with
a prebuilt ElementTable.
"""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np

from ..core.materials import elasticity_matrix
from ..topology.convert import to_2nd_order, to_c3d4  # noqa: F401 (re-export)
from . import solid
from .tables import (DOF_PER_NODE, N_NODES, SHELL_TYPES, SOLID_TYPES,
                     element_table, quadrature)


def integral_points(element_type: str, rule: str = "default"):
    """(points [q, dim], weights [q]) — reference integral_points parity."""
    return quadrature(element_type, rule)


def compute_jacobian(coords, elements, element_type: str, rule: str = "default"):
    """J [M, q, 3, 3] at every integration point of the rule."""
    table = element_table(element_type, rule)
    return solid.jacobians(jnp.asarray(coords), jnp.asarray(np.asarray(elements)),
                           table)


def compute_shape_gradients(coords, elements, element_type: str,
                            rule: str = "default"):
    """dN/dx [M, q, k, 3] (and detJ [M, q])."""
    table = element_table(element_type, rule)
    return solid.shape_gradients(jnp.asarray(coords),
                                 jnp.asarray(np.asarray(elements)), table)


def compute_B_matrix(coords, elements, element_type: str,
                     rule: str = "default"):
    """B [M, q, 6, k, 3] strain-displacement matrices."""
    table = element_table(element_type, rule)
    g, _ = solid.shape_gradients(jnp.asarray(coords),
                                 jnp.asarray(np.asarray(elements)), table)
    return solid.b_matrix_from_gradients(g)


def compute_K_matrix(coords, elements, element_type: str, E: float, nu: float,
                     rule: str = "default", D: Optional[np.ndarray] = None,
                     single: bool = True):
    """Element stiffness — reference compute_K_matrix parity.

    single=True -> accumulated [M, dof, dof]; single=False -> per
    integration point [q, M, dof, dof] (reference solver/element.py:1233)."""
    et = element_type.lower()
    if et in SHELL_TYPES:
        raise ValueError("use elements.shell.shell_stiffness for shells")
    c = jnp.asarray(coords)
    e = jnp.asarray(np.asarray(elements))
    if not single:
        return solid.stiffness_per_ip(c, e, et, E, nu, rule)
    if D is not None:
        return solid.stiffness_bmat(c, e, et, D, rule)
    return solid.stiffness(c, e, et, E, nu, rule)


def compute_volumes(coords, elements, element_type: str):
    """Element volumes [M] — parity with compute_tetrahedral_volumes /
    compute_hexahedral_volumes / compute_wedge_volumes
    (solver/element.py:514, 1248, 2198)."""
    return solid.volumes(jnp.asarray(coords),
                         jnp.asarray(np.asarray(elements)),
                         etype=element_type)


def compute_M_matrix(coords, elements, element_type: str, rho: float,
                     lumped: bool = False, rule: str = "mass"):
    """Element mass — the kernel the reference calls but never shipped
    (solver_example.ipynb cell 13; SURVEY.md 2.7)."""
    c = jnp.asarray(coords)
    e = jnp.asarray(np.asarray(elements))
    if lumped:
        return solid.lumped_mass(c, e, element_type, rho, rule)
    return solid.mass(c, e, element_type, rho, rule)


def compute_element_stress(coords, elements, displacement, E: float, nu: float,
                           element_type: str, rule: str = "default",
                           single: bool = True):
    """(stress tensors, von Mises) — reference compute_element_stress parity."""
    return solid.element_stress(jnp.asarray(coords),
                                jnp.asarray(np.asarray(elements)),
                                jnp.asarray(displacement), element_type,
                                E, nu, rule, single=single)
