"""Matrix-free global operator: the SpMV of the framework.

A(u) = gather element DOFs -> batched GEMV with per-element K -> deterministic
segment-sum scatter.  Capability parity with reference compute_nodal_forces
(solver/element.py:429-464) and compute_shell_nodal_forces (solver/shell.py:58)
with the atomic index_add replaced by a sorted deterministic reduction.
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import jax
import jax.numpy as jnp

from .scatter import ScatterPlan
from ..core.xmath import einsum as _xeinsum


def nodal_forces(K, conn_or_plan, displacement, n_nodes: Optional[int] = None):
    """Global nodal forces F[N, 3] = assemble(K_e @ u_e).

    Args:
      K: [M, d, d] element stiffness.
      conn_or_plan: connectivity [M, k] (a plan is built on the fly — prefer
        passing a prebuilt :class:`ScatterPlan` inside jitted code) or plan.
      displacement: [N, 3].
    """
    if isinstance(conn_or_plan, ScatterPlan):
        plan = conn_or_plan
    else:
        n = int(displacement.shape[0]) if n_nodes is None else n_nodes
        plan = ScatterPlan.build(jax.device_get(conn_or_plan), n, 3)
    u_flat = displacement.reshape(-1)
    ue = plan.gather(u_flat)                                # [M, d]
    Fe = _xeinsum("mij,mj->mi", K, ue)                    # batched GEMV
    return plan.scatter(Fe).reshape(displacement.shape)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class MatrixFreeOperator:
    """u[N,3] -> F[N,3] for one element block; composable by summation."""

    K: jnp.ndarray          # [M, d, d]
    plan: ScatterPlan

    def __call__(self, u):
        return nodal_forces(self.K, self.plan, u)

    def diagonal(self):
        """Assembled diagonal of the global matrix, [n_dof]."""
        d = jnp.diagonal(self.K, axis1=1, axis2=2)          # [M, d]
        return self.plan.scatter(d)


def block_operator(ops: Sequence[MatrixFreeOperator]):
    """Sum of per-element-type operators (mixed meshes)."""
    def apply(u):
        F = ops[0](u)
        for op in ops[1:]:
            F = F + op(u)
        return F
    return apply


def diagonal_preconditioner(ops: Sequence[MatrixFreeOperator], eps: float = 0.0):
    """Inverse assembled diagonal (Jacobi M^-1), shape [N, 3].

    Mirrors reference compute_diagonal_preconditioner (solver/solver.py:814)
    with zero-diagonal DOFs mapped to 0 instead of inf.
    """
    diag = ops[0].diagonal()
    for op in ops[1:]:
        diag = diag + op.diagonal()
    inv = jnp.where(jnp.abs(diag) > eps, 1.0 / diag, 0.0)
    return inv.reshape(-1, 3)
