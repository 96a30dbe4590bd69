"""Newton-Raphson outer loop for K(u) u = F with a CG inner solve.

Capability parity with reference newton_raphson_solver +
conjugate_gradient_solver_Ku (solver/solver.py:978-1065).  The stiffness
rebuild K(u) is an arbitrary user callable, so the outer loop stays in
Python (each iteration jit-compiles the inner solve against the new K);
the inner CG is the lax.while_loop solver from .cg.
"""
from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax.numpy as jnp
import numpy as np

from .cg import cg
from .constraints import Constraints


class NewtonInfo(NamedTuple):
    iterations: int
    converged: bool
    residual_norms: np.ndarray  # [n_outer]


def newton_raphson(K_operator_fn: Callable, F_ext, *,
                   constraints: Optional[Constraints] = None, u_init=None,
                   tol: float = 1e-8, max_iter: int = 50,
                   inner_tol: float = 1e-8, inner_max_iter: int = 200):
    """Solve K(u) u = F_ext.

    Args:
      K_operator_fn: u -> (linear operator du -> K(u) du).  For the common
        per-element form, wrap element stiffness + a ScatterPlan into a
        MatrixFreeOperator inside this callable.
    Returns (u, NewtonInfo).
    """
    u = jnp.zeros_like(F_ext) if u_init is None else u_init
    if constraints is not None:
        u = constraints.apply_state(u)
    history = []
    converged = False
    it = 0
    for it in range(1, max_iter + 1):
        A = K_operator_fn(u)
        R = F_ext - A(u)
        if constraints is not None:
            R = constraints.project_residual(R)
        rnorm = float(jnp.sqrt(jnp.vdot(R, R).real))
        history.append(rnorm)
        if rnorm < tol:
            converged = True
            break
        # homogeneous constraints on the increment
        inc_cons = None
        if constraints is not None:
            class _Inc:
                def project_residual(self, r):
                    return constraints.project_residual(r)

                def apply_state(self, du):
                    return constraints.project_residual(du)
            inc_cons = _Inc()
        du, info = cg(A, R, constraints=inc_cons, tol=inner_tol,
                      max_iter=inner_max_iter)
        u = u + du
        if constraints is not None:
            u = constraints.apply_state(u)
    return u, NewtonInfo(it, converged, np.asarray(history))
