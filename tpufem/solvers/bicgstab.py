"""BiCGStab as a single lax.while_loop program.

Capability parity with reference bicgstab_solver (solver/solver.py:840-904):
matrix-free operator, constrained-DOF zeroing each iteration, relative
tolerance (tol * ||r0||)^2, rho-breakdown guard — without the reference's
hardcoded-f32 zeroing bug (solver/solver.py:878) and with on-device history.
"""
from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from .cg import CONVERGED, MAX_ITER, NAN_INF, NOT_SPD, RUNNING, SolveInfo
from .constraints import Constraints

BREAKDOWN = NOT_SPD  # rho == 0 maps onto the "invalid operator" code


def bicgstab(A: Callable, b, *, constraints: Optional[Constraints] = None,
             x0=None, tol: float = 1e-8, max_iter: int = 1000,
             eps: float = 1e-30):
    """Solve A u = b; returns (u, SolveInfo).  tol is RELATIVE to ||r0||."""
    dtype = b.dtype
    project = constraints.project_residual if constraints else (lambda r: r)
    set_state = constraints.apply_state if constraints else (lambda u: u)

    u0 = jnp.zeros_like(b) if x0 is None else x0.astype(dtype)
    u0 = set_state(u0)
    r0 = project(b - A(u0))
    r_hat = r0
    rs0 = jnp.vdot(r0, r0)
    tol2 = (tol**2) * rs0

    hist0 = jnp.full((max_iter + 1,), jnp.inf, dtype=dtype)
    hist0 = hist0.at[0].set(jnp.sqrt(rs0))
    one = jnp.asarray(1.0, dtype)
    zero_vec = jnp.zeros_like(b)

    # carry: i, u, r, p, v, rho, alpha, omega, status, hist
    init = (jnp.int32(0), u0, r0, zero_vec, zero_vec, one, one, one,
            jnp.where(rs0 < tol2, CONVERGED, RUNNING).astype(jnp.int32), hist0)

    def cond(s):
        return (s[0] < max_iter) & (s[8] == RUNNING)

    def body(s):
        i, u, r, p, v, rho, alpha, omega, status, hist = s
        rho_new = jnp.vdot(r_hat, r)
        breakdown = rho_new == 0.0
        beta = (rho_new / (rho + eps)) * (alpha / (omega + eps))
        p1 = jnp.where(i == 0, r, r + beta * (p - omega * v))
        p1 = project(p1)
        v1 = A(p1)
        alpha1 = rho_new / (jnp.vdot(r_hat, v1) + eps)
        sres = r - alpha1 * v1
        t = A(project(sres))
        omega1 = jnp.vdot(t, sres) / (jnp.vdot(t, t) + eps)
        u1 = set_state(u + alpha1 * p1 + omega1 * sres)
        r1 = project(sres - omega1 * t)
        rs = jnp.vdot(r1, r1)
        bad = jnp.isnan(rs) | jnp.isinf(rs)
        new_status = jnp.where(
            breakdown, BREAKDOWN,
            jnp.where(bad, NAN_INF,
                      jnp.where(rs < tol2, CONVERGED, RUNNING))).astype(jnp.int32)
        take = ~breakdown & ~bad
        u1 = jnp.where(take, u1, u)
        r1 = jnp.where(take, r1, r)
        hist = hist.at[i + 1].set(jnp.where(take, jnp.sqrt(rs), hist[i]))
        return (i + 1, u1, r1, p1, v1, rho_new, alpha1, omega1, new_status,
                hist)

    out = jax.lax.while_loop(cond, body, init)
    i, u, r = out[0], out[1], out[2]
    status = jnp.where(out[8] == RUNNING, MAX_ITER, out[8])
    return u, SolveInfo(status, i, jnp.sqrt(jnp.vdot(r, r).real), out[9])
