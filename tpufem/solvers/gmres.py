"""Restarted GMRES with Givens rotations, fully on-device.

Capability parity with reference gmres_solver (solver/solver.py:911-969),
replacing its dense-H + removed-torch.lstsq least squares (and its
O(restart^2) extra SpMVs from updating u inside the Arnoldi loop —
SURVEY.md 2.7) with the standard incremental Givens QR of the Hessenberg
matrix: one SpMV per inner iteration, solution formed once per cycle.
"""
from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from .cg import CONVERGED, MAX_ITER, RUNNING, SolveInfo
from .constraints import Constraints


def gmres(A: Callable, b, *, constraints: Optional[Constraints] = None,
          M_inv=None, x0=None, tol: float = 1e-8, max_iter: int = 1000,
          restart: int = 50, eps: float = 1e-30):
    """Solve A u = b; (u, SolveInfo).  tol is absolute on ||r||.

    M_inv: optional Jacobi (diagonal) preconditioner broadcastable to b —
    applied as LEFT preconditioning (the Arnoldi recursion runs on
    M^-1 A u = M^-1 b), so tol / the residual history / the returned
    residual_norm are on the PRECONDITIONED residual ||M^-1 r||.  The
    reference's gmres_solver has no preconditioning (solver/solver.py:911).
    """
    if M_inv is not None:
        A_raw = A
        A = lambda u: A_raw(u) * M_inv            # noqa: E731
        b = b * M_inv
    dtype = b.dtype
    shape = b.shape
    n = b.size
    project = constraints.project_residual if constraints else (lambda r: r)
    set_state = constraints.apply_state if constraints else (lambda u: u)

    u0 = set_state(jnp.zeros_like(b) if x0 is None else x0.astype(dtype))

    m = restart
    n_cycles = max(1, -(-max_iter // m))

    def arnoldi_cycle(u):
        r = project(b - A(u)).reshape(-1)
        beta = jnp.linalg.norm(r)
        V0 = jnp.zeros((m + 1, n), dtype)
        V0 = V0.at[0].set(r / (beta + eps))
        H0 = jnp.zeros((m + 1, m), dtype)
        cs0 = jnp.zeros((m,), dtype)
        sn0 = jnp.zeros((m,), dtype)
        g0 = jnp.zeros((m + 1,), dtype).at[0].set(beta)

        def inner(carry, j):
            V, H, cs, sn, g, done = carry
            w = project(A(V[j].reshape(shape))).reshape(-1)
            # modified Gram-Schmidt against all m+1 slots (zeros are no-ops)
            def mgs(k, val):
                w, h = val
                hk = jnp.where(k <= j, jnp.vdot(V[k], w), 0.0)
                return (w - hk * V[k], h.at[k].set(hk))
            w, h = jax.lax.fori_loop(0, m + 1, mgs, (w, jnp.zeros(m + 1, dtype)))
            hj1 = jnp.linalg.norm(w)
            h = h.at[j + 1].set(hj1)
            V = V.at[j + 1].set(w / (hj1 + eps))
            # apply existing Givens rotations to the new column
            def rot(k, hcol):
                t = cs[k] * hcol[k] + sn[k] * hcol[k + 1]
                h2 = -sn[k] * hcol[k] + cs[k] * hcol[k + 1]
                return jnp.where(k < j, hcol.at[k].set(t).at[k + 1].set(h2), hcol)
            h = jax.lax.fori_loop(0, m, rot, h)
            # new rotation annihilating h[j+1]
            denom = jnp.sqrt(h[j] ** 2 + h[j + 1] ** 2)
            c = h[j] / (denom + eps)
            s = h[j + 1] / (denom + eps)
            h = h.at[j].set(denom).at[j + 1].set(0.0)
            cs2 = cs.at[j].set(c)
            sn2 = sn.at[j].set(s)
            g2 = g.at[j + 1].set(-s * g[j]).at[j].set(c * g[j])
            H2 = H.at[:, j].set(h)
            res = jnp.abs(g2[j + 1])
            done2 = done | (res < tol) | (hj1 < eps)
            return (V, H2, cs2, sn2, g2, done2), res

        (V, H, cs, sn, g, done), res_hist = jax.lax.scan(
            inner, (V0, H0, cs0, sn0, g0, beta < tol), jnp.arange(m))

        # back-substitution on the m x m triangular system (full size; the
        # trailing identity rows from early exit contribute ~0 via g)
        Hm = H[:m, :] + jnp.eye(m, dtype=dtype) * eps
        y = jax.scipy.linalg.solve_triangular(Hm, g[:m], lower=False)
        du = (y @ V[:m]).reshape(shape)
        u_new = set_state(u + du)
        return u_new, res_hist

    def cycle_body(carry, _):
        u, status, hist, used = carry
        u_new, res_hist = arnoldi_cycle(u)
        was_running = status == RUNNING
        u = jnp.where(was_running, u_new, u)
        reached = res_hist < tol
        hit = jnp.any(reached)
        iters_this = jnp.where(hit, jnp.argmax(reached) + 1, m).astype(jnp.int32)
        used = (used + jnp.where(was_running, iters_this, 0)).astype(jnp.int32)
        status = jnp.where(was_running & hit, CONVERGED, status)
        # inf-pad entries past convergence / past the active cycles so the
        # history has the same padded semantics as cg()'s
        pos = jnp.arange(m)
        live = was_running & (pos < iters_this)
        res_out = jnp.where(live, res_hist, jnp.inf)
        return (u, status.astype(jnp.int32), hist, used), res_out

    init = (u0, jnp.int32(RUNNING), jnp.zeros((0,), dtype), jnp.int32(0))
    (u, status, _, used), res_all = jax.lax.scan(cycle_body, init,
                                                 jnp.arange(n_cycles))
    r = project(b - A(u))
    rnorm = jnp.sqrt(jnp.vdot(r, r).real)
    status = jnp.where(status == RUNNING,
                       jnp.where(rnorm < tol, CONVERGED, MAX_ITER),
                       status).astype(jnp.int32)
    return u, SolveInfo(status, used, rnorm, res_all.reshape(-1))
