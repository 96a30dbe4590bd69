"""Modal (generalized eigenvalue) solvers: K phi = lambda M phi.

Two implementations:

* :func:`modal_solver` — inverse subspace iteration with Rayleigh-Ritz:
  Y = K^-1 M X via inner PCG, M-orthonormalization, projected dense GEVP via
  Cholesky + eigh.  Converges to the SMALLEST modes (the ones that matter),
  entirely on device.
* :func:`naive_modal_solver` — behavioral parity with the reference
  vectorized_modal_solver (solver/solver.py:1084-1311): forward iteration on
  M^-1 K with Euclidean Gram-Schmidt and a small GEVP (the reference
  hand-rolls Gauss-Jordan + Jacobi rotations; jnp.linalg replaces both).
  Kept because the reference's workload calls it; its iteration amplifies
  the LARGEST modes, as the reference's own docstring warns ("naive").

The lumped mass diagonal is built from element mass matrices exactly like
the reference (diagonal extraction + scatter-add, solver/solver.py:1126-1134)
but with the deterministic segment-sum.
"""
from __future__ import annotations

from typing import Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.scatter import ScatterPlan
from .cg import cg
from .constraints import Constraints


def lumped_mass_diagonal(M_local, plan: ScatterPlan, clamp: float = 1e-12):
    """[n_dof] lumped mass from consistent element mass matrices [M, d, d]."""
    d = jnp.diagonal(M_local, axis1=1, axis2=2)
    return jnp.maximum(plan.scatter(d), clamp)


class ModalInfo(NamedTuple):
    iterations: int
    eigenvalue_history: np.ndarray


def _m_orthonormalize(X, Mdiag):
    """M-orthonormal basis via Cholesky of X^T M X (batched on device)."""
    G = X.T @ (Mdiag[:, None] * X)
    L = jnp.linalg.cholesky(G)
    return jax.scipy.linalg.solve_triangular(L, X.T, lower=True).T


def _rayleigh_ritz(Y, apply_K, Mdiag):
    KY = apply_K(Y)
    Ak = Y.T @ KY
    Bk = Y.T @ (Mdiag[:, None] * Y)
    # generalized symmetric GEVP via Cholesky of Bk
    L = jnp.linalg.cholesky(Bk)
    Linv_A = jax.scipy.linalg.solve_triangular(L, Ak, lower=True)
    C = jax.scipy.linalg.solve_triangular(L, Linv_A.T, lower=True).T
    lam, W = jnp.linalg.eigh(0.5 * (C + C.T))
    Z = jax.scipy.linalg.solve_triangular(L.T, W, lower=False)
    return lam, Z


def modal_solver(operator: Callable, Mdiag, n_dof_shape: Tuple[int, int],
                 num_eigs: int = 5, *, constraints: Optional[Constraints] = None,
                 max_iter: int = 20, inner_tol: float = 1e-8,
                 inner_max_iter: int = 400, seed: int = 0,
                 precondition=None, n_guard: int = 2):
    """Smallest-mode solver; returns (eigenvalues [k], modes [n_dof, k]).

    Args:
      operator: u[N, nd] -> K u (matrix-free), SPD on the free DOFs.
      Mdiag: [N*nd] lumped mass diagonal.
      n_dof_shape: (N, nd) field shape.
      n_guard: extra subspace vectors (the trailing Ritz values converge
        slowest; guards absorb that edge and are dropped from the result).
    """
    N, nd = n_dof_shape
    n_dof = N * nd
    k = num_eigs + n_guard

    mask = (constraints.free_mask.astype(Mdiag.dtype)
            if constraints is not None else jnp.ones_like(Mdiag))

    def clamp_cols(X):
        return X * mask[:, None]

    def apply_K_cols(X):
        def one(col):
            return operator(col.reshape(N, nd)).reshape(-1)
        return jax.vmap(one, in_axes=1, out_axes=1)(X)

    def solve_K_cols(B):
        """Y = K^-1 B column-wise via CG with constraint projection."""
        def one(col):
            u, _ = cg(operator, col.reshape(N, nd), constraints=constraints,
                      M_inv=precondition, tol=inner_tol,
                      max_iter=inner_max_iter)
            return u.reshape(-1)
        return jax.vmap(one, in_axes=1, out_axes=1)(B)

    key = jax.random.PRNGKey(seed)
    X = jax.random.normal(key, (n_dof, k), dtype=Mdiag.dtype)
    X = clamp_cols(X)
    X = _m_orthonormalize(X, Mdiag)

    history = []
    lam = jnp.zeros((k,), Mdiag.dtype)
    for _ in range(max_iter):
        Y = solve_K_cols(Mdiag[:, None] * X)      # inverse iteration step
        Y = clamp_cols(Y)
        Y = _m_orthonormalize(Y, Mdiag)
        lam, Z = _rayleigh_ritz(Y, apply_K_cols, Mdiag)
        X = Y @ Z
        history.append(np.asarray(lam[:num_eigs]))
    return (lam[:num_eigs], X[:, :num_eigs],
            ModalInfo(max_iter, np.asarray(history)))


def naive_modal_solver(operator: Callable, Mdiag, n_dof_shape: Tuple[int, int],
                       num_eigs: int = 5, *, fixed_dofs=None, max_iter: int = 20,
                       seed: int = 0):
    """Reference-parity forward subspace iteration (solver/solver.py:1084).

    Returns (eigenvalues, modes) like the reference's (lam, modes)."""
    N, nd = n_dof_shape
    n_dof = N * nd
    k = num_eigs
    Minv = 1.0 / Mdiag
    mask = jnp.ones((n_dof,), Mdiag.dtype)
    if fixed_dofs is not None and np.size(fixed_dofs):
        mask = mask.at[jnp.asarray(fixed_dofs)].set(0.0)

    def apply_cols(X):
        def one(col):
            return operator(col.reshape(N, nd)).reshape(-1)
        return jax.vmap(one, in_axes=1, out_axes=1)(X)

    def gram_schmidt(X):
        Q, _ = jnp.linalg.qr(X)
        return Q

    key = jax.random.PRNGKey(seed)
    X = jax.random.normal(key, (n_dof, k), dtype=Mdiag.dtype) * mask[:, None]
    X = gram_schmidt(X)
    for _ in range(max_iter):
        Y = apply_cols(X) * Minv[:, None]
        Y = gram_schmidt(Y * mask[:, None])
        Ak = Y.T @ apply_cols(Y)
        Bk = Y.T @ (Mdiag[:, None] * Y)
        lam, Z = _gevp(Ak, Bk)
        X = gram_schmidt((Y @ Z) * mask[:, None])
    Ak = X.T @ apply_cols(X)
    Bk = X.T @ (Mdiag[:, None] * X)
    lam, Z = _gevp(Ak, Bk)
    return lam, X @ Z


def _gevp(Ak, Bk):
    L = jnp.linalg.cholesky(Bk)
    Linv_A = jax.scipy.linalg.solve_triangular(L, Ak, lower=True)
    C = jax.scipy.linalg.solve_triangular(L, Linv_A.T, lower=True).T
    lam, W = jnp.linalg.eigh(0.5 * (C + C.T))
    return lam, jax.scipy.linalg.solve_triangular(L.T, W, lower=False)
