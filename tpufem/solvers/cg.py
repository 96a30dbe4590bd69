"""Conjugate-gradient family as single compiled lax.while_loop programs.

Capability parity with the reference CG variants (solver/solver.py:144-229
stable_conjugate_gradient_solver, :231-295 final_solver, :512-596
constrained CG, :702-759 +RBE3, :766-812 Jacobi PCG) — but the whole Krylov
loop is one XLA program: no per-iteration device->host sync, residual
telemetry is returned as an on-device history array, and the same early-exit
guards (non-SPD curvature, NaN/Inf) live inside the loop as status codes.
"""
from __future__ import annotations

import dataclasses
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

from .constraints import Constraints

# Status codes (match reference early-exit semantics, solver/solver.py:96-124)
RUNNING = 0
CONVERGED = 1
MAX_ITER = 2
NOT_SPD = 3
NAN_INF = 4


class SolveInfo(NamedTuple):
    status: jnp.ndarray          # int32 code
    iterations: jnp.ndarray      # int32
    residual_norm: jnp.ndarray   # final ||r||
    history: jnp.ndarray         # [max_iter+1] ||r|| per iter (inf padded)


def _two_sum(a, b):
    """Error-free transform: a + b = s + err exactly (Knuth)."""
    s = a + b
    bb = s - a
    err = (a - (s - bb)) + (b - bb)
    return s, err


def _two_prod(a, b):
    """Error-free product via Dekker splitting (no FMA needed; valid in
    round-to-nearest f32 for |x| < ~2^115/4097)."""
    p = a * b
    t = a * jnp.asarray(4097.0, a.dtype)
    ah = t - (t - a)
    al = a - ah
    t = b * jnp.asarray(4097.0, b.dtype)
    bh = t - (t - b)
    bl = b - bh
    err = ((ah * bh - p) + ah * bl + al * bh) + al * bl
    return p, err


def comp_vdot(a, c):
    """Dot product with ~double-f32 accuracy entirely in f32 ops.

    TPU wide-scalar policy (SURVEY hard part 4): x64 scalars cannot be
    used on the TPU path because 64-bit types reach the Mosaic kernels
    via the shared program.  This keeps every vector op in f32 and makes
    ONLY the dot reductions accurate: Dekker twoProd for the products,
    then a pairwise twoSum cascade carrying the rounding errors in a
    low-order component.  Error ~ eps^2 * n * sum|terms| — f64-quality
    for n up to ~10^10.  Cost ~2n extra VPU flops (HBM-bound dots are
    unaffected)."""
    hi, lo = _two_prod(a.reshape(-1), c.reshape(-1))
    n = hi.shape[0]
    while n > 1:
        if n % 2:
            hi = jnp.concatenate([hi, jnp.zeros((1,), hi.dtype)])
            lo = jnp.concatenate([lo, jnp.zeros((1,), lo.dtype)])
            n += 1
        h = n // 2          # contiguous halves: layout-friendly pairing
        s, e = _two_sum(hi[:h], hi[h:])
        lo = lo[:h] + lo[h:] + e
        hi = s
        n = h
    return (hi + lo)[0]


def _noop_project(r):
    return r


def _noop_state(u):
    return u


def cg(A: Callable, b, *, constraints: Optional[Constraints] = None,
       M_inv=None, x0=None, tol: float = 1e-10, max_iter: int = 1000,
       eps: float = 1e-30, record_history: bool = True, dot_dtype=None,
       resume_state=None, return_state: bool = False):
    """(P)CG on A u = b with constraint projection inside the loop.

    Args:
      A: linear operator, u -> A(u), same pytree/array shape as b.
      b: right-hand side [N, nd].
      constraints: optional Constraints; enforced like the reference
        (state set + residual projection after init and every update).
      M_inv: optional preconditioner — a Jacobi (diagonal) array
        broadcastable to b, or a callable/pytree-callable r -> z
        (e.g. ops.packed.BlockJacobi).
      tol: absolute tolerance on ||r|| (reference semantics).
      dot_dtype: accumulate the CG scalar recurrences in this dtype
        (e.g. jnp.float64 with x64 enabled) while vectors stay in b's
        dtype — the "f32 storage + wide scalars" policy for TPU
        (SURVEY.md hard part 4).  Default: b's dtype.
    Returns:
      (u, SolveInfo)
    """
    dtype = b.dtype
    project = constraints.project_residual if constraints else _noop_project
    set_state = constraints.apply_state if constraints else _noop_state
    ddt = dot_dtype or dtype

    if isinstance(ddt, str) and ddt in ("compensated", "kahan"):
        def vdot(a, c):
            return comp_vdot(a, c).astype(dtype)
    else:
        def vdot(a, c):
            # jnp.sum over the native [N, nd] layout — jnp.vdot ravels,
            # which relayouts [N, nd] tiles on TPU every iteration
            return jnp.sum(a.astype(ddt) * c.astype(ddt)).astype(dtype)

    if M_inv is None:
        apply_M = None
    elif callable(M_inv):
        apply_M = M_inv
    else:
        apply_M = lambda r: r * M_inv  # noqa: E731

    u0 = jnp.zeros_like(b) if x0 is None else x0.astype(dtype)
    u0 = set_state(u0)
    r0 = project(b - A(u0))
    z0 = apply_M(r0) if apply_M is not None else r0
    rz0 = vdot(r0, z0)
    if resume_state is None:
        p0 = z0
    else:
        # EXACT continuation of a previous cg call's recurrence: the loop
        # body already computed the NEXT search direction before exiting,
        # so p0 is the carried p verbatim (and r0/z0/rz0 above are its
        # true-residual refresh) — identical trajectory to one
        # uninterrupted while_loop up to that refresh.  Lets multi-
        # thousand-iteration solves run as bounded-length device programs
        # (a single ~15-minute XLA execution crashed the TPU worker at
        # 5.14M elements).  rz_prev <= 0 signals a FRESH start (p0 = z0)
        # so one compiled program serves both cases.
        p_prev, rz_prev = resume_state
        p0 = jnp.where(rz_prev > 0, project(p_prev.astype(dtype)), z0)

    hist_len = max_iter + 1 if record_history else 1
    hist0 = jnp.full((hist_len,), jnp.inf, dtype=dtype)
    r0norm = jnp.sqrt(vdot(r0, r0).real)
    if record_history:
        hist0 = hist0.at[0].set(r0norm)
    status0 = jnp.where(r0norm < tol, CONVERGED, RUNNING).astype(jnp.int32)

    def cond(s):
        i, u, r, p, rz, status, hist = s
        return (i < max_iter) & (status == RUNNING)

    def body(s):
        i, u, r, p, rz, status, hist = s
        Ap = A(p)
        pAp = vdot(p, Ap)
        bad_curv = (jnp.abs(pAp) < eps) | (pAp < 0.0)
        alpha = rz / (pAp + eps)
        bad_alpha = jnp.isnan(alpha) | jnp.isinf(alpha)

        u1 = set_state(u + alpha * p)
        r1 = project(r - alpha * Ap)
        z1 = apply_M(r1) if apply_M is not None else r1
        rz1 = vdot(r1, z1)
        rnorm = jnp.sqrt(vdot(r1, r1).real)
        beta = rz1 / (rz + eps)
        bad_beta = jnp.isnan(beta) | jnp.isinf(beta)
        p1 = project(z1 + beta * p)

        new_status = jnp.where(
            bad_curv, NOT_SPD,
            jnp.where(bad_alpha | bad_beta, NAN_INF,
                      jnp.where(rnorm < tol, CONVERGED, RUNNING))).astype(jnp.int32)
        # On a bad step keep the previous iterate (reference breaks pre-update
        # for bad curvature/alpha).
        take = (new_status != NOT_SPD) & ~bad_alpha
        u1 = jnp.where(take, u1, u)
        r1 = jnp.where(take, r1, r)
        p1 = jnp.where(take, p1, p)
        rz1 = jnp.where(take, rz1, rz)
        if record_history:
            hist = hist.at[i + 1].set(jnp.where(take, rnorm, hist[i]))
        return (i + 1, u1, r1, p1, rz1, new_status, hist)

    init = (jnp.int32(0), u0, r0, p0, rz0, status0, hist0)
    i, u, r, p, rz, status, hist = jax.lax.while_loop(cond, body, init)
    status = jnp.where(status == RUNNING, MAX_ITER, status)
    rnorm = jnp.sqrt(vdot(r, r).real)
    info = SolveInfo(status, i, rnorm, hist)
    if return_state:
        return u, info, (p, rz)
    return u, info


def masked_cg(A: Callable, b, mask, **kw):
    """CG with a 0/1 mask instead of index assignment — the autograd-friendly
    variant (reference final_solver, solver/solver.py:231-295)."""
    class _MaskConstraint:
        def project_residual(self, r):
            return r * mask
        def apply_state(self, u):
            return u * mask
    return cg(A, b, constraints=_MaskConstraint(), **kw)
