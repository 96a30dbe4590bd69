"""Reference-compatible solver entry points (drop-in surface).

Each function mirrors a reference signature (solver/solver.py) so code
written against the reference maps 1:1; internally everything routes to the
compiled tpufem solvers.  ``device=``/``dtype=`` style arguments are
accepted where the reference had them (device is ignored — placement is
JAX's job).

    stable_conjugate_gradient_solver        solver/solver.py:144
    final_solver                            solver/solver.py:231
    stable_conjugate_gradient_shell_solver  solver/solver.py:297
    constrained_conjugate_gradient_solver   solver/solver.py:512
    new_constrained_conjugate_gradient_solver solver/solver.py:702
    preconditioned_conjugate_gradient_solver solver/solver.py:766
    compute_diagonal_preconditioner         solver/solver.py:814
    bicgstab_solver                         solver/solver.py:840
    gmres_solver                            solver/solver.py:911
    newton_raphson_solver                   solver/solver.py:978
    vectorized_modal_solver                 solver/solver.py:1084
    parse_* / apply_loads_to_F              solver/solver.py:396-663
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..elements.shell import ShellOperator, local_frames
from ..ops.operator import MatrixFreeOperator
from ..ops.scatter import ScatterPlan
from . import modal as modal_mod
from .bicgstab import bicgstab
from .cg import cg, masked_cg
from .constraints import Constraints
from .gmres import gmres
from .newton import newton_raphson


def _op(K, elements, n_nodes: int, nd: int = 3) -> MatrixFreeOperator:
    plan = ScatterPlan.build(np.asarray(elements), n_nodes, nd)
    return MatrixFreeOperator(K=jnp.asarray(K), plan=plan)


def _fixed_cons(n_nodes, fixed, nd, dtype):
    return Constraints.fixed(n_nodes, np.asarray(fixed), nd,
                             dtype=np.dtype(dtype))


def stable_conjugate_gradient_solver(K, elements, F, rbe2, u_init=None,
                                     tol=1e-10, max_iter=1000, device=None,
                                     dtype=np.float64, eps=1e-30):
    F = jnp.asarray(np.asarray(F), dtype)
    N = F.shape[0]
    op = _op(jnp.asarray(K, dtype), elements, N, 3)
    cons = _fixed_cons(N, rbe2, 3, dtype)
    x0 = jnp.asarray(u_init, dtype) if u_init is not None else None
    u, info = jax.jit(lambda b, x: cg(op, b, constraints=cons, x0=x,
                                      tol=tol, max_iter=max_iter, eps=eps))(
        F, x0 if x0 is not None else jnp.zeros_like(F))
    return u


def final_solver(K, elements, F, rbe2, u_init=None, tol=1e-10, max_iter=1000,
                 device=None, dtype=np.float64, eps=1e-30):
    """Mask-based (autograd-friendly) CG variant."""
    F = jnp.asarray(np.asarray(F), dtype)
    N = F.shape[0]
    op = _op(jnp.asarray(K, dtype), elements, N, 3)
    mask = np.ones((N, 3), dtype)
    mask[np.asarray(rbe2)] = 0.0
    u, info = masked_cg(op, F, jnp.asarray(mask), x0=u_init, tol=tol,
                        max_iter=max_iter, eps=eps)
    return u


def stable_conjugate_gradient_shell_solver(K, elements, F, rbe2, coords=None,
                                           unit=None, u_init=None, tol=1e-10,
                                           max_iter=1000, device=None,
                                           dtype=np.float64, eps=1e-30):
    F = jnp.asarray(np.asarray(F), dtype)
    N = F.shape[0]
    if unit is None:
        if coords is None:
            raise ValueError("Neither coords nor unit frames were provided")
        unit = local_frames(jnp.asarray(coords, dtype),
                            jnp.asarray(np.asarray(elements)))
    plan = ScatterPlan.build(np.asarray(elements), N, 6)
    op = ShellOperator(K=jnp.asarray(K, dtype), unit=jnp.asarray(unit, dtype),
                       plan=plan)
    cons = _fixed_cons(N, rbe2, 6, dtype)
    u, info = cg(op, F, constraints=cons, x0=u_init, tol=tol,
                 max_iter=max_iter, eps=eps)
    return u


def parse_spc_list(spc_list, device=None, dtype=np.float64):
    """Flat (nodes, dofs, values) tensors — reference parity."""
    nodes, dofs, vals = [], [], []
    for spc in spc_list:
        for d in spc["dofs"]:
            nodes.append(spc["node"])
            dofs.append(d)
            vals.append(spc["value"])
    return (jnp.asarray(nodes, jnp.int32), jnp.asarray(dofs, jnp.int32),
            jnp.asarray(np.asarray(vals, dtype)))


def parse_rbe2_list(rbe2_list, device=None):
    slaves, masters, dofs = [], [], []
    for r in rbe2_list:
        for s in r["slaves"]:
            for d in r["dofs"]:
                slaves.append(s)
                masters.append(r["master"])
                dofs.append(d)
    return (jnp.asarray(slaves, jnp.int32), jnp.asarray(masters, jnp.int32),
            jnp.asarray(dofs, jnp.int32))


def parse_rbe3_list(rbe3_list, device=None, dtype=np.float64):
    m_l, s_l, d_l, w_l, sums, offs = [], [], [], [], [], [0]
    run = 0
    for r in rbe3_list:
        for i, s in enumerate(r["slaves"]):
            for d in r["dofs"]:
                m_l.append(r["master"])
                s_l.append(s)
                d_l.append(d)
                w_l.append(r["weights"][i])
        run += len(r["slaves"]) * len(r["dofs"])
        sums.append(sum(r["weights"]))
        offs.append(run)
    return (jnp.asarray(m_l, jnp.int32), jnp.asarray(s_l, jnp.int32),
            jnp.asarray(d_l, jnp.int32), jnp.asarray(np.asarray(w_l, dtype)),
            jnp.asarray(offs, jnp.int64), jnp.asarray(np.asarray(sums, dtype)))


def apply_loads_to_F(F, load_list):
    """Accumulate {'node', 'force': [fx, fy, fz]} dicts into F [N, 3]."""
    F = np.asarray(F).copy()
    for ld in load_list:
        F[ld["node"], :3] += np.asarray(ld["force"])
    return F


def constrained_conjugate_gradient_solver(K, elements, F, rbe2_list, spc_list,
                                          u_init=None, tol=1e-10,
                                          max_iter=1000, device=None,
                                          dtype=np.float64, eps=1e-30):
    F = jnp.asarray(np.asarray(F), dtype)
    N = F.shape[0]
    nd = F.shape[1]
    op = _op(jnp.asarray(K, dtype), elements, N, nd)
    cons = Constraints.build(N, nd, spc_list=spc_list, rbe2_list=rbe2_list,
                             dtype=np.dtype(dtype))
    u, info = cg(op, F, constraints=cons, x0=u_init, tol=tol,
                 max_iter=max_iter, eps=eps)
    return u


def new_constrained_conjugate_gradient_solver(K, elements, N, rbe2_list,
                                              rbe3_list, spc_list, load_list,
                                              u_init=None, tol=1e-10,
                                              max_iter=1000, device=None,
                                              dtype=np.float64, eps=1e-30):
    F = apply_loads_to_F(np.zeros((N, 3), dtype), load_list)
    op = _op(jnp.asarray(K, dtype), elements, N, 3)
    cons = Constraints.build(N, 3, spc_list=spc_list, rbe2_list=rbe2_list,
                             rbe3_list=rbe3_list, dtype=np.dtype(dtype))
    u, info = cg(op, jnp.asarray(F), constraints=cons, x0=u_init, tol=tol,
                 max_iter=max_iter, eps=eps)
    return u


def preconditioned_conjugate_gradient_solver(K, elements, F, M_inv,
                                             u_init=None, tol=1e-8,
                                             max_iter=1000, device=None,
                                             dtype=np.float32):
    F = jnp.asarray(np.asarray(F), dtype)
    op = _op(jnp.asarray(K, dtype), elements, F.shape[0], 3)
    u, info = cg(op, F, M_inv=jnp.asarray(M_inv, dtype), x0=u_init, tol=tol,
                 max_iter=max_iter)
    return u


def compute_diagonal_preconditioner(K, elements, N, device=None,
                                    dtype=np.float32):
    op = _op(jnp.asarray(K, dtype), elements, N, 3)
    d = op.diagonal()
    return jnp.where(jnp.abs(d) > 0, 1.0 / jnp.where(d == 0, 1.0, d), 0.0
                     ).reshape(N, 3)


def bicgstab_solver(K, elements, F, rbe2, u_init=None, tol=1e-8,
                    max_iter=1000, device=None, dtype=np.float32):
    F = jnp.asarray(np.asarray(F), dtype)
    N = F.shape[0]
    op = _op(jnp.asarray(K, dtype), elements, N, 3)
    cons = _fixed_cons(N, rbe2, 3, dtype)
    u, info = bicgstab(op, F, constraints=cons, x0=u_init, tol=tol,
                       max_iter=max_iter)
    return u


def gmres_solver(K, elements, F, u_init=None, tol=1e-8, max_iter=1000,
                 restart=50, device=None, dtype=np.float32):
    F = jnp.asarray(np.asarray(F), dtype)
    op = _op(jnp.asarray(K, dtype), elements, F.shape[0], 3)
    u, info = gmres(op, F, x0=u_init, tol=tol, max_iter=max_iter,
                    restart=restart)
    return u


def newton_raphson_solver(K_func, elements, F_ext, u_init=None, tol=1e-8,
                          max_iter=50, device=None, dtype=np.float32):
    F_ext = jnp.asarray(np.asarray(F_ext), dtype)
    N = F_ext.shape[0]

    def op_of(u):
        return _op(jnp.asarray(K_func(u), dtype), elements, N, 3)

    u, info = newton_raphson(op_of, F_ext, u_init=u_init, tol=tol,
                             max_iter=max_iter)
    return u


def vectorized_modal_solver(K_local, M_local, elements, rbe2_node_ids,
                            num_nodes, num_eigs=5, max_iter=20, device=None,
                            dtype=np.float32):
    """Reference-signature modal solve.  Unlike the reference's naive
    forward iteration, this uses the convergent inverse-iteration solver and
    returns the SMALLEST modes (what a modal analysis wants); the literal
    behavioral twin is solvers.modal.naive_modal_solver."""
    op = _op(jnp.asarray(K_local, dtype), elements, num_nodes, 3)
    Mdiag = modal_mod.lumped_mass_diagonal(jnp.asarray(M_local, dtype),
                                           op.plan)
    cons = _fixed_cons(num_nodes, rbe2_node_ids, 3, dtype)
    lam, modes, _ = modal_mod.modal_solver(op, Mdiag, (num_nodes, 3),
                                           num_eigs, constraints=cons,
                                           max_iter=max_iter)
    return lam, modes
