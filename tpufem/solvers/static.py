"""Top-level static driver: mixed solid+shell assembly + fused CG solve.

Capability parity with reference static_structure_solver (solver/solver.py:11-135):
state is [N, 6] (solids contribute to the translational columns), any mix of
c3d4/c3d6/c3d8/s3/s4 — extended here to all supported types including
c3d10/c3d20/c3d15 — material dict {'E','nu','membrane','bending'}, fixed-node
projection, early exits, residual telemetry.  The entire solve (operator +
CG loop) compiles to a single XLA program.
"""
from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..elements import shell as shell_mod
from ..elements import solid as solid_mod
from ..elements.tables import SHELL_TYPES, SOLID_TYPES
from ..ops.operator import MatrixFreeOperator
from ..ops.scatter import ScatterPlan
from .cg import SolveInfo, cg
from .constraints import Constraints


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class StaticModel:
    """Assembled mixed-element model: an operator on u[N, 6]."""

    solid_ops: tuple      # of MatrixFreeOperator (3-dof)
    shell_ops: tuple      # of ShellOperator (6-dof)

    def __call__(self, u):
        F = jnp.zeros_like(u)
        for op in self.solid_ops:
            F = F.at[:, :3].add(op(u[:, :3]))
        for op in self.shell_ops:
            F = F + op(u)
        return F

    def diagonal6(self):
        """Assembled [N, 6] diagonal (zeros where no stiffness exists)."""
        n = None
        d6 = None
        for op in self.solid_ops:
            d = op.diagonal().reshape(-1, 3)
            if d6 is None:
                d6 = jnp.zeros((d.shape[0], 6), dtype=d.dtype)
            d6 = d6.at[:, :3].add(d)
        for op in self.shell_ops:
            d = op.diagonal().reshape(-1, 6)
            d6 = d if d6 is None else d6 + d
        return d6

    def jacobi_preconditioner(self):
        d = self.diagonal6()
        return jnp.where(jnp.abs(d) > 0, 1.0 / jnp.where(d == 0, 1.0, d), 0.0)


def build_static_model(coords, blocks: Dict[str, "np.ndarray"], material: dict,
                       dtype=None) -> StaticModel:
    """Assemble per-type element stiffness + scatter plans.

    blocks: {etype: connectivity [M, k]} with etype in SOLID_TYPES/SHELL_TYPES.
    material: {'E', 'nu'} for solids, {'membrane', 'bending'} for shells
    (reference material dict schema, solver/solver.py:36-49).
    """
    coords = jnp.asarray(coords) if dtype is None else jnp.asarray(coords, dtype)
    N = coords.shape[0]
    solid_ops, shell_ops = [], []
    for etype, conn in blocks.items():
        et = etype.lower()
        conn_np = np.asarray(conn)
        conn_j = jnp.asarray(conn_np)
        if et in SOLID_TYPES:
            K = solid_mod.stiffness(coords, conn_j, et,
                                    material["E"], material["nu"])
            plan = ScatterPlan.build(conn_np, N, 3)
            solid_ops.append(MatrixFreeOperator(K=K, plan=plan))
        elif et in SHELL_TYPES:
            K = shell_mod.shell_stiffness(coords, conn_j,
                                          material["membrane"],
                                          material["bending"])
            unit = shell_mod.local_frames(coords, conn_j)
            plan = ScatterPlan.build(conn_np, N, 6)
            shell_ops.append(shell_mod.ShellOperator(K=K, unit=unit, plan=plan))
        else:
            raise ValueError(f"Unsupported element type: {etype}")
    return StaticModel(solid_ops=tuple(solid_ops), shell_ops=tuple(shell_ops))


def static_structure_solver(coords, force, fixed=None, *, material: dict,
                            c3d4=None, c3d6=None, c3d8=None, c3d10=None,
                            c3d20=None, c3d15=None, s3=None, s4=None,
                            blocks: Optional[Dict] = None,
                            constraints: Optional[Constraints] = None,
                            u_init=None, tol: float = 1e-10,
                            max_iter: int = 1000, precondition: bool = False,
                            dtype=None, jit: bool = True,
                            operator: str = "assembled", dot_dtype=None):
    """Solve the mixed static problem; returns (u [N,6], SolveInfo).

    Signature parity with reference static_structure_solver (solver/solver.py:11)
    plus: all element types, optional Jacobi preconditioning, full Constraints
    objects instead of only a fixed-node list.  The WHOLE pipeline — element
    stiffness assembly, preconditioner, and the CG loop — traces into one XLA
    program (eager dispatch on a tunneled TPU backend costs ~0.5 s/op).

    dot_dtype: accumulate the CG scalar recurrences in this dtype while
    vectors stay in ``dtype`` — the f32-storage / wide-scalar policy for
    TPU (SURVEY.md hard part 4; the reference runs all-f64 on GPU,
    solver/solver.py:11).
    """
    blocks = dict(blocks or {})
    for name, conn in (("c3d4", c3d4), ("c3d6", c3d6), ("c3d8", c3d8),
                       ("c3d10", c3d10), ("c3d20", c3d20), ("c3d15", c3d15),
                       ("s3", s3), ("s4", s4)):
        if conn is not None:
            blocks[name] = conn
    force_np_dtype = np.asarray(force).dtype if dtype is None else np.dtype(dtype)
    N = np.asarray(force).shape[0]
    if constraints is None:
        constraints = Constraints.fixed(N, fixed if fixed is not None else [],
                                        6, dtype=force_np_dtype)
    if operator == "packed":
        # flagship path: the packed-layout geometry-factor operator with
        # full SPC/RBE2/RBE3 support (ops.packed.PackedConstraints)
        ets = [et.lower() for et in blocks]
        if not any(et in SOLID_TYPES for et in ets):
            raise ValueError("operator='packed' needs >= 1 solid element "
                             f"block, got {ets}")
        if len(ets) == 1 and ets[0] in SOLID_TYPES:
            from ..ops.packed import PackedPartialOperator, PackedSystem
            et = ets[0]
            op = PackedPartialOperator.build(
                jnp.asarray(coords, force_np_dtype),
                np.asarray(next(iter(blocks.values()))),
                et, material["E"], material["nu"], n_nodes=N,
                dtype=force_np_dtype)
            system = PackedSystem(
                op, constraints=constraints,
                precondition=(precondition if isinstance(precondition, str)
                              else ("jacobi" if precondition else None)))
            b3 = np.asarray(force)[:, :3]
            x03 = np.asarray(u_init)[:, :3] if u_init is not None else None
            u3, info = system.solve(b3, x0=x03, tol=tol, max_iter=max_iter,
                                    dot_dtype=dot_dtype)
            u6 = jnp.zeros((N, 6), u3.dtype).at[:, :3].set(u3)
            return u6, info
        # mixed solids (+shells): largest solid block rides the packed
        # operator, the rest bridge through [N, 3]/[N, 6] per apply
        from ..ops.packed_mixed import PackedMixedSystem
        system = PackedMixedSystem(
            coords, blocks, material, n_nodes=N, constraints=constraints,
            precondition=bool(precondition), dtype=force_np_dtype)
        u6, info = system.solve(np.asarray(force), x0=u_init, tol=tol,
                                max_iter=max_iter, dot_dtype=dot_dtype)
        return u6, info
    # Host-side once: scatter plans (numpy sorts).
    plans = {et: ScatterPlan.build(np.asarray(conn), N,
                                   3 if et.lower() in SOLID_TYPES else 6)
             for et, conn in blocks.items()}
    cplans = {}
    if operator == "clustered":
        from ..ops.clustered import ClusterPlan
        cplans = {et: ClusterPlan.build(np.asarray(c), N, 3)
                  for et, c in blocks.items() if et.lower() in SOLID_TYPES}
    conns = {et: jnp.asarray(np.asarray(c)) for et, c in blocks.items()}

    def _solve(coords_in, b, x0, cons):
        model = _build_model_traced(coords_in, conns, plans, material,
                                    operator, cplans)
        # DOFs with no stiffness (w/theta_z of pure-shell, rotations of
        # pure-solid models) must not enter the Krylov space.
        d6 = model.diagonal6()
        live = (jnp.abs(d6) > 0).astype(b.dtype)
        Minv = model.jacobi_preconditioner() if precondition else None
        bb = b * live

        class _C:
            def project_residual(self, r):
                return cons.project_residual(r * live)

            def apply_state(self, u):
                return cons.apply_state(u)

        return cg(model, bb, constraints=_C(), M_inv=Minv, x0=x0, tol=tol,
                  max_iter=max_iter, dot_dtype=dot_dtype)

    coords_j = jnp.asarray(coords, force_np_dtype)
    force_j = jnp.asarray(force, force_np_dtype)
    x0 = (jnp.asarray(u_init, force_np_dtype) if u_init is not None
          else jnp.zeros_like(force_j))
    fn = jax.jit(_solve) if jit else _solve
    return fn(coords_j, force_j, x0, constraints)


def _build_model_traced(coords, conns: Dict, plans: Dict, material: dict,
                        operator: str = "assembled",
                        cplans: Optional[Dict] = None) -> StaticModel:
    """Assemble the StaticModel inside a trace (all stiffness fused)."""
    solid_ops, shell_ops = [], []
    for et, conn in conns.items():
        etl = et.lower()
        if etl in SOLID_TYPES:
            if operator == "partial":
                from ..ops.partial import PartialAssemblyOperator
                solid_ops.append(PartialAssemblyOperator.build(
                    coords, conn, etl, material["E"], material["nu"],
                    plan=plans[et], affine=False))
                continue
            K = solid_mod.stiffness(coords, conn, etl, material["E"],
                                    material["nu"])
            if operator == "clustered":
                from ..ops.clustered import ClusteredOperator
                solid_ops.append(ClusteredOperator.build(
                    K, conn, plans[et].meta.n_nodes, 3, plan=cplans[et]))
                continue
            solid_ops.append(MatrixFreeOperator(K=K, plan=plans[et]))
        else:
            K = shell_mod.shell_stiffness(coords, conn, material["membrane"],
                                          material["bending"])
            unit = shell_mod.local_frames(coords, conn)
            shell_ops.append(shell_mod.ShellOperator(K=K, unit=unit,
                                                     plan=plans[et]))
    return StaticModel(solid_ops=tuple(solid_ops), shell_ops=tuple(shell_ops))
