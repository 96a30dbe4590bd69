"""Mixed solid+shell systems on the flagship packed layout.

BASELINE config 3 (tets + wedges + quad shells in one assembly, mirroring
the reference's static_structure_solver, solver/solver.py:11-135)
previously fell back to the ScatterPlan operators: `operator="packed"`
accepted exactly one solid block.  Here the LARGEST solid block rides the
packed partial-assembly operator (its plan defines the node renumbering
and the [Nb, 384] tile layout); the remaining solid blocks and the shell
blocks bridge through the [N, 3] / [N, 6] view once per apply.  The CG
state is [P, Nb, 384] with P = 1 (solids only) or 2 (plane 0 =
translations, plane 1 = rotations), so every elementwise solver pass
stays a dense packed-tile pass; only the secondary blocks pay the
unpack/pack bridge, which is O(N) against the primary block's O(M_1).

Constraint semantics match solvers.constraints.Constraints exactly: the
reference's RBE2/RBE3 couplings are component-wise (solver/solver.py:
437-476, 603-651), so each plane carries its own rows
(PackedConstraints.build(comp=0|3)).  DOFs with no stiffness (rotations
away from shells, the drilling theta_z) are masked out of the Krylov
space like the assembled driver does (solvers/static.py live mask).
"""
from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .packed import PackedConstraints, PackedPartialOperator, PackedPlan
from .operator import MatrixFreeOperator
from .scatter import ScatterPlan

SOLID_TYPES = ("c3d4", "c3d6", "c3d8", "c3d10", "c3d20", "c3d15")
SHELL_TYPES = ("s3", "s4")


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class PackedMixedOperator:
    """X [P, Nb, 384] -> K X in the same layout (P = 1 or 2 planes)."""

    primary: PackedPartialOperator
    solids: tuple                  # secondary MatrixFreeOperator [N, 3] ops
    shells: tuple                  # ShellOperator [N, 6] ops

    def __call__(self, X):
        plan = self.primary.plan
        Yt = self.primary(X[0])
        if self.solids or self.shells:
            u3 = plan.unpack(X[0])
            F3 = jnp.zeros_like(u3)
            for op in self.solids:
                F3 = F3 + op(u3)
            if self.shells:
                ur = plan.unpack(X[1])
                u6 = jnp.concatenate([u3, ur], axis=1)
                F6 = self.shells[0](u6)
                for op in self.shells[1:]:
                    F6 = F6 + op(u6)
                F3 = F3 + F6[:, :3]
                Yr = plan.pack(F6[:, 3:])
            else:
                Yr = None
            Yt = Yt + plan.pack(F3)
        else:
            Yr = None
        if X.shape[0] == 1:
            return Yt[None]
        if Yr is None:
            Yr = jnp.zeros_like(Yt)
        return jnp.stack([Yt, Yr])

    def diagonal(self):
        """Assembled diagonal in the packed [P, Nb, 384] layout."""
        plan = self.primary.plan
        dt = self.primary.diagonal()
        d3 = jnp.zeros((plan.meta.n_nodes, 3), dt.dtype)
        dr6 = None
        for op in self.solids:
            d3 = d3 + op.diagonal().reshape(-1, 3).astype(dt.dtype)
        for op in self.shells:
            d6 = op.diagonal().reshape(-1, 6).astype(dt.dtype)
            d3 = d3 + d6[:, :3]
            dr6 = d6[:, 3:] if dr6 is None else dr6 + d6[:, 3:]
        dt = dt + plan.pack(d3)
        if dr6 is None:
            return dt[None]
        return jnp.stack([dt, plan.pack(dr6)])


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class MixedConstraints:
    """Per-plane PackedConstraints with the live-DOF mask folded in."""

    planes: tuple                  # (t,) or (t, r) PackedConstraints

    def apply_state(self, X):
        return jnp.stack([pc.apply_state(X[i])
                          for i, pc in enumerate(self.planes)])

    def project_residual(self, r):
        return jnp.stack([pc.project_residual(r[i])
                          for i, pc in enumerate(self.planes)])


class PackedMixedSystem:
    """One-call mixed static system on the packed layout.

    blocks: {etype: connectivity} with >= 1 solid block; any number of
    shell blocks.  material: the reference dict schema ({'E', 'nu',
    'membrane': (E, nu, t), 'bending': (E, nu, t)}).
    """

    def __init__(self, coords, blocks: Dict[str, np.ndarray],
                 material: dict, n_nodes: Optional[int] = None,
                 constraints=None, fixed_nodes=None,
                 precondition: bool = True, dtype=None,
                 interpret: Optional[bool] = None):
        from ..elements import shell as shell_mod
        from ..elements import solid as solid_mod
        from ..solvers.constraints import Constraints

        blocks = {et.lower(): np.asarray(c) for et, c in blocks.items()}
        solids = {et: c for et, c in blocks.items() if et in SOLID_TYPES}
        shells = {et: c for et, c in blocks.items() if et in SHELL_TYPES}
        if not solids:
            raise ValueError("PackedMixedSystem needs >= 1 solid block "
                             f"(got {list(blocks)}); pure-shell models run "
                             "through static_structure_solver's assembled "
                             "path")
        unknown = set(blocks) - set(solids) - set(shells)
        if unknown:
            raise ValueError(f"unsupported element types: {sorted(unknown)}")
        coords_np = np.asarray(coords)
        N = int(n_nodes) if n_nodes is not None else coords_np.shape[0]
        dtype = np.dtype(dtype or jax.dtypes.canonicalize_dtype(
            coords_np.dtype))
        coords_j = jnp.asarray(coords_np, dtype)

        # primary = the solid block with the most element DOFs
        primary_et = max(solids, key=lambda et: solids[et].size)
        prim = PackedPartialOperator.build(
            coords_j, solids[primary_et], primary_et,
            material["E"], material["nu"], n_nodes=N, dtype=dtype,
            interpret=interpret)
        sec = []
        for et, c in solids.items():
            if et == primary_et:
                continue
            K = solid_mod.stiffness(coords_j, jnp.asarray(c), et,
                                    material["E"], material["nu"])
            sec.append(MatrixFreeOperator(K=K,
                                          plan=ScatterPlan.build(c, N, 3)))
        sh = []
        for et, c in shells.items():
            cj = jnp.asarray(c)
            K = shell_mod.shell_stiffness(coords_j, cj,
                                          material["membrane"],
                                          material["bending"])
            unit = shell_mod.local_frames(coords_j, cj)
            sh.append(shell_mod.ShellOperator(
                K=K, unit=unit, plan=ScatterPlan.build(c, N, 6)))
        self.op = PackedMixedOperator(primary=prim, solids=tuple(sec),
                                      shells=tuple(sh))
        self.has_rot = bool(sh)

        nd = 6 if self.has_rot else 3
        if constraints is None:
            constraints = Constraints.fixed(
                N, fixed_nodes if fixed_nodes is not None else [], nd,
                dtype=dtype)
        if constraints.meta.dof_per_node < nd:
            raise ValueError(
                f"constraints carry {constraints.meta.dof_per_node} DOF/"
                f"node but the model has shells (needs {nd})")
        plan = prim.plan
        pcs = [PackedConstraints.build(constraints, plan, dtype, comp=0)]
        if self.has_rot:
            pcs.append(PackedConstraints.build(constraints, plan, dtype,
                                               comp=3))
        # fold the live-DOF mask in: DOFs with zero assembled diagonal
        # (rotations away from shells, drilling theta_z) must not enter
        # the Krylov space (solvers/static.py does the same via `live`)
        diag = self.op.diagonal()
        live = (jnp.abs(diag) > 0).astype(diag.dtype)
        self.pc = MixedConstraints(planes=tuple(
            dataclasses.replace(pc, mask=pc.mask * live[i])
            for i, pc in enumerate(pcs)))
        if precondition:
            minv = jnp.where(jnp.abs(diag) > 0,
                             1.0 / jnp.where(diag == 0, 1.0, diag), 0.0)
            self.M_inv = minv * jnp.stack([pc.mask for pc in
                                           self.pc.planes])
        else:
            self.M_inv = None
        self._solve = {}

    # ------------------------------------------------------------------
    def _pack6(self, v):
        plan = self.op.primary.plan
        v = np.asarray(v)
        planes = [plan.pack_np(v[:, :3].astype(self.pc.planes[0].mask.dtype))]
        if self.has_rot:
            r = (v[:, 3:6] if v.shape[1] >= 6
                 else np.zeros_like(v[:, :3]))
            planes.append(plan.pack_np(r.astype(planes[0].dtype)))
        return jnp.asarray(np.stack(planes))

    def _unpack6(self, X):
        plan = self.op.primary.plan
        u3 = plan.unpack(X[0])
        if self.has_rot:
            return jnp.concatenate([u3, plan.unpack(X[1])], axis=1)
        return jnp.concatenate([u3, jnp.zeros_like(u3)], axis=1)

    def solve(self, b, x0=None, tol: float = 1e-8, max_iter: int = 1000,
              dot_dtype=None):
        """b [N, >=3] -> (u [N, 6], SolveInfo); one XLA program."""
        from ..solvers.cg import cg

        key = (float(tol), int(max_iter), str(dot_dtype))
        if key not in self._solve:
            def run(op, bX, x0X, pc, minv):
                return cg(op, pc.project_residual(bX), constraints=pc,
                          M_inv=minv, x0=x0X, tol=tol, max_iter=max_iter,
                          dot_dtype=dot_dtype)
            self._solve[key] = jax.jit(run)
        bX = self._pack6(b)
        x0X = self._pack6(x0) if x0 is not None else jnp.zeros_like(bX)
        uX, info = self._solve[key](self.op, bX, x0X, self.pc,
                                    self.M_inv if self.M_inv is not None
                                    else jnp.ones_like(bX))
        return self._unpack6(uX), info
