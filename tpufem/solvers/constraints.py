"""SPC / RBE2 / RBE3 constraint handling, fully vectorized.

Ingest format is the reference's dict-list schema (solver/solver.py:396-651):

    spc_list  = [{'node': n, 'dofs': [...], 'value': v}, ...]
    rbe2_list = [{'master': m, 'slaves': [...], 'dofs': [...]}, ...]
    rbe3_list = [{'master': m, 'slaves': [...], 'dofs': [...],
                  'weights': [...]}, ...]

Enforcement semantics match reference enforce_constraints /
new_enforce_constraints (solver/solver.py:478-510, 665-700): SPC pins exact
values, RBE2 copies master -> slaves, RBE3 sets the master to the weighted
slave average.  The reference's per-constraint Python loop for RBE3
(solver/solver.py:684-700) is replaced by one segment-sum.
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_static
@dataclasses.dataclass(frozen=True)
class _CMeta:
    n_nodes: int
    dof_per_node: int


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Constraints:
    """Flattened constraint tables over n_nodes * dof_per_node DOFs."""

    free_mask: jnp.ndarray     # [n_dof] 1.0 free / 0.0 constrained (SPC+RBE2 slaves)
    spc_dofs: jnp.ndarray      # [S] int32
    spc_values: jnp.ndarray    # [S]
    rbe2_slave_dofs: jnp.ndarray   # [R2] int32
    rbe2_master_dofs: jnp.ndarray  # [R2] int32
    rbe3_slave_dofs: jnp.ndarray   # [R3] int32
    rbe3_weights: jnp.ndarray      # [R3]
    rbe3_cid: jnp.ndarray          # [R3] int32 constraint id per entry
    rbe3_master_dofs: jnp.ndarray  # [C3] int32 one master DOF per constraint
    rbe3_weight_sums: jnp.ndarray  # [C3]
    mask2d: jnp.ndarray        # [N, nd] free_mask reshaped (layout-friendly)
    spc_const2d: jnp.ndarray   # [N, nd] SPC values scattered (else zeros)
    meta: _CMeta

    # -- factory ----------------------------------------------------------
    @staticmethod
    def build(n_nodes: int, dof_per_node: int = 3,
              spc_list: Optional[Sequence[dict]] = None,
              rbe2_list: Optional[Sequence[dict]] = None,
              rbe3_list: Optional[Sequence[dict]] = None,
              fixed_nodes=None, dtype=np.float64) -> "Constraints":
        nd = dof_per_node
        n_dof = n_nodes * nd
        mask = np.ones(n_dof, dtype=dtype)

        spc_dofs, spc_vals = [], []
        if fixed_nodes is not None:
            for n in np.asarray(fixed_nodes).reshape(-1):
                for d in range(nd):
                    spc_dofs.append(int(n) * nd + d)
                    spc_vals.append(0.0)
        for spc in (spc_list or []):
            for d in spc["dofs"]:
                spc_dofs.append(int(spc["node"]) * nd + int(d))
                spc_vals.append(float(spc["value"]))

        r2_s, r2_m = [], []
        for r in (rbe2_list or []):
            for s in r["slaves"]:
                for d in r["dofs"]:
                    r2_s.append(int(s) * nd + int(d))
                    r2_m.append(int(r["master"]) * nd + int(d))

        r3_s, r3_w, r3_cid, r3_m, r3_ws = [], [], [], [], []
        cid = 0
        for r in (rbe3_list or []):
            ws = r["weights"]
            for d in r["dofs"]:
                for i, s in enumerate(r["slaves"]):
                    r3_s.append(int(s) * nd + int(d))
                    r3_w.append(float(ws[i]))
                    r3_cid.append(cid)
                r3_m.append(int(r["master"]) * nd + int(d))
                r3_ws.append(float(sum(ws)))
                cid += 1

        if spc_dofs:
            mask[np.asarray(spc_dofs, dtype=np.int64)] = 0.0
        if r2_s:
            mask[np.asarray(r2_s, dtype=np.int64)] = 0.0
        spc_const = np.zeros(n_dof, dtype=dtype)
        if spc_dofs:
            spc_const[np.asarray(spc_dofs, dtype=np.int64)] = \
                np.asarray(spc_vals, dtype=dtype)

        def arr(x, dt):
            return jnp.asarray(np.asarray(x, dtype=dt).reshape(-1))

        return Constraints(
            free_mask=jnp.asarray(mask),
            spc_dofs=arr(spc_dofs, np.int32),
            spc_values=arr(spc_vals, dtype),
            rbe2_slave_dofs=arr(r2_s, np.int32),
            rbe2_master_dofs=arr(r2_m, np.int32),
            rbe3_slave_dofs=arr(r3_s, np.int32),
            rbe3_weights=arr(r3_w, dtype),
            rbe3_cid=arr(r3_cid, np.int32),
            rbe3_master_dofs=arr(r3_m, np.int32),
            rbe3_weight_sums=arr(r3_ws, dtype),
            mask2d=jnp.asarray(mask.reshape(n_nodes, nd)),
            spc_const2d=jnp.asarray(spc_const.reshape(n_nodes, nd)),
            meta=_CMeta(int(n_nodes), nd),
        )

    @staticmethod
    def fixed(n_nodes: int, fixed_nodes, dof_per_node: int = 3,
              dtype=np.float64) -> "Constraints":
        """Homogeneous all-DOF pin of the given nodes (reference 'rbe2' arg)."""
        return Constraints.build(n_nodes, dof_per_node, fixed_nodes=fixed_nodes,
                                 dtype=dtype)

    # -- enforcement ------------------------------------------------------
    @property
    def shape2d(self):
        return (self.meta.n_nodes, self.meta.dof_per_node)

    def _flat(self, x):
        return x.reshape(-1)

    def apply_state(self, u):
        """Set constrained values on a displacement-like field [N, nd]."""
        if not (self.rbe2_slave_dofs.size or self.rbe3_slave_dofs.size):
            # SPC-only fast path: mask + constant add — keeps the [N, nd]
            # layout (the flat reshape relayouts every CG iteration on TPU)
            out = u * self.mask2d.astype(u.dtype)
            if self.spc_values.size:
                out = out + self.spc_const2d.astype(u.dtype)
            return out
        uf = self._flat(u)
        if self.spc_dofs.size:
            uf = uf.at[self.spc_dofs].set(self.spc_values.astype(uf.dtype))
        if self.rbe2_slave_dofs.size:
            uf = uf.at[self.rbe2_slave_dofs].set(uf[self.rbe2_master_dofs])
        if self.rbe3_slave_dofs.size:
            num = jax.ops.segment_sum(
                self.rbe3_weights.astype(uf.dtype) * uf[self.rbe3_slave_dofs],
                self.rbe3_cid, num_segments=self.rbe3_master_dofs.shape[0])
            uf = uf.at[self.rbe3_master_dofs].set(
                num / self.rbe3_weight_sums.astype(uf.dtype))
        return uf.reshape(self.shape2d)

    def project_residual(self, r):
        """Zero constrained entries of a residual-like field [N, nd]."""
        return r * self.mask2d.astype(r.dtype)

    @property
    def has_inhomogeneous(self) -> bool:
        return bool(self.spc_values.size)
