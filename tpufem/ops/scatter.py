"""Deterministic scatter-assembly plans.

The reference's hottest reduction is an atomic ``index_add`` with
nondeterministic float ordering (solver/element.py:460, SURVEY.md 3.3).
On TPU we precompute, once per mesh at setup time, a stable sort of the
element-DOF index stream; the runtime reduction is then a
``jax.ops.segment_sum`` over sorted indices — bitwise-stable across runs
and independent of element order within a segment only through the fixed
sorted permutation (stable sort => fixed order).
"""
from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def element_dofs(conn, dof_per_node: int = 3) -> np.ndarray:
    """[M, k*dof] global DOF ids from connectivity [M, k] (host-side)."""
    conn = np.asarray(conn)
    M, k = conn.shape
    d = conn[:, :, None] * dof_per_node + np.arange(dof_per_node)[None, None, :]
    return d.reshape(M, k * dof_per_node).astype(np.int32)


@jax.tree_util.register_static
@dataclasses.dataclass(frozen=True)
class _PlanMeta:
    n_dof: int


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ScatterPlan:
    """Precomputed deterministic scatter of [M, d] element values to [n_dof].

    ``perm`` is a stable argsort of the flattened DOF stream; ``segments``
    the sorted DOF ids.  Built once on host; arrays live on device.
    """

    dofs: jnp.ndarray      # [M, d] int32 — also used for the gather
    perm: jnp.ndarray      # [M*d] int32
    segments: jnp.ndarray  # [M*d] int32 (sorted)
    meta: _PlanMeta

    @property
    def n_dof(self) -> int:
        return self.meta.n_dof

    @staticmethod
    def build(conn, n_nodes: int, dof_per_node: int = 3) -> "ScatterPlan":
        dofs = element_dofs(conn, dof_per_node)
        flat = dofs.reshape(-1)
        from .. import native
        perm = native.radix_argsort(flat)
        if perm is None:
            perm = np.argsort(flat, kind="stable").astype(np.int32)
        segments = flat[perm]
        return ScatterPlan(
            dofs=jnp.asarray(dofs),
            perm=jnp.asarray(perm),
            segments=jnp.asarray(segments),
            meta=_PlanMeta(int(n_nodes) * dof_per_node),
        )

    def gather(self, u_flat):
        """u_flat[n_dof] -> per-element DOF values [M, d]."""
        return u_flat[self.dofs]

    def scatter(self, element_values):
        """[M, d] element values -> [n_dof] deterministic sum."""
        vals = element_values.reshape(-1)[self.perm]
        return jax.ops.segment_sum(
            vals, self.segments, num_segments=self.meta.n_dof,
            indices_are_sorted=True,
        )
