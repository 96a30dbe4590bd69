"""Deterministic gather/scatter plans for the matrix-free operator.

The reference's hottest reduction is an atomic ``index_add`` with
nondeterministic float ordering (solver/element.py:460, SURVEY.md 3.3).
The TPU-native replacement was measured against every XLA indexing
primitive on real hardware (see BENCH notes):

* flat 1-D gather/scatter cost ~7-16 ns per SCALAR on TPU (serialized) —
  the naive gather->GEMV->scatter-add SpMV is 50-100x slower than its
  arithmetic;
* ROW gathers (``u[conn]`` of [N, nd] rows) cost ~2.4 ns per ROW — ~10x
  cheaper per scalar;
* therefore both directions are expressed as row gathers:
  - gather:  u[conn]                                  [M, k, nd]
  - scatter: node-binned gather-reduce — for each node, gather its (at
    most W) incident element-lane rows from Fe [M*k, nd] (host-precomputed
    incidence table, padding entries point at an appended zero row) and
    sum over the bin axis.  Exact, bitwise deterministic (fixed incidence
    order), no atomics, no segment scan.

The sorted permutation/segments of the original design are kept for
value-stream assembly (BSR) and as a fallback.
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


def _stable_argsort_i32(flat: np.ndarray) -> np.ndarray:
    from .. import native
    perm = native.radix_argsort(flat)
    if perm is None:
        perm = np.argsort(flat, kind="stable").astype(np.int32)
    return perm


@jax.tree_util.register_static
@dataclasses.dataclass(frozen=True)
class _PlanMeta:
    n_dof: int
    n_nodes: int
    dof_per_node: int
    n_rows: int                    # M * k
    class_widths: Tuple[int, ...]  # bin width per valence class


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ScatterPlan:
    """Precomputed deterministic gather/scatter for one element block."""

    conn: jnp.ndarray      # [M, k] int32 — row-gather indices
    dofs: jnp.ndarray      # [M, k*nd] int32 — flat DOF ids (assembly/compat)
    inc: Tuple[jnp.ndarray, ...]  # per class: [Nc*Wc] int32 rows into Fe
    inv_order: jnp.ndarray # [N] int32 — position of node n in class ordering
    perm: jnp.ndarray      # [M*k*nd] int32 stable sort (assembly fallback)
    segments: jnp.ndarray  # [M*k*nd] int32 sorted DOF ids
    meta: _PlanMeta

    @property
    def n_dof(self) -> int:
        return self.meta.n_dof

    @staticmethod
    def build(conn, n_nodes: int, dof_per_node: int = 3,
              max_classes: int = 4) -> "ScatterPlan":
        conn = np.asarray(conn)
        M, k = conn.shape
        nd = dof_per_node
        dofs = element_dofs(conn, nd)
        flat = dofs.reshape(-1)
        perm = _stable_argsort_i32(flat)
        segments = flat[perm]

        # node incidence lists over element-lane rows
        rows = conn.reshape(-1).astype(np.int64)          # node id per (e, l)
        counts = np.bincount(rows, minlength=n_nodes)
        order = _stable_argsort_i32(rows.astype(np.int32)).astype(np.int64)
        starts = np.zeros(n_nodes + 1, np.int64)
        starts[1:] = np.cumsum(counts)

        # valence classes: nodes sorted by valence, widths rounded up to the
        # next power of two, at most `max_classes` classes.  Cuts the padded
        # gather volume ~3x vs a single max-width table (mid-edge nodes have
        # valence ~6 while corner nodes reach ~24 on tet meshes).
        node_order = np.argsort(counts, kind="stable")
        sorted_counts = counts[node_order]
        widths = np.maximum(1, 1 << np.ceil(
            np.log2(np.maximum(sorted_counts, 1))).astype(np.int64))
        uniq_w = sorted(set(widths.tolist()))
        while len(uniq_w) > max_classes:
            # merge the two smallest-volume adjacent classes
            vols = []
            for i in range(len(uniq_w) - 1):
                sel = (widths >= uniq_w[i]) & (widths <= uniq_w[i + 1])
                vols.append(int(sel.sum()) * uniq_w[i + 1])
            j = int(np.argmin(vols))
            widths[widths == uniq_w[j]] = uniq_w[j + 1]
            uniq_w.pop(j)
        inc_arrays = []
        class_widths = []
        pos = 0
        for w in uniq_w:
            sel = np.nonzero(widths == w)[0]
            if sel.size == 0:
                continue
            nodes_c = node_order[sel]
            inc_c = np.full((sel.size, w), M * k, dtype=np.int32)
            for row_i, nd_id in enumerate(nodes_c):
                c = counts[nd_id]
                inc_c[row_i, :c] = order[starts[nd_id]:starts[nd_id] + c]
            inc_arrays.append(jnp.asarray(inc_c.reshape(-1)))
            class_widths.append(int(w))
            pos += sel.size
        inv_order = np.empty(n_nodes, np.int64)
        inv_order[node_order] = np.arange(n_nodes)

        return ScatterPlan(
            conn=jnp.asarray(conn.astype(np.int32)),
            dofs=jnp.asarray(dofs),
            inc=tuple(inc_arrays),
            inv_order=jnp.asarray(inv_order.astype(np.int32)),
            perm=jnp.asarray(perm),
            segments=jnp.asarray(segments),
            meta=_PlanMeta(int(n_nodes) * nd, int(n_nodes), nd, M * k,
                           tuple(class_widths)),
        )

    # -- fast paths ------------------------------------------------------
    def gather_nodes(self, u2d):
        """u [N, nd] -> per-element nodal values [M, k, nd] (row gather)."""
        return u2d[self.conn]

    def gather(self, u_flat):
        """u_flat [n_dof] -> [M, k*nd] (row-gather formulation)."""
        m = self.meta
        u2d = u_flat.reshape(m.n_nodes, m.dof_per_node)
        g = self.gather_nodes(u2d)
        return g.reshape(g.shape[0], -1)

    def scatter(self, element_values):
        """[M, k*nd] element values -> [n_dof] deterministic sum.

        Valence-classed gather-reduce: pad Fe rows with one zero row;
        padding incidence entries point there, so no mask is needed; per
        class a flat take + fixed-width reshape-sum replaces the scatter.
        """
        m = self.meta
        nd = m.dof_per_node
        rows = element_values.reshape(m.n_rows, nd)
        padded = jnp.concatenate(
            [rows, jnp.zeros((1, nd), rows.dtype)], axis=0)
        parts = []
        for inc_c, w in zip(self.inc, m.class_widths):
            g = jnp.take(padded, inc_c, axis=0)          # [Nc*w, nd]
            parts.append(g.reshape(-1, w, nd).sum(axis=1))
        y_sorted = jnp.concatenate(parts, axis=0)        # class node order
        return jnp.take(y_sorted, self.inv_order, axis=0).reshape(-1)

    # -- exact sorted-stream fallback (kept for validation) --------------
    def scatter_sorted(self, element_values):
        vals = element_values.reshape(-1)[self.perm]
        return jax.ops.segment_sum(
            vals, self.segments, num_segments=self.meta.n_dof,
            indices_are_sorted=True)
