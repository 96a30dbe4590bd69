"""Deterministic gather/scatter plans for the matrix-free operator.

The reference's hottest reduction is an atomic ``index_add`` with
nondeterministic float ordering (solver/element.py:460, SURVEY.md 3.3).
The TPU-native replacement was designed from measurements of every XLA
indexing primitive on real hardware:

* flat 1-D gather/scatter cost ~7-16 ns per SCALAR on TPU (serialized);
* ROW gathers cost ~2-3 ns per ROW — an order of magnitude cheaper per
  scalar — so both directions are expressed as row operations:
  - gather:  ``u[conn]``                               [M, k, nd]
  - scatter: per-node incidence bins over Fe rows, evaluated as flat
    ``take`` + fixed-width reshape-sum (padding entries point at an
    appended zero row; exact, bitwise deterministic, no atomics);
* take throughput degrades ~5x once the source table exceeds ~2 MB, and
  batched (vmapped) takes do NOT restore it, but UNROLLED takes from
  small per-chunk tables do — so large meshes use a two-stage reduction:
  stage 1 reduces each element-chunk's rows into per-(node, chunk)
  sub-bins from ~1 MB tables; stage 2 combines the few sub-bins per node
  from the (small) stage-1 output table;
* bins are grouped into <=4 power-of-two width classes by valence so the
  padded gather volume stays within ~1.3x of the true entry count.

The sorted permutation/segments of the original design are kept for
value-stream assembly (BSR) and as a validation fallback.
"""
from __future__ import annotations

import dataclasses
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# Above ~this many Fe rows the single-table takes fall off the fast path
# (the TPU gather engine degrades once the source exceeds ~2 MB); measured
# sweep put the optimum near 32k rows (~400 KB tables).
_CHUNK_ROWS = 32768
_MAX_UNROLL_CHUNKS = 64


def element_dofs(conn, dof_per_node: int = 3) -> np.ndarray:
    """[M, k*dof] global DOF ids from connectivity [M, k] (host-side)."""
    conn = np.asarray(conn)
    M, k = conn.shape
    d = conn[:, :, None] * dof_per_node + np.arange(dof_per_node)[None, None, :]
    return d.reshape(M, k * dof_per_node).astype(np.int32)


def _stable_argsort_i32(flat: np.ndarray) -> np.ndarray:
    from .. import native
    perm = native.radix_argsort(np.ascontiguousarray(flat, np.int32))
    if perm is None:
        perm = np.argsort(flat, kind="stable").astype(np.int32)
    return perm


def _classed_bins(keys: np.ndarray, positions: np.ndarray, pad_index: int,
                  max_classes: int = 4):
    """Group entry `positions` into per-key bins, classed by width.

    Returns (classes, key_order) where classes is a list of
    (width, inc_flat [n_c * width] int32) and key_order the unique keys in
    emission order (class-major, key-sorted within class).
    """
    keys = np.asarray(keys, np.int64)
    positions = np.asarray(positions, np.int64)
    order = _stable_argsort_i32(keys.astype(np.int32)).astype(np.int64)
    sk = keys[order]
    uniq, starts_idx, cnt = np.unique(sk, return_index=True,
                                      return_counts=True)
    widths = np.maximum(1, 1 << np.ceil(
        np.log2(np.maximum(cnt, 1))).astype(np.int64))
    uniq_w = sorted(set(widths.tolist()))
    while len(uniq_w) > max_classes:
        vols = []
        for i in range(len(uniq_w) - 1):
            sel = (widths >= uniq_w[i]) & (widths <= uniq_w[i + 1])
            vols.append(int(sel.sum()) * uniq_w[i + 1])
        j = int(np.argmin(vols))
        widths[widths == uniq_w[j]] = uniq_w[j + 1]
        uniq_w.pop(j)
    # vectorized fill: every sorted entry knows its unique-key id and its
    # column within the bin; per class, map unique ids to class rows.
    ukey_of_entry = np.repeat(np.arange(uniq.size), cnt)
    col_of_entry = np.arange(sk.size) - np.repeat(starts_idx, cnt)
    pos_of_entry = positions[order]
    classes = []
    key_order: List[np.ndarray] = []
    for w in uniq_w:
        sel = np.nonzero(widths == w)[0]
        if sel.size == 0:
            continue
        row_of_uniq = np.full(uniq.size, -1, np.int64)
        row_of_uniq[sel] = np.arange(sel.size)
        mask = row_of_uniq[ukey_of_entry] >= 0
        inc = np.full((sel.size, w), pad_index, dtype=np.int32)
        inc[row_of_uniq[ukey_of_entry[mask]], col_of_entry[mask]] = \
            pos_of_entry[mask]
        classes.append((int(w), inc.reshape(-1)))
        key_order.append(uniq[sel])
    key_order = (np.concatenate(key_order) if key_order
                 else np.zeros(0, np.int64))
    return classes, key_order


@jax.tree_util.register_static
@dataclasses.dataclass(frozen=True)
class _PlanMeta:
    n_dof: int
    n_nodes: int
    dof_per_node: int
    n_rows: int                                      # M * k
    class_widths: Tuple[int, ...]                    # 1-level mode
    chunk_bounds: Tuple[int, ...]                    # 2-level: row offsets
    chunk_class_widths: Tuple[Tuple[int, ...], ...]  # per chunk
    stage2_widths: Tuple[int, ...]

    @property
    def chunked(self) -> bool:
        return len(self.chunk_bounds) > 0


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ScatterPlan:
    """Precomputed deterministic gather/scatter for one element block."""

    conn: jnp.ndarray      # [M, k] int32 — row-gather indices
    dofs: jnp.ndarray      # [M, k*nd] int32 — flat DOF ids (assembly/compat)
    inc: Tuple[jnp.ndarray, ...]       # 1-level per-class flat bins
    chunk_inc: Tuple[Tuple[jnp.ndarray, ...], ...]  # 2-level stage 1
    stage2_inc: Tuple[jnp.ndarray, ...]             # 2-level stage 2
    inv_order: jnp.ndarray # [N] int32 — node -> emitted-bin position
    perm: jnp.ndarray      # [M*k*nd] int32 stable sort (assembly fallback)
    segments: jnp.ndarray  # [M*k*nd] int32 sorted DOF ids
    meta: _PlanMeta

    @property
    def n_dof(self) -> int:
        return self.meta.n_dof

    # ------------------------------------------------------------------
    @staticmethod
    def build(conn, n_nodes: int, dof_per_node: int = 3,
              max_classes: int = 4, chunk_rows: int = _CHUNK_ROWS
              ) -> "ScatterPlan":
        conn = np.asarray(conn)
        M, k = conn.shape
        nd = dof_per_node
        n_rows = M * k
        dofs = element_dofs(conn, nd)
        flat = dofs.reshape(-1)
        perm = _stable_argsort_i32(flat)
        segments = flat[perm]

        rows_node = conn.reshape(-1).astype(np.int64)  # node per (e, l) row

        if n_rows <= chunk_rows:
            classes, key_order = _classed_bins(
                rows_node, np.arange(n_rows), n_rows, max_classes)
            inv_order = np.full(n_nodes, len(key_order), np.int64)
            inv_order[key_order] = np.arange(key_order.size)
            return ScatterPlan(
                conn=jnp.asarray(conn.astype(np.int32)),
                dofs=jnp.asarray(dofs),
                inc=tuple(jnp.asarray(a) for _, a in classes),
                chunk_inc=(), stage2_inc=(),
                inv_order=jnp.asarray(inv_order.astype(np.int32)),
                perm=jnp.asarray(perm), segments=jnp.asarray(segments),
                meta=_PlanMeta(n_nodes * nd, n_nodes, nd, n_rows,
                               tuple(w for w, _ in classes), (), (), ()),
            )

        # ---- two-stage chunked build ----------------------------------
        n_chunks = min(-(-n_rows // chunk_rows), _MAX_UNROLL_CHUNKS)
        rows_per_chunk = -(-n_rows // n_chunks)
        rows_per_chunk = -(-rows_per_chunk // k) * k  # element-aligned
        bounds = list(range(0, n_rows, rows_per_chunk)) + [n_rows]

        chunk_inc: List[Tuple[jnp.ndarray, ...]] = []
        chunk_widths: List[Tuple[int, ...]] = []
        sub_nodes: List[np.ndarray] = []
        for ci in range(len(bounds) - 1):
            a, b = bounds[ci], bounds[ci + 1]
            local_nodes = rows_node[a:b]
            classes, key_order = _classed_bins(
                local_nodes, np.arange(b - a), b - a, max_classes)
            chunk_inc.append(tuple(jnp.asarray(arr) for _, arr in classes))
            chunk_widths.append(tuple(w for w, _ in classes))
            sub_nodes.append(key_order)
        sub_nodes_all = np.concatenate(sub_nodes)
        T = sub_nodes_all.size
        classes2, key_order2 = _classed_bins(
            sub_nodes_all, np.arange(T), T, max_classes)
        inv_order = np.full(n_nodes, key_order2.size, np.int64)
        inv_order[key_order2] = np.arange(key_order2.size)

        return ScatterPlan(
            conn=jnp.asarray(conn.astype(np.int32)),
            dofs=jnp.asarray(dofs),
            inc=(),
            chunk_inc=tuple(chunk_inc),
            stage2_inc=tuple(jnp.asarray(a) for _, a in classes2),
            inv_order=jnp.asarray(inv_order.astype(np.int32)),
            perm=jnp.asarray(perm), segments=jnp.asarray(segments),
            meta=_PlanMeta(n_nodes * nd, n_nodes, nd, n_rows, (),
                           tuple(bounds), tuple(chunk_widths),
                           tuple(w for w, _ in classes2)),
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

    @staticmethod
    def _take_reduce(padded, inc_flat, w, nd):
        g = jnp.take(padded, inc_flat, axis=0)           # [n_c * w, nd]
        return g.reshape(-1, w, nd).sum(axis=1)

    def scatter(self, element_values):
        """[M, k*nd] element values -> [n_dof] deterministic sum."""
        m = self.meta
        nd = m.dof_per_node
        rows = element_values.reshape(m.n_rows, nd)
        zero = jnp.zeros((1, nd), rows.dtype)
        if not m.chunked:
            padded = jnp.concatenate([rows, zero], axis=0)
            parts = [self._take_reduce(padded, inc_c, w, nd)
                     for inc_c, w in zip(self.inc, m.class_widths)]
            y_sorted = jnp.concatenate(parts + [zero], axis=0)
            return jnp.take(y_sorted, self.inv_order, axis=0).reshape(-1)
        # two-stage: per-chunk sub-bin partials from small tables
        partials = []
        for ci in range(len(m.chunk_bounds) - 1):
            a, b = m.chunk_bounds[ci], m.chunk_bounds[ci + 1]
            padded_c = jnp.concatenate([rows[a:b], zero], axis=0)
            for inc_c, w in zip(self.chunk_inc[ci], m.chunk_class_widths[ci]):
                partials.append(self._take_reduce(padded_c, inc_c, w, nd))
        s1 = jnp.concatenate(partials + [zero], axis=0)
        parts = [self._take_reduce(s1, inc_c, w, nd)
                 for inc_c, w in zip(self.stage2_inc, m.stage2_widths)]
        y_sorted = jnp.concatenate(parts + [zero], axis=0)
        return jnp.take(y_sorted, self.inv_order, axis=0).reshape(-1)

    # -- exact sorted-stream fallback (kept for validation) --------------
    def scatter_sorted(self, element_values):
        vals = element_values.reshape(-1)[self.perm]
        return jax.ops.segment_sum(
            vals, self.segments, num_segments=self.meta.n_dof,
            indices_are_sorted=True)
