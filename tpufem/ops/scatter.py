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
* bins are grouped into <=4 power-of-two width classes by valence so the
  padded gather volume stays within ~1.3x of the true entry count;
* the DEFAULT strategy is a SINGLE-LEVEL classed reduce: take throughput
  degrades ~2.5x once the source table exceeds ~200k rows, but every
  measured mitigation (row packing into wider rows, two-stage chunked
  reduction) lost end-to-end because each added select/stage pass costs a
  full lane-padded pass over the entries (numbers at the cost-model note
  below).  Packing and chunking remain implemented + tested, gated by the
  module-level thresholds, for future hardware.

The sorted permutation/segments of the original design are kept for
value-stream assembly (BSR) and as a validation fallback.
"""
from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

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


# Measured on v5e (isolated microbenchmarks): jnp.take row gathers run at
# ~2.2 ns/row while the source table has fewer than ~200k ROWS and ~5.5
# ns/row above.  [*, nd]-minor arrays are lane-padded to 128 on TPU, so
# every gathered row and every elementwise pass moves a full 512 B tile
# line regardless of nd — which is why neither row PACKING (s source rows
# per s*nd-wide row + post-gather column select) nor position CHUNKING
# (two-stage reduce over small tables) ever beat the plain single-level
# reduce in end-to-end measurements (331k rows: single 2.40 ms, s=2/s=4
# packed 3.6 ms, 2-chunk 2.9 ms; 786k rows: single 6.66 ms, s=8 packed
# 8.90 ms, 5-chunk 10.6 ms): the extra select/stage passes each cost a
# full padded pass over the entries.  Both alternate modes are therefore
# disabled by default but kept implemented + tested (thresholds are
# module-level so future hardware can re-enable them).
_TAKE_FAST_ROWS = 150_000
_PACK_ABOVE_ROWS = 1 << 62
_MAX_PACK = 8
_CHUNK_ABOVE_ROWS = 1 << 62


def _packed_classes(keys, positions, n_rows: int, max_classes: int):
    """Classed bins with a pack factor keeping the take table small.

    Returns (s, classes) where classes = [(w, inc_rows, cols)] and
    inc_rows index the packed table [ceil(n_rows/s) (+1 zero row), s*nd];
    padding entries point at the zero row, column 0.
    """
    s = 1
    if n_rows > _PACK_ABOVE_ROWS:
        while s < _MAX_PACK and -(-n_rows // s) > _TAKE_FAST_ROWS:
            s *= 2
    raw, key_order = _classed_bins(keys, positions, n_rows, max_classes)
    R = -(-n_rows // s)
    classes = []
    for w, inc in raw:
        if s == 1:
            classes.append((w, inc, None))
        else:
            pad = inc == n_rows
            rows = np.where(pad, R, inc // s).astype(np.int32)
            cols = np.where(pad, 0, inc % s).astype(np.int32)
            classes.append((w, rows, cols))
    return s, classes, key_order


def _apply_packed_classes(rows, s, inc, sel, widths, nd, *,
                          materialize: bool = False):
    """rows [n_rows, nd] -> concatenated per-class reduced sums (+ zero).

    ``materialize`` forces the (sliced/packed) take source table through an
    optimization barrier: without it XLA fuses the slice/concat/reshape
    into the gather, which then indexes the ORIGINAL large buffer and
    falls off the take engine's small-table fast path.
    """
    zero = jnp.zeros((1, nd), rows.dtype)
    if s == 1:
        padded = jnp.concatenate([rows, zero], axis=0)
        if materialize:
            padded = jax.lax.optimization_barrier(padded)
        parts = [ScatterPlan._take_reduce(padded, ic, w, nd)
                 for ic, w in zip(inc, widths)]
        return jnp.concatenate(parts + [zero], axis=0)
    n_rows = rows.shape[0]
    R = -(-n_rows // s)
    pad = R * s - n_rows
    tab = jnp.concatenate(
        [rows, jnp.zeros((pad + s, nd), rows.dtype)], axis=0
    ).reshape(R + 1, s * nd)
    tab = jax.lax.optimization_barrier(tab)
    # slot mask computed in the s*nd-lane layout: every op below keeps the
    # minor dimension at s*nd (splitting it to (s, nd) would relayout)
    iota_slot = jax.lax.broadcasted_iota(jnp.int32, (1, s * nd), 1) // nd
    parts = []
    for ic, sl, w in zip(inc, sel, widths):
        g = jnp.take(tab, ic, axis=0)                       # [n_c*w, s*nd]
        msk = (sl[:, None] == iota_slot).astype(rows.dtype)
        y_wide = (g * msk).reshape(-1, w, s * nd).sum(axis=1)
        y = y_wide[:, :nd]
        for t in range(1, s):
            y = y + y_wide[:, t * nd:(t + 1) * nd]
        parts.append(y)
    return jnp.concatenate(parts + [jnp.zeros((1, nd), rows.dtype)], axis=0)


@jax.tree_util.register_static
@dataclasses.dataclass(frozen=True)
class _CombineMeta:
    n_keys: int
    n_rows: int
    pack: int                                        # source pack factor
    class_widths: Tuple[int, ...]                    # single-level classes
    chunk_bounds: Tuple[int, ...]                    # chunked mode
    chunk_class_widths: Tuple[Tuple[int, ...], ...]
    chunk_packs: Tuple[int, ...]
    final_pack: int                                  # y_sorted take pack

    @property
    def chunked(self) -> bool:
        return len(self.chunk_bounds) > 0


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class CombinePlan:
    """Deterministic per-key reduce of value rows: y[key] = sum(rows[pos]).

    Generalizes the classed-bin reduction to arbitrary (key, position)
    incidence lists (the cluster-structured operators hand it cluster-slot
    positions; ScatterPlan hands it element rows).  All take source tables
    are kept under the measured ~200k-row fast-path budget by row packing
    (see `_TAKE_FAST_ROWS`); sources too large even at max pack are split
    into position chunks whose per-chunk partial sums feed a recursively
    built child plan.  Bitwise deterministic: fixed bins, fixed order.
    """

    inc: Tuple[jnp.ndarray, ...]                     # single-level rows
    sel: Tuple[Optional[jnp.ndarray], ...]           # packed columns
    chunk_inc: Tuple[Tuple[jnp.ndarray, ...], ...]
    chunk_sel: Tuple[Tuple[Optional[jnp.ndarray], ...], ...]
    child: Optional["CombinePlan"]                   # chunked mode only
    inv_order: Optional[jnp.ndarray]  # [n_keys] -> emitted pos (missing->0)
    inv_col: Optional[jnp.ndarray]    # packed final take column
    meta: _CombineMeta

    @staticmethod
    def build(keys, positions, n_rows: int, n_keys: int,
              row_align: int = 1, max_classes: int = 4,
              _depth: int = 0) -> "CombinePlan":
        keys = np.asarray(keys, np.int64)
        positions = np.asarray(positions, np.int64)
        if n_rows <= _CHUNK_ABOVE_ROWS or _depth >= 3:
            s, classes, key_order = _packed_classes(keys, positions, n_rows,
                                                    max_classes)
            K_tot = sum(-(-a.size // w) for w, a, _ in classes) + 1
            fs = 1
            if K_tot > _PACK_ABOVE_ROWS:
                while fs < _MAX_PACK and -(-K_tot // fs) > _TAKE_FAST_ROWS:
                    fs *= 2
            inv_order = np.full(n_keys, key_order.size, np.int64)
            inv_order[key_order] = np.arange(key_order.size)
            if fs == 1:
                inv_row, inv_col = inv_order.astype(np.int32), None
            else:
                Rf = -(-K_tot // fs)
                padk = inv_order == key_order.size
                inv_row = np.where(padk, Rf, inv_order // fs).astype(np.int32)
                inv_col = jnp.asarray(
                    np.where(padk, 0, inv_order % fs).astype(np.int32))
            return CombinePlan(
                inc=tuple(jnp.asarray(r) for _, r, _ in classes),
                sel=tuple(None if c is None else jnp.asarray(c)
                          for _, _, c in classes),
                chunk_inc=(), chunk_sel=(), child=None,
                inv_order=jnp.asarray(inv_row),
                inv_col=inv_col,
                meta=_CombineMeta(n_keys, n_rows, s,
                                  tuple(w for w, _, _ in classes),
                                  (), (), (), fs),
            )
        # ---- chunk by position, pack each chunk, recurse on partials ----
        n_chunks = min(-(-n_rows // (_TAKE_FAST_ROWS * _MAX_PACK)),
                       _MAX_UNROLL_CHUNKS)
        rpc = -(-n_rows // n_chunks)
        rpc = -(-rpc // row_align) * row_align
        bounds = list(range(0, n_rows, rpc)) + [n_rows]
        if bounds[-1] == bounds[-2]:
            bounds.pop()
        cid = np.searchsorted(np.asarray(bounds), positions,
                              side="right") - 1
        chunk_inc: List[Tuple[jnp.ndarray, ...]] = []
        chunk_sel: List[Tuple[Optional[jnp.ndarray], ...]] = []
        chunk_widths: List[Tuple[int, ...]] = []
        chunk_packs: List[int] = []
        sub_keys: List[np.ndarray] = []
        for ci in range(len(bounds) - 1):
            a, b = bounds[ci], bounds[ci + 1]
            m = cid == ci
            s, classes, key_order = _packed_classes(
                keys[m], positions[m] - a, b - a, max_classes)
            chunk_inc.append(tuple(jnp.asarray(r) for _, r, _ in classes))
            chunk_sel.append(tuple(None if c is None else jnp.asarray(c)
                                   for _, _, c in classes))
            chunk_widths.append(tuple(w for w, _, _ in classes))
            chunk_packs.append(s)
            sub_keys.append(key_order)
        sub_all = (np.concatenate(sub_keys) if sub_keys
                   else np.zeros(0, np.int64))
        # stage-1 emission appends one zero row per chunk-class group + 1
        T = sub_all.size
        # positions of sub_keys within the concatenated stage-1 output:
        # class outputs are emitted back to back WITHOUT the zero rows
        # (apply slices them off), so positions are simply arange(T).
        child = CombinePlan.build(sub_all, np.arange(T), T, n_keys,
                                  max_classes=max_classes, _depth=_depth + 1)
        return CombinePlan(
            inc=(), sel=(), chunk_inc=tuple(chunk_inc),
            chunk_sel=tuple(chunk_sel), child=child,
            inv_order=None, inv_col=None,
            meta=_CombineMeta(n_keys, n_rows, 0, (), tuple(bounds),
                              tuple(chunk_widths), tuple(chunk_packs), 1),
        )

    def __call__(self, rows):
        """rows [n_rows, nd] -> per-key sums [n_keys, nd]."""
        m = self.meta
        nd = rows.shape[-1]
        if m.chunked:
            partials = []
            for ci in range(len(m.chunk_bounds) - 1):
                a, b = m.chunk_bounds[ci], m.chunk_bounds[ci + 1]
                out = _apply_packed_classes(
                    rows[a:b], m.chunk_packs[ci], self.chunk_inc[ci],
                    self.chunk_sel[ci], m.chunk_class_widths[ci], nd,
                    materialize=True)
                partials.append(out[:-1])            # drop trailing zero row
            s1 = jnp.concatenate(partials, axis=0)
            return self.child(s1)
        y_sorted = _apply_packed_classes(rows, m.pack, self.inc, self.sel,
                                         m.class_widths, nd)
        if m.final_pack == 1:
            return jnp.take(y_sorted, self.inv_order, axis=0)
        fs = m.final_pack
        K_tot = y_sorted.shape[0]
        Rf = -(-K_tot // fs)
        pad = Rf * fs - K_tot
        tab = jnp.concatenate(
            [y_sorted, jnp.zeros((pad + fs, nd), y_sorted.dtype)], axis=0
        ).reshape(Rf + 1, fs * nd)
        g = jnp.take(tab, self.inv_order, axis=0)           # [n_keys, fs*nd]
        iota_slot = jax.lax.broadcasted_iota(jnp.int32, (1, fs * nd),
                                             1) // nd
        gm = g * (self.inv_col[:, None] == iota_slot).astype(rows.dtype)
        y = gm[:, :nd]
        for t in range(1, fs):
            y = y + gm[:, t * nd:(t + 1) * nd]
        return y


@jax.tree_util.register_static
@dataclasses.dataclass(frozen=True)
class _PlanMeta:
    n_dof: int
    n_nodes: int
    dof_per_node: int
    n_rows: int                                      # M * k

    @property
    def chunked(self) -> bool:  # retained for introspection compat
        return False


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ScatterPlan:
    """Precomputed deterministic gather/scatter for one element block."""

    conn: jnp.ndarray      # [M, k] int32 — row-gather indices
    dofs: jnp.ndarray      # [M, k*nd] int32 — flat DOF ids (assembly/compat)
    combine: CombinePlan   # element rows [M*k, nd] -> per-node sums
    perm: jnp.ndarray      # [M*k*nd] int32 stable sort (assembly fallback)
    segments: jnp.ndarray  # [M*k*nd] int32 sorted DOF ids
    meta: _PlanMeta

    @property
    def n_dof(self) -> int:
        return self.meta.n_dof

    # ------------------------------------------------------------------
    @staticmethod
    def build(conn, n_nodes: int, dof_per_node: int = 3,
              max_classes: int = 4) -> "ScatterPlan":
        conn = np.asarray(conn)
        M, k = conn.shape
        nd = dof_per_node
        n_rows = M * k
        dofs = element_dofs(conn, nd)
        flat = dofs.reshape(-1)
        perm = _stable_argsort_i32(flat)
        segments = flat[perm]
        rows_node = conn.reshape(-1).astype(np.int64)  # node per (e, l) row
        combine = CombinePlan.build(rows_node, np.arange(n_rows), n_rows,
                                    n_nodes, row_align=k,
                                    max_classes=max_classes)
        return ScatterPlan(
            conn=jnp.asarray(conn.astype(np.int32)),
            dofs=jnp.asarray(dofs),
            combine=combine,
            perm=jnp.asarray(perm), segments=jnp.asarray(segments),
            meta=_PlanMeta(n_nodes * nd, n_nodes, nd, n_rows),
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
        rows = element_values.reshape(m.n_rows, m.dof_per_node)
        return self.combine(rows).reshape(-1)

    # -- exact sorted-stream fallback (kept for validation) --------------
    def scatter_sorted(self, element_values):
        vals = element_values.reshape(-1)[self.perm]
        return jax.ops.segment_sum(
            vals, self.segments, num_segments=self.meta.n_dof,
            indices_are_sorted=True)
