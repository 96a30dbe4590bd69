"""Distributed partial-assembly operator: halo exchange + geometry factors.

Completes the reference's scaling intent (subdivision.ipynb cells 6-15 —
the notebook exists because big meshes did NOT fit, SURVEY.md 2.6/2.8)
without ever materializing element stiffness: each part stores only its
quadrature geometry (J^-1 and w*detJ, ~40 B per affine c3d10 element vs
3.6 KB of K — 36 GB at 10M elements), so the per-chip footprint is set by
the mesh slice, not the operator.

On top of parallel.halo's neighbor-ppermute scheme this adds the
interior/boundary element split (SURVEY hard part 3): each part's
elements are reordered interior-first, and the interior batch is computed
from OWNED rows only — no data dependence on the ghost exchange — so
XLA's latency-hiding scheduler is free to overlap the ppermute rounds
with the interior element kernels.  The boundary batch (and only it)
waits for the ghosts.

Deterministic: fixed-order bins, fixed round order, psum scalars.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.partial import pa_apply_components
from ..solvers.cg import CONVERGED, MAX_ITER, NAN_INF, NOT_SPD, RUNNING, SolveInfo
from .dist import DistPartition, make_mesh_1d


@jax.tree_util.register_static
@dataclasses.dataclass(frozen=True)
class _HPMeta:
    n_parts: int
    block_rows: int
    ghost_rows: int
    halo_width: int
    # each round is a tuple of (src, dst) part pairs forming a partial
    # permutation (every part sends <= 1 and receives <= 1 per round);
    # DCN (cross-host) rounds come first so the slow collectives launch
    # earliest and never mix with ICI-only rounds
    rounds: Tuple[Tuple[Tuple[int, int], ...], ...]
    elems_per_part: int
    interior_cut: int          # static count of guaranteed-interior elements
    nodes_per_elem: int
    n_q: int
    n_qj: int
    n_nodes: int
    lam: float
    mu: float
    part_shape: Optional[Tuple[int, int]] = None  # (hosts, chips) hierarchy
    dcn_pairs: int = 0         # halo pairs crossing the host boundary
    ici_pairs: int = 0
    dcn_halo_rows: int = 0     # sum of halo rows shipped over DCN per SpMV


def _color_rounds(pairs, weight) -> list:
    """Greedy edge-coloring of directed (src, dst) halo pairs into rounds.

    Each round is a partial permutation (distinct sources, distinct
    destinations) usable as one ``ppermute``; heavy pairs are placed
    first so round count ~ max in/out degree (Konig) and the per-round
    H padding stays balanced.
    """
    order = sorted(range(len(pairs)), key=lambda i: (-weight[i], pairs[i]))
    rounds, used_s, used_d = [], [], []
    for i in order:
        s, d = pairs[i]
        for ri in range(len(rounds)):
            if s not in used_s[ri] and d not in used_d[ri]:
                rounds[ri].append((s, d))
                used_s[ri].add(s)
                used_d[ri].add(d)
                break
        else:
            rounds.append([(s, d)])
            used_s.append({s})
            used_d.append({d})
    return [tuple(sorted(r)) for r in rounds]


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class HaloPartialPartition:
    """Per-part geometry + exchange plan (leading axis = parts)."""

    Jinv: jnp.ndarray         # [P, Mp, qJ, 9]
    W: jnp.ndarray            # [P, Mp, q] (zero rows pad)
    dN: tuple                 # static [q][k][3] nested tuple
    conn_local: jnp.ndarray   # [P, Mp, k] slots into [owned | ghost]
    inc: jnp.ndarray          # [P, B+G, Wb] bins into local Fe rows
    send_idx: jnp.ndarray     # [P, R, H]
    recv_slot: jnp.ndarray    # [P, R, H]
    recv_mask: jnp.ndarray    # [P, R, H]
    new_from_old: jnp.ndarray
    old_from_new: jnp.ndarray
    meta: _HPMeta

    to_new = DistPartition.to_new
    to_old = DistPartition.to_old

    @staticmethod
    def build(coords, conn, etype: str, E: float, nu: float, labels,
              n_parts: int, rule: str = "default", dtype=None,
              affine: Optional[bool] = None,
              part_shape: Optional[Tuple[int, int]] = None
              ) -> "HaloPartialPartition":
        from ..core.materials import lame_parameters
        from ..elements.tables import element_table
        from .partition import owner_of_nodes

        conn = np.asarray(conn)
        labels = np.asarray(labels)
        M, k = conn.shape
        n_nodes = np.asarray(coords).shape[0]
        table = element_table(etype, rule)
        dtype = dtype or jnp.asarray(coords).dtype

        owner = owner_of_nodes(conn, labels, n_nodes)
        counts = np.bincount(owner, minlength=n_parts)
        B = int(counts.max())
        order = np.argsort(owner, kind="stable")
        rank = np.empty(n_nodes, np.int64)
        offsets = np.zeros(n_parts + 1, np.int64)
        offsets[1:] = np.cumsum(counts)
        rank[order] = np.arange(n_nodes) - offsets[owner[order]]
        new_from_old = owner * B + rank
        old_from_new = np.full(n_parts * B, -1, np.int64)
        old_from_new[new_from_old] = np.arange(n_nodes)

        Mp = int(np.bincount(labels, minlength=n_parts).max())

        ghosts = []
        for p in range(n_parts):
            nodes_p = np.unique(conn[labels == p])
            ghosts.append(nodes_p[owner[nodes_p] != p])
        G = max(1, max((g.size for g in ghosts), default=1))
        H_per = np.zeros((n_parts, n_parts), np.int64)
        for p in range(n_parts):
            srcs = owner[ghosts[p]]
            for q_ in range(n_parts):
                H_per[q_, p] = int((srcs == q_).sum())
        pairs_all = [(q_, p) for q_ in range(n_parts) for p in range(n_parts)
                     if q_ != p and H_per[q_, p] > 0]
        host_of = ((lambda p: p // part_shape[1]) if part_shape is not None
                   else (lambda p: 0))
        dcn = [e for e in pairs_all if host_of(e[0]) != host_of(e[1])]
        ici = [e for e in pairs_all if host_of(e[0]) == host_of(e[1])]
        rounds = (_color_rounds(dcn, [int(H_per[e]) for e in dcn])
                  + _color_rounds(ici, [int(H_per[e]) for e in ici]))
        rounds = [r for r in rounds if r]
        H = max(1, int(max((H_per[e] for e in pairs_all), default=1)))
        R = max(1, len(rounds))
        dcn_rows = int(sum(H_per[e] for e in dcn))

        # per-part element order: interior (all nodes owned) first
        conn_local = np.zeros((n_parts, Mp, k), np.int64)
        esel = np.full((n_parts, Mp), -1, np.int64)   # original element ids
        interior_counts = []
        for p in range(n_parts):
            sel = np.nonzero(labels == p)[0]
            is_int = (owner[conn[sel]] == p).all(axis=1)
            sel_ord = np.concatenate([sel[is_int], sel[~is_int]])
            interior_counts.append(int(is_int.sum()))
            esel[p, : sel.size] = sel_ord
            gl = ghosts[p]
            gslot = np.full(n_nodes, -1, np.int64)
            gslot[gl] = B + np.arange(gl.size)
            cp = conn[sel_ord]
            loc = np.where(owner[cp] == p, rank[cp], gslot[cp])
            conn_local[p, : sel.size] = loc
        Mi_cut = min(interior_counts) if interior_counts else 0

        send_idx = np.zeros((n_parts, R, H), np.int64)
        recv_slot = np.full((n_parts, R, H), B + G, np.int64)
        recv_mask = np.zeros((n_parts, R, H), np.float64)
        for ri, prs in enumerate(rounds):
            for q_, p in prs:
                gl = ghosts[p]
                mine = np.nonzero(owner[gl] == q_)[0]
                h = mine.size
                send_idx[q_, ri, :h] = rank[gl[mine]]
                recv_slot[p, ri, :h] = B + mine
                recv_mask[p, ri, :h] = 1.0

        # local node-binned incidence (over the interior-first row order)
        Wb = 1
        for p in range(n_parts):
            cnt = np.bincount(conn_local[p].reshape(-1), minlength=B + G)
            Wb = max(Wb, int(cnt.max()))
        inc = np.full((n_parts, B + G, Wb), Mp * k, np.int64)
        for p in range(n_parts):
            rows = conn_local[p].reshape(-1)
            cnt = np.bincount(rows, minlength=B + G)
            srt = np.argsort(rows, kind="stable")
            starts = np.zeros(B + G + 1, np.int64)
            starts[1:] = np.cumsum(cnt)
            col = np.arange(rows.size) - starts[rows[srt]]
            inc[p, rows[srt], col] = srt
        # pad-element rows (esel == -1) have conn_local 0: their Fe is zero
        # (W=0 below), so they contribute exact zeros to node 0's bin.

        # geometry factors per part (no element stiffness anywhere);
        # computed in element chunks — the jacobians einsum alone would
        # exceed HBM at 10M elements (ops.partial.chunked_geometry)
        conn_sel = conn[np.maximum(esel.reshape(-1), 0)]
        from ..ops.partial import chunked_geometry
        Jinv, Wq, affine_meas = chunked_geometry(
            jnp.asarray(np.asarray(coords), dtype), conn_sel, table, dtype)
        Wq = Wq * jnp.asarray(esel.reshape(-1) >= 0, dtype)[:, None]
        if affine is None:
            affine = affine_meas
        if affine:
            Jinv = Jinv[:, :1]
        qJ = Jinv.shape[1]
        q = Wq.shape[1]
        lam, mu = lame_parameters(E, nu)

        meta = _HPMeta(n_parts, B, G, H,
                       tuple(tuple(r) for r in rounds), Mp, Mi_cut, k, q, qJ,
                       n_nodes, float(lam), float(mu),
                       part_shape=part_shape, dcn_pairs=len(dcn),
                       ici_pairs=len(ici), dcn_halo_rows=dcn_rows)
        dNt = tuple(tuple(tuple(float(v) for v in row) for row in pt)
                    for pt in np.asarray(table.dN))
        i32 = lambda a: jnp.asarray(a.astype(np.int32))  # noqa: E731
        return HaloPartialPartition(
            Jinv=Jinv.reshape(n_parts, Mp, qJ, 9),
            W=Wq.reshape(n_parts, Mp, q),
            dN=dNt,
            conn_local=i32(conn_local), inc=i32(inc), send_idx=i32(send_idx),
            recv_slot=i32(recv_slot),
            recv_mask=jnp.asarray(recv_mask, dtype),
            new_from_old=i32(new_from_old), old_from_new=i32(old_from_new),
            meta=meta)


class HaloPartialFEM:
    """Distributed matrix-free system: geometry-factor compute + halo
    exchange with interior/boundary overlap split."""

    def __init__(self, mesh: Mesh, axis: str, part: HaloPartialPartition,
                 free_mask=None, M_inv=None, serialize_exchange: bool = False):
        """serialize_exchange: measurement knob (scripts/probe_overlap.py)
        — gathers the INTERIOR batch from the post-exchange array too,
        forcing the element compute to wait on every ppermute round.
        Results are identical (interior rows are owned rows either way);
        only the scheduler's freedom to overlap is removed."""
        self.mesh = mesh
        self.axis = axis
        self.part = part
        sh = NamedSharding(mesh, P(axis))
        for name in ("Jinv", "W", "conn_local", "inc", "send_idx",
                     "recv_slot", "recv_mask"):
            setattr(self, name, jax.device_put(getattr(part, name), sh))
        self.row_sharding = sh
        self.free_mask = free_mask
        self.M_inv = M_inv
        self.serialize_exchange = serialize_exchange
        self._spmv = None
        self._pcg = {}

    # ------------------------------------------------------------------
    def _pa(self, ue, Jinv, W):
        """ue [m, k, 3] -> Fe rows [m*k, 3] via the geometry factors."""
        m = self.part.meta
        cols = tuple(ue[..., c] for c in range(3))
        Jf = Jinv.reshape(Jinv.shape[0], Jinv.shape[1], 9)
        Fe = pa_apply_components(cols, Jf, W, np.asarray(self.part.dN),
                                 m.lam, m.mu)
        return jnp.stack(Fe, axis=-1).reshape(-1, 3)

    def _spmv_shard(self, Jinv, W, conn_local, inc, send_idx, recv_slot,
                    recv_mask, u_own):
        m = self.part.meta
        Jinv, W, conn_local, inc = Jinv[0], W[0], conn_local[0], inc[0]
        send_idx, recv_slot, recv_mask = (send_idx[0], recv_slot[0],
                                          recv_mask[0])
        nd = 3
        Mi = m.interior_cut

        # interior batch: depends on OWNED rows only — issued before (and
        # schedulable concurrently with) the ghost ppermute rounds
        u_own_pad = jnp.concatenate(
            [u_own, jnp.zeros((m.ghost_rows + 1, nd), u_own.dtype)], axis=0)
        if not self.serialize_exchange:
            ue_int = u_own_pad[conn_local[:Mi]]
            Fe_int = self._pa(ue_int, Jinv[:Mi], W[:Mi])

        # ghost exchange (each round = one partial-permutation collective;
        # parts outside the round's pairs receive zeros into the pad slot)
        u_loc = u_own_pad
        for ri, prs in enumerate(m.rounds):
            buf = u_own[send_idx[ri]]
            recv = jax.lax.ppermute(buf, self.axis, list(prs))
            u_loc = u_loc.at[recv_slot[ri]].add(recv * recv_mask[ri][:, None])

        if self.serialize_exchange:
            # measurement mode: same values (interior rows are owned rows)
            # but gathered from the post-exchange array — no overlap
            ue_int = u_loc[conn_local[:Mi]]
            Fe_int = self._pa(ue_int, Jinv[:Mi], W[:Mi])

        # boundary batch: needs the ghosts
        ue_bnd = u_loc[conn_local[Mi:]]
        Fe_bnd = self._pa(ue_bnd, Jinv[Mi:], W[Mi:])

        rows = jnp.concatenate([Fe_int, Fe_bnd], axis=0)
        padded = jnp.concatenate([rows, jnp.zeros((1, nd), rows.dtype)],
                                 axis=0)
        F_loc = jnp.sum(padded[inc], axis=1)
        F_own = F_loc[:m.block_rows]
        F_ghost_pad = jnp.concatenate(
            [F_loc[m.block_rows:], jnp.zeros((1, nd), rows.dtype)], axis=0)
        for ri, prs in enumerate(m.rounds):
            buf = (F_ghost_pad[recv_slot[ri] - m.block_rows]
                   * recv_mask[ri][:, None])
            back = jax.lax.ppermute(buf, self.axis,
                                    [(p, q_) for q_, p in prs])
            F_own = F_own.at[send_idx[ri]].add(back)
        return F_own

    def spmv(self, u_new):
        if self._spmv is None:
            fn = jax.shard_map(self._spmv_shard, mesh=self.mesh,
                               in_specs=(P(self.axis),) * 8,
                               out_specs=P(self.axis))
            self._spmv = jax.jit(fn)
        return self._spmv(self.Jinv, self.W, self.conn_local, self.inc,
                          self.send_idx, self.recv_slot, self.recv_mask,
                          u_new)

    # ------------------------------------------------------------------
    def _diag_shard(self, Jinv, W, conn_local, inc, send_idx, recv_slot,
                    recv_mask):
        m = self.part.meta
        Jinv, W, conn_local, inc = Jinv[0], W[0], conn_local[0], inc[0]
        send_idx, recv_slot, recv_mask = (send_idx[0], recv_slot[0],
                                          recv_mask[0])
        dN = np.asarray(self.part.dN)
        q, k = dN.shape[0], dN.shape[1]
        qJ = Jinv.shape[1]
        lam, mu = m.lam, m.mu
        Jf = Jinv.reshape(Jinv.shape[0], qJ, 9)
        d_cols = [None, None, None]
        for qi in range(q):
            Wq = W[:, qi]
            for a in range(3):
                col = []
                for kk in range(k):
                    g = [sum(float(dN[qi, kk, j]) * Jf[:, min(qi, qJ - 1),
                                                      3 * i + j]
                             for j in range(3)) for i in range(3)]
                    n2 = g[0] * g[0] + g[1] * g[1] + g[2] * g[2]
                    col.append(Wq * ((lam + mu) * g[a] * g[a] + mu * n2))
                col = jnp.stack(col, axis=1)
                d_cols[a] = col if d_cols[a] is None else d_cols[a] + col
        rows = jnp.stack(d_cols, axis=-1).reshape(-1, 3)
        padded = jnp.concatenate([rows, jnp.zeros((1, 3), rows.dtype)],
                                 axis=0)
        F_loc = jnp.sum(padded[inc], axis=1)
        F_own = F_loc[:m.block_rows]
        F_ghost_pad = jnp.concatenate(
            [F_loc[m.block_rows:], jnp.zeros((1, 3), rows.dtype)], axis=0)
        for ri, prs in enumerate(m.rounds):
            buf = (F_ghost_pad[recv_slot[ri] - m.block_rows]
                   * recv_mask[ri][:, None])
            back = jax.lax.ppermute(buf, self.axis,
                                    [(p, q_) for q_, p in prs])
            F_own = F_own.at[send_idx[ri]].add(back)
        return F_own

    def jacobi_preconditioner(self):
        fn = jax.jit(jax.shard_map(self._diag_shard, mesh=self.mesh,
                                   in_specs=(P(self.axis),) * 7,
                                   out_specs=P(self.axis)))
        diag = fn(self.Jinv, self.W, self.conn_local, self.inc,
                  self.send_idx, self.recv_slot, self.recv_mask)
        return jnp.where(jnp.abs(diag) > 0,
                         1.0 / jnp.where(diag == 0, 1.0, diag), 0.0)

    # ------------------------------------------------------------------
    def _pcg_shard(self, tol, max_iter, eps, dot_dtype, Jinv, W, conn_local,
                   inc, send_idx, recv_slot, recv_mask, b_own, mask_own,
                   minv_own, x0_own):
        axis = self.axis
        ddt = dot_dtype or b_own.dtype

        def A(u):
            return self._spmv_shard(Jinv, W, conn_local, inc, send_idx,
                                    recv_slot, recv_mask, u)

        def pdot(a, b):
            s = jnp.sum(a.astype(ddt) * b.astype(ddt))
            return jax.lax.psum(s, axis).astype(b_own.dtype)

        def project(r):
            return r * mask_own

        u0 = project(x0_own)
        r0 = project(b_own - A(u0))
        z0 = r0 * minv_own
        p0 = z0
        rz0 = pdot(r0, z0)
        r0n = jnp.sqrt(pdot(r0, r0))
        hist0 = jnp.full((max_iter + 1,), jnp.inf, b_own.dtype).at[0].set(r0n)
        st0 = jnp.where(r0n < tol, CONVERGED, RUNNING).astype(jnp.int32)

        def cond(s):
            return (s[0] < max_iter) & (s[5] == RUNNING)

        def body(s):
            i, u, r, p, rz, st, hist = s
            Ap = A(p)
            pAp = pdot(p, Ap)
            bad_curv = (jnp.abs(pAp) < eps) | (pAp < 0.0)
            alpha = rz / (pAp + eps)
            u1 = project(u + alpha * p)
            r1 = project(r - alpha * Ap)
            z1 = r1 * minv_own
            rz1 = pdot(r1, z1)
            rn = jnp.sqrt(pdot(r1, r1))
            beta = rz1 / (rz + eps)
            p1 = project(z1 + beta * p)
            bad = jnp.isnan(rn) | jnp.isinf(rn)
            ns = jnp.where(bad_curv, NOT_SPD,
                           jnp.where(bad, NAN_INF,
                                     jnp.where(rn < tol, CONVERGED, RUNNING))
                           ).astype(jnp.int32)
            take = ~bad_curv & ~bad
            u1 = jnp.where(take, u1, u)
            r1 = jnp.where(take, r1, r)
            p1 = jnp.where(take, p1, p)
            rz1 = jnp.where(take, rz1, rz)
            hist = hist.at[i + 1].set(jnp.where(take, rn, hist[i]))
            return (i + 1, u1, r1, p1, rz1, ns, hist)

        i, u, r, p, rz, st, hist = jax.lax.while_loop(
            cond, body, (jnp.int32(0), u0, r0, p0, rz0, st0, hist0))
        st = jnp.where(st == RUNNING, MAX_ITER, st)
        return u, st, i, jnp.sqrt(pdot(r, r)), hist

    def pcg(self, b_new, x0=None, tol: float = 1e-8, max_iter: int = 1000,
            eps: float = 1e-30, dot_dtype=None):
        m = self.part.meta
        shape = (m.n_parts * m.block_rows, 3)
        mask = (self.free_mask if self.free_mask is not None
                else jnp.ones(shape, b_new.dtype))
        minv = (self.M_inv if self.M_inv is not None
                else jnp.ones(shape, b_new.dtype))
        x0 = jnp.zeros(shape, b_new.dtype) if x0 is None else x0
        key = (float(tol), int(max_iter), str(dot_dtype))
        if key not in self._pcg:
            fn = jax.shard_map(partial(self._pcg_shard, tol, max_iter, eps,
                                       dot_dtype),
                               mesh=self.mesh,
                               in_specs=(P(self.axis),) * 11,
                               out_specs=(P(self.axis), P(), P(), P(), P()))
            self._pcg[key] = jax.jit(fn)
        u, st, it, rn, hist = self._pcg[key](
            self.Jinv, self.W, self.conn_local, self.inc, self.send_idx,
            self.recv_slot, self.recv_mask, b_new, mask, minv, x0)
        return u, SolveInfo(st, it, rn, hist)


def build_halo_partial_fem(coords, conn, etype: str, E: float, nu: float,
                           mesh: Optional[Mesh] = None, axis=None,
                           fixed_nodes=None, labels=None, seed: int = 0,
                           dtype=None, precondition: bool = True,
                           part_shape: Optional[Tuple[int, int]] = None):
    """One-call setup of the geometry-factor halo-distributed system.

    part_shape=(hosts, chips_per_host) selects the 2-level hierarchy: a
    (dcn, ici) device mesh, host-then-chip hierarchical partitioning, and
    DCN-separated exchange rounds.  Default: flat 1-D mesh.
    """
    from .dist import make_mesh_2d
    from .partition import hierarchical_partition, partition_elements

    if part_shape is not None:
        axis = axis or ("dcn", "ici")
        mesh = mesh or make_mesh_2d(part_shape, axis)
    else:
        axis = axis or "parts"
        mesh = mesh or make_mesh_1d(None, axis)
    n_parts = mesh.devices.size
    conn_np = np.asarray(conn)
    N = np.asarray(coords).shape[0]
    if labels is None:
        if part_shape is not None:
            labels, _ = hierarchical_partition(conn_np, etype, part_shape,
                                               seed)
        else:
            labels, _ = partition_elements(conn_np, etype, n_parts, seed)
    part = HaloPartialPartition.build(coords, conn_np, etype, E, nu, labels,
                                      n_parts, dtype=dtype,
                                      part_shape=part_shape)
    fem = HaloPartialFEM(mesh, axis, part)
    fdt = np.dtype(jax.dtypes.canonicalize_dtype(
        jnp.asarray(part.W).dtype))
    if fixed_nodes is not None:
        mask_old = np.ones((N, 3), fdt)
        mask_old[np.asarray(fixed_nodes)] = 0.0
        mask_new = np.zeros((part.meta.n_parts * part.meta.block_rows, 3),
                            dtype=fdt)
        mask_new[np.asarray(part.new_from_old)] = mask_old
        fem.free_mask = jax.device_put(jnp.asarray(mask_new),
                                       fem.row_sharding)
    if precondition:
        fem.M_inv = fem.jacobi_preconditioner()
        if fem.free_mask is not None:
            fem.M_inv = fem.M_inv * fem.free_mask
    return fem, part
