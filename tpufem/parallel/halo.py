"""Halo-exchange distributed operator: neighbor ppermute instead of
all-gather.

DistFEM (parallel.dist) moves the full O(N) vector per SpMV with
all_gather/psum_scatter — simple and bandwidth-optimal for few parts with
wide interfaces.  This variant moves only the partition-surface DOFs
(the FEM analogue of ring/context parallelism — SURVEY.md 2.8):

  1. forward exchange: each part sends the owned rows its neighbors
     reference (ghost values) via `jax.lax.ppermute` rounds over mesh
     offsets; interior element compute overlaps with the exchange (XLA
     schedules the collectives asynchronously against independent work);
  2. local compute: gather [owned | ghosts] rows -> batched GEMV ->
     node-binned local reduction (same row-op design as ops.scatter);
  3. reverse exchange: ghost-row partial sums ppermute back to their
     owners and are added in a fixed round order (deterministic).

Communication volume per SpMV: 2 * sum_p |halo_p| rows, vs 2 * N for the
all-gather scheme — the win grows with part count and mesh size.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..solvers.cg import CONVERGED, MAX_ITER, NAN_INF, NOT_SPD, RUNNING, SolveInfo
from .dist import DistPartition, make_mesh_1d
from ..core.xmath import einsum as _xeinsum


@jax.tree_util.register_static
@dataclasses.dataclass(frozen=True)
class _HaloMeta:
    n_parts: int
    block_rows: int       # B owned (padded) nodes per part
    ghost_rows: int       # G ghost slots per part (padded)
    halo_width: int       # H rows exchanged per round (padded)
    rounds: Tuple[int, ...]  # mesh offsets with any traffic
    elems_per_part: int
    dof_per_elem: int
    n_nodes: int


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class HaloPartition:
    """Per-part arrays (leading axis = parts, sharded over the mesh)."""

    K: jnp.ndarray            # [P, Mp, d, d]
    conn_local: jnp.ndarray   # [P, Mp, k] slots into [owned | ghost]
    inc: jnp.ndarray          # [P, B+G, W] bins into local Fe rows (+pad)
    send_idx: jnp.ndarray     # [P, R, H] owned rows to send per round
    recv_slot: jnp.ndarray    # [P, R, H] ghost slot receiving per round
    recv_mask: jnp.ndarray    # [P, R, H] 1/0 valid
    new_from_old: jnp.ndarray
    old_from_new: jnp.ndarray
    meta: _HaloMeta

    @staticmethod
    def build(K_elem, conn, n_nodes: int, labels, n_parts: int,
              dof_per_node: int = 3) -> "HaloPartition":
        conn = np.asarray(conn)
        labels = np.asarray(labels)
        K_np = np.asarray(K_elem)
        M, k = conn.shape
        d = k * dof_per_node

        from .partition import owner_of_nodes
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

        # per part: ghost node lists + local connectivity
        ghosts = []
        for p in range(n_parts):
            nodes_p = np.unique(conn[labels == p])
            ghosts.append(nodes_p[owner[nodes_p] != p])
        G = max(1, max(g.size for g in ghosts))
        H_per = np.zeros((n_parts, n_parts), np.int64)  # sender q -> dest p
        for p in range(n_parts):
            srcs = owner[ghosts[p]]
            for q in range(n_parts):
                H_per[q, p] = int((srcs == q).sum())
        # rounds: offsets delta with any traffic
        rounds = []
        for delta in range(1, n_parts):
            if any(H_per[q, (q + delta) % n_parts] for q in range(n_parts)):
                rounds.append(delta)
        H = max(1, int(max(
            (H_per[q, (q + delta) % n_parts]
             for delta in rounds for q in range(n_parts)), default=1)))
        R = max(1, len(rounds))

        K_pad = np.zeros((n_parts, Mp, d, d), K_np.dtype)
        conn_local = np.zeros((n_parts, Mp, k), np.int64)
        send_idx = np.zeros((n_parts, R, H), np.int64)
        recv_slot = np.full((n_parts, R, H), B + G, np.int64)  # pad slot
        recv_mask = np.zeros((n_parts, R, H), K_np.dtype)
        inc_rows = []
        W = 1
        for p in range(n_parts):
            sel = np.nonzero(labels == p)[0]
            K_pad[p, :sel.size] = K_np[sel]
            gl = ghosts[p]
            ghost_slot = {int(nd_): B + i for i, nd_ in enumerate(gl)}
            cp = conn[sel]
            loc = np.where(owner[cp] == p, rank[cp], -1)
            for (ei, ki) in zip(*np.nonzero(loc < 0)):
                loc[ei, ki] = ghost_slot[int(cp[ei, ki])]
            conn_local[p, :sel.size] = loc
            rows = loc.reshape(-1)
            cnt = np.bincount(rows, minlength=B + G)
            W = max(W, int(cnt.max()) if cnt.size else 1)
            inc_rows.append(rows)
        for ri, delta in enumerate(rounds):
            for q in range(n_parts):
                p = (q + delta) % n_parts       # q sends to p
                gl = ghosts[p]
                mine = np.nonzero(owner[gl] == q)[0]
                h = mine.size
                send_idx[q, ri, :h] = rank[gl[mine]]
                recv_slot[p, ri, :h] = B + mine
                recv_mask[p, ri, :h] = 1.0
        inc = np.full((n_parts, B + G, W), Mp * k, np.int64)
        for p in range(n_parts):
            rows = inc_rows[p]
            cnt = np.bincount(rows, minlength=B + G)
            srt = np.argsort(rows, kind="stable")
            starts = np.zeros(B + G + 1, np.int64)
            starts[1:] = np.cumsum(cnt)
            sn = rows[srt]
            col = np.arange(rows.size) - starts[sn]
            inc[p, sn, col] = srt

        meta = _HaloMeta(n_parts, B, G, H, tuple(rounds), Mp, d, n_nodes)
        return HaloPartition(
            K=jnp.asarray(K_pad),
            conn_local=jnp.asarray(conn_local.astype(np.int32)),
            inc=jnp.asarray(inc.astype(np.int32)),
            send_idx=jnp.asarray(send_idx.astype(np.int32)),
            recv_slot=jnp.asarray(recv_slot.astype(np.int32)),
            recv_mask=jnp.asarray(recv_mask),
            new_from_old=jnp.asarray(new_from_old.astype(np.int32)),
            old_from_new=jnp.asarray(old_from_new.astype(np.int32)),
            meta=meta)

    # host-side reorder helpers (same semantics as DistPartition)
    to_new = DistPartition.to_new
    to_old = DistPartition.to_old


class HaloFEM:
    """Distributed matrix-free system with neighbor halo exchange."""

    def __init__(self, mesh: Mesh, axis: str, part: HaloPartition,
                 free_mask=None, M_inv=None):
        self.mesh = mesh
        self.axis = axis
        self.part = part
        sh = NamedSharding(mesh, P(axis))
        self.K = jax.device_put(part.K, sh)
        self.conn_local = jax.device_put(part.conn_local, sh)
        self.inc = jax.device_put(part.inc, sh)
        self.send_idx = jax.device_put(part.send_idx, sh)
        self.recv_slot = jax.device_put(part.recv_slot, sh)
        self.recv_mask = jax.device_put(part.recv_mask, sh)
        self.row_sharding = sh
        self.free_mask = free_mask
        self.M_inv = M_inv
        self._spmv = None
        self._pcg = {}

    # ------------------------------------------------------------------
    def _spmv_shard(self, K, conn_local, inc, send_idx, recv_slot, recv_mask,
                    u_own):
        m = self.part.meta
        P_ = m.n_parts
        K, conn_local, inc = K[0], conn_local[0], inc[0]
        send_idx, recv_slot, recv_mask = send_idx[0], recv_slot[0], recv_mask[0]
        nd = 3

        # forward exchange: fill ghost slots (one extra pad slot at B+G)
        u_loc = jnp.concatenate(
            [u_own, jnp.zeros((m.ghost_rows + 1, nd), u_own.dtype)], axis=0)
        for ri, delta in enumerate(m.rounds):
            buf = u_own[send_idx[ri]]                        # [H, nd]
            perm = [(q, (q + delta) % P_) for q in range(P_)]
            recv = jax.lax.ppermute(buf, self.axis, perm)
            u_loc = u_loc.at[recv_slot[ri]].add(
                recv * recv_mask[ri][:, None])
        ue = u_loc[conn_local].reshape(m.elems_per_part, m.dof_per_elem)
        Fe = _xeinsum("mij,mj->mi", K, ue)
        rows = Fe.reshape(-1, nd)
        padded = jnp.concatenate([rows, jnp.zeros((1, nd), rows.dtype)],
                                 axis=0)
        F_loc = jnp.sum(padded[inc], axis=1)                 # [B+G, nd]
        F_own = F_loc[:m.block_rows]
        F_ghost = F_loc[m.block_rows:]
        # reverse exchange: ghost partial sums back to their owners
        F_ghost_pad = jnp.concatenate(
            [F_ghost, jnp.zeros((1, nd), F_ghost.dtype)], axis=0)
        for ri, delta in enumerate(m.rounds):
            buf = (F_ghost_pad[recv_slot[ri] - m.block_rows]
                   * recv_mask[ri][:, None])
            perm = [((q + delta) % P_, q) for q in range(P_)]
            back = jax.lax.ppermute(buf, self.axis, perm)
            F_own = F_own.at[send_idx[ri]].add(back)
        return F_own

    def spmv(self, u_new):
        if self._spmv is None:
            fn = jax.shard_map(self._spmv_shard, mesh=self.mesh,
                               in_specs=(P(self.axis),) * 7,
                               out_specs=P(self.axis))
            self._spmv = jax.jit(fn)
        return self._spmv(self.K, self.conn_local, self.inc, self.send_idx,
                          self.recv_slot, self.recv_mask, u_new)

    # ------------------------------------------------------------------
    def _pcg_shard(self, tol, max_iter, eps, dot_dtype, K, conn_local, inc,
                   send_idx, recv_slot, recv_mask, b_own, mask_own, minv_own,
                   x0_own):
        axis = self.axis
        ddt = dot_dtype or b_own.dtype

        def A(u):
            return self._spmv_shard(K, conn_local, inc, send_idx, recv_slot,
                                    recv_mask, u)

        def pdot(a, b):
            # wide-scalar accumulation policy (SURVEY hard part 4)
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
                               in_specs=(P(self.axis),) * 10,
                               out_specs=(P(self.axis), P(), P(), P(), P()))
            self._pcg[key] = jax.jit(fn)
        u, st, it, rn, hist = self._pcg[key](
            self.K, self.conn_local, self.inc, self.send_idx, self.recv_slot,
            self.recv_mask, b_new, mask, minv, x0)
        return u, SolveInfo(st, it, rn, hist)

    def jacobi_preconditioner(self):
        def shard(K, inc, send_idx, recv_slot, recv_mask):
            m = self.part.meta
            d = jnp.diagonal(K[0], axis1=1, axis2=2).reshape(-1, 3)
            padded = jnp.concatenate(
                [d, jnp.zeros((1, 3), d.dtype)], axis=0)
            F_loc = jnp.sum(padded[inc[0]], axis=1)
            F_own = F_loc[:m.block_rows]
            F_ghost_pad = jnp.concatenate(
                [F_loc[m.block_rows:], jnp.zeros((1, 3), d.dtype)], axis=0)
            for ri, delta in enumerate(m.rounds):
                buf = (F_ghost_pad[recv_slot[0][ri] - m.block_rows]
                       * recv_mask[0][ri][:, None])
                perm = [((q + delta) % m.n_parts, q)
                        for q in range(m.n_parts)]
                back = jax.lax.ppermute(buf, self.axis, perm)
                F_own = F_own.at[send_idx[0][ri]].add(back)
            return F_own
        fn = jax.jit(jax.shard_map(shard, mesh=self.mesh,
                                   in_specs=(P(self.axis),) * 5,
                                   out_specs=P(self.axis)))
        diag = fn(self.K, self.inc, self.send_idx, self.recv_slot,
                  self.recv_mask)
        return jnp.where(jnp.abs(diag) > 0,
                         1.0 / jnp.where(diag == 0, 1.0, diag), 0.0)


def build_halo_fem(coords, conn, etype: str, E: float, nu: float,
                   mesh: Optional[Mesh] = None, axis: str = "parts",
                   fixed_nodes=None, labels=None, seed: int = 0, dtype=None,
                   precondition: bool = True):
    """One-call setup of the halo-exchange distributed system."""
    from ..elements.solid import stiffness
    from .partition import partition_elements

    mesh = mesh or make_mesh_1d(None, axis)
    n_parts = mesh.devices.size
    conn_np = np.asarray(conn)
    coords_np = np.asarray(jax.device_get(coords))
    N = coords_np.shape[0]
    if labels is None:
        labels, _ = partition_elements(conn_np, etype, n_parts, seed)
    # stiffness on the CPU backend — the partition build consumes it in
    # numpy and tunnel readback of TPU-tiled buffers is minutes-slow
    with jax.default_device(jax.devices("cpu")[0]):
        coords_j = (jnp.asarray(coords_np) if dtype is None
                    else jnp.asarray(coords_np, dtype))
        K = stiffness(coords_j, jnp.asarray(conn_np), etype, E, nu)
    part = HaloPartition.build(K, conn_np, N, labels, n_parts, 3)
    fem = HaloFEM(mesh, axis, part)
    if fixed_nodes is not None:
        mask_old = np.ones((N, 3), np.asarray(jax.device_get(K)).dtype)
        mask_old[np.asarray(fixed_nodes)] = 0.0
        mask_new = np.zeros((part.meta.n_parts * part.meta.block_rows, 3),
                            dtype=mask_old.dtype)
        mask_new[np.asarray(part.new_from_old)] = mask_old
        fem.free_mask = jax.device_put(jnp.asarray(mask_new), fem.row_sharding)
    if precondition:
        fem.M_inv = fem.jacobi_preconditioner()
        if fem.free_mask is not None:
            fem.M_inv = fem.M_inv * fem.free_mask
    return fem, part
