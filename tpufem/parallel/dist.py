"""Multi-chip distributed operator + PCG via shard_map over a device mesh.

Scheme (SURVEY.md 2.8 — the communication backend the reference never had):

* Elements are partitioned over chips (region-growing labels); nodes are
  owned by the lowest-numbered adjacent part and renumbered so each part
  owns one contiguous, equal-size (padded) block of rows.
* Distributed SpMV inside one ``shard_map``:
    u_own [B,3] --all_gather(ICI)--> u_full --local gather/GEMV/segment-sum
    --> F_full --psum_scatter(ICI)--> F_own [B,3]
  Dot products are local vdots + ``psum``.  All collectives ride ICI; the
  per-shard reduction keeps the deterministic sorted-segment order, and
  cross-shard sums have a fixed mesh order (bitwise-stable across runs).
* The whole PCG loop (operator + collectives + scalars) is ONE jitted
  shard_map program — zero host round-trips per iteration.

The all-gather/reduce-scatter pair moves O(N) per SpMV which is optimal for
dense-ish partition interfaces; a neighbor-ppermute halo exchange is layered
on top in ops.halo (overlap path) when the partition graph is sparse.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.scatter import element_dofs
from ..solvers.cg import CONVERGED, MAX_ITER, NAN_INF, NOT_SPD, RUNNING, SolveInfo
from ..core.xmath import einsum as _xeinsum


@jax.tree_util.register_static
@dataclasses.dataclass(frozen=True)
class _DistMeta:
    n_parts: int
    block_rows: int       # B owned (padded) nodes per part
    n_nodes: int          # original N
    elems_per_part: int   # Mp (padded)
    dof_per_elem: int


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class DistPartition:
    """Device-resident partition plan; leading axis = parts (sharded)."""

    K: jnp.ndarray          # [P, Mp, d, d]
    conn: jnp.ndarray       # [P, Mp, k] int32 (padded new-id node space)
    inc: jnp.ndarray        # [P, P*B, W] int32 rows into Fe [Mp*k (+1), nd]
    new_from_old: jnp.ndarray  # [N] int32 node renumbering
    old_from_new: jnp.ndarray  # [P*B] int32 (padding rows -> -1)
    meta: _DistMeta

    # ------------------------------------------------------------------
    @staticmethod
    def build(K_elem, conn, n_nodes: int, labels, n_parts: int,
              dof_per_node: int = 3) -> "DistPartition":
        """Host-side construction from element stiffness + partition labels."""
        conn = np.asarray(conn)
        labels = np.asarray(labels)
        K_np = np.asarray(K_elem)
        M, k = conn.shape
        d = k * dof_per_node

        from .partition import owner_of_nodes
        owner = owner_of_nodes(conn, labels, n_nodes)
        counts = np.bincount(owner, minlength=n_parts)
        B = int(counts.max())
        # rank within owning part (stable by old id)
        order = np.argsort(owner, kind="stable")
        rank = np.empty(n_nodes, dtype=np.int64)
        offsets = np.zeros(n_parts + 1, dtype=np.int64)
        offsets[1:] = np.cumsum(counts)
        rank[order] = np.arange(n_nodes) - offsets[owner[order]]
        new_from_old = owner * B + rank
        old_from_new = np.full(n_parts * B, -1, dtype=np.int64)
        old_from_new[new_from_old] = np.arange(n_nodes)

        part_sizes = np.bincount(labels, minlength=n_parts)
        Mp = int(part_sizes.max())
        n_nodes_pad = n_parts * B

        conn_new = new_from_old[conn]
        K_pad = np.zeros((n_parts, Mp, d, d), dtype=K_np.dtype)
        conn_pad = np.zeros((n_parts, Mp, k), dtype=np.int64)
        # per-part node-binned incidence over REAL element rows only
        # (padding elements have zero K and never enter any bin)
        part_rows = []
        W = 1
        for p in range(n_parts):
            sel = np.nonzero(labels == p)[0]
            K_pad[p, :sel.size] = K_np[sel]
            conn_pad[p, :sel.size] = conn_new[sel]
            rows = conn_new[sel].reshape(-1)          # node per (e_local, l)
            cnt = np.bincount(rows, minlength=n_nodes_pad)
            W = max(W, int(cnt.max()))
            part_rows.append(rows)
        inc = np.full((n_parts, n_nodes_pad, W), Mp * k, dtype=np.int32)
        for p in range(n_parts):
            rows = part_rows[p]
            cnt = np.bincount(rows, minlength=n_nodes_pad)
            srt = np.argsort(rows, kind="stable")
            starts = np.zeros(n_nodes_pad + 1, np.int64)
            starts[1:] = np.cumsum(cnt)
            sn = rows[srt]
            col = np.arange(rows.size) - starts[sn]
            inc[p, sn, col] = srt.astype(np.int32)

        meta = _DistMeta(n_parts, B, n_nodes, Mp, d)
        return DistPartition(
            K=jnp.asarray(K_pad),
            conn=jnp.asarray(conn_pad.astype(np.int32)),
            inc=jnp.asarray(inc),
            new_from_old=jnp.asarray(new_from_old.astype(np.int32)),
            old_from_new=jnp.asarray(old_from_new.astype(np.int32)),
            meta=meta,
        )

    # ------------------------------------------------------------------
    def to_new(self, field):
        """[N, c] old node order -> [P*B, c] padded new order (host-side)."""
        f = np.asarray(jax.device_get(field))
        out = np.zeros((self.meta.n_parts * self.meta.block_rows, f.shape[1]),
                       dtype=f.dtype)
        out[np.asarray(self.new_from_old)] = f
        return jnp.asarray(out)

    def to_old(self, field_new):
        """[P*B, c] padded new order -> [N, c] (host-side)."""
        f = np.asarray(jax.device_get(field_new))
        return jnp.asarray(f[np.asarray(self.new_from_old)])


class DistFEM:
    """Distributed matrix-free FEM system on a 1-D device mesh."""

    def __init__(self, mesh: Mesh, axis: str, part: DistPartition,
                 free_mask=None, M_inv=None):
        self.mesh = mesh
        self.axis = axis
        self.part = part
        m = part.meta
        self.n_dof_pad = m.n_parts * m.block_rows * 3
        row_sharding = NamedSharding(mesh, P(axis))
        part_sharding = NamedSharding(mesh, P(axis))
        # place partition arrays sharded over parts
        self.K = jax.device_put(part.K, part_sharding)
        self.conn = jax.device_put(part.conn, part_sharding)
        self.inc = jax.device_put(part.inc, part_sharding)
        self.row_sharding = row_sharding
        self.free_mask = free_mask      # [P*B, 3] new order (or None)
        self.M_inv = M_inv              # [P*B, 3] new order (or None)
        self._spmv = None
        self._pcg = {}

    # -- sharded kernels -------------------------------------------------
    def _spmv_shard(self, K, conn, inc, u_own):
        """Per-shard body; u_own [B, 3] -> F_own [B, 3].

        Row-gather + node-binned gather-reduce (see ops.scatter for the
        measured rationale; flat gather/scatter serialize on TPU).
        """
        m = self.part.meta
        K = K[0]
        conn = conn[0]
        inc = inc[0]
        u_full = jax.lax.all_gather(u_own, self.axis, tiled=True)  # [P*B,3]
        ue = u_full[conn].reshape(m.elems_per_part, m.dof_per_elem)
        Fe = _xeinsum("mij,mj->mi", K, ue)
        rows = Fe.reshape(-1, 3)
        padded = jnp.concatenate([rows, jnp.zeros((1, 3), rows.dtype)], axis=0)
        F_full = jnp.sum(padded[inc], axis=1)                      # [P*B, 3]
        return jax.lax.psum_scatter(F_full, self.axis,
                                    scatter_dimension=0, tiled=True)

    def spmv(self, u_new):
        """u [P*B, 3] (new order, row-sharded) -> K u, one shard_map."""
        if self._spmv is None:
            fn = jax.shard_map(
                self._spmv_shard, mesh=self.mesh,
                in_specs=(P(self.axis),) * 4,
                out_specs=P(self.axis))
            self._spmv = jax.jit(fn)
        return self._spmv(self.K, self.conn, self.inc, u_new)

    # -- distributed PCG -------------------------------------------------
    def _pcg_shard(self, tol, max_iter, eps, dot_dtype, K, conn, inc,
                   b_own, mask_own, minv_own, x0_own):
        axis = self.axis
        ddt = dot_dtype or b_own.dtype

        def A(u):
            return self._spmv_shard(K, conn, inc, u)

        def pdot(a, b):
            # wide-scalar accumulation policy (SURVEY hard part 4): vectors
            # stay in storage dtype, recurrence scalars in dot_dtype
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
        hist0 = jnp.full((max_iter + 1,), jnp.inf, dtype=b_own.dtype)
        hist0 = hist0.at[0].set(r0n)
        status0 = jnp.where(r0n < tol, CONVERGED, RUNNING).astype(jnp.int32)

        def cond(s):
            return (s[0] < max_iter) & (s[5] == RUNNING)

        def body(s):
            i, u, r, p, rz, status, hist = s
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
                                     jnp.where(rn < tol, CONVERGED,
                                               RUNNING))).astype(jnp.int32)
            take = ~bad_curv & ~bad
            u1 = jnp.where(take, u1, u)
            r1 = jnp.where(take, r1, r)
            p1 = jnp.where(take, p1, p)
            rz1 = jnp.where(take, rz1, rz)
            hist = hist.at[i + 1].set(jnp.where(take, rn, hist[i]))
            return (i + 1, u1, r1, p1, rz1, ns, hist)

        i, u, r, p, rz, status, hist = jax.lax.while_loop(
            cond, body, (jnp.int32(0), u0, r0, p0, rz0, status0, hist0))
        status = jnp.where(status == RUNNING, MAX_ITER, status)
        rn = jnp.sqrt(pdot(r, r))
        return u, status, i, rn, hist

    def pcg(self, b_new, x0=None, tol: float = 1e-8, max_iter: int = 1000,
            eps: float = 1e-30, dot_dtype=None):
        """Distributed PCG; b [P*B, 3] new order.  Returns (u, SolveInfo)."""
        m = self.part.meta
        shape = (m.n_parts * m.block_rows, 3)
        mask = (self.free_mask if self.free_mask is not None
                else jnp.ones(shape, b_new.dtype))
        minv = (self.M_inv if self.M_inv is not None
                else jnp.ones(shape, b_new.dtype))
        x0 = jnp.zeros(shape, b_new.dtype) if x0 is None else x0
        key = (float(tol), int(max_iter), str(dot_dtype))
        if key not in self._pcg:
            fn = jax.shard_map(
                partial(self._pcg_shard, tol, max_iter, eps, dot_dtype),
                mesh=self.mesh,
                in_specs=(P(self.axis),) * 7,
                out_specs=(P(self.axis), P(), P(), P(), P()))
            self._pcg[key] = jax.jit(fn)
        u, status, iters, rn, hist = self._pcg[key](
            self.K, self.conn, self.inc, b_new, mask, minv, x0)
        return u, SolveInfo(status, iters, rn, hist)

    # -- helpers ---------------------------------------------------------
    def jacobi_preconditioner(self):
        """Owned-row inverse diagonal [P*B, 3] via one distributed pass."""
        def shard(K, inc):
            d = jnp.diagonal(K[0], axis1=1, axis2=2)      # [Mp, d]
            rows = d.reshape(-1, 3)
            padded = jnp.concatenate(
                [rows, jnp.zeros((1, 3), rows.dtype)], axis=0)
            F_full = jnp.sum(padded[inc[0]], axis=1)
            return jax.lax.psum_scatter(F_full, self.axis,
                                        scatter_dimension=0, tiled=True)
        fn = jax.jit(jax.shard_map(
            shard, mesh=self.mesh, in_specs=(P(self.axis),) * 2,
            out_specs=P(self.axis)))
        diag = fn(self.K, self.inc)
        return jnp.where(jnp.abs(diag) > 0, 1.0 / jnp.where(diag == 0, 1.0, diag), 0.0)


def make_mesh_1d(n_devices: Optional[int] = None, axis: str = "parts") -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return jax.make_mesh((n,), (axis,), devices=devs[:n])


def make_mesh_2d(shape: Tuple[int, int],
                 axes: Tuple[str, str] = ("dcn", "ici")) -> Mesh:
    """(hosts, chips-per-host) hierarchy: part p = host * chips + chip.

    On real multi-host TPU the outer axis rides DCN and the inner rides
    ICI (jax.devices() orders local chips contiguously per host); combined
    with parallel.partition.hierarchical_partition this keeps most halo
    pairs on the fast fabric.
    """
    devs = jax.devices()
    n = shape[0] * shape[1]
    return jax.make_mesh(shape, axes, devices=devs[:n])


def build_distributed_fem(coords, conn, etype: str, E: float, nu: float,
                          n_parts: Optional[int] = None,
                          mesh: Optional[Mesh] = None, axis: str = "parts",
                          fixed_nodes=None, labels=None, seed: int = 0,
                          dtype=None, precondition: bool = True
                          ) -> Tuple[DistFEM, DistPartition]:
    """One-call setup: partition + element stiffness + distributed system."""
    from ..elements.solid import stiffness
    from .partition import partition_elements

    mesh = mesh or make_mesh_1d(n_parts, axis)
    n_parts = mesh.devices.size
    conn_np = np.asarray(conn)
    coords_np = np.asarray(jax.device_get(coords))
    N = coords_np.shape[0]
    if labels is None:
        labels, _ = partition_elements(conn_np, etype, n_parts, seed)
    # stiffness on the CPU backend (see build_halo_fem: tunnel readback of
    # TPU-tiled element stiffness is minutes-slow)
    with jax.default_device(jax.devices("cpu")[0]):
        coords_j = (jnp.asarray(coords_np) if dtype is None
                    else jnp.asarray(coords_np, dtype))
        K = stiffness(coords_j, jnp.asarray(conn_np), etype, E, nu)
    part = DistPartition.build(K, conn_np, N, labels, n_parts, 3)
    fem = DistFEM(mesh, axis, part)
    if fixed_nodes is not None:
        mask_old = np.ones((N, 3), dtype=np.asarray(jax.device_get(K)).dtype)
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
