"""Distributed packed-layout operator: the flagship single-chip SpMV
(ops.packed — dense [rows, 384] tiles, Pallas lane-gather kernels)
sharded over a device mesh.

Design (one GLOBAL PackedPlan, built with window_buckets=0 so clusters
stay Morton-ordered and node blocks stay in first-touch order — both
spatially contiguous):

* device d owns cluster range [d Bp, (d+1) Bp) and node-block range
  [d Nbp, (d+1) Nbp) — contiguous slices of the global plan tables;
* the SpMV exchanges GHOST ROWS at block granularity (whole 384-lane
  rows — slab transfers, no lane padding): X rows that a device's
  cluster windows read from remote blocks before the cluster stage, and
  Yc rows (cluster slot sums) that a device's block windows read from
  remote clusters before the combine.  No reverse scatter is needed:
  the combine PULLS every contribution through its fixed window order,
  so the reduction order is fixed: bitwise-stable across runs, and
  equal to the single-device packed operator to fp roundoff (different
  XLA programs) at every device count;
* interior/boundary overlap split (SURVEY hard part 3): each device's
  clusters are reordered interior-first (window entirely in the owned
  block range); the interior cluster stage depends only on owned X rows,
  so XLA's latency-hiding scheduler can overlap it with the X ghost
  ppermute rounds — only the boundary clusters wait.

Capability: completes the reference's scaling intent (subdivision.ipynb
cells 6-15; the notebook exists because big meshes did NOT fit one GPU)
with its fastest operator: geometry factors only (~40 B/element affine
c3d10), whole PCG in one shard_map program, psum scalars.
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops import packed_kernels as pk
from ..ops.packed import (BLK, ROW, PackedPartialOperator, PackedPlan,
                          block_apply, invert_block_planes, pa_apply_planar,
                          pa_blockdiag_planar, pa_diag_planar)
from ..solvers.cg import (CONVERGED, MAX_ITER, NAN_INF, NOT_SPD, RUNNING,
                          SolveInfo)
from .dist import make_mesh_1d
from .halo_partial import _color_rounds

_TABLE_NAMES = ("win_nodes", "wslot", "jslot", "lconn", "cinc", "Jinv", "W",
                "winc", "slotidx", "xsend", "xrecv", "xmask", "csend",
                "crecv", "cmask")


@jax.tree_util.register_static
@dataclasses.dataclass(frozen=True)
class _PDMeta:
    n_parts: int
    Bp: int                  # clusters per device (padded, multiple of 8)
    Nbp: int                 # node blocks per device (padded, multiple of 8)
    Gx: int                  # ghost X block rows (max over devices; +1 scratch)
    Gc: int                  # ghost Yc cluster rows (likewise)
    Hx: int                  # max rows per X exchange round
    Hc: int
    x_rounds: Tuple[Tuple[Tuple[int, int], ...], ...]
    c_rounds: Tuple[Tuple[Tuple[int, int], ...], ...]
    interior_cut: int        # static per-device interior-cluster count (mult 8)
    elems_per_cluster: int
    nodes_per_elem: int
    lanes: int
    win_n: int
    win_c: int
    v_widths: Tuple[int, ...]   # single global bucket
    n_q: int
    n_qj: int
    n_nodes: int
    lam: float
    mu: float


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class PackedDistPartition:
    """Per-device slices of one global PackedPlan + ghost-row exchange."""

    # cluster tables [P, Bp, ...] (win_nodes remapped to local-ext block ids)
    win_nodes: jnp.ndarray   # [P, Bp, Wn] -> [0, Nbp+Gx]; pad = Nbp+Gx
    wslot: jnp.ndarray       # [P, Bp, 128]
    jslot: jnp.ndarray       # [P, Bp, 128]
    lconn: jnp.ndarray       # [P, Bp, Rp]
    cinc: jnp.ndarray        # [P, Bp, Wp, 128] byte-packed incidence
    Jinv: jnp.ndarray        # [P, qJ, 9, Bp, E_c]
    W: jnp.ndarray           # [P, q, Bp, E_c]
    # block tables [P, Nbp, ...] (winc remapped to local-ext cluster ids)
    winc: jnp.ndarray        # [P, Nbp, Wc] -> [0, Bp+Gc]; pad = Bp+Gc
    slotidx: jnp.ndarray     # [P, Nbp, ceil(Wc/4), 128] byte-packed
    # exchanges (block rows of X; cluster rows of Yc)
    xsend: jnp.ndarray       # [P, Rx, Hx] local row to send (pad 0)
    xrecv: jnp.ndarray       # [P, Rx, Hx] ghost slot; masked -> Gx (scratch)
    xmask: jnp.ndarray       # [P, Rx, Hx]
    csend: jnp.ndarray       # [P, Rc, Hc]
    crecv: jnp.ndarray       # [P, Rc, Hc]
    cmask: jnp.ndarray       # [P, Rc, Hc]
    new_from_old: jnp.ndarray   # [N] -> global packed node id (< P*Nbp*128)
    old_from_new: jnp.ndarray   # [P*Nbp*128] (-1 pad)
    dN: tuple                # static [q][k][3]
    meta: _PDMeta

    # -- construction -------------------------------------------------------
    @staticmethod
    def build(coords, conn, etype: str, E: float, nu: float, n_parts: int,
              n_nodes: Optional[int] = None, rule: str = "default",
              dtype=None, elems_per_cluster: int = 32,
              affine: Optional[bool] = None) -> "PackedDistPartition":
        conn = np.asarray(conn)
        coords_np = np.asarray(coords)
        if n_nodes is None:
            n_nodes = coords_np.shape[0]
        plan = PackedPlan.build(coords_np, conn, int(n_nodes),
                                elems_per_cluster, window_buckets=0)
        m = plan.meta
        assert len(m.c_groups) == 1 and len(m.cv_widths) == 1
        Wn = max(m.c_groups[0][2], 1)
        Wc = max(m.b_groups[0][2], 1)
        v_widths = m.cv_widths[0]
        Pn = n_parts

        # pad global cluster/block counts to P * (multiple of 8)
        Bp = -(-m.n_clusters // (Pn * 8)) * 8
        Nbp = -(-m.n_blocks // (Pn * 8)) * 8
        Bt, Nbt = Pn * Bp, Pn * Nbp

        def padc(a, fill):   # pad cluster-axis tables to Bt rows
            out = np.full((Bt,) + a.shape[1:], fill, a.dtype)
            out[: a.shape[0]] = a
            return out

        def padb(a, fill):   # pad block-axis tables to Nbt rows
            out = np.full((Nbt,) + a.shape[1:], fill, a.dtype)
            out[: a.shape[0]] = a
            return out

        win_nodes = padc(np.asarray(plan.win_nodes)[:, :Wn].astype(np.int64),
                         m.n_blocks)
        wslot = padc(np.asarray(plan.wslot), Wn)
        jslot = padc(np.asarray(plan.jslot), 0)
        lconn = padc(np.asarray(plan.lconn), 0)
        cinc = padc(np.asarray(plan.cinc[0]), 0)
        esrc = padc(np.asarray(plan.esrc).reshape(m.n_clusters, -1), -1)
        winc = padb(np.asarray(plan.winc)[:, :Wc].astype(np.int64),
                    m.n_clusters)
        # slotidx is byte-packed 4 windows per int32 word (0 = absent)
        slotidx = padb(np.asarray(plan.slotidx)[:, : -(-Wc // 4)], 0)

        cluster_owner = np.arange(Bt) // Bp
        block_owner = np.arange(Nbt) // Nbp

        # interior-first reorder within each device's cluster range
        wn_valid = win_nodes < m.n_blocks
        w_owner = np.where(wn_valid,
                           block_owner[np.minimum(win_nodes, Nbt - 1)], -1)
        is_int = ((w_owner == cluster_owner[:, None]) | ~wn_valid).all(axis=1)
        cperm = np.empty(Bt, np.int64)
        int_counts = []
        for d in range(Pn):
            sl = np.arange(d * Bp, (d + 1) * Bp)
            ii = is_int[sl]
            cperm[sl] = np.concatenate([sl[ii], sl[~ii]])
            int_counts.append(int(ii.sum()))
        Mi = (min(int_counts) // 8) * 8 if int_counts else 0
        cpos = np.empty(Bt, np.int64)
        cpos[cperm] = np.arange(Bt)
        win_nodes = win_nodes[cperm]
        wslot = wslot[cperm]
        jslot = jslot[cperm]
        lconn = lconn[cperm]
        cinc = cinc[cperm]
        esrc = esrc[cperm]
        winc = np.where(winc < m.n_clusters,
                        cpos[np.minimum(winc, Bt - 1)], Bt)

        # ghost lists + local-ext remaps
        def ghosts_and_remap(tab, owner_val, n_local, n_valid):
            """tab values are global ids in [0, n_valid) (>= n_valid = pad).
            Returns (per-device ghost id lists, local-ext table, G)."""
            rows_per = tab.shape[0] // Pn
            ghosts, remap = [], np.empty_like(tab)
            for d in range(Pn):
                sl = slice(d * rows_per, (d + 1) * rows_per)
                vals = tab[sl]
                valid = vals < n_valid
                own = owner_val[np.minimum(vals, owner_val.size - 1)]
                remote = valid & (own != d)
                gl = np.unique(vals[remote])
                ghosts.append(gl)
                gidx = np.full(owner_val.size, -1, np.int64)
                gidx[gl] = np.arange(gl.size)
                ext = n_local + gidx[np.minimum(vals, owner_val.size - 1)]
                remap[sl] = np.where(remote, ext,
                                     np.where(valid, vals - d * n_local, -1))
            G = max(1, max((g.size for g in ghosts), default=1))
            return ghosts, remap, G

        xg, win_l, Gx = ghosts_and_remap(win_nodes, block_owner,
                                         Nbp, m.n_blocks)
        cg_, winc_l, Gc = ghosts_and_remap(winc, cluster_owner, Bp, Bt)
        win_l = np.where(win_l < 0, Nbp + Gx, win_l)     # pad -> scratch (0)
        winc_l = np.where(winc_l < 0, Bp + Gc, winc_l)

        def exchange(ghosts, owner_val, n_local):
            pairs = {}
            for d in range(Pn):
                src = owner_val[ghosts[d]]
                for s in np.unique(src):
                    pairs[(int(s), d)] = int((src == s).sum())
            plist = sorted(pairs)
            rounds = [r for r in _color_rounds(plist,
                                               [pairs[e] for e in plist])
                      if r]
            H = max(1, max(pairs.values(), default=1))
            R = max(1, len(rounds))
            send = np.zeros((Pn, R, H), np.int64)
            recv = np.full((Pn, R, H), -1, np.int64)
            mask = np.zeros((Pn, R, H), np.float64)
            for ri, prs in enumerate(rounds):
                for s, d in prs:
                    mine = np.nonzero(owner_val[ghosts[d]] == s)[0]
                    h = mine.size
                    send[s, ri, :h] = ghosts[d][mine] - s * n_local
                    recv[d, ri, :h] = mine
                    mask[d, ri, :h] = 1.0
            return rounds, send, recv, mask, H, R

        x_rounds, xsend, xrecv, xmask, Hx, Rx = exchange(xg, block_owner,
                                                         Nbp)
        c_rounds, csend, crecv, cmask, Hc, Rc = exchange(cg_, cluster_owner,
                                                         Bp)
        xrecv = np.where(xrecv < 0, Gx, xrecv)   # masked -> scratch row
        crecv = np.where(crecv < 0, Gc, crecv)

        # geometry factors over the padded, reordered element set
        from ..core.materials import lame_parameters
        from ..elements.tables import element_table
        from ..ops.partial import chunked_geometry
        table = element_table(etype, rule)
        dtype = dtype or jnp.asarray(coords).dtype
        esrc_f = esrc.reshape(-1)
        conn_sel = conn[np.maximum(esrc_f, 0)]
        Jinv, Wq, affine_meas = chunked_geometry(
            jnp.asarray(coords_np, dtype), conn_sel, table, dtype)
        Wq = Wq * jnp.asarray(esrc_f >= 0, dtype)[:, None]
        if affine is None:
            affine = affine_meas
        if affine:
            Jinv = Jinv[:, :1]
        qJ = Jinv.shape[1]
        q = Wq.shape[1]
        E_c = m.elems_per_cluster
        # [Bt*E_c, qJ, 9] -> [P, qJ, 9, Bp, E_c]
        Jp = jnp.transpose(Jinv.reshape(Pn, Bp, E_c, qJ, 9), (0, 3, 4, 1, 2))
        Wp = jnp.transpose(Wq.reshape(Pn, Bp, E_c, q), (0, 3, 1, 2))
        lam, mu = lame_parameters(E, nu)

        # node mapping: global packed ids (pad node space to P*Nbp*128)
        nfo = np.asarray(plan.new_from_old).astype(np.int64)
        ofn = np.full(Nbt * BLK, -1, np.int64)
        ofn[: m.n_blocks * BLK] = np.asarray(plan.old_from_new)

        meta = _PDMeta(
            Pn, Bp, Nbp, Gx, Gc, Hx, Hc,
            tuple(tuple(r) for r in x_rounds),
            tuple(tuple(r) for r in c_rounds),
            Mi, E_c, m.nodes_per_elem, m.lanes, Wn, Wc, tuple(v_widths),
            q, qJ, int(n_nodes), float(lam), float(mu))
        dNt = tuple(tuple(tuple(float(v) for v in row) for row in pt)
                    for pt in np.asarray(table.dN))
        i32 = lambda a: jnp.asarray(  # noqa: E731
            np.ascontiguousarray(a).astype(np.int32))
        return PackedDistPartition(
            win_nodes=i32(win_l.reshape(Pn, Bp, Wn)),
            wslot=i32(wslot.reshape(Pn, Bp, BLK)),
            jslot=i32(jslot.reshape(Pn, Bp, BLK)),
            lconn=i32(lconn.reshape(Pn, Bp, -1)),
            cinc=jnp.asarray(np.ascontiguousarray(
                cinc.reshape(Pn, Bp, -1, BLK))),
            Jinv=Jp, W=Wp,
            winc=i32(winc_l.reshape(Pn, Nbp, Wc)),
            slotidx=i32(slotidx.reshape(Pn, Nbp, -1, BLK)),
            xsend=i32(xsend), xrecv=i32(xrecv),
            xmask=jnp.asarray(xmask, dtype),
            csend=i32(csend), crecv=i32(crecv),
            cmask=jnp.asarray(cmask, dtype),
            new_from_old=i32(nfo), old_from_new=i32(ofn),
            dN=dNt, meta=meta)

    # -- packing helpers (host) ---------------------------------------------
    def pack_np(self, u: np.ndarray) -> np.ndarray:
        """u [N, 3] -> X [P*Nbp, 384] (sharded row layout)."""
        m = self.meta
        rows = m.n_parts * m.Nbp
        out = np.zeros((rows * BLK, 3), u.dtype)
        out[np.asarray(self.new_from_old)] = u
        out = out.reshape(rows, BLK, 3).transpose(0, 2, 1)
        return np.ascontiguousarray(out).reshape(rows, ROW)

    def unpack_np(self, X) -> np.ndarray:
        m = self.meta
        rows = m.n_parts * m.Nbp
        u = np.asarray(X).reshape(rows, 3, BLK).transpose(0, 2, 1)
        return u.reshape(rows * BLK, 3)[np.asarray(self.new_from_old)]


class PackedHaloFEM:
    """Distributed packed-layout matrix-free system (one PCG program)."""

    def __init__(self, mesh: Mesh, axis: str, part: PackedDistPartition,
                 free_mask=None, M_inv=None, interpret=None):
        if interpret is None:   # Pallas kernels need interpret off-TPU
            interpret = jax.default_backend() != "tpu"
        self.interpret = bool(interpret)
        self.mesh = mesh
        self.axis = axis
        self.part = part
        sh = NamedSharding(mesh, P(axis))
        self._tables = tuple(jax.device_put(getattr(part, n), sh)
                             for n in _TABLE_NAMES)
        self.row_sharding = sh
        self.free_mask = free_mask
        self.M_inv = M_inv
        self._spmv = None
        self._pcg = {}

    # ------------------------------------------------------------------
    def _yc_slice(self, Xp, t, lo, n):
        """Cluster stage (expand -> pa -> compress) for clusters
        [lo, lo+n) of this device, gathering from the extended rows Xp."""
        m = self.part.meta
        dN = np.asarray(self.part.dN)
        sl = lambda a: jax.lax.dynamic_slice_in_dim(a, lo, n, 0)  # noqa: E731
        Xw = Xp[sl(t["win_nodes"])]
        ue = pk.expand(Xw, sl(t["wslot"]), sl(t["jslot"]), sl(t["lconn"]),
                       interpret=self.interpret)
        ue3 = PackedPartialOperator._lanes_to_planar(
            ue, m.nodes_per_elem, m.elems_per_cluster)
        Jc = jax.lax.dynamic_slice_in_dim(t["Jinv"], lo, n, 2)
        Wc = jax.lax.dynamic_slice_in_dim(t["W"], lo, n, 1)
        fe3 = pa_apply_planar(ue3, Jc, Wc, dN, m.lam, m.mu)
        Fe = PackedPartialOperator._planar_to_lanes(fe3, m.lanes)
        ci = sl(t["cinc"])
        return pk.compress_gather(Fe, ci, m.v_widths,
                                  interpret=self.interpret)

    def _exchange(self, rows, send, recv, mask, rounds, G):
        """Ghost-row exchange: returns [G+1, 384] (last row = zero scratch)."""
        out = jnp.zeros((G + 1, ROW), rows.dtype)
        for ri, prs in enumerate(rounds):
            buf = rows[send[ri]]
            got = jax.lax.ppermute(buf, self.axis, list(prs))
            out = out.at[recv[ri]].add(got * mask[ri][:, None])
        return out

    def _spmv_shard(self, tables, X):
        t = {n: a[0] for n, a in zip(_TABLE_NAMES, tables)}
        m = self.part.meta
        Mi = m.interior_cut

        # phase 1: interior clusters — reads owned X rows only (their
        # windows are local by construction), so XLA may overlap this
        # with the ppermute rounds below
        Xp0 = jnp.concatenate(
            [X, jnp.zeros((m.Gx + 1, ROW), X.dtype)], axis=0)
        parts = []
        if Mi > 0:
            parts.append(self._yc_slice(Xp0, t, 0, Mi))
        # ghost X rows (block-granular slab exchange)
        Xg = self._exchange(X, t["xsend"], t["xrecv"], t["xmask"],
                            m.x_rounds, m.Gx)
        X_ext = jnp.concatenate([X, Xg], axis=0)
        if m.Bp - Mi > 0:
            parts.append(self._yc_slice(X_ext, t, Mi, m.Bp - Mi))
        Yc = parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=0)

        # ghost Yc rows, then the pull-combine over owned blocks
        Ycg = self._exchange(Yc, t["csend"], t["crecv"], t["cmask"],
                             m.c_rounds, m.Gc)
        Yc_ext = jnp.concatenate([Yc, Ycg], axis=0)
        return pk.combine(Yc_ext[t["winc"]], t["slotidx"], m.win_c,
                          interpret=self.interpret)

    def spmv(self, X):
        if self._spmv is None:
            n = len(_TABLE_NAMES)

            def fn(*args):
                return self._spmv_shard(args[:n], args[n])

            self._spmv = jax.jit(jax.shard_map(
                fn, mesh=self.mesh, check_vma=False, in_specs=(P(self.axis),) * (n + 1),
                out_specs=P(self.axis)))
        return self._spmv(*self._tables, X)

    # ------------------------------------------------------------------
    def _diag_shard(self, tables):
        t = {n: a[0] for n, a in zip(_TABLE_NAMES, tables)}
        m = self.part.meta
        dN = np.asarray(self.part.dN)
        d3 = pa_diag_planar(t["Jinv"], t["W"], dN, m.lam, m.mu)
        Fe = PackedPartialOperator._planar_to_lanes(d3, m.lanes)
        Yc = pk.compress_gather(Fe, t["cinc"], m.v_widths,
                                interpret=self.interpret)
        Ycg = self._exchange(Yc, t["csend"], t["crecv"], t["cmask"],
                             m.c_rounds, m.Gc)
        Yc_ext = jnp.concatenate([Yc, Ycg], axis=0)
        return pk.combine(Yc_ext[t["winc"]], t["slotidx"], m.win_c,
                          interpret=self.interpret)

    def jacobi_preconditioner(self):
        n = len(_TABLE_NAMES)
        fn = jax.jit(jax.shard_map(
            lambda *a: self._diag_shard(a), mesh=self.mesh, check_vma=False,
            in_specs=(P(self.axis),) * n, out_specs=P(self.axis)))
        d = fn(*self._tables)
        return jnp.where(jnp.abs(d) > 0,
                         1.0 / jnp.where(d == 0, 1.0, d), 0.0)

    def _blockdiag_shard(self, tables):
        t = {n: a[0] for n, a in zip(_TABLE_NAMES, tables)}
        m = self.part.meta
        dN = np.asarray(self.part.dN)
        d3, o3 = pa_blockdiag_planar(t["Jinv"], t["W"], dN, m.lam, m.mu)
        out = []
        for f3 in (d3, o3):
            Fe = PackedPartialOperator._planar_to_lanes(f3, m.lanes)
            Yc = pk.compress_gather(Fe, t["cinc"], m.v_widths,
                                    interpret=self.interpret)
            Ycg = self._exchange(Yc, t["csend"], t["crecv"], t["cmask"],
                                 m.c_rounds, m.Gc)
            Yc_ext = jnp.concatenate([Yc, Ycg], axis=0)
            out.append(pk.combine(Yc_ext[t["winc"]], t["slotidx"], m.win_c,
                                  interpret=self.interpret))
        return out[0], out[1]

    def block_jacobi_preconditioner(self, mask=None):
        """(inv_d, inv_o) row-sharded packed planes — exact 3x3
        node-block inverse (see ops.packed.BlockJacobi)."""
        n = len(_TABLE_NAMES)
        fn = jax.jit(jax.shard_map(
            lambda *a: self._blockdiag_shard(a), mesh=self.mesh,
            check_vma=False, in_specs=(P(self.axis),) * n,
            out_specs=(P(self.axis), P(self.axis))))
        D, O = fn(*self._tables)
        return invert_block_planes(D, O, mask)

    # ------------------------------------------------------------------
    def _pcg_shard(self, tol, max_iter, eps, dot_dtype, tables, b, mask,
                   minv_d, minv_o, x0):
        axis = self.axis
        ddt = dot_dtype or b.dtype

        def A(u):
            return self._spmv_shard(tables, u)

        def pdot(a, c):
            s = jnp.sum(a.astype(ddt) * c.astype(ddt))
            return jax.lax.psum(s, axis).astype(b.dtype)

        def project(r):
            return r * mask

        def apply_M(r):
            # scalar Jacobi is the inv_o == 0 special case of the 3x3
            # node-block apply — one code path for both
            return block_apply(minv_d, minv_o, r)

        u0 = project(x0)
        r0 = project(b - A(u0))
        z0 = apply_M(r0)
        p0 = z0
        rz0 = pdot(r0, z0)
        r0n = jnp.sqrt(pdot(r0, r0))
        hist0 = jnp.full((max_iter + 1,), jnp.inf, b.dtype).at[0].set(r0n)
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
            z1 = apply_M(r1)
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

        i, u, r, p, rz, st, hist = jax.lax.while_loop(
            cond, body, (jnp.int32(0), u0, r0, p0, rz0, st0, hist0))
        st = jnp.where(st == RUNNING, MAX_ITER, st)
        return u, st, i, jnp.sqrt(pdot(r, r)), hist

    def pcg(self, b, x0=None, tol: float = 1e-8, max_iter: int = 1000,
            eps: float = 1e-30, dot_dtype=None):
        m = self.part.meta
        rows = m.n_parts * m.Nbp
        mask = (self.free_mask if self.free_mask is not None
                else jnp.ones((rows, ROW), b.dtype))
        if self.M_inv is None:
            minv_d = jnp.ones((rows, ROW), b.dtype)
            minv_o = jnp.zeros((rows, ROW), b.dtype)
        elif isinstance(self.M_inv, tuple):
            minv_d, minv_o = self.M_inv
        else:
            minv_d = self.M_inv
            minv_o = jnp.zeros((rows, ROW), b.dtype)
        x0 = jnp.zeros((rows, ROW), b.dtype) if x0 is None else x0
        key = (float(tol), int(max_iter), str(dot_dtype))
        if key not in self._pcg:
            n = len(_TABLE_NAMES)

            def fn(*args):
                return self._pcg_shard(tol, max_iter, eps, dot_dtype,
                                       args[:n], *args[n:])

            self._pcg[key] = jax.jit(jax.shard_map(
                fn, mesh=self.mesh, check_vma=False,
                in_specs=(P(self.axis),) * (n + 5),
                out_specs=(P(self.axis), P(), P(), P(), P())))
        u, st, it, rn, hist = self._pcg[key](*self._tables, b, mask,
                                             minv_d, minv_o, x0)
        return u, SolveInfo(st, it, rn, hist)


def build_packed_halo_fem(coords, conn, etype: str, E: float, nu: float,
                          mesh: Optional[Mesh] = None, axis: str = "parts",
                          fixed_nodes=None, dtype=None,
                          elems_per_cluster: int = 32,
                          precondition="jacobi", interpret=None):
    """One-call setup of the distributed packed-layout system."""
    mesh = mesh or make_mesh_1d(None, axis)
    n_parts = mesh.devices.size
    conn_np = np.asarray(conn)
    coords_np = np.asarray(coords)
    N = coords_np.shape[0]
    part = PackedDistPartition.build(coords_np, conn_np, etype, E, nu,
                                     n_parts, dtype=dtype,
                                     elems_per_cluster=elems_per_cluster)
    fem = PackedHaloFEM(mesh, axis, part, interpret=interpret)
    fdt = np.dtype(jax.dtypes.canonicalize_dtype(jnp.asarray(part.W).dtype))
    mask_n = np.ones((N, 3), fdt)
    if fixed_nodes is not None:
        mask_n[np.asarray(fixed_nodes)] = 0.0
    maskX = jnp.asarray(part.pack_np(mask_n))
    fem.free_mask = jax.device_put(maskX, fem.row_sharding)
    if precondition == "block":
        inv_d, inv_o = fem.block_jacobi_preconditioner(mask=fem.free_mask)
        fem.M_inv = (jax.device_put(inv_d, fem.row_sharding),
                     jax.device_put(inv_o, fem.row_sharding))
    elif precondition:
        minv = fem.jacobi_preconditioner() * fem.free_mask
        fem.M_inv = jax.device_put(minv, fem.row_sharding)
    return fem, part
