"""Cluster-structured matrix-free operator: MXU one-hot local gather/scatter.

The row-gather SpMV (ops.scatter) is bounded by the TPU indexing engine at
~3-6 ns per touched row, with M*k rows per direction.  This operator cuts
the indexed row count by the mesh's node-sharing factor (~4-6x):

* elements are grouped into clusters of E_c consecutive (locality-ordered)
  elements with at most L_max = 128 unique nodes (pow-2, = MXU lane width);
* per SpMV, only the cluster-unique node rows are gathered/combined through
  the indexing engine (~1.3 N rows instead of M*k);
* the within-cluster expansion (unique nodes -> element lanes) and
  compression (element lanes -> unique nodes) are batched one-hot matmuls,
  built on the fly from int comparisons — exact 0/1 selection, runs on the
  MXU at negligible cost;
* the cross-cluster combine reuses the valence-classed binned reduction.

Result is algebraically identical to MatrixFreeOperator (same element K),
deterministic (fixed cluster order, fixed dot reduction order).
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .scatter import CombinePlan
from ..core.xmath import einsum as _xeinsum


@jax.tree_util.register_static
@dataclasses.dataclass(frozen=True)
class _CMeta:
    n_nodes: int
    dof_per_node: int
    n_clusters: int
    elems_per_cluster: int
    l_max: int


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ClusterPlan:
    l2g: jnp.ndarray          # [B, L] int32 global node per cluster slot
    lconn: jnp.ndarray        # [B, E_c, k] int32 local slot per element node
    combine: CombinePlan      # Y_flat [B*L, nd] rows -> per-node sums [N, nd]
    meta: _CMeta

    @staticmethod
    def build(conn, n_nodes: int, dof_per_node: int = 3,
              elems_per_cluster: int = 0, l_max: int = 128) -> "ClusterPlan":
        conn = np.asarray(conn)
        M, k = conn.shape
        if elems_per_cluster <= 0:
            # largest E_c (multiple of 8) that keeps unique nodes under l_max
            elems_per_cluster = max(8, (l_max // k) * 4)
            while elems_per_cluster > 8:
                ok = True
                for a in range(0, min(M, 50 * elems_per_cluster),
                               elems_per_cluster):
                    if np.unique(conn[a:a + elems_per_cluster]).size > l_max:
                        ok = False
                        break
                if ok:
                    break
                elems_per_cluster -= 8
        E_c = elems_per_cluster
        B = -(-M // E_c)
        # vectorized per-cluster unique: pad the element list, sort each
        # cluster's node row, first-occurrence mask -> slots
        pad_elems = B * E_c - M
        conn_pad = np.concatenate(
            [conn, np.zeros((pad_elems, k), conn.dtype)], axis=0
        ) if pad_elems else conn
        rows = conn_pad.reshape(B, E_c * k).astype(np.int64)
        order = np.argsort(rows, axis=1, kind="stable")
        srt = np.take_along_axis(rows, order, axis=1)
        is_first = np.ones_like(srt, dtype=bool)
        is_first[:, 1:] = srt[:, 1:] != srt[:, :-1]
        slot_sorted = np.cumsum(is_first, axis=1) - 1       # [B, E_c*k]
        n_uniq = slot_sorted[:, -1] + 1
        if int(n_uniq.max()) > l_max:
            bad = int(np.argmax(n_uniq))
            raise ValueError(
                f"cluster {bad} has {int(n_uniq[bad])} unique nodes > "
                f"l_max={l_max}; re-order elements or lower elems_per_cluster")
        l2g = np.zeros((B, l_max), np.int64)
        bidx = np.broadcast_to(np.arange(B)[:, None], srt.shape)
        l2g[bidx[is_first], slot_sorted[is_first]] = srt[is_first]
        lconn_flat = np.empty_like(rows)
        np.put_along_axis(lconn_flat, order, slot_sorted, axis=1)
        lconn = lconn_flat.reshape(B, E_c, k)
        # combine entries: (node, cluster-slot position) for real slots only;
        # chunked by cluster blocks so each take source stays ~400 KB
        keys = srt[is_first]
        pos = (bidx * l_max + slot_sorted)[is_first]
        combine = CombinePlan.build(keys, pos, B * l_max, n_nodes,
                                    row_align=l_max)
        return ClusterPlan(
            l2g=jnp.asarray(l2g.astype(np.int32)),
            lconn=jnp.asarray(lconn.astype(np.int32)),
            combine=combine,
            meta=_CMeta(n_nodes, dof_per_node, B, E_c, l_max),
        )

    def onehot(self, dtype):
        """[B, E_c*k, L] exact 0/1 selection matrices (built on the fly)."""
        m = self.meta
        lc = self.lconn.reshape(m.n_clusters, -1)        # [B, E_c*k]
        iota = jax.lax.broadcasted_iota(jnp.int32,
                                        (1, 1, m.l_max), 2)
        return (lc[:, :, None] == iota).astype(dtype)


@jax.tree_util.register_static
@dataclasses.dataclass(frozen=True)
class _OpFlags:
    use_pallas: bool = False


@jax.tree_util.register_static
@dataclasses.dataclass(frozen=True)
class _StaticTable:
    """Hashable static holder for the (tiny) reference-gradient table."""

    data: tuple  # nested tuple [q][k][3]

    @staticmethod
    def of(arr) -> "_StaticTable":
        a = np.asarray(jax.device_get(arr), dtype=np.float64)
        return _StaticTable(tuple(tuple(tuple(r) for r in q) for q in a))

    @property
    def array(self) -> np.ndarray:
        return np.asarray(self.data)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ClusteredOperator:
    """u[N, nd] -> F[N, nd] with cluster-local MXU gather/scatter.

    ``use_pallas=True`` routes the per-cluster pipeline through the fused
    Pallas kernel (ops.pallas_kernels.cluster_spmv) — identical math, no
    one-hot HBM materialization."""

    K: jnp.ndarray            # [B, E_c, d, d] zero-padded
    plan: ClusterPlan
    flags: _OpFlags = _OpFlags()

    @staticmethod
    def build(K_elem, conn, n_nodes: int, dof_per_node: int = 3,
              plan: Optional[ClusterPlan] = None, use_pallas: bool = False,
              **plan_kw) -> "ClusteredOperator":
        conn = np.asarray(conn)
        if plan is None:
            plan = ClusterPlan.build(conn, n_nodes, dof_per_node, **plan_kw)
        m = plan.meta
        M, d, _ = K_elem.shape
        B, E_c = m.n_clusters, m.elems_per_cluster
        pad = B * E_c - M
        K_pad = jnp.concatenate(
            [jnp.asarray(K_elem),
             jnp.zeros((pad, d, d), K_elem.dtype)], axis=0
        ) if pad else jnp.asarray(K_elem)
        return ClusteredOperator(K=K_pad.reshape(B, E_c, d, d), plan=plan,
                                 flags=_OpFlags(use_pallas))

    def __call__(self, u):
        m = self.plan.meta
        nd = m.dof_per_node
        B, L, E_c = m.n_clusters, m.l_max, m.elems_per_cluster
        Uc = u[self.plan.l2g]                              # [B, L, nd] (rows)
        if self.flags.use_pallas:
            from .pallas_kernels import cluster_spmv
            lc = self.plan.lconn.reshape(B, -1)
            Yc = cluster_spmv(self.K, lc, Uc)
        else:
            oh = self.plan.onehot(u.dtype)                 # [B, E_c*k, L]
            ue = _xeinsum("bel,blc->bec", oh, Uc)        # MXU expand
            Fe = _xeinsum("beij,bej->bei", self.K,
                            ue.reshape(B, E_c, -1))        # batched GEMV
            Yc = _xeinsum("bel,bec->blc", oh,
                            Fe.reshape(B, -1, nd))         # compress
        return self.plan.combine(Yc.reshape(B * L, nd))

    def diagonal(self):
        m = self.plan.meta
        nd = m.dof_per_node
        B, L = m.n_clusters, m.l_max
        d = jnp.diagonal(self.K, axis1=2, axis2=3)         # [B, E_c, d]
        oh = self.plan.onehot(self.K.dtype)
        Yc = _xeinsum("bel,bec->blc", oh, d.reshape(B, -1, nd))
        return self.plan.combine(Yc.reshape(B * L, nd)).reshape(-1)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ClusteredPartialOperator:
    """Cluster-structured + geometry-factor SpMV: no element K in memory.

    Combines ClusterPlan's MXU one-hot local gather/scatter with the
    component-unrolled partial-assembly compute (J^-1 and w*detJ only —
    ~40 bytes per affine c3d10 element instead of 3.6 KB), so
    ten-million-element 2nd-order meshes fit and stream on a single chip.
    The compute path is elementwise-only on M-sized tensors (see
    ops.partial.pa_apply_components for the layout rationale).

    ``use_pallas=True`` keeps the one-hot expand/compress in VMEM
    (required at multi-million-element scale where the materialized
    one-hot would not fit HBM)."""

    Jinv: jnp.ndarray     # [Mpad, qJ, 9] with qJ in {1, q}
    W: jnp.ndarray        # [Mpad, q] w*detJ (zero rows for padding)
    dN: _StaticTable      # [q, k, 3] static host constant
    plan: ClusterPlan
    lam_mu: Tuple[float, float]
    flags: _OpFlags = _OpFlags()

    @staticmethod
    def build(coords, conn, etype: str, E: float, nu: float,
              rule: str = "default", plan: Optional[ClusterPlan] = None,
              affine: Optional[bool] = None, dtype=None,
              use_pallas: bool = False, n_nodes: Optional[int] = None,
              **plan_kw) -> "ClusteredPartialOperator":
        from ..core.materials import lame_parameters
        from ..elements.solid import det3x3, inv3x3, jacobians
        from ..elements.tables import element_table

        conn = np.asarray(conn)
        table = element_table(etype, rule)
        dtype = dtype or jnp.asarray(coords).dtype
        if plan is None:
            if n_nodes is None:
                raise ValueError(
                    "ClusteredPartialOperator.build needs the true node "
                    "count: pass n_nodes= (conn.max()+1 silently drops "
                    "trailing unreferenced nodes) or a prebuilt plan=")
            plan = ClusterPlan.build(conn, int(n_nodes), 3, **plan_kw)
        m = plan.meta
        J = jacobians(jnp.asarray(coords, dtype), jnp.asarray(conn), table,
                      dtype)
        detJ = det3x3(J)
        Jinv = inv3x3(J, detJ)
        W = jnp.asarray(table.weights, dtype)[None, :] * detJ
        if affine is None:
            spread = jnp.max(jnp.abs(J - J[:, :1])) / (jnp.max(jnp.abs(J)) + 1e-30)
            affine = bool(jax.device_get(spread) < 1e-4)
        if affine:
            Jinv = Jinv[:, :1]
        Jflat = Jinv.reshape(Jinv.shape[0], Jinv.shape[1], 9)
        Mpad = m.n_clusters * m.elems_per_cluster
        pad = Mpad - conn.shape[0]
        if pad:
            Jflat = jnp.concatenate(
                [Jflat, jnp.zeros((pad, Jflat.shape[1], 9), dtype)], axis=0)
            W = jnp.concatenate([W, jnp.zeros((pad, W.shape[1]), dtype)],
                                axis=0)
        return ClusteredPartialOperator(
            Jinv=Jflat, W=W, dN=_StaticTable.of(table.dN), plan=plan,
            lam_mu=(float(lame_parameters(E, nu)[0]),
                    float(lame_parameters(E, nu)[1])),
            flags=_OpFlags(use_pallas))

    def _expand(self, u):
        """u[N, nd] -> tuple of nd arrays [Mpad, k] (element nodal values)."""
        m = self.plan.meta
        B, L, E_c = m.n_clusters, m.l_max, m.elems_per_cluster
        k = self.dN.array.shape[1]
        Uc = u[self.plan.l2g]                               # [B, L, nd]
        if self.flags.use_pallas:
            from .pallas_kernels import cluster_expand
            ue = cluster_expand(self.plan.lconn.reshape(B, -1), Uc)
        else:
            oh = self.plan.onehot(u.dtype)
            ue = _xeinsum("bel,blc->bec", oh, Uc)         # [B, R, nd]
        return tuple(ue[..., c].reshape(B * E_c, k) for c in range(3))

    def _compress(self, Fe_cols, dtype):
        """tuple of nd arrays [Mpad, k] -> Yc [B, L, nd]."""
        m = self.plan.meta
        B, L = m.n_clusters, m.l_max
        Fe = jnp.stack([f.reshape(B, -1) for f in Fe_cols], axis=-1)  # [B,R,nd]
        if self.flags.use_pallas:
            from .pallas_kernels import cluster_compress
            return cluster_compress(self.plan.lconn.reshape(B, -1), Fe, L)
        oh = self.plan.onehot(dtype)
        return _xeinsum("bel,bec->blc", oh, Fe)

    def __call__(self, u):
        from .partial import pa_apply_components

        m = self.plan.meta
        nd = m.dof_per_node
        B, L = m.n_clusters, m.l_max
        lam, mu = self.lam_mu
        ue_cols = self._expand(u)
        Fe_cols = pa_apply_components(ue_cols, self.Jinv, self.W,
                                      self.dN.array, lam, mu)
        Yc = self._compress(Fe_cols, u.dtype)
        return self.plan.combine(Yc.reshape(B * L, nd))

    def diagonal(self):
        m = self.plan.meta
        nd = m.dof_per_node
        B, L = m.n_clusters, m.l_max
        lam, mu = self.lam_mu
        q = self.W.shape[1]
        qJ = self.Jinv.shape[1]
        dN = self.dN.array
        k = dN.shape[1]
        # d[3i+a] = sum_q W ((lam+mu) g_ia^2 + mu |g_i|^2), component form
        d_cols = [None, None, None]
        for qi in range(q):
            Wq = self.W[:, qi]
            for a in range(3):
                col = []
                for kk in range(k):
                    g = [sum(float(dN[qi, kk, j]) *
                             self.Jinv[:, min(qi, qJ - 1), 3 * i + j]
                             for j in range(3)) for i in range(3)]
                    norm2 = g[0] * g[0] + g[1] * g[1] + g[2] * g[2]
                    col.append(Wq * ((lam + mu) * g[a] * g[a] + mu * norm2))
                col = jnp.stack(col, axis=1)               # [Mpad, k]
                d_cols[a] = col if d_cols[a] is None else d_cols[a] + col
        Yc = self._compress(tuple(d_cols), self.W.dtype)
        return self.plan.combine(Yc.reshape(B * L, nd)).reshape(-1)
