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

from .scatter import ScatterPlan, _classed_bins


@jax.tree_util.register_static
@dataclasses.dataclass(frozen=True)
class _CMeta:
    n_nodes: int
    dof_per_node: int
    n_clusters: int
    elems_per_cluster: int
    l_max: int
    combine_widths: Tuple[int, ...]


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ClusterPlan:
    l2g: jnp.ndarray          # [B, L] int32 global node per cluster slot
    lconn: jnp.ndarray        # [B, E_c, k] int32 local slot per element node
    combine_inc: Tuple[jnp.ndarray, ...]  # bins into Y_flat [B*L (+1), nd]
    inv_order: jnp.ndarray    # [N] int32 node -> emitted position
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
        l2g = np.zeros((B, l_max), np.int64)
        lconn = np.zeros((B, E_c, k), np.int64)
        entries_key = []
        entries_pos = []
        for b in range(B):
            a, z = b * E_c, min((b + 1) * E_c, M)
            cells = conn[a:z]
            uniq, inv = np.unique(cells, return_inverse=True)
            if uniq.size > l_max:
                raise ValueError(
                    f"cluster {b} has {uniq.size} unique nodes > l_max="
                    f"{l_max}; re-order elements or lower elems_per_cluster")
            l2g[b, :uniq.size] = uniq
            lconn[b, :z - a] = inv.reshape(z - a, k)
            # padding elements keep slot 0; their K rows are zero only if
            # the caller zero-pads K — enforced in ClusteredOperator.build.
            entries_key.append(uniq)
            entries_pos.append(b * l_max + np.arange(uniq.size))
        keys = np.concatenate(entries_key)
        pos = np.concatenate(entries_pos)
        classes, key_order = _classed_bins(keys, pos, B * l_max)
        inv_order = np.full(n_nodes, key_order.size, np.int64)
        inv_order[key_order] = np.arange(key_order.size)
        return ClusterPlan(
            l2g=jnp.asarray(l2g.astype(np.int32)),
            lconn=jnp.asarray(lconn.astype(np.int32)),
            combine_inc=tuple(jnp.asarray(arr) for _, arr in classes),
            inv_order=jnp.asarray(inv_order.astype(np.int32)),
            meta=_CMeta(n_nodes, dof_per_node, B, E_c, l_max,
                        tuple(w for w, _ in classes)),
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
            ue = jnp.einsum("bel,blc->bec", oh, Uc)        # MXU expand
            Fe = jnp.einsum("beij,bej->bei", self.K,
                            ue.reshape(B, E_c, -1))        # batched GEMV
            Yc = jnp.einsum("bel,bec->blc", oh,
                            Fe.reshape(B, -1, nd))         # compress
        rows = Yc.reshape(B * L, nd)
        zero = jnp.zeros((1, nd), rows.dtype)
        padded = jnp.concatenate([rows, zero], axis=0)
        parts = [ScatterPlan._take_reduce(padded, inc_c, w, nd)
                 for inc_c, w in zip(self.plan.combine_inc, m.combine_widths)]
        y_sorted = jnp.concatenate(parts + [zero], axis=0)
        return jnp.take(y_sorted, self.plan.inv_order, axis=0)

    def diagonal(self):
        m = self.plan.meta
        nd = m.dof_per_node
        B, L = m.n_clusters, m.l_max
        d = jnp.diagonal(self.K, axis1=2, axis2=3)         # [B, E_c, d]
        oh = self.plan.onehot(self.K.dtype)
        Yc = jnp.einsum("bel,bec->blc", oh, d.reshape(B, -1, nd))
        rows = Yc.reshape(B * L, nd)
        zero = jnp.zeros((1, nd), rows.dtype)
        padded = jnp.concatenate([rows, zero], axis=0)
        parts = [ScatterPlan._take_reduce(padded, inc_c, w, nd)
                 for inc_c, w in zip(self.plan.combine_inc, m.combine_widths)]
        y_sorted = jnp.concatenate(parts + [zero], axis=0)
        return jnp.take(y_sorted, self.plan.inv_order, axis=0).reshape(-1)
