"""Pallas TPU kernels for the cluster-structured SpMV.

The XLA form of ClusteredOperator materializes the per-cluster one-hot
selection matrices ([B, E_c*k, L] floats) to HBM twice per SpMV — that
traffic rivals the element-stiffness stream itself.  These kernels build
the one-hot from integer compares INSIDE VMEM and immediately contract it
on the MXU, so it never touches HBM:

    expand:   ue[b] = onehot(lconn[b]) @ Uc[b]      [E_c*k, L] @ [L, nd]
    compress: Yc[b] = onehot(lconn[b])^T @ Fe[b]    [L, E_c*k] @ [.., nd]

The batched element GEMV between them stays in XLA (measured at HBM
speed-of-light).  Mosaic constraints honored: no lane-dim reshapes, one
batch dim, one contracting dim per dot.  Exact 0/1 selection,
deterministic.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from ..core.xmath import einsum as _xeinsum


def _onehot(lc, L, dtype):
    iota = jax.lax.broadcasted_iota(jnp.int32, (1, 1, L), 2)
    return (lc[:, :, None] == iota).astype(dtype)


def _expand_kernel(lconn_ref, u_ref, out_ref):
    """out[TB, R, nd] = onehot[TB, R, L] @ u[TB, L, nd]."""
    L = u_ref.shape[1]
    oh = _onehot(lconn_ref[:], L, u_ref.dtype)
    pet = jnp.promote_types(u_ref.dtype, jnp.float32)
    out_ref[:] = jax.lax.dot_general(
        oh, u_ref[:],
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=pet).astype(out_ref.dtype)


def _compress_kernel(lconn_ref, fe_ref, out_ref, *, L: int):
    """out[TB, L, nd] = onehot[TB, R, L]^T @ fe[TB, R, nd]."""
    oh = _onehot(lconn_ref[:], L, fe_ref.dtype)
    pet = jnp.promote_types(fe_ref.dtype, jnp.float32)
    out_ref[:] = jax.lax.dot_general(
        oh, fe_ref[:],
        dimension_numbers=(((1,), (1,)), ((0,), (0,))),
        preferred_element_type=pet).astype(out_ref.dtype)


def _tile(B: int, tile_clusters: int) -> int:
    TB = tile_clusters
    while B % TB:
        TB //= 2
    return max(TB, 1)


def cluster_expand(lconn, Uc, *, tile_clusters: int = 8,
                   interpret: bool = False):
    """[B, L, nd] cluster-unique values -> [B, E_c*k, nd] element lanes."""
    B, L, nd = Uc.shape
    R = lconn.shape[1]
    TB = _tile(B, tile_clusters)
    return pl.pallas_call(
        _expand_kernel,
        grid=(B // TB,),
        in_specs=[
            pl.BlockSpec((TB, R), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, L, nd), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TB, R, nd), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, R, nd), Uc.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=int(2 * B * R * L * nd),
            bytes_accessed=int(Uc.size * Uc.dtype.itemsize * (1 + R // L)),
            transcendentals=0),
    )(lconn, Uc)


def cluster_compress(lconn, Fe, L: int, *, tile_clusters: int = 8,
                     interpret: bool = False):
    """[B, E_c*k, nd] element-lane values -> [B, L, nd] cluster sums."""
    B, R, nd = Fe.shape
    TB = _tile(B, tile_clusters)
    kernel = functools.partial(_compress_kernel, L=L)
    return pl.pallas_call(
        kernel,
        grid=(B // TB,),
        in_specs=[
            pl.BlockSpec((TB, R), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, R, nd), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TB, L, nd), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, L, nd), Fe.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=int(2 * B * R * L * nd),
            bytes_accessed=int(Fe.size * Fe.dtype.itemsize * 2),
            transcendentals=0),
    )(lconn, Fe)


def cluster_spmv(K, lconn, Uc, *, tile_clusters: int = 8,
                 interpret: bool = False):
    """Full cluster SpMV core: expand (Pallas) -> GEMV (XLA) -> compress
    (Pallas).  Returns Yc [B, L, nd]."""
    B, L, nd = Uc.shape
    _, E_c, d, _ = K.shape
    ue = cluster_expand(lconn, Uc, tile_clusters=tile_clusters,
                        interpret=interpret)              # [B, E_c*k, nd]
    Fe = _xeinsum("beij,bej->bei", K,
                    ue.reshape(B, E_c, d))                # XLA batched GEMV
    return cluster_compress(lconn, Fe.reshape(B, E_c * (d // nd), nd), L,
                            tile_clusters=tile_clusters, interpret=interpret)
