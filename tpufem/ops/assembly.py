"""Explicit global-matrix assembly: node-block BSR (3x3 / 6x6 blocks) + SpMV.

The reference only ever assembles a global matrix in subdivision.ipynb cell 6
(COO outer product of element DOFs -> torch.sparse_coo_tensor).  Here the
structure (unique block pairs) is built once on host, and the numeric
assembly is a deterministic device-side segment-sum over a precomputed
stable-sort permutation — so re-assembly after geometry/material updates is
a single fused XLA program, and values are bitwise reproducible.

SpMV is gather -> batched 3x3 block GEMV -> row segment-sum; rows are sorted
by construction (indices_are_sorted=True).
"""
from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from ..core.xmath import einsum as _xeinsum


@jax.tree_util.register_static
@dataclasses.dataclass(frozen=True)
class _BSRMeta:
    n_block_rows: int
    block: int


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class BSRStructure:
    """Symbolic structure + value-assembly plan for a BSR matrix."""

    indptr: jnp.ndarray     # [n_block_rows + 1] int32
    col_ids: jnp.ndarray    # [nnzb] int32 block-column per stored block
    row_ids: jnp.ndarray    # [nnzb] int32 block-row per stored block (sorted)
    perm: jnp.ndarray       # [M*k*k] int32 stable sort of the pair stream
    segments: jnp.ndarray   # [M*k*k] int32 target block per stream entry
    meta: _BSRMeta

    @property
    def nnzb(self) -> int:
        return int(self.col_ids.shape[0])

    @property
    def nnz(self) -> int:
        return self.nnzb * self.meta.block**2


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class BSRMatrix:
    """Block values stored component-planar: data9[b*i + j] is the [nnzb]
    stream of block entry (i, j).  A [nnzb, b, b] layout would be tiled
    (8, 128) on TPU — 4 KB physically per 36 B block (measured OOM at
    3M blocks); the planar layout is dense and every pass moves exactly
    the logical bytes."""

    structure: BSRStructure
    data9: jnp.ndarray      # [block*block, nnzb]

    @property
    def data(self):
        """[nnzb, block, block] view (host/compat: scipy export, tests)."""
        b = self.structure.meta.block
        return jnp.transpose(self.data9, (1, 0)).reshape(-1, b, b)

    def __call__(self, x):
        return bsr_matvec(self, x)

    def diagonal(self):
        """[n_block_rows * block] main diagonal."""
        s = self.structure
        b = s.meta.block
        diag_mask = (s.row_ids == s.col_ids).astype(self.data9.dtype)
        cols = []
        for i in range(b):
            d = self.data9[i * b + i] * diag_mask        # [nnzb]
            cols.append(jax.ops.segment_sum(
                d, s.row_ids, num_segments=s.meta.n_block_rows,
                indices_are_sorted=True))
        return jnp.stack(cols, axis=1).reshape(-1)


def build_bsr_structure(conn, n_nodes: int, block: int = 3) -> BSRStructure:
    """Host-side: unique (row, col) node-block pairs in CSR order."""
    conn = np.asarray(conn)
    M, k = conn.shape
    rows = np.repeat(conn, k, axis=1).reshape(-1).astype(np.int64)
    cols = np.tile(conn, (1, k)).reshape(-1).astype(np.int64)
    keys = rows * n_nodes + cols
    uniq, inv = np.unique(keys, return_inverse=True)
    perm = np.argsort(inv, kind="stable").astype(np.int32)
    segments = inv[perm].astype(np.int32)
    urow = (uniq // n_nodes).astype(np.int32)
    ucol = (uniq % n_nodes).astype(np.int32)
    indptr = np.zeros(n_nodes + 1, np.int32)
    np.add.at(indptr, urow + 1, 1)
    indptr = np.cumsum(indptr).astype(np.int32)
    return BSRStructure(
        indptr=jnp.asarray(indptr), col_ids=jnp.asarray(ucol),
        row_ids=jnp.asarray(urow), perm=jnp.asarray(perm),
        segments=jnp.asarray(segments),
        meta=_BSRMeta(int(n_nodes), int(block)),
    )


def assemble_bsr(K_elem, conn_k: int, structure: BSRStructure) -> BSRMatrix:
    """Device-side numeric assembly of element matrices into BSR blocks.

    K_elem: [M, k*b, k*b] with b = structure.meta.block.  Each of the b*b
    block components is assembled as a dense 1-D stream (the [*, b, b]
    form would materialize 4 KB-padded tiles per entry — OOM at scale).
    """
    b = structure.meta.block
    M = K_elem.shape[0]
    k = conn_k
    Ke = K_elem.reshape(M, k, b, k, b)
    nnzb = structure.col_ids.shape[0]
    planes = []
    for i in range(b):
        for j in range(b):
            stream = (Ke[:, :, i, :, j]
                      .reshape(M * k * k))[structure.perm]
            planes.append(jax.ops.segment_sum(
                stream, structure.segments, num_segments=nnzb,
                indices_are_sorted=True))
    return BSRMatrix(structure=structure, data9=jnp.stack(planes, axis=0))


def bsr_matvec(A: BSRMatrix, x):
    """y[N, b] = A @ x[N, b] (deterministic row-ordered reduction).

    The block GEMV is b*b elementwise multiply-adds on dense [nnzb]
    streams (one row gather of x, one row segment-sum of y)."""
    s = A.structure
    b = s.meta.block
    xg = x.reshape(-1, b)[s.col_ids]                       # [nnzb, b]
    cols = []
    for i in range(b):
        acc = None
        for j in range(b):
            t = A.data9[i * b + j] * xg[:, j]
            acc = t if acc is None else acc + t
        cols.append(acc)
    prod = jnp.stack(cols, axis=1)                         # [nnzb, b]
    y = jax.ops.segment_sum(prod, s.row_ids,
                            num_segments=s.meta.n_block_rows,
                            indices_are_sorted=True)
    return y.reshape(x.shape)


def to_scipy(A: BSRMatrix):
    """Export to scipy.sparse.bsr_matrix (host, for validation)."""
    import scipy.sparse as sp
    s = A.structure
    b = s.meta.block
    return sp.bsr_matrix(
        (np.asarray(A.data), np.asarray(s.col_ids), np.asarray(s.indptr)),
        shape=(s.meta.n_block_rows * b, s.meta.n_block_rows * b),
    )


def assemble_dense(K_elem, conn, n_nodes: int, block: int = 3):
    """Small-problem dense assembly [N*b, N*b] (hybrid subdomain factors)."""
    conn = np.asarray(conn)
    s = build_bsr_structure(conn, n_nodes, block)
    A = assemble_bsr(K_elem, conn.shape[1], s)
    b = block
    dense = jnp.zeros((n_nodes, b, n_nodes, b), dtype=K_elem.dtype)
    dense = dense.at[s.row_ids, :, s.col_ids, :].add(A.data)
    return dense.reshape(n_nodes * b, n_nodes * b)
