"""Partial-assembly (geometry-factor) matrix-free operator.

The reference's SpMV streams the full per-element stiffness each iteration
(d^2 floats/element, solver/element.py:429-464).  On TPU the SpMV is HBM
bandwidth-bound, so this operator stores only the quadrature geometry
(J^-1 and w*detJ — 10 floats per integration point, or a single set for
affine elements) and recomputes the stiffness action on the fly:

    eps  = sym(J^-T dNhat^T u_e)            per ip   (ref-coord gradients)
    sig  = lam tr(eps) I + 2 mu eps                  (isotropic)
    F_e += w detJ dNhat J^-1 sig                     (B^T sig without B)

Identical result to the assembled-K operator (tested to fp tolerance) at
~d^2/10q times less memory traffic — 22x for c3d10/4ip — which is the
difference between HBM-bound and compute-light.  This is the classic
high-order matrix-free factorization (cf. MFEM/libCEED), mapped to XLA as
three batched einsums the compiler fuses.
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core.materials import lame_parameters
from ..elements.solid import det3x3, inv3x3, jacobians
from ..elements.tables import ElementTable, element_table
from .scatter import ScatterPlan
from ..core.xmath import einsum as _xeinsum


def pa_apply_components(ue_cols, Jinv_cols, W, dN, lam, mu):
    """Component-unrolled partial-assembly action (layout-safe at scale).

    On TPU, dot_generals that contract size-3 dims on M-sized tensors force
    3-wide lane layouts with up to 56x padding (measured OOM at 1M
    elements).  This form uses only elementwise [M]-vector chains (XLA
    fuses them into one pass over elements) and static Python unrolls over
    (q, k, 3x3).

    Args:
      ue_cols: tuple of 3 arrays [M, k] — element nodal values per component.
      Jinv_cols: [M, qJ, 9] with qJ in {1, q} — J^-1 entries (row-major).
      W: [M, q] — w * detJ.
      dN: numpy/jnp [q, k, 3] reference gradients (constants).
    Returns:
      tuple of 3 arrays [M, k] — element nodal forces per component.
    """
    q = W.shape[1]
    k = ue_cols[0].shape[1]
    qJ = Jinv_cols.shape[1]
    dN = np.asarray(dN)  # must be a host constant (not traced)
    Fe = [[None] * k for _ in range(3)]
    for qi in range(q):
        Ji = [[Jinv_cols[:, min(qi, qJ - 1), 3 * i + j] for j in range(3)]
              for i in range(3)]
        # Hhat[a][c] = sum_k dN[qi, k, a] ue_c[:, k]
        Hhat = [[None] * 3 for _ in range(3)]
        for a in range(3):
            for c in range(3):
                acc = None
                for kk in range(k):
                    w = float(dN[qi, kk, a])
                    if w == 0.0:
                        continue
                    term = w * ue_cols[c][:, kk]
                    acc = term if acc is None else acc + term
                Hhat[a][c] = acc if acc is not None else 0.0
        # H[i][c] = sum_j Jinv[i][j] Hhat[j][c]
        H = [[sum(Ji[i][j] * Hhat[j][c] for j in range(3)) for c in range(3)]
             for i in range(3)]
        # sig = lam tr(eps) I + 2 mu eps, eps = sym(H)
        tr = H[0][0] + H[1][1] + H[2][2]
        sig = [[mu * (H[i][c] + H[c][i]) for c in range(3)] for i in range(3)]
        for i in range(3):
            sig[i][i] = sig[i][i] + lam * tr
        # T[j][c] = W * sum_i Jinv[i][j] sig[i][c]
        Wq = W[:, qi]
        T = [[Wq * sum(Ji[i][j] * sig[i][c] for i in range(3))
              for c in range(3)] for j in range(3)]
        # Fe_c[:, kk] += sum_j dN[qi, kk, j] T[j][c]
        for c in range(3):
            for kk in range(k):
                acc = None
                for j in range(3):
                    w = float(dN[qi, kk, j])
                    if w == 0.0:
                        continue
                    term = w * T[j][c]
                    acc = term if acc is None else acc + term
                if acc is None:
                    continue
                prev = Fe[c][kk]
                Fe[c][kk] = acc if prev is None else prev + acc
    zero = jnp.zeros_like(W[:, 0])
    return tuple(
        jnp.stack([Fe[c][kk] if Fe[c][kk] is not None else zero
                   for kk in range(k)], axis=1)
        for c in range(3))


@jax.tree_util.register_static
@dataclasses.dataclass(frozen=True)
class _PAMeta:
    etype: str
    lam: float
    mu: float
    affine: bool


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class PartialAssemblyOperator:
    """u[N,3] -> F[N,3], geometry-factor form (isotropic material)."""

    Jinv: jnp.ndarray    # [M, q, 3, 3] or [M, 1, 3, 3] (affine)
    W: jnp.ndarray       # [M, q] w * detJ
    conn: jnp.ndarray    # [M, k]
    dN: jnp.ndarray      # [q, k, 3] reference-gradient table
    plan: ScatterPlan
    meta: _PAMeta

    @staticmethod
    def build(coords, conn, etype: str, E: float, nu: float,
              rule: str = "default", plan: Optional[ScatterPlan] = None,
              affine: Optional[bool] = None, dtype=None,
              table: Optional[ElementTable] = None,
              n_nodes: Optional[int] = None) -> "PartialAssemblyOperator":
        table = table or element_table(etype, rule)
        dtype = dtype or coords.dtype
        conn_j = jnp.asarray(np.asarray(conn))
        J = jacobians(jnp.asarray(coords, dtype), conn_j, table, dtype)
        detJ = det3x3(J)
        Jinv = inv3x3(J, detJ)
        W = jnp.asarray(table.weights, dtype)[None, :] * detJ
        if affine is None:
            # affine iff J is constant across ips (within fp tolerance)
            spread = jnp.max(jnp.abs(J - J[:, :1])) / (jnp.max(jnp.abs(J)) + 1e-30)
            affine = bool(jax.device_get(spread) < 1e-4)
        if affine:
            Jinv = Jinv[:, :1]
        if plan is None:
            if n_nodes is None:
                raise ValueError(
                    "PartialAssemblyOperator.build needs the true node count: "
                    "pass n_nodes= (conn.max()+1 silently drops trailing "
                    "unreferenced nodes) or a prebuilt plan=")
            plan = ScatterPlan.build(np.asarray(conn), int(n_nodes), 3)
        lam, mu = lame_parameters(E, nu)
        return PartialAssemblyOperator(
            Jinv=Jinv, W=W, conn=conn_j,
            dN=jnp.asarray(table.dN, dtype), plan=plan,
            meta=_PAMeta(etype.lower(), float(lam), float(mu), affine))

    def __call__(self, u):
        lam, mu = self.meta.lam, self.meta.mu
        ue = u[self.conn]                                   # [M, k, 3]
        # reference-coordinate displacement gradient per ip
        Hhat = _xeinsum("qka,mkb->mqab", self.dN, ue)     # [M, q, 3, 3]
        # physical gradient H[i, b] = sum_j Jinv[i, j] Hhat[j, b]
        H = _xeinsum("mqij,mqjb->mqib", self.Jinv_b(), Hhat)
        eps = 0.5 * (H + jnp.swapaxes(H, -1, -2))
        tr = eps[..., 0, 0] + eps[..., 1, 1] + eps[..., 2, 2]
        sig = 2.0 * mu * eps
        sig = sig + (lam * tr)[..., None, None] * jnp.eye(3, dtype=u.dtype)
        # T[j, b] = w detJ sum_i Jinv[i, j] sig[i, b]
        T = _xeinsum("mq,mqij,mqib->mqjb", self.W, self.Jinv_b(), sig)
        Fe = _xeinsum("qkj,mqjb->mkb", self.dN, T)        # [M, k, 3]
        return self.plan.scatter(Fe.reshape(Fe.shape[0], -1)).reshape(u.shape)

    def Jinv_b(self):
        """Jinv broadcast to [M, q, 3, 3] (affine stores a single slice)."""
        if self.meta.affine and self.Jinv.shape[1] == 1:
            return jnp.broadcast_to(
                self.Jinv, (self.Jinv.shape[0], self.W.shape[1], 3, 3))
        return self.Jinv

    def diagonal(self):
        """Assembled diagonal [n_dof]: (lam+mu) g_ia^2 + mu |g_i|^2."""
        lam, mu = self.meta.lam, self.meta.mu
        g = _xeinsum("mqij,qkj->mqki", self.Jinv_b(), self.dN)  # [M,q,k,3]
        g2 = _xeinsum("mq,mqka,mqka->mka", self.W, g, g)        # sum_q W g^2
        norm2 = jnp.sum(g2, axis=-1, keepdims=True)               # [M,k,1]
        d = (lam + mu) * g2 + mu * norm2                          # [M,k,3]
        return self.plan.scatter(d.reshape(d.shape[0], -1))


def chunked_geometry(coords, conn_sel, table, dtype, chunk: int = 1 << 21):
    """(Jinv [M, q, 3, 3], W [M, q], affine) computed in element chunks.

    The jacobians einsum at HIGHEST precision materializes lane-padded
    [3, M, k] intermediates (~2 KB/element at c3d10) — at 10M elements
    that alone exceeds HBM, so the geometry build streams element chunks
    through the device (build-time only; the result is 40-160 B/element).
    """
    import jax as _jax

    M = conn_sel.shape[0]
    if M <= chunk:
        J = jacobians(coords, jnp.asarray(conn_sel), table, dtype)
        detJ = det3x3(J)
        spread = (jnp.max(jnp.abs(J - J[:, :1]))
                  / (jnp.max(jnp.abs(J)) + 1e-30))
        return (inv3x3(J, detJ),
                jnp.asarray(table.weights, dtype)[None, :] * detJ,
                bool(_jax.device_get(spread) < 1e-4))

    @_jax.jit
    def one(coords_in, conn_chunk):
        J = jacobians(coords_in, conn_chunk, table, dtype)
        detJ = det3x3(J)
        spread = jnp.max(jnp.abs(J - J[:, :1])) / (jnp.max(jnp.abs(J)) + 1e-30)
        return (inv3x3(J, detJ),
                jnp.asarray(table.weights, dtype)[None, :] * detJ, spread)

    parts_J, parts_W, spreads = [], [], []
    conn_np = np.asarray(conn_sel)
    for a in range(0, M, chunk):
        b = min(a + chunk, M)
        cc = conn_np[a:b]
        pad = chunk - (b - a)
        if pad:  # keep one static shape -> one compile for all chunks
            cc = np.concatenate([cc, np.broadcast_to(cc[:1], (pad,) + cc.shape[1:])])
        Ji, Wi, sp = one(coords, jnp.asarray(cc))
        parts_J.append(Ji[: b - a])
        parts_W.append(Wi[: b - a])
        spreads.append(float(_jax.device_get(sp)))
    return (jnp.concatenate(parts_J, axis=0),
            jnp.concatenate(parts_W, axis=0),
            bool(max(spreads) < 1e-4))
