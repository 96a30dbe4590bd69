"""Fused Pallas element-stiffness kernel (J -> g -> K in VMEM).

VERDICT r3 item 9 / SURVEY §7 step 2: the einsum stiffness pipeline
(elements/solid.py stiffness_bmat) materializes B [M, q, 6, 3k] and DBW
in HBM and runs a batched [3k, 6q] @ [6q, 3k] GEMM whose 30-wide tiles
fill ~2% of the MXU (measured 4.4M c3d10 elements/s).  This kernel keeps
the whole chain per element block in VMEM and on the VPU:

    Xe planes [k*3, S, L]   (one element per (sublane, lane) position)
    -> J = dN^T Xe per q    (9 madd-planes per q)
    -> adjugate/det inverse, W = w * detJ
    -> g[q, k, i] physical gradients
    -> isotropic closed form (the exact collapse of B^T D B, see
       solid.stiffness_isotropic):
         K[(k,c),(l,e)] = sum_q W [ lam g_k[c] g_l[e] + mu g_k[e] g_l[c]
                                    + mu (g_k . g_l) delta_ce ]

~5.3k madds/element (vs ~21.6k MXU-equivalent through B^T D B), all
dense element-lane planes: no lane padding, no HBM intermediates.  The
output is written [9 k^2, M] (entry-major) and transposed once in XLA to
the consumer layout [M, 3k, 3k].

Replaces the hot path of reference compute_c3d10_K_matrix
(solver/element.py:1191-1246) and its per-type siblings.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _stiffness_kernel(xe_ref, out_ref, *, S, L, k, dN, w, lam, mu):
    q = dN.shape[0]
    f = out_ref.dtype
    X = [[xe_ref[kk * 3 + b, 0] for b in range(3)] for kk in range(k)]

    # per-pair 3x3 blocks accumulated over quadrature points
    acc = [[[[None] * 3 for _ in range(3)] for _ in range(k)]
           for _ in range(k)]
    for qi in range(q):
        # J[a][b] = sum_k dN[q,k,a] X[k][b]
        J = [[None] * 3 for _ in range(3)]
        for a in range(3):
            for b in range(3):
                s = None
                for kk in range(k):
                    c = float(dN[qi, kk, a])
                    if c == 0.0:
                        continue
                    t = c * X[kk][b]
                    s = t if s is None else s + t
                J[a][b] = s if s is not None else jnp.zeros((S, L), f)
        # adjugate / det inverse
        c00 = J[1][1] * J[2][2] - J[1][2] * J[2][1]
        c01 = J[0][2] * J[2][1] - J[0][1] * J[2][2]
        c02 = J[0][1] * J[1][2] - J[0][2] * J[1][1]
        c10 = J[1][2] * J[2][0] - J[1][0] * J[2][2]
        c11 = J[0][0] * J[2][2] - J[0][2] * J[2][0]
        c12 = J[0][2] * J[1][0] - J[0][0] * J[1][2]
        c20 = J[1][0] * J[2][1] - J[1][1] * J[2][0]
        c21 = J[0][1] * J[2][0] - J[0][0] * J[2][1]
        c22 = J[0][0] * J[1][1] - J[0][1] * J[1][0]
        det = J[0][0] * c00 + J[0][1] * c10 + J[0][2] * c20
        inv_det = 1.0 / det
        Ji = [[c00 * inv_det, c01 * inv_det, c02 * inv_det],
              [c10 * inv_det, c11 * inv_det, c12 * inv_det],
              [c20 * inv_det, c21 * inv_det, c22 * inv_det]]
        Wq = float(w[qi]) * det
        # physical gradients g[kk][i] = sum_a Jinv[i][a] dN[q,kk,a]
        # (J[a][b] = dx_b/dxi_a as in elements.solid.jacobians, so the
        # gradient contracts the INVERSE's rows — g = Jinv . dNhat)
        g = [[None] * 3 for _ in range(k)]
        for kk in range(k):
            for i in range(3):
                s = None
                for a in range(3):
                    c = float(dN[qi, kk, a])
                    if c == 0.0:
                        continue
                    t = c * Ji[i][a]
                    s = t if s is None else s + t
                g[kk][i] = s if s is not None else jnp.zeros((S, L), f)
        # closed-form accumulation (k <= l pairs; symmetric fill below)
        for kk in range(k):
            for ll in range(kk, k):
                dot = (g[kk][0] * g[ll][0] + g[kk][1] * g[ll][1]
                       + g[kk][2] * g[ll][2]) * (mu * Wq)
                for c in range(3):
                    for e in range(3):
                        t = Wq * (lam * (g[kk][c] * g[ll][e])
                                  + mu * (g[kk][e] * g[ll][c]))
                        if c == e:
                            t = t + dot
                        prev = acc[kk][ll][c][e]
                        acc[kk][ll][c][e] = t if prev is None else prev + t

    d = 3 * k
    for kk in range(k):
        for ll in range(kk, k):
            for c in range(3):
                for e in range(3):
                    v = acc[kk][ll][c][e]
                    out_ref[(kk * 3 + c) * d + ll * 3 + e, 0] = v
                    if ll != kk or e != c:
                        out_ref[(ll * 3 + e) * d + kk * 3 + c, 0] = v


def stiffness_fused(coords, conn, etype: str, E: float, nu: float,
                    rule: str = "default", dtype=None, *,
                    block: int = 1024, interpret: bool = False):
    """Element stiffness K [M, 3k, 3k] via the fused Pallas kernel.

    Bitwise-deterministic (fixed unroll order); validated against
    stiffness_bmat to f32/f64 roundoff (tests/test_solid_kernels.py).
    """
    from ..core.materials import lame_parameters
    from ..elements.tables import element_table

    table = element_table(etype, rule)
    dtype = dtype or jnp.asarray(coords).dtype
    conn = jnp.asarray(conn)
    M, k = conn.shape
    dN = np.asarray(table.dN)
    w = np.asarray(table.weights)
    lam, mu = lame_parameters(E, nu)

    S, L = 8, 128
    per = S * L
    Mp = -(-M // per) * per
    # element planes [k*3, Mp/(S*L), S, L]: gather + transpose in XLA.
    # Pad slots replicate element 0 (a valid Jacobian — zero coords would
    # divide by det = 0); their K rows are sliced away at the end.
    Xe = jnp.asarray(coords, dtype)[conn]                  # [M, k, 3]
    if Mp > M:
        Xe = jnp.concatenate(
            [Xe, jnp.broadcast_to(Xe[:1], (Mp - M, k, 3))], axis=0)
    Xp = jnp.transpose(Xe.reshape(Mp, k * 3), (1, 0)).reshape(
        k * 3, Mp // per, S, L)

    nblk = Mp // per
    d = 3 * k
    kern = functools.partial(_stiffness_kernel, S=S, L=L, k=k, dN=dN, w=w,
                             lam=float(lam), mu=float(mu))
    out = pl.pallas_call(
        kern,
        grid=(nblk,),
        in_specs=[pl.BlockSpec((k * 3, 1, S, L), lambda i: (0, i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((d * d, 1, S, L), lambda i: (0, i, 0, 0),
                              memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((d * d, nblk, S, L), dtype),
        interpret=interpret,
    )(Xp)
    K = jnp.transpose(out.reshape(d * d, Mp), (1, 0))[:M]
    return K.reshape(M, d, d)
