"""Batched solid-element kernels (stiffness / mass / stress), TPU-first.

One generic pipeline covers all solid types (c3d4/10/8/20/6/15): the
per-type shape-gradient tables (elements/tables.py) are compile-time
constants, and every stage is a batched einsum over all M elements and all
q integration points at once — XLA fuses the Jacobian/inverse/scale chain
and maps the big contractions onto the MXU.  This replaces the reference's
per-integration-point Python loops that rebuild dN tensors and materialize
[M,6,dof] B matrices in HBM (solver/element.py:1191-1239, SURVEY.md 3.2).

The stiffness path builds the Voigt B matrix directly in a lane-packed
[M, q, 6, 3k] layout via one constant-tensor MXU contraction and computes
K = (W D B)^T B as a single batched matmul (Precision.HIGHEST) — [*, 3]-
minor intermediates are lane-padded 42x on TPU, so the naive outer-product
/ stack / transpose formulations lose to pure relayout cost (measured;
PERFORMANCE.md cost model).
"""
from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.materials import elasticity_matrix, lame_parameters
from ..core.voigt import stress_tensor, von_mises
from .tables import ElementTable, element_table
from ..core.xmath import einsum as _xeinsum


# ---------------------------------------------------------------------------
# 3x3 helpers (explicit adjugate: cheaper + fusable vs linalg on TPU)
# ---------------------------------------------------------------------------

def det3x3(J):
    """Determinant of [..., 3, 3]."""
    return (
        J[..., 0, 0] * (J[..., 1, 1] * J[..., 2, 2] - J[..., 1, 2] * J[..., 2, 1])
        - J[..., 0, 1] * (J[..., 1, 0] * J[..., 2, 2] - J[..., 1, 2] * J[..., 2, 0])
        + J[..., 0, 2] * (J[..., 1, 0] * J[..., 2, 1] - J[..., 1, 1] * J[..., 2, 0])
    )


def inv3x3(J, det: Optional[jnp.ndarray] = None):
    """Inverse of [..., 3, 3] via adjugate; optionally reuse the determinant."""
    if det is None:
        det = det3x3(J)
    c00 = J[..., 1, 1] * J[..., 2, 2] - J[..., 1, 2] * J[..., 2, 1]
    c01 = J[..., 0, 2] * J[..., 2, 1] - J[..., 0, 1] * J[..., 2, 2]
    c02 = J[..., 0, 1] * J[..., 1, 2] - J[..., 0, 2] * J[..., 1, 1]
    c10 = J[..., 1, 2] * J[..., 2, 0] - J[..., 1, 0] * J[..., 2, 2]
    c11 = J[..., 0, 0] * J[..., 2, 2] - J[..., 0, 2] * J[..., 2, 0]
    c12 = J[..., 0, 2] * J[..., 1, 0] - J[..., 0, 0] * J[..., 1, 2]
    c20 = J[..., 1, 0] * J[..., 2, 1] - J[..., 1, 1] * J[..., 2, 0]
    c21 = J[..., 0, 1] * J[..., 2, 0] - J[..., 0, 0] * J[..., 2, 1]
    c22 = J[..., 0, 0] * J[..., 1, 1] - J[..., 0, 1] * J[..., 1, 0]
    adj = jnp.stack([
        jnp.stack([c00, c01, c02], axis=-1),
        jnp.stack([c10, c11, c12], axis=-1),
        jnp.stack([c20, c21, c22], axis=-1),
    ], axis=-2)
    return adj / det[..., None, None]


# ---------------------------------------------------------------------------
# Geometry: Jacobians and physical shape gradients
# ---------------------------------------------------------------------------

def jacobians(coords, conn, table: ElementTable, dtype=None):
    """J[M, q, 3, 3] with J[a, b] = d x_b / d xi_a.

    Same contraction as reference compute_*_Jacobian
    (solver/element.py:1026-1060: einsum("ji,mjk->mik")), batched over all
    integration points at once.
    """
    dtype = dtype or coords.dtype
    Xe = coords[conn].astype(dtype)                       # [M,k,3]
    dN = jnp.asarray(table.dN, dtype=dtype)               # [q,k,3]
    return _xeinsum("qka,mkb->mqab", dN, Xe)


def shape_gradients_from_J(J, table: ElementTable, dtype=None):
    """g[M, q, k, 3]: physical gradients dN_k/dx at every ip."""
    dtype = dtype or J.dtype
    detJ = det3x3(J)
    Jinv = inv3x3(J, detJ)
    dN = jnp.asarray(table.dN, dtype=dtype)
    g = _xeinsum("mqij,qkj->mqki", Jinv, dN)
    return g, detJ


def shape_gradients(coords, conn, table: ElementTable, dtype=None):
    J = jacobians(coords, conn, table, dtype)
    return shape_gradients_from_J(J, table, dtype)


def volumes(coords, conn, table: Optional[ElementTable] = None, etype: Optional[str] = None):
    """Element volumes = sum_q w detJ (exact for affine geometry)."""
    if table is None:
        table = element_table(etype)
    J = jacobians(coords, conn, table)
    detJ = det3x3(J)
    w = jnp.asarray(table.weights, dtype=detJ.dtype)
    return _xeinsum("q,mq->m", w, detJ)


# ---------------------------------------------------------------------------
# B-matrix (explicit, for anisotropic D and parity checks)
# ---------------------------------------------------------------------------

_VOIGT_PAIRS = ((0, 0), (1, 1), (2, 2), (0, 1), (1, 2), (2, 0))


def _packed_b_coeffs(table: ElementTable, dtype=np.float64) -> np.ndarray:
    """CB[q, 3, 3, 6, 3k]: constant tensor with B = einsum(Jinv, CB).

    B[m,q,r,(3i+a)] = sum_{c,j} Jinv[m,q,c,j] * CB[q,c,j,r,3i+a] builds the
    full Voigt B matrix in a lane-packed [M, q, 6, 3k] layout by one MXU
    contraction — [*, 3]-minor tensors are lane-padded 42x on TPU, so the
    stack/transpose construction of b_matrix_from_gradients costs more in
    relayout passes than the whole stiffness contraction (measured; see
    PERFORMANCE.md cost model).
    """
    dN = np.asarray(table.dN, dtype)                    # [q, k, 3]
    q, k, _ = dN.shape
    CB = np.zeros((q, 3, 3, 6, 3 * k), dtype)
    for r, (p0, p1) in enumerate(_VOIGT_PAIRS):
        for j in range(3):
            if r < 3:
                CB[:, p0, j, r, p0::3] += dN[:, :, j]
            else:
                CB[:, p1, j, r, p0::3] += dN[:, :, j]
                CB[:, p0, j, r, p1::3] += dN[:, :, j]
    return CB


_cb_cache: dict = {}


def _packed_b_cb(table: ElementTable, etype: str, rule: str, dtype):
    # keyed on the table object itself (kept alive by the cache entry, so
    # id() can never be recycled) — a custom table must not hit or poison
    # the (etype, rule) standard-table coefficients.
    key = id(table)
    if key not in _cb_cache:
        _cb_cache[key] = (table, _packed_b_coeffs(table))  # host np constant
    return jnp.asarray(_cb_cache[key][1], dtype)


def b_matrix_from_gradients(g):
    """B[M, q, 6, k, 3] from gradients g[M, q, k, 3].

    Rows: [e_xx, e_yy, e_zz, g_xy, g_yz, g_zx] — matches reference
    compute_*_B_matrix row layout (solver/element.py:868-880).
    """
    gx, gy, gz = g[..., 0], g[..., 1], g[..., 2]       # [M,q,k]
    zero = jnp.zeros_like(gx)
    rows = [
        jnp.stack([gx, zero, zero], axis=-1),
        jnp.stack([zero, gy, zero], axis=-1),
        jnp.stack([zero, zero, gz], axis=-1),
        jnp.stack([gy, gx, zero], axis=-1),
        jnp.stack([zero, gz, gy], axis=-1),
        jnp.stack([gz, zero, gx], axis=-1),
    ]
    return jnp.stack(rows, axis=2)                      # [M,q,6,k,3]


# ---------------------------------------------------------------------------
# Stiffness
# ---------------------------------------------------------------------------

def stiffness(coords, conn, etype: str, E: float, nu: float,
              rule: str = "default", table: Optional[ElementTable] = None,
              dtype=None, fused: Optional[bool] = None):
    """Element stiffness K[M, 3k, 3k] — isotropic.

    Capability parity with reference compute_*_K_matrix
    (solver/element.py:883, 1191, 1754, 2140, 2631).  On TPU, k <= 10
    element types route to the fused Pallas planar kernel
    (ops.stiffness_kernels.stiffness_fused: J -> g -> closed-form
    K in VMEM; measured 14.4M vs 4.4M c3d10 elements/s = 3.25x at 83k
    on v5e, parity 1.8e-5 rel vs the einsum path in f32, exact in the
    f64 interpret tests).  Elsewhere (CPU tests, c3d15/c3d20 whose
    [9 k^2, tile] accumulators exceed VMEM, custom rules) the
    lane-packed B^T D B GEMM pipeline; the 7x-fewer-FLOP
    stiffness_isotropic closed form in XLA loses 2.4x to stride-3 slice
    updates and stays a cross-check.
    """
    if fused is None:
        try:    # committed arrays pin the platform (the hybrid builder
            plat = list(coords.devices())[0].platform   # runs CPU-placed)
        except Exception:
            plat = jax.default_backend()
        fused = (plat == "tpu" and rule == "default" and table is None
                 and element_table(etype, rule).dN.shape[1] <= 10)
    if fused:
        from ..ops.stiffness_kernels import stiffness_fused
        return stiffness_fused(coords, conn, etype, E, nu, rule=rule,
                               dtype=dtype)
    return stiffness_bmat(coords, conn, etype, elasticity_matrix(E, nu),
                          rule=rule, table=table, dtype=dtype)


def stiffness_isotropic(coords, conn, etype: str, E: float, nu: float,
                        rule: str = "default",
                        table: Optional[ElementTable] = None, dtype=None):
    """Element stiffness by the isotropic closed form (no B matrix).

    For isotropic D, B^T D B collapses exactly (substitute the Lame form
    of D into the Voigt contraction) to

        K[(k,c),(l,e)] = sum_q W_q [ lam g_k[c] g_l[e] + mu g_k[e] g_l[c]
                                     + mu (g_k . g_l) delta_ce ]

    with g the physical shape gradients: one batched contraction
    O = sum_q W g g^T plus blockwise transposes — ~7x fewer FLOPs and no
    [M, q, 6, 3k] intermediates.  Validated equal to stiffness_bmat to
    1e-14 relative (f64) for every solid type.  On v5e the stride-3
    slice updates make it SLOWER than the GEMM pipeline (45 vs 19 ms at
    83k c3d10) — kept as the algebraic basis for a future planar VPU
    kernel and as an independent cross-check of the B pipeline.
    """
    from ..core.materials import lame_parameters
    table = table or element_table(etype, rule)
    dtype = dtype or coords.dtype
    J = jacobians(coords, conn, table, dtype)
    g, detJ = shape_gradients_from_J(J, table, dtype)    # [M, q, k, 3]
    W = jnp.asarray(table.weights, dtype=dtype)[None, :] * detJ
    M, q, k, _ = g.shape
    gf = g.reshape(M, q, 3 * k)
    hi = jax.lax.Precision.HIGHEST
    O = _xeinsum("mqx,mqy->mxy", gf * W[:, :, None], gf, precision=hi)
    lam, mu = lame_parameters(E, nu)
    lam = jnp.asarray(lam, dtype)
    mu = jnp.asarray(mu, dtype)
    K = lam * O
    # mu * blockwise (3x3) transpose: out[(k,c),(l,e)] += mu O[(k,e),(l,c)]
    for c in range(3):
        for e in range(3):
            K = K.at[:, c::3, e::3].add(mu * O[:, e::3, c::3])
    # mu * (g_k . g_l) on the component diagonal = mu * block-trace of O
    A = O[:, 0::3, 0::3] + O[:, 1::3, 1::3] + O[:, 2::3, 2::3]
    for c in range(3):
        K = K.at[:, c::3, c::3].add(mu * A)
    return K


def _packed_B_and_W(coords, conn, etype, rule, table, dtype):
    """(B [M,q,6,3k], W=w*detJ [M,q], detJ [M,q]) lane-packed layout."""
    J = jacobians(coords, conn, table, dtype)
    detJ = det3x3(J)
    Jinv = inv3x3(J, detJ)
    CB = _packed_b_cb(table, etype, rule, dtype)
    hi = jax.lax.Precision.HIGHEST
    B = _xeinsum("mqcj,qcjri->mqri", Jinv, CB, precision=hi)
    W = jnp.asarray(table.weights, dtype=dtype)[None, :] * detJ
    return B, W, detJ


def stiffness_per_ip(coords, conn, etype: str, E: float, nu: float,
                     rule: str = "default", table: Optional[ElementTable] = None,
                     dtype=None):
    """Per-integration-point stiffness [q, M, 3k, 3k] (weights NOT applied
    to detJ-scaled contributions beyond their own point).

    Parity with the reference's ``single=False`` K path
    (solver/element.py:1233-1239: per-ip K_ip * detJ, no weight)."""
    table = table or element_table(etype, rule)
    dtype = dtype or coords.dtype
    D = jnp.asarray(elasticity_matrix(E, nu), dtype=dtype)
    B, _, detJ = _packed_B_and_W(coords, conn, etype, rule, table, dtype)
    hi = jax.lax.Precision.HIGHEST
    DBd = _xeinsum("rs,mqsi,mq->mqri", D, B, detJ, precision=hi)
    K = _xeinsum("mqri,mqrj->qmij", DBd, B, precision=hi)
    return K


def stiffness_bmat(coords, conn, etype: str, D, rule: str = "default",
                   table: Optional[ElementTable] = None, dtype=None):
    """Element stiffness K[M, 3k, 3k] = sum_q w detJ B^T D B (any D[6,6]).

    B is built directly in the lane-packed [M, q, 6, 3k] layout by one
    constant-tensor contraction (see _packed_b_coeffs) and contracted on
    the MXU at Precision.HIGHEST — replacing the 5D [M,k,3,k,3]
    outer-product pipeline whose 3-minor tensors paid 42x lane padding on
    every transpose/reshape pass (measured 47 -> ~7 ms per 83k-element
    c3d10 assembly)."""
    table = table or element_table(etype, rule)
    dtype = dtype or coords.dtype
    B, W, _ = _packed_B_and_W(coords, conn, etype, rule, table, dtype)
    D = jnp.asarray(D, dtype=dtype)
    hi = jax.lax.Precision.HIGHEST
    DBW = _xeinsum("rs,mqsi,mq->mqri", D, B, W, precision=hi)
    M, q, _, d = B.shape
    K = _xeinsum("mxi,mxj->mij", DBW.reshape(M, 6 * q, d),
                   B.reshape(M, 6 * q, d), precision=hi)
    return K


# ---------------------------------------------------------------------------
# Mass
# ---------------------------------------------------------------------------

def mass(coords, conn, etype: str, rho: float, rule: str = "mass",
         table: Optional[ElementTable] = None, dtype=None):
    """Consistent element mass M[M, 3k, 3k].

    The reference never shipped its mass kernels (compute_c3d4_M_matrix is
    called in solver_example.ipynb cell 13 but exists nowhere; SURVEY.md 2.7)
    — this supplies the missing capability for the modal solver.
    """
    table = table or element_table(etype, rule)
    dtype = dtype or coords.dtype
    J = jacobians(coords, conn, table, dtype)
    detJ = det3x3(J)
    w = jnp.asarray(table.weights, dtype=dtype)
    N = jnp.asarray(table.N, dtype=dtype)                          # [q,k]
    W = w[None, :] * detJ                                          # [M,q]
    C = rho * _xeinsum("mq,qi,qj->mij", W, N, N)                 # [M,k,k]
    # C kron I3 without the lane-padded [M,k,3,k,3] broadcast: repeat in the
    # packed [M,3k,3k] layout and mask the delta_ab pattern
    k = table.n_nodes
    Cr = jnp.repeat(jnp.repeat(C, 3, axis=1), 3, axis=2)           # [M,3k,3k]
    eye_mask = jnp.asarray(np.tile(np.eye(3, dtype=np.float64), (k, k)),
                           dtype=dtype)
    return Cr * eye_mask


def lumped_mass(coords, conn, etype: str, rho: float, rule: str = "mass",
                table: Optional[ElementTable] = None, dtype=None):
    """HRZ-lumped diagonal mass [M, 3k] (row-sum can go negative for c3d10).

    Diagonal of the consistent mass scaled per element so the total equals
    rho * V — positive for all supported types.
    """
    table = table or element_table(etype, rule)
    dtype = dtype or coords.dtype
    J = jacobians(coords, conn, table, dtype)
    detJ = det3x3(J)
    w = jnp.asarray(table.weights, dtype=dtype)
    N = jnp.asarray(table.N, dtype=dtype)
    W = w[None, :] * detJ                                          # [M,q]
    diagC = rho * _xeinsum("mq,qi,qi->mi", W, N, N)              # [M,k]
    vol_mass = rho * _xeinsum("q,mq->m", w, detJ)                # [M]
    scale = vol_mass / jnp.sum(diagC, axis=1)
    d = diagC * scale[:, None]                                     # [M,k]
    return jnp.repeat(d, 3, axis=1)                                # [M,3k]


# ---------------------------------------------------------------------------
# Stress recovery
# ---------------------------------------------------------------------------

def element_stress(coords, conn, displacement, etype: str, E: float, nu: float,
                   rule: str = "default", table: Optional[ElementTable] = None,
                   single: bool = True, dtype=None) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Stress tensors + von Mises per element.

    single=True  -> quadrature-weighted average, ([M,3,3], [M])
    single=False -> per integration point, ([M,q,3,3], [M,q])

    Mirrors reference compute_*_element_stress (solver/element.py:905, 1127,
    1696, 2076, 2570) except the single=True average is normalized by the
    weight sum (the reference multiplies by unnormalized quadrature weights,
    scaling c3d8 results by 8x — SURVEY.md 2.7).
    """
    table = table or element_table(etype, rule)
    dtype = dtype or coords.dtype
    g, _ = shape_gradients(coords, conn, table, dtype)             # [M,q,k,3]
    ue = displacement[conn].astype(dtype)                          # [M,k,3]
    # grad_u[m,q,a,b] = d u_b / d x_a
    H = _xeinsum("mqka,mkb->mqab", g, ue)
    exx, eyy, ezz = H[..., 0, 0], H[..., 1, 1], H[..., 2, 2]
    gxy = H[..., 0, 1] + H[..., 1, 0]
    gyz = H[..., 1, 2] + H[..., 2, 1]
    gzx = H[..., 2, 0] + H[..., 0, 2]
    eps = jnp.stack([exx, eyy, ezz, gxy, gyz, gzx], axis=-1)       # [M,q,6]
    D = jnp.asarray(elasticity_matrix(E, nu), dtype=dtype)
    sig = _xeinsum("rs,mqs->mqr", D, eps)                        # [M,q,6]
    tens = stress_tensor(sig)                                      # [M,q,3,3]
    vm = von_mises(tens)                                           # [M,q]
    if not single:
        return tens, vm
    w = jnp.asarray(table.weights, dtype=dtype)
    wsum = jnp.sum(w)
    tens_avg = _xeinsum("q,mqab->mab", w, tens) / wsum
    vm_avg = _xeinsum("q,mq->m", w, vm) / wsum
    return tens_avg, vm_avg


# ---------------------------------------------------------------------------
# Derived nodal quantities
# ---------------------------------------------------------------------------

def node_vm_stress(n_nodes: int, conn, element_vm, dtype=None):
    """Scatter-mean element von Mises to nodes (deterministic segment_sum).

    Mirrors reference compute_node_vm_stress (solver/element.py:466-504)
    minus the nondeterministic index_add ordering.
    """
    dtype = dtype or element_vm.dtype
    k = conn.shape[1]
    idx = conn.reshape(-1)
    vals = jnp.repeat(element_vm.astype(dtype), k)
    ssum = jax.ops.segment_sum(vals, idx, num_segments=n_nodes)
    cnt = jax.ops.segment_sum(jnp.ones_like(vals), idx, num_segments=n_nodes)
    return jnp.where(cnt > 0, ssum / jnp.maximum(cnt, 1), 0.0)
