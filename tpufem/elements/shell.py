"""Kirchhoff shell elements s3/s4: frames, stiffness, stress, operator.

Every shell element carries a local orthonormal frame (node0 origin,
node0->node1 = x_hat, Gram-Schmidt y_hat, z_hat = x x y — reference
solver/shell.py:169-172, 297-321, 599-623).  DOF layout per node is
[u, v, w, theta_x, theta_y, theta_z] in GLOBAL coordinates; the operator
rotates to the local frame, applies the local 6k x 6k stiffness, and
rotates forces back (solver/shell.py:58-102).

The B-matrix row structure replicates the reference exactly
(solver/shell.py:404-438, 748-800):

    membrane rows 0-2:  e_xx = N,x u;  e_yy = N,y v;  g_xy = N,y u + N,x v
    bending  rows 3-5:  k_xx = -N,x th_y; k_yy = N,y th_x;
                        k_xy =  N,y th_x + N,x th_y
    (drilling th_z carries no stiffness — classical Kirchhoff)

One deliberate deviation: the reference's stress-recovery B for s4 sums the
weighted Gauss-point B's with weights summing to 4 (solver/shell.py:814-821),
scaling recovered stress 4x; here the average is normalized (SURVEY.md 2.7).
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.materials import kirchhoff_D_matrix
from ..ops.scatter import ScatterPlan
from .tables import ElementTable, element_table
from ..core.xmath import einsum as _xeinsum


# ---------------------------------------------------------------------------
# Local frames and coordinates
# ---------------------------------------------------------------------------

def local_frames(coords, conn, dtype=None):
    """unit[M, 3, 3]: rows are the local x/y/z axes in global coordinates.

    Parity: compute_s3_local_unitvector / compute_s4_local_unitvector
    (solver/shell.py:297-321, 599-623) — for s4, axes come from nodes 0,1,3.
    """
    dtype = dtype or coords.dtype
    c = coords.astype(dtype)
    k = conn.shape[1]
    a = c[conn[:, 1]] - c[conn[:, 0]]
    b_ref = c[conn[:, 3 if k == 4 else 2]] - c[conn[:, 0]]
    b = b_ref - (jnp.sum(a * b_ref, axis=1, keepdims=True)
                 / jnp.sum(a * a, axis=1, keepdims=True)) * a
    a = a / jnp.linalg.norm(a, axis=1, keepdims=True)
    b = b / jnp.linalg.norm(b, axis=1, keepdims=True)
    cxz = jnp.cross(a, b)
    return jnp.stack([a, b, cxz], axis=1)


def local_coordinates(coords, conn, unit, dtype=None):
    """In-frame nodal coordinates [M, k, 3] (node0 at the origin).

    Parity: compute_s3/s4_global_to_local_coordinates
    (solver/shell.py:323-347, 625-649)."""
    dtype = dtype or coords.dtype
    g = coords.astype(dtype)[conn]                       # [M,k,3]
    v = g - g[:, 0:1, :]
    return _xeinsum("mna,mda->mnd", v, unit.astype(dtype))


def shell_normals(coords, conn, dtype=None):
    """Area-scaled facet normal [M, 3] (tri: cross/2; quad: cross of edges).

    Parity: compute_s3_normal / compute_s4_normal (solver/shell.py:184-203,
    483-502)."""
    dtype = dtype or coords.dtype
    c = coords.astype(dtype)
    k = conn.shape[1]
    a = c[conn[:, 1]] - c[conn[:, 0]]
    b = c[conn[:, 3 if k == 4 else 2]] - c[conn[:, 0]]
    n = jnp.cross(a, b)
    return 0.5 * n if k == 3 else n


# ---------------------------------------------------------------------------
# In-plane geometry + B
# ---------------------------------------------------------------------------

def _inplane_gradients(xy, table: ElementTable, dtype):
    """(dN_xy [M,q,k,2], detJ [M,q]) from local in-plane coords xy[M,k,2]."""
    dN = jnp.asarray(table.dN, dtype=dtype)              # [q,k,2]
    J = _xeinsum("qka,mkb->mqab", dN, xy)              # [M,q,2,2]
    detJ = J[..., 0, 0] * J[..., 1, 1] - J[..., 0, 1] * J[..., 1, 0]
    inv00 = J[..., 1, 1] / detJ
    inv01 = -J[..., 0, 1] / detJ
    inv10 = -J[..., 1, 0] / detJ
    inv11 = J[..., 0, 0] / detJ
    Jinv = jnp.stack([jnp.stack([inv00, inv01], axis=-1),
                      jnp.stack([inv10, inv11], axis=-1)], axis=-2)
    g = _xeinsum("mqij,qkj->mqki", Jinv, dN)
    return g, detJ


def shell_b_matrix(g):
    """B[M, q, 6, k, 6] from in-plane gradients g[M, q, k, 2]."""
    gx, gy = g[..., 0], g[..., 1]                        # [M,q,k]
    z = jnp.zeros_like(gx)
    # columns: (u, v, w, thx, thy, thz)
    rows = [
        jnp.stack([gx, z, z, z, z, z], axis=-1),
        jnp.stack([z, gy, z, z, z, z], axis=-1),
        jnp.stack([gy, gx, z, z, z, z], axis=-1),
        jnp.stack([z, z, z, z, -gx, z], axis=-1),
        jnp.stack([z, z, z, gy, z, z], axis=-1),
        jnp.stack([z, z, z, gy, gx, z], axis=-1),
    ]
    return jnp.stack(rows, axis=2)


# ---------------------------------------------------------------------------
# Stiffness / stress
# ---------------------------------------------------------------------------

def _resolve(coords, conn, etype, table, dtype):
    etype = etype or ("s3" if conn.shape[1] == 3 else "s4")
    table = table or element_table(etype)
    dtype = dtype or coords.dtype
    return etype, table, dtype


def shell_stiffness(coords, conn, membrane, bending, etype: Optional[str] = None,
                    table: Optional[ElementTable] = None, dtype=None,
                    unit=None):
    """Local-frame shell stiffness K[M, 6k, 6k].

    Parity: compute_s3_K_matrix / compute_s4_K_matrix
    (solver/shell.py:440-453, 825-861)."""
    etype, table, dtype = _resolve(coords, conn, etype, table, dtype)
    if unit is None:
        unit = local_frames(coords, conn, dtype)
    xy = local_coordinates(coords, conn, unit, dtype)[..., :2]
    g, detJ = _inplane_gradients(xy, table, dtype)
    B = shell_b_matrix(g)                                 # [M,q,6,k,6]
    D = jnp.asarray(kirchhoff_D_matrix(membrane, bending), dtype=dtype)
    W = jnp.asarray(table.weights, dtype=dtype)[None, :] * detJ
    K = _xeinsum("mq,mqria,rs,mqsjb->miajb", W, B, D, B)
    k = table.n_nodes
    return K.reshape(K.shape[0], 6 * k, 6 * k)


def shell_stress(coords, conn, membrane, bending, displacement,
                 etype: Optional[str] = None, table: Optional[ElementTable] = None,
                 dtype=None, unit=None):
    """NMQ stress resultants [M, 6] = D @ (mean_q B) @ u_local.

    Parity: compute_s3_shell_stress / compute_s4_shell_stress
    (solver/shell.py:455-468, 863-876) with a normalized B average."""
    etype, table, dtype = _resolve(coords, conn, etype, table, dtype)
    if unit is None:
        unit = local_frames(coords, conn, dtype)
    xy = local_coordinates(coords, conn, unit, dtype)[..., :2]
    g, _ = _inplane_gradients(xy, table, dtype)
    B = shell_b_matrix(g)
    w = jnp.asarray(table.weights, dtype=dtype)
    Bavg = _xeinsum("q,mqria->mria", w, B) / jnp.sum(w)
    u_loc = global_to_local_displacement(conn, displacement, unit, dtype)  # [M,k,6]
    strain = _xeinsum("mria,mia->mr", Bavg, u_loc)
    D = jnp.asarray(kirchhoff_D_matrix(membrane, bending), dtype=dtype)
    return _xeinsum("rs,ms->mr", D, strain)


# ---------------------------------------------------------------------------
# Frame rotation + matrix-free operator
# ---------------------------------------------------------------------------

def global_to_local_displacement(conn, displacement, unit, dtype=None):
    """[N,6] global displacement -> per-element local [M, k, 6].

    Parity: compute_global_to_local_displacement (solver/shell.py:41-56)."""
    dtype = dtype or displacement.dtype
    ge = displacement.astype(dtype)[conn]                # [M,k,6]
    u = unit.astype(dtype)
    t = _xeinsum("mkj,mdj->mkd", ge[..., :3], u)
    r = _xeinsum("mkj,mdj->mkd", ge[..., 3:], u)
    return jnp.concatenate([t, r], axis=-1)


def shell_nodal_forces(K, plan_or_conn, displacement, unit,
                       n_nodes: Optional[int] = None):
    """F[N,6] = scatter(unit^T @ (K_local @ (unit @ u_e))).

    Parity: compute_shell_nodal_forces (solver/shell.py:58-102), with the
    deterministic scatter plan."""
    if isinstance(plan_or_conn, ScatterPlan):
        plan = plan_or_conn
        conn = None
    else:
        n = int(displacement.shape[0]) if n_nodes is None else n_nodes
        plan = ScatterPlan.build(jax.device_get(plan_or_conn), n, 6)
    M, d, _ = K.shape
    k = d // 6
    # local displacement via rotation (row gather on [N,6] directly)
    u2d = displacement.reshape(-1, 6)
    u_loc = global_to_local_displacement(plan.conn, u2d, unit,
                                         displacement.dtype)  # [M,k,6]
    F_loc = _xeinsum("mij,mj->mi", K, u_loc.reshape(M, d)).reshape(M, k, 6)
    uT = jnp.swapaxes(unit, 1, 2).astype(displacement.dtype)
    Ft = _xeinsum("mab,mkb->mka", uT, F_loc[..., :3])
    Fr = _xeinsum("mab,mkb->mka", uT, F_loc[..., 3:])
    Fe = jnp.concatenate([Ft, Fr], axis=-1)              # [M,k,6]
    return plan.scatter(Fe.reshape(M, d)).reshape(u2d.shape)


import dataclasses


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ShellOperator:
    """u[N,6] -> F[N,6] matrix-free shell operator (frame-rotating)."""

    K: jnp.ndarray       # [M, 6k, 6k] local stiffness
    unit: jnp.ndarray    # [M, 3, 3] frames
    plan: ScatterPlan    # 6-dof plan

    def __call__(self, u):
        return shell_nodal_forces(self.K, self.plan, u, self.unit)

    def diagonal(self):
        """Assembled GLOBAL-frame diagonal [n_dof] (see
        shell_operator_diagonal)."""
        return self.plan.scatter(shell_operator_diagonal(self.K, self.unit))


def shell_postprocess_values(NMQ, t: float, z: float = 0.0, eps: float = 1e-30):
    """Through-thickness stresses + principal values from NMQ resultants.

    Parity: compute_shell_postprocess_values (solver/shell.py:104-162).
    Returns dict with sx, sy, txy, s1, s2, theta_p, tau_max, vm_stress.
    """
    Nxx, Nyy, Nxy = NMQ[:, 0], NMQ[:, 1], NMQ[:, 2]
    Mxx, Myy, Mxy = NMQ[:, 3], NMQ[:, 4], NMQ[:, 5]
    f1 = 1.0 / t
    f2 = 6.0 * z / (t * t)
    sx = Nxx * f1 + Mxx * f2
    sy = Nyy * f1 + Myy * f2
    txy = Nxy * f1 + Mxy * f2
    half = 0.5 * (sx + sy)
    R = jnp.sqrt((0.5 * (sx - sy)) ** 2 + txy**2)
    s1, s2 = half + R, half - R
    theta_p = 0.5 * jnp.arctan2(2.0 * txy, jnp.maximum(sx - sy, eps))
    return {
        "sx": sx, "sy": sy, "txy": txy, "s1": s1, "s2": s2,
        "theta_p": theta_p, "tau_max": 0.5 * (s1 - s2),
        "vm_stress": jnp.sqrt(s1 * s1 - s1 * s2 + s2 * s2 + eps),
    }


def shell_operator_diagonal(K, unit):
    """Global-frame assembled-diagonal contribution [M, 6k] of a shell block."""
    M, d, _ = K.shape
    k = d // 6
    Kl = K.reshape(M, k, 6, k, 6)
    u = unit.astype(K.dtype)
    # per-node 3x3 diagonal blocks for translations and rotations
    Kt = _xeinsum("mibic->mibc", Kl[:, :, :3, :, :3])   # [M,k,3,3]
    Kr = _xeinsum("mibic->mibc", Kl[:, :, 3:, :, 3:])
    dt = _xeinsum("mba,mkbc,mca->mka", u, Kt, u)        # [M,k,3]
    dr = _xeinsum("mba,mkbc,mca->mka", u, Kr, u)
    return jnp.concatenate([dt, dr], axis=-1).reshape(M, d)
