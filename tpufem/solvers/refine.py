"""Mixed-precision iterative refinement: f64-verified converged solves.

Measured at 5.14M elements (PERFORMANCE.md round-5): f32 Jacobi/block
PCG converges to ~2e-3 relative residual — the kappa * eps_f32 storage
envelope — and then BREAKS DOWN (the recursive residual diverges once
the recurrence is noise-dominated).  A 1e-6 converged solve in f32
storage is therefore impossible in a single Krylov run; the classical
fix is iterative refinement:

    u_64 = 0
    repeat:  r_64 = P(b - A_64 u_64)         # f64 TRUE residual
             solve A_32 d ~= r / ||r||       # f32 packed PCG, tol ~5e-3
             u_64 += ||r|| * d
until ||r_64|| <= tol * ||b||.  Each cycle contracts the true residual
by roughly the inner tolerance, so ~3 cycles reach 1e-6 — and the
reported residual is an f64 TRUE residual through an independent
(non-Pallas) operator, a stronger claim than any recursive f32 history.

The f64 matvec is a PLANAR partial-assembly apply written here: TPU f64
is software-emulated with a [8 x bf16]-component representation whose
(3, 3)-minor tiles pad 57x — one [M, q, 3, 3] einsum temporary at 1M
elements asked for 32.7 GB.  The planar form keeps every intermediate a
flat [Mc] vector (zero padding), loops the tiny (q, a, b, k) dims in
Python, and scatter-adds per (node, component) stream.  Requires x64;
the f32 packed kernels stay 32-bit via the enable_x64(False) contexts
in ops/packed_kernels.py.

Reference being surpassed: the reference runs all-f64 on GPU
(solver/solver.py:11) and could not run >1M elements at all; this
reaches f64-quality residuals with f32 speed and memory.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class RefineInfo(NamedTuple):
    converged: bool
    cycles: int
    inner_iterations: int
    residual_norm: float          # f64 true residual, absolute
    rel_residual: float
    outer_history: np.ndarray     # f64 true ||r|| per cycle


class _PlanarF64Op:
    """Chunked planar f64 matvec u[N,3] -> F[N,3] (geometry-factor)."""

    def __init__(self, coords, conn, etype: str, E: float, nu: float,
                 chunk_elems: int = 1_000_000, geometry_dtype=jnp.float32,
                 cache_path=None):
        from ..core.materials import lame_parameters
        from ..elements.tables import element_table

        table = element_table(etype, "default")
        self.dN = tuple(tuple(tuple(float(x) for x in row)
                              for row in plane)
                        for plane in np.asarray(table.dN))
        self.w = tuple(float(x) for x in np.asarray(table.weights))
        lam, mu = lame_parameters(E, nu)
        self.lam, self.mu = float(lam), float(mu)
        conn = np.asarray(conn)
        coords64 = np.asarray(coords, np.float64)
        self.N = coords64.shape[0]
        M, k = conn.shape
        self.k = k
        q = len(self.w)
        # per-chunk planar geometry: Jinv [qJ][3][3] and W [q] flat [Mc]
        # vectors, computed on host in f64 numpy (exact, no device temps)
        # and shipped once.  cache_path: optional .npz caching the planar
        # host arrays (the einsum+adjugate pass costs minutes at 10M
        # elements under page-fault weather).
        import os
        cached = None
        if cache_path and os.path.exists(cache_path):
            try:
                cached = np.load(cache_path)
                if int(cached["chunk_elems"]) != chunk_elems:
                    cached = None
            except Exception:
                cached = None
        self.chunks = []
        save_blobs = {"chunk_elems": np.asarray(chunk_elems)}
        for ci, c0 in enumerate(range(0, M, chunk_elems)):
            cc = conn[c0:c0 + chunk_elems]
            Mc = cc.shape[0]
            if cached is not None:
                self.chunks.append((cc.astype(np.int32),
                                    np.asarray(cached[f"J{ci}"]),
                                    np.asarray(cached[f"W{ci}"])))
                continue
            Xk = coords64[cc]                       # [Mc, k, 3] host
            dNa = np.asarray(table.dN, np.float64)  # [q, k, 3]
            J = np.einsum("qka,mkb->mqab", dNa, Xk)
            # explicit adjugate inverse: np.linalg.inv/det on [Mc*q]
            # stacked 3x3s cost minutes at 5M elements (LAPACK per-batch
            # overhead); the cofactor form is ~30 vector ops
            c00 = J[..., 1, 1] * J[..., 2, 2] - J[..., 1, 2] * J[..., 2, 1]
            c01 = J[..., 0, 2] * J[..., 2, 1] - J[..., 0, 1] * J[..., 2, 2]
            c02 = J[..., 0, 1] * J[..., 1, 2] - J[..., 0, 2] * J[..., 1, 1]
            c10 = J[..., 1, 2] * J[..., 2, 0] - J[..., 1, 0] * J[..., 2, 2]
            c11 = J[..., 0, 0] * J[..., 2, 2] - J[..., 0, 2] * J[..., 2, 0]
            c12 = J[..., 0, 2] * J[..., 1, 0] - J[..., 0, 0] * J[..., 1, 2]
            c20 = J[..., 1, 0] * J[..., 2, 1] - J[..., 1, 1] * J[..., 2, 0]
            c21 = J[..., 0, 1] * J[..., 2, 0] - J[..., 0, 0] * J[..., 2, 1]
            c22 = J[..., 0, 0] * J[..., 1, 1] - J[..., 0, 1] * J[..., 1, 0]
            det = (J[..., 0, 0] * c00 + J[..., 0, 1] * c10
                   + J[..., 0, 2] * c20)
            inv_det = 1.0 / det
            Jinv = (np.stack([np.stack([c00, c01, c02], -1),
                              np.stack([c10, c11, c12], -1),
                              np.stack([c20, c21, c22], -1)], -2)
                    * inv_det[..., None, None])     # [Mc, q, 3, 3]
            W = np.asarray(self.w)[None, :] * det   # [Mc, q]
            # HBM frugality (a 5.14M f64 run OOM'd with full-q f64
            # geometry resident): store Jinv for ONE quadrature point on
            # affine meshes (J constant for straight-edged tets), and
            # ship the planar geometry in f32 — the apply upcasts to f64
            # per use, so the ARITHMETIC stays f64 and the operator is
            # simply defined with f32-rounded geometry (a <= 1-ulp mesh
            # perturbation, matching the f32 packed operator's own
            # geometry precision).
            spreadJ = (np.abs(Jinv - Jinv[:, :1]).max()
                       / max(np.abs(Jinv).max(), 1e-300))
            qJ = 1 if spreadJ < 1e-12 else q
            gnp = np.dtype(jnp.dtype(geometry_dtype).name)
            Jp = np.ascontiguousarray(
                Jinv[:, :qJ].transpose(1, 2, 3, 0)).astype(gnp)
            Wp = np.ascontiguousarray(W.T).astype(gnp)
            if cache_path:
                save_blobs[f"J{ci}"] = Jp
                save_blobs[f"W{ci}"] = Wp
            self.chunks.append((cc.astype(np.int32), Jp, Wp))
        if cache_path and cached is None:
            try:
                np.savez(cache_path, **save_blobs)
            except Exception:
                pass

        ndof = self.N * 3
        dN, wq, lam, mu = self.dN, self.w, self.lam, self.mu

        @jax.jit
        def chunk_force(u64, conn_c, Jinv, W):
            qn, kn = len(dN), len(dN[0])
            uf = u64.reshape(-1)
            ue = [[uf[conn_c[:, kk] * 3 + b] for b in range(3)]
                  for kk in range(kn)]
            Fe = [[0.0] * 3 for _ in range(kn)]
            for qi in range(qn):
                Jq = Jinv[min(qi, len(Jinv) - 1)]     # affine: one slice
                Ji = [[Jq[i][j].astype(u64.dtype) for j in range(3)]
                      for i in range(3)]
                # Hhat[a][b] = sum_k dN[qi,k,a] ue[k][b]
                Hh = [[None] * 3 for _ in range(3)]
                for a in range(3):
                    for b in range(3):
                        s = None
                        for kk in range(kn):
                            c = dN[qi][kk][a]
                            if c == 0.0:
                                continue
                            t = c * ue[kk][b]
                            s = t if s is None else s + t
                        Hh[a][b] = s if s is not None else 0.0
                # H[i][b] = sum_j Jinv[i][j] Hhat[j][b]
                H = [[sum(Ji[i][j] * Hh[j][b] for j in range(3))
                      for b in range(3)] for i in range(3)]
                # sig = 2 mu eps + lam tr(eps) I, eps = (H + H^T)/2
                tr = H[0][0] + H[1][1] + H[2][2]
                sig = [[mu * (H[i][b] + H[b][i])
                        + (lam * tr if i == b else 0.0)
                        for b in range(3)] for i in range(3)]
                # T[j][b] = W sum_i Jinv[i][j] sig[i][b]
                Wq = W[qi].astype(u64.dtype)
                T = [[Wq * sum(Ji[i][j] * sig[i][b] for i in range(3))
                      for b in range(3)] for j in range(3)]
                for kk in range(kn):
                    for b in range(3):
                        s = Fe[kk][b]
                        for j in range(3):
                            c = dN[qi][kk][j]
                            if c == 0.0:
                                continue
                            s = s + c * T[j][b]
                        Fe[kk][b] = s
            F = jnp.zeros((ndof,), u64.dtype)
            for kk in range(kn):
                base = conn_c[:, kk] * 3
                for b in range(3):
                    F = F.at[base + b].add(Fe[kk][b])
            return F

        self._chunk_force = chunk_force

    def __call__(self, u64f):
        """Flat [N*3] f64 field -> flat [N*3] f64 forces.

        Chunks live on HOST and stream to the device per apply (~17 s of
        upload per outer residual at 10M elements) — keeping them
        resident pushed the 10.11M refinement past the 16 GB HBM budget
        on top of the plan + inner-solver state."""
        F = None
        for cc, Jp, Wp in self.chunks:
            conn_c = jnp.asarray(cc)
            Jinv = tuple(tuple(tuple(jnp.asarray(Jp[qi, i, j])
                                     for j in range(3)) for i in range(3))
                         for qi in range(Jp.shape[0]))
            W = tuple(jnp.asarray(Wp[qi]) for qi in range(Wp.shape[0]))
            Fc = self._chunk_force(u64f, conn_c, Jinv, W)
            F = Fc if F is None else F + Fc
        return F


class RefinedSystem:
    """PackedSystem (f32 inner solves) + planar-f64 true-residual loop.

    EVERY wide-dtype field here is FLAT [N*3]: a [N, 3] f64-emulated
    array pads its 3-lane minor dim to 128 — 14 GB for ONE field at 7M
    nodes (the first 5.14M attempt OOM'd on exactly this).  The inner
    solves exchange PACKED [Nb, 384] f32 tiles directly
    (PackedPlan.pack_flat / solve_chunked_packed)."""

    def __init__(self, system, coords, conn, etype: str, E: float,
                 nu: float, chunk_elems: int = 1_000_000,
                 geometry_dtype=jnp.float32, cache_path=None):
        if not jax.config.jax_enable_x64:
            raise RuntimeError(
                "RefinedSystem needs x64 enabled for the f64 outer loop "
                "(jax.config.update('jax_enable_x64', True) before "
                "building any operators)")
        self.system = system
        self.op64 = _PlanarF64Op(coords, conn, etype, E, nu,
                                 chunk_elems, geometry_dtype,
                                 cache_path=cache_path)
        plan = system.op.plan
        self.plan = plan
        # HBM frugality at 10M+: mask as BOOL [ndof] (41 MB, not a 654 MB
        # f64-emulated field), b kept f32 (its values are exact in f32)
        self._mask = plan.unpack_flat(system.pc.mask,
                                      jnp.float32) > 0
        self._norm = jax.jit(jnp.linalg.norm)

        @jax.jit
        def finish(F, b32, mask):
            r = jnp.where(mask, b32.astype(F.dtype) - F, 0.0)
            rn = jnp.linalg.norm(r)
            # pack the NORMALIZED f32 correction RHS in the same program
            # (the f64 residual never persists outside it)
            bX = plan.pack_flat(r / rn, jnp.float32)
            return rn, bX

        self._finish = finish

    def _resid(self, u64f, b32f):
        F = self.op64(u64f)
        rn, bX = self._finish(F, b32f, self._mask)
        return rn, bX

    def solve(self, b, tol_rel: float = 1e-6, inner_tol: float = 5e-3,
              inner_max_iter: int = 1500, every: int = 500,
              max_cycles: int = 10, progress=None):
        """b [N, 3] or flat [N*3] -> (u flat [N*3] f64, RefineInfo)."""
        plan = self.plan
        b32f = jnp.where(self._mask,
                         jnp.asarray(np.asarray(b).reshape(-1),
                                     jnp.float32), 0.0)
        bn = float(self._norm(b32f.astype(jnp.float64)))
        u64f = jnp.zeros((b32f.shape[0],), jnp.float64)
        hist = []
        inner_total = 0
        cycles = 0
        for cycle in range(max_cycles):
            rn_j, bX = self._resid(u64f, b32f)
            rn = float(rn_j)
            hist.append(rn)
            if progress is not None:
                progress(cycle, inner_total, rn / bn)
            if rn <= tol_rel * bn or rn == 0.0:
                break
            cycles = cycle + 1
            # normalized correction solve in the PACKED layout: RHS
            # r/||r|| has unit norm, so the inner (absolute) tolerance is
            # the same python float in every cycle — one compiled inner
            # program serves the whole refinement.  No f64 residual field
            # stays live across the inner solve.
            dX, info = self.system.solve_chunked_packed(
                bX, tol=inner_tol, max_iter=inner_max_iter, every=every)
            inner_total += int(info.iterations)
            u64f = u64f + rn * plan.unpack_flat(dX, jnp.float64)
        else:
            rn_j, _ = self._resid(u64f, b32f)
            rn = float(rn_j)
            hist.append(rn)
        rn = hist[-1]
        return u64f, RefineInfo(bool(rn <= tol_rel * bn), cycles,
                                inner_total, rn, rn / bn,
                                np.asarray(hist))
