"""Hybrid direct+iterative subdomain solver (Schur-complement substructuring).

Completes the reference's unfinished design (subdivision.ipynb cells 6-15 +
the never-written outer iteration — SURVEY.md 2.6): the mesh is partitioned
by region growing, each subdomain's interior block is factorized DENSELY on
chip, and an outer CG iterates on the interface unknowns only:

    K = [[K_II, K_IG], [K_GI, K_GG]]           (I = interiors, G = interface)
    S  = K_GG - sum_p K_GI,p K_II,p^-1 K_IG,p  (applied matrix-free)
    S u_G = f_G - sum_p K_GI,p K_II,p^-1 f_I,p
    u_I,p = K_II,p^-1 (f_I,p - K_IG,p u_G)

TPU mapping: subdomain interior factors are one padded batched Cholesky
[P, nI, nI] (vmap of cho_factor -> MXU triangular solves); every Schur
matvec is batched dense GEMMs + one deterministic segment-sum scatter onto
the interface vector.  The reference's dense inverse per subdomain
(subdivision.ipynb cell 12, torch.linalg.inv) becomes a Cholesky solve.

Fixed-node (homogeneous) constraints are imposed by symmetric zeroing of the
element matrices plus a unit diagonal, preserving SPD.
"""
from __future__ import annotations

import dataclasses
from typing import List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.assembly import assemble_dense
from .cg import CONVERGED, MAX_ITER, RUNNING, SolveInfo
from ..core.xmath import einsum as _xeinsum


@jax.tree_util.register_static
@dataclasses.dataclass(frozen=True)
class _HMeta:
    n_parts: int
    n_nodes: int
    n_interface: int
    nI_max: int
    nG_max: int


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class HybridSystem:
    chol: jnp.ndarray        # [P, 3*nI, 3*nI] lower Cholesky of K_II (padded I)
    K_IG: jnp.ndarray        # [P, 3*nI, 3*nG]
    K_GG: jnp.ndarray        # [P, 3*nG, 3*nG] per-part interface contribution
    gmap: jnp.ndarray        # [P, nG] global interface node id (pad -> 0)
    gmask: jnp.ndarray       # [P, nG] 1/0 validity
    imap: jnp.ndarray        # [P, nI] global node id of interiors (pad -> 0)
    imask: jnp.ndarray       # [P, nI]
    g_nodes: jnp.ndarray     # [nGlob] global node ids of interface nodes
    scat_perm: jnp.ndarray   # scatter plan for P*nG*3 -> interface dofs
    scat_seg: jnp.ndarray
    Minv_G: jnp.ndarray      # [nGlob, 3] Jacobi on assembled K_GG diagonal
    meta: _HMeta
    # Neumann-Neumann / BDD interface preconditioner (round 4; None ->
    # scalar Jacobi).  Sinv holds the explicit inverses of the per-part
    # Schur complements S_p = K_GG,p - K_GI,p K_II,p^-1 K_IG,p
    # (regularized; rigid modes of floating parts), Dw the
    # inverse-multiplicity partition-of-unity weights, gfree the free-dof
    # mask, and (Zloc, Echol) the per-part rigid-body coarse space with
    # the factorized coarse operator E = Z^T S Z — the piece that keeps
    # interface-CG iterations bounded as the part count grows.
    Sinv: Optional[jnp.ndarray] = None     # [P, 3nG, 3nG] (S_p + reg)^-1
    # explicit interior inverse (build_hybrid(interior_inverse=True)):
    # replaces every triangular solve against chol by one batched GEMV —
    # XLA's transpose_a solve kept a relayouted copy of the whole factor
    # live (1.4 GB at 1M/512), and the reference itself used explicit
    # subdomain inverses (subdivision.ipynb cell 12, torch.linalg.inv)
    Kinv: Optional[jnp.ndarray] = None     # [P, 3nI, 3nI] K_II^-1
    S: Optional[jnp.ndarray] = None        # [P, 3nG, 3nG] true S_p
    # matrix-free assembled-interface action (build_hybrid(
    # matrix_free_gg=True)): sum_p K_GG,p R_p v is exactly the GLOBAL
    # matrix-free operator applied to an interface-supported vector, so
    # the [P, 3nG, 3nG] dense blocks (5.4 GB padded at 1M elements / 512
    # parts) need not exist — the flagship geometry-factor operator
    # carries the interface matvec.
    mf_op: Optional[object] = None         # ops.partial operator [N,3]->[N,3]
    mf_free: Optional[jnp.ndarray] = None  # [N, 3] 1.0 free / 0.0 fixed
    Dw: Optional[jnp.ndarray] = None       # [P, 3nG]
    gfree: Optional[jnp.ndarray] = None    # [nGlob, 3]
    Zloc: Optional[jnp.ndarray] = None     # [P, 3nG, 6]
    Echol: Optional[jnp.ndarray] = None    # [6P, 6P]

    # -- core ops --------------------------------------------------------
    @staticmethod
    def _chol_solve(L, b):
        """Batched K^-1 b from the lower Cholesky factor.

        Two explicit triangular solves instead of scipy's cho_solve: the
        transpose is expressed via transpose_a (XLA solves against the
        SAME buffer), where cho_solve materialized a transposed copy of
        L — at 1M elements / 128 parts that meant three live 7 GB copies
        of the factor and an HBM OOM."""
        b3 = b[..., None] if b.ndim == L.ndim - 1 else b
        y = jax.lax.linalg.triangular_solve(L, b3, left_side=True,
                                            lower=True)
        x = jax.lax.linalg.triangular_solve(L, y, left_side=True,
                                            lower=True, transpose_a=True)
        return x[..., 0] if b.ndim == L.ndim - 1 else x

    def _interior_solve(self, b):
        """K_II^-1 b per part: GEMV against Kinv when stored, else the
        Cholesky triangular-solve pair."""
        if self.Kinv is not None:
            if b.ndim == 2:
                return _xeinsum("pij,pj->pi", self.Kinv, b)
            return _xeinsum("pij,pjc->pic", self.Kinv, b)
        return self._chol_solve(self.chol, b)

    def _gather_iface(self, vG):
        """vG [nGlob, 3] -> per-part local [P, 3*nG]."""
        g = vG[self.gmap] * self.gmask[..., None]
        return g.reshape(g.shape[0], -1)

    def _scatter_iface(self, sP):
        """[P, 3*nG] -> deterministic sum into [nGlob, 3]."""
        flat = sP.reshape(-1)[self.scat_perm]
        out = jax.ops.segment_sum(flat, self.scat_seg,
                                  num_segments=self.meta.n_interface * 3,
                                  indices_are_sorted=True)
        return out.reshape(-1, 3)

    def schur_matvec(self, vG):
        if self.mf_op is not None:
            # assembled-interface action via the global matrix-free
            # operator (masked rows/cols + unit diagonal on fixed dofs —
            # identical to the symmetric-zeroed assembled K)
            N = self.meta.n_nodes
            v_full = jnp.zeros((N, 3), vG.dtype).at[self.g_nodes].set(vG)
            vf = v_full * self.mf_free
            Av = (self.mf_op(vf) * self.mf_free)[self.g_nodes]
            Av = Av + (1.0 - self.mf_free[self.g_nodes]) * vG
            vp = self._gather_iface(vG)
            t1 = _xeinsum("pig,pg->pi", self.K_IG, vp)
            t2 = self._interior_solve(t1)
            t3 = _xeinsum("pig,pi->pg", self.K_IG, t2)
            return Av - self._scatter_iface(t3)
        if self.S is not None:
            # explicit per-part Schur blocks: one batched dense GEMV per
            # iteration instead of two interior triangular solves
            vp = self._gather_iface(vG)
            return self._scatter_iface(_xeinsum("pgh,ph->pg", self.S, vp))
        vp = self._gather_iface(vG)                                # [P, 3nG]
        t1 = _xeinsum("pig,pg->pi", self.K_IG, vp)               # K_IG v
        t2 = self._interior_solve(t1)                          # K_II^-1
        t3 = _xeinsum("pig,pi->pg", self.K_IG, t2)               # K_GI ..
        sp = _xeinsum("pgh,ph->pg", self.K_GG, vp) - t3
        return self._scatter_iface(sp)

    def _nn_apply(self, r):
        """Weighted per-part Schur inverse: sum_p D S_p^-1 D.

        Applied as one batched GEMV against the stored explicit inverse:
        a cho_solve here put two triangular solves in EVERY interface-CG
        iteration and XLA materialized a transposed copy of the [P, 3nG,
        3nG] factor (5 GB at 1M elements / 512 parts).  The blocks are
        regularized SPD preconditioner blocks — the explicit inverse is
        numerically fine here (the reference used torch.linalg.inv for
        its subdomain blocks outright, subdivision.ipynb cell 12)."""
        rp = self._gather_iface(r)
        y = _xeinsum("pgh,ph->pg", self.Sinv, rp * self.Dw)
        return self._scatter_iface(y * self.Dw) * self.gfree

    def _coarse_solve(self, r):
        """lam = E^-1 Z^T r (coarse rigid-body coefficients [P, 6])."""
        c = _xeinsum("pgc,pg->pc", self.Zloc, self._gather_iface(r))
        lam = self._chol_solve(self.Echol, c.reshape(-1))
        return lam.reshape(self.meta.n_parts, -1)

    def _Z_apply(self, lam):
        return self._scatter_iface(
            _xeinsum("pgc,pc->pg", self.Zloc, lam)) * self.gfree

    def apply_M(self, r):
        """Interface preconditioner: Jacobi, NN, or balanced BDD.

        BDD uses the PROJECTED (balanced) form (Mandel): the coarse
        rigid-body solve removes the components on which floating-part
        Schur inverses blow up, the weighted local inverses act only on
        the S-orthogonal complement — the additive form measured 3.8x
        WORSE than Jacobi on floating parts; the balanced form is what
        bounds iterations."""
        if self.Sinv is None:
            return r * self.Minv_G
        if self.Echol is None:
            return self._nn_apply(r)
        lam = self._coarse_solve(r)
        r1 = r - self.schur_matvec(self._Z_apply(lam))
        z1 = self._nn_apply(r1)
        mu = self._coarse_solve(self.schur_matvec(z1))
        return z1 - self._Z_apply(mu) + self._Z_apply(lam)

    def solve(self, f, tol: float = 1e-10, max_iter: int = 500,
              eps: float = 1e-30) -> Tuple[jnp.ndarray, SolveInfo]:
        """Solve K u = f (f [N, 3], constrained dofs already masked)."""
        m = self.meta
        fI = f[self.imap] * self.imask[..., None]                  # [P,nI,3]
        fIp = fI.reshape(m.n_parts, -1)
        fG = f[self.g_nodes]                                       # [nGlob,3]
        y = self._interior_solve(fIp)
        g = fG - self._scatter_iface(
            _xeinsum("pig,pi->pg", self.K_IG, y))

        # PCG on the interface (apply_M: Jacobi, or Neumann-Neumann with
        # the rigid-body coarse correction; tol stays on the TRUE ||r||)
        def A(v):
            return self.schur_matvec(v)

        u0 = jnp.zeros_like(g)
        r0 = g
        z0 = self.apply_M(r0)
        p0 = z0
        rz0 = jnp.vdot(r0, z0)
        rs0 = jnp.vdot(r0, r0)
        hist0 = jnp.full((max_iter + 1,), jnp.inf, g.dtype)
        hist0 = hist0.at[0].set(jnp.sqrt(rs0))
        st0 = jnp.where(jnp.sqrt(rs0) < tol, CONVERGED, RUNNING).astype(jnp.int32)

        def cond(s):
            return (s[0] < max_iter) & (s[5] == RUNNING)

        def body(s):
            i, u, r, p, rz, st, hist = s
            Ap = A(p)
            alpha = rz / (jnp.vdot(p, Ap) + eps)
            u1 = u + alpha * p
            r1 = r - alpha * Ap
            z1 = self.apply_M(r1)
            rz1 = jnp.vdot(r1, z1)
            rn = jnp.sqrt(jnp.vdot(r1, r1))
            p1 = z1 + (rz1 / (rz + eps)) * p
            st1 = jnp.where(rn < tol, CONVERGED, RUNNING).astype(jnp.int32)
            hist = hist.at[i + 1].set(rn)
            return (i + 1, u1, r1, p1, rz1, st1, hist)

        i, uG, r, p, rz, st, hist = jax.lax.while_loop(
            cond, body, (jnp.int32(0), u0, r0, p0, rz0, st0, hist0))
        st = jnp.where(st == RUNNING, MAX_ITER, st)

        # interior back-substitution
        u = self._backsub(fIp, f, uG)
        info = SolveInfo(st, i, jnp.sqrt(jnp.vdot(r, r).real), hist)
        return u, info

    # -- chunked interface CG (north-star-scale safety) -----------------
    def _condense(self, f):
        """f [N, 3] -> (fIp [P, 3nI], interface RHS g [nGlob, 3])."""
        fI = f[self.imap] * self.imask[..., None]
        fIp = fI.reshape(self.meta.n_parts, -1)
        y = self._interior_solve(fIp)
        g = f[self.g_nodes] - self._scatter_iface(
            _xeinsum("pig,pi->pg", self.K_IG, y))
        return fIp, g

    def _backsub(self, fIp, f, uG):
        vp = self._gather_iface(uG)
        rhs = fIp - _xeinsum("pig,pg->pi", self.K_IG, vp)
        uI = self._interior_solve(rhs).reshape(self.meta.n_parts, -1, 3)
        u = jnp.zeros_like(f)
        u = u.at[self.imap].add(uI * self.imask[..., None])
        return u.at[self.g_nodes].set(uG)

    def solve_chunked(self, f, tol: float = 1e-10, max_iter: int = 20000,
                      every: int = 400, progress=None):
        """Interface PCG as a sequence of `every`-iteration device
        programs with EXACT recurrence continuation (solvers.cg
        resume_state) — identical trajectory to solve()'s single
        while_loop, but no XLA execution runs longer than `every`
        iterations.  Required at config-4 scale: a 2500-iteration
        single execution at 1M elements / 512 parts crashed the TPU
        worker watchdog (same failure mode as the monolithic
        north-star solve, PERFORMANCE.md round 5)."""
        from .cg import MAX_ITER, RUNNING, SolveInfo, cg

        fIp, g = _h_condense(self, f)
        uG = jnp.zeros_like(g)
        pG = jnp.zeros_like(g)            # rz <= 0 -> fresh start
        rz = jnp.asarray(-1.0, g.dtype)
        tolj = jnp.asarray(tol, g.dtype)
        hists, done, info = [], 0, None
        while done < max_iter:
            it = min(every, max_iter - done)
            uG, info, (pG, rz) = _h_chunk(self, g, uG, pG, rz, tolj, it)
            ni = int(info.iterations)     # host sync once per chunk
            h = np.asarray(info.history)[:ni + 1]
            hists.append(h if not hists else h[1:])
            done += ni
            if progress is not None:
                progress(done, float(h[-1]) if h.size else float("nan"))
            if int(info.status) != MAX_ITER or ni == 0:
                break
        status = jnp.where(jnp.equal(info.status, RUNNING), MAX_ITER,
                           info.status)
        u = _h_backsub(self, fIp, f, uG)
        out = SolveInfo(status, jnp.asarray(done), info.residual_norm,
                        np.concatenate(hists) if hists else
                        np.asarray(info.history))
        return u, out


def build_hybrid(coords, conn, etype: str, E: float, nu: float,
                 n_parts: int, fixed_nodes=None, labels=None,
                 seed: int = 0, dtype=None, precondition: str = "jacobi",
                 reg: float = 1e-6, slim: bool = False,
                 interior_inverse: bool = False,
                 matrix_free_gg: bool = False) -> HybridSystem:
    """Host+device setup: partition, per-part dense blocks, Cholesky.

    precondition: "jacobi" (assembled-K_GG diagonal — reference-grade),
    "nn" (Neumann-Neumann: inverse-multiplicity-weighted per-part Schur
    inverses), or "bdd" (nn + per-part rigid-body coarse space, the
    correction that keeps interface-CG iterations bounded in the part
    count).  reg scales the relative regularization of floating-part
    Schur complements.

    slim=True (nn/bdd only): once the explicit per-part Schur blocks S
    are built, K_GG is released (a [P, 1, 1] placeholder) — the solve's
    matvec runs off S and never touches K_GG.  At 1M elements / 128
    parts K_GG is several GB of the HBM budget.

    f32 accuracy of interior_inverse (ADVICE r4): the explicit-K_II^-1
    GEMVs replace backward-stable triangular solves in the solution
    path; measured at a refined-mesh fixture the f32 forward error vs an
    f64 direct solve is ~1.6e-5 relative with true residual at the CG
    tolerance (tests/test_hybrid.py::test_hybrid_interior_inverse_f32_
    accuracy) — well inside the kappa*eps_f32 storage envelope."""
    from ..elements.solid import stiffness
    from .constraints import Constraints  # noqa: F401 (schema reference)
    from ..parallel.partition import partition_elements

    if precondition == "jacobi" and slim and not matrix_free_gg:
        raise ValueError(
            "slim with precondition='jacobi' requires matrix_free_gg=True: "
            "the Jacobi-path Schur matvec reads the dense K_GG blocks "
            "unless the matrix-free interface action replaces them")

    conn_np = np.asarray(conn)
    coords_np = np.asarray(jax.device_get(coords))
    N = coords_np.shape[0]
    # element stiffness on the CPU backend: the build consumes it in numpy,
    # and pulling the TPU-tiled [M, 12, 12] buffer back through the tunnel
    # costs minutes (measured 285 s for 105k elements)
    with jax.default_device(jax.devices("cpu")[0]):
        coords_j = (jnp.asarray(coords_np) if dtype is None
                    else jnp.asarray(coords_np, dtype))
        K_np = np.asarray(stiffness(coords_j, jnp.asarray(conn_np),
                                    etype, E, nu))
    fdtype = K_np.dtype

    # symmetric elimination of fixed dofs (homogeneous): zero rows/cols
    fixed_nodes = (np.asarray(fixed_nodes).reshape(-1)
                   if fixed_nodes is not None else np.zeros(0, np.int64))
    fixed_mask_node = np.zeros(N, bool)
    fixed_mask_node[fixed_nodes] = True
    k = conn_np.shape[1]
    elem_free = ~fixed_mask_node[conn_np]                     # [M, k]
    P_mask = np.repeat(elem_free, 3, axis=1).astype(fdtype)   # [M, 3k]
    K_np = K_np * P_mask[:, :, None] * P_mask[:, None, :]

    if labels is None:
        labels, _ = partition_elements(conn_np, etype, n_parts, seed)
    labels = np.asarray(labels)

    # node -> set of parts
    node_parts: List[set] = [set() for _ in range(N)]
    for p in range(n_parts):
        for node in np.unique(conn_np[labels == p]):
            node_parts[node].add(p)
    n_parts_per_node = np.array([len(s) for s in node_parts])
    is_iface = (n_parts_per_node > 1) | fixed_mask_node
    # fixed nodes are forced onto the interface so their unit-diagonal
    # equations live in exactly one place (K_GG) and interiors stay SPD.
    g_nodes = np.nonzero(is_iface)[0]
    g_index = -np.ones(N, np.int64)
    g_index[g_nodes] = np.arange(g_nodes.size)

    part_interiors, part_ifaces, dense_parts = [], [], []
    for p in range(n_parts):
        sel = np.nonzero(labels == p)[0]
        local_nodes = np.unique(conn_np[sel])
        ints = local_nodes[~is_iface[local_nodes]]
        gifs = local_nodes[is_iface[local_nodes]]
        part_interiors.append(ints)
        part_ifaces.append(gifs)
    nI_max = max(x.size for x in part_interiors)
    nG_max = max(x.size for x in part_ifaces)

    P_ = n_parts
    chol = np.zeros((P_, 3 * nI_max, 3 * nI_max), fdtype)
    K_IG = np.zeros((P_, 3 * nI_max, 3 * nG_max), fdtype)
    K_GG = np.zeros((P_, 3 * nG_max, 3 * nG_max), fdtype)
    gmap = np.zeros((P_, nG_max), np.int64)
    gmask = np.zeros((P_, nG_max), fdtype)
    imap = np.zeros((P_, nI_max), np.int64)
    imask = np.zeros((P_, nI_max), fdtype)

    import scipy.sparse as _sp
    for p in range(P_):
        sel = np.nonzero(labels == p)[0]
        ints, gifs = part_interiors[p], part_ifaces[p]
        local = np.concatenate([ints, gifs])
        l_index = -np.ones(N, np.int64)
        l_index[local] = np.arange(local.size)
        lconn = l_index[conn_np[sel]]
        # host-side sparse assembly (vectorized COO; the former per-element
        # Python loop was O(M) interpreter time — config-4 scale blocker),
        # densified only for the blocks the factorization needs
        nI, nG = ints.size, gifs.size
        n3 = local.size * 3
        ldofs = (lconn[:, :, None] * 3 + np.arange(3)).reshape(sel.size, -1)
        dd = ldofs.shape[1]
        rows = np.repeat(ldofs, dd, axis=1).ravel()
        cols = np.tile(ldofs, (1, dd)).ravel()
        Ksp = _sp.coo_matrix((K_np[sel].ravel(), (rows, cols)),
                             shape=(n3, n3)).tocsr()
        A_II = Ksp[: 3 * nI, : 3 * nI].toarray()
        # fixed interior-free dofs already zeroed; give padding + any zero
        # diagonal a 1 so Cholesky succeeds
        d = np.diag(A_II).copy()
        zero_d = d == 0
        A_pad = np.eye(3 * nI_max, dtype=fdtype)
        A_pad[:3 * nI, :3 * nI] = A_II + np.diag(zero_d.astype(fdtype))
        chol[p] = np.linalg.cholesky(A_pad)
        K_IG[p, :3 * nI, :3 * nG] = Ksp[: 3 * nI, 3 * nI:].toarray()
        K_GG[p, :3 * nG, :3 * nG] = Ksp[3 * nI:, 3 * nI:].toarray()
        gmap[p, :nG] = g_nodes.searchsorted(gifs)
        gmask[p, :nG] = 1.0
        imap[p, :nI] = ints
        imask[p, :nI] = 1.0

    # unit diagonal for fixed dofs (exactly once: on the owning part with
    # the lowest id) and for interface dofs of empty padding handled by
    # adding identity on fixed rows globally:
    fixed_g = g_index[fixed_nodes]
    seen = set()
    for p in range(P_):
        for j, gn in enumerate(part_ifaces[p]):
            if fixed_mask_node[gn] and gn not in seen:
                seen.add(gn)
                base = 3 * j
                K_GG[p][base:base + 3, base:base + 3] += np.eye(3, dtype=fdtype)
    # interface nodes appearing in NO part (isolated fixed) are impossible.

    # scatter plan: (p, local g, comp) -> global interface dof
    targets = (gmap[:, :, None] * 3 + np.arange(3)[None, None, :]).reshape(-1)
    # mask padding onto dof 0 with zero value (gmask zeroes the data)
    perm = np.argsort(targets, kind="stable").astype(np.int32)
    seg = targets[perm].astype(np.int32)

    # interface Jacobi preconditioner: assembled K_GG diagonal
    diag_G = np.zeros((g_nodes.size, 3), fdtype)
    dflat = np.einsum("pii->pi", K_GG.reshape(
        P_, 3 * nG_max, 3 * nG_max))                       # [P, 3nG]
    np.add.at(diag_G.reshape(-1),
              (gmap[:, :, None] * 3 + np.arange(3)).reshape(-1),
              (dflat.reshape(P_, nG_max, 3) * gmask[:, :, None]).reshape(-1))
    Minv_G = np.where(np.abs(diag_G) > 0,
                      1.0 / np.where(diag_G == 0, 1.0, diag_G), 0.0)

    meta = _HMeta(P_, N, g_nodes.size, nI_max, nG_max)
    sys_ = HybridSystem(
        chol=jnp.asarray(chol), K_IG=jnp.asarray(K_IG),
        K_GG=(jnp.zeros((n_parts, 1, 1), fdtype) if slim
              else jnp.asarray(K_GG)),
        gmap=jnp.asarray(gmap), gmask=jnp.asarray(gmask),
        imap=jnp.asarray(imap), imask=jnp.asarray(imask),
        g_nodes=jnp.asarray(g_nodes),
        scat_perm=jnp.asarray(perm), scat_seg=jnp.asarray(seg),
        Minv_G=jnp.asarray(Minv_G), meta=meta)
    if precondition == "jacobi":
        # The memory-slim flags are honored here too (ADVICE r4 asked for
        # the guard OR the honoring; 1M-element config 4 on one 16 GB chip
        # NEEDS jacobi + slim + interior_inverse + matrix_free_gg: the
        # NN/BDD preconditioner's explicit S_p^-1 blocks alone are 5.4 GB
        # at 512 parts — PERFORMANCE.md "config-4 hybrid at 1M").
        if interior_inverse:
            @jax.jit
            def _inv_chol_j(Lc):
                eye = jnp.eye(Lc.shape[-1], dtype=Lc.dtype)[None]
                return HybridSystem._chol_solve(
                    Lc, jnp.broadcast_to(eye, Lc.shape))

            chi_b = 2 * (3 * nI_max) ** 2 * np.dtype(fdtype).itemsize
            CHI = max(1, min(P_, int((1536 << 20) // max(chi_b, 1))))
            kiv = [_inv_chol_j(sys_.chol[p0:min(p0 + CHI, P_)])
                   for p0 in range(0, P_, CHI)]
            sys_ = dataclasses.replace(
                sys_, chol=jnp.zeros((P_, 1, 1), fdtype),
                Kinv=jnp.concatenate(kiv, axis=0))
        if matrix_free_gg:
            from ..ops.partial import PartialAssemblyOperator
            sys_ = dataclasses.replace(
                sys_,
                mf_op=PartialAssemblyOperator.build(
                    jnp.asarray(coords_np, fdtype), conn_np, etype, E, nu,
                    dtype=fdtype, n_nodes=N),
                mf_free=jnp.asarray(
                    np.repeat(~fixed_mask_node, 3).reshape(N, 3)
                    .astype(fdtype)))
        return sys_

    # ---- Neumann-Neumann (+ coarse) interface preconditioner ----------
    # partition-of-unity weights: 1/multiplicity per interface dof,
    # fixed dofs excluded (their residual is identically zero and the
    # regularized non-owner Schur rows must not leak into free dofs)
    mult = np.zeros(g_nodes.size, fdtype)
    for p in range(P_):
        mult[gmap[p, :part_ifaces[p].size]] += 1.0
    free_g = (~fixed_mask_node[g_nodes]).astype(fdtype)
    w_g = np.where(mult > 0, 1.0 / np.maximum(mult, 1.0), 0.0) * free_g
    Dw = (w_g[gmap] * gmask)                               # [P, nG]
    Dw = np.repeat(Dw, 3, axis=1).reshape(P_, nG_max, 3).reshape(P_, -1)
    gfree = np.repeat(free_g, 3).reshape(-1, 3)
    gmaskdof = np.repeat(gmask, 3, axis=1).reshape(P_, nG_max, 3
                                                   ).reshape(P_, -1)

    if True:
        # per-part rigid-body modes on the interface (free dofs only),
        # QR-orthonormalized; dead columns (fully fixed parts) dropped.
        # Needed by BOTH nn and bdd: the local Schur complements of
        # floating parts are singular exactly on these modes, and a plain
        # eps*I regularization makes their inverses explode there
        # (measured: lambda_max(MS) ~ 3e5).  S_p + sigma Z_p Z_p^T keeps
        # the inverse ~1/sigma on the null space — a proper lumped
        # deflation (FETI-style Q regularization).
        Zloc = np.zeros((P_, 3 * nG_max, 6), fdtype)
        for p in range(P_):
            gifs = part_ifaces[p]
            nG = gifs.size
            if nG == 0:
                continue
            X = coords_np[gifs]
            c = X.mean(axis=0)
            d = X - c
            span = max(float(np.abs(d).max()), 1e-30)
            Zp = np.zeros((nG, 3, 6), fdtype)
            Zp[:, 0, 0] = Zp[:, 1, 1] = Zp[:, 2, 2] = 1.0
            Zp[:, 1, 3] = -d[:, 2] / span
            Zp[:, 2, 3] = d[:, 1] / span
            Zp[:, 0, 4] = d[:, 2] / span
            Zp[:, 2, 4] = -d[:, 0] / span
            Zp[:, 0, 5] = -d[:, 1] / span
            Zp[:, 1, 5] = d[:, 0] / span
            Zp *= free_g[gmap[p, :nG]][:, None, None]
            Zf = Zp.reshape(3 * nG, 6)
            Q, R = np.linalg.qr(Zf)
            keep = np.abs(np.diag(R)) > 1e-8 * max(
                float(np.abs(np.diag(R)).max()), 1e-30)
            Q = Q * keep[None, :]
            Zloc[p, :3 * nG] = Q
        Zloc_j = jnp.asarray(Zloc)
        # global coarse basis [nGdof, 6P]: column block p = part p's
        # scattered local modes (disjoint column support by construction)
        Zfull_np = np.zeros((g_nodes.size * 3, 6 * P_), fdtype)
        for p in range(P_):
            nG = part_ifaces[p].size
            if nG == 0:
                continue
            dofs = (gmap[p, :nG, None] * 3 + np.arange(3)).reshape(-1)
            Zfull_np[dofs, 6 * p:6 * p + 6] = Zloc[p, :3 * nG]

    @jax.jit
    def _nn_factors(chol_j, K_IG_j, K_GG_j, gmd, Zl):
        t = HybridSystem._chol_solve(chol_j, K_IG_j)  # K_II^-1 K_IG
        S_true = K_GG_j - _xeinsum("pig,pih->pgh", K_IG_j, t)
        diag = _xeinsum("pgg->pg", S_true)
        scale = ((diag * gmd).sum(1)
                 / jnp.maximum(gmd.sum(1), 1.0))          # [P]
        add = reg * scale[:, None] * gmd + (1.0 - gmd)    # pad -> identity
        S_reg = (S_true + jax.vmap(jnp.diag)(add)
                 + scale[:, None, None]
                 * _xeinsum("pgc,phc->pgh", Zl, Zl))      # rigid deflation
        return S_true, jnp.linalg.inv(S_reg)

    # chunk the factor build over parts: the t = K_II^-1 K_IG temporary is
    # as large as K_IG itself and the factor body keeps ~8 chunk-sized
    # [CH, 3nG, 3nG] temps live — at 1M elements a P//8 chunk was still
    # 9 x 0.9 GB and OOM'd.  Size chunks so those temps stay ~<= 1.5 GB.
    # Under slim, K_GG never lands on the device whole: the per-chunk
    # slices come from the HOST copy (the solve path never reads it).
    gmd_j = jnp.asarray(gmaskdof)
    ch_bytes = 8 * (3 * nG_max) ** 2 * np.dtype(fdtype).itemsize
    CH = max(1, min(P_, int((1536 << 20) // max(ch_bytes, 1))))
    S_parts, Sch_parts, Kinv_parts = [], [], []
    keep_S = not matrix_free_gg        # mf path never reads the blocks

    @jax.jit
    def _invert_chol(Lc):
        eye = jnp.eye(Lc.shape[-1], dtype=Lc.dtype)[None]
        return HybridSystem._chol_solve(
            Lc, jnp.broadcast_to(eye, Lc.shape))

    # coarse-E accumulation happens INSIDE the factor loop so S chunks
    # can die immediately under matrix_free_gg: E = Zfull^T S Zfull with
    # S = sum_p R_p^T S_p R_p, i.e. E += Y_p^T S_p Y_p per chunk (the
    # one-shot form materialized [P, 3nG, 6P] + [nGdof, 6P] — GBs)
    bdd = precondition == "bdd"
    if bdd:
        ncols = Zfull_np.shape[1]
        Zf3 = Zfull_np.reshape(meta.n_interface, 3, ncols)
        CE = max(1, min(CH, int(
            (512 << 20)
            // max(3 * nG_max * ncols * np.dtype(fdtype).itemsize, 1))))
        Ec = jnp.zeros((ncols, ncols), fdtype)

        @jax.jit
        def _e_chunk(Sc, Yc):
            return _xeinsum("pgc,pgh,phd->cd", Yc, Sc, Yc)

    for p0 in range(0, P_, CH):
        p1 = min(p0 + CH, P_)
        sl = slice(p0, p1)
        kgg_c = jnp.asarray(K_GG[sl]) if slim else sys_.K_GG[sl]
        Sp, Schp = _nn_factors(sys_.chol[sl], sys_.K_IG[sl], kgg_c,
                               gmd_j[sl], Zloc_j[sl])
        if bdd:
            for e0 in range(p0, p1, CE):
                e1 = min(e0 + CE, p1)
                Yc = (Zf3[gmap[e0:e1]].reshape(e1 - e0, 3 * nG_max, ncols)
                      * gmaskdof[e0:e1, :, None])
                Ec = Ec + _e_chunk(Sp[e0 - p0:e1 - p0], jnp.asarray(Yc))
        if keep_S:
            S_parts.append(Sp)
        Sch_parts.append(Schp)
        if interior_inverse:
            Kinv_parts.append(_invert_chol(sys_.chol[sl]))
    S_j = jnp.concatenate(S_parts, axis=0) if keep_S else None
    Sinv_j = jnp.concatenate(Sch_parts, axis=0)
    Kinv_j = None
    if interior_inverse:
        Kinv_j = jnp.concatenate(Kinv_parts, axis=0)
        # the solve path never touches chol once Kinv exists
        sys_ = dataclasses.replace(
            sys_, chol=jnp.zeros((P_, 1, 1), fdtype), Kinv=Kinv_j)
    Echol_j = None
    if bdd:
        @jax.jit
        def _e_factor(Ec):
            de = jnp.diag(Ec)
            scale_e = de.sum() / jnp.maximum((de > 0).sum(), 1)
            Ec = Ec + jnp.diag(jnp.where(de <= 1e-12 * scale_e,
                                         scale_e, 1e-10 * scale_e))
            return jnp.linalg.cholesky(Ec)

        Echol_j = _e_factor(Ec)

    mf_op = mf_free = None
    if matrix_free_gg:
        # the interface matvec runs through the global geometry-factor
        # operator; the dense Schur blocks are only TRANSIENT inputs of
        # the Sinv / coarse-E build above
        from ..ops.partial import PartialAssemblyOperator
        mf_op = PartialAssemblyOperator.build(
            jnp.asarray(coords_np, fdtype), conn_np, etype, E, nu,
            dtype=fdtype, n_nodes=N)
        mf_free = jnp.asarray(
            np.repeat(~fixed_mask_node, 3).reshape(N, 3).astype(fdtype))
    return dataclasses.replace(
        sys_, Sinv=Sinv_j, S=S_j,
        Dw=jnp.asarray(Dw), gfree=jnp.asarray(gfree), Zloc=Zloc_j,
        Echol=Echol_j, mf_op=mf_op, mf_free=mf_free)
    # (Kinv, when requested, was already swapped in above)


# module-level jitted helpers for HybridSystem.solve_chunked (the system
# is a registered pytree dataclass, so jit caches by structure and the
# big blocks are arguments, never baked-in constants)
@jax.jit
def _h_condense(sy, f):
    return sy._condense(f)


@jax.jit
def _h_backsub(sy, fIp, f, uG):
    return sy._backsub(fIp, f, uG)


from functools import partial as _partial  # noqa: E402


@_partial(jax.jit, static_argnames=("every",))
def _h_chunk(sy, g, uG, pG, rz, tol, every):
    from .cg import cg
    return cg(sy.schur_matvec, g, M_inv=sy.apply_M, x0=uG, tol=tol,
              max_iter=every, resume_state=(pG, rz), return_state=True)


def hybrid_solve(coords, conn, etype, E, nu, f, n_parts, fixed_nodes=None,
                 tol=1e-10, max_iter=500, **kw):
    """One-call hybrid solve; f [N, 3] with zeros on fixed nodes."""
    sys_ = build_hybrid(coords, conn, etype, E, nu, n_parts,
                        fixed_nodes=fixed_nodes, **kw)
    f = jnp.asarray(f, sys_.chol.dtype)
    if fixed_nodes is not None:
        f = f.at[jnp.asarray(np.asarray(fixed_nodes))].set(0.0)
    # the system is a jit ARGUMENT — closing over it bakes the dense
    # factors into the HLO as constants (overflows remote-compile requests)
    return jax.jit(lambda sy, ff: sy.solve(ff, tol=tol, max_iter=max_iter))(
        sys_, f)
