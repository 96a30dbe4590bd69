"""Probe: element-compute (pa) stage layout variants on the real chip.

The +pa stage of the packed SpMV (transpose-in + planar compute) is the
largest stage at 83k elements (0.26 of 0.68 ms) at ~650 GFLOP/s — ~3x
below the VPU madd rate.  This probe times, on identical data:

  A. current: [Bc,3,Rp] -> transpose -> planar [3,k,Bc,E_c] compute
  B. no-transpose: slice planes directly from [Bc,3,k,E_c]
  C. flat: planar [3,k,Bc*E_c] (one huge minor dim)
  D. pa only (planar inputs prebuilt) — isolates the transposes
  E. MXU HIGHEST einsum for the Hhat/Fe contractions, VPU middle

Usage: python scripts/probe_pa.py [N]
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def slope(make, *args, lo=5, hi=45):
    f_lo, f_hi = make(lo), make(hi)
    float(f_lo(*args))
    float(f_hi(*args))
    ts = {}
    for key, f in (("lo", f_lo), ("hi", f_hi)):
        best = []
        for _ in range(5):
            t0 = time.perf_counter()
            float(f(*args))
            best.append(time.perf_counter() - t0)
        ts[key] = float(min(best))
    if ts["hi"] < 1.25 * ts["lo"]:
        print("  (weak signal)", ts)
    return max((ts["hi"] - ts["lo"]) / (hi - lo), 1e-9)


def main():
    import jax
    import jax.numpy as jnp

    from tpufem.core import xmath
    from tpufem.ops.packed import PackedPartialOperator, pa_apply_planar
    from tpufem.utils import meshgen

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 24
    coords, conn = meshgen.box_tet10(n, n, n)
    N = coords.shape[0]
    M = conn.shape[0]
    op = PackedPartialOperator.build(
        jnp.asarray(coords, jnp.float32), conn, "c3d10", 200e9, 0.3,
        n_nodes=N)
    m = op.plan.meta
    B, E_c, k = m.n_clusters, m.elems_per_cluster, m.nodes_per_elem
    Rp = m.lanes
    lam, mu = op.lam_mu
    dN = np.asarray(op.dN.array)
    q = dN.shape[0]
    qJ = op.Jinv.shape[0]
    rng = np.random.default_rng(0)
    ue_l = jnp.asarray(rng.standard_normal((B, 3, Rp)).astype(np.float32))
    madds = M * (q * (9 * k + 27 + 12 + 36) + 3 * k * 3 * q)

    def report(name, t):
        print(f"{name:34s} {t * 1e3:8.3f} ms  "
              f"{madds / t / 1e9:7.1f} Gmadd/s", flush=True)

    def loop(body0):
        def mk(iters):
            @jax.jit
            def f(opx, u):
                def body(i, a):
                    return a + body0(opx, u * (1.0 + 1e-9 * a)) * 1e-9
                return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))
            return f
        return mk

    # --- A: current path (transpose -> planar) --------------------------
    def a_body(opx, ue):
        ue3 = opx._lanes_to_planar(ue, k, E_c)
        fe3 = pa_apply_planar(ue3, opx.Jinv, opx.W, dN, lam, mu)
        return jnp.sum(opx._planar_to_lanes(fe3, Rp))

    report("A transpose+planar+transpose", slope(loop(a_body), op, ue_l))

    # --- D: planar compute only (no transposes) ------------------------
    ue3_pre = jnp.asarray(
        rng.standard_normal((3, k, B, E_c)).astype(np.float32))

    def d_body(opx, u3):
        return jnp.sum(pa_apply_planar(u3, opx.Jinv, opx.W, dN, lam, mu))

    report("D planar compute only", slope(loop(d_body), op, ue3_pre))

    # --- B: slice planes from [Bc,3,k,E_c] (B-major, no transpose) ------
    Jb = jnp.transpose(op.Jinv, (2, 0, 1, 3))   # [B, qJ, 9, E_c]
    Wb = jnp.transpose(op.W, (1, 0, 2))         # [B, q, E_c]

    def b_body(opx, ue):
        u4 = ue[:, :, : k * E_c].reshape(B, 3, k, E_c)
        ue3 = [[u4[:, c, kk] for kk in range(k)] for c in range(3)]
        Fe = [[None] * k for _ in range(3)]
        for qi in range(q):
            Ji = [[Jb[:, min(qi, qJ - 1), 3 * i + j] for j in range(3)]
                  for i in range(3)]
            Hh = [[None] * 3 for _ in range(3)]
            for a in range(3):
                for c in range(3):
                    acc = None
                    for kk in range(k):
                        w = float(dN[qi, kk, a])
                        if w == 0.0:
                            continue
                        t = w * ue3[c][kk]
                        acc = t if acc is None else acc + t
                    Hh[a][c] = acc if acc is not None else 0.0
            H = [[sum(Ji[i][j] * Hh[j][c] for j in range(3))
                  for c in range(3)] for i in range(3)]
            tr = H[0][0] + H[1][1] + H[2][2]
            sig = [[mu * (H[i][c] + H[c][i]) for c in range(3)]
                   for i in range(3)]
            for i in range(3):
                sig[i][i] = sig[i][i] + lam * tr
            Wq = Wb[:, qi]
            T = [[Wq * sum(Ji[i][j] * sig[i][c] for i in range(3))
                  for c in range(3)] for j in range(3)]
            for c in range(3):
                for kk in range(k):
                    acc = None
                    for j in range(3):
                        w = float(dN[qi, kk, j])
                        if w == 0.0:
                            continue
                        t = w * T[j][c]
                        acc = t if acc is None else acc + t
                    if acc is None:
                        continue
                    p = Fe[c][kk]
                    Fe[c][kk] = acc if p is None else p + acc
        out = jnp.stack([jnp.stack([Fe[c][kk] for kk in range(k)], 1)
                         for c in range(3)], 1)       # [B, 3, k, E_c]
        return jnp.sum(out)

    report("B B-major slices (no transpose)", slope(loop(b_body), op, ue_l))

    # --- C: flat [3,k,B*E_c] -------------------------------------------
    Jf = op.Jinv.reshape(qJ, 9, B * E_c)
    Wf = op.W.reshape(q, B * E_c)

    def c_body(opx, ue):
        u4 = ue[:, :, : k * E_c].reshape(B, 3, k, E_c)
        ue3 = jnp.transpose(u4, (1, 2, 0, 3)).reshape(3, k, B * E_c)
        fe3 = pa_apply_planar(ue3, Jf, Wf, dN, lam, mu)
        fe = jnp.transpose(fe3.reshape(3, k, B, E_c), (2, 0, 1, 3))
        return jnp.sum(fe)

    report("C flat minor dim", slope(loop(c_body), op, ue_l))

    # --- E: MXU (HIGHEST) for Hhat / Fe stages --------------------------
    # Hhat[q,a,c,m] = dN[q,k,a] . ue3[c,k,m];  Fe[c,kk,m] = dN[q,kk,j] T...
    dNj = jnp.asarray(dN, jnp.float32)

    def e_body(opx, ue):
        u4 = ue[:, :, : k * E_c].reshape(B, 3, k, E_c)
        ue3 = jnp.transpose(u4, (1, 2, 0, 3)).reshape(3, k, B * E_c)
        Hh = xmath.einsum("qka,ckm->qacm", dNj, ue3)      # MXU
        Ts = []
        for qi in range(q):
            Ji = [[Jf[min(qi, qJ - 1), 3 * i + j] for j in range(3)]
                  for i in range(3)]
            H = [[sum(Ji[i][j] * Hh[qi, j, c] for j in range(3))
                  for c in range(3)] for i in range(3)]
            tr = H[0][0] + H[1][1] + H[2][2]
            sig = [[mu * (H[i][c] + H[c][i]) for c in range(3)]
                   for i in range(3)]
            for i in range(3):
                sig[i][i] = sig[i][i] + lam * tr
            Wq = Wf[qi]
            Ts.append(jnp.stack([jnp.stack(
                [Wq * sum(Ji[i][j] * sig[i][c] for i in range(3))
                 for c in range(3)], 0) for j in range(3)], 0))  # [3,3,m]
        T_all = jnp.stack(Ts, 0)                          # [q,3,3,m]
        return jnp.sum(xmath.einsum("qkj,qjcm->ckm", dNj, T_all))  # MXU

    report("E MXU Hhat + VPU middle", slope(loop(e_body), op, ue_l))


if __name__ == "__main__":
    main()
