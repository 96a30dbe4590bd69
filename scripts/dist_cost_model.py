"""Distributed communication cost model from partition plans (no devices).

VERDICT r4 item 7: real multi-chip timing is impossible in this
environment (one physical chip), but the COMMUNICATION VOLUME of the
packed halo scheme is a pure function of the partition plan, and the
scaling claim can be stated as a falsifiable model: measured single-chip
apply rate + ICI bandwidth + bytes/iteration from the actual plans.

For the 5.14M-element c3d10 mesh (the north-star config) at P = 2/4/8
parts this computes, per part, exactly the ghost sets PackedHaloFEM
exchanges (parallel/packed_dist.py ghosts_and_remap):
  * ghost X block rows  — [128-node, 384-lane] rows of the input vector
    owned by another device but read by my clusters (win_nodes);
  * ghost Yc cluster rows — slot-sum rows my blocks gather from clusters
    owned by another device (winc);
each 1536 B, exchanged once per apply.  Model:
  t_comp(P) = (M/P) * 900 / rate_nnz        (measured single-chip rate)
  t_comm(P) = bytes/iter / BW_ICI           (one link, one direction —
                                             conservative: v5e 2D torus
                                             has 4 links/chip)
  efficiency(no overlap)  = t_comp / (t_comp + t_comm)
  efficiency(overlapped)  = t_comp / max(t_comp, t_comm)  (the
    interior/boundary split makes the X exchange overlappable —
    HaloPartialFEM / PackedHaloFEM interior_cut)

Usage: python scripts/dist_cost_model.py [n=95] [rate_gnnz=63.2]
Prints a markdown table + one JSON line.
"""
from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROW_BYTES = 128 * 3 * 4          # one packed [384-lane] f32 row
ICI_BW = 45e9                    # v5e one-way per-link ICI (scaling-book
                                 # class number; conservative single link)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 95
    rate = float(sys.argv[2]) * 1e9 if len(sys.argv) > 2 else 63.2e9

    from tpufem.ops.packed import PackedPlan
    from tpufem.utils import meshgen

    cdir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".bench_cache", f"tet10_n{n}")
    if os.path.exists(os.path.join(cdir, "coords.npy")):
        coords = np.load(os.path.join(cdir, "coords.npy"))
        conn = np.load(os.path.join(cdir, "conn.npy"))
    else:
        coords, conn = meshgen.box_tet10(n, n, n)
    M, k = conn.shape
    N = coords.shape[0]
    # window_buckets=0: the single-bucket plan whose cluster/block order is
    # exactly what PackedDistPartition slices into contiguous chunks
    plan = PackedPlan.build(coords, conn, N, window_buckets=0)
    m = plan.meta
    win_nodes = np.asarray(plan.win_nodes)       # [B, Wn] block ids (pad Nb)
    winc = np.asarray(plan.winc)                 # [Nb, Wc] cluster ids (pad B)
    B, Nb = m.n_clusters, m.n_blocks
    nnz = M * (3 * k) ** 2

    rows = []
    for P in (2, 4, 8, 16):
        Bp = -(-B // (P * 8)) * 8
        Nbp = -(-Nb // (P * 8)) * 8
        ghost_x, ghost_c, interior, t_comm_max = [], [], [], 0.0
        for p in range(P):
            cl = slice(p * Bp, min((p + 1) * Bp, B))
            bl = slice(p * Nbp, min((p + 1) * Nbp, Nb))
            wn = win_nodes[cl]
            valid = wn < Nb
            owner = np.where(valid, wn // Nbp, p)
            gx = np.unique(wn[valid & (owner != p)])
            wc = winc[bl]
            validc = wc < B
            ownc = np.where(validc, wc // Bp, p)
            gc = np.unique(wc[validc & (ownc != p)])
            ghost_x.append(gx.size)
            ghost_c.append(gc.size)
            interior.append(int((owner == p).all(axis=1).sum()))
        gx_max, gc_max = max(ghost_x), max(ghost_c)
        own_rows = Nbp
        bytes_iter = (gx_max + gc_max) * ROW_BYTES
        t_comp = (nnz / P) / rate
        t_comm = bytes_iter / ICI_BW
        eff_no = t_comp / (t_comp + t_comm)
        eff_ov = t_comp / max(t_comp, t_comm)
        rows.append({
            "parts": P,
            "owned_block_rows": own_rows,
            "ghost_x_rows_max": gx_max,
            "ghost_yc_rows_max": gc_max,
            "surface_over_volume": (gx_max + gc_max) / own_rows,
            "interior_cluster_frac": min(interior) / Bp,
            "bytes_per_iter": bytes_iter,
            "t_comp_ms": t_comp * 1e3,
            "t_comm_ms": t_comm * 1e3,
            "efficiency_no_overlap": eff_no,
            "efficiency_overlapped": eff_ov,
        })

    print(f"mesh: box_tet10({n}) M={M} N={N} nnz/apply={nnz:.3g}; "
          f"rate={rate / 1e9:.1f} Gnnz/s, ICI={ICI_BW / 1e9:.0f} GB/s/link")
    hdr = ("| parts | ghost X rows | ghost Yc rows | surface/volume | "
           "interior frac | MB/iter | t_comp ms | t_comm ms | "
           "eff (no ovl) | eff (ovl) |")
    print(hdr)
    print("|" + "---|" * 10)
    for r in rows:
        print(f"| {r['parts']} | {r['ghost_x_rows_max']} | "
              f"{r['ghost_yc_rows_max']} | {r['surface_over_volume']:.4f} | "
              f"{r['interior_cluster_frac']:.3f} | "
              f"{r['bytes_per_iter'] / 1e6:.2f} | {r['t_comp_ms']:.2f} | "
              f"{r['t_comm_ms']:.3f} | {r['efficiency_no_overlap']:.3f} | "
              f"{r['efficiency_overlapped']:.3f} |")
    print(json.dumps({"mesh_n": n, "elements": M, "rate_nnz_per_s": rate,
                      "ici_bw": ICI_BW, "rows": rows}))


if __name__ == "__main__":
    main()
