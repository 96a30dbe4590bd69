"""Packed-layout clustered matrix-free operator (the speed-of-light path).

Replaces the measured bottlenecks of the round-1 clustered operator
(PERFORMANCE.md: 3.4 ms of a 5.9 ms SpMV in the cross-cluster combine,
42x lane padding on every [N, 3] pass) with a layout designed for the
TPU tile model end to end:

* ALL hot vectors are `[rows, 384]` f32 tiles — lanes = c * 128 + n % 128
  (three component planes of one 128-node block per row).  Dense: an
  elementwise CG pass moves exactly 12 bytes/node instead of 512.
* Elements are Morton-ordered (spatial locality), grouped into clusters
  of E_c consecutive elements with <= 128 unique nodes; nodes are
  renumbered in first-touch cluster order.  Consequently each cluster
  reads from few node-block rows (window Wn, measured max ~13 on c3d10
  boxes) and each node-block row receives from few clusters (window Wc,
  measured max ~30) — both gather volumes are slab-granular row gathers.
* Expand, the in-cluster compress (per-slot incidence lists, byte-packed
  4 per int32 word) and the cross-cluster combine all run as Pallas
  lane-gather kernels (exact in every dtype, deterministic, no MXU —
  ops.packed_kernels).
* The element compute is the partial-assembly (geometry-factor) action of
  ops.partial (J^-1 and w*detJ only — 10M-element 2nd-order meshes fit on
  one chip), evaluated in a fully dense `[3, k, B, E_c]` planar layout.

Capability parity: the SpMV of reference compute_nodal_forces
(solver/element.py:429-464) — same math as MatrixFreeOperator /
ClusteredPartialOperator (tested to fp tolerance), different schedule.
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .clustered import _StaticTable

L_SLOTS = 128          # slots per cluster (one lane tile)
BLK = 128              # nodes per packed row
ROW = 3 * BLK          # lanes per packed row
# chunked applies unroll up to this many chunks as STATIC slices (XLA can
# then choose layouts per chunk and pipeline them; a fori_loop with
# dynamic slices pins worse layouts — measured 3.5x on the 5M pa stage)
UNROLL_CHUNKS = 16
# Pallas kernel tile (clusters / node blocks per grid step).  8 was enough
# for small meshes, but at 5M elements the three lane-gather kernels ran
# 3-4x below their 83k per-element rate with ~25k grid steps each —
# per-step (DMA initiation) overhead; 64-row tiles cut steps 8x.  Cluster
# and block counts, bucket boundaries and chunk rows all align to TILE so
# the kernels actually get it (they halve the tile until it divides).
TILE = 64


# ---------------------------------------------------------------------------
# host-side ordering
# ---------------------------------------------------------------------------

def _spread_bits(x: np.ndarray) -> np.ndarray:
    x = x.astype(np.uint64) & 0x3FF
    x = (x | (x << 16)) & 0x030000FF
    x = (x | (x << 8)) & 0x0300F00F
    x = (x | (x << 4)) & 0x030C30C3
    x = (x | (x << 2)) & 0x09249249
    return x


def morton_order(coords: np.ndarray, conn: np.ndarray) -> np.ndarray:
    """Element permutation by 30-bit Morton code of the centroid.

    The centroid only seeds a 10-bit-per-axis spatial sort, so f32 corner
    nodes suffice (the mean of the first 4 nodes of any solid type is a
    point inside the element) — 6x less gather traffic than all-node f64
    at 2nd order (measured 13.9 s -> ~3 s at 5.14M elements)."""
    kc = min(conn.shape[1], 4)
    cent = coords[conn[:, :kc]].astype(np.float32, copy=False).mean(axis=1)
    mn, mx = cent.min(0), cent.max(0)
    q = ((cent - mn) / np.maximum(mx - mn, 1e-30) * 1023.0).astype(np.uint64)
    key = (_spread_bits(q[:, 0]) | (_spread_bits(q[:, 1]) << 1)
           | (_spread_bits(q[:, 2]) << 2))
    from .. import native
    perm = native.radix_argsort(key.astype(np.int32))  # 30-bit keys fit i32
    if perm is not None:
        return perm
    return np.argsort(key, kind="stable")


def _chunk_unique_counts(conn_rows: np.ndarray) -> np.ndarray:
    """#unique valid (>=0) nodes per row of [n, w]."""
    srt = np.sort(conn_rows, axis=1)
    first = np.ones_like(srt, dtype=bool)
    first[:, 1:] = srt[:, 1:] != srt[:, :-1]
    first &= srt >= 0
    return first.sum(axis=1)


def _bucket_groups(counts: np.ndarray, max_groups: int = 4,
                   align: int = TILE) -> Tuple[Tuple[int, int, int], ...]:
    """Optimal contiguous grouping of ASCENDING-sorted window counts.

    Returns ((start, size, width), ...) covering [0, len(counts)), where
    width = max count within the group.  Chosen to minimize
    sum(size * width) over <= max_groups contiguous groups (DP over the
    distinct-count run boundaries — the padded-window work model of both
    the gather traffic and the kernel window loops).  Interior boundaries
    are aligned DOWN to `align` rows (f32 sublane tile), which is safe:
    a row pushed across an aligned-down boundary lands in the
    wider-window group that follows it.
    """
    n = int(counts.size)
    if n == 0:
        return ()
    ends = np.nonzero(np.diff(counts))[0] + 1
    ends = np.concatenate([ends, [n]]).astype(np.int64)  # end of each run
    vals = counts[ends - 1].astype(np.int64)
    V = ends.size
    G = min(max_groups, V)
    INF = float("inf")
    dp = np.full((G + 1, V + 1), INF)
    dp[0, 0] = 0.0
    choice = np.zeros((G + 1, V + 1), np.int64)
    for g in range(1, G + 1):
        for v in range(1, V + 1):
            for p in range(v):           # last group covers runs (p, v]
                if dp[g - 1, p] == INF:
                    continue
                start = 0 if p == 0 else int(ends[p - 1])
                c = dp[g - 1, p] + (int(ends[v - 1]) - start) * int(vals[v - 1])
                if c < dp[g, v]:
                    dp[g, v] = c
                    choice[g, v] = p
    g_best = int(np.argmin(dp[1:, V])) + 1
    bounds = []
    v = V
    for g in range(g_best, 0, -1):
        bounds.append(v)
        v = int(choice[g, v])
    bounds = bounds[::-1]
    groups = []
    prev = 0
    for i, v in enumerate(bounds):
        end = n if i == len(bounds) - 1 else (int(ends[v - 1]) // align) * align
        if end <= prev:
            continue
        groups.append((prev, end - prev, int(counts[end - 1])))
        prev = end
    return tuple(groups)


# ---------------------------------------------------------------------------
# plan
# ---------------------------------------------------------------------------

@jax.tree_util.register_static
@dataclasses.dataclass(frozen=True)
class _PackedMeta:
    n_nodes: int
    n_blocks: int          # Nb (padded to kernel tile)
    n_clusters: int        # B (padded to kernel tile)
    elems_per_cluster: int
    nodes_per_elem: int
    lanes: int             # Rp = ceil(k*E_c/128)*128
    win_n: int             # Wn (global max; buckets use their own widths)
    win_c: int             # Wc (global max)
    # window buckets: clusters / node blocks are stored sorted by their
    # window count; each (start, size, width) group pays only its own
    # width in gather traffic and kernel loop trips (MAX-padding fix)
    c_groups: Tuple[Tuple[int, int, int], ...] = ()
    b_groups: Tuple[Tuple[int, int, int], ...] = ()
    # per-BUCKET per-128-lane-chunk widths of the compress incidence
    # lists (static loop trip counts of the gather-compress kernel);
    # aligned with c_groups — each cluster bucket streams and loops only
    # its own widths (ADVICE r2)
    cv_widths: Tuple[Tuple[int, ...], ...] = ()


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class PackedPlan:
    """Cluster/window/permutation plan for the packed operator."""

    win_nodes: jnp.ndarray    # [B, Wn] int32 node-block row (pad -> Nb)
    wslot: jnp.ndarray        # [B, 128] window index of slot (pad -> Wn)
    jslot: jnp.ndarray        # [B, 128] lane within window row
    lconn: jnp.ndarray        # [B, Rp] slot of each element lane
    # per-bucket compress incidence: [n_g, ceil(sum(cv_widths[g])/4), 128]
    # int32 words, 4 byte-packed lane+1 entries each (0 = unused)
    cinc: Tuple[jnp.ndarray, ...]
    winc: jnp.ndarray         # [Nb, Wc] int32 cluster (pad -> B)
    # byte-packed combine incidence: [Nb, ceil(Wc/4), 128] int32 words,
    # byte w%4 of word w//4 = slot of the node in window cluster w, +1
    # (0 = absent) — slot ids are < 128; packing cuts the largest plan
    # table (int32 [Nb, Wc, 128] would be ~1.6 GB at 5M elements) and
    # the combine's per-apply stream 4x
    slotidx: jnp.ndarray
    new_from_old: jnp.ndarray  # [N] int32
    old_from_new: jnp.ndarray  # [Nb*128] int32 (-1 pad)
    esrc: jnp.ndarray         # [B*E_c] int32 original element id (-1 pad)
    meta: _PackedMeta

    # -- construction ------------------------------------------------------
    @staticmethod
    def build(coords, conn, n_nodes: int, elems_per_cluster: int = 32,
              order: Optional[np.ndarray] = None,
              window_buckets: int = 8) -> "PackedPlan":
        import os
        import time
        prof = os.environ.get("TPUFEM_BUILD_PROFILE")
        t_last = [time.perf_counter()]

        def _tick(label):
            if prof:
                now = time.perf_counter()
                print(f"  plan.build {label:16s} {now - t_last[0]:7.2f} s",
                      flush=True)
                t_last[0] = now

        conn = np.asarray(conn)
        coords = np.asarray(coords)
        M, k = conn.shape
        E_c = elems_per_cluster
        if order is None:
            order = morton_order(coords, conn)
        _tick("morton")
        conn_m = conn[order].astype(np.int32)

        # clusters: E_c consecutive Morton elements; halve ranges whose
        # unique-node count exceeds the 128-slot budget.  The common case
        # (uniform E_c blocks) is fully vectorized; only over-budget blocks
        # go through the (rare) Python split path.
        Mpad0 = -(-M // E_c) * E_c
        conn_u = np.full((Mpad0 // E_c, E_c, k), -1, np.int32)
        conn_u.reshape(-1, k)[:M] = conn_m
        cnt0 = _chunk_unique_counts(conn_u.reshape(-1, E_c * k))
        good = cnt0 <= L_SLOTS
        ranges = []                                    # (start, stop) pairs
        for i in np.nonzero(good)[0]:
            ranges.append((int(i) * E_c, min((int(i) + 1) * E_c, M)))
        for i in np.nonzero(~good)[0]:                 # rare over-budget
            stack = [(int(i) * E_c, min((int(i) + 1) * E_c, M))]
            while stack:
                a, b = stack.pop()
                if (b - a <= 1 or np.unique(conn_m[a:b]).size <= L_SLOTS):
                    ranges.append((a, b))
                else:
                    mid = (a + b) // 2
                    stack.extend([(mid, b), (a, mid)])
        ranges.sort()                                  # keep Morton locality
        B = len(ranges)
        Bpad = -(-B // TILE) * TILE
        ra = np.full(Bpad, M, np.int64)
        rl = np.zeros(Bpad, np.int64)
        ra[:B] = [a for a, _ in ranges]
        rl[:B] = [b - a for a, b in ranges]
        idx = np.minimum(ra[:, None] + np.arange(E_c), M)   # [Bpad, E_c]
        maskj = np.arange(E_c)[None, :] < rl[:, None]
        conn_pad = np.concatenate([conn_m, np.full((1, k), -1, np.int32)])
        order_pad = np.concatenate([order, [-1]])
        conn_c = np.where(maskj[:, :, None], conn_pad[idx], -1)
        esrc = np.where(maskj, order_pad[idx], -1).astype(np.int32)
        B = Bpad
        _tick("clusters")

        # first-touch node numbering (cluster-major)
        flat = conn_c.reshape(-1)
        from .. import native
        nfo = native.first_touch(flat, n_nodes)
        if nfo is not None:
            new_from_old = nfo
            n_ref = int(new_from_old.max()) + 1
        else:
            valid = flat >= 0
            uniq, first_idx = np.unique(flat[valid], return_index=True)
            touch_order = np.argsort(first_idx, kind="stable")
            new_from_old = np.full(n_nodes, -1, np.int32)
            new_from_old[uniq[touch_order]] = np.arange(uniq.size,
                                                        dtype=np.int32)
            n_ref = uniq.size
        # unreferenced nodes go after all referenced ones (stable)
        missing = np.nonzero(new_from_old < 0)[0]
        new_from_old[missing] = n_ref + np.arange(missing.size)
        Nb = -(-n_nodes // BLK)
        Nb = -(-Nb // TILE) * TILE
        Npad = Nb * BLK
        old_from_new = np.full(Npad, -1, np.int64)
        old_from_new[new_from_old] = np.arange(n_nodes)

        _tick("first-touch")
        gconn = np.where(conn_c >= 0, new_from_old[np.maximum(conn_c, 0)], -1)

        # per-cluster slots (sorted by new node id — deterministic);
        # native per-cluster sort+unique+binary-search, numpy fallback
        rows = gconn.reshape(B, E_c * k)
        from .. import native as _nat
        _slots = _nat.cluster_slots(rows)
        if _slots is not None:
            l2g, slot_flat, mx = _slots
            if mx > L_SLOTS:
                raise ValueError("cluster slot overflow after splitting; "
                                 "lower elems_per_cluster")
        else:
            srt = np.sort(rows, axis=1)
            first = np.ones_like(srt, dtype=bool)
            first[:, 1:] = srt[:, 1:] != srt[:, :-1]
            first &= srt >= 0
            n_slots = first.sum(axis=1)
            if int(n_slots.max()) > L_SLOTS:
                raise ValueError("cluster slot overflow after splitting; "
                                 "lower elems_per_cluster")
            l2g = np.full((B, L_SLOTS), -1, np.int32)
            bidx = np.broadcast_to(np.arange(B)[:, None], srt.shape)
            slot_of_sorted = np.cumsum(first, axis=1) - 1
            l2g[bidx[first], slot_of_sorted[first]] = srt[first]
            # slot of every (b, position): match each row entry to its slot
            order_in_row = np.argsort(rows, axis=1, kind="stable")
            slot_flat = np.zeros_like(rows)
            # sorted positions -> slot ids (invalid entries share the -1s')
            slot_sorted = np.maximum(slot_of_sorted, 0)
            np.put_along_axis(slot_flat, order_in_row, slot_sorted, axis=1)
        slot_of_entry = slot_flat.reshape(B, E_c, k)        # [B, E_c, k]

        # element-lane slot table, kk-major: r = kk * E_c + e
        Rp = -(-k * E_c // 128) * 128
        lconn = np.zeros((B, Rp), np.int32)
        lconn[:, : k * E_c] = np.transpose(slot_of_entry, (0, 2, 1)
                                           ).reshape(B, k * E_c)

        _tick("slots")
        # compress incidence lists (transposed lconn): for every slot and
        # each 128-lane chunk g of the element lanes, the lane positions
        # that scatter into it.  Pad-element lanes are excluded (their Fe
        # is zero); order within a slot is ascending lane — deterministic.
        # The per-(cluster, chunk) WIDTHS are computed here; the per-bucket
        # byte-packed tables after the window bucketing below.  Native
        # single-pass builder (meshops.cinc_widths); key-sort fallback.
        kEc = k * E_c
        Gch = -(-kEc // 128)
        ev = esrc >= 0                              # [B, E_c]
        from .. import native
        wid_bg = native.cinc_widths(lconn, ev, k, E_c, Gch)
        _np_inc = wid_bg is None
        if _np_inc:
            lane_valid = np.tile(ev, (1, k))        # lane r = kk*E_c + e
            vb2, vr2 = np.nonzero(lane_valid)
            sl2 = lconn[:, :kEc][vb2, vr2].astype(np.int64)
            g2 = vr2 // 128
            lp2 = (vr2 % 128).astype(np.int32)
            ckey = ((vb2 * Gch + g2) * 128 + sl2).astype(np.int64)
            cord = np.argsort(ckey, kind="stable")
            ks = ckey[cord]
            newg = np.ones(ks.size, bool)
            newg[1:] = ks[1:] != ks[:-1]
            aidx = np.arange(ks.size, dtype=np.int64)
            start = aidx[newg][np.cumsum(newg) - 1]
            vpos = aidx - start
            gs = (ks // 128) % Gch
            run_starts = aidx[newg]
            run_counts = np.diff(np.append(run_starts, ks.size))
            run_bg = ks[newg] // 128                   # (b * Gch + g)
            bg_new = np.ones(run_bg.size, bool)
            bg_new[1:] = run_bg[1:] != run_bg[:-1]
            bg_starts = np.nonzero(bg_new)[0]
            wid_bg = np.zeros((B, Gch), np.int64)
            if run_counts.size:
                ub = run_bg[bg_starts]
                wid_bg[ub // Gch, ub % Gch] = np.maximum.reduceat(
                    run_counts, bg_starts)
            ent_b = vb2[cord]
            ent_slot = (ks % 128).astype(np.int64)
            ent_lane = lp2[cord].astype(np.uint32)
        _tick("inc-widths")
        # node-block windows per cluster + per-slot source coordinates;
        # native linear pass over the (node-sorted) slot lists, fallback
        # = vectorized numpy (same outputs, tested equal)
        _cw = native.cluster_windows(l2g, Nb)
        if _cw is not None:
            win_full, wn_cnt32, wslot, jslot = _cw
            wn_cnt = wn_cnt32.astype(np.int64)
            Wn = max(int(wn_cnt.max()) if B else 1, 1)
            win_nodes = np.ascontiguousarray(win_full[:, :Wn])
            wslot = np.where(wslot == 128, Wn, wslot).astype(np.int32)
            wc_cnt32 = native.block_windows_count(l2g, Nb)
            assert wc_cnt32 is not None
            wc_cnt = wc_cnt32.astype(np.int64)
            Wc = max(int(wc_cnt.max()) if Nb else 1, 1)
            winc = slotidx = None   # deferred: packed fill after bucketing
        else:
            blk = np.where(l2g >= 0, l2g // BLK, -1)
            bsort = np.sort(blk, axis=1)
            bfirst = np.ones_like(bsort, dtype=bool)
            bfirst[:, 1:] = bsort[:, 1:] != bsort[:, :-1]
            bfirst &= bsort >= 0
            wn_cnt = bfirst.sum(axis=1).astype(np.int64)
            Wn = int(wn_cnt.max()) if B else 1
            Wn = max(Wn, 1)
            win_nodes = np.full((B, Wn), Nb, np.int32)      # pad -> zero row
            # window fill: emit (b, block) unique pairs in block order
            bidx2 = np.broadcast_to(np.arange(B)[:, None], bsort.shape)
            pair_b = bidx2[bfirst]
            pair_blk = bsort[bfirst]
            pos_in_b = (np.cumsum(bfirst, axis=1) - 1)[bfirst]
            win_nodes[pair_b, pos_in_b] = pair_blk
            # per-slot source coordinates: window index of the slot's block
            wslot = np.full((B, L_SLOTS), Wn, np.int32)
            jslot = np.zeros((B, L_SLOTS), np.int32)
            vb, vs = np.nonzero(l2g >= 0)
            g = l2g[vb, vs]
            # win_nodes rows are sorted and row bases strictly increase, so
            # one global searchsorted suffices
            win_flat = (win_nodes
                        + np.arange(B, dtype=np.int64)[:, None] * (Nb + 2)
                        ).ravel()
            w = (np.searchsorted(win_flat, vb * np.int64(Nb + 2) + g // BLK)
                 - vb * Wn)
            wslot[vb, vs] = w
            jslot[vb, vs] = g % BLK

            # cluster windows per node-block + slot index of each node
            jblk = g // BLK
            key_all = jblk * np.int64(B + 1) + vb
            nat = (native.unique_inverse_i64(key_all) if key_all.size
                   else None)
            if nat is not None:
                key, w_of_pair = nat
            else:
                key, w_of_pair = np.unique(key_all, return_inverse=True)
            up_blk = (key // (B + 1)).astype(np.int64)
            up_cl = (key % (B + 1)).astype(np.int64)
            wc_cnt = np.bincount(up_blk, minlength=Nb).astype(np.int64)
            Wc = int(wc_cnt.max()) if key.size else 1
            Wc = max(Wc, 1)
            winc = np.full((Nb, Wc), B, np.int32)           # pad -> zero row
            # emission order: sorted by (block, cluster) — deterministic
            srt_blocks, blk_starts = np.unique(up_blk, return_index=True)
            pos = np.arange(key.size) - blk_starts[
                np.searchsorted(srt_blocks, up_blk)]
            winc[up_blk, pos] = up_cl
            # map each (slot, node) to its (block, window) cell
            slotidx = np.full((Nb, Wc, BLK), -1, np.int32)
            slotidx[jblk, pos[w_of_pair], g % BLK] = vs

        _tick("windows")
        # --- window bucketing (MAX-padding fix) --------------------------
        # Sort clusters by their node-window count and node blocks by their
        # cluster-window count (stable: Morton / first-touch order kept
        # within equal counts).  The block permutation is absorbed into the
        # node numbering so every packed vector lives in bucket order; the
        # cluster permutation is absorbed into the plan tables and winc.
        if window_buckets == 0:
            # no reordering (window_buckets=0): clusters stay Morton-ordered
            # and blocks stay in first-touch order — required by the
            # distributed operator (parallel.packed_dist), whose devices own
            # CONTIGUOUS cluster/block ranges; one max-width group each
            cperm = np.arange(B)
            bperm = np.arange(Nb)
            c_groups = ((0, B, int(wn_cnt.max()) if B else 0),)
            b_groups = ((0, Nb, int(wc_cnt.max()) if Nb else 0),)
        else:
            cperm = np.argsort(wn_cnt, kind="stable")
            bperm = np.argsort(wc_cnt, kind="stable")
            c_groups = _bucket_groups(wn_cnt[cperm], window_buckets)
            b_groups = _bucket_groups(wc_cnt[bperm], window_buckets)
        cpos = np.empty(B, np.int64)
        cpos[cperm] = np.arange(B)
        bpos = np.empty(Nb, np.int64)
        bpos[bperm] = np.arange(Nb)
        # block permutation: block-granular node renumbering (lane kept)
        new_from_old = bpos[new_from_old // BLK] * BLK + new_from_old % BLK
        old_from_new = old_from_new.reshape(Nb, BLK)[bperm].reshape(-1)
        win_nodes = np.where(win_nodes < Nb,
                             bpos[np.minimum(win_nodes, Nb - 1)], Nb)
        if winc is None:
            # native one-pass fill: winc rows already in bucket order with
            # mapped cluster ids, slotidx byte-packed directly (skips the
            # 1.3 GB unpacked table + chunked numpy re-pack)
            winc, slotidx = native.block_windows_fill_packed(
                l2g, Nb, Wc, bpos, cpos)
        else:
            winc = winc[bperm]
            # byte-pack slotidx 4 windows per int32 word (value = slot + 1)
            # in row chunks: a full-size uint32 temp plus the permuted copy
            # peaked at ~3x the packed table (~5 GB transient at 5M
            # elements, ADVICE r3) — chunking bounds the transient
            Wcp4 = max(-(-Wc // 4), 1)
            packed_si = np.empty((Nb, Wcp4, BLK), np.int32)
            CH = 1 << 13
            sv = np.zeros((min(CH, Nb), Wcp4 * 4, BLK), np.uint32)
            for r0 in range(0, Nb, CH):
                r1 = min(r0 + CH, Nb)
                svc = sv[:r1 - r0]
                svc[:, Wc:] = 0
                svc[:, :Wc] = (slotidx[bperm[r0:r1]].astype(np.int64) + 1
                               ).astype(np.uint32)
                packed_si[r0:r1] = (svc[:, 0::4] | (svc[:, 1::4] << 8)
                                    | (svc[:, 2::4] << 16)
                                    | (svc[:, 3::4] << 24)).view(np.int32)
            slotidx = packed_si
            winc = np.where(winc < B, cpos[np.minimum(winc, B - 1)], B)
        # cluster permutation: rows of cluster tables
        win_nodes = win_nodes[cperm]
        wslot = wslot[cperm]
        jslot = jslot[cperm]
        lconn = lconn[cperm]
        esrc = esrc[cperm]

        _tick("bucketing")
        # per-bucket compress incidence tables, byte-packed 4 per int32
        # (value = lane + 1, 0 = unused).  Each bucket's widths are the
        # max over ITS clusters only, so low-valence buckets stream and
        # loop only their own widths; the packing cuts table bytes 4x.
        if _np_inc:
            grp_of = np.zeros(B, np.int64)
            for gi, (s, ng, _) in enumerate(c_groups):
                grp_of[cperm[s:s + ng]] = gi
            ent_grp = grp_of[ent_b]
        ev_perm = esrc >= 0                # esrc is already bucket-ordered
        cv_widths = []
        cinc_groups = []
        for gi, (s, ng, _) in enumerate(c_groups):
            wid_g = (wid_bg[cperm[s:s + ng]].astype(np.int64).max(axis=0)
                     if ng else np.zeros(Gch, np.int64))
            cv_widths.append(tuple(int(x) for x in wid_g))
            voff_g = np.zeros(Gch, np.int64)
            voff_g[1:] = np.cumsum(wid_g)[:-1]
            Wp = max(-(-int(wid_g.sum()) // 4), 1)
            if not _np_inc:
                # lconn/esrc are already permuted: bucket rows = [s, s+ng)
                packed = native.cinc_fill_packed(
                    lconn, ev_perm, np.arange(s, s + ng), k, E_c, Gch,
                    voff_g, Wp)
                assert packed is not None
            else:
                vals = np.zeros((ng, Wp * 4, 128), np.uint32)
                me = ent_grp == gi
                vals[cpos[ent_b[me]] - s, voff_g[gs[me]] + vpos[me],
                     ent_slot[me]] = ent_lane[me] + 1
                packed = np.ascontiguousarray(
                    vals[:, 0::4] | (vals[:, 1::4] << 8)
                    | (vals[:, 2::4] << 16)
                    | (vals[:, 3::4] << 24)).view(np.int32)
            cinc_groups.append(jnp.asarray(packed))

        _tick("cinc-pack")
        meta = _PackedMeta(n_nodes, Nb, B, E_c, k, Rp, Wn, Wc,
                           c_groups, b_groups, tuple(cv_widths))
        i32 = lambda a: jnp.asarray(a.astype(np.int32))  # noqa: E731
        return PackedPlan(
            win_nodes=i32(win_nodes), wslot=i32(wslot), jslot=i32(jslot),
            lconn=i32(lconn), cinc=tuple(cinc_groups), winc=i32(winc),
            slotidx=i32(slotidx),
            new_from_old=i32(new_from_old), old_from_new=i32(old_from_new),
            esrc=i32(esrc.reshape(-1)), meta=meta)

    # -- disk cache ----------------------------------------------------------
    _SAVE_VERSION = 1

    def save(self, path: str) -> None:
        """Persist the plan as a directory of .npy files + meta.json.

        Plan construction is the host-side cost of the packed operator
        (minutes at 5M+ elements — PERFORMANCE.md "plan build" rows); the
        cache loads in seconds and the geometry (Jinv/W) is recomputed on
        device from coords/conn, so a cached plan fully amortizes the
        setup for repeat runs (bench.py scale block, examples)."""
        import json
        import os
        os.makedirs(path, exist_ok=True)
        arrays = dict(
            win_nodes=self.win_nodes, wslot=self.wslot, jslot=self.jslot,
            lconn=self.lconn, winc=self.winc, slotidx=self.slotidx,
            new_from_old=self.new_from_old, old_from_new=self.old_from_new,
            esrc=self.esrc)
        for i, c in enumerate(self.cinc):
            arrays[f"cinc_{i}"] = c
        for name, a in arrays.items():
            np.save(os.path.join(path, name + ".npy"), np.asarray(a))
        m = self.meta
        meta = dict(version=self._SAVE_VERSION, n_cinc=len(self.cinc),
                    n_nodes=m.n_nodes, n_blocks=m.n_blocks,
                    n_clusters=m.n_clusters,
                    elems_per_cluster=m.elems_per_cluster,
                    nodes_per_elem=m.nodes_per_elem, lanes=m.lanes,
                    win_n=m.win_n, win_c=m.win_c,
                    c_groups=[list(g) for g in m.c_groups],
                    b_groups=[list(g) for g in m.b_groups],
                    cv_widths=[list(w) for w in m.cv_widths])
        with open(os.path.join(path, "meta.json"), "w") as f:
            json.dump(meta, f)

    @staticmethod
    def load(path: str) -> "PackedPlan":
        import json
        import os
        with open(os.path.join(path, "meta.json")) as f:
            md = json.load(f)
        if md.get("version") != PackedPlan._SAVE_VERSION:
            raise ValueError(f"unsupported plan cache version: {md}")
        ld = lambda n: jnp.asarray(  # noqa: E731
            np.load(os.path.join(path, n + ".npy")))
        meta = _PackedMeta(
            md["n_nodes"], md["n_blocks"], md["n_clusters"],
            md["elems_per_cluster"], md["nodes_per_elem"], md["lanes"],
            md["win_n"], md["win_c"],
            tuple(tuple(g) for g in md["c_groups"]),
            tuple(tuple(g) for g in md["b_groups"]),
            tuple(tuple(w) for w in md["cv_widths"]))
        return PackedPlan(
            win_nodes=ld("win_nodes"), wslot=ld("wslot"), jslot=ld("jslot"),
            lconn=ld("lconn"),
            cinc=tuple(ld(f"cinc_{i}") for i in range(md["n_cinc"])),
            winc=ld("winc"), slotidx=ld("slotidx"),
            new_from_old=ld("new_from_old"),
            old_from_new=ld("old_from_new"), esrc=ld("esrc"), meta=meta)

    # -- packing helpers (device) -------------------------------------------
    def pack(self, u):
        """u [N, 3] -> X [Nb, 384] (pad nodes zero)."""
        m = self.meta
        Npad = m.n_blocks * BLK
        src = jnp.maximum(self.old_from_new, 0)
        vals = jnp.where((self.old_from_new >= 0)[:, None],
                         u[src], jnp.zeros((1, 3), u.dtype))     # [Npad, 3]
        X = vals.reshape(m.n_blocks, BLK, 3)
        return jnp.transpose(X, (0, 2, 1)).reshape(m.n_blocks, ROW)

    def unpack(self, X):
        """X [Nb, 384] -> u [N, 3]."""
        m = self.meta
        u = jnp.transpose(X.reshape(m.n_blocks, 3, BLK), (0, 2, 1))
        return u.reshape(m.n_blocks * BLK, 3)[self.new_from_old]

    def pack_np(self, u: np.ndarray) -> np.ndarray:
        m = self.meta
        out = np.zeros((m.n_blocks * BLK, 3), u.dtype)
        out[np.asarray(self.new_from_old)] = u
        out = out.reshape(m.n_blocks, BLK, 3).transpose(0, 2, 1)
        return np.ascontiguousarray(out).reshape(m.n_blocks, ROW)

    def pack_flat(self, uf, dtype=None):
        """Flat [N*3] field -> X [Nb, 384] WITHOUT materializing [N, 3].

        The mixed-precision refinement path (solvers.refine) keeps every
        wide-dtype field flat: a [N, 3] array pads its 3-lane minor dim
        to 128 (42x; 14 GB for one f64-emulated field at 7M nodes)."""
        m = self.meta
        src = jnp.maximum(self.old_from_new, 0)          # [Nb*BLK]
        valid = self.old_from_new >= 0
        dtype = dtype or uf.dtype
        cols = [jnp.where(valid, uf[src * 3 + c], 0).astype(dtype)
                .reshape(m.n_blocks, BLK) for c in range(3)]
        return jnp.concatenate(cols, axis=1)             # lanes c*128+j

    def unpack_flat(self, X, dtype=None):
        """X [Nb, 384] -> flat [N*3] (no [N, 3] intermediate)."""
        m = self.meta
        dtype = dtype or X.dtype
        new = self.new_from_old                          # [N]
        rows, lane = new // BLK, new % BLK
        Xf = X.reshape(-1)
        out = jnp.zeros((new.shape[0] * 3,), dtype)
        for c in range(3):
            v = Xf[rows * ROW + c * BLK + lane].astype(dtype)
            out = out.at[jnp.arange(new.shape[0]) * 3 + c].set(v)
        return out


# ---------------------------------------------------------------------------
# planar partial-assembly compute (dense [B, E_c] tiles, pure elementwise)
# ---------------------------------------------------------------------------

def pa_apply_planar(ue3, Jinv, W, dN, lam, mu):
    """Partial-assembly action in the fully dense planar layout.

    Args:
      ue3:  [3, k, B, E_c] element nodal values (component / node planes).
      Jinv: [qJ, 9, B, E_c] with qJ in {1, q} (row-major J^-1 entries).
      W:    [q, B, E_c] w * detJ (zero on pad elements).
      dN:   host [q, k, 3] reference gradients.
    Returns:
      [3, k, B, E_c] element nodal forces.

    Same math as ops.partial.pa_apply_components; this layout's tiles are
    (B, E_c) so every op is a dense VPU pass (no lane padding at all for
    E_c a multiple of 8 and B a multiple of 128 — and only (128/E_c)x for
    small E_c on the minor dim).
    """
    dN = np.asarray(dN)
    q, k, _ = dN.shape
    qJ = Jinv.shape[0]
    Fe = [[None] * k for _ in range(3)]
    for qi in range(q):
        Ji = [[Jinv[min(qi, qJ - 1), 3 * i + j] for j in range(3)]
              for i in range(3)]
        Hhat = [[None] * 3 for _ in range(3)]
        for a in range(3):
            for c in range(3):
                acc = None
                for kk in range(k):
                    wgt = float(dN[qi, kk, a])
                    if wgt == 0.0:
                        continue
                    term = wgt * ue3[c, kk]
                    acc = term if acc is None else acc + term
                Hhat[a][c] = acc if acc is not None else 0.0
        H = [[sum(Ji[i][j] * Hhat[j][c] for j in range(3)) for c in range(3)]
             for i in range(3)]
        tr = H[0][0] + H[1][1] + H[2][2]
        sig = [[mu * (H[i][c] + H[c][i]) for c in range(3)] for i in range(3)]
        for i in range(3):
            sig[i][i] = sig[i][i] + lam * tr
        Wq = W[qi]
        T = [[Wq * sum(Ji[i][j] * sig[i][c] for i in range(3))
              for c in range(3)] for j in range(3)]
        for c in range(3):
            for kk in range(k):
                acc = None
                for j in range(3):
                    wgt = float(dN[qi, kk, j])
                    if wgt == 0.0:
                        continue
                    term = wgt * T[j][c]
                    acc = term if acc is None else acc + term
                if acc is None:
                    continue
                prev = Fe[c][kk]
                Fe[c][kk] = acc if prev is None else prev + acc
    zero = jnp.zeros_like(W[0])
    return jnp.stack([
        jnp.stack([Fe[c][kk] if Fe[c][kk] is not None else zero
                   for kk in range(k)], axis=0)
        for c in range(3)], axis=0)


def pa_blockdiag_planar(Jinv, W, dN, lam, mu):
    """Assembled node-block 3x3 diagonal contributions.

    Per quadrature point and element node k with physical gradient
    g = J^-T dNhat, the (k, k) block of the element stiffness is
    W [ (lam + mu) g g^T + mu |g|^2 I ] — symmetric.  Returns
    (diag [3, k, B, E_c] for components (00, 11, 22),
     off  [3, k, B, E_c] for components (01, 02, 12)).
    Capability beyond the reference: its only preconditioner is the
    scalar Jacobi diagonal (solver/solver.py:814-833).
    """
    dN = np.asarray(dN)
    q, k, _ = dN.shape
    qJ = Jinv.shape[0]
    diag = [[None] * k for _ in range(3)]
    off = [[None] * k for _ in range(3)]     # (01, 02, 12)
    pairs = ((0, 1), (0, 2), (1, 2))
    for qi in range(q):
        Wq = W[qi]
        for kk in range(k):
            gvec = [sum(float(dN[qi, kk, j]) * Jinv[min(qi, qJ - 1), 3 * i + j]
                        for j in range(3)) for i in range(3)]
            norm2 = gvec[0] * gvec[0] + gvec[1] * gvec[1] + gvec[2] * gvec[2]
            for a in range(3):
                term = Wq * ((lam + mu) * gvec[a] * gvec[a] + mu * norm2)
                prev = diag[a][kk]
                diag[a][kk] = term if prev is None else prev + term
            for idx, (a, c) in enumerate(pairs):
                term = Wq * ((lam + mu) * gvec[a] * gvec[c])
                prev = off[idx][kk]
                off[idx][kk] = term if prev is None else prev + term
    stack = lambda rows: jnp.stack(  # noqa: E731
        [jnp.stack(r, axis=0) for r in rows], axis=0)
    return stack(diag), stack(off)


def pa_diag_planar(Jinv, W, dN, lam, mu):
    """Assembled-diagonal contributions [3, k, B, E_c] (see
    ClusteredPartialOperator.diagonal for the formula)."""
    dN = np.asarray(dN)
    q, k, _ = dN.shape
    qJ = Jinv.shape[0]
    out = [[None] * k for _ in range(3)]
    for qi in range(q):
        Wq = W[qi]
        for kk in range(k):
            gvec = [sum(float(dN[qi, kk, j]) * Jinv[min(qi, qJ - 1), 3 * i + j]
                        for j in range(3)) for i in range(3)]
            norm2 = gvec[0] * gvec[0] + gvec[1] * gvec[1] + gvec[2] * gvec[2]
            for a in range(3):
                term = Wq * ((lam + mu) * gvec[a] * gvec[a] + mu * norm2)
                prev = out[a][kk]
                out[a][kk] = term if prev is None else prev + term
    return jnp.stack([jnp.stack(out[a], axis=0) for a in range(3)], axis=0)


# ---------------------------------------------------------------------------
# operator
# ---------------------------------------------------------------------------

@jax.tree_util.register_static
@dataclasses.dataclass(frozen=True)
class _PackedFlags:
    interpret: bool = False
    # per-bucket chunk ROW counts (aligned with meta.c_groups/b_groups):
    # each bucket's expand/compute/compress (resp. combine) processes this
    # many rows per chunk so window gathers stay under the byte budget;
    # the last chunk carries the (multiple-of-8) remainder.  Earlier
    # chunk-COUNT flags required the count to divide the bucket — at 5.14M
    # elements that degenerated to 7253 eight-row chunks in one bucket.
    cluster_rows: Tuple[int, ...] = ()
    block_rows: Tuple[int, ...] = ()
    # fused cluster stage (ops.fused_kernels): "" = staged expand/pa/
    # compress pipeline, "narrow"/"dense" = one-pass Pallas kernel (kills
    # the ue/Fe HBM round trips and both planar transposes).  When set,
    # Jinv/W are stored CLUSTER-major ([B, qJ*9, E_c] / [B, q, E_c]).
    fuse: str = ""


def _chunk_rows(total: int, target_bytes: int, bytes_per: int) -> int:
    """Rows per chunk: a multiple of TILE (so the kernels keep their full
    tile), <= total, sized to the byte budget."""
    if total * bytes_per <= target_bytes:
        return max(total, 8)
    cc = max(TILE, int(target_bytes // bytes_per) // TILE * TILE)
    return min(cc, total)


def _chunk_offsets(total: int, cc: int):
    """(full-chunk offsets, remainder offset, remainder rows)."""
    nfull, rem = divmod(total, cc)
    return [i * cc for i in range(nfull)], nfull * cc, rem


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class PackedPartialOperator:
    """X [Nb, 384] -> F [Nb, 384]; geometry-factor element compute.

    Geometry layout depends on flags.fuse: planar [qJ, 9, B, E_c] /
    [q, B, E_c] for the staged pipeline, cluster-major [B, qJ*9, E_c] /
    [B, q, E_c] for the fused kernel (its per-chunk row slices).
    """

    Jinv: jnp.ndarray
    W: jnp.ndarray
    dN: _StaticTable          # [q, k, 3]
    plan: PackedPlan
    # static: the fused kernel bakes lam/mu into the Pallas program as
    # Python floats (a traced leaf here would fail inside pallas_call
    # when the operator is passed as a jit ARGUMENT, the required style)
    lam_mu: Tuple[float, float] = dataclasses.field(
        metadata=dict(static=True))
    flags: _PackedFlags = _PackedFlags()

    @staticmethod
    def build(coords, conn, etype: str, E: float, nu: float,
              n_nodes: Optional[int] = None, rule: str = "default",
              plan: Optional[PackedPlan] = None, affine: Optional[bool] = None,
              dtype=None, elems_per_cluster: int = 32,
              interpret: Optional[bool] = None,
              chunk_budget_bytes: int = 1 << 30,
              window_buckets: int = 8,
              fuse: Optional[str] = None,
              geometry: Optional[Tuple] = None) -> "PackedPartialOperator":
        """geometry: optional precomputed (Jinv, W) in the STORAGE layout
        of the requested fuse mode (as taken from a previously built
        operator's fields) — skips the chunked_geometry device pass, the
        second-largest setup cost after the plan itself."""
        from ..core.materials import lame_parameters
        from ..elements.tables import element_table

        conn = np.asarray(conn)
        # NEVER np.asarray(coords) unconditionally: on the tunneled axon
        # backend a device->host readback runs at ~0.3 MB/s (measured:
        # 160 MB = 575 s), so coords is materialized on host only when a
        # host-side pass (plan build / geometry compute) actually needs it.
        if n_nodes is None and plan is None:
            raise ValueError("pass n_nodes or a prebuilt plan")
        if plan is None:
            plan = PackedPlan.build(np.asarray(coords), conn, int(n_nodes),
                                    elems_per_cluster,
                                    window_buckets=window_buckets)
        m = plan.meta
        table = element_table(etype, rule)
        dtype = dtype or jax.dtypes.canonicalize_dtype(coords.dtype)
        if interpret is None:       # Pallas kernels interpret off-TPU
            interpret = jax.default_backend() != "tpu"
        B, E_c = m.n_clusters, m.elems_per_cluster
        if fuse is None:
            # measured on v5e (scripts/probe_fused.py / probe_scale_fused):
            # dense 118 vs staged 113 Gnnz/s at 83k elements, 59.9 vs 48.6
            # at 5.14M (the ue/Fe round trips + transposes it removes grow
            # with the gather-heavy share); narrow loses 2x to lane pad
            fuse = "dense" if 128 % E_c == 0 else ""

        if geometry is not None:
            Jp = jnp.asarray(geometry[0], dtype)
            Wp = jnp.asarray(geometry[1], dtype)
            ok = ((Jp.shape[0] == B and Wp.shape[0] == B) if fuse
                  else (Jp.ndim == 4 and Jp.shape[2] == B
                        and Wp.shape[1] == B))
            if not ok:      # e.g. a cache written under another fuse mode
                raise ValueError(
                    f"geometry layout mismatch for fuse={fuse!r}: "
                    f"Jinv {Jp.shape}, W {Wp.shape}, B={B}")
        else:
            esrc = np.asarray(plan.esrc)
            valid = esrc >= 0
            conn_sel = conn[np.maximum(esrc, 0)]
            from .partial import chunked_geometry
            Jinv, W, affine_meas = chunked_geometry(
                jnp.asarray(coords, dtype), conn_sel, table, dtype)
            W = W * jnp.asarray(valid, dtype)[:, None]   # zero pad elements
            if affine is None:
                affine = affine_meas
            if affine:
                Jinv = Jinv[:, :1]
            qJ = Jinv.shape[1]
            q = W.shape[1]
            if fuse:
                # cluster-major geometry for the fused kernel's row slices
                Jp = jnp.transpose(Jinv.reshape(B, E_c, qJ, 9), (0, 2, 3, 1)
                                   ).reshape(B, qJ * 9, E_c)
                Wp = jnp.transpose(W.reshape(B, E_c, q), (0, 2, 1))
            else:
                # [B*E_c, q, 3, 3] -> [qJ, 9, B, E_c]
                Jp = jnp.transpose(Jinv.reshape(B, E_c, qJ, 9), (2, 3, 0, 1))
                Wp = jnp.transpose(W.reshape(B, E_c, q), (2, 0, 1))
        lam, mu = lame_parameters(E, nu)
        # bound the materialized window gathers (Xw / Ycw) at large scale:
        # process each bucket's clusters / node blocks in chunks that fit
        # the budget (bucket width sets the per-row gather bytes)
        itemsize = jnp.dtype(dtype).itemsize
        crows = tuple(
            _chunk_rows(n, chunk_budget_bytes,
                        max(wk, 1) * ROW * itemsize + m.lanes * 3 * itemsize
                        + -(-sum(m.cv_widths[gi]) // 4) * BLK * 4)
            for gi, (_, n, wk) in enumerate(m.c_groups))
        brows = tuple(
            _chunk_rows(n, chunk_budget_bytes,
                        max(wk, 1) * ROW * itemsize
                        + -(-max(wk, 1) // 4) * BLK * 4)
            for (_, n, wk) in m.b_groups)
        return PackedPartialOperator(
            Jinv=Jp, W=Wp, dN=_StaticTable.of(table.dN), plan=plan,
            lam_mu=(float(lam), float(mu)),
            flags=_PackedFlags(interpret, crows, brows, fuse))

    # ------------------------------------------------------------------
    @staticmethod
    def _lanes_to_planar(ue, k, E_c):
        """[Bc, 3, Rp] -> [3, k, Bc, E_c] (kk-major lanes)."""
        u = ue[:, :, : k * E_c].reshape(ue.shape[0], 3, k, E_c)
        return jnp.transpose(u, (1, 2, 0, 3))

    @staticmethod
    def _planar_to_lanes(fe3, Rp):
        """[3, k, Bc, E_c] -> [Bc, 3, Rp]."""
        _, k, Bc, E_c = fe3.shape
        f = jnp.transpose(fe3, (2, 0, 1, 3)).reshape(Bc, 3, k * E_c)
        if Rp > k * E_c:
            f = jnp.pad(f, ((0, 0), (0, 0), (0, Rp - k * E_c)))
        return f

    def _planar_geom(self):
        """(Jinv [qJ, 9, B, E_c], W [q, B, E_c]) views regardless of the
        storage layout (the diagonal paths consume the planar layout)."""
        m = self.plan.meta
        if not self.flags.fuse:
            return self.Jinv, self.W
        B, E_c = m.n_clusters, m.elems_per_cluster
        qJ = self.Jinv.shape[1] // 9
        Jp = jnp.transpose(self.Jinv.reshape(B, qJ, 9, E_c), (1, 2, 0, 3))
        Wp = jnp.transpose(self.W, (1, 0, 2))
        return Jp, Wp

    def _yc_chunk(self, Xp, gi, s, loc, n, wk):
        """Slot sums for clusters [s+loc, s+loc+n) of bucket gi (window
        width wk); `loc` is the chunk offset within the bucket."""
        from . import packed_kernels as pk
        fl = self.flags
        m = self.plan.meta
        lam, mu = self.lam_mu
        bs = s + loc
        sl = lambda a: jax.lax.dynamic_slice_in_dim(a, bs, n, 0)  # noqa: E731
        lconn = sl(self.plan.lconn)
        Xw = Xp[sl(self.plan.win_nodes)[:, :wk]]           # [n, wk, 384]
        ci = jax.lax.dynamic_slice_in_dim(self.plan.cinc[gi], loc, n, 0)
        if fl.fuse:
            from . import fused_kernels as fk
            return fk.fused_yc(
                Xw, sl(self.plan.wslot), sl(self.plan.jslot), lconn, ci,
                sl(self.Jinv), sl(self.W), self.dN.array, lam, mu,
                m.cv_widths[gi], k=m.nodes_per_elem,
                E_c=m.elems_per_cluster, mode=fl.fuse,
                interpret=fl.interpret)
        ue = pk.expand(Xw, sl(self.plan.wslot), sl(self.plan.jslot), lconn,
                       interpret=fl.interpret)             # [n, 3, Rp]
        ue3 = self._lanes_to_planar(ue, m.nodes_per_elem, m.elems_per_cluster)
        Jc = jax.lax.dynamic_slice_in_dim(self.Jinv, bs, n, 2)
        Wc = jax.lax.dynamic_slice_in_dim(self.W, bs, n, 1)
        fe3 = pa_apply_planar(ue3, Jc, Wc, self.dN.array, lam, mu)
        Fe = self._planar_to_lanes(fe3, m.lanes)
        return pk.compress_gather(Fe, ci, m.cv_widths[gi],
                                  interpret=fl.interpret)

    def _combine(self, Yc):
        """Slot sums [B, 384] -> node rows [Nb, 384] (bucketed windows)."""
        from . import packed_kernels as pk
        fl = self.flags
        m = self.plan.meta
        Ycp = jnp.concatenate([Yc, jnp.zeros((1, ROW), Yc.dtype)], axis=0)
        F = jnp.zeros((m.n_blocks, ROW), Yc.dtype)

        def chunk(bs, n, wk):
            wc = jax.lax.dynamic_slice_in_dim(self.plan.winc, bs, n, 0)[:, :wk]
            si = jax.lax.dynamic_slice_in_dim(
                self.plan.slotidx, bs, n, 0)[:, : -(-wk // 4)]
            return pk.combine(Ycp[wc], si, wk, interpret=fl.interpret)

        for (s, n, wk), bc in zip(m.b_groups, fl.block_rows):
            if wk == 0 or n == 0:      # blocks no cluster writes -> zero rows
                continue
            offs, roff, rem = _chunk_offsets(n, bc)
            if len(offs) <= UNROLL_CHUNKS:
                for off in offs:
                    F = jax.lax.dynamic_update_slice_in_dim(
                        F, chunk(s + off, bc, wk), s + off, 0)
            else:
                def body(i, F, s=s, bc=bc, wk=wk):
                    return jax.lax.dynamic_update_slice_in_dim(
                        F, chunk(s + i * bc, bc, wk), s + i * bc, 0)

                F = jax.lax.fori_loop(0, len(offs), body, F)
            if rem:
                F = jax.lax.dynamic_update_slice_in_dim(
                    F, chunk(s + roff, rem, wk), s + roff, 0)
        return F

    def __call__(self, X):
        fl = self.flags
        m = self.plan.meta
        Xp = jnp.concatenate([X, jnp.zeros((1, ROW), X.dtype)], axis=0)
        Yc = jnp.zeros((m.n_clusters, ROW), X.dtype)
        for gi, ((s, n, wk), cc) in enumerate(zip(m.c_groups,
                                                  fl.cluster_rows)):
            if wk == 0 or n == 0:      # pad-only clusters -> zero slot sums
                continue
            offs, roff, rem = _chunk_offsets(n, cc)
            if len(offs) <= UNROLL_CHUNKS:
                for off in offs:
                    Yc = jax.lax.dynamic_update_slice_in_dim(
                        Yc, self._yc_chunk(Xp, gi, s, off, cc, wk),
                        s + off, 0)
            else:
                def body(i, Yc, gi=gi, s=s, cc=cc, wk=wk):
                    Ycc = self._yc_chunk(Xp, gi, s, i * cc, cc, wk)
                    return jax.lax.dynamic_update_slice_in_dim(
                        Yc, Ycc, s + i * cc, 0)

                Yc = jax.lax.fori_loop(0, len(offs), body, Yc)
            if rem:
                Yc = jax.lax.dynamic_update_slice_in_dim(
                    Yc, self._yc_chunk(Xp, gi, s, roff, rem, wk),
                    s + roff, 0)
        return self._combine(Yc)

    def diagonal(self):
        """Assembled diagonal as a packed field [Nb, 384]."""
        from . import packed_kernels as pk
        fl = self.flags
        m = self.plan.meta
        lam, mu = self.lam_mu
        Jp, Wp = self._planar_geom()

        def chunk(gi, s, loc, n):
            bs = s + loc
            Jc = jax.lax.dynamic_slice_in_dim(Jp, bs, n, 2)
            Wc = jax.lax.dynamic_slice_in_dim(Wp, bs, n, 1)
            d3 = pa_diag_planar(Jc, Wc, self.dN.array, lam, mu)
            Fe = self._planar_to_lanes(d3, m.lanes)
            ci = jax.lax.dynamic_slice_in_dim(self.plan.cinc[gi], loc, n, 0)
            return pk.compress_gather(Fe, ci, m.cv_widths[gi],
                                      interpret=fl.interpret)

        Yc = jnp.zeros((m.n_clusters, ROW), self.W.dtype)
        for gi, ((s, n, wk), cc) in enumerate(zip(m.c_groups,
                                                  fl.cluster_rows)):
            if wk == 0 or n == 0:
                continue
            offs, roff, rem = _chunk_offsets(n, cc)
            if len(offs) <= UNROLL_CHUNKS:
                for off in offs:
                    Yc = jax.lax.dynamic_update_slice_in_dim(
                        Yc, chunk(gi, s, off, cc), s + off, 0)
            else:
                def body(i, Yc, gi=gi, s=s, cc=cc):
                    return jax.lax.dynamic_update_slice_in_dim(
                        Yc, chunk(gi, s, i * cc, cc), s + i * cc, 0)

                Yc = jax.lax.fori_loop(0, len(offs), body, Yc)
            if rem:
                Yc = jax.lax.dynamic_update_slice_in_dim(
                    Yc, chunk(gi, s, roff, rem), s + roff, 0)
        return self._combine(Yc)

    def block_diagonal(self):
        """Assembled 3x3 node-block diagonal as two packed fields
        ([Nb, 384] each): diagonal components (00, 11, 22) and
        off-diagonal components (01, 02, 12)."""
        from . import packed_kernels as pk
        fl = self.flags
        m = self.plan.meta
        lam, mu = self.lam_mu
        Jp, Wp = self._planar_geom()

        def chunk(gi, s, loc, n):
            bs = s + loc
            Jc = jax.lax.dynamic_slice_in_dim(Jp, bs, n, 2)
            Wc = jax.lax.dynamic_slice_in_dim(Wp, bs, n, 1)
            d3, o3 = pa_blockdiag_planar(Jc, Wc, self.dN.array, lam, mu)
            ci = jax.lax.dynamic_slice_in_dim(self.plan.cinc[gi], loc, n, 0)
            out = []
            for f3 in (d3, o3):
                Fe = self._planar_to_lanes(f3, m.lanes)
                out.append(pk.compress_gather(Fe, ci, m.cv_widths[gi],
                                              interpret=fl.interpret))
            return jnp.stack(out, axis=0)           # [2, n, 384]

        Yc = jnp.zeros((2, m.n_clusters, ROW), self.W.dtype)
        for gi, ((s, n, wk), cc) in enumerate(zip(m.c_groups,
                                                  fl.cluster_rows)):
            if wk == 0 or n == 0:
                continue
            offs, roff, rem = _chunk_offsets(n, cc)
            if len(offs) <= UNROLL_CHUNKS:
                for off in offs:
                    Yc = jax.lax.dynamic_update_slice(
                        Yc, chunk(gi, s, off, cc), (0, s + off, 0))
            else:
                def body(i, Yc, gi=gi, s=s, cc=cc):
                    return jax.lax.dynamic_update_slice(
                        Yc, chunk(gi, s, i * cc, cc), (0, s + i * cc, 0))

                Yc = jax.lax.fori_loop(0, len(offs), body, Yc)
            if rem:
                Yc = jax.lax.dynamic_update_slice(
                    Yc, chunk(gi, s, roff, rem), (0, s + roff, 0))
        return self._combine(Yc[0]), self._combine(Yc[1])


# ---------------------------------------------------------------------------
# block-Jacobi preconditioner (3x3 node blocks, packed layout)
# ---------------------------------------------------------------------------

def invert_block_planes(D, O, mask=None):
    """Packed 3x3 node-block planes -> inverse planes.

    D [*, 384] holds (d00, d11, d22), O holds (d01, d02, d12).  Closed-form
    symmetric adjugate/det inverse per node; singular blocks fall back to
    the scalar-Jacobi diagonal.  With `mask` (0/1 packed field), masked
    DOFs are decoupled BEFORE inversion (row/col dropped) and the inverse
    rows are zeroed after — the inverse of the constrained block.
    Returns (inv_d, inv_o) with the same plane layout.
    """
    a, b, c = D[..., :BLK], D[..., BLK:2 * BLK], D[..., 2 * BLK:]
    d, e, f = O[..., :BLK], O[..., BLK:2 * BLK], O[..., 2 * BLK:]
    if mask is not None:
        m0, m1, m2 = (mask[..., :BLK], mask[..., BLK:2 * BLK],
                      mask[..., 2 * BLK:])
        d = d * m0 * m1
        e = e * m0 * m2
        f = f * m1 * m2
    cof00 = b * c - f * f
    cof01 = e * f - d * c
    cof02 = d * f - b * e
    det = a * cof00 + d * cof01 + e * cof02
    safe = jnp.isfinite(det) & (jnp.abs(det) > 0)
    inv_det = jnp.where(safe, 1.0 / jnp.where(safe, det, 1.0), 0.0)

    def scal(x):         # scalar-Jacobi fallback for singular blocks
        return jnp.where(jnp.abs(x) > 0, 1.0 / jnp.where(x == 0, 1.0, x),
                         0.0)

    i00 = jnp.where(safe, cof00 * inv_det, scal(a))
    i11 = jnp.where(safe, (a * c - e * e) * inv_det, scal(b))
    i22 = jnp.where(safe, (a * b - d * d) * inv_det, scal(c))
    i01 = jnp.where(safe, cof01 * inv_det, 0.0)
    i02 = jnp.where(safe, cof02 * inv_det, 0.0)
    i12 = jnp.where(safe, (d * e - a * f) * inv_det, 0.0)
    inv_d = jnp.concatenate([i00, i11, i22], axis=-1)
    inv_o = jnp.concatenate([i01, i02, i12], axis=-1)
    if mask is not None:
        inv_d = inv_d * mask
        inv_o = inv_o * mask
    return inv_d, inv_o


def block_apply(inv_d, inv_o, r):
    """z = B^{-1} r per node on packed planes (three dense passes)."""
    r0, r1, r2 = r[..., :BLK], r[..., BLK:2 * BLK], r[..., 2 * BLK:]
    i00, i11, i22 = (inv_d[..., :BLK], inv_d[..., BLK:2 * BLK],
                     inv_d[..., 2 * BLK:])
    i01, i02, i12 = (inv_o[..., :BLK], inv_o[..., BLK:2 * BLK],
                     inv_o[..., 2 * BLK:])
    z0 = i00 * r0 + i01 * r1 + i02 * r2
    z1 = i01 * r0 + i11 * r1 + i12 * r2
    z2 = i02 * r0 + i12 * r1 + i22 * r2
    return jnp.concatenate([z0, z1, z2], axis=-1)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class BlockJacobi:
    """z = B_n^{-1} r_n per node — exact 3x3 node-block Jacobi.

    Stored as packed inverse planes: `inv_d` [Nb, 384] holds (i00, i11,
    i22), `inv_o` holds (i01, i02, i12).  Applying costs three dense
    elementwise passes — same layout, no gathers.  Callable M_inv for
    solvers.cg.  The reference has only the scalar Jacobi diagonal
    (solver/solver.py:814-833); the 3x3 block couples the displacement
    components at each node and converges in fewer CG iterations on
    elasticity (Poisson coupling).
    """

    inv_d: jnp.ndarray
    inv_o: jnp.ndarray

    @staticmethod
    def build(op: "PackedPartialOperator", mask=None) -> "BlockJacobi":
        """mask: optional packed [Nb, 384] 0/1 field (fixed DOFs zero).
        Masked DOFs are decoupled BEFORE inversion (row/col dropped),
        so the inverse acts like the constrained operator's block."""
        D, O = op.block_diagonal()
        inv_d, inv_o = invert_block_planes(D, O, mask)
        return BlockJacobi(inv_d=inv_d, inv_o=inv_o)

    def __call__(self, r):
        return block_apply(self.inv_d, self.inv_o, r)


# ---------------------------------------------------------------------------
# constraints in the packed layout (SPC values / RBE2 / RBE3)
# ---------------------------------------------------------------------------

@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class PackedConstraints:
    """SPC / RBE2 / RBE3 enforcement directly on packed [Nb, 384] fields.

    Round 3's PackedSystem supported only a fixed-node zero mask, so the
    reference's constrained workloads (RBE2 masters on SimJEB h5 samples,
    solver/solver.py:478-510, 665-700) could not use the fast operator.
    This carries the solvers.constraints tables with every DOF index
    translated to its packed flat position (row * 384 + comp * 128 +
    node % 128 after the plan's node renumbering), so apply_state /
    project_residual run in-layout: the masks are dense elementwise
    passes and the RBE2/RBE3 sets are tiny sparse gather/scatters (the
    constraint sets are O(surface), not O(N)).  Deterministic: fixed
    segment-sum order, same semantics as solvers.constraints.Constraints.
    """

    mask: jnp.ndarray          # [Nb, 384] 1.0 free / 0.0 constrained
    spc_const: jnp.ndarray     # [Nb, 384] SPC values (else zeros)
    rbe2_slave: jnp.ndarray    # [R2] int32 packed flat dof
    rbe2_master: jnp.ndarray   # [R2] int32
    rbe3_slave: jnp.ndarray    # [R3] int32
    rbe3_weights: jnp.ndarray  # [R3]
    rbe3_cid: jnp.ndarray      # [R3] int32
    rbe3_master: jnp.ndarray   # [C3] int32
    rbe3_wsum: jnp.ndarray     # [C3]
    has_spc: bool = dataclasses.field(default=False,
                                      metadata=dict(static=True))

    @staticmethod
    def build(cons, plan: PackedPlan, dtype=np.float32, comp: int = 0
              ) -> "PackedConstraints":
        """From a solvers.constraints.Constraints (3- or 6-DOF tables).

        comp selects the 3-component window [comp, comp+3) of the nodal
        DOFs this packed plane carries: 0 = translations (the solid-only
        default, matching the reference where solids only carry u[:, :3])
        or 3 = rotations (the second plane of the mixed solid+shell
        system, ops.packed_mixed).  RBE2/RBE3 couplings are always
        component-wise in the reference schema (solver/solver.py:437-476,
        603-651), so each plane carries exactly its own rows."""
        m = plan.meta
        nd = cons.meta.dof_per_node
        new_from_old = np.asarray(plan.new_from_old).astype(np.int64)

        def pidx(dofs):
            dofs = np.asarray(dofs, np.int64)
            node, d = dofs // nd, dofs % nd - comp
            nn = new_from_old[node]
            return ((nn // BLK) * ROW + d * BLK + nn % BLK).astype(np.int32)

        def keep(dofs):
            d = np.asarray(dofs, np.int64) % nd
            return (d >= comp) & (d < comp + 3)

        mask_n = np.asarray(cons.mask2d)[:, comp:comp + 3].astype(dtype)
        spc_n = np.asarray(cons.spc_const2d)[:, comp:comp + 3].astype(dtype)

        r2s = np.asarray(cons.rbe2_slave_dofs, np.int64)
        r2m = np.asarray(cons.rbe2_master_dofs, np.int64)
        k2 = keep(r2s) if r2s.size else np.zeros(0, bool)
        r3s = np.asarray(cons.rbe3_slave_dofs, np.int64)
        k3 = keep(r3s) if r3s.size else np.zeros(0, bool)
        r3w = np.asarray(cons.rbe3_weights)[k3].astype(dtype)
        r3c = np.asarray(cons.rbe3_cid, np.int64)[k3]
        # masters whose constraint lost all entries keep weight sum; the
        # segment-sum over the filtered entries still uses original ids
        r3m_all = np.asarray(cons.rbe3_master_dofs, np.int64)
        r3ws_all = np.asarray(cons.rbe3_weight_sums)
        km = keep(r3m_all) if r3m_all.size else np.zeros(0, bool)
        # rotation-dof rbe3 rows are dropped entirely; remap cids
        cid_map = -np.ones(r3m_all.size, np.int64)
        cid_map[np.nonzero(km)[0]] = np.arange(int(km.sum()))
        sel3 = (cid_map[r3c] >= 0) if r3c.size else np.zeros(0, bool)

        i32 = lambda a: jnp.asarray(np.asarray(a).astype(np.int32))  # noqa
        return PackedConstraints(
            mask=jnp.asarray(plan.pack_np(mask_n)),
            spc_const=jnp.asarray(plan.pack_np(spc_n)),
            rbe2_slave=i32(pidx(r2s[k2])),
            rbe2_master=i32(pidx(r2m[k2])),
            rbe3_slave=i32(pidx(r3s[k3][sel3])),
            rbe3_weights=jnp.asarray(r3w[sel3]),
            rbe3_cid=i32(cid_map[r3c[sel3]]),
            rbe3_master=i32(pidx(r3m_all[km])),
            rbe3_wsum=jnp.asarray(r3ws_all[km].astype(dtype)),
            has_spc=bool(np.any(spc_n)),
        )

    @staticmethod
    def fixed(plan: PackedPlan, fixed_nodes, dtype=np.float32
              ) -> "PackedConstraints":
        from ..solvers.constraints import Constraints
        cons = Constraints.fixed(plan.meta.n_nodes,
                                 fixed_nodes if fixed_nodes is not None
                                 else [], 3, dtype=dtype)
        return PackedConstraints.build(cons, plan, dtype)

    def apply_state(self, X):
        out = X * self.mask.astype(X.dtype)
        if self.has_spc:
            out = out + self.spc_const.astype(X.dtype)
        if self.rbe2_slave.size or self.rbe3_slave.size:
            shape = out.shape
            xf = out.reshape(-1)
            if self.rbe2_slave.size:
                xf = xf.at[self.rbe2_slave].set(xf[self.rbe2_master])
            if self.rbe3_slave.size:
                num = jax.ops.segment_sum(
                    self.rbe3_weights.astype(xf.dtype)
                    * xf[self.rbe3_slave],
                    self.rbe3_cid, num_segments=self.rbe3_master.shape[0])
                xf = xf.at[self.rbe3_master].set(
                    num / self.rbe3_wsum.astype(xf.dtype))
            out = xf.reshape(shape)
        return out

    def project_residual(self, r):
        return r * self.mask.astype(r.dtype)

    @property
    def free_mask(self):
        """Flat [Nb*384] 1.0/0.0 free-DOF mask (modal-solver interface;
        padding lanes are constrained by construction)."""
        return self.mask.reshape(-1)


# ---------------------------------------------------------------------------
# one-call packed PCG system
# ---------------------------------------------------------------------------

class PackedSystem:
    """Packed-layout PCG convenience wrapper.

    Holds the operator plus packed constraints (fixed nodes, or full
    SPC/RBE2/RBE3 via a solvers.constraints.Constraints) and the Jacobi /
    block-Jacobi preconditioner; `solve` runs solvers.cg entirely in the
    [Nb, 384] layout (vectors, masks, dots — every elementwise pass is
    dense) and unpacks the result.
    """

    def __init__(self, op: PackedPartialOperator, fixed_nodes=None,
                 precondition="jacobi", constraints=None):
        """precondition: "jacobi" (scalar diagonal, reference parity),
        "block" (exact 3x3 node-block inverse — fewer iterations on
        elasticity), or False/None.  constraints: optional
        solvers.constraints.Constraints (SPC/RBE2/RBE3); fixed_nodes is
        the simple all-DOF-pin shortcut."""
        self.op = op
        plan = op.plan
        dtype = np.dtype(jax.dtypes.canonicalize_dtype(op.W.dtype))
        if constraints is not None:
            self.pc = PackedConstraints.build(constraints, plan, dtype)
            self._has_sets = bool(constraints.spc_values.size) or bool(
                constraints.rbe2_slave_dofs.size) or bool(
                constraints.rbe3_slave_dofs.size)
        else:
            self.pc = PackedConstraints.fixed(plan, fixed_nodes, dtype)
            self._has_sets = False
        self.mask = self.pc.mask
        if precondition == "block":
            self.M_inv = BlockJacobi.build(op, mask=self.mask)
        elif precondition:          # "jacobi" / True
            d = op.diagonal()
            minv = jnp.where(jnp.abs(d) > 0,
                             1.0 / jnp.where(d == 0, 1.0, d), 0.0)
            self.M_inv = minv * self.mask
        else:
            self.M_inv = None
        self._solve = {}

    def constraints(self):
        return self.pc

    def _jitted(self, tol, max_iter, dot_dtype):
        from ..solvers.cg import cg

        key = (float(tol), int(max_iter), str(dot_dtype))
        if key not in self._solve:
            def run(op, bX, x0X, pc, minv):
                u, info = cg(op, pc.project_residual(bX), constraints=pc,
                             M_inv=minv, x0=x0X, tol=tol, max_iter=max_iter,
                             dot_dtype=dot_dtype)
                return u, info
            self._solve[key] = jax.jit(run)
        return key

    def _args(self, b, x0):
        plan = self.op.plan
        bX = plan.pack(jnp.asarray(b, self.mask.dtype))
        x0X = (plan.pack(jnp.asarray(x0, self.mask.dtype))
               if x0 is not None else jnp.zeros_like(bX))
        return (self.op, bX, x0X, self.pc,
                self.M_inv if self.M_inv is not None else jnp.ones_like(bX))

    def warm(self, b, x0=None, tol: float = 1e-8, max_iter: int = 1000,
             dot_dtype=None) -> None:
        """AOT-compile the solve program for this (tol, max_iter) WITHOUT
        running it (lower+compile; the executable replaces the jit
        wrapper).  Lets benchmarks time a single converged solve with
        compilation excluded."""
        key = self._jitted(tol, max_iter, dot_dtype)
        f = self._solve[key]
        if hasattr(f, "lower"):
            self._solve[key] = f.lower(*self._args(b, x0)).compile()

    def solve(self, b, x0=None, tol: float = 1e-8, max_iter: int = 1000,
              dot_dtype=None):
        """b [N, 3] -> (u [N, 3], SolveInfo); whole PCG is one XLA program."""
        key = self._jitted(tol, max_iter, dot_dtype)
        uX, info = self._solve[key](*self._args(b, x0))
        return self.op.plan.unpack(uX), info

    def _chunk_jit(self, tol, every, dot_dtype):
        from ..solvers.cg import cg

        key = ("chunk", float(tol), int(every), str(dot_dtype))
        if key not in self._solve:
            def run(op, bX, x0X, pc, minv, pX, rz):
                return cg(op, pc.project_residual(bX), constraints=pc,
                          M_inv=minv, x0=x0X, tol=tol, max_iter=every,
                          dot_dtype=dot_dtype, resume_state=(pX, rz),
                          return_state=True)
            self._solve[key] = jax.jit(run)
        return key

    def warm_chunked(self, b, tol: float = 1e-8, every: int = 500,
                     dot_dtype=None) -> None:
        """AOT-compile the chunked-solve program (see solve_chunked)."""
        key = self._chunk_jit(tol, every, dot_dtype)
        f = self._solve[key]
        if hasattr(f, "lower"):
            args = self._args(b, None)
            self._solve[key] = f.lower(
                *args, jnp.zeros_like(args[1]),
                jnp.asarray(1.0, args[1].dtype)).compile()

    def solve_chunked_packed(self, bX, tol: float = 1e-8,
                             max_iter: int = 20000, every: int = 500,
                             dot_dtype=None):
        """solve_chunked with PACKED [Nb, 384] RHS in and solution out —
        the refinement path's interface (no [N, 3] intermediates)."""
        key = self._chunk_jit(tol, every, dot_dtype)
        op = self.op
        x0X = jnp.zeros_like(bX)
        pX = jnp.zeros_like(bX)
        rz = jnp.asarray(-1.0, bX.dtype)
        minv = self.M_inv if self.M_inv is not None else jnp.ones_like(bX)
        done = 0
        info = None
        uX = x0X
        while done < max_iter:
            uX, info, (pX, rz) = self._solve[key](
                op, bX, x0X, self.pc, minv, pX, rz)
            it = int(info.iterations)
            done += it
            x0X = uX
            from ..solvers.cg import MAX_ITER
            if int(info.status) != MAX_ITER or it == 0:
                break
        info = info._replace(iterations=jnp.asarray(done))
        return uX, info

    def solve_chunked(self, b, x0=None, tol: float = 1e-8,
                      max_iter: int = 20000, every: int = 500,
                      dot_dtype=None, progress=None):
        """PCG as a sequence of `every`-iteration device programs with
        EXACT recurrence continuation (cg resume_state) — identical
        trajectory to one while_loop, but no single XLA execution runs
        longer than `every` iterations.  Needed at north-star scale: one
        uninterrupted ~15-minute execution crashed the TPU worker; this
        also gives between-chunk convergence telemetry for multi-minute
        solves.  Returns (u [N, 3], SolveInfo) with the concatenated
        residual history and total iteration count."""
        from ..solvers.cg import CONVERGED, MAX_ITER, RUNNING, SolveInfo

        key = self._chunk_jit(tol, every, dot_dtype)
        op, bX, x0X, pc, minv = self._args(b, x0)
        pX = jnp.zeros_like(bX)           # rz_prev <= 0 -> fresh start
        rz = jnp.asarray(-1.0, bX.dtype)  # (p0 = z0); chunks then carry p
        hists = []
        done = 0
        info = None
        while done < max_iter:
            uX, info, (pX, rz) = self._solve[key](
                op, bX, x0X, pc, minv, pX, rz)
            it = int(info.iterations)         # host sync once per chunk
            h = np.asarray(info.history)[:it + 1]
            hists.append(h if not hists else h[1:])
            done += it
            x0X = uX
            if progress is not None:
                progress(done, float(h[-1]) if h.size else float("nan"))
            if int(info.status) != MAX_ITER or it == 0:
                break
        status = jnp.where(jnp.equal(info.status, RUNNING), MAX_ITER,
                           info.status)
        out = SolveInfo(status, jnp.asarray(done), info.residual_norm,
                        np.concatenate(hists) if hists else
                        np.asarray(info.history))
        return self.op.plan.unpack(uX), out

    # -- the rest of the solver family on the flagship operator ---------
    # (reference exposes BiCGStab/GMRES/modal only on the slow pipeline,
    # solver/solver.py:840-904, 911-969, 1084-1311; here every solver
    # consumes the same packed operator + packed constraint projection)
    def solve_bicgstab(self, b, x0=None, tol: float = 1e-8,
                       max_iter: int = 1000):
        """BiCGStab in the packed layout; tol is RELATIVE to ||r0||."""
        from ..solvers.bicgstab import bicgstab

        key = ("bicgstab", float(tol), int(max_iter))
        if key not in self._solve:
            def run(op, bX, x0X, pc, _minv):
                return bicgstab(op, pc.project_residual(bX), constraints=pc,
                                x0=x0X, tol=tol, max_iter=max_iter)
            self._solve[key] = jax.jit(run)
        uX, info = self._solve[key](*self._args(b, x0))
        return self.op.plan.unpack(uX), info

    def solve_gmres(self, b, x0=None, tol: float = 1e-8,
                    max_iter: int = 1000, restart: int = 50):
        """Restarted GMRES in the packed layout (left-Jacobi when the
        system was built with a diagonal preconditioner)."""
        from ..solvers.gmres import gmres

        key = ("gmres", float(tol), int(max_iter), int(restart))
        if key not in self._solve:
            def run(op, bX, x0X, pc, minv):
                return gmres(op, pc.project_residual(bX), constraints=pc,
                             M_inv=(minv if not callable(self.M_inv)
                                    and self.M_inv is not None else None),
                             x0=x0X, tol=tol, max_iter=max_iter,
                             restart=restart)
            self._solve[key] = jax.jit(run)
        uX, info = self._solve[key](*self._args(b, x0))
        return self.op.plan.unpack(uX), info

    def mass_packed(self, mass_nodal, clamp: float = 1e-12):
        """Nodal lumped mass [N] or [N, 3] -> packed flat [Nb*384]
        diagonal (padding lanes clamped positive; they carry no modes —
        the constraint mask zeroes them)."""
        Mn = np.asarray(mass_nodal)
        if Mn.ndim == 1:
            Mn = np.repeat(Mn[:, None], 3, axis=1)
        X = self.op.plan.pack_np(Mn.astype(np.dtype(
            jax.dtypes.canonicalize_dtype(self.mask.dtype))))
        return jnp.asarray(np.maximum(X, clamp).reshape(-1))

    def modal(self, mass_nodal, num_eigs: int = 5, **kw):
        """Smallest modes of K phi = lambda M phi through the packed
        operator (inverse subspace iteration; solvers.modal).  Returns
        (eigenvalues [k], modes [N, 3, k], ModalInfo)."""
        from ..solvers.modal import modal_solver

        plan = self.op.plan
        Md = self.mass_packed(mass_nodal)
        nb = plan.meta.n_blocks
        lam, modes, info = modal_solver(
            self.op, Md, (nb, ROW), num_eigs, constraints=self.pc,
            precondition=self.M_inv if not callable(self.M_inv) else None,
            **kw)
        out = jnp.stack([plan.unpack(modes[:, j].reshape(nb, ROW))
                         for j in range(num_eigs)], axis=-1)
        return lam, out, info
