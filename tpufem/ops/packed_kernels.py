"""Pallas TPU kernels for the packed-layout clustered operator (ops.packed).

Design facts measured on v5e (see PERFORMANCE.md and git log):

* `[N, 3]`-minor arrays are lane-padded 42x; every elementwise pass and
  every gathered row moves 512 B per logical row.  The packed layout
  stores ALL hot vectors as dense `[rows, 384]` tiles (lanes =
  component * 128 + node % 128), so passes and row gathers move exactly
  the logical bytes.
* Mosaic's 2-D dynamic gather (`jnp.take_along_axis` along lanes) is
  EXACT (measured bitwise vs numpy) and runs ~32 lanes/cycle — the
  in-VMEM mechanism for the expand, the in-cluster compress (transposed
  per-slot incidence lists, see `compress_gather`) and the cross-cluster
  combine.  No MXU anywhere in the operator, hence no MXU precision
  concerns in any dtype.

Pipeline (see ops.packed for the layout/plan construction):

    X [Nb, 384] --(XLA row-gather of window rows)--> Xw [B, Wn, 384]
    expand_kernel:  slots Uc via masked lane-gather over windows,
                    then element lanes ue [B, 3, Rp] via slot lane-gather
    (partial-assembly compute in XLA, ops.packed.pa_apply_planar)
    compress_gather: Fe [B, 3, Rp] -> Yc [B, 384] (per-slot incidence
                    lane-gathers; incidence bytes packed 4-per-int32)
    Yc --(XLA row-gather of cluster windows)--> Ycw [Nb, Wc, 384]
    combine_kernel: masked lane-gather + fixed-order sum -> F [Nb, 384]

Everything is deterministic: fixed window order, fixed gather/sum
order, no atomics.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _x32_call(f, *args):
    """Invoke a pallas_call under enable_x64(False): with x64 on (the
    mixed-precision refinement's f64 outer loop shares the process), the
    kernel body, BlockSpec index maps, and internal loop carries would
    otherwise trace 64-bit values, which Mosaic rejects ("failed to
    legalize func.return (i32, i64, i64)").  The f64 INTERPRET-mode
    operators (CPU test suite) must keep x64, so the context applies
    only to 32-bit operands."""
    if any(jnp.dtype(getattr(a, "dtype", jnp.int32)).itemsize == 8
           for a in args):
        return f(*args)
    with jax.enable_x64(False):
        return f(*args)


def _lane_gather(src, idx):
    """Exact per-row lane gather: out[r, l] = src[r, idx[r, l]] (2-D only).

    Traced under enable_x64(False) for 32-bit sources: with x64 on (the
    mixed-precision refinement path runs an f64 outer loop in the same
    program), take_along_axis promotes indices to int64, which Mosaic
    rejects; f64 interpret-mode operators keep x64."""
    if jnp.dtype(src.dtype).itemsize == 8:
        return jnp.take_along_axis(src, idx, axis=1)
    with jax.enable_x64(False):
        return jnp.take_along_axis(src, idx, axis=1)


def _fit_tile(tile: int, n_rows: int, row_bytes: int,
              budget: int = 6 << 20) -> int:
    """Largest tile (halving from `tile`) whose double-buffered block fits
    the scoped-VMEM budget — wide-window blocks at 10M elements blew the
    16 MB limit at TILE=64 (combine: Wc=58 -> 119 KB/row)."""
    while tile > 8 and tile * row_bytes > budget:
        tile //= 2
    while n_rows % tile:
        tile //= 2
    return max(tile, 1)


# ---------------------------------------------------------------------------
# expand: X window rows -> element-lane values
# ---------------------------------------------------------------------------

def _expand_kernel(xw_ref, wslot_ref, jslot_ref, lconn_ref, out_ref, *,
                   TB: int, Wn: int, Rp: int):
    """Two-hop expand for TB clusters.

    hop 1 (slots):  Uc[c, s] = X[win[w], c*128 + jslot[s]]  for w == wslot[s]
    hop 2 (lanes):  ue[c, r] = Uc[c, lconn[r]]
    """
    wslot = wslot_ref[:]                       # [TB, 128] window of each slot
    jslot = jslot_ref[:]                       # [TB, 128] lane within window
    uc = [jnp.zeros((TB, 128), out_ref.dtype) for _ in range(3)]
    for w in range(Wn):
        hit = wslot == w                       # ONCE per window, 3 c reuses
        for c in range(3):
            src = xw_ref[:, w, c * 128:(c + 1) * 128]          # [TB, 128]
            g = _lane_gather(src, jslot)
            uc[c] = uc[c] + jnp.where(hit, g, 0.0)
    lconn = lconn_ref[:]                       # [TB, Rp] slot of each lane
    for c in range(3):
        # dynamic_gather sources must fit one vreg (128 lanes): gather the
        # Rp output lanes in 128-wide chunks from the 128-slot source
        chunks = [_lane_gather(uc[c], lconn[:, g * 128:(g + 1) * 128])
                  for g in range(Rp // 128)]
        out_ref[:, c, :] = jnp.concatenate(chunks, axis=1)


def expand(xw, wslot, jslot, lconn, *, tile: int = 64,
           interpret: bool = False):
    """[B, Wn, 384] window rows -> ue [B, 3, Rp] element-lane values.

    wslot/jslot: [B, 128] per-slot source (window index, lane in window);
    empty slots carry wslot = Wn (never matches) so they read 0.
    lconn: [B, Rp] slot of each element lane (pad lanes -> an empty slot).
    """
    B, Wn, _ = xw.shape
    Rp = lconn.shape[1]
    itemsize = jnp.dtype(xw.dtype).itemsize
    TB = _fit_tile(tile, B, (Wn * 384 + 3 * Rp) * itemsize + 640 * 4)
    kern = functools.partial(_expand_kernel, TB=TB, Wn=Wn, Rp=Rp)
    return _x32_call(pl.pallas_call(
        kern,
        grid=(B // TB,),
        in_specs=[
            pl.BlockSpec((TB, Wn, 384), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, Rp), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TB, 3, Rp), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 3, Rp), xw.dtype),
        interpret=interpret,
    ), xw, wslot, jslot, lconn)


# ---------------------------------------------------------------------------
# planar-I/O expand / compress (round 4): the element compute consumes
# [3, k, B, E_c] planes; the round-3 pipeline produced lane-major
# [B, 3, Rp] and paid two full XLA transpose passes per apply
# (_lanes_to_planar / _planar_to_lanes — ~3 GB of HBM traffic at 5.14M
# elements).  These variants write / read the planar layout DIRECTLY:
# inside the kernel a (c, kk) plane is just a 32-lane slice of the
# gathered 128-lane chunk (lane slice + lane concat only — Mosaic has no
# sublane<->lane shape casts, measured by scripts/probe_reshape.py).
# ---------------------------------------------------------------------------

def _expand_planar_kernel(xw_ref, wslot_ref, jslot_ref, lconn_ref, out_ref,
                          *, TB: int, Wn: int, k: int, E_c: int):
    wslot = wslot_ref[:]
    jslot = jslot_ref[:]
    uc = [jnp.zeros((TB, 128), out_ref.dtype) for _ in range(3)]
    for w in range(Wn):
        hit = wslot == w
        for c in range(3):
            src = xw_ref[:, w, c * 128:(c + 1) * 128]
            g = _lane_gather(src, jslot)
            uc[c] = uc[c] + jnp.where(hit, g, 0.0)
    per = 128 // E_c
    Gv = -(-k // per)
    lconn = lconn_ref[:]
    for c in range(3):
        for g in range(Gv):
            ch = _lane_gather(uc[c], lconn[:, g * 128:(g + 1) * 128])
            for i in range(per):
                kk = g * per + i
                if kk >= k:
                    break
                out_ref[c, kk, :, :] = ch[:, i * E_c:(i + 1) * E_c]


def expand_planar(xw, wslot, jslot, lconn, k, E_c, *, tile: int = 64,
                  interpret: bool = False):
    """[B, Wn, 384] window rows -> planar ue [3, k, B, E_c].

    Same two-hop gather as `expand`, but the output is written directly in
    the element-compute layout (no XLA transpose pass needed)."""
    B, Wn, _ = xw.shape
    Rp = lconn.shape[1]
    assert 128 % E_c == 0
    itemsize = jnp.dtype(xw.dtype).itemsize
    TB = _fit_tile(tile, B, (Wn * 384 + 3 * (k + 2) * E_c) * itemsize
                   + (256 + Rp) * 4)
    kern = functools.partial(_expand_planar_kernel, TB=TB, Wn=Wn, k=k,
                             E_c=E_c)
    return _x32_call(pl.pallas_call(
        kern,
        grid=(B // TB,),
        in_specs=[
            pl.BlockSpec((TB, Wn, 384), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, Rp), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((3, k, TB, E_c), lambda i: (0, 0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((3, k, B, E_c), xw.dtype),
        interpret=interpret,
    ), xw, wslot, jslot, lconn)


def _compress_planar_kernel(fe_ref, cinc_ref, out_ref, *, TB: int, k: int,
                            E_c: int, v_widths: tuple):
    per = 128 // E_c
    cinc = cinc_ref[:]
    acc = [jnp.zeros((TB, 128), out_ref.dtype) for _ in range(3)]
    zero = jnp.zeros((TB, E_c), out_ref.dtype)
    off = 0
    for g, vg in enumerate(v_widths):
        if vg == 0:
            off += vg
            continue
        src = []
        for c in range(3):
            parts = [fe_ref[c, g * per + i, :, :] if g * per + i < k else zero
                     for i in range(per)]
            src.append(jnp.concatenate(parts, axis=1))
        for v in range(vg):
            vi = off + v
            byte = jax.lax.shift_right_logical(
                cinc[:, vi // 4, :], jnp.int32(8 * (vi % 4))) & 0xFF
            valid = byte > 0
            idx = jnp.maximum(byte - 1, 0)
            for c in range(3):
                gth = _lane_gather(src[c], idx)
                acc[c] = acc[c] + jnp.where(valid, gth, 0.0)
        off += vg
    for c in range(3):
        out_ref[:, c * 128:(c + 1) * 128] = acc[c]


def compress_planar(fe3, cinc, v_widths, *, tile: int = 64,
                    interpret: bool = False):
    """Planar Fe [3, k, B, E_c] -> Yc [B, 384] via incidence gathers.

    Same summation order as compress_gather (bitwise-equal results); reads
    the element-compute layout directly, so no transpose pass."""
    _, k, B, E_c = fe3.shape
    assert 128 % E_c == 0
    itemsize = jnp.dtype(fe3.dtype).itemsize
    TB = _fit_tile(tile, B, (3 * (k + 4) * E_c + 384) * itemsize
                   + cinc.shape[1] * 128 * 4)
    kern = functools.partial(_compress_planar_kernel, TB=TB, k=k, E_c=E_c,
                             v_widths=tuple(v_widths))
    Vsum = cinc.shape[1]
    return _x32_call(pl.pallas_call(
        kern,
        grid=(B // TB,),
        in_specs=[
            pl.BlockSpec((3, k, TB, E_c), lambda i: (0, 0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, Vsum, 128), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TB, 384), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 384), fe3.dtype),
        interpret=interpret,
    ), fe3, cinc)


# ---------------------------------------------------------------------------
# compress: per-slot incidence lane-gathers (no one-hot, no MXU)
# ---------------------------------------------------------------------------

def _compress_gather_kernel(fe_ref, cinc_ref, out_ref, *, TB: int,
                            v_widths: tuple):
    """Yc[c, s] = sum_v Fe[c, g*128 + lane(off_g + v, s)] over incidence.

    cinc holds, for every slot s and each 128-lane chunk g of the element
    lanes, the lane positions (within chunk g) that scatter into s — a
    transposed incidence list, byte-packed 4 entries per int32 word
    (byte value = lane + 1; 0 = unused; entry v lives in byte v % 4 of
    word v // 4).  Replaces the one-hot MXU contraction: the
    iota/compare/convert build of the [Rp, 128] one-hot was the measured
    bottleneck of the whole SpMV (0.45 of 1.27 ms at 83k elements), while
    max real in-cluster valence is ~18 — the gather does only
    sum(v_widths) masked 128-lane gathers per cluster, and the byte
    packing cuts the incidence table and its stream 4x (ADVICE r2).
    Exact in every dtype (pure adds, fixed v order), deterministic.
    """
    cinc = cinc_ref[:]                          # [TB, ceil(Vsum/4), 128] i32
    acc = [jnp.zeros((TB, 128), out_ref.dtype) for _ in range(3)]
    off = 0
    for g, vg in enumerate(v_widths):
        src = [fe_ref[:, c, g * 128:(g + 1) * 128] for c in range(3)]
        for v in range(vg):
            vi = off + v
            # unpack ONCE per incidence entry, reuse for all 3 components
            # (the stage is VPU-op bound, not gather bound)
            byte = jax.lax.shift_right_logical(
                cinc[:, vi // 4, :], jnp.int32(8 * (vi % 4))) & 0xFF
            valid = byte > 0
            idx = jnp.maximum(byte - 1, 0)
            for c in range(3):
                gth = _lane_gather(src[c], idx)
                acc[c] = acc[c] + jnp.where(valid, gth, 0.0)
        off += vg
    for c in range(3):
        out_ref[:, c * 128:(c + 1) * 128] = acc[c]


def compress_gather(fe, cinc, v_widths, *, tile: int = 64,
                    interpret: bool = False):
    """Fe [B, 3, Rp] -> Yc [B, 384] via per-slot incidence gathers.

    cinc: [B, ceil(sum(v_widths)/4), 128] int32, byte-packed lane+1
    entries (0 = unused; see PackedPlan.build);
    v_widths: static per-128-lane-chunk list widths for THIS bucket of
    clusters (ops.packed keeps one incidence table per window bucket so
    low-valence buckets pay only their own widths).
    """
    B, _, Rp = fe.shape
    itemsize = jnp.dtype(fe.dtype).itemsize
    TB = _fit_tile(tile, B, (3 * Rp + 384) * itemsize
                   + cinc.shape[1] * 128 * 4)
    kern = functools.partial(_compress_gather_kernel, TB=TB,
                             v_widths=tuple(v_widths))
    Vsum = cinc.shape[1]
    return _x32_call(pl.pallas_call(
        kern,
        grid=(B // TB,),
        in_specs=[
            pl.BlockSpec((TB, 3, Rp), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, Vsum, 128), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TB, 384), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 384), fe.dtype),
        interpret=interpret,
    ), fe, cinc)


# ---------------------------------------------------------------------------
# combine: cluster-slot sums -> node rows (cross-cluster reduction)
# ---------------------------------------------------------------------------

def _combine_kernel(ycw_ref, slotidx_ref, out_ref, *, TJ: int, Wc: int):
    """F[c, l] = sum_w Ycw[w][c, slot(l)] over the block's cluster window.

    slotidx is byte-packed 4 windows per int32 word (byte value =
    slot + 1, 0 = node absent from that cluster): slot ids are < 128 so
    a byte holds them, and the packing cuts the biggest plan table and
    its per-apply stream 4x (same scheme as the compress incidence).
    """
    sp = slotidx_ref[:]                         # [TJ, ceil(Wc/4), 128] i32
    acc = [jnp.zeros((TJ, 128), out_ref.dtype) for _ in range(3)]
    for w in range(Wc):
        byte = jax.lax.shift_right_logical(
            sp[:, w // 4, :], jnp.int32(8 * (w % 4))) & 0xFF
        valid = byte > 0
        idx = jnp.maximum(byte - 1, 0)
        for c in range(3):
            src = ycw_ref[:, w, c * 128:(c + 1) * 128]
            g = _lane_gather(src, idx)
            acc[c] = acc[c] + jnp.where(valid, g, 0.0)
    for c in range(3):
        out_ref[:, c * 128:(c + 1) * 128] = acc[c]


def combine(ycw, slotidx, wc=None, *, tile: int = 64,
            interpret: bool = False):
    """Ycw [Nb, Wc, 384] gathered cluster rows + byte-packed slotidx
    [Nb, ceil(Wc/4), 128] int32 (byte = slot of each node in that
    cluster + 1; 0 = absent) -> F [Nb, 384].

    wc: number of windows actually present (defaults to Ycw's Wc dim).
    Deterministic: fixed window order per block."""
    Nb, Wc, _ = ycw.shape
    if wc is None:
        wc = Wc
    Wp = slotidx.shape[1]
    # a mismatched call site would make the kernel read slotidx words out
    # of the block bounds silently in compiled mode (ADVICE r3)
    assert wc <= min(4 * Wp, Wc), (wc, Wp, Wc)
    itemsize = jnp.dtype(ycw.dtype).itemsize
    TJ = _fit_tile(tile, Nb, Wc * 384 * itemsize + Wp * 128 * 4
                   + 384 * itemsize)
    kern = functools.partial(_combine_kernel, TJ=TJ, Wc=int(wc))
    return _x32_call(pl.pallas_call(
        kern,
        grid=(Nb // TJ,),
        in_specs=[
            pl.BlockSpec((TJ, Wc, 384), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TJ, Wp, 128), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TJ, 384), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Nb, 384), ycw.dtype),
        interpret=interpret,
    ), ycw, slotidx)
