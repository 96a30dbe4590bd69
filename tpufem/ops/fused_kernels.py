"""Fused expand+compute+compress Pallas kernel for the packed operator.

Round 3 measured the packed SpMV's cluster stage as three separate passes
(ops.packed_kernels.expand -> XLA planar transpose -> pa_apply_planar ->
XLA transpose -> ops.packed_kernels.compress_gather), which at 5.14M
elements moves the ue / Fe intermediates (~740 MB each) through HBM twice
plus two full transpose passes.  This kernel performs the whole cluster
stage in one VMEM-resident pass per TB-cluster block:

    Xw [TB, Wn, 384]  --hop1 masked window lane-gathers-->  uc[c] [TB, 128]
    uc --hop2 lconn lane-gather--> element planes ue[c][kk] [TB, E_c]
    partial-assembly action on planes (pure VPU, no MXU)
    Fe planes --per-slot incidence lane-gathers--> Yc [TB, 384]

Two element-compute layouts, selected by `mode` (measured on v5e by
scripts/probe_fused.py):

* "narrow": planes stay [TB, E_c].  With E_c = 32 every VPU op wastes 3/4
  of the 128-lane vreg (issue cost is per 8-sublane row, independent of
  lane width), but there are no relayouts.
* "dense": planes are relaid to [TB*E_c//128, 128] so every VPU op runs
  at full lane width.  Mosaic has no sublane<->lane shape casts
  (tpu.reshape [64,32]->[16,128] fails, scripts/probe_reshape.py), but
  STRIDED sublane reads/writes on VMEM scratch refs compile and are
  exact — the relayout is a scratch round trip: write the [TB, 128]
  chunk, read back 4 strided [TB/4, 32] pieces, lane-concat.  Since the
  element compute is purely elementwise, any self-consistent bijection
  works; the same strided map is inverted for the outputs.

Same math and same per-slot summation order as the staged pipeline
(pa_apply_planar + compress_gather) — deterministic, exact in every
dtype, no MXU.  Replaces the hot path of reference compute_nodal_forces
(solver/element.py:429-464).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .packed_kernels import _fit_tile, _lane_gather, _x32_call


def _pa_planes(ue, Ji, Wq, dN, lam, mu):
    """Partial-assembly action on per-(component, node) planes.

    Args:
      ue: nested list [3][k] of 2-D planes (element nodal values).
      Ji: nested list [qJ][3][3] of planes (J^-1 entries).
      Wq: list [q] of planes (w * detJ).
      dN: host numpy [q, k, 3] reference gradients.
    Returns:
      nested list [3][k] of planes (element nodal forces; None = zero).

    Identical operation order to ops.packed.pa_apply_planar (same unrolls,
    same zero-weight skipping) so results match the staged pipeline.
    """
    dN = np.asarray(dN)
    q, k, _ = dN.shape
    qJ = len(Ji)
    Fe = [[None] * k for _ in range(3)]
    for qi in range(q):
        J = Ji[min(qi, qJ - 1)]
        Hhat = [[None] * 3 for _ in range(3)]
        for a in range(3):
            for c in range(3):
                acc = None
                for kk in range(k):
                    wgt = float(dN[qi, kk, a])
                    if wgt == 0.0:
                        continue
                    term = wgt * ue[c][kk]
                    acc = term if acc is None else acc + term
                Hhat[a][c] = acc if acc is not None else 0.0
        H = [[sum(J[i][j] * Hhat[j][c] for j in range(3)) for c in range(3)]
             for i in range(3)]
        tr = H[0][0] + H[1][1] + H[2][2]
        sig = [[mu * (H[i][c] + H[c][i]) for c in range(3)] for i in range(3)]
        for i in range(3):
            sig[i][i] = sig[i][i] + lam * tr
        Wp = Wq[qi]
        T = [[Wp * sum(J[i][j] * sig[i][c] for i in range(3))
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
    return Fe


def _fused_kernel(xw_ref, wslot_ref, jslot_ref, lconn_ref, cinc_ref,
                  jinv_ref, w_ref, out_ref, sA_ref, sB_ref, *, TB, Wn, Rp,
                  k, E_c, q, qJ, v_widths, lam, mu, dN, mode):
    f32 = out_ref.dtype
    per = 128 // E_c                           # kk planes per 128-lane chunk
    Gv = -(-k * E_c // 128)                    # chunks holding valid lanes
    dense = mode == "dense"

    def densify_chunk(chunk):
        """[TB, 128] -> list of `per` [TB//per, 128] planes (strided map).

        Mosaic requires lane offsets of strided REF reads to be 0, so read
        each sublane-strided row group at full lane width and slice the
        lanes as values."""
        sA_ref[:] = chunk
        rows = [sA_ref[j::per, :] for j in range(per)]     # [TB//per, 128]
        out = []
        for i in range(per):
            out.append(jnp.concatenate(
                [r[:, i * E_c:(i + 1) * E_c] for r in rows], axis=1))
        return out

    def densify_plane(p):
        """[TB, E_c] -> [TB//per, 128] via the same strided map."""
        sA_ref[:, :E_c] = p
        return jnp.concatenate(
            [sA_ref[j::per, :][:, :E_c] for j in range(per)], axis=1)

    # hop 1: window rows -> cluster slots
    wslot = wslot_ref[:]
    jslot = jslot_ref[:]
    uc = [jnp.zeros((TB, 128), f32) for _ in range(3)]
    for w in range(Wn):
        hit = wslot == w
        for c in range(3):
            src = xw_ref[:, w, c * 128:(c + 1) * 128]
            g = _lane_gather(src, jslot)
            uc[c] = uc[c] + jnp.where(hit, g, 0.0)

    # hop 2: slots -> element lanes, chunked by 128 (gather vreg limit)
    lconn = lconn_ref[:]
    ue_ch = [[_lane_gather(uc[c], lconn[:, g * 128:(g + 1) * 128])
              for g in range(Gv)] for c in range(3)]

    ue = [[None] * k for _ in range(3)]
    for c in range(3):
        for g in range(Gv):
            planes = (densify_chunk(ue_ch[c][g]) if dense else
                      [ue_ch[c][g][:, i * E_c:(i + 1) * E_c]
                       for i in range(per)])
            for i in range(per):
                kk = g * per + i
                if kk < k:
                    ue[c][kk] = planes[i]

    def geom(idx):
        p = jinv_ref[:, idx, :]
        return densify_plane(p) if dense else p

    Ji = [[[geom(qj * 9 + 3 * i + j) for j in range(3)] for i in range(3)]
          for qj in range(qJ)]
    if dense:
        Wq = [densify_plane(w_ref[:, qi, :]) for qi in range(q)]
    else:
        Wq = [w_ref[:, qi, :] for qi in range(q)]

    Fe = _pa_planes(ue, Ji, Wq, dN, lam, mu)

    # compress: per-slot incidence lane-gathers (packed_kernels order)
    cinc = cinc_ref[:]
    acc = [jnp.zeros((TB, 128), f32) for _ in range(3)]
    zero_n = jnp.zeros((TB, E_c), f32)
    zero_d = jnp.zeros((TB // per, 128), f32)
    off = 0
    for g, vg in enumerate(v_widths):
        if g >= Gv or vg == 0:
            off += vg
            continue
        src = []
        for c in range(3):
            if dense:
                # inverse strided map: planes -> [TB, 128] chunk via sB.
                # Strided ref WRITES must also start at lane 0: build each
                # sublane row group at full lane width, one write per j.
                planes = []
                for i in range(per):
                    kk = g * per + i
                    planes.append(Fe[c][kk] if (kk < k and
                                                Fe[c][kk] is not None)
                                  else zero_d)
                for j in range(per):
                    row = jnp.concatenate(
                        [p[:, j * E_c:(j + 1) * E_c] for p in planes],
                        axis=1)
                    sB_ref[j::per, :] = row
                src.append(sB_ref[:])
            else:
                parts = []
                for i in range(per):
                    kk = g * per + i
                    p = Fe[c][kk] if (kk < k and Fe[c][kk] is not None) \
                        else zero_n
                    parts.append(p)
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


def fused_yc(xw, wslot, jslot, lconn, cinc, jinv, w, dN, lam, mu, v_widths,
             *, k, E_c, mode="dense", tile=64, interpret: bool = False):
    """One-pass cluster stage: window rows -> slot sums Yc [B, 384].

    Args:
      xw:    [B, Wn, 384] gathered window rows (XLA row gather).
      wslot, jslot: [B, 128] per-slot (window, lane) source coordinates.
      lconn: [B, Rp] slot of each element lane.
      cinc:  [B, Wp, 128] int32 byte-packed compress incidence (bucket).
      jinv:  [B, qJ*9, E_c] J^-1 entries (cluster-major geometry).
      w:     [B, q, E_c] w * detJ.
      dN:    host numpy [q, k, 3]; v_widths: static bucket incidence widths.
    """
    B, Wn, _ = xw.shape
    Rp = lconn.shape[1]
    q = w.shape[1]
    qJ = jinv.shape[1] // 9
    Wp = cinc.shape[1]
    assert 128 % E_c == 0, "element lanes must not straddle 128-lane chunks"
    itemsize = jnp.dtype(xw.dtype).itemsize
    # working planes: Mosaic pads [TB, E_c] vregs to full 128-lane width in
    # narrow mode (measured: scoped-vmem OOM at TB=64, ~134 KB/row actual),
    # and the unrolled pa chain keeps ~2x the nominal plane count live —
    # count planes at 128 lanes with a 2x liveness factor; dense mode packs
    # planes at TB*E_c/128 sublanes so its footprint is the nominal bytes.
    plane_w = E_c if mode == "dense" else 128
    row_bytes = ((Wn * 384 + 384) * itemsize            # xw + out
                 + (qJ * 9 + q) * E_c * itemsize        # geometry
                 + (256 + Rp + Wp * 128) * 4            # int tables
                 + 2 * (6 * k + 30) * plane_w * itemsize)
    TB = _fit_tile(tile, B, row_bytes)
    while TB > 8 and TB * E_c % 128:
        TB //= 2
    kern = functools.partial(
        _fused_kernel, TB=TB, Wn=Wn, Rp=Rp, k=k, E_c=E_c, q=q, qJ=qJ,
        v_widths=tuple(v_widths), lam=float(lam), mu=float(mu),
        dN=np.asarray(dN), mode=mode)
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
            pl.BlockSpec((TB, Wp, 128), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, jinv.shape[1], E_c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, q, E_c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TB, 384), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 384), xw.dtype),
        scratch_shapes=[pltpu.VMEM((TB, 128), xw.dtype),
                        pltpu.VMEM((TB, 128), xw.dtype)],
        interpret=interpret,
    ), xw, wslot, jslot, lconn, cinc, jinv, w)
