"""Sweep CombinePlan chunk sizes for the cluster combine on the real chip."""
from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    import tpufem
    from tpufem.ops.clustered import ClusterPlan
    from tpufem.ops.scatter import CombinePlan
    from tpufem.utils import meshgen
    from tpufem.utils.profiling import timed

    n = 24
    coords, conn = meshgen.box_tet10(n, n, n)
    N = coords.shape[0]
    conn = np.asarray(conn)
    M, k = conn.shape

    # rebuild the cluster (keys, pos) incidence exactly as ClusterPlan does
    E_c, l_max = 32, 128
    B = -(-M // E_c)
    pad_elems = B * E_c - M
    conn_pad = np.concatenate([conn, np.zeros((pad_elems, k), conn.dtype)],
                              axis=0) if pad_elems else conn
    rows = conn_pad.reshape(B, E_c * k).astype(np.int64)
    order = np.argsort(rows, axis=1, kind="stable")
    srt = np.take_along_axis(rows, order, axis=1)
    is_first = np.ones_like(srt, dtype=bool)
    is_first[:, 1:] = srt[:, 1:] != srt[:, :-1]
    slot_sorted = np.cumsum(is_first, axis=1) - 1
    bidx = np.broadcast_to(np.arange(B)[:, None], srt.shape)
    keys = srt[is_first]
    pos = (bidx * l_max + slot_sorted)[is_first]
    n_rows = B * l_max
    print(f"B={B} n_rows={n_rows} entries={keys.size} "
          f"(dup factor {keys.size/N:.2f})")

    rng = np.random.default_rng(0)
    Yc0 = jnp.asarray(rng.standard_normal((n_rows, 3)), jnp.float32)

    def slope(make, *args, lo=5, hi=45):
        t1 = timed(make(lo), *args)
        t2 = timed(make(hi), *args)
        return max((t2 - t1) / (hi - lo), 1e-12)

    def make(iters):
        @jax.jit
        def f(px, Yc):
            def body(i, v):
                return v + 1e-30 * jnp.sum(px(v))
            return jnp.sum(jax.lax.fori_loop(0, iters, body, Yc))
        return f

    # chunking/packing are driven by the module thresholds (disabled by
    # default after the measured losses — ops/scatter.py cost-model note);
    # temporarily override them per sweep point, as tests/test_operator_cg.py
    # does.
    import tpufem.ops.scatter as scatter_mod

    saved = (scatter_mod._CHUNK_ABOVE_ROWS, scatter_mod._PACK_ABOVE_ROWS,
             scatter_mod._TAKE_FAST_ROWS)
    ref = None
    try:
        for chunk_above in [1 << 62, 170_000, 120_000, 70_000, 33_000]:
            scatter_mod._CHUNK_ABOVE_ROWS = chunk_above
            plan = CombinePlan.build(keys, pos, n_rows, N, row_align=l_max)
            nch = max(1, len(plan.meta.chunk_bounds) - 1)
            out = np.asarray(plan(Yc0))
            if ref is None:
                ref = out
            else:
                assert np.allclose(out, ref, atol=1e-4), "mismatch!"
            t = slope(make, plan, Yc0)
            widths = (plan.meta.class_widths if not plan.meta.chunked
                      else plan.meta.chunk_class_widths)
            print(f"chunk_above={chunk_above:>19} n_chunks={nch:2d} "
                  f"t={t*1e3:6.3f} ms  widths={widths}")
    finally:
        (scatter_mod._CHUNK_ABOVE_ROWS, scatter_mod._PACK_ABOVE_ROWS,
         scatter_mod._TAKE_FAST_ROWS) = saved


if __name__ == "__main__":
    main()
