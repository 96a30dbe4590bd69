"""Per-row DMA vs XLA row-gather for the combine's Ycw stream.

VERDICT r4 item 2: the stage split at 5.14M names the combine's Ycw
gather (~1.5M [384-lane] row reads per apply) as the next lever, and
the repo flagged in-kernel row DMA with an initiation-rate risk.  This
measures that risk directly:

  a) XLA `jnp.take` row gather (the production path): rows/s.
  b) A Pallas kernel that DMAs each indexed row from HBM (scalar-
     prefetch indices, one `pl.load` per row) and accumulates: rows/s.

If (b) is not clearly faster than (a), in-kernel row DMA cannot beat
the materialized gather (it saves the 2x HBM round trip of Ycw but
pays per-row initiation), and the combine stays gather-formulated.

Usage: python scripts/probe_rowdma.py [n_src_rows] [n_reads]
"""
from __future__ import annotations

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROW = 384


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n_src = int(sys.argv[1]) if len(sys.argv) > 1 else 198208   # B at 5.14M
    n_rd = int(sys.argv[2]) if len(sys.argv) > 2 else 1 << 20   # ~1M reads
    rng = np.random.default_rng(0)
    src = jnp.asarray(rng.standard_normal((n_src, ROW)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, n_src, n_rd).astype(np.int32))

    def timeit(f, *args, reps=5):
        float(f(*args))
        best = []
        for _ in range(reps):
            t0 = time.perf_counter()
            float(f(*args))
            best.append(time.perf_counter() - t0)
        return min(best)

    # (a) XLA row gather + cheap reduce, two loop lengths for the slope
    def mk_take(iters):
        @jax.jit
        def f(s, ix):
            def body(i, acc):
                # loop-dependent indices so XLA cannot hoist the gather
                return acc + jnp.sum(s[(ix + i) % s.shape[0]],
                                     dtype=jnp.float32)
            return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))
        return f

    t_lo = timeit(mk_take(2), src, idx)
    t_hi = timeit(mk_take(22), src, idx)
    t_take = max((t_hi - t_lo) / 20, 1e-9)
    print(f"XLA take: {t_take * 1e3:.2f} ms / {n_rd} rows = "
          f"{n_rd / t_take / 1e6:.1f} M rows/s "
          f"({n_rd * ROW * 4 / t_take / 1e9:.0f} GB/s)", flush=True)

    # (b) Pallas per-row DMA, K-deep pipelined async copies from the
    # full HBM-resident src, indices scalar-prefetched in SMEM.
    TR, K = 128, 8

    def kern(idx_ref, src_ref, out_ref, scratch, sems):
        base = pl.program_id(0) * TR

        def start(r):
            pltpu.make_async_copy(
                src_ref.at[pl.ds(idx_ref[base + r], 1)],
                scratch.at[r % K], sems.at[r % K]).start()
        for r in range(K):
            start(r)
        acc = jnp.zeros((1, ROW), jnp.float32)
        for r in range(TR):
            pltpu.make_async_copy(
                src_ref.at[pl.ds(idx_ref[base + r], 1)],
                scratch.at[r % K], sems.at[r % K]).wait()
            acc = acc + scratch[r % K]
            if r + K < TR:
                start(r + K)
        out_ref[...] = acc

    grid = n_rd // TR

    @jax.jit
    def f_dma(s, ix):
        out = pl.pallas_call(
            kern,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(grid,),
                in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
                out_specs=pl.BlockSpec((None, 1, ROW),
                                       lambda i, ix_ref: (i, 0, 0)),
                scratch_shapes=[pltpu.VMEM((K, 1, ROW), jnp.float32),
                                pltpu.SemaphoreType.DMA((K,))],
            ),
            out_shape=jax.ShapeDtypeStruct((grid, 1, ROW), jnp.float32),
        )(ix, s)
        return jnp.sum(out[:, 0, 0])

    try:
        t_dma = timeit(f_dma, src, idx, reps=3)
        print(f"Pallas row-DMA (K={K} in flight): {t_dma * 1e3:.2f} ms = "
              f"{n_rd / t_dma / 1e6:.1f} M rows/s "
              f"({n_rd * ROW * 4 / t_dma / 1e9:.0f} GB/s)", flush=True)
    except Exception as e:
        print(f"Pallas row-DMA failed: {type(e).__name__}: "
              f"{str(e)[:400]}", flush=True)


if __name__ == "__main__":
    main()
