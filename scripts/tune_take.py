"""Microbench: jnp.take row-gather cost vs table rows and row width."""
from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from tpufem.utils.profiling import timed

    rng = np.random.default_rng(0)

    def slope(make, *args, lo=5, hi=45):
        t1 = timed(make(lo), *args)
        t2 = timed(make(hi), *args)
        return max((t2 - t1) / (hi - lo), 1e-12)

    n_idx = 360_000
    for rows in [20_000, 120_000, 340_000]:
        for width in [3, 8, 24, 128]:
            tab = jnp.asarray(rng.standard_normal((rows, width)), jnp.float32)
            idx = jnp.asarray(rng.integers(0, rows, n_idx), jnp.int32)

            def make(iters):
                @jax.jit
                def f(t, ix):
                    def body(i, carry):
                        t2, s = carry
                        g = jnp.take(t2, ix, axis=0)
                        return (t2 + 1e-30 * s, s + jnp.sum(g[:, 0]))
                    _, s = jax.lax.fori_loop(0, iters, body,
                                             (t, jnp.float32(0.0)))
                    return s
                return f
            t = slope(make, tab, idx)
            mb = rows * width * 4 / 1e6
            print(f"table {rows:>7}x{width:<3} ({mb:7.1f} MB): "
                  f"{t*1e3:7.3f} ms  {t/n_idx*1e9:6.2f} ns/row  "
                  f"{n_idx*width*4/t/1e9:7.1f} GB/s")


if __name__ == "__main__":
    main()
