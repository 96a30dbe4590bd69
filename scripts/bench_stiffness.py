"""Fused Pallas stiffness kernel vs the einsum B^T D B pipeline.

Usage: python scripts/bench_stiffness.py [n] [etype]
Validates stiffness_fused against solid.stiffness on the real chip and
times both via the guarded loop-length slope (tunnel-safe).
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from tpufem.elements import solid
    from tpufem.ops.stiffness_kernels import stiffness_fused
    from tpufem.utils import meshgen

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 24
    etype = sys.argv[2] if len(sys.argv) > 2 else "c3d10"
    mesh = {"c3d10": meshgen.box_tet10, "c3d4": meshgen.box_tet,
            "c3d8": meshgen.box_hex}[etype]
    coords, conn = mesh(n, n, n)
    M = conn.shape[0]
    c = coords.copy()
    c[:, 0] += 0.04 * np.sin(2.0 * c[:, 1]) * c[:, 2]
    cj = jnp.asarray(c, jnp.float32)
    nj = jnp.asarray(conn)
    print(f"{etype}: {M} elements", flush=True)

    K_f = np.asarray(jax.jit(
        lambda cc: stiffness_fused(cc, conn, etype, 200e9, 0.3))(cj))
    K_r = np.asarray(jax.jit(
        lambda cc: solid.stiffness(cc, nj, etype, 200e9, 0.3))(cj))
    err = np.abs(K_f - K_r).max() / np.abs(K_r).max()
    print(f"max rel err fused vs einsum: {err:.2e}", flush=True)
    assert err < 5e-5, err          # f32 (einsum runs 3-pass bf16 MXU)

    def mk(fn, reps):
        @jax.jit
        def f(cc):
            def body(i, acc):
                K = fn(cc * (1.0 + 1e-7 * i))
                return acc + jnp.sum(K[:, 0, 0])
            return jax.lax.fori_loop(0, reps, body, jnp.float32(0.0))
        return f

    def slope(fn, lo=1, hi=5):
        f1, f2 = mk(fn, lo), mk(fn, hi)
        float(f1(cj))
        float(f2(cj))
        ts = []
        for f in (f1, f2):
            best = []
            for _ in range(4):
                t0 = time.perf_counter()
                float(f(cj))
                best.append(time.perf_counter() - t0)
            ts.append(min(best))
        return max((ts[1] - ts[0]) / (hi - lo), 1e-9)

    t_f = slope(lambda cc: stiffness_fused(cc, conn, etype, 200e9, 0.3))
    t_r = slope(lambda cc: solid.stiffness(cc, nj, etype, 200e9, 0.3))
    print(f"fused  {t_f * 1e3:8.2f} ms  {M / t_f / 1e6:6.1f} M elem/s",
          flush=True)
    print(f"einsum {t_r * 1e3:8.2f} ms  {M / t_r / 1e6:6.1f} M elem/s",
          flush=True)
    print(f"speedup {t_r / t_f:.2f}x", flush=True)


if __name__ == "__main__":
    main()
