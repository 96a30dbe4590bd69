"""Diagnose the BENCH_r02 timing collapse on the real chip.

Times the packed operator's SpMV loop at several iteration counts and
prints raw wall times, to see whether time scales with loop length.
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp

import tpufem  # noqa: F401
from tpufem.ops.packed import PackedPartialOperator
from tpufem.utils import meshgen

n = 24
coords, conn = meshgen.box_tet10(n, n, n)
N, (M, k) = coords.shape[0], conn.shape
d = 3 * k
coords_j = jnp.asarray(coords, jnp.float32)

op = PackedPartialOperator.build(coords_j, conn, "c3d10", 200e9, 0.3, n_nodes=N)
u0 = np.random.default_rng(0).standard_normal((N, 3)).astype(np.float32)
X0 = jnp.asarray(op.plan.pack_np(u0))

# correctness probe: apply should depend on input
y1 = np.asarray(op(X0))
y2 = np.asarray(op(2.0 * X0))
print("apply nonzero:", float(np.abs(y1).max()), "linear 2x:",
      float(np.abs(y2 - 2 * y1).max() / max(np.abs(y2).max(), 1e-30)))


def make(iters):
    @jax.jit
    def f(opx, u):
        def body(i, v):
            return opx(v) * (1.0 / jnp.float32(d))
        return jnp.sum(jax.lax.fori_loop(0, iters, body, u))
    return f


for iters in (5, 45, 100):
    f = make(iters)
    float(f(op, X0))  # compile
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        v = float(f(op, X0))
        ts.append(time.perf_counter() - t0)
    print(f"iters={iters:4d} value={v:.4e} times={[f'{t*1e3:.1f}' for t in ts]} ms")
