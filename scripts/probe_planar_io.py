"""Probe: can a Pallas TPU kernel write [TB, 128] lane chunks as
[3, k, TB, E_c] planar slices (E_c = 32 minor) and read them back?

If yes, the expand kernel can emit the planar element layout directly and
the compress kernel can consume it — removing both 10 MB XLA transposes
from the packed SpMV (measured ~0.1 ms of the 0.47 ms yc stage at 83k).
"""
import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _write_kernel(x_ref, out_ref, *, TB, k, E_c):
    # x [TB, 3, Rp] lane layout -> out [3, k, TB, E_c]
    G = 128 // E_c
    for c in range(3):
        for g in range(-(-(k * E_c) // 128)):
            chunk = x_ref[:, c, g * 128:(g + 1) * 128]
            for j in range(G):
                kk = g * G + j
                if kk >= k:
                    break
                out_ref[c, kk, :, :] = chunk[:, j * E_c:(j + 1) * E_c]


def _read_kernel(p_ref, out_ref, *, TB, k, E_c):
    # planar [3, k, TB, E_c] -> lanes [TB, 3, Rp]
    G = 128 // E_c
    Rp = out_ref.shape[2]
    for c in range(3):
        for g in range(Rp // 128):
            parts = []
            for j in range(G):
                kk = g * G + j
                parts.append(p_ref[c, kk, :, :] if kk < k else
                             jnp.zeros((TB, E_c), out_ref.dtype))
            out_ref[:, c, g * 128:(g + 1) * 128] = jnp.concatenate(
                parts, axis=1)


def main():
    interpret = jax.default_backend() != "tpu"
    TB, k, E_c = 8, 10, 32
    Rp = -(-k * E_c // 128) * 128
    B = 2688
    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        (B, 3, Rp)).astype(np.float32))

    wk = functools.partial(_write_kernel, TB=TB, k=k, E_c=E_c)
    planar = pl.pallas_call(
        wk, grid=(B // TB,),
        in_specs=[pl.BlockSpec((TB, 3, Rp), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((3, k, TB, E_c), lambda i: (0, 0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((3, k, B, E_c), x.dtype),
        interpret=interpret)(x)
    ref = jnp.transpose(x[:, :, :k * E_c].reshape(B, 3, k, E_c),
                        (1, 2, 0, 3))
    err = float(jnp.abs(planar - ref).max())
    print("write planar err:", err)

    rk = functools.partial(_read_kernel, TB=TB, k=k, E_c=E_c)
    back = pl.pallas_call(
        rk, grid=(B // TB,),
        in_specs=[pl.BlockSpec((3, k, TB, E_c), lambda i: (0, 0, i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((TB, 3, Rp), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 3, Rp), x.dtype),
        interpret=interpret)(planar)
    x_masked = x.at[:, :, k * E_c:].set(0.0)
    err2 = float(jnp.abs(back - x_masked).max())
    print("read planar err:", err2)

    if not interpret:
        @jax.jit
        def loop(x, iters):
            def body(i, v):
                p = pl.pallas_call(
                    wk, grid=(B // TB,),
                    in_specs=[pl.BlockSpec((TB, 3, Rp), lambda i: (i, 0, 0),
                                           memory_space=pltpu.VMEM)],
                    out_specs=pl.BlockSpec((3, k, TB, E_c),
                                           lambda i: (0, 0, i, 0),
                                           memory_space=pltpu.VMEM),
                    out_shape=jax.ShapeDtypeStruct((3, k, B, E_c), x.dtype),
                )(v)
                return pl.pallas_call(
                    rk, grid=(B // TB,),
                    in_specs=[pl.BlockSpec((3, k, TB, E_c),
                                           lambda i: (0, 0, i, 0),
                                           memory_space=pltpu.VMEM)],
                    out_specs=pl.BlockSpec((TB, 3, Rp), lambda i: (i, 0, 0),
                                           memory_space=pltpu.VMEM),
                    out_shape=jax.ShapeDtypeStruct((B, 3, Rp), x.dtype),
                )(p) * 0.5 + v * 0.5
            return jnp.sum(jax.lax.fori_loop(0, iters, body, x))

        for iters in (5, 45):
            float(loop(x, iters))
            ts = []
            for _ in range(3):
                t0 = time.perf_counter()
                float(loop(x, iters))
                ts.append(time.perf_counter() - t0)
            print(f"iters={iters}: {min(ts) * 1e3:.1f} ms")

    assert err == 0.0 and err2 == 0.0


if __name__ == "__main__":
    main()
