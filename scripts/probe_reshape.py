"""Which [64,32] -> [16,128] (row-major) relayouts does Mosaic accept?

Each candidate builds the row-major reshape of a [64,32] block inside a
Pallas kernel; checked against numpy. Run on the real chip.
"""
import functools
import sys
import os
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def cand_reshape(x):
    return x.reshape(16, 128)


def cand_slice_strided(x):
    parts = [jax.lax.slice(x, (i, 0), (64 - ((3 - i) % 4), 32), (4, 1))
             for i in range(4)]
    return jnp.concatenate(parts, axis=1)


def cand_reshape3(x):
    x3 = x.reshape(16, 4, 32)
    return jnp.concatenate([x3[:, i, :] for i in range(4)], axis=1)


def cand_getitem_strided(x):
    return jnp.concatenate([x[i::4, :] for i in range(4)], axis=1)


def make_kernel(fn):
    def kernel(x_ref, o_ref):
        o_ref[:] = fn(x_ref[:])
    return kernel


def cand_scratch(x):  # placeholder; handled specially below
    raise NotImplementedError


def scratch_kernel(x_ref, o_ref, s_ref):
    s_ref[:] = x_ref[:]
    parts = [s_ref[i::4, :] for i in range(4)]
    o_ref[:] = jnp.concatenate(parts, axis=1)


def main():
    x = np.arange(64 * 32, dtype=np.float32).reshape(64, 32)
    want = x.reshape(16, 128)
    for name, fn in [("reshape", cand_reshape),
                     ("slice_strided", cand_slice_strided),
                     ("reshape3", cand_reshape3),
                     ("getitem_strided", cand_getitem_strided)]:
        try:
            out = pl.pallas_call(
                make_kernel(fn),
                out_shape=jax.ShapeDtypeStruct((16, 128), jnp.float32),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )(jnp.asarray(x))
            ok = np.array_equal(np.asarray(out), want)
            print(f"{name:18s} compiled, correct={ok}", flush=True)
        except Exception as e:
            print(f"{name:18s} FAILED: {str(e).splitlines()[0][:110]}",
                  flush=True)
    try:
        out = pl.pallas_call(
            scratch_kernel,
            out_shape=jax.ShapeDtypeStruct((16, 128), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((64, 32), jnp.float32)],
        )(jnp.asarray(x))
        ok = np.array_equal(np.asarray(out), want)
        print(f"{'scratch_strided':18s} compiled, correct={ok}", flush=True)
    except Exception as e:
        print(f"{'scratch_strided':18s} FAILED: {str(e).splitlines()[0][:110]}",
              flush=True)

    # inverse direction: [16,128] -> [64,32]
    def inv_getitem(kernel_in):
        pass

    def inv_kernel(x_ref, o_ref):
        x = x_ref[:]
        parts = [x[:, 32 * i:32 * (i + 1)] for i in range(4)]   # [16,32] x4
        st = jnp.stack(parts, axis=1)                            # [16,4,32]
        o_ref[:] = st.reshape(64, 32)

    try:
        out = pl.pallas_call(
            inv_kernel,
            out_shape=jax.ShapeDtypeStruct((64, 32), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(jnp.asarray(want))
        ok = np.array_equal(np.asarray(out), x)
        print(f"{'inv_stack_reshape':18s} compiled, correct={ok}", flush=True)
    except Exception as e:
        print(f"{'inv_stack_reshape':18s} FAILED: "
              f"{str(e).splitlines()[0][:110]}", flush=True)

    def inv_scratch_kernel(x_ref, o_ref, s_ref):
        x = x_ref[:]
        for i in range(4):
            s_ref[i::4, :] = x[:, 32 * i:32 * (i + 1)]
        o_ref[:] = s_ref[:]

    try:
        out = pl.pallas_call(
            inv_scratch_kernel,
            out_shape=jax.ShapeDtypeStruct((64, 32), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((64, 32), jnp.float32)],
        )(jnp.asarray(want))
        ok = np.array_equal(np.asarray(out), x)
        print(f"{'inv_scratch':18s} compiled, correct={ok}", flush=True)
    except Exception as e:
        print(f"{'inv_scratch':18s} FAILED: {str(e).splitlines()[0][:110]}",
              flush=True)


if __name__ == "__main__":
    main()
