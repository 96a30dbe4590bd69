"""Exact-precision contraction helpers.

On TPU, XLA lowers default-precision f32 `einsum`/`dot` onto the MXU as
single-pass bf16 folds — measured ~1e-2 relative error on the Jacobian
contraction alone (J err 8.6e-3 on an |J|~0.06 box mesh; K err 0.13 of
max; see PERFORMANCE.md).  A FEM framework's operators must be exact to
f32, so every accuracy-bearing contraction in tpufem goes through this
module, which defaults to ``Precision.HIGHEST`` (f32-exact multi-pass on
TPU, free on CPU).  Callers can still override per call.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

HI = jax.lax.Precision.HIGHEST


def einsum(*args, **kwargs):
    kwargs.setdefault("precision", HI)
    return jnp.einsum(*args, **kwargs)
