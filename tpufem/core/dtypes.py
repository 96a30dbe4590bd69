"""Precision policy for TPU-native FEM.

The reference (solver/element.py:6) defaults element kernels to float32 and
solvers (solver/solver.py:11) to float64.  On TPU, float64 is emulated and
slow, so the policy here is:

* ``storage`` dtype: element stiffness / mass / coordinates (default f32)
* ``solve`` dtype: Krylov vectors (default f32 on TPU, f64 on CPU tests)
* ``scalar`` dtype: dot-product accumulators / CG recurrences (f64 when x64
  is enabled, else f32 with compensated summation available in ops.operator)

Use :func:`enable_x64` in host-side test/driver code; never inside jit.
"""
from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

Array = Any  # jax Array


@dataclasses.dataclass(frozen=True)
class Precision:
    """Bundle of dtypes threaded through kernels and solvers."""

    storage: Any = jnp.float32
    solve: Any = jnp.float32
    scalar: Any = jnp.float32

    @staticmethod
    def tpu_default() -> "Precision":
        return Precision(jnp.float32, jnp.float32, jnp.float32)

    @staticmethod
    def highest() -> "Precision":
        """f64 everywhere — requires jax_enable_x64 (CPU validation runs)."""
        return Precision(jnp.float64, jnp.float64, jnp.float64)


def enable_x64() -> None:
    jax.config.update("jax_enable_x64", True)


def default_precision() -> Precision:
    """f64 when x64 is on (CPU/validation), else TPU f32."""
    if jax.config.jax_enable_x64:
        return Precision.highest()
    return Precision.tpu_default()
