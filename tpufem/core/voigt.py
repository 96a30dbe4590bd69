"""Voigt vector <-> tensor conversion and invariants (jnp, batched).

Layout matches reference solver/element.py:308-353:
index 3 -> (0,1)=xy, index 4 -> (1,2)=yz, index 5 -> (0,2)=zx.
"""
from __future__ import annotations

import jax.numpy as jnp


def stress_tensor(stress_vector):
    """[..., 6] Voigt -> [..., 3, 3] symmetric tensor."""
    s = stress_vector
    row0 = jnp.stack([s[..., 0], s[..., 3], s[..., 5]], axis=-1)
    row1 = jnp.stack([s[..., 3], s[..., 1], s[..., 4]], axis=-1)
    row2 = jnp.stack([s[..., 5], s[..., 4], s[..., 2]], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)


def stress_vector(stress_tensor):
    """[..., 3, 3] symmetric tensor -> [..., 6] Voigt."""
    t = stress_tensor
    return jnp.stack(
        [t[..., 0, 0], t[..., 1, 1], t[..., 2, 2],
         t[..., 0, 1], t[..., 1, 2], t[..., 0, 2]],
        axis=-1,
    )


def von_mises(stress) -> jnp.ndarray:
    """Von Mises invariant from [...,3,3] tensor or [...,6] Voigt vector.

    Mirrors reference ``compute_von_mises_stress`` (solver/element.py:332).
    """
    if stress.shape[-1] == 6 and stress.ndim >= 1 and (stress.ndim == 1 or stress.shape[-2] != 3):
        sxx, syy, szz = stress[..., 0], stress[..., 1], stress[..., 2]
        sxy, syz, szx = stress[..., 3], stress[..., 4], stress[..., 5]
    else:
        sxx, syy, szz = stress[..., 0, 0], stress[..., 1, 1], stress[..., 2, 2]
        sxy, syz, szx = stress[..., 0, 1], stress[..., 1, 2], stress[..., 0, 2]
    return jnp.sqrt(
        0.5 * ((sxx - syy) ** 2 + (syy - szz) ** 2 + (szz - sxx) ** 2)
        + 3.0 * (sxy**2 + syz**2 + szx**2)
    )
