"""Checkpoint / resume for long solves (orbax-backed with numpy fallback).

The reference's only resume mechanism is the ``u_init`` warm-start argument
on every solver (solver/solver.py:11,144,...).  That API is preserved
throughout tpufem; this module adds durable state so a long CG / Newton /
modal run survives preemption:

    save_state(path, {"u": u, "iteration": i, ...})
    state = load_state(path)
    cg(..., x0=state["u"])
"""
from __future__ import annotations

import os
from typing import Any, Dict, Optional

import numpy as np


def _to_numpy_tree(tree):
    import jax
    return jax.tree_util.tree_map(lambda x: np.asarray(jax.device_get(x)), tree)


def save_state(path: str, state: Dict[str, Any]) -> None:
    """Save a pytree-of-arrays solver state (orbax if usable, else npz)."""
    state = _to_numpy_tree(state)
    try:
        import orbax.checkpoint as ocp

        ckptr = ocp.PyTreeCheckpointer()
        ckptr.save(os.path.abspath(path), state, force=True)
        return
    except Exception:
        pass
    flat = {k: np.asarray(v) for k, v in state.items()}
    np.savez(path if path.endswith(".npz") else path + ".npz", **flat)


def load_state(path: str) -> Optional[Dict[str, Any]]:
    """Load a previously saved state; None if absent."""
    try:
        import orbax.checkpoint as ocp

        if os.path.isdir(path):
            ckptr = ocp.PyTreeCheckpointer()
            return ckptr.restore(os.path.abspath(path))
    except Exception:
        pass
    npz = path if path.endswith(".npz") else path + ".npz"
    if os.path.exists(npz):
        with np.load(npz, allow_pickle=False) as f:
            return {k: f[k] for k in f.files}
    return None


def checkpointed_cg(A, b, path: str, *, every: int = 200, total_iter: int = 2000,
                    **cg_kw):
    """CG in restartable chunks of `every` iterations, saving u after each.

    Resumes automatically from an existing checkpoint at `path`.
    """
    import jax.numpy as jnp

    from ..solvers.cg import CONVERGED, cg

    state = load_state(path)
    u = jnp.asarray(state["u"]) if state is not None else None
    done = int(state["iterations"]) if state is not None else 0
    info = None
    while done < total_iter:
        u, info = cg(A, b, x0=u, max_iter=min(every, total_iter - done),
                     **cg_kw)
        done += int(info.iterations)
        save_state(path, {"u": u, "iterations": np.asarray(done)})
        if int(info.status) == CONVERGED:
            break
    return u, info, done
