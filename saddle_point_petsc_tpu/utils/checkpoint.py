"""Checkpoint / resume of assembled systems and solver state (SURVEY.md §5).

The reference has no checkpointing (HDF5 is linked but never called,
ref CMakeLists.txt:17 — dead dependency, bug B9); for a production solver
we provide .npz dump/restore of any pytree (assembled operators, RHS,
solutions, Krylov results), plus a warm-restart helper that resumes a
Krylov solve from a saved iterate.

Arrays are gathered to host on save (works for sharded arrays) and
re-sharded by the caller on load if needed.
"""
from __future__ import annotations

import json

import jax
import jax.numpy as jnp
import numpy as np


def save_pytree(path, tree):
    """Save an arbitrary pytree of arrays (+ static aux data) to .npz."""
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    arrays = {f"leaf_{i}": np.asarray(l) for i, l in enumerate(leaves)}
    arrays["__treedef__"] = np.frombuffer(
        str(treedef).encode(), dtype=np.uint8
    )
    np.savez(path, **arrays)
    return path


def load_leaves(path):
    """Load the flat leaf list saved by save_pytree (order preserved)."""
    with np.load(path) as z:
        n = sum(1 for k in z.files if k.startswith("leaf_"))
        return [jnp.asarray(z[f"leaf_{i}"]) for i in range(n)]


def load_like(path, template):
    """Load into the structure of `template` (same treedef as saved)."""
    leaves = load_leaves(path)
    treedef = jax.tree_util.tree_structure(template)
    return jax.tree_util.tree_unflatten(treedef, leaves)


def save_solver_state(path, result, meta=None):
    """Save a KrylovResult (x, history, counters) for warm restart."""
    save_pytree(path, result)
    if meta:
        with open(str(path) + ".meta.json", "w") as f:
            json.dump(meta, f)
    return path


def resume_solve(solver, A, b, path, template_result, **kwargs):
    """Resume a Krylov solve from a checkpointed result's iterate (x0)."""
    prev = load_like(path, template_result)
    return solver(A, b, x0=prev.x, **kwargs)
