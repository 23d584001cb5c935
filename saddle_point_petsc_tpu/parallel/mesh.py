"""Device-mesh setup and reduction utilities (P11 in SURVEY.md §2b).

TPU-native replacement for the reference's MPI layer: PETSC_COMM_WORLD and
the PETSC_DECIDE process-grid factorization (DMDACreate2d,
/root/reference/src/Discretization.c:17) become a 2D `jax.sharding.Mesh`
over the pod slice; MPI_Allreduce becomes `psum`/sharded-array reductions
(hierarchical ICI-then-DCN is inserted by the XLA partitioner); neighbor
Send/Recv become `ppermute` (see parallel/halo.py).
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

GY, GX = "gy", "gx"


def decide_process_grid(ndev, ny=None, nx=None):
    """Factor ndev into (py, px), preferring near-square patches.

    Equivalent of DMDACreate2d's PETSC_DECIDE factorization
    (ref Discretization.c:17): pick py*px = ndev minimizing patch aspect
    ratio for an (ny x nx)-node grid (square grid assumed if not given).
    """
    ny = ny or 1
    nx = nx or 1
    best = (1, ndev)
    best_cost = float("inf")
    for py in range(1, ndev + 1):
        if ndev % py:
            continue
        px = ndev // py
        # patch aspect cost: want (ny/py) / (nx/px) close to 1
        cost = abs(math.log((ny / py) / (nx / px))) if ny and nx else 0.0
        if cost < best_cost:
            best_cost = cost
            best = (py, px)
    return best


def make_mesh(ndev=None, shape=None, ny=None, nx=None, devices=None) -> Mesh:
    """Create a 2D device mesh with axes (gy, gx)."""
    if devices is None:
        devices = jax.devices()
    if ndev is None:
        ndev = len(devices)
    devices = devices[:ndev]
    if shape is None:
        shape = decide_process_grid(ndev, ny, nx)
    py, px = shape
    assert py * px == ndev, f"mesh {shape} != {ndev} devices"
    dev_array = np.asarray(devices).reshape(py, px)
    return Mesh(dev_array, (GY, GX))


def field_sharding(mesh: Mesh, ndim=3) -> NamedSharding:
    """Sharding for arrays whose LAST TWO dims are the (ny, nx) grid —
    the canonical layout for fields (2, ny, nx), masks (ny, nx), operator
    planes (4, 3, 3, ny, nx) and constraint rows (m, 2, ny, nx)."""
    spec = P(*([None] * (ndim - 2) + [GY, GX]))
    return NamedSharding(mesh, spec)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_field(x, mesh: Mesh):
    """Place an array (grid dims last) with (gy, gx)-blocked sharding."""
    return jax.device_put(x, field_sharding(mesh, jnp.ndim(x)))


def hierarchical_psum(x, axes=(GY, GX)):
    """All-reduce over the whole mesh inside shard_map.

    Written as two single-axis psums so the partitioner reduces within the
    fast axis first (maps to ICI-within-host then DCN-across-hosts when the
    mesh is laid out hosts-major — BASELINE.md config 5).
    """
    for ax in axes:
        x = jax.lax.psum(x, ax)
    return x
