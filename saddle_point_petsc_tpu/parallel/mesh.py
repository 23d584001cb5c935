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


def make_mesh(
    ndev=None, shape=None, ny=None, nx=None, devices=None, hosts_major=True
) -> Mesh:
    """Create a 2D device mesh with axes (gy, gx).

    hosts_major (multi-host only): order devices by (process, local id)
    before the (py, px) reshape, so each host's chips form contiguous
    rows of the mesh.  Neighbor halo ppermutes along gx then ride ICI
    within a host, and only the gy patch edges cross DCN; XLA's two-level
    psum (ICI first, DCN second) likewise follows from this layout
    (BASELINE.md config 5).  The reference's analog is the single
    PETSC_COMM_WORLD rank order (ref Discretization.c:17) — MPI rank
    order is hosts-major by construction.
    """
    if devices is None:
        devices = jax.devices()
    if ndev is None:
        ndev = len(devices)
    devices = list(devices)[:ndev]
    if hosts_major:
        devices.sort(key=lambda d: (d.process_index, d.id))
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


# NOTE: Krylov reductions run on globally sharded arrays, so the XLA
# partitioner inserts the all-reduces itself; with the hosts-major mesh
# from make_mesh it lowers them hierarchically (ICI within a host, DCN
# across — BASELINE.md config 5).  No hand-written hierarchical psum is
# needed (round 1 carried an unused one; removed per VERDICT hygiene).
