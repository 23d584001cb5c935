"""ILU(0) in stencil coordinates: per-patch local solves for parallel
bjacobi/ilu on distributed stencil operators.

PETSc's parallel default is PCBJACOBI with an ILU(0) local solve per rank
(ref /root/reference/src/SaddlePointProblem.c:67 KSPSetFromOptions
semantics).  Round 2 substituted per-patch Chebyshev local solves
(SURVEY.md §7(c)'s sanctioned stand-in); this module builds the real
thing, TPU-first:

- Factorization (setup, host): each device patch of the patch-truncated
  operator is an independent block with an identical 9-point/2-dof
  sparsity pattern.  The patch planes are mapped to CSR in natural
  interleaved ordering, factorized by the native C++ IKJ ILU(0) kernel
  (csrc/sptpu_native.cpp), and the factored values scattered straight
  back into the planes layout — L and U keep the stencil structure,
  because ILU(0) preserves the pattern.
- Application (device, hot path): fixed Jacobi sweeps on each triangular
  factor,

      y <- r - L y            (unit lower, sweeps x)
      z <- D^{-1} (y - U z)   (strict upper, sweeps x)

  where every L/U application is a *stencil planes matvec* — shifted
  static slices on the VPU lane axis, zero gathers, zero collectives
  (the factors never couple across patches).  Exact as sweeps -> n; in
  practice 4-8 sweeps reproduce exact-ILU iterate counts (same design as
  the serial ILU0PC sweep path, solvers/precond.py).
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from saddle_point_petsc_tpu.ops.stencil import planes_matvec_field

# Slot masks in planes coordinates (p=2c+d, dj, di): an entry couples row
# dof (c, j, i) to column dof (d, j+dj-1, i+di-1); with the natural
# interleaved ordering (row = (j*nx+i)*2+c) "strictly lower" is a function
# of (p, dj, di) alone.
_LMASK = np.zeros((4, 3, 3, 1, 1))
_LMASK[:, 0, :] = 1.0  # dj = -1 rows
_LMASK[:, 1, 0] = 1.0  # same row, di = -1
_LMASK[2, 1, 1] = 1.0  # intra-node (c=1, d=0)
_DMASK = np.zeros((4, 3, 3, 1, 1))
_DMASK[0, 1, 1] = 1.0
_DMASK[3, 1, 1] = 1.0
_UMASK = 1.0 - _LMASK - _DMASK


@functools.lru_cache(maxsize=8)
def _slot_table(my, mx):
    """Map planes slots -> CSR (natural interleaved ordering) for an
    (my, mx) patch: returns (indptr, indices, slot) where slot[k] is the
    flat planes index of CSR position k."""
    p4, dj, di, j, i = np.meshgrid(
        np.arange(4), np.arange(3), np.arange(3),
        np.arange(my), np.arange(mx), indexing="ij",
    )
    c, d = p4 // 2, p4 % 2
    jj, ii = j + dj - 1, i + di - 1
    valid = (jj >= 0) & (jj < my) & (ii >= 0) & (ii < mx)
    row = ((j * mx + i) * 2 + c)[valid]
    col = ((jj * mx + ii) * 2 + d)[valid]
    slot = np.ravel_multi_index(
        (p4, dj, di, j, i), (4, 3, 3, my, mx)
    )[valid]
    order = np.lexsort((col, row))
    n = my * mx * 2
    indptr = np.concatenate(
        [[0], np.cumsum(np.bincount(row[order], minlength=n))]
    ).astype(np.int32)
    return indptr, col[order].astype(np.int32), slot[order]


def stencil_ilu0_host(lp):
    """ILU(0)-factorize one patch's planes (4, 3, 3, my, mx) on host.

    Returns (Lp, Up_strict, inv_diag) as f64 numpy arrays in the same
    planes layout (L multipliers with implicit unit diagonal; strictly
    upper U; inverted diagonal as a (2, my, mx) field)."""
    lp = np.asarray(lp, np.float64)
    my, mx = lp.shape[-2:]
    indptr, indices, slot = _slot_table(my, mx)
    data = lp.reshape(-1)[slot].copy()
    try:
        from saddle_point_petsc_tpu.utils import native

        data = native.ilu0(indptr, indices, data, my * mx * 2)
    except Exception:
        from saddle_point_petsc_tpu.solvers.precond import _ilu0_python

        data = _ilu0_python(indptr, indices, data, my * mx * 2)
    fact = np.zeros(lp.size)
    fact[slot] = data
    fact = fact.reshape(lp.shape)
    Lp = fact * _LMASK
    Up = fact * _UMASK
    diag = np.stack([fact[0, 1, 1], fact[3, 1, 1]])  # (2, my, mx)
    inv_diag = 1.0 / np.where(diag == 0, 1.0, diag)
    return Lp, Up, inv_diag


def _ilu_sweep_local(Lp, Up, invd, r, sweeps):
    """Apply z = U^{-1} L^{-1} r by fixed triangular Jacobi sweeps; every
    op is a patch-local stencil contraction (runs under shard_map)."""
    y = r
    for _ in range(sweeps):
        y = r - planes_matvec_field(Lp, y)
    z = invd * y
    for _ in range(sweeps):
        z = invd * (y - planes_matvec_field(Up, z))
    return z


@dataclasses.dataclass(frozen=True)
class StencilILU0PC:
    """Serial stencil-form ILU(0) (sweep application).  Iterate-identical
    to the CSR-based precond.ilu0 at equal sweep counts, but applies L/U
    as stencil contractions (no gathers)."""

    Lp: Any
    Up: Any
    invd: Any
    sweeps: int = 6

    def __call__(self, r):
        from saddle_point_petsc_tpu.ops.stencil import (
            field_to_flat,
            flat_to_field,
        )

        flat = r.ndim == 1
        if flat:
            ny, nx = self.Lp.shape[-2:]
            r = flat_to_field(r, ny, nx)
        z = _ilu_sweep_local(self.Lp, self.Up, self.invd, r, self.sweeps)
        return field_to_flat(z) if flat else z


jax.tree_util.register_pytree_node(
    StencilILU0PC,
    lambda o: ((o.Lp, o.Up, o.invd), (o.sweeps,)),
    lambda m, d: StencilILU0PC(*d, *m),
)


def stencil_ilu0(A, sweeps=6) -> StencilILU0PC:
    """Serial ILU(0) for a StencilOperator, factors kept in stencil form."""
    Lp, Up, invd = stencil_ilu0_host(np.asarray(jax.device_get(A.planes)))
    dt = A.planes.dtype
    return StencilILU0PC(
        jnp.asarray(Lp, dt), jnp.asarray(Up, dt), jnp.asarray(invd, dt),
        sweeps,
    )


@dataclasses.dataclass(frozen=True)
class DistILU0PC:
    """Distributed block-Jacobi with per-patch ILU(0) local solves.

    One block per device patch (PETSc parallel-default bjacobi+ILU); the
    factors are sharded planes arrays and the application is pure local
    compute under shard_map — zero collectives per application.  Linear
    and patch-symmetric, valid under FGMRES; under MINRES/CG treat like
    any nonsymmetric-PC caveat (same as PETSc's bjacobi+ILU)."""

    Lp: Any  # (4, 3, 3, ny, nx) sharded
    Up: Any
    invd: Any  # (2, ny, nx) sharded
    mesh: Any  # static
    sweeps: int = 6  # static

    def __call__(self, r):
        from saddle_point_petsc_tpu.parallel.mesh import GX, GY

        fn = jax.shard_map(
            functools.partial(_ilu_sweep_local, sweeps=self.sweeps),
            mesh=self.mesh,
            in_specs=(
                P(None, None, None, GY, GX),
                P(None, None, None, GY, GX),
                P(None, GY, GX),
                P(None, GY, GX),
            ),
            out_specs=P(None, GY, GX),
        )
        return fn(self.Lp, self.Up, self.invd, r)


jax.tree_util.register_pytree_node(
    DistILU0PC,
    lambda o: ((o.Lp, o.Up, o.invd), (o.mesh, o.sweeps)),
    lambda m, d: DistILU0PC(*d, *m),
)


def dist_ilu0(A, sweeps=6) -> DistILU0PC:
    """Per-patch ILU(0) for a DistStencilOperator.

    Setup: patch-truncate (zero cross-patch couplings -> independent
    blocks), fetch the planes once, factorize every patch on host (native
    C++ kernel), and re-shard the factors with the operator's layout."""
    from saddle_point_petsc_tpu.parallel.dist import patch_truncate
    from saddle_point_petsc_tpu.parallel.mesh import GX, GY

    At = patch_truncate(A)
    if getattr(At.planes, "is_fully_addressable", True):
        planes = np.asarray(jax.device_get(At.planes), np.float64)
    else:
        # multihost: remote shards are not addressable — materialize the
        # global planes collectively (setup-time only)
        from jax.experimental import multihost_utils

        planes = np.asarray(
            multihost_utils.process_allgather(At.planes, tiled=True),
            np.float64,
        )
    ny, nx = planes.shape[-2:]
    mesh = A.mesh
    py, px = mesh.shape[GY], mesh.shape[GX]
    my, mx = ny // py, nx // px
    Lg = np.zeros_like(planes)
    Ug = np.zeros_like(planes)
    ivg = np.zeros((2, ny, nx))
    for pj in range(py):
        for pi in range(px):
            sl = (Ellipsis, slice(pj * my, (pj + 1) * my),
                  slice(pi * mx, (pi + 1) * mx))
            Lg[sl], Ug[sl], ivg[sl] = stencil_ilu0_host(planes[sl])
    dt = A.planes.dtype

    def put(host_np, spec):
        # works in single- AND multi-process runs (device_put of a host
        # array onto a cross-process sharding is single-process only)
        sh = NamedSharding(mesh, spec)
        return jax.make_array_from_callback(
            host_np.shape, sh, lambda idx: jnp.asarray(host_np[idx], dt)
        )

    return DistILU0PC(
        put(Lg, P(None, None, None, GY, GX)),
        put(Ug, P(None, None, None, GY, GX)),
        put(ivg, P(None, GY, GX)),
        mesh,
        sweeps,
    )
