"""Pallas TPU kernels for the hot SpMV paths.

Two kernels, matching the two production formats:

- `stencil_spmv_pallas`: the 3x3-block stencil operator in planes layout —
  row-blocked grid, x resident in VMEM, 36 fused multiply-adds per block
  with the grid x-dimension on the 128-lane axis.
- `dia_spmv_pallas`: DIA (banded) SpMV — per-diagonal shifted products,
  no gathers or index arrays (the TPU-native general-sparse kernel; see
  ops/sparse.py DIA for the RCM-reordering route that makes arbitrary
  matrices banded).

Both use only static shapes/offsets and run in interpret mode on CPU for
testing.  The XLA paths in ops/stencil.py and ops/sparse.py are already at
~95% of HBM bandwidth on v5e; these kernels exist to pin the schedule
explicitly (VMEM residency for x, row-block streaming for the matrix) and
as the substrate for future fusion (halo-overlap, matvec+dot fusion).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _stencil_kernel(xp_ref, planes_ref, o_ref, *, bm):
    i = pl.program_id(0)
    planes = planes_ref[:]  # (4, 3, 3, bm, nx)
    nx = planes.shape[-1]
    # rows [i*bm, i*bm + bm + 2) of the padded field, all nx+2 cols
    xw = xp_ref[:, pl.ds(i * bm, bm + 2), :]  # (2, bm+2, nx+2)
    y0 = jnp.zeros((bm, nx), planes.dtype)
    y1 = y0
    for dj in range(3):
        for di in range(3):
            w0 = xw[0, dj : dj + bm, di : di + nx]
            w1 = xw[1, dj : dj + bm, di : di + nx]
            y0 = y0 + planes[0, dj, di] * w0 + planes[1, dj, di] * w1
            y1 = y1 + planes[2, dj, di] * w0 + planes[3, dj, di] * w1
    o_ref[:] = jnp.stack([y0, y1])


@functools.partial(jax.jit, static_argnames=("bm", "interpret"))
def stencil_spmv_pallas(planes, xT, bm=128, interpret=False):
    """y = A x for the planes stencil operator via a Pallas kernel.

    planes: (4, 3, 3, ny, nx); xT: (2, ny, nx) canonical field.
    Row-blocked over bm grid rows; ny must be divisible by bm (callers pad
    or pick bm accordingly — bench/production grids are powers of two).
    """
    ny, nx = planes.shape[-2:]
    if ny % bm:
        bm = ny  # fallback: single block
    xp = jnp.pad(xT, ((0, 0), (1, 1), (1, 1)))
    grid = (ny // bm,)
    return pl.pallas_call(
        functools.partial(_stencil_kernel, bm=bm),
        out_shape=jax.ShapeDtypeStruct((2, ny, nx), xT.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),  # xp whole, resident in VMEM
            pl.BlockSpec(
                (4, 3, 3, bm, nx),
                lambda i: (0, 0, 0, i, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (2, bm, nx), lambda i: (0, i, 0), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(xp, planes)


def _dia_kernel(xp_ref, data_ref, o_ref, *, offsets, bn, maxoff):
    i = pl.program_id(0)
    data = data_ref[:]  # (ndiag, bn)
    acc = jnp.zeros((1, bn), data.dtype)
    base = i * bn + maxoff
    for k, off in enumerate(offsets):
        seg = xp_ref[:, pl.ds(base + off, bn)]  # (1, bn)
        acc = acc + data[k : k + 1, :] * seg
    o_ref[:] = acc


@functools.partial(jax.jit, static_argnames=("offsets", "bn", "interpret"))
def dia_spmv_pallas(data, x, offsets, bn=512, interpret=False):
    """y = A x for DIA storage via a Pallas kernel (shift-only inner loop).

    data: (ndiag, n) row-indexed diagonals; x: (n,); offsets: static tuple.
    """
    n = x.shape[0]
    if n % bn:
        bn = n
    maxoff = max((abs(o) for o in offsets), default=0)
    xp = jnp.pad(x, (maxoff, maxoff)).reshape(1, -1)
    grid = (n // bn,)
    out = pl.pallas_call(
        functools.partial(
            _dia_kernel, offsets=offsets, bn=bn, maxoff=maxoff
        ),
        out_shape=jax.ShapeDtypeStruct((1, n), x.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (data.shape[0], bn), lambda i: (0, i), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, bn), lambda i: (0, i), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(xp, data)
    return out[0]
