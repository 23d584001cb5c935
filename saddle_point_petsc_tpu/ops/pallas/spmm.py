"""Pallas TPU kernels for SpMM (sparse operator x dense multi-vector).

The north star (BASELINE.json) asks for "distributed SpMV/SpMM as Pallas
kernels".  SpMM amortizes operator bandwidth over k right-hand sides: the
stencil planes are streamed once per row block and applied to all k fields
resident in VMEM, so arithmetic intensity grows ~linearly in k until the
VPU bound takes over.

Kernels:
- `stencil_spmm_pallas`: planes-layout stencil operator applied to a batch
  of (2, ny, nx) fields; grid over (k, row-blocks), operator block reused
  across the k axis by the pipeline (the same planes block is fetched for
  consecutive k steps, which Mosaic keeps in VMEM).
- `dia_spmm_pallas`: banded (DIA) operator on (n, k) column-major
  right-hand sides; per-diagonal shifted slabs, no gathers.

Both run in interpret mode on CPU for tests; XLA reference paths live in
ops/stencil.py (`planes_matmat_field`) and ops/sparse.py (`dia_matmat`).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _stencil_spmm_kernel(xp_ref, planes_ref, o_ref, *, bm):
    i = pl.program_id(1)
    planes = planes_ref[:]  # (4, 3, 3, bm, nx)
    nx = planes.shape[-1]
    xw = xp_ref[0, :, pl.ds(i * bm, bm + 2), :]  # (2, bm+2, nx+2)
    y0 = jnp.zeros((bm, nx), planes.dtype)
    y1 = y0
    for dj in range(3):
        for di in range(3):
            w0 = xw[0, dj : dj + bm, di : di + nx]
            w1 = xw[1, dj : dj + bm, di : di + nx]
            y0 = y0 + planes[0, dj, di] * w0 + planes[1, dj, di] * w1
            y1 = y1 + planes[2, dj, di] * w0 + planes[3, dj, di] * w1
    o_ref[:] = jnp.stack([y0, y1])[None]


@functools.partial(jax.jit, static_argnames=("bm", "interpret"))
def stencil_spmm_pallas(planes, XT, bm=128, interpret=False):
    """Y = A X for k stacked canonical fields via one Pallas kernel.

    planes: (4, 3, 3, ny, nx); XT: (k, 2, ny, nx).  Returns (k, 2, ny, nx).
    The grid iterates row-blocks in the *inner* dimension so the padded
    field slab for one k stays pipelined while the planes blocks stream.

    VMEM bound: the per-k field block (1, 2, ny+2, nx+2) is pipelined
    whole (double-buffered), so the kernel fits VMEM only up to roughly
    512x512 f32 grids (~2.2 MB x2 per field + the planes block); larger
    grids must use the XLA SpMM (`planes_matmat_field`) or the vmapped
    SpMV kernel.  On the tunneled v5e a VMEM-overflow compile at 1024^2
    WEDGED the backend rather than erroring (r5 note), hence the hard
    check below."""
    ny_, nx_ = planes.shape[-2:]
    if (ny_ + 2) * (nx_ + 2) * 2 * 4 * 2 > 12 * 1024 * 1024:
        raise ValueError(
            f"stencil_spmm_pallas: field block at {ny_}x{nx_} exceeds "
            "VMEM; use planes_matmat_field (XLA) for large grids"
        )
    ny, nx = planes.shape[-2:]
    k = XT.shape[0]
    if ny % bm:
        bm = ny
    Xp = jnp.pad(XT, ((0, 0), (0, 0), (1, 1), (1, 1)))
    grid = (k, ny // bm)
    return pl.pallas_call(
        functools.partial(_stencil_spmm_kernel, bm=bm),
        out_shape=jax.ShapeDtypeStruct((k, 2, ny, nx), XT.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, 2, ny + 2, nx + 2),
                lambda kk, i: (kk, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (4, 3, 3, bm, nx),
                lambda kk, i: (0, 0, 0, i, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, 2, bm, nx), lambda kk, i: (kk, 0, i, 0),
            memory_space=pltpu.VMEM,
        ),
        interpret=interpret,
    )(Xp, planes)


def _dia_spmm_kernel(xp_ref, data_ref, o_ref, *, offsets, bn, maxoff):
    i = pl.program_id(0)
    data = data_ref[:]  # (ndiag, bn)
    k = o_ref.shape[-1]
    acc = jnp.zeros((bn, k), data.dtype)
    base = i * bn + maxoff
    for d, off in enumerate(offsets):
        seg = xp_ref[pl.ds(base + off, bn), :]  # (bn, k)
        acc = acc + data[d][:, None] * seg
    o_ref[:] = acc


@functools.partial(jax.jit, static_argnames=("offsets", "bn", "interpret"))
def dia_spmm_pallas(data, X, offsets, bn=512, interpret=False):
    """Y = A X for DIA storage; X: (n, k) dense right-hand sides."""
    n, k = X.shape
    if n % bn:
        bn = n
    maxoff = max((abs(o) for o in offsets), default=0)
    Xp = jnp.pad(X, ((maxoff, maxoff), (0, 0)))
    grid = (n // bn,)
    return pl.pallas_call(
        functools.partial(
            _dia_spmm_kernel, offsets=offsets, bn=bn, maxoff=maxoff
        ),
        out_shape=jax.ShapeDtypeStruct((n, k), X.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (data.shape[0], bn), lambda i: (0, i),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (bn, k), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(Xp, data)
