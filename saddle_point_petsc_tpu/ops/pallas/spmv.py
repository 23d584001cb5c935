"""Pallas TPU kernels for the hot SpMV paths.

Kernels, matching the production formats:

- `stencil_spmv_pallas`: the 3x3-block stencil operator in planes layout.
  Row-blocked 1D grid; the planes stream HBM->VMEM through the automatic
  BlockSpec pipeline, while the overlapping (bm+2)-row windows of the
  padded field are fetched with *manually double-buffered async DMA*
  (BlockSpec cannot express overlapping blocks).  36 fused multiply-adds
  per block with the grid x-dimension on the 128-lane axis.  VMEM use is
  O(bm * nx), so the kernel scales to arbitrarily large grids (the
  whole-x-resident variant OOMed VMEM at 1024^2).
- `stencil_spmv_pallas_padded`: same kernel taking an already halo-padded
  field — the distributed flavor, where the 1-ring comes from the ppermute
  halo exchange (parallel/halo.py) instead of zero padding.
- `dia_spmv_pallas`: DIA (banded) SpMV — per-diagonal shifted products, no
  gathers or index arrays (see ops/sparse.py DIA for the RCM-reordering
  route that makes arbitrary matrices banded).

All kernels use only static shapes/offsets and run in interpret mode on CPU
for testing.  The XLA stencil path (ops/stencil.py) measures ~102% of the
exact HBM roofline on v5e; these kernels pin the schedule explicitly and are
selectable on the production path via StencilOperator(backend="pallas") /
the -mat_stencil_backend option.  bench.py reports both.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _stencil_kernel(xp_hbm, planes_ref, o_ref, x_win, sems, *, bm, wrows):
    """Grid step i computes output rows [i*bm, (i+1)*bm).

    xp_hbm:    (2, rows, nx+2) in HBM/ANY — windows DMA'd manually.
               Row r holds padded-field row r (ghost ring at r=0); the
               tail rows are alignment slack.  Each window is `wrows`
               rows starting at i*bm: Mosaic DMA slices must be 8-sublane
               aligned in both offset (bm % 8 == 0, or a single block)
               and extent (wrows % 8 == 0); rows 0..bm+2 are live.
    planes_ref:(4, 3, 3, bm, nx) VMEM block (auto-pipelined)
    x_win:     (2, 2, wrows, nx+2) VMEM scratch (double buffer)
    sems:      (2,) DMA semaphores
    """
    i = pl.program_id(0)
    nsteps = pl.num_programs(0)

    def win_dma(slot, step):
        return pltpu.make_async_copy(
            xp_hbm.at[:, pl.ds(step * bm, wrows), :],
            x_win.at[slot],
            sems.at[slot],
        )

    # warm-up: first window fetched at step 0
    @pl.when(i == 0)
    def _():
        win_dma(0, 0).start()

    # prefetch next window while computing this one
    @pl.when(i + 1 < nsteps)
    def _():
        win_dma((i + 1) % 2, i + 1).start()

    win_dma(i % 2, i).wait()
    xw = x_win[i % 2]  # (2, wrows, nx+2); rows 0..bm+2 are live
    planes = planes_ref[:]  # (4, 3, 3, bm, nx)
    nx = planes.shape[-1]
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
def stencil_spmv_pallas_padded(planes, xp, bm=32, interpret=False):
    """y = A x for the planes stencil operator, halo-padded input.

    planes: (4, 3, 3, ny, nx); xp: (2, ny+2, nx+2) (zero padding for the
    single-device operator, ppermute halo ring for the distributed one).
    Row-blocked over bm grid rows; bm falls back to ny when it does not
    divide ny.
    """
    ny, nx = planes.shape[-2:]
    if ny % bm or bm % 8:
        bm = ny  # fallback: single block (small/odd grids)
    grid = (ny // bm,)
    # Mosaic DMA slices must be tile-aligned: window extent rounded up to
    # the 8-sublane tile (slack rows keep the last window in bounds), and
    # the lane dim padded to a multiple of 128 (the DMA copies full rows;
    # the kernel only reads the first nx+2 columns)
    wrows = -(-(bm + 2) // 8) * 8 if grid[0] == 1 else bm + 8
    slack = wrows + (grid[0] - 1) * bm - (ny + 2)
    lpad = -(-(nx + 2) // 128) * 128 - (nx + 2)
    xp = jnp.pad(xp, ((0, 0), (0, slack), (0, lpad)))
    # under shard_map the output varies over the same mesh axes as x
    vma = getattr(jax.typeof(xp), "vma", frozenset())
    out_shape = jax.ShapeDtypeStruct((2, ny, nx), xp.dtype, vma=vma)
    return pl.pallas_call(
        functools.partial(_stencil_kernel, bm=bm, wrows=wrows),
        out_shape=out_shape,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # xp stays in HBM
            pl.BlockSpec(
                (4, 3, 3, bm, nx),
                lambda i: (0, 0, 0, i, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (2, bm, nx), lambda i: (0, i, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((2, 2, wrows, xp.shape[-1]), xp.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(xp, planes)


@functools.partial(jax.jit, static_argnames=("bm", "interpret"))
def stencil_spmv_pallas(planes, xT, bm=32, interpret=False):
    """y = A x on a canonical (2, ny, nx) field (zero-padded boundary)."""
    xp = jnp.pad(xT, ((0, 0), (1, 1), (1, 1)))
    return stencil_spmv_pallas_padded(planes, xp, bm=bm, interpret=interpret)


def _ell_kernel(x_ref, colst_ref, valst_ref, o_ref):
    """ELL-T SpMV block: y[blk] = sum_k vals[k, blk] * x[cols[k, blk]].

    x resident in VMEM; cols/vals arrive transposed (k, n) so each slot k
    is a lane-parallel gather (tpu dynamic_gather) + multiply-add.
    """
    x = x_ref[0]  # (n,)
    cols = colst_ref[:]  # (k, bn)
    vals = valst_ref[:]
    valid = cols >= 0
    c = jnp.where(valid, cols, 0)
    xg = jnp.take(x, c.reshape(-1), axis=0).reshape(c.shape)
    o_ref[:] = jnp.sum(jnp.where(valid, vals, 0.0) * xg, axis=0)[None]


@functools.partial(jax.jit, static_argnames=("bn", "interpret"))
def ell_spmv_pallas(cols_t, vals_t, x, bn=512, interpret=False):
    """y = A x for ELL storage via a Pallas kernel.

    cols_t/vals_t: (k, n) TRANSPOSED ELL arrays (prepare once at setup —
    `ell_transpose`); x: (n,).  The whole x stays VMEM-resident; rows are
    blocked bn to the 128-lane axis; the irregular access is one
    lane-parallel gather per slot (SURVEY.md §7 hard part (b)).
    """
    k, n = cols_t.shape
    if n % bn:
        bn = n
    grid = (n // bn,)
    out = pl.pallas_call(
        _ell_kernel,
        out_shape=jax.ShapeDtypeStruct((1, n), x.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),  # x whole
            pl.BlockSpec((k, bn), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, bn), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, bn), lambda i: (0, i), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(x.reshape(1, -1), cols_t, vals_t)
    return out[0]


def ell_transpose(ell):
    """(n, k) ELL -> (k, n) kernel layout (one-time setup cost)."""
    return jnp.transpose(ell.cols), jnp.transpose(ell.vals)


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
