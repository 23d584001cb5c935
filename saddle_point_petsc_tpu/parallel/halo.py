"""Halo (ghost) exchange via ppermute — the TPU-native VecScatter/DMDA
local-to-global machinery (P3 in SURVEY.md §2b).

The reference's stencil-width-1 box ghost region (DMDACreate2d,
/root/reference/src/Discretization.c:17) and its two transfer directions:

- `halo_exchange`: fill ghosts with neighbor owner values (PETSc
  DMGlobalToLocal; implicit in MatMult's VecScatter) — used before a
  stencil matvec.
- `halo_add`: accumulate ghost contributions back onto their owners
  (PETSc DMLocalToGlobalBegin/End(ADD_VALUES), ref Discretization.c:218-219)
  — used after element assembly.

The spatial dims are the LAST two axes (matching the canonical dof-major
field layout (2, ny, nx) and the planes operator layout (4, 3, 3, ny, nx)),
so the 128-lane axis is the grid x-dimension throughout.  Both transfers
are two-phase (x then y), so the 8-neighbor box exchange needs only 4
ppermutes and corners ride for free in the second phase.  Missing sources
at the global boundary leave zeros (ppermute semantics), which matches the
zero-padding convention of ops/stencil.py.  All functions must run inside
shard_map over a mesh with axes (gy, gx).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from saddle_point_petsc_tpu.parallel.mesh import GX, GY


def _shift_perm(n, direction):
    """Permutation pairs for a non-periodic shift along an axis of size n.

    direction=+1: data moves to higher index (source i -> dest i+1).
    """
    if direction > 0:
        return [(i, i + 1) for i in range(n - 1)]
    return [(i, i - 1) for i in range(1, n)]


def halo_exchange(x, axes=(GY, GX)):
    """Pad a local (..., my, mx) block with a 1-ring of neighbor values.

    Returns (..., my+2, mx+2); global-boundary ghosts are zero.
    """
    ay, ax = axes
    ny_dev = lax.axis_size(ay)
    nx_dev = lax.axis_size(ax)
    # phase 1: x-direction (last axis)
    right_edge = x[..., :, -1:]
    left_edge = x[..., :, :1]
    left_ghost = lax.ppermute(right_edge, ax, _shift_perm(nx_dev, +1))
    right_ghost = lax.ppermute(left_edge, ax, _shift_perm(nx_dev, -1))
    xw = jnp.concatenate([left_ghost, x, right_ghost], axis=-1)
    # phase 2: y-direction (second-to-last axis), incl. new ghost cols
    top_edge = xw[..., -1:, :]
    bot_edge = xw[..., :1, :]
    bot_ghost = lax.ppermute(top_edge, ay, _shift_perm(ny_dev, +1))
    top_ghost = lax.ppermute(bot_edge, ay, _shift_perm(ny_dev, -1))
    return jnp.concatenate([bot_ghost, xw, top_ghost], axis=-2)


def _diag_perm(py, px, dy, dx):
    """Non-periodic diagonal-shift pairs over the flattened (gy, gx) mesh
    (flat index = iy*px + ix, the collective's tuple-axis order)."""
    return [
        (iy * px + ix, (iy + dy) * px + (ix + dx))
        for iy in range(py)
        for ix in range(px)
        if 0 <= iy + dy < py and 0 <= ix + dx < px
    ]


def halo_exchange_1phase(x, axes=(GY, GX)):
    """Single-phase box exchange: 8 *concurrent* ppermutes (4 edges + 4
    corner scalars over the flattened mesh axes) instead of two dependent
    phases.

    Same result as `halo_exchange`, but the comm dependency depth is 1
    instead of 2: on TPU all eight transfers launch together on ICI and
    the local contraction overlaps one comm round, not two.  The corner
    messages are O(1) elements.  This is the production exchange on the
    matvec hot path; the two-phase variant remains the reference
    implementation (and the adjoint `halo_add` is unchanged — assembly is
    setup-time).
    """
    ay, ax = axes
    py, px = lax.axis_size(ay), lax.axis_size(ax)
    axt = (ay, ax)
    lg = lax.ppermute(x[..., :, -1:], ax, _shift_perm(px, +1))
    rg = lax.ppermute(x[..., :, :1], ax, _shift_perm(px, -1))
    bg = lax.ppermute(x[..., -1:, :], ay, _shift_perm(py, +1))
    tg = lax.ppermute(x[..., :1, :], ay, _shift_perm(py, -1))
    c00 = lax.ppermute(x[..., -1:, -1:], axt, _diag_perm(py, px, +1, +1))
    c01 = lax.ppermute(x[..., -1:, :1], axt, _diag_perm(py, px, +1, -1))
    c10 = lax.ppermute(x[..., :1, -1:], axt, _diag_perm(py, px, -1, +1))
    c11 = lax.ppermute(x[..., :1, :1], axt, _diag_perm(py, px, -1, -1))
    row_lo = jnp.concatenate([c00, bg, c01], axis=-1)  # padded row j=-1
    row_hi = jnp.concatenate([c10, tg, c11], axis=-1)  # padded row j=my
    mid = jnp.concatenate([lg, x, rg], axis=-1)
    return jnp.concatenate([row_lo, mid, row_hi], axis=-2)


def halo_add_df(xp, axes=(GY, GX)):
    """Compensated (double-float) adjoint halo fold: `halo_add` on a DF
    pair with the ghost accumulations done as error-free df additions.

    Plain halo_add on (hi, lo) separately would drop the rounding error
    of the hi+hi ghost folds (~1 f32 ulp, 6e-8 relative) exactly at
    patch-boundary nodes — defeating the ~1e-14 accuracy the device-side
    df assembly path (models/assemble_df.py) exists to provide.  Ships
    hi and lo ghost slabs (2 ppermutes per direction per component;
    assembly is setup-time) and folds with two_sum chains.
    """
    from saddle_point_petsc_tpu.ops.doublefloat import DF, df_add

    ay, ax = axes
    ny_dev = lax.axis_size(ay)
    nx_dev = lax.axis_size(ax)
    hi, lo = xp

    def ship(h, l, axis_name, direction, n):
        perm = _shift_perm(n, direction)
        return DF(
            lax.ppermute(h, axis_name, perm),
            lax.ppermute(l, axis_name, perm),
        )

    # phase 1: y-direction
    from_below = ship(hi[..., -1:, :], lo[..., -1:, :], ay, +1, ny_dev)
    from_above = ship(hi[..., :1, :], lo[..., :1, :], ay, -1, ny_dev)
    hi_w, lo_w = hi[..., 1:-1, :], lo[..., 1:-1, :]
    r = df_add(DF(hi_w[..., :1, :], lo_w[..., :1, :]), from_below)
    hi_w = hi_w.at[..., :1, :].set(r.hi)
    lo_w = lo_w.at[..., :1, :].set(r.lo)
    r = df_add(DF(hi_w[..., -1:, :], lo_w[..., -1:, :]), from_above)
    hi_w = hi_w.at[..., -1:, :].set(r.hi)
    lo_w = lo_w.at[..., -1:, :].set(r.lo)
    # phase 2: x-direction on the y-folded block
    from_left = ship(hi_w[..., :, -1:], lo_w[..., :, -1:], ax, +1, nx_dev)
    from_right = ship(hi_w[..., :, :1], lo_w[..., :, :1], ax, -1, nx_dev)
    hi_c, lo_c = hi_w[..., :, 1:-1], lo_w[..., :, 1:-1]
    r = df_add(DF(hi_c[..., :, :1], lo_c[..., :, :1]), from_left)
    hi_c = hi_c.at[..., :, :1].set(r.hi)
    lo_c = lo_c.at[..., :, :1].set(r.lo)
    r = df_add(DF(hi_c[..., :, -1:], lo_c[..., :, -1:]), from_right)
    hi_c = hi_c.at[..., :, -1:].set(r.hi)
    lo_c = lo_c.at[..., :, -1:].set(r.lo)
    return DF(hi_c, lo_c)


def halo_add(xp, axes=(GY, GX)):
    """Adjoint of halo_exchange: fold the 1-ring ghost accumulations of a
    padded (..., my+2, mx+2) block back onto their owners; returns the
    owned (..., my, mx) block.

    Two-phase in reverse order (y then x) so corner contributions route
    through the edge ghosts correctly.
    """
    ay, ax = axes
    ny_dev = lax.axis_size(ay)
    nx_dev = lax.axis_size(ax)
    # phase 1: y-direction
    top_ghost = xp[..., -1:, :]
    bot_ghost = xp[..., :1, :]
    from_below = lax.ppermute(top_ghost, ay, _shift_perm(ny_dev, +1))
    from_above = lax.ppermute(bot_ghost, ay, _shift_perm(ny_dev, -1))
    xw = xp[..., 1:-1, :]
    xw = xw.at[..., :1, :].add(from_below).at[..., -1:, :].add(from_above)
    # phase 2: x-direction on the y-folded block
    right_ghost = xw[..., :, -1:]
    left_ghost = xw[..., :, :1]
    from_left = lax.ppermute(right_ghost, ax, _shift_perm(nx_dev, +1))
    from_right = lax.ppermute(left_ghost, ax, _shift_perm(nx_dev, -1))
    x = xw[..., :, 1:-1]
    x = x.at[..., :, :1].add(from_left).at[..., :, -1:].add(from_right)
    return x
