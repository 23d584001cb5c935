"""Double-float (compensated) arithmetic on f32 pairs — f64-class accuracy
on TPU hardware that has no native f64.

TPU v5e/v6e have no double-precision units (and f64 emulation through this
stack hangs), but the north star requires rtol ~1e-8 solves.  The standard
HPC answer is mixed-precision iterative refinement with an *accurately
computed residual* (solvers/refine.py); this module provides the error-free
transformations (Knuth TwoSum, Dekker Split/TwoProd — valid in any IEEE
arithmetic, no FMA required) and a compensated stencil matvec, all fully
vectorized on the VPU.

A double-float value is a pair (hi, lo) with |lo| <= ulp(hi)/2 representing
hi + lo to ~2x24 = 48 bits of mantissa (~1e-14 relative).

NOTE: correctness relies on XLA not reassociating float arithmetic; JAX/XLA
preserve IEEE semantics by default (no fast-math).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class DF(NamedTuple):
    hi: jnp.ndarray
    lo: jnp.ndarray


_SPLITTER = 4097.0  # 2^12 + 1 for f32 (24-bit mantissa)


def two_sum(a, b):
    """Knuth: s + err == a + b exactly."""
    s = a + b
    bb = s - a
    err = (a - (s - bb)) + (b - bb)
    return s, err


def fast_two_sum(a, b):
    """Dekker: requires |a| >= |b|; s + err == a + b exactly."""
    s = a + b
    err = b - (s - a)
    return s, err


def split(a):
    """Dekker split into two non-overlapping 12-bit halves."""
    c = a * _SPLITTER
    hi = c - (c - a)
    return hi, a - hi


def two_prod(a, b):
    """p + err == a * b exactly (Dekker, no FMA)."""
    p = a * b
    ah, al = split(a)
    bh, bl = split(b)
    err = ((ah * bh - p) + ah * bl + al * bh) + al * bl
    return p, err


def df_from_f64(x64) -> DF:
    """Host-side: split a float64 array into an f32 double-float pair."""
    x64 = np.asarray(x64, np.float64)
    hi = x64.astype(np.float32)
    lo = (x64 - hi.astype(np.float64)).astype(np.float32)
    return DF(jnp.asarray(hi), jnp.asarray(lo))


def df_to_f64(x: DF):
    """Host-side: recombine to float64."""
    return np.asarray(x.hi, np.float64) + np.asarray(x.lo, np.float64)


def df_zeros_like(t) -> DF:
    z = jax.tree_util.tree_map(jnp.zeros_like, t)
    return DF(z, jax.tree_util.tree_map(jnp.zeros_like, t))


def df_add(x: DF, y: DF) -> DF:
    """Double-float addition (Dekker add2: ~1 ulp of the df format)."""
    s, e = two_sum(x.hi, y.hi)
    e = e + x.lo + y.lo
    hi, lo = fast_two_sum(s, e)
    return DF(hi, lo)


def df_add_f(x: DF, y) -> DF:
    s, e = two_sum(x.hi, y)
    e = e + x.lo
    hi, lo = fast_two_sum(s, e)
    return DF(hi, lo)


def df_neg(x: DF) -> DF:
    return DF(-x.hi, -x.lo)


def df_sub(x: DF, y: DF) -> DF:
    return df_add(x, df_neg(y))


def df_mul_ff(a, b) -> DF:
    """f32 * f32 -> exact double-float."""
    p, e = two_prod(a, b)
    return DF(p, e)


def df_mul(x: DF, y: DF) -> DF:
    """Double-float multiply (error ~ 2 ulp of the df format)."""
    p, e = two_prod(x.hi, y.hi)
    e = e + x.hi * y.lo + x.lo * y.hi
    hi, lo = fast_two_sum(p, e)
    return DF(hi, lo)


def df_mul_f(x: DF, s) -> DF:
    """DF * f32 (array or scalar) -> DF (error ~2 ulp of the df format)."""
    p, e = two_prod(x.hi, s)
    e = e + x.lo * s
    hi, lo = fast_two_sum(p, e)
    return DF(hi, lo)


def df_div(x: DF, y: DF) -> DF:
    """Double-float division by one long-division step (~4 ulp df).

    q1 = fl(x.hi / y.hi); r = x - q1*y computed exactly in df; the
    correction q2 = fl(r / y.hi) refines to full df accuracy.  Needed by
    the on-device assembly path (Jacobian inversion, models/fem.py
    grad_shape_physical in df arithmetic).
    """
    q1 = x.hi / y.hi
    r = df_sub(x, df_mul_f(y, q1))
    q2 = (r.hi + r.lo) / y.hi
    hi, lo = fast_two_sum(q1, q2)
    return DF(hi, lo)


def df_where(cond, x: DF, y: DF) -> DF:
    """Elementwise select on df pairs (exact)."""
    return DF(jnp.where(cond, x.hi, y.hi), jnp.where(cond, x.lo, y.lo))


def df_const(v, dtype=jnp.float32) -> DF:
    """Host-side: split python/np float64 scalars or arrays into DF
    (exact f64 -> hi+lo decomposition; setup-time only)."""
    return df_from_f64(np.asarray(v, np.float64))


def df_planes_matvec(planes_df: DF, x_df: DF) -> DF:
    """Compensated stencil matvec: y = A x with A, x double-float.

    planes_df: DF of (4, 3, 3, ny, nx); x_df: DF of (2, ny, nx).
    Returns DF (2, ny, nx) accurate to ~1e-14 relative — accurate enough
    to compute residuals at rtol 1e-8..1e-12 without f64 hardware.
    """
    ph, plo = planes_df
    ny, nx = ph.shape[-2:]
    pad = lambda a: jnp.pad(a, ((0, 0), (1, 1), (1, 1)))
    xph, xpl = pad(x_df.hi), pad(x_df.lo)

    def term(c_out):
        acc = DF(jnp.zeros((ny, nx), ph.dtype), jnp.zeros((ny, nx), ph.dtype))
        for d in range(2):
            p = 2 * c_out + d
            for dj in range(3):
                for di in range(3):
                    w = DF(ph[p, dj, di], plo[p, dj, di])
                    xw = DF(
                        xph[d, dj : dj + ny, di : di + nx],
                        xpl[d, dj : dj + ny, di : di + nx],
                    )
                    acc = df_add(acc, df_mul(w, xw))
        return acc

    y0 = term(0)
    y1 = term(1)
    return DF(jnp.stack([y0.hi, y1.hi]), jnp.stack([y0.lo, y1.lo]))


def df_sum(x: DF) -> DF:
    """Compensated full reduction by vectorized pairwise folding.

    log2(N) vectorized df_add passes — keeps ~48-bit accuracy where a plain
    jnp.sum would round at f32 (needed for the constraint-row dot products
    in the KKT residual).
    """
    hi = x.hi.reshape(-1)
    lo = x.lo.reshape(-1)
    n = hi.shape[0]
    # pad to a power of two
    p = 1 << (n - 1).bit_length() if n > 1 else 1
    hi = jnp.pad(hi, (0, p - n))
    lo = jnp.pad(lo, (0, p - n))
    while hi.shape[0] > 1:
        h = hi.shape[0] // 2
        a = DF(hi[:h], lo[:h])
        b = DF(hi[h:], lo[h:])
        s = df_add(a, b)
        hi, lo = s.hi, s.lo
    return DF(hi[0], lo[0])
