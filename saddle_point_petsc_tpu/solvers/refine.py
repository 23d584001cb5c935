"""Mixed-precision iterative refinement: rtol 1e-8+ solves on f32-only TPUs.

The classic scheme (Wilkinson; standard on GPUs/TPUs without fast f64):

    x stored as a double-float pair; repeat:
      r   = b - A x          <- compensated double-float residual (~1e-14)
      dx  = solve(A, r.hi)   <- fast f32 Krylov to a loose tolerance
      x  += dx               <- double-float update

Each cycle multiplies the residual by the inner solve's reduction factor
until the ~1e-14 double-float limit, so rtol 1e-8 (the north-star
tolerance, BASELINE.md) is reached with every matvec of the inner solver
running at the f32 speed of light.  Cost: one df matvec (~2x a normal
matvec) per cycle — negligible next to the inner iterations.

Works with any (2, ny, nx)-field operator exposing `.planes`
(StencilOperator, DistStencilOperator) and any inner solver from
solvers/krylov.py.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np

from saddle_point_petsc_tpu.ops.doublefloat import (
    DF,
    df_add,
    df_from_f64,
    df_planes_matvec,
    df_sub,
    df_to_f64,
)
from saddle_point_petsc_tpu.solvers import krylov


@dataclasses.dataclass(frozen=True)
class RefineResult:
    x: DF  # double-float solution field
    cycles: int
    inner_iterations: int
    rnorm: Any  # accurate final residual norm
    rnorm0: Any
    history: Any  # per-cycle accurate residual norms

    @property
    def converged(self):
        return bool(self.rnorm <= self.rtol_target * self.rnorm0)

    rtol_target: float = 1e-8


def solve_refined(
    A,
    b_df: DF,
    inner_solve: Callable,
    rtol=1e-8,
    max_cycles=10,
    matvec_df: Callable = None,
):
    """Iterative refinement driver (host loop over jitted cycles).

    A: operator with `.planes` (f32); for full accuracy pass an operator
    whose true (f64) coefficients are carried in `A_df` via
    `make_df_operator`.  b_df: double-float RHS.  inner_solve: callable
    r_f32 -> dx_f32 (e.g. a jitted CG/MG solve to rtol ~1e-4).

    matvec_df: optional compensated matvec x_df -> DF replacing the
    stencil-planes default — e.g. `dist_csr.dist_aij_matvec_df` for
    general sparse operators (the reference's f64 MATMPIAIJ equivalent,
    ref /root/reference/src/SaddlePointProblem.c:70).  With it, A may be
    any operator (only the inner solve uses it).
    """
    if matvec_df is None:
        planes_df = getattr(A, "planes_df", None)
        if planes_df is None:
            planes_df = DF(A.planes, jnp.zeros_like(A.planes))
        matvec_df = lambda x_df: df_planes_matvec(planes_df, x_df)

    @jax.jit
    def residual(x_df):
        return df_sub(b_df, matvec_df(x_df))

    @jax.jit
    def update(x_df, dx):
        return df_add(x_df, DF(dx, jnp.zeros_like(dx)))

    @jax.jit
    def _norm_dev(df):
        # f32 norm of the accurately-computed residual: no cancellation in
        # the norm itself, so f32 is plenty; only a scalar crosses to host
        v = df.hi + df.lo
        return jnp.sqrt(jnp.sum(v.astype(jnp.float32) ** 2))

    def norm(df):
        return float(np.asarray(_norm_dev(df)))

    x = DF(jnp.zeros_like(b_df.hi), jnp.zeros_like(b_df.lo))
    bnorm = norm(b_df)
    history = []
    inner_total = 0
    cycles = 0
    for k in range(max_cycles):
        r = residual(x)
        rn = norm(r)
        history.append(rn)
        if rn <= rtol * bnorm:
            break
        dx, its = inner_solve(r.hi)
        inner_total += its
        x = update(x, dx)
        cycles += 1
    else:
        r = residual(x)
        history.append(norm(r))
    return RefineResult(
        x, cycles, inner_total, history[-1], bnorm, history, rtol
    )


def make_df_operator(assemble_f64_planes):
    """Helper: split host-assembled f64 planes into a DF pair."""
    return df_from_f64(np.asarray(assemble_f64_planes))


def inner_cg(A, M=None, rtol=1e-4, maxiter=200):
    """Standard inner solver factory for refinement."""

    @jax.jit
    def run(r):
        res = krylov.cg(A, r, M=M, rtol=rtol, maxiter=maxiter)
        return res.x, res.iterations

    def solve(r):
        x, its = run(r)
        return x, int(its)

    return solve


# ---------------------------------------------------------------------------
# KKT (saddle) refinement
# ---------------------------------------------------------------------------


def solve_refined_kkt(
    K,
    b_df,
    inner_solve,
    rtol=1e-8,
    max_cycles=12,
    planes_df: DF = None,
    Bf_df: DF = None,
):
    """Iterative refinement for the KKT system [[A,B^T],[B,0]].

    b_df: (DF f-field, DF g-vector).  inner_solve: (r_u, r_lam) f32 ->
    ((du, dlam), iterations) — e.g. a jitted Schur-preconditioned MINRES.
    planes_df/Bf_df: double-float operator coefficients (default: exact-f32
    interpretation of K's arrays).
    """
    from saddle_point_petsc_tpu.ops.doublefloat import (
        df_mul,
        df_mul_ff,
        df_sum,
    )

    if planes_df is None:
        planes_df = DF(K.A.planes, jnp.zeros_like(K.A.planes))
    if Bf_df is None:
        Bf_df = DF(K.Bf, jnp.zeros_like(K.Bf))
    fb_df, gb_df = b_df
    m = Bf_df.hi.shape[0]

    @jax.jit
    def residual(x_df):
        u_df, lam_df = x_df
        au = df_planes_matvec(planes_df, u_df)
        # + B^T lam: sum_m lam_m * Brow_m (elementwise df)
        for i in range(m):
            lam_i = DF(lam_df.hi[i], lam_df.lo[i])
            row = DF(Bf_df.hi[i], Bf_df.lo[i])
            term = df_mul(DF(jnp.broadcast_to(lam_i.hi, row.hi.shape),
                             jnp.broadcast_to(lam_i.lo, row.hi.shape)), row)
            au = df_add(au, term)
        ru = df_sub(fb_df, au)
        # B u (m compensated reductions)
        bu_hi = []
        bu_lo = []
        for i in range(m):
            row = DF(Bf_df.hi[i], Bf_df.lo[i])
            s = df_sum(df_mul(row, u_df))
            bu_hi.append(s.hi)
            bu_lo.append(s.lo)
        bu = DF(jnp.stack(bu_hi), jnp.stack(bu_lo))
        rlam = df_sub(gb_df, bu)
        return ru, rlam

    @jax.jit
    def update(x_df, dx):
        u_df, lam_df = x_df
        du, dlam = dx
        return (
            df_add(u_df, DF(du, jnp.zeros_like(du))),
            df_add(lam_df, DF(dlam, jnp.zeros_like(dlam))),
        )

    @jax.jit
    def _norm2_dev(pair):
        ru, rlam = pair
        a = (ru.hi + ru.lo).astype(jnp.float32)
        b = (rlam.hi + rlam.lo).astype(jnp.float32)
        return jnp.sqrt(jnp.sum(a * a) + jnp.sum(b * b))

    def norm2(pair):
        return float(np.asarray(_norm2_dev(pair)))

    x = (
        DF(jnp.zeros_like(fb_df.hi), jnp.zeros_like(fb_df.lo)),
        DF(jnp.zeros_like(gb_df.hi), jnp.zeros_like(gb_df.lo)),
    )
    bnorm = norm2(b_df)
    history = []
    inner_total = 0
    cycles = 0
    for _ in range(max_cycles):
        r = residual(x)
        rn = norm2(r)
        history.append(rn)
        if rn <= rtol * bnorm:
            break
        dx, its = inner_solve(r[0].hi, r[1].hi)
        inner_total += its
        x = update(x, dx)
        cycles += 1
    else:
        history.append(norm2(residual(x)))
    return RefineResult(
        x, cycles, inner_total, history[-1], bnorm, history, rtol
    )


def solve_refined_kkt_fused(
    K,
    b_df,
    inner_maxiter=1500,
    inner_rtol=1e-4,
    rtol=1e-8,
    max_cycles=12,
    planes_df: DF = None,
    Bf_df: DF = None,
    M=None,
    inner=None,
    inner_operands=None,
):
    """Fully device-side refinement: one jitted lax.while_loop over
    (df residual -> f32 Krylov correction -> df update) cycles — a single
    dispatch, no host round-trips (matters on high-latency links; on
    local hardware it matches the host-loop version).

    inner: optional traced callable (r_u, r_lam) -> ((du, dlam), its)
    replacing the default MINRES+M correction solve — e.g. FGMRES with a
    multigrid-Schur PC.  If the inner solve closes over large arrays
    (MG hierarchies, operators), pass them through inner_operands (any
    pytree): inner is then called as inner(r_u, r_lam, inner_operands)
    with the operands TRACED, not baked into the program as constants.

    All operator/rhs arrays enter the compiled program as ARGUMENTS, not
    closure constants — a closure-constant design inlines the (possibly
    hundreds of MB) df coefficient planes into the HLO itself, which
    breaks remote-compile transports and bloats compile time.

    Returns (x_df, cycles, inner_its_total, rnorm, rnorm0).
    """
    from saddle_point_petsc_tpu.ops.doublefloat import df_mul
    from saddle_point_petsc_tpu.solvers import precond

    if planes_df is None:
        planes_df = DF(K.A.planes, jnp.zeros_like(K.A.planes))
    if Bf_df is None:
        Bf_df = DF(K.Bf, jnp.zeros_like(K.Bf))
    if M is None:
        M = precond.schur_pc(K.A, K.Bf, fact_type="diag")
    m = Bf_df.hi.shape[0]

    def residual(planes_df, Bf_df, fb_df, gb_df, x_df):
        u_df, lam_df = x_df
        au = df_planes_matvec(planes_df, u_df)
        for i in range(m):
            row = DF(Bf_df.hi[i], Bf_df.lo[i])
            term = df_mul(
                DF(
                    jnp.broadcast_to(lam_df.hi[i], row.hi.shape),
                    jnp.broadcast_to(lam_df.lo[i], row.hi.shape),
                ),
                row,
            )
            au = df_add(au, term)
        ru = df_sub(fb_df, au)
        from saddle_point_petsc_tpu.ops.doublefloat import df_sum

        bu_hi, bu_lo = [], []
        for i in range(m):
            row = DF(Bf_df.hi[i], Bf_df.lo[i])
            s = df_sum(df_mul(row, u_df))
            bu_hi.append(s.hi)
            bu_lo.append(s.lo)
        rlam = df_sub(gb_df, DF(jnp.stack(bu_hi), jnp.stack(bu_lo)))
        return ru, rlam

    def rnorm_of(r):
        ru, rlam = r
        a = (ru.hi + ru.lo)
        b = (rlam.hi + rlam.lo)
        return jnp.sqrt(jnp.sum(a * a) + jnp.sum(b * b))

    @jax.jit
    def _run(operands):
        planes_df, Bf_df, fb_df, gb_df, K, M, inner_ops = operands

        def res_of(x_df):
            return residual(planes_df, Bf_df, fb_df, gb_df, x_df)

        x0 = (
            DF(jnp.zeros_like(fb_df.hi), jnp.zeros_like(fb_df.lo)),
            DF(jnp.zeros_like(gb_df.hi), jnp.zeros_like(gb_df.lo)),
        )
        r0 = res_of(x0)
        bnorm = rnorm_of((fb_df, gb_df))

        def cond(s):
            x, cycles, inner_its, rn = s
            return (rn > rtol * bnorm) & (cycles < max_cycles)

        def body(s):
            x, cycles, inner_its, rn = s
            r = res_of(x)
            if inner is not None:
                if inner_operands is not None:
                    (du, dlam), its = inner(r[0].hi, r[1].hi, inner_ops)
                else:
                    (du, dlam), its = inner(r[0].hi, r[1].hi)
            else:
                res = krylov.minres(
                    K, (r[0].hi, r[1].hi), M=M, rtol=inner_rtol,
                    maxiter=inner_maxiter,
                )
                (du, dlam), its = res.x, res.iterations
            x = (
                df_add(x[0], DF(du, jnp.zeros_like(du))),
                df_add(x[1], DF(dlam, jnp.zeros_like(dlam))),
            )
            rn_new = rnorm_of(res_of(x))
            return (x, cycles + 1, inner_its + its, rn_new)

        state = (x0, jnp.int32(0), jnp.int32(0), rnorm_of(r0))
        x, cycles, inner_its, rn = jax.lax.while_loop(cond, body, state)
        return x, cycles, inner_its, rn, bnorm

    operands = (
        planes_df, Bf_df, b_df[0], b_df[1], K, M, inner_operands
    )
    return lambda: _run(operands)
