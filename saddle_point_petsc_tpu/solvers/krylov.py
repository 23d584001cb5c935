"""Krylov solvers (KSP subset) as jitted `lax.while_loop` kernels.

TPU-native equivalent of the PETSc KSP layer driven by the reference at
/root/reference/src/SaddlePointProblem.c:65-72 (KSPCreate/SetOperators/
SetFromOptions/Solve).  Solvers: CG, MINRES, GMRES(restart), FGMRES,
plus Richardson and Chebyshev (usable as smoothers/inner solvers).

Design notes (TPU-first):
- Operators and preconditioners are callables over arbitrary *pytrees* —
  a vector may be a flat array, an (ny, nx, 2) field, or a (u, lam) tuple
  for the KKT block system.  All inner products/norms reduce over leaves;
  on sharded arrays XLA lowers them to `psum` over the device mesh
  (hierarchical ICI->DCN reductions come for free from the partitioner).
- Everything is a `lax.while_loop` with static `maxiter` so the whole solve
  is one compiled XLA program: no host round-trips per iteration.
- GMRES uses CGS2 (classical Gram-Schmidt, twice) — 2 batched reductions
  per iteration instead of j sequential ones (MGS), which matters when dots
  are cross-chip psums (SURVEY.md §7 hard part (d)).

Convergence semantics match PETSc's KSPConvergedDefault: converged when
rnorm <= max(rtol * rnorm0, atol), diverged when rnorm > dtol * rnorm0,
where rnorm0 is the norm of the (preconditioned, for left-PC solvers)
right-hand side.  Norm conventions per solver follow PETSc defaults:
CG/MINRES/GMRES track the preconditioned residual norm; FGMRES (right PC)
tracks the true residual norm.
"""
from __future__ import annotations

import dataclasses
import functools
from functools import partial
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
from jax import lax

# -- converged reasons (subset of PETSc KSPConvergedReason codes) -----------
CONVERGED_RTOL = 2
CONVERGED_ATOL = 3
CONVERGED_ITS = 4
DIVERGED_NULL = -2
DIVERGED_ITS = -3
DIVERGED_DTOL = -4
DIVERGED_INDEFINITE_PC = -8
DIVERGED_NANORINF = -9

REASON_NAMES = {
    2: "CONVERGED_RTOL",
    3: "CONVERGED_ATOL",
    4: "CONVERGED_ITS",
    -2: "DIVERGED_NULL",
    -3: "DIVERGED_ITS",
    -4: "DIVERGED_DTOL",
    -8: "DIVERGED_INDEFINITE_PC",
    -9: "DIVERGED_NANORINF",
}


# -- pytree vector algebra ---------------------------------------------------

def tdot(x, y):
    """Global inner product over all leaves (psum on sharded arrays)."""
    leaves = jax.tree_util.tree_leaves(
        jax.tree_util.tree_map(lambda a, b: jnp.vdot(a, b), x, y)
    )
    return sum(leaves)


def tnorm(x):
    return jnp.sqrt(tdot(x, x).real)


def taxpy(a, x, y):
    """y + a*x elementwise over the tree."""
    return jax.tree_util.tree_map(lambda xi, yi: yi + a * xi, x, y)


def tscale(a, x):
    return jax.tree_util.tree_map(lambda xi: a * xi, x)


def tsub(x, y):
    return jax.tree_util.tree_map(jnp.subtract, x, y)

def tadd(x, y):
    return jax.tree_util.tree_map(jnp.add, x, y)


def tzeros_like(x):
    return jax.tree_util.tree_map(jnp.zeros_like, x)


@dataclasses.dataclass(frozen=True)
class KrylovResult:
    x: Any
    iterations: Any  # int scalar
    rnorm: Any  # final residual norm (per solver's norm convention)
    rnorm0: Any
    history: Any  # (maxiter+1,) residual norms, padded with -1
    converged_reason: Any  # int scalar

    @property
    def converged(self):
        return self.converged_reason > 0

    def reason_name(self):
        return REASON_NAMES.get(int(self.converged_reason), "UNKNOWN")


jax.tree_util.register_pytree_node(
    KrylovResult,
    lambda r: (
        (r.x, r.iterations, r.rnorm, r.rnorm0, r.history, r.converged_reason),
        None,
    ),
    lambda _, d: KrylovResult(*d),
)


def _identity(x):
    return x


def _check_convergence(rnorm, rnorm0, rtol, atol, dtol, it, maxiter):
    """PETSc KSPConvergedDefault logic -> (done, reason).

    Includes the KSP_DIVERGED_NANORINF guard: a non-finite residual norm
    terminates the loop immediately (the failure-detection story for a
    fail-stop solver, SURVEY.md §5)."""
    bad = ~jnp.isfinite(rnorm)
    conv_rtol = rnorm <= rtol * rnorm0
    conv_atol = rnorm <= atol
    div_dtol = rnorm > dtol * rnorm0
    div_its = it >= maxiter
    reason = jnp.where(
        bad,
        DIVERGED_NANORINF,
        jnp.where(
            conv_atol,
            CONVERGED_ATOL,
            jnp.where(
                conv_rtol,
                CONVERGED_RTOL,
                jnp.where(
                    div_dtol,
                    DIVERGED_DTOL,
                    jnp.where(div_its, DIVERGED_ITS, 0),
                ),
            ),
        ),
    )
    return reason != 0, reason


def _monitor_print(monitor, it, rnorm):
    if monitor:
        jax.debug.print("{it:>5} KSP Residual norm {r:.12e}", it=it, r=rnorm)


def _pytree_callable(f):
    """Make a callable jit-passable as a pytree argument.

    Registered operator/PC pytrees (StencilOperator, JacobiPC, ...) pass
    through; a plain function/lambda — which jit would reject as a leaf —
    is wrapped in jax.tree_util.Partial."""
    if f is None:
        return None
    leaves = jax.tree_util.tree_leaves(f)
    if len(leaves) == 1 and leaves[0] is f:
        return jax.tree_util.Partial(f)
    return f


def _self_jitting(*static_names):
    """Make a solver run as ONE jitted XLA program per call.

    Without this, an eagerly-called solve executes its prologue op-by-op
    and binds the while_loop outside jit — pathological over tunneled
    backends (per-op RTTs) and for eager shard_map dispatch on distributed
    operators (minutes instead of seconds on the fake-device CPU mesh).
    Tolerances stay dynamic (no recompile when rtol changes); sizes
    (maxiter/restart) and flags are static.
    """

    def deco(impl):
        jitted = jax.jit(impl, static_argnames=static_names)

        @functools.wraps(impl)
        def wrapper(A, b, M=None, x0=None, **kw):
            return jitted(
                _pytree_callable(A), b, M=_pytree_callable(M), x0=x0, **kw
            )

        return wrapper

    return deco


# ---------------------------------------------------------------------------
# CG
# ---------------------------------------------------------------------------

@_self_jitting("maxiter", "norm_type", "monitor")
def cg(
    A: Callable,
    b,
    M: Optional[Callable] = None,
    x0=None,
    rtol=1e-5,
    atol=1e-50,
    dtol=1e5,
    maxiter=10000,
    norm_type="preconditioned",
    monitor=False,
):
    """Preconditioned conjugate gradients (left PC, PETSc KSPCG semantics).

    A, M: callables pytree->pytree; M must be SPD.  Norm options:
    "preconditioned" (PETSc default), "unpreconditioned", "natural".
    """
    if M is None:
        M = _identity
    if x0 is None:
        x0 = tzeros_like(b)

    def norm_of(r, z, rzdot):
        if norm_type == "preconditioned":
            return tnorm(z)
        if norm_type == "unpreconditioned":
            return tnorm(r)
        return jnp.sqrt(jnp.abs(rzdot))  # natural

    r = tsub(b, A(x0))
    z = M(r)
    rz = tdot(r, z)
    zb = M(b)
    bnorm = norm_of(b, zb, tdot(b, zb))
    rnorm = norm_of(r, z, rz)
    history = jnp.full((maxiter + 1,), -1.0, rnorm.dtype).at[0].set(rnorm)
    _monitor_print(monitor, 0, rnorm)
    done0, reason0 = _check_convergence(
        rnorm, bnorm, rtol, atol, dtol, 0, maxiter
    )

    def cond(state):
        _, _, _, _, _, _, _, done, _ = state
        return ~done

    def body(state):
        x, r, z, p, rz, it, history, done, reason = state
        w = A(p)
        pw = tdot(p, w)
        alpha = rz / pw
        x = taxpy(alpha, p, x)
        r = taxpy(-alpha, w, r)
        z = M(r)
        rz_new = tdot(r, z)
        beta = rz_new / rz
        p = taxpy(beta, p, z)
        it = it + 1
        rnorm = norm_of(r, z, rz_new)
        history = history.at[it].set(rnorm)
        _monitor_print(monitor, it, rnorm)
        done, reason = _check_convergence(
            rnorm, bnorm, rtol, atol, dtol, it, maxiter
        )
        # indefinite operator guard
        bad = pw <= 0.0
        done = done | bad
        reason = jnp.where(bad, DIVERGED_NULL, reason)
        return (x, r, z, p, rz_new, it, history, done, reason)

    state = (x0, r, z, z, rz, jnp.int32(0), history, done0, reason0)
    x, r, z, p, rz, it, history, done, reason = lax.while_loop(
        cond, body, state
    )
    rnorm = history[it]
    return KrylovResult(x, it, rnorm, bnorm, history, reason)


def _kdot(x, y):
    """Per-column dot over a leading-k batch: (k, ...) -> (k,)."""
    return jnp.sum(
        (x * y).reshape(x.shape[0], -1), axis=1
    )


def _kax(a, x, y):
    """y + a[k] * x with a (k,) broadcast over trailing dims."""
    return y + a.reshape((-1,) + (1,) * (x.ndim - 1)) * x


@_self_jitting("maxiter", "monitor")
def cg_multi(
    A: Callable,
    B,
    M: Optional[Callable] = None,
    x0=None,
    rtol=1e-5,
    atol=1e-50,
    dtol=1e5,
    maxiter=10000,
    monitor=False,
):
    """Pseudo-block CG over k right-hand sides — KSPMatSolve semantics.

    A and M are BATCHED callables mapping (k, ...) -> (k, ...): the
    operator's SpMM path (StencilOperator.matmat_field /
    DistStencilOperator.matmat_field — one operator stream amortized
    over all k columns, one halo exchange per iteration for all k in
    the distributed case).  Each column runs its own CG recurrence
    (independent alpha/beta per column, exactly PETSc's pseudo-block
    KSPMatSolve); the loop stops when EVERY column converged.  This is
    the production consumer of the SpMM kernels the north star pairs
    with SpMV ("distributed SpMV/SpMM as Pallas kernels").

    Returns a KrylovResult whose x is the (k, ...) solution batch and
    whose rnorm/bnorm/reason are (k,) vectors; `iterations` is the
    iteration count of the slowest column.
    """
    if M is None:
        M = _identity
    if x0 is None:
        x0 = jnp.zeros_like(B)

    R = B - A(x0)
    Z = M(R)
    rz = _kdot(R, Z)
    Zb = M(B)
    bnorm = jnp.sqrt(_kdot(Zb, Zb))
    rnorm = jnp.sqrt(_kdot(Z, Z))
    k = B.shape[0]
    history = (
        jnp.full((maxiter + 1, k), -1.0, rnorm.dtype).at[0].set(rnorm)
    )
    tiny = jnp.asarray(atol, rnorm.dtype)
    done0 = rnorm <= jnp.maximum(rtol * bnorm, tiny)

    def cond(state):
        return ~jnp.all(state[7])

    def body(state):
        X, R, Z, P, rz, it, history, done, reason = state
        W = A(P)
        pw = _kdot(P, W)
        alpha = jnp.where(done, 0.0, rz / jnp.where(pw == 0, 1.0, pw))
        X = _kax(alpha, P, X)
        R = _kax(-alpha, W, R)
        Z = M(R)
        rz_new = _kdot(R, Z)
        beta = jnp.where(done, 0.0, rz_new / jnp.where(rz == 0, 1.0, rz))
        P = _kax(beta, P, Z)
        it = it + 1
        rnorm = jnp.sqrt(_kdot(Z, Z))
        history = history.at[it].set(rnorm)
        _monitor_print(monitor, it, jnp.max(rnorm))
        conv = rnorm <= jnp.maximum(rtol * bnorm, tiny)
        div = (rnorm > dtol * bnorm) | ~jnp.isfinite(rnorm) | (pw <= 0.0)
        newly = ~done
        reason = jnp.where(
            newly & conv, CONVERGED_RTOL,
            jnp.where(newly & div, DIVERGED_NULL, reason),
        )
        done = done | conv | div | (it >= maxiter)
        reason = jnp.where(
            done & (reason == 0), DIVERGED_ITS, reason
        )
        return (X, R, Z, P, rz_new, it, history, done, reason)

    reason0 = jnp.where(done0, CONVERGED_RTOL, jnp.int32(0))
    state = (
        x0, R, Z, Z, rz, jnp.int32(0), history, done0, reason0
    )
    X, R, Z, P, rz, it, history, done, reason = lax.while_loop(
        cond, body, state
    )
    return KrylovResult(X, it, history[it], bnorm, history, reason)


# ---------------------------------------------------------------------------
# MINRES
# ---------------------------------------------------------------------------

@_self_jitting("maxiter", "monitor")
def minres(
    A: Callable,
    b,
    M: Optional[Callable] = None,
    x0=None,
    rtol=1e-5,
    atol=1e-50,
    dtol=1e5,
    maxiter=10000,
    monitor=False,
):
    """Preconditioned MINRES (Paige–Saunders) for symmetric (indefinite) A.

    M must be SPD.  Tracks the preconditioned residual norm phi-bar
    (PETSc KSPMINRES default norm).  This is the workhorse for the
    saddle-point KKT system [[A,B^T],[B,0]] (BASELINE.md config 1).
    """
    if M is None:
        M = _identity
    if x0 is None:
        x0 = tzeros_like(b)

    r2 = tsub(b, A(x0))
    y = M(r2)
    beta1sq = tdot(r2, y)
    beta1 = jnp.sqrt(jnp.maximum(beta1sq, 0.0))
    # rnorm0: preconditioned norm of b (PETSc convergence reference)
    bnorm = jnp.sqrt(jnp.maximum(tdot(b, M(b)), 0.0))
    rnorm = beta1
    history = jnp.full((maxiter + 1,), -1.0, rnorm.dtype).at[0].set(rnorm)
    _monitor_print(monitor, 0, rnorm)
    done0, reason0 = _check_convergence(
        rnorm, bnorm, rtol, atol, dtol, 0, maxiter
    )
    done0 = done0 | (beta1sq < 0.0)
    reason0 = jnp.where(beta1sq < 0.0, DIVERGED_INDEFINITE_PC, reason0)

    eps = jnp.finfo(rnorm.dtype).eps
    zero = tzeros_like(b)

    def cond(state):
        return ~state["done"]

    def body(state):
        it = state["it"] + 1
        beta, oldb = state["beta"], state["oldb"]
        v = tscale(1.0 / beta, state["y"])
        y = A(v)
        y = lax.cond(
            it >= 2,
            lambda y: taxpy(-(beta / oldb), state["r1"], y),
            lambda y: y,
            y,
        )
        alfa = tdot(v, y)
        y = taxpy(-(alfa / beta), state["r2"], y)
        r1, r2 = state["r2"], y
        y = M(r2)
        oldb_n = beta
        beta_n = jnp.sqrt(jnp.maximum(tdot(r2, y), 0.0))
        # Givens QR of the tridiagonal
        oldeps = state["epsln"]
        delta = state["cs"] * state["dbar"] + state["sn"] * alfa
        gbar = state["sn"] * state["dbar"] - state["cs"] * alfa
        epsln = state["sn"] * beta_n
        dbar = -state["cs"] * beta_n
        gamma = jnp.maximum(jnp.sqrt(gbar**2 + beta_n**2), eps)
        cs = gbar / gamma
        sn = beta_n / gamma
        phi = cs * state["phibar"]
        phibar = sn * state["phibar"]
        w1 = state["w2"]
        w2 = state["w"]
        w = tscale(
            1.0 / gamma,
            tsub(v, tadd(tscale(oldeps, w1), tscale(delta, w2))),
        )
        x = taxpy(phi, w, state["x"])
        rnorm = jnp.abs(phibar)
        history = state["history"].at[it].set(rnorm)
        _monitor_print(monitor, it, rnorm)
        done, reason = _check_convergence(
            rnorm, bnorm, rtol, atol, dtol, it, maxiter
        )
        return dict(
            x=x, y=y, r1=r1, r2=r2, w=w, w1=w1, w2=w2,
            oldb=oldb_n, beta=beta_n, dbar=dbar, epsln=epsln,
            cs=cs, sn=sn, phibar=phibar, it=it,
            history=history, done=done, reason=reason,
        )

    state = dict(
        x=x0, y=y, r1=r2, r2=r2, w=zero, w1=zero, w2=zero,
        oldb=jnp.zeros_like(rnorm), beta=beta1,
        dbar=jnp.zeros_like(rnorm), epsln=jnp.zeros_like(rnorm),
        cs=jnp.full_like(rnorm, -1.0), sn=jnp.zeros_like(rnorm),
        phibar=beta1, it=jnp.int32(0),
        history=history, done=done0, reason=reason0,
    )
    state = lax.while_loop(cond, body, state)
    return KrylovResult(
        state["x"],
        state["it"],
        state["history"][state["it"]],
        bnorm,
        state["history"],
        state["reason"],
    )


# ---------------------------------------------------------------------------
# GMRES / FGMRES
# ---------------------------------------------------------------------------

def _tree_stack_zeros(template, k):
    """Allocate a (k, ...) buffer per leaf for a Krylov basis."""
    return jax.tree_util.tree_map(
        lambda a: jnp.zeros((k,) + a.shape, a.dtype), template
    )


def _basis_set(V, j, v):
    return jax.tree_util.tree_map(
        lambda buf, leaf: lax.dynamic_update_index_in_dim(buf, leaf, j, 0),
        V,
        v,
    )


def _basis_get(V, j):
    return jax.tree_util.tree_map(
        lambda buf: lax.dynamic_index_in_dim(buf, j, 0, keepdims=False), V
    )


def _basis_dots(V, w):
    """All inner products <V_i, w> in one batched reduction, (k,)."""
    per_leaf = jax.tree_util.tree_map(
        lambda buf, leaf: jnp.tensordot(
            buf.reshape(buf.shape[0], -1),
            leaf.reshape(-1),
            axes=1,
        ),
        V,
        w,
    )
    return sum(jax.tree_util.tree_leaves(per_leaf))


def _basis_axpy(V, coefs, w):
    """w + sum_i coefs[i] * V_i (single fused contraction per leaf)."""
    return jax.tree_util.tree_map(
        lambda buf, leaf: leaf
        + jnp.tensordot(coefs, buf.reshape(buf.shape[0], -1), axes=1).reshape(
            leaf.shape
        ),
        V,
        w,
    )


def _gmres_impl(
    A, b, M, x0, rtol, atol, dtol, maxiter, restart, monitor, flexible
):
    """Shared GMRES/FGMRES implementation.

    flexible=False: left-preconditioned GMRES; Arnoldi runs on M∘A; the
      tracked norm is the preconditioned residual (PETSc KSPGMRES default).
    flexible=True: right-preconditioned FGMRES; stores Z_j = M(v_j); the
      tracked norm is the true residual (PETSc KSPFGMRES).
    CGS2 orthogonalization: two batched dot-blocks per inner iteration.
    """
    m = restart
    if M is None:
        M = _identity

    def pre_res(x):
        r = tsub(b, A(x))
        return M(r) if not flexible else r

    b_eff = M(b) if not flexible else b
    bnorm = tnorm(b_eff)
    r0 = pre_res(x0)
    rnorm0 = tnorm(r0)
    history = jnp.full((maxiter + 1,), -1.0, rnorm0.dtype).at[0].set(rnorm0)
    _monitor_print(monitor, 0, rnorm0)
    done0, reason0 = _check_convergence(
        rnorm0, bnorm, rtol, atol, dtol, 0, maxiter
    )
    rdtype = rnorm0.dtype
    eps = jnp.finfo(rdtype).eps

    def cycle(x, it, history, done, reason):
        """One restart cycle of <= m Arnoldi steps."""
        r = pre_res(x)
        beta = tnorm(r)
        V = _tree_stack_zeros(b, m + 1)
        Z = _tree_stack_zeros(b, m) if flexible else None
        # guard division only against exact zero — an absolute eps floor
        # breaks scale invariance (rhs norms below f32 eps, as produced by
        # iterative-refinement correction solves, would leave v0 unnormalized
        # and collapse the Arnoldi basis)
        V = _basis_set(V, 0, tscale(1.0 / jnp.where(beta > 0, beta, 1.0), r))
        H = jnp.zeros((m + 1, m), rdtype)
        cs = jnp.zeros((m,), rdtype)
        sn = jnp.zeros((m,), rdtype)
        g = jnp.zeros((m + 1,), rdtype).at[0].set(beta)

        def inner_cond(s):
            return (~s["done"]) & (s["j"] < m)

        def inner_body(s):
            j, V, H, g, cs, sn = s["j"], s["V"], s["H"], s["g"], s["cs"], s["sn"]
            Z = s["Z"]
            it = s["it"] + 1
            v = _basis_get(V, j)
            if flexible:
                z = M(v)
                Z = _basis_set(Z, j, z)
                w = A(z)
            else:
                w = M(A(v))
            # CGS2: orthogonalize twice against V[0..m]; rows > j are zero
            # vectors so their dots vanish — masking handled by zero basis.
            h1 = _basis_dots(V, w)
            w = _basis_axpy(V, -h1, w)
            h2 = _basis_dots(V, w)
            w = _basis_axpy(V, -h2, w)
            h = h1 + h2  # (m+1,)
            hnew = tnorm(w)
            Hcol = h.at[j + 1].set(hnew)
            V = _basis_set(
                V, j + 1, tscale(1.0 / jnp.where(hnew > 0, hnew, 1.0), w)
            )
            # apply previous Givens rotations to the new column
            def rot_body(i, Hcol):
                hi = cs[i] * Hcol[i] + sn[i] * Hcol[i + 1]
                hip = -sn[i] * Hcol[i] + cs[i] * Hcol[i + 1]
                return Hcol.at[i].set(hi).at[i + 1].set(hip)

            Hcol = lax.fori_loop(0, j, rot_body, Hcol)
            denom = jnp.sqrt(Hcol[j] ** 2 + Hcol[j + 1] ** 2)
            denom = jnp.where(denom > 0, denom, 1.0)
            c_j = Hcol[j] / denom
            s_j = Hcol[j + 1] / denom
            Hcol = Hcol.at[j].set(denom).at[j + 1].set(0.0)
            gj = c_j * g[j]
            gj1 = -s_j * g[j]
            g = g.at[j].set(gj).at[j + 1].set(gj1)
            cs = cs.at[j].set(c_j)
            sn = sn.at[j].set(s_j)
            H = lax.dynamic_update_slice(
                H, Hcol[:, None], (jnp.zeros_like(j), j)
            )
            rnorm = jnp.abs(gj1)
            history = s["history"].at[it].set(rnorm)
            _monitor_print(monitor, it, rnorm)
            done, reason = _check_convergence(
                rnorm, bnorm, rtol, atol, dtol, it, maxiter
            )
            # happy breakdown, judged RELATIVE to the column magnitude
            # (|w_pre|^2 = sum h^2 + hnew^2 since V is orthonormal)
            hcol = jnp.sqrt(jnp.sum(h * h) + hnew * hnew)
            done = done | (hnew <= eps * 100.0 * hcol)
            return dict(
                j=j + 1, V=V, Z=Z, H=H, g=g, cs=cs, sn=sn, it=it,
                history=history, done=done, reason=reason,
            )

        s = dict(
            j=jnp.int32(0), V=V, Z=Z, H=H, g=g, cs=cs, sn=sn, it=it,
            history=history, done=done, reason=reason,
        )
        s = lax.while_loop(inner_cond, inner_body, s)
        j, V, Z, H, g = s["j"], s["V"], s["Z"], s["H"], s["g"]
        # back-substitution on the j x j triangular system (masked, static m)
        y = jnp.zeros((m,), rdtype)

        def back_body(k, y):
            i = m - 1 - k
            active = i < j
            num = g[i] - jnp.dot(H[i, :], y)
            hii = jnp.where(jnp.abs(H[i, i]) > 0, H[i, i], 1.0)
            yi = jnp.where(active, num / hii, 0.0)
            return y.at[i].set(yi)

        y = lax.fori_loop(0, m, back_body, y)
        if flexible:
            x = _basis_axpy(Z, y, x)
        else:
            x = _basis_axpy(
                jax.tree_util.tree_map(lambda buf: buf[:m], V), y, x
            )
        return x, s["it"], s["history"], s["done"], s["reason"]

    def outer_cond(state):
        return ~state[3]

    def outer_body(state):
        x, it, history, done, reason = state
        return cycle(x, it, history, done, reason)

    x, it, history, done, reason = lax.while_loop(
        outer_cond,
        outer_body,
        (x0, jnp.int32(0), history, done0, reason0),
    )
    return KrylovResult(x, it, history[it], bnorm, history, reason)


@_self_jitting("maxiter", "restart", "monitor")
def gmres(
    A: Callable,
    b,
    M: Optional[Callable] = None,
    x0=None,
    rtol=1e-5,
    atol=1e-50,
    dtol=1e5,
    maxiter=10000,
    restart=30,
    monitor=False,
):
    """Left-preconditioned restarted GMRES (PETSc KSPGMRES semantics)."""
    if x0 is None:
        x0 = tzeros_like(b)
    return _gmres_impl(
        A, b, M, x0, rtol, atol, dtol, maxiter, restart, monitor, False
    )


@_self_jitting("maxiter", "restart", "monitor")
def fgmres(
    A: Callable,
    b,
    M: Optional[Callable] = None,
    x0=None,
    rtol=1e-5,
    atol=1e-50,
    dtol=1e5,
    maxiter=10000,
    restart=30,
    monitor=False,
):
    """Flexible (right-preconditioned) restarted GMRES — the preconditioner
    may change between iterations (e.g. an inner CG Schur solve).
    PETSc KSPFGMRES semantics; tracks the true residual norm."""
    if x0 is None:
        x0 = tzeros_like(b)
    return _gmres_impl(
        A, b, M, x0, rtol, atol, dtol, maxiter, restart, monitor, True
    )


# ---------------------------------------------------------------------------
# Richardson / Chebyshev (smoothers & inner solvers)
# ---------------------------------------------------------------------------

@_self_jitting("maxiter", "monitor")
def richardson(
    A: Callable,
    b,
    M: Optional[Callable] = None,
    x0=None,
    scale=1.0,
    rtol=1e-5,
    atol=1e-50,
    dtol=1e5,
    maxiter=10,
    monitor=False,
):
    """Damped Richardson iteration x += scale * M(b - A x)."""
    if M is None:
        M = _identity
    if x0 is None:
        x0 = tzeros_like(b)
    bnorm = tnorm(b)

    def body(i, state):
        x, history = state
        r = tsub(b, A(x))
        x = taxpy(scale, M(r), x)
        history = history.at[i + 1].set(tnorm(r))
        return (x, history)

    history = jnp.full((maxiter + 1,), -1.0, bnorm.dtype).at[0].set(
        tnorm(tsub(b, A(x0)))
    )
    x, history = lax.fori_loop(0, maxiter, body, (x0, history))
    rnorm = history[maxiter]
    _, reason = _check_convergence(
        rnorm, bnorm, rtol, atol, dtol, maxiter, maxiter
    )
    return KrylovResult(
        x, jnp.int32(maxiter), rnorm, bnorm, history, reason
    )


@_self_jitting("maxiter")
def chebyshev_fixed(
    A: Callable,
    b,
    M: Optional[Callable] = None,
    x0=None,
    lmin=0.1,
    lmax=1.1,
    maxiter=10,
):
    """Fixed-count Chebyshev semi-iteration on bounds [lmin, lmax] of M A.

    Inner-product-free: ideal as a parallel smoother / ILU-class substitute
    on TPU (no psums at all).  Standard three-term recurrence.  This is the
    smoother/PC building block (ChebyshevPC); the KSP entry point with
    convergence testing is `chebyshev` below.
    """
    if M is None:
        M = _identity
    if x0 is None:
        x0 = tzeros_like(b)
    theta = 0.5 * (lmax + lmin)
    delta = 0.5 * (lmax - lmin)
    sigma1 = theta / delta

    r = tsub(b, A(x0))
    z = M(r)
    rho = 1.0 / sigma1
    d = tscale(1.0 / theta, z)
    x = tadd(x0, d)

    def body(i, state):
        x, d, rho = state
        r = tsub(b, A(x))
        z = M(r)
        rho_new = 1.0 / (2.0 * sigma1 - rho)
        d = tadd(
            tscale(rho_new * rho, d), tscale(2.0 * rho_new / delta, z)
        )
        x = tadd(x, d)
        return (x, d, rho_new)

    x, d, rho = lax.fori_loop(1, maxiter, body, (x, d, rho))
    rnorm = tnorm(tsub(b, A(x)))
    history = jnp.full((maxiter + 1,), -1.0, rnorm.dtype).at[0].set(rnorm)
    return KrylovResult(
        x, jnp.int32(maxiter), rnorm, tnorm(b), history, jnp.int32(CONVERGED_ITS)
    )


@_self_jitting("maxiter", "monitor")
def chebyshev(
    A: Callable,
    b,
    M: Optional[Callable] = None,
    x0=None,
    lmin=0.1,
    lmax=1.1,
    rtol=1e-5,
    atol=1e-50,
    dtol=1e5,
    maxiter=10000,
    monitor=False,
):
    """Chebyshev iteration with PETSc-default convergence testing
    (KSPCHEBYSHEV semantics: true-residual norm checked each iteration, so
    `-ksp_type chebyshev` terminates at rtol instead of running max_it
    unconditional sweeps)."""
    if M is None:
        M = _identity
    if x0 is None:
        x0 = tzeros_like(b)
    theta = 0.5 * (lmax + lmin)
    delta = 0.5 * (lmax - lmin)
    sigma1 = theta / delta
    bnorm = tnorm(b)

    r = tsub(b, A(x0))
    rnorm = tnorm(r)
    history = jnp.full((maxiter + 1,), -1.0, rnorm.dtype).at[0].set(rnorm)
    _monitor_print(monitor, 0, rnorm)
    done0, reason0 = _check_convergence(
        rnorm, bnorm, rtol, atol, dtol, 0, maxiter
    )

    def cond(s):
        return ~s["done"]

    def body(s):
        it = s["it"] + 1
        first = it == 1
        z = M(s["r"])
        rho_new = jnp.where(
            first, 1.0 / sigma1, 1.0 / (2.0 * sigma1 - s["rho"])
        )
        # first step: d = z / theta; later: three-term recurrence
        d = jax.tree_util.tree_map(
            lambda di, zi: jnp.where(
                first,
                zi / theta,
                rho_new * s["rho"] * di + (2.0 * rho_new / delta) * zi,
            ),
            s["d"],
            z,
        )
        x = tadd(s["x"], d)
        r = tsub(b, A(x))
        rnorm = tnorm(r)
        history = s["history"].at[it].set(rnorm)
        _monitor_print(monitor, it, rnorm)
        done, reason = _check_convergence(
            rnorm, bnorm, rtol, atol, dtol, it, maxiter
        )
        return dict(
            x=x, r=r, d=d, rho=rho_new, it=it,
            history=history, done=done, reason=reason,
        )

    state = dict(
        x=x0, r=r, d=tzeros_like(b), rho=jnp.ones_like(rnorm),
        it=jnp.int32(0), history=history, done=done0, reason=reason0,
    )
    state = lax.while_loop(cond, body, state)
    return KrylovResult(
        state["x"], state["it"], state["history"][state["it"]], bnorm,
        state["history"], state["reason"],
    )


@_self_jitting("maxiter", "monitor")
def bcgs(
    A: Callable,
    b,
    M: Optional[Callable] = None,
    x0=None,
    rtol=1e-5,
    atol=1e-50,
    dtol=1e5,
    maxiter=10000,
    monitor=False,
):
    """Preconditioned BiCGStab (PETSc KSPBCGS, right-preconditioned form).

    For nonsymmetric systems; two matvecs + two PC applies per iteration,
    short recurrences (no restart memory).  Tracks the true residual norm.
    """
    if M is None:
        M = _identity
    if x0 is None:
        x0 = tzeros_like(b)
    bnorm = tnorm(b)
    r = tsub(b, A(x0))
    r0hat = r
    rnorm = tnorm(r)
    history = jnp.full((maxiter + 1,), -1.0, rnorm.dtype).at[0].set(rnorm)
    _monitor_print(monitor, 0, rnorm)
    done0, reason0 = _check_convergence(
        rnorm, bnorm, rtol, atol, dtol, 0, maxiter
    )
    eps = jnp.finfo(rnorm.dtype).tiny

    def cond(s):
        return ~s["done"]

    def body(s):
        it = s["it"] + 1
        rho_new = tdot(r0hat, s["r"])
        beta = (rho_new / jnp.where(s["rho"] == 0, eps, s["rho"])) * (
            s["alpha"] / jnp.where(s["omega"] == 0, eps, s["omega"])
        )
        p = taxpy(
            beta,
            taxpy(-s["omega"], s["v"], s["p"]),
            s["r"],
        )
        phat = M(p)
        v = A(phat)
        alpha = rho_new / jnp.where(
            tdot(r0hat, v) == 0, eps, tdot(r0hat, v)
        )
        sres = taxpy(-alpha, v, s["r"])
        shat = M(sres)
        t = A(shat)
        tt = tdot(t, t)
        omega = tdot(t, sres) / jnp.where(tt == 0, eps, tt)
        x = taxpy(omega, shat, taxpy(alpha, phat, s["x"]))
        r = taxpy(-omega, t, sres)
        rnorm = tnorm(r)
        history = s["history"].at[it].set(rnorm)
        _monitor_print(monitor, it, rnorm)
        done, reason = _check_convergence(
            rnorm, bnorm, rtol, atol, dtol, it, maxiter
        )
        return dict(
            x=x, r=r, p=p, v=v, rho=rho_new, alpha=alpha, omega=omega,
            it=it, history=history, done=done, reason=reason,
        )

    one = jnp.ones_like(rnorm)
    state = dict(
        x=x0, r=r, p=tzeros_like(b), v=tzeros_like(b),
        rho=one, alpha=one, omega=one,
        it=jnp.int32(0), history=history, done=done0, reason=reason0,
    )
    state = lax.while_loop(cond, body, state)
    return KrylovResult(
        state["x"], state["it"], state["history"][state["it"]], bnorm,
        state["history"], state["reason"],
    )


SOLVERS = {
    "cg": cg,
    "minres": minres,
    "gmres": gmres,
    "fgmres": fgmres,
    "bcgs": bcgs,
    "richardson": richardson,
    "chebyshev": chebyshev,
}
