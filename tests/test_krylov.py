"""Solver tests (SURVEY.md §4 ladder step 3): CG/MINRES/GMRES/FGMRES on the
assembled system to tight tolerances; iterate counts recorded against a
scipy/PETSc-convention oracle; pytree (block-vector) support."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from saddle_point_petsc_tpu.models import poisson
from saddle_point_petsc_tpu.ops import sparse
from saddle_point_petsc_tpu.ops.stencil import stencil_to_coo
from saddle_point_petsc_tpu.solvers import krylov

from helpers import fflat


def _problem(nex=8, ney=8):
    prob = poisson.assemble_poisson(nex, ney)
    dense = np.asarray(sparse.coo_to_csr(stencil_to_coo(prob.A.W)).todense())
    x_star = np.linalg.solve(dense, fflat(prob.f))
    return prob, dense, x_star


@pytest.mark.parametrize("name", ["cg", "minres", "gmres", "fgmres"])
def test_solvers_reach_rtol_1em8(name):
    prob, dense, x_star = _problem()
    res = krylov.SOLVERS[name](prob.A, prob.f, rtol=1e-10, maxiter=500)
    assert res.converged_reason > 0
    x = fflat(res.x)
    rel = np.linalg.norm(dense @ x - fflat(prob.f)) / (
        np.linalg.norm(np.asarray(prob.f))
    )
    assert rel < 1e-8
    np.testing.assert_allclose(x, x_star, rtol=1e-6, atol=1e-10)


def test_cg_iteration_count_reasonable():
    # unpreconditioned CG on the 16x16-element BC'd vector-Laplace system:
    # iterate count should scale ~ O(1/h); sanity window (PETSc parity ±20%
    # is checked in golden tests against recorded counts).
    prob, _, _ = _problem(16, 16)
    res = krylov.cg(prob.A, prob.f, rtol=1e-8, maxiter=500)
    assert res.converged_reason > 0
    assert 10 <= int(res.iterations) <= 80


def test_history_monotone_tail_cg():
    prob, _, _ = _problem()
    res = krylov.cg(prob.A, prob.f, rtol=1e-10, maxiter=500)
    h = np.asarray(res.history)
    h = h[h >= 0]
    assert h[-1] <= 1e-8 * h[0]


def test_jacobi_preconditioned_cg_fewer_iterations():
    prob, _, _ = _problem(16, 16)
    d = prob.A.diagonal()
    M = lambda r: r / d
    res0 = krylov.cg(prob.A, prob.f, rtol=1e-8, maxiter=1000)
    res1 = krylov.cg(prob.A, prob.f, M=M, rtol=1e-8, maxiter=1000)
    assert res1.converged_reason > 0
    # diag(A) is nearly constant here so counts are close; PC must not hurt
    assert int(res1.iterations) <= int(res0.iterations) + 2


def test_gmres_on_nonsymmetric(rng):
    n = 40
    a = np.eye(n) * 4 + rng.standard_normal((n, n)) * 0.3
    b = rng.standard_normal(n)
    A = lambda x: jnp.asarray(a) @ x
    res = krylov.gmres(A, jnp.asarray(b), rtol=1e-10, maxiter=200, restart=20)
    assert res.converged_reason > 0
    np.testing.assert_allclose(
        np.asarray(res.x), np.linalg.solve(a, b), rtol=1e-6
    )


def test_fgmres_with_variable_preconditioner(rng):
    """FGMRES tolerates an iteration-varying PC (inner CG, few steps)."""
    prob, dense, x_star = _problem()

    def M(r):
        inner = krylov.cg(prob.A, r, rtol=1e-2, maxiter=5)
        return inner.x

    res = krylov.fgmres(prob.A, prob.f, M=M, rtol=1e-10, maxiter=100, restart=20)
    assert res.converged_reason > 0
    np.testing.assert_allclose(fflat(res.x), x_star, rtol=1e-5, atol=1e-9)
    # inner acceleration must reduce outer iterations vs no PC
    res0 = krylov.fgmres(prob.A, prob.f, rtol=1e-10, maxiter=200, restart=20)
    assert int(res.iterations) < int(res0.iterations)


def test_minres_on_indefinite_system(rng):
    n = 30
    q, _ = np.linalg.qr(rng.standard_normal((n, n)))
    evals = np.concatenate([np.linspace(1, 5, n - 5), -np.linspace(1, 2, 5)])
    a = q @ np.diag(evals) @ q.T
    b = rng.standard_normal(n)
    A = lambda x: jnp.asarray(a) @ x
    res = krylov.minres(A, jnp.asarray(b), rtol=1e-10, maxiter=300)
    assert res.converged_reason > 0
    np.testing.assert_allclose(
        np.asarray(res.x), np.linalg.solve(a, b), rtol=1e-5
    )


def test_pytree_block_vectors(rng):
    """Solvers operate on (u, lam) tuple pytrees (KKT layout)."""
    n, m = 20, 3
    a = np.eye(n) * 3 + 0.1 * rng.standard_normal((n, n))
    a = (a + a.T) / 2
    B = rng.standard_normal((m, n))
    kkt = np.block([[a, B.T], [B, np.zeros((m, m))]])
    rhs = rng.standard_normal(n + m)

    aj, Bj = jnp.asarray(a), jnp.asarray(B)

    def A(v):
        u, lam = v
        return (aj @ u + Bj.T @ lam, Bj @ u)

    b = (jnp.asarray(rhs[:n]), jnp.asarray(rhs[n:]))
    res = krylov.minres(A, b, rtol=1e-11, maxiter=400)
    assert res.converged_reason > 0
    x = np.concatenate([np.asarray(res.x[0]), np.asarray(res.x[1])])
    np.testing.assert_allclose(x, np.linalg.solve(kkt, rhs), rtol=1e-5, atol=1e-8)


def test_solvers_run_under_jit():
    prob, dense, x_star = _problem(4, 4)

    @jax.jit
    def run(A, b):
        return krylov.cg(A, b, rtol=1e-10, maxiter=200).x

    x = fflat(run(prob.A, prob.f))
    np.testing.assert_allclose(x, x_star, rtol=1e-6, atol=1e-10)


def test_maxiter_divergence_reason():
    prob, _, _ = _problem(16, 16)
    res = krylov.cg(prob.A, prob.f, rtol=1e-14, maxiter=3)
    assert int(res.converged_reason) == krylov.DIVERGED_ITS


def test_chebyshev_and_richardson_smoke():
    prob, dense, x_star = _problem(4, 4)
    d = prob.A.diagonal()
    M = lambda r: r / d
    res = krylov.chebyshev(prob.A, prob.f, M=M, lmin=0.05, lmax=1.7, maxiter=60)
    x = fflat(res.x)
    r = np.linalg.norm(dense @ x - fflat(prob.f))
    assert r < 1e-2 * np.linalg.norm(np.asarray(prob.f))
    res2 = krylov.richardson(prob.A, prob.f, M=M, scale=0.9, maxiter=50)
    assert float(res2.rnorm) < float(res2.rnorm0)


def test_bcgs_on_nonsymmetric(rng):
    n = 40
    a = np.eye(n) * 4 + rng.standard_normal((n, n)) * 0.3
    b = rng.standard_normal(n)
    A = lambda x: jnp.asarray(a) @ x
    res = krylov.bcgs(A, jnp.asarray(b), rtol=1e-10, maxiter=400)
    assert res.converged_reason > 0
    np.testing.assert_allclose(
        np.asarray(res.x), np.linalg.solve(a, b), rtol=1e-5
    )


def test_bcgs_with_preconditioner():
    prob, dense, x_star = _problem(12, 12)
    from saddle_point_petsc_tpu.solvers import precond

    M = precond.jacobi(prob.A)
    res = krylov.bcgs(prob.A, prob.f, M=M, rtol=1e-10, maxiter=500)
    assert res.converged_reason > 0
    np.testing.assert_allclose(fflat(res.x), x_star, rtol=1e-5, atol=1e-9)


def test_nan_divergence_detected():
    """A PC that produces NaN must terminate with DIVERGED_NANORINF,
    not loop forever (PETSc KSP_DIVERGED_NANORINF semantics)."""
    prob, _, _ = _problem(4, 4)

    def bad_pc(r):
        return r / 0.0 * 0.0  # NaN

    res = krylov.cg(prob.A, prob.f, M=bad_pc, rtol=1e-10, maxiter=100)
    assert int(res.converged_reason) == krylov.DIVERGED_NANORINF
    assert int(res.iterations) <= 2


def test_solve_saddle_point_problem_api(tmp_path):
    """High-level reference-mirror entry point."""
    from saddle_point_petsc_tpu.models.saddle import solve_saddle_point_problem
    from saddle_point_petsc_tpu.utils.options import Options

    opts = Options(["-ksp_rtol", "1e-9"])
    u, res, prob = solve_saddle_point_problem(
        8, 8, opts=opts, constraints=True, body_force="trig",
        vtk_path=tmp_path / "s.vtk",
    )
    assert res.converged_reason > 0
    assert u.shape == (2, 9, 9)
    assert (tmp_path / "s.vtk").exists()
    # reference-mode (constraints disabled)
    u2, res2, _ = solve_saddle_point_problem(3, 3, constraints=False)
    assert res2.converged_reason > 0
    assert u2.shape == (2, 4, 4)
