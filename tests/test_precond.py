"""Preconditioner tests: each PC converges, reduces iterations vs none,
and keeps the expected structure (symmetry for CG use)."""
import jax.numpy as jnp
import numpy as np
import pytest

from saddle_point_petsc_tpu.models import poisson
from saddle_point_petsc_tpu.ops import sparse as sp
from saddle_point_petsc_tpu.ops.stencil import stencil_to_coo
from saddle_point_petsc_tpu.solvers import krylov, precond
from saddle_point_petsc_tpu.solvers.ksp import KSP, make_pc
from saddle_point_petsc_tpu.utils.options import Options

from helpers import fflat


@pytest.fixture(scope="module")
def prob16():
    return poisson.assemble_poisson(16, 16)


@pytest.fixture(scope="module")
def dense16(prob16):
    return np.asarray(
        sp.coo_to_csr(stencil_to_coo(prob16.A.W)).todense()
    )


def _solve_rel_residual(prob, dense, M, solver="cg", **kw):
    res = krylov.SOLVERS[solver](
        prob.A, prob.f, M=M, rtol=1e-8, maxiter=500, **kw
    )
    x = fflat(res.x)
    f = fflat(prob.f)
    rel = np.linalg.norm(dense @ x - f) / np.linalg.norm(f)
    return res, rel


@pytest.mark.parametrize(
    "pc_name", ["none", "jacobi", "pbjacobi", "sor", "bjacobi", "ilu",
                "chebyshev", "fieldsplit", "mg"]
)
def test_pc_converges_cg(prob16, dense16, pc_name):
    M = make_pc(pc_name, prob16.A, Options())
    res, rel = _solve_rel_residual(prob16, dense16, M)
    assert res.converged_reason > 0, f"{pc_name} did not converge"
    assert rel < 1e-6


def test_sor_reduces_iterations(prob16, dense16):
    res0, _ = _solve_rel_residual(prob16, dense16, None)
    M = precond.sor(prob16.A)
    res1, _ = _solve_rel_residual(prob16, dense16, M)
    assert int(res1.iterations) < int(res0.iterations)


def test_bjacobi_reduces_iterations(prob16, dense16):
    res0, _ = _solve_rel_residual(prob16, dense16, None)
    M = precond.block_jacobi_stencil(prob16.A, nblocks=4)
    res1, _ = _solve_rel_residual(prob16, dense16, M)
    assert int(res1.iterations) < int(res0.iterations)


def test_ilu0_exact_vs_scipy(prob16):
    """ILU(0) factors satisfy (LU)_ij = A_ij on the sparsity pattern."""
    csr = sp.csr_compact(
        sp.coo_to_csr(stencil_to_coo(prob16.A.W))
    )
    L, U = precond.ilu0_factor_host(csr)
    a = sp.csr_to_scipy(csr).toarray()
    l = sp.csr_to_scipy(L).toarray() + np.eye(a.shape[0])
    u = sp.csr_to_scipy(U).toarray()
    lu = l @ u
    mask = a != 0
    np.testing.assert_allclose(lu[mask], a[mask], rtol=1e-8, atol=1e-10)


def test_ilu0_exact_scan_apply(prob16, dense16):
    """sweeps=0 (exact triangular scan solves): M r == U^-1 L^-1 r."""
    csr = sp.csr_compact(sp.coo_to_csr(stencil_to_coo(prob16.A.W)))
    pc = precond.ilu0(csr, sweeps=0)
    rng = np.random.default_rng(1)
    r = rng.standard_normal(csr.shape[0])
    z = np.asarray(pc(jnp.asarray(r)))
    l = sp.csr_to_scipy(pc.L).toarray() + np.eye(csr.shape[0])
    u = (
        sp.csr_to_scipy(pc.U).toarray()
        + np.diag(1.0 / np.asarray(pc.inv_udiag))
    )
    expect = np.linalg.solve(u, np.linalg.solve(l, r))
    np.testing.assert_allclose(z, expect, rtol=1e-8, atol=1e-10)


def test_ilu0_sweeps_close_to_exact(prob16):
    csr = sp.csr_compact(sp.coo_to_csr(stencil_to_coo(prob16.A.W)))
    exact = precond.ilu0(csr, sweeps=0)
    approx = precond.ilu0(csr, sweeps=8)
    rng = np.random.default_rng(2)
    r = jnp.asarray(rng.standard_normal(csr.shape[0]))
    ze = np.asarray(exact(r))
    za = np.asarray(approx(r))
    assert np.linalg.norm(za - ze) / np.linalg.norm(ze) < 0.2


def test_mg_iteration_count_scales(prob16, dense16):
    """MG-preconditioned CG should converge in O(1) iterations, nearly
    independent of grid size — the hallmark of multigrid."""
    from saddle_point_petsc_tpu.solvers.multigrid import mg_pc

    counts = []
    for n in (16, 32):
        prob = poisson.assemble_poisson(n, n)
        M = mg_pc(prob.A)
        res = krylov.cg(prob.A, prob.f, M=M, rtol=1e-8, maxiter=100)
        assert res.converged_reason > 0
        counts.append(int(res.iterations))
    assert counts[-1] <= 25
    assert counts[-1] <= counts[0] + 5  # near grid-independence


def test_galerkin_coarse_matches_dense_triple_product():
    from saddle_point_petsc_tpu.solvers.multigrid import (
        galerkin_coarse_stencil,
        prolong,
    )

    prob = poisson.assemble_poisson(8, 8)
    Ac = galerkin_coarse_stencil(prob.A)
    ny, nx = prob.A.grid_shape
    nyc, nxc = (ny + 1) // 2, (nx + 1) // 2
    # dense P via probing (natural ordering on both sides)
    from helpers import ffield

    nc = nyc * nxc * 2
    P = np.zeros((ny * nx * 2, nc))
    for k in range(nc):
        e = np.zeros(nc)
        e[k] = 1
        P[:, k] = fflat(prolong(jnp.asarray(ffield(e, nyc, nxc)), ny, nx))
    Af = np.asarray(sp.coo_to_csr(stencil_to_coo(prob.A.W)).todense())
    expect = P.T @ Af @ P
    got = np.asarray(sp.coo_to_csr(stencil_to_coo(Ac.W)).todense())
    np.testing.assert_allclose(got, expect, rtol=1e-10, atol=1e-12)


def test_ksp_from_options(prob16, dense16):
    opts = Options(
        ["-ksp_type", "cg", "-ksp_rtol", "1e-9", "-pc_type", "sor",
         "-ksp_max_it", "300"]
    )
    ksp = KSP(opts).set_operators(prob16.A).set_from_options().set_up()
    assert ksp.ksp_type == "cg" and ksp.pc_type == "sor"
    res = ksp.solve(prob16.f)
    assert res.converged_reason > 0
    x = fflat(res.x)
    f = fflat(prob16.f)
    assert np.linalg.norm(dense16 @ x - f) / np.linalg.norm(f) < 1e-7


def test_stencil_ilu0_matches_csr_ilu0(prob16):
    """Stencil-form ILU(0) (solvers/ilu_stencil.py) is bit-identical to the
    CSR-based precond.ilu0 at equal sweep counts: same factorization (both
    run the native IKJ kernel on the same pattern), application as stencil
    contractions instead of gathered CSR matvecs."""
    from saddle_point_petsc_tpu.ops.stencil import field_to_flat
    from saddle_point_petsc_tpu.solvers.ilu_stencil import stencil_ilu0

    csr = sp.csr_compact(sp.coo_to_csr(stencil_to_coo(prob16.A.W)))
    pc_csr = precond.ilu0(csr, sweeps=6)
    pc_st = stencil_ilu0(prob16.A, sweeps=6)
    r = jnp.asarray(
        np.random.default_rng(3).standard_normal(prob16.f.shape)
    )
    z1 = pc_csr(field_to_flat(r))
    z2 = field_to_flat(pc_st(r))
    np.testing.assert_array_equal(np.asarray(z1), np.asarray(z2))


def test_make_pc_ilu_stencil_operator(prob16):
    """-pc_type ilu on a serial StencilOperator routes to the stencil-form
    factors and converges."""
    from saddle_point_petsc_tpu.solvers.ilu_stencil import StencilILU0PC

    pc = make_pc("ilu", prob16.A, Options())
    assert isinstance(pc, StencilILU0PC)
    res = krylov.gmres(prob16.A, prob16.f, M=pc, rtol=1e-8, maxiter=200)
    assert int(res.converged_reason) > 0
