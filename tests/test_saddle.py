"""KKT saddle-point system tests: constraint assembly, solvability,
Schur fieldsplit preconditioning (BASELINE.md configs 1-2)."""
import jax.numpy as jnp
import numpy as np
import pytest

from saddle_point_petsc_tpu.models import saddle
from saddle_point_petsc_tpu.ops import sparse as sp
from saddle_point_petsc_tpu.ops.stencil import stencil_to_coo
from saddle_point_petsc_tpu.solvers import krylov, precond
from saddle_point_petsc_tpu.solvers.ksp import make_pc
from saddle_point_petsc_tpu.utils.options import Options

from helpers import fflat, ffield


@pytest.fixture(scope="module")
def kkt16():
    return saddle.assemble_saddle(16, 16)


def _dense_kkt(prob):
    A = np.asarray(sp.coo_to_csr(stencil_to_coo(prob.A.W)).todense())
    B = np.asarray(prob.B)
    m = B.shape[0]
    return np.block([[A, B.T], [B, np.zeros((m, m))]])


def test_constraint_matrix_properties(kkt16):
    B = np.asarray(kkt16.B)
    assert B.shape[0] == 4
    # rows nonzero and independent
    assert np.linalg.matrix_rank(B) == 4
    # BC columns zeroed
    mask = np.repeat(np.asarray(kkt16.bc_mask).reshape(-1), 2)
    np.testing.assert_allclose(B[:, mask], 0.0)
    # barycentre-x row integrates Ux: sum of weights == interior area weight
    # (integral of sum of interior hat functions <= |Omega| = 1)
    assert 0.0 < B[0].sum() <= 1.0


def test_constraint_integrates_exactly():
    """B rows are Q1-consistent integrals: applying row 0 to u=Ux=1 (on the
    full grid, ignoring BC zeroing) gives |Omega| = 1 exactly."""
    prob = saddle.assemble_saddle(8, 8)
    Bf_full = saddle.assemble_constraints(prob.coords, bc_mask=None)
    ones_x = np.zeros((2, 9, 9))
    ones_x[0] = 1.0
    val = float(jnp.einsum("cyx,cyx->", Bf_full[0], jnp.asarray(ones_x)))
    np.testing.assert_allclose(val, 1.0, rtol=1e-12)
    # volume-x row on Ux=1 integrates x over the unit square: 1/2
    val2 = float(jnp.einsum("cyx,cyx->", Bf_full[2], jnp.asarray(ones_x)))
    np.testing.assert_allclose(val2, 0.5, rtol=1e-12)


def test_kkt_operator_matches_dense(kkt16, rng):
    kd = _dense_kkt(kkt16)
    n = np.asarray(kkt16.B).shape[1]
    u = rng.standard_normal((2, 17, 17))
    lam = rng.standard_normal(4)
    yu, ylam = kkt16.K((jnp.asarray(u), jnp.asarray(lam)))
    expect = kd @ np.concatenate([fflat(u), lam])
    got = np.concatenate([fflat(yu), np.asarray(ylam)])
    np.testing.assert_allclose(got, expect, rtol=1e-10, atol=1e-10)


def test_minres_solves_kkt(kkt16):
    res = krylov.minres(kkt16.K, kkt16.rhs, rtol=1e-10, maxiter=2000)
    assert res.converged_reason > 0
    kd = _dense_kkt(kkt16)
    rhs = np.concatenate([fflat(kkt16.f), np.asarray(kkt16.g)])
    x = np.concatenate([fflat(res.x[0]), np.asarray(res.x[1])])
    rel = np.linalg.norm(kd @ x - rhs) / np.linalg.norm(rhs)
    assert rel < 1e-7
    # constraints enforced: B u = g = 0
    np.testing.assert_allclose(
        np.asarray(kkt16.B) @ fflat(res.x[0]), 0.0, atol=1e-7
    )


@pytest.mark.parametrize("fact", ["diag", "lower", "upper", "full"])
def test_schur_pc_variants(kkt16, fact):
    solver = krylov.minres if fact == "diag" else krylov.fgmres
    M = precond.schur_pc(kkt16.A, kkt16.Bf, fact_type=fact)
    res = solver(kkt16.K, kkt16.rhs, M=M, rtol=1e-9, maxiter=1500)
    assert res.converged_reason > 0
    kd = _dense_kkt(kkt16)
    rhs = np.concatenate([fflat(kkt16.f), np.asarray(kkt16.g)])
    x = np.concatenate([fflat(res.x[0]), np.asarray(res.x[1])])
    assert np.linalg.norm(kd @ x - rhs) / np.linalg.norm(rhs) < 1e-6


@pytest.mark.slow
def test_schur_with_mg_inner_fast(kkt16):
    """Config-2-style: FGMRES outer + Schur PC with an MG inner A-solve
    should converge in a handful of outer iterations."""
    from saddle_point_petsc_tpu.solvers.multigrid import mg_pc

    inner = mg_pc(kkt16.A)
    M = precond.schur_pc(kkt16.A, kkt16.Bf, inner_solve=inner, fact_type="full")
    res = krylov.fgmres(kkt16.K, kkt16.rhs, M=M, rtol=1e-9, maxiter=100)
    assert res.converged_reason > 0
    assert int(res.iterations) <= 30


def test_make_pc_fieldsplit_options(kkt16):
    opts = Options(
        [
            "-pc_fieldsplit_schur_fact_type", "full",
            "-fieldsplit_inner_ksp_type", "cg",
            "-fieldsplit_inner_ksp_max_it", "8",
        ]
    )
    M = make_pc("fieldsplit", kkt16.K, opts)
    res = krylov.fgmres(kkt16.K, kkt16.rhs, M=M, rtol=1e-8, maxiter=200)
    assert res.converged_reason > 0


def test_bsr_kkt_end_to_end(kkt16):
    """BASELINE config 3 'as written': the A block stored and applied as
    BSR 2x2 blocks, FGMRES + MG-Schur, matching the stencil-path solution
    (VERDICT round-1 item 6)."""
    from saddle_point_petsc_tpu.models import poisson
    from saddle_point_petsc_tpu.ops.stencil import field_to_flat
    from saddle_point_petsc_tpu.solvers.multigrid import mg_pc

    csr, _, _, _ = poisson.assemble_poisson_csr(16, 16)
    bsr = sp.csr_to_bsr(csr, block=2)
    B = kkt16.K.B
    d = sp.csr_extract_diagonal(csr)
    dinv = 1.0 / jnp.where(d == 0, 1.0, d)
    S_inv = precond.inv_small(-jnp.einsum("mi,i,ki->mk", B, dinv, B))
    mg = mg_pc(kkt16.A)

    def K(v):
        u, lam = v
        return (sp.bsr_matvec(bsr, u) + B.T @ lam, B @ u)

    def M(r):
        ru, rlam = r
        yu = mg(ru)
        zlam = S_inv @ (rlam - B @ yu)
        return (yu - mg(B.T @ zlam), zlam)

    rhs = (field_to_flat(kkt16.f), kkt16.g)
    res = krylov.fgmres(K, rhs, M=M, rtol=1e-10, maxiter=100)
    assert res.converged_reason > 0
    # parity with the stencil-form KKT solve
    ref = krylov.minres(
        kkt16.K, kkt16.rhs, M=precond.schur_pc(kkt16.A, kkt16.Bf,
        fact_type="diag"), rtol=1e-10, maxiter=2000,
    )
    np.testing.assert_allclose(
        np.asarray(res.x[0]), np.asarray(fflat(ref.x[0])),
        rtol=1e-6, atol=1e-9,
    )
