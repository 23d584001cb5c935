"""SpMM (sparse x dense multi-vector) across every format + distributed.

North-star coverage: "distributed SpMV/SpMM as Pallas kernels"
(BASELINE.json).  Oracle is the dense matmul A_dense @ X.
"""
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse as sp

from saddle_point_petsc_tpu.ops import sparse, stencil
from saddle_point_petsc_tpu.ops.pallas import spmm as pl_spmm


def _random_csr(rng, m=40, density=0.15):
    a = sp.random(m, m, density=density, random_state=np.random.RandomState(3))
    a = (a + sp.eye(m)).tocsr()
    a.sort_indices()
    return a


@pytest.fixture
def problem(rng):
    a = _random_csr(rng)
    X = rng.standard_normal((a.shape[1], 5))
    return a, X, a.toarray() @ X


def test_csr_matmat(problem):
    a, X, Y = problem
    csr = sparse.scipy_to_csr(a)
    np.testing.assert_allclose(csr.matmat(jnp.asarray(X)), Y, rtol=1e-12)


def test_coo_matmat(problem):
    a, X, Y = problem
    coo = a.tocoo()
    c = sparse.COO(
        jnp.asarray(coo.row.astype(np.int32)),
        jnp.asarray(coo.col.astype(np.int32)),
        jnp.asarray(coo.data),
        a.shape,
    )
    np.testing.assert_allclose(
        sparse.coo_matmat(c, jnp.asarray(X)), Y, rtol=1e-12
    )


def test_ell_matmat(problem):
    a, X, Y = problem
    ell = sparse.csr_to_ell(sparse.scipy_to_csr(a))
    np.testing.assert_allclose(ell.matmat(jnp.asarray(X)), Y, rtol=1e-12)


def test_bsr_matmat(rng):
    # block-structured matrix (2 dof) so BSR is exact
    m = 24
    blocks = rng.standard_normal((m // 2, m // 2, 2, 2))
    keep = rng.random((m // 2, m // 2)) < 0.3
    np.fill_diagonal(keep, True)
    dense = (blocks * keep[:, :, None, None]).transpose(0, 2, 1, 3).reshape(
        m, m
    )
    csr = sparse.scipy_to_csr(sp.csr_matrix(dense))
    bsr = sparse.csr_to_bsr(csr, block=2)
    X = rng.standard_normal((m, 3))
    np.testing.assert_allclose(
        bsr.matmat(jnp.asarray(X)), dense @ X, rtol=1e-12
    )


@pytest.mark.slow
def test_dia_matmat(problem):
    a, X, Y = problem
    dia, _ = sparse.csr_to_dia(sparse.scipy_to_csr(a))
    np.testing.assert_allclose(dia.matmat(jnp.asarray(X)), Y, rtol=1e-12)


def test_stencil_matmat_matches_stacked_matvec(rng):
    ny, nx, k = 6, 7, 4
    W = jnp.asarray(rng.standard_normal((ny, nx, 3, 3, 2, 2)))
    op = stencil.StencilOperator.from_block(W)
    XT = jnp.asarray(rng.standard_normal((k, 2, ny, nx)))
    Y = op.matmat_field(XT)
    for i in range(k):
        np.testing.assert_allclose(Y[i], op.matvec_field(XT[i]), rtol=1e-12)


def test_stencil_matmat_flat(rng):
    ny, nx, k = 5, 6, 3
    W = jnp.asarray(rng.standard_normal((ny, nx, 3, 3, 2, 2)))
    op = stencil.StencilOperator.from_block(W)
    X = jnp.asarray(rng.standard_normal((op.n, k)))
    Y = op.matmat(X)
    for i in range(k):
        np.testing.assert_allclose(Y[:, i], op.matvec(X[:, i]), rtol=1e-12)


def test_stencil_spmm_pallas_interpret(rng):
    ny, nx, k = 8, 8, 3
    W = jnp.asarray(
        rng.standard_normal((ny, nx, 3, 3, 2, 2)).astype(np.float32)
    )
    op = stencil.StencilOperator.from_block(W)
    XT = jnp.asarray(
        rng.standard_normal((k, 2, ny, nx)).astype(np.float32)
    )
    got = pl_spmm.stencil_spmm_pallas(op.planes, XT, bm=4, interpret=True)
    want = op.matmat_field(XT)
    np.testing.assert_allclose(got, want, rtol=2e-6, atol=2e-6)


def test_dia_spmm_pallas_interpret(rng):
    a = _random_csr(rng, m=32)
    dia, _ = sparse.csr_to_dia(sparse.scipy_to_csr(a))
    X = rng.standard_normal((32, 4)).astype(np.float32)
    got = pl_spmm.dia_spmm_pallas(
        dia.data.astype(jnp.float32), jnp.asarray(X), dia.offsets,
        bn=16, interpret=True,
    )
    np.testing.assert_allclose(
        got, a.toarray() @ X, rtol=2e-5, atol=2e-5
    )


def test_dist_aij_matmat(rng):
    from saddle_point_petsc_tpu.parallel import dist_csr

    a = _random_csr(rng, m=37)
    mesh = dist_csr.make_mesh_1d(8)
    A = dist_csr.dist_aij_from_scipy(a, mesh)
    k = 3
    X = rng.standard_normal((37, k))
    Xs = dist_csr.pad_vector(X, A.n_pad, mesh)
    Y = np.asarray(A.matmat(Xs))[:37]
    np.testing.assert_allclose(Y, a.toarray() @ X, rtol=1e-11)


def test_cg_multi_matches_per_column_cg(rng):
    """Pseudo-block CG (KSPMatSolve, the SpMM production consumer) vs k
    independent CG solves on the stencil-form saddle operator."""
    from saddle_point_petsc_tpu.models import poisson
    from saddle_point_petsc_tpu.solvers import krylov, precond

    prob = poisson.assemble_poisson(10, 10, dtype=jnp.float64)
    A = prob.A
    k = 3
    B = jnp.stack(
        [prob.f * (i + 1.0) for i in range(k)]
    )  # (k, 2, ny, nx)
    Mj = precond.jacobi(A)
    res = krylov.cg_multi(
        A.matmat_field, B, M=lambda R: jnp.stack([Mj(r) for r in R]),
        rtol=1e-10, maxiter=300,
    )
    assert np.all(np.asarray(res.converged_reason) > 0)
    for i in range(k):
        ref = krylov.cg(A, B[i], M=Mj, rtol=1e-10, maxiter=300)
        np.testing.assert_allclose(
            np.asarray(res.x[i]), np.asarray(ref.x), rtol=1e-6, atol=1e-9
        )


def test_ksp_mat_solve(rng):
    """KSP.mat_solve drives the operator's matmat_field end-to-end."""
    import jax

    from saddle_point_petsc_tpu.models import poisson
    from saddle_point_petsc_tpu.solvers.ksp import KSP
    from saddle_point_petsc_tpu.utils.options import Options

    prob = poisson.assemble_poisson(10, 10, dtype=jnp.float64)
    B = jnp.stack([prob.f, 2.0 * prob.f])
    ksp = KSP(Options(["-ksp_type", "cg", "-pc_type", "jacobi",
                       "-ksp_rtol", "1e-10"]))
    ksp.set_operators(prob.A).set_from_options().set_up()
    res = ksp.mat_solve(B)
    assert np.all(np.asarray(res.converged_reason) > 0)
    # residual check against the operator
    R = B - prob.A.matmat_field(res.x)
    rel = float(jnp.linalg.norm(R.reshape(2, -1), axis=1).max()
                / jnp.linalg.norm(B.reshape(2, -1), axis=1).max())
    assert rel < 1e-8
