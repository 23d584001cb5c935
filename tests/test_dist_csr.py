"""Distributed general-CSR (DistELL) tests on the fake 8-device mesh."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse as sp

from saddle_point_petsc_tpu.parallel import dist_csr
from saddle_point_petsc_tpu.solvers import krylov


@pytest.fixture(scope="module")
def mesh1d():
    return dist_csr.make_mesh_1d(8)


def test_dist_ell_matvec_matches_scipy(mesh1d, rng):
    n = 50  # not divisible by 8 -> exercises padding
    a = sp.random(n, n, density=0.15, random_state=0, format="csr")
    a = a + sp.eye(n)
    A = dist_csr.dist_ell_from_scipy(a, mesh1d)
    x = rng.standard_normal(A.n_pad)
    xs = dist_csr.pad_vector(x[:n], A.n_pad, mesh1d)
    y = np.asarray(jax.jit(A.matvec)(xs))
    np.testing.assert_allclose(y[:n], a @ x[:n], atol=1e-12)
    # padded rows act as identity
    np.testing.assert_allclose(y[n:], 0.0, atol=1e-14)


def test_dist_ell_diagonal(mesh1d):
    n = 20
    a = sp.random(n, n, density=0.3, random_state=1, format="csr")
    a = a + 5 * sp.eye(n)
    A = dist_csr.dist_ell_from_scipy(a, mesh1d)
    d = np.asarray(A.diagonal())
    np.testing.assert_allclose(d[:n], a.diagonal(), atol=1e-13)
    np.testing.assert_allclose(d[n:], 1.0)


def test_dist_ell_cg_solve(mesh1d, rng):
    """CG on a distributed SPD general matrix matches a dense solve."""
    n = 60
    b0 = rng.standard_normal((n, n)) * (rng.random((n, n)) < 0.1)
    a_dense = b0 @ b0.T + n * np.eye(n)
    a = sp.csr_matrix(a_dense)
    A = dist_csr.dist_ell_from_scipy(a, mesh1d)
    b = rng.standard_normal(n)
    bs = dist_csr.pad_vector(b, A.n_pad, mesh1d)
    d = A.diagonal()
    from saddle_point_petsc_tpu.solvers.precond import JacobiPC

    res = krylov.cg(A, bs, M=JacobiPC(1.0 / d), rtol=1e-12, maxiter=500)
    assert res.converged_reason > 0
    x = np.asarray(res.x)[:n]
    np.testing.assert_allclose(x, np.linalg.solve(a_dense, b), rtol=1e-6)
