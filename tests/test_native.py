"""Native C++ host-kernel tests (csrc/): ILU0, COO->CSR, triangular solves,
RCM — each against a numpy/scipy oracle."""
import numpy as np
import pytest
import scipy.sparse as sp

from saddle_point_petsc_tpu.utils import native

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native toolchain unavailable"
)


def _spd_csr(n=50, rng=None):
    rng = rng or np.random.default_rng(0)
    a = sp.random(n, n, density=0.1, random_state=3).toarray()
    a = a + a.T + n * np.eye(n)
    A = sp.csr_matrix(a)
    A.sort_indices()
    return A


def test_native_ilu0_matches_python():
    from saddle_point_petsc_tpu.solvers.precond import _ilu0_python

    A = _spd_csr()
    d1 = native.ilu0(A.indptr, A.indices, A.data.copy(), A.shape[0])
    d2 = _ilu0_python(A.indptr, A.indices, A.data.copy(), A.shape[0])
    np.testing.assert_allclose(d1, d2, rtol=1e-12)


def test_native_ilu0_exact_for_dense_pattern():
    """On a fully dense pattern ILU(0) == exact LU."""
    rng = np.random.default_rng(5)
    n = 12
    a = rng.standard_normal((n, n)) + n * np.eye(n)
    A = sp.csr_matrix(a)
    A.sort_indices()
    data = native.ilu0(A.indptr, A.indices, A.data.copy(), n)
    F = sp.csr_matrix((data, A.indices, A.indptr), shape=(n, n)).toarray()
    L = np.tril(F, -1) + np.eye(n)
    U = np.triu(F)
    np.testing.assert_allclose(L @ U, a, rtol=1e-10, atol=1e-12)


def test_native_coo_to_csr():
    rng = np.random.default_rng(1)
    m = 30
    rows = rng.integers(0, m, 200).astype(np.int32)
    cols = rng.integers(0, m, 200).astype(np.int32)
    rows[:30] = rows[30:60]
    cols[:30] = cols[30:60]
    rows[5] = -1  # padding
    vals = rng.standard_normal(200)
    indptr, oc, ov = native.coo_to_csr(rows, cols, vals, m)
    keep = rows >= 0
    ref = sp.coo_matrix(
        (vals[keep], (rows[keep], cols[keep])), shape=(m, m)
    ).tocsr()
    ref.sort_indices()
    np.testing.assert_array_equal(indptr, ref.indptr)
    np.testing.assert_array_equal(oc, ref.indices)
    np.testing.assert_allclose(ov, ref.data, rtol=1e-12)


def test_native_triangular_solves():
    A = _spd_csr(40)
    n = A.shape[0]
    data = native.ilu0(A.indptr, A.indices, A.data.copy(), n)
    F = sp.csr_matrix((data, A.indices, A.indptr), shape=(n, n))
    L = sp.tril(F, -1).tocsr()
    U = sp.triu(F).tocsr()
    rng = np.random.default_rng(2)
    b = rng.standard_normal(n)
    y = native.lower_solve_unit(L.indptr, L.indices, L.data, b)
    np.testing.assert_allclose(
        (np.tril(F.toarray(), -1) + np.eye(n)) @ y, b, atol=1e-10
    )
    x = native.upper_solve(U.indptr, U.indices, U.data, y)
    np.testing.assert_allclose(np.triu(F.toarray()) @ x, y, atol=1e-10)


def test_native_rcm_is_permutation():
    A = _spd_csr(60)
    perm = native.rcm(A.indptr, A.indices, A.shape[0])
    assert sorted(perm) == list(range(60))
    # bandwidth should not increase vs natural ordering for a random matrix
    a = A.toarray()
    def bw(m):
        idx = np.nonzero(m)
        return int(np.max(np.abs(idx[0] - idx[1]))) if len(idx[0]) else 0
    ap = a[np.ix_(perm, perm)]
    assert bw(ap) <= bw(a)


def test_ilu0_pc_uses_native_path():
    """precond.ilu0 must produce identical factors via native and python."""
    import jax.numpy as jnp

    from saddle_point_petsc_tpu.models import poisson
    from saddle_point_petsc_tpu.ops import sparse as spo
    from saddle_point_petsc_tpu.ops.stencil import stencil_to_coo
    from saddle_point_petsc_tpu.solvers import precond

    prob = poisson.assemble_poisson(8, 8)
    csr = spo.csr_compact(spo.coo_to_csr(stencil_to_coo(prob.A.W)))
    L, U = precond.ilu0_factor_host(csr)  # native path (available)
    a = spo.csr_to_scipy(csr)
    d2 = precond._ilu0_python(a.indptr, a.indices, a.data.copy(), a.shape[0])
    F = sp.csr_matrix((d2, a.indices, a.indptr), shape=a.shape)
    np.testing.assert_allclose(
        spo.csr_to_scipy(L).toarray(),
        sp.tril(F, -1).toarray(),
        atol=1e-12,
    )
