"""Unit tests for sparse formats: COO dedup, CSR/BSR/ELL round-trips, SpMV,
and symmetric BC elimination (SURVEY.md §4 ladder step 2)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse as sp

from saddle_point_petsc_tpu.ops import sparse


def _random_coo(rng, m=20, n=20, nnz=120, dup_frac=0.4):
    rows = rng.integers(0, m, nnz).astype(np.int32)
    cols = rng.integers(0, n, nnz).astype(np.int32)
    # force duplicates
    k = int(nnz * dup_frac)
    rows[:k] = rows[k : 2 * k]
    cols[:k] = cols[k : 2 * k]
    vals = rng.standard_normal(nnz)
    return rows, cols, vals


def test_coo_to_csr_dedup_matches_scipy(rng):
    m = n = 20
    rows, cols, vals = _random_coo(rng, m, n)
    coo = sparse.COO(jnp.asarray(rows), jnp.asarray(cols), jnp.asarray(vals), (m, n))
    ours = np.asarray(sparse.coo_to_csr(coo).todense())
    ref = sp.coo_matrix((vals, (rows, cols)), shape=(m, n)).toarray()
    np.testing.assert_allclose(ours, ref, rtol=1e-12, atol=1e-14)


def test_coo_to_csr_with_padding_entries(rng):
    m = n = 10
    rows = np.array([3, -1, 5, 3, -1], np.int32)
    cols = np.array([2, 0, 5, 2, 7], np.int32)
    vals = np.array([1.0, 99.0, 2.0, 0.5, 42.0])
    coo = sparse.COO(jnp.asarray(rows), jnp.asarray(cols), jnp.asarray(vals), (m, n))
    csr = sparse.coo_to_csr(coo)
    dense = np.asarray(csr.todense())
    expect = np.zeros((m, n))
    expect[3, 2] = 1.5
    expect[5, 5] = 2.0
    np.testing.assert_allclose(dense, expect)
    assert int(np.asarray(csr.indptr)[-1]) == 2  # live nnz


def test_csr_compact_and_scipy_roundtrip(rng):
    m = n = 20
    rows, cols, vals = _random_coo(rng, m, n)
    coo = sparse.COO(jnp.asarray(rows), jnp.asarray(cols), jnp.asarray(vals), (m, n))
    csr = sparse.csr_compact(sparse.coo_to_csr(coo))
    ref = sp.coo_matrix((vals, (rows, cols)), shape=(m, n)).toarray()
    np.testing.assert_allclose(np.asarray(csr.todense()), ref, atol=1e-14)
    back = sparse.scipy_to_csr(sparse.csr_to_scipy(csr))
    np.testing.assert_allclose(np.asarray(back.todense()), ref, atol=1e-14)


def test_spmv_all_formats(rng):
    m = n = 30
    a = sp.random(m, n, density=0.2, random_state=7, format="csr")
    a.sort_indices()
    csr = sparse.scipy_to_csr(a)
    x = rng.standard_normal(n)
    expect = a @ x
    np.testing.assert_allclose(
        np.asarray(sparse.csr_matvec(csr, jnp.asarray(x))), expect, atol=1e-12
    )
    ell = sparse.csr_to_ell(csr)
    np.testing.assert_allclose(
        np.asarray(sparse.ell_matvec(ell, jnp.asarray(x))), expect, atol=1e-12
    )


def test_bsr_matvec(rng):
    m = n = 16
    dense = rng.standard_normal((m, n)) * (rng.random((m, n)) < 0.3)
    a = sp.csr_matrix(dense)
    csr = sparse.scipy_to_csr(a)
    bsr = sparse.csr_to_bsr(csr, block=2)
    x = rng.standard_normal(n)
    np.testing.assert_allclose(
        np.asarray(sparse.bsr_matvec(bsr, jnp.asarray(x))), dense @ x, atol=1e-12
    )
    np.testing.assert_allclose(np.asarray(bsr.todense()), dense, atol=1e-14)


def test_zero_rows_columns_symmetric(rng):
    m = 12
    dense = rng.standard_normal((m, m))
    dense = dense + dense.T
    rows, cols = np.nonzero(dense)
    vals = dense[rows, cols]
    coo = sparse.COO(
        jnp.asarray(rows.astype(np.int32)),
        jnp.asarray(cols.astype(np.int32)),
        jnp.asarray(vals),
        (m, m),
    )
    mask = np.zeros(m, bool)
    mask[[0, 3, 7]] = True
    out = np.asarray(
        sparse.coo_zero_rows_columns(coo, jnp.asarray(mask)).todense()
    )
    expect = dense.copy()
    expect[mask, :] = 0
    expect[:, mask] = 0
    expect[np.ix_(mask, mask)] = 0
    expect[np.where(mask)[0], np.where(mask)[0]] = 1.0
    np.testing.assert_allclose(out, expect, atol=1e-14)
    np.testing.assert_allclose(out, out.T, atol=1e-14)


def test_diag_extraction(rng):
    m = 10
    dense = rng.standard_normal((m, m)) * (rng.random((m, m)) < 0.5)
    np.fill_diagonal(dense, rng.standard_normal(m))
    csr = sparse.scipy_to_csr(sp.csr_matrix(dense))
    np.testing.assert_allclose(
        np.asarray(sparse.csr_extract_diagonal(csr)), np.diag(dense), atol=1e-14
    )


def test_formats_under_jit(rng):
    """Containers are pytrees: matvec works as a traced-jit argument."""
    a = sp.random(12, 12, density=0.3, random_state=1, format="csr")
    csr = sparse.scipy_to_csr(a)
    x = jnp.asarray(rng.standard_normal(12))
    f = jax.jit(lambda A, v: A.matvec(v))
    np.testing.assert_allclose(np.asarray(f(csr, x)), a @ np.asarray(x), atol=1e-12)


def test_bdia_matches_bsr_and_scipy(rng):
    """Block-DIA (BSR blocks stored by block-diagonal, shift-only matvec
    — the TPU fast path for banded block matrices) is exact vs the
    gather BSR path and scipy."""
    n1 = 12
    ix = sp.identity(n1)
    t1 = sp.diags([-1.0, 4.0, -1.0], [-1, 0, 1], (n1, n1))
    blk = np.array([[2.0, 0.3], [0.5, 1.0]])  # non-symmetric blocks
    a2 = sp.kron((sp.kron(ix, t1) + sp.kron(t1, ix)), blk).tocsr()
    bsr = sparse.csr_to_bsr(sparse.scipy_to_csr(a2), block=2)
    bdia = sparse.bsr_to_bdia(bsr)
    assert 0 in bdia.offsets and len(bdia.offsets) <= 5
    x = rng.standard_normal(a2.shape[0])
    y_b = np.asarray(sparse.bsr_matvec(bsr, jnp.asarray(x)))
    y_d = np.asarray(sparse.bdia_matvec(bdia, jnp.asarray(x)))
    np.testing.assert_allclose(y_d, a2 @ x, atol=1e-12)
    np.testing.assert_allclose(y_d, y_b, atol=1e-12)
    X = rng.standard_normal((a2.shape[0], 4))
    np.testing.assert_allclose(
        np.asarray(sparse.bdia_matmat(bdia, jnp.asarray(X))),
        a2 @ X,
        atol=1e-12,
    )
    np.testing.assert_allclose(
        np.asarray(bdia.todense()), a2.toarray(), atol=1e-14
    )
    np.testing.assert_allclose(
        np.asarray(bdia.diagonal()), a2.diagonal(), atol=1e-14
    )
    # pytree: traced through jit
    f = jax.jit(lambda A, v: A.matvec(v))
    np.testing.assert_allclose(
        np.asarray(f(bdia, jnp.asarray(x))), a2 @ x, atol=1e-12
    )


def test_bdia_irregular_raises(rng):
    """Scattered block pattern exceeds the storage threshold."""
    import pytest as _pytest

    a = sp.random(40, 40, density=0.03, random_state=7, format="csr")
    a = a + sp.eye(40)
    a2 = sp.kron(a, np.eye(2)).tocsr()
    bsr = sparse.csr_to_bsr(sparse.scipy_to_csr(a2), block=2)
    with _pytest.raises(ValueError):
        sparse.bsr_to_bdia(bsr, max_diag_blowup=0.2)
