"""Tests for the stencil operator: assembly equivalence with CSR, matvec,
BC elimination, SPD structure."""
import jax.numpy as jnp
import numpy as np
import pytest

from helpers import fflat, ffield

from saddle_point_petsc_tpu.models import fem, poisson
from saddle_point_petsc_tpu.ops import sparse
from saddle_point_petsc_tpu.ops.stencil import (
    StencilOperator,
    assemble_stencil,
    boundary_mask,
    stencil_to_coo,
    stencil_zero_rows_columns,
)


def _dense_from_stencil(W):
    return np.asarray(sparse.coo_to_csr(stencil_to_coo(W)).todense())


@pytest.mark.slow
def test_stencil_equals_csr_assembly():
    for nex, ney in [(3, 3), (4, 6)]:
        prob = poisson.assemble_poisson(nex, ney)
        csr, f, mask, _ = poisson.assemble_poisson_csr(nex, ney)
        np.testing.assert_allclose(
            _dense_from_stencil(prob.A.W),
            np.asarray(csr.todense()),
            atol=1e-12,
        )
        np.testing.assert_allclose(fflat(prob.f), np.asarray(f), atol=1e-14)


def test_stencil_matvec_matches_dense(rng):
    prob = poisson.assemble_poisson(5, 4)
    dense = _dense_from_stencil(prob.A.W)
    ny, nx = prob.grid_shape
    x = rng.standard_normal((2, ny, nx))
    y = prob.A.matvec_field(jnp.asarray(x))
    np.testing.assert_allclose(fflat(y), dense @ fflat(x), atol=1e-12)
    # flat (natural-ordering) interface
    xf = rng.standard_normal(dense.shape[0])
    y2 = np.asarray(prob.A.matvec(jnp.asarray(xf)))
    np.testing.assert_allclose(y2, dense @ xf, atol=1e-12)


def test_bc_preserves_spd():
    prob = poisson.assemble_poisson(4, 4)
    dense = _dense_from_stencil(prob.A.W)
    np.testing.assert_allclose(dense, dense.T, atol=1e-12)
    evals = np.linalg.eigvalsh(dense)
    assert evals.min() > 0  # SPD after MatZeroRowsColumns-style elimination


def test_bc_rows_are_identity():
    prob = poisson.assemble_poisson(4, 3)
    dense = _dense_from_stencil(prob.A.W)
    ny, nx = prob.grid_shape
    mask = np.asarray(boundary_mask(ny, nx)).reshape(-1)
    rows = np.repeat(mask, 2)
    sub = dense[rows][:, rows]
    np.testing.assert_allclose(sub, np.eye(sub.shape[0]), atol=1e-14)
    # off-diagonal coupling boundary<->interior eliminated both ways
    np.testing.assert_allclose(dense[rows][:, ~rows], 0.0, atol=1e-14)
    np.testing.assert_allclose(dense[~rows][:, rows], 0.0, atol=1e-14)


def test_diag_extraction():
    prob = poisson.assemble_poisson(4, 4)
    dense = _dense_from_stencil(prob.A.W)
    d = fflat(prob.A.diagonal())
    np.testing.assert_allclose(d, np.diag(dense), atol=1e-12)
