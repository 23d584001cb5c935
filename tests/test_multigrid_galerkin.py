"""Closed-form Galerkin coarse stencil vs the comb-probing oracle.

The direct contraction (169 strided-slice madds) must reproduce
P^T A P exactly for arbitrary block stencils with zeroed out-of-grid
entries (any assembled operator satisfies this).
"""
import jax.numpy as jnp
import numpy as np
import pytest

from saddle_point_petsc_tpu.ops.stencil import StencilOperator
from saddle_point_petsc_tpu.solvers import multigrid as mg


def _random_assembled_like(rng, ny, nx):
    W = rng.standard_normal((ny, nx, 3, 3, 2, 2)).copy()
    for dj in range(3):
        for di in range(3):
            jlo, jhi = max(0, 1 - dj), ny - max(0, dj - 1)
            ilo, ihi = max(0, 1 - di), nx - max(0, di - 1)
            m = np.zeros((ny, nx), bool)
            m[jlo:jhi, ilo:ihi] = True
            W[:, :, dj, di] *= m[:, :, None, None]
    return StencilOperator.from_block(jnp.asarray(W))


@pytest.mark.parametrize("ny,nx", [(9, 9), (9, 13), (17, 9)])
def test_direct_galerkin_matches_probe(rng, ny, nx):
    op = _random_assembled_like(rng, ny, nx)
    direct = mg.galerkin_coarse_stencil(op)
    probe = mg.galerkin_coarse_stencil_probe(op)
    np.testing.assert_allclose(
        np.asarray(direct.planes), np.asarray(probe.planes), atol=1e-12
    )


def test_direct_galerkin_is_rap(rng):
    """Dense oracle: A_c == R A P with bilinear P on nested grids."""
    ny = nx = 9
    nyc = nxc = 5
    op = _random_assembled_like(rng, ny, nx)
    Ac = mg.galerkin_coarse_stencil(op)
    # build dense P by prolongating coarse unit fields
    cols = []
    for d in range(2):
        for J in range(nyc):
            for I in range(nxc):
                xc = jnp.zeros((2, nyc, nxc))
                xc = xc.at[d, J, I].set(1.0)
                cols.append(np.asarray(mg.prolong(xc, ny, nx)).ravel())
    P = np.stack(cols, axis=1)  # (2*ny*nx, 2*nyc*nxc) in dof-major layout

    def dense_field_op(o, n1, n2):
        m = []
        for d in range(2):
            for J in range(n1):
                for I in range(n2):
                    x = jnp.zeros((2, n1, n2))
                    x = x.at[d, J, I].set(1.0)
                    m.append(np.asarray(o.matvec_field(x)).ravel())
        return np.stack(m, axis=1)

    Af = dense_field_op(op, ny, nx)
    Acd = dense_field_op(Ac, nyc, nxc)
    np.testing.assert_allclose(Acd, P.T @ Af @ P, atol=1e-12)
