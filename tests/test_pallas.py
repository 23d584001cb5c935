"""Pallas kernel tests (interpret mode on CPU; compiled path validated on
TPU by benchmarks) + DIA format tests."""
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse as sps

from saddle_point_petsc_tpu.models import poisson
from saddle_point_petsc_tpu.ops import sparse as sp
from saddle_point_petsc_tpu.ops.pallas.spmv import (
    dia_spmv_pallas,
    stencil_spmv_pallas,
    stencil_spmv_pallas_padded,
)
from saddle_point_petsc_tpu.ops.stencil import stencil_to_coo

from helpers import fflat


def test_dia_format_roundtrip(rng):
    a = sps.random(30, 30, density=0.2, random_state=0, format="csr")
    a = a + sps.eye(30)
    csr = sp.scipy_to_csr(a)
    dia, perm = sp.csr_to_dia(csr)
    assert perm is None
    np.testing.assert_allclose(
        np.asarray(dia.todense()), a.toarray(), atol=1e-13
    )
    x = rng.standard_normal(30)
    np.testing.assert_allclose(
        np.asarray(dia.matvec(jnp.asarray(x))), a @ x, atol=1e-12
    )


@pytest.mark.slow
def test_dia_rcm_reduces_bandwidth(rng):
    # random sparse SPD-ish pattern; RCM must not increase #diagonals
    a = sps.random(60, 60, density=0.06, random_state=2, format="csr")
    a = a + a.T + sps.eye(60)
    csr = sp.scipy_to_csr(a.tocsr())
    dia0, _ = sp.csr_to_dia(csr)
    dia1, perm = sp.csr_to_dia(csr, rcm_reorder=True)
    assert perm is not None
    assert len(dia1.offsets) <= len(dia0.offsets)
    # permuted matvec consistency: A x == P^T (A_perm (P x))
    x = rng.standard_normal(60)
    y_perm = np.asarray(dia1.matvec(jnp.asarray(x[perm])))
    y = np.empty_like(y_perm)
    y[perm] = y_perm
    np.testing.assert_allclose(y, a @ x, atol=1e-12)


def test_stencil_pallas_kernel_matches_xla(rng):
    prob = poisson.assemble_poisson(15, 15)  # 16x16 nodes
    xT = jnp.asarray(rng.standard_normal((2, 16, 16)))
    y_ref = np.asarray(prob.A.matvec_field(xT))
    y_pal = np.asarray(
        stencil_spmv_pallas(prob.A.planes, xT, bm=8, interpret=True)
    )
    np.testing.assert_allclose(y_pal, y_ref, rtol=1e-12, atol=1e-12)


def test_stencil_pallas_nondivisible_block(rng):
    prob = poisson.assemble_poisson(12, 12)  # 13x13 nodes, bm fallback
    xT = jnp.asarray(rng.standard_normal((2, 13, 13)))
    y_ref = np.asarray(prob.A.matvec_field(xT))
    y_pal = np.asarray(
        stencil_spmv_pallas(prob.A.planes, xT, bm=8, interpret=True)
    )
    np.testing.assert_allclose(y_pal, y_ref, rtol=1e-12, atol=1e-12)


def test_stencil_pallas_padded_matches_zero_pad(rng):
    prob = poisson.assemble_poisson(15, 15)
    xT = jnp.asarray(rng.standard_normal((2, 16, 16)))
    xp = jnp.pad(xT, ((0, 0), (1, 1), (1, 1)))
    y_ref = np.asarray(prob.A.matvec_field(xT))
    y_pal = np.asarray(
        stencil_spmv_pallas_padded(prob.A.planes, xp, bm=4, interpret=True)
    )
    np.testing.assert_allclose(y_pal, y_ref, rtol=1e-12, atol=1e-12)


def test_stencil_operator_pallas_backend(rng):
    """backend='pallas' is the production switch (-mat_stencil_backend)."""
    prob = poisson.assemble_poisson(15, 15, backend="pallas")
    assert prob.A.backend == "pallas"
    xT = jnp.asarray(rng.standard_normal((2, 16, 16)))
    y_pal = np.asarray(prob.A.matvec_field(xT))
    y_ref = np.asarray(prob.A.with_backend("xla").matvec_field(xT))
    np.testing.assert_allclose(y_pal, y_ref, rtol=1e-12, atol=1e-12)


def test_dist_stencil_pallas_backend(rng):
    """Distributed halo-overlap Pallas SpMV matches the XLA path on the
    8-fake-device mesh (interpret mode under shard_map)."""
    import jax

    from saddle_point_petsc_tpu.parallel import dist
    from saddle_point_petsc_tpu.parallel.mesh import make_mesh, shard_field

    mesh = make_mesh(8)
    grid = dist.DistGrid.create(15, 15, mesh)
    A, f, mask = dist.assemble_poisson_dist(grid, dtype=jnp.float64)
    x = shard_field(
        jnp.asarray(rng.standard_normal((2, grid.ny, grid.nx))), mesh
    )
    y_xla = np.asarray(jax.jit(A.matvec_field)(x))
    Ap = A.with_backend("pallas")
    y_pal = np.asarray(jax.jit(Ap.matvec_field)(x))
    np.testing.assert_allclose(y_pal, y_xla, rtol=1e-12, atol=1e-12)


def test_ell_pallas_kernel_matches_scipy(rng):
    from saddle_point_petsc_tpu.ops.pallas.spmv import (
        ell_spmv_pallas,
        ell_transpose,
    )

    a = sps.random(96, 96, density=0.1, random_state=4, format="csr")
    a = a + sps.eye(96)
    ell = sp.csr_to_ell(sp.scipy_to_csr(a.tocsr()))
    ct, vt = ell_transpose(ell)
    x = jnp.asarray(rng.standard_normal(96))
    y = np.asarray(ell_spmv_pallas(ct, vt, x, interpret=True))
    np.testing.assert_allclose(y, a @ np.asarray(x), atol=1e-12)
    # parity with the XLA ELL path
    np.testing.assert_allclose(
        y, np.asarray(sp.ell_matvec(ell, x)), atol=1e-12
    )


def test_dia_pallas_kernel_matches_xla(rng):
    prob = poisson.assemble_poisson(7, 7)
    csr = sp.csr_compact(sp.coo_to_csr(stencil_to_coo(prob.A.W)))
    dia, _ = sp.csr_to_dia(csr)
    x = jnp.asarray(rng.standard_normal(csr.shape[0]))
    y_ref = np.asarray(dia.matvec(x))
    y_pal = np.asarray(
        dia_spmv_pallas(dia.data, x, dia.offsets, bn=32, interpret=True)
    )
    np.testing.assert_allclose(y_pal, y_ref, rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(
        y_ref,
        np.asarray(csr.todense()) @ np.asarray(x),
        rtol=1e-10,
        atol=1e-12,
    )


def test_dia_spmv_pallas_2d_exact(rng):
    """2D-tiled DIA kernel (all 8 sublanes live — the r3 1D kernel ran
    on (1, bn) blocks at 1/8 VPU) vs the XLA lowering, incl. offsets
    that are not multiples of the 128-lane width."""
    from saddle_point_petsc_tpu.ops.pallas.spmv import dia_spmv_pallas_2d

    n1 = 37  # odd: offsets (-37, -1, 0, 1, 37) exercise lane rotates
    ix = sps.identity(n1)
    t1 = sps.diags([-1.0, 4.0, -1.0], [-1, 0, 1], (n1, n1))
    a = (sps.kron(ix, t1) + sps.kron(t1, ix)).tocsr().astype(np.float32)
    dia, _ = sp.csr_to_dia(sp.scipy_to_csr(a))
    x = jnp.asarray(rng.standard_normal(a.shape[0]), jnp.float32)
    y = np.asarray(
        dia_spmv_pallas_2d(dia.data, x, dia.offsets, interpret=True)
    )
    np.testing.assert_allclose(y, a @ np.asarray(x), atol=1e-4)
    offs = (-300, -17, -1, 0, 3, 129, 255)
    n = 1000
    data = jnp.asarray(
        rng.standard_normal((len(offs), n)), jnp.float32
    )
    d = sp.DIA(data, offs, (n, n))
    y2 = np.asarray(
        dia_spmv_pallas_2d(data, x[:n], offs, interpret=True)
    )
    np.testing.assert_allclose(
        y2, np.asarray(sp.dia_matvec(d, x[:n])), atol=1e-4
    )


def test_bdia_spmv_pallas_2d_matches_xla(rng):
    """2D block-DIA kernel (interpret) vs the XLA b^2-chain lowering and
    the scipy oracle — incl. a multi-band (9-point, 2x2 block) pattern."""
    import dataclasses

    n1 = 20
    ix = sps.identity(n1)
    t = sps.diags([-1.0, 4.0, -1.0], [-1, 0, 1], (n1, n1))
    a = (sps.kron(ix, t) + sps.kron(t, ix)).tocsr().astype(np.float32)
    csr = sp.scipy_to_csr(a)
    bdia = sp.bsr_to_bdia(sp.csr_to_bsr(csr, block=2))
    x = rng.standard_normal(a.shape[0]).astype(np.float32)
    xb = jnp.asarray(np.ascontiguousarray(x.reshape(-1, 2).T))
    ref = (a @ x).reshape(-1, 2).T
    y_xla = np.asarray(sp.bdia_matvec_dofmajor(bdia, xb))
    y_pal = np.asarray(
        sp.bdia_matvec_dofmajor(
            dataclasses.replace(bdia, backend="pallas"), xb
        )
    )
    np.testing.assert_allclose(y_xla, ref, rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(y_pal, ref, rtol=2e-5, atol=2e-5)
