"""Distributed (shard_map) tests on a fake 8-device CPU mesh — the same
SPMD code paths as a TPU pod slice (SURVEY.md §4 item 4)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from saddle_point_petsc_tpu.models import poisson, saddle
from saddle_point_petsc_tpu.parallel import dist, halo
from saddle_point_petsc_tpu.parallel.mesh import (
    GX,
    GY,
    decide_process_grid,
    field_sharding,
    make_mesh,
    shard_field,
)
from saddle_point_petsc_tpu.solvers import krylov

from helpers import fflat


@pytest.fixture(scope="module")
def mesh24():
    return make_mesh(8, shape=(2, 4))


def test_decide_process_grid():
    assert decide_process_grid(8, 100, 100) in [(2, 4), (4, 2)]
    assert decide_process_grid(4, 100, 100) == (2, 2)
    assert decide_process_grid(8, 800, 100) == (8, 1)
    py, px = decide_process_grid(6, 100, 100)
    assert py * px == 6


def test_halo_exchange_matches_zero_pad(mesh24, rng):
    """Sharded halo_exchange must reproduce zero padding blockwise.
    Spatial dims are the LAST two (canonical dof-major layout)."""
    x = rng.standard_normal((2, 8, 16))
    xs = shard_field(jnp.asarray(x), mesh24)

    fn = jax.jit(
        jax.shard_map(
            lambda xl: halo.halo_exchange(xl),
            mesh=mesh24,
            in_specs=(P(None, GY, GX),),
            out_specs=P(None, GY, GX),
        )
    )
    out = np.asarray(fn(xs))  # blocks concatenated: (2, 2*6, 4*6)
    xp = np.pad(x, ((0, 0), (1, 1), (1, 1)))
    my, mx = 4, 4
    for pj in range(2):
        for pi in range(4):
            blk = out[:, pj * 6 : (pj + 1) * 6, pi * 6 : (pi + 1) * 6]
            expect = xp[
                :, pj * my : pj * my + my + 2, pi * mx : pi * mx + mx + 2
            ]
            np.testing.assert_allclose(blk, expect)


def test_halo_add_is_adjoint_of_exchange(mesh24, rng):
    """<halo_exchange(x), y> == <x, halo_add(y)> — the VecScatter
    forward/reverse pair must be exact adjoints."""
    x = jnp.asarray(rng.standard_normal((2, 8, 16)))
    # padded blocks: (2, py*(my+2), px*(mx+2)) = (2, 12, 24)
    y = jnp.asarray(rng.standard_normal((2, 12, 24)))

    ex = jax.jit(
        jax.shard_map(
            halo.halo_exchange, mesh=mesh24,
            in_specs=(P(None, GY, GX),), out_specs=P(None, GY, GX),
        )
    )
    ad = jax.jit(
        jax.shard_map(
            halo.halo_add, mesh=mesh24,
            in_specs=(P(None, GY, GX),), out_specs=P(None, GY, GX),
        )
    )
    xs = shard_field(x, mesh24)
    ys = jax.device_put(
        y, jax.sharding.NamedSharding(mesh24, P(None, GY, GX))
    )
    lhs = float(jnp.vdot(ex(xs), ys))
    rhs = float(jnp.vdot(xs, ad(ys)))
    np.testing.assert_allclose(lhs, rhs, rtol=1e-12)


@pytest.mark.parametrize("nex,ney", [(15, 15), (13, 9)])
def test_dist_assembly_matches_serial(mesh24, nex, ney):
    grid = dist.DistGrid.create(nex, ney, mesh24)
    A, f, mask = dist.assemble_poisson_dist(grid)
    ref = poisson.assemble_poisson(nex, ney)
    nyn, nxn = ney + 1, nex + 1
    W = np.asarray(A.W)[:nyn, :nxn]
    np.testing.assert_allclose(W, np.asarray(ref.A.W), atol=1e-12)
    np.testing.assert_allclose(
        np.asarray(f)[:, :nyn, :nxn], np.asarray(ref.f), atol=1e-13
    )
    # padded nodes are identity rows with zero rhs
    fW = np.asarray(A.W)
    if fW.shape[0] > nyn:
        pad_rows = fW[nyn:]
        np.testing.assert_allclose(
            pad_rows[:, :, 1, 1], np.eye(2), atol=1e-14
        )


def test_dist_matvec_matches_serial(mesh24, rng):
    grid = dist.DistGrid.create(15, 15, mesh24)
    A, f, mask = dist.assemble_poisson_dist(grid)
    ref = poisson.assemble_poisson(15, 15)
    x = rng.standard_normal((2, 16, 16))
    xs = shard_field(jnp.asarray(x), mesh24)
    y_dist = np.asarray(jax.jit(A.matvec_field)(xs))
    y_ref = np.asarray(ref.A.matvec_field(jnp.asarray(x)))
    np.testing.assert_allclose(y_dist, y_ref, atol=1e-12)


def test_dist_cg_solve_matches_serial(mesh24):
    grid = dist.DistGrid.create(15, 15, mesh24)
    A, f, mask = dist.assemble_poisson_dist(grid)
    res = krylov.cg(A, f, rtol=1e-10, maxiter=500)
    assert res.converged_reason > 0
    ref = poisson.assemble_poisson(15, 15)
    res_ref = krylov.cg(ref.A, ref.f, rtol=1e-10, maxiter=500)
    # identical math => identical iterate counts (deterministic reductions
    # may differ at roundoff; allow 1)
    assert abs(int(res.iterations) - int(res_ref.iterations)) <= 1
    np.testing.assert_allclose(
        np.asarray(res.x), np.asarray(res_ref.x), rtol=1e-6, atol=1e-9
    )


@pytest.mark.slow
def test_dist_saddle_solve(mesh24):
    grid = dist.DistGrid.create(15, 15, mesh24)
    K, rhs, mask = dist.assemble_saddle_dist(grid, body_force="trig")
    res = krylov.minres(K, rhs, rtol=1e-9, maxiter=3000)
    assert res.converged_reason > 0
    # compare against serial KKT
    ref = saddle.assemble_saddle(15, 15, body_force="trig")
    res_ref = krylov.minres(ref.K, ref.rhs, rtol=1e-9, maxiter=3000)
    np.testing.assert_allclose(
        np.asarray(res.x[0]), np.asarray(res_ref.x[0]), rtol=1e-4, atol=1e-7
    )
    np.testing.assert_allclose(
        np.asarray(res.x[1]), np.asarray(res_ref.x[1]), rtol=1e-4, atol=1e-7
    )


@pytest.mark.slow
def test_dist_constraints_match_serial(mesh24):
    grid = dist.DistGrid.create(15, 15, mesh24)
    A, f, mask = dist.assemble_poisson_dist(grid)
    Bf = dist.assemble_constraints_dist(grid, mask)
    ref = saddle.assemble_saddle(15, 15)
    np.testing.assert_allclose(np.asarray(Bf), np.asarray(ref.Bf), atol=1e-12)


def test_dist_jacobi_pc(mesh24):
    from saddle_point_petsc_tpu.solvers import precond

    grid = dist.DistGrid.create(15, 15, mesh24)
    A, f, mask = dist.assemble_poisson_dist(grid)
    d = A.diagonal()
    M = precond.JacobiPC(1.0 / jnp.where(d == 0, 1.0, d))
    res = krylov.cg(A, f, M=M, rtol=1e-10, maxiter=500)
    assert res.converged_reason > 0


def test_dist_matmat_matches_serial(mesh24, rng):
    """Distributed SpMM (one halo exchange for all k RHS) vs serial."""
    grid = dist.DistGrid.create(15, 15, mesh24)
    A, f, _ = dist.assemble_poisson_dist(grid)
    ref = poisson.assemble_poisson(15, 15)
    X = jnp.asarray(rng.standard_normal((4, 2, 16, 16)))
    Xs = jax.device_put(
        X, jax.sharding.NamedSharding(mesh24, P(None, None, GY, GX))
    )
    Y_d = np.asarray(jax.jit(A.matmat_field)(Xs))
    Y_s = np.asarray(ref.A.matmat_field(X))
    np.testing.assert_allclose(Y_d, Y_s, atol=1e-12)


@pytest.mark.parametrize("pc_type", ["pbjacobi", "sor", "fieldsplit"])
def test_dist_pc_iterate_parity(mesh24, pc_type):
    """The same PC on the distributed operator must reproduce the serial
    iterate count (±1, roundoff in reduction order) — VERDICT round-1
    item 3 'done' criterion."""
    from saddle_point_petsc_tpu.solvers.ksp import make_pc

    grid = dist.DistGrid.create(15, 15, mesh24)
    A, f, _ = dist.assemble_poisson_dist(grid)
    ref = poisson.assemble_poisson(15, 15)
    M_d = make_pc(pc_type, A)
    M_s = make_pc(pc_type, ref.A)
    res_d = krylov.cg(A, f, M=M_d, rtol=1e-10, maxiter=500)
    res_s = krylov.cg(ref.A, ref.f, M=M_s, rtol=1e-10, maxiter=500)
    assert res_d.converged_reason > 0
    assert abs(int(res_d.iterations) - int(res_s.iterations)) <= 1
    np.testing.assert_allclose(
        np.asarray(res_d.x), np.asarray(res_s.x), rtol=1e-6, atol=1e-9
    )


@pytest.mark.slow
def test_dist_block_jacobi_pc(mesh24):
    """Per-patch block-Jacobi (PETSc parallel-default analog): symmetric,
    linear, and cuts CG iterations vs plain Jacobi."""
    from saddle_point_petsc_tpu.solvers import precond

    grid = dist.DistGrid.create(23, 23, mesh24)
    A, f, _ = dist.assemble_poisson_dist(grid)
    M = dist.dist_block_jacobi(A, iters=6)
    # symmetry of the PC (required for CG): <M r1, r2> == <r1, M r2>
    r1 = shard_field(jnp.asarray(np.random.default_rng(1).standard_normal(
        (2, grid.ny, grid.nx))), mesh24)
    r2 = shard_field(jnp.asarray(np.random.default_rng(2).standard_normal(
        (2, grid.ny, grid.nx))), mesh24)
    lhs = float(jnp.vdot(M(r1), r2))
    rhs = float(jnp.vdot(r1, M(r2)))
    np.testing.assert_allclose(lhs, rhs, rtol=1e-10)
    res_bj = krylov.cg(A, f, M=M, rtol=1e-10, maxiter=500)
    from saddle_point_petsc_tpu.solvers.precond import jacobi

    res_j = krylov.cg(A, f, M=jacobi(A), rtol=1e-10, maxiter=500)
    assert res_bj.converged_reason > 0
    assert int(res_bj.iterations) < int(res_j.iterations)


@pytest.mark.slow
def test_dist_mg_iterate_parity(mesh24):
    """Distributed geometric MG (crop/pad over the padded grid, sharded
    hierarchy partitioned by XLA) matches the serial MG iterate count."""
    from saddle_point_petsc_tpu.solvers.multigrid import mg_pc, mg_pc_dist

    nex = 32  # 33x33 true nodes -> padded to 34x36 on the (2,4) mesh
    grid = dist.DistGrid.create(nex, nex, mesh24)
    A, f, _ = dist.assemble_poisson_dist(grid)
    assert A.active_shape == (33, 33)
    M_d = mg_pc_dist(A)
    res_d = krylov.cg(A, f, M=M_d, rtol=1e-10, maxiter=100)

    ref = poisson.assemble_poisson(nex, nex)
    M_s = mg_pc(ref.A)
    res_s = krylov.cg(ref.A, ref.f, M=M_s, rtol=1e-10, maxiter=100)
    assert res_d.converged_reason > 0
    assert abs(int(res_d.iterations) - int(res_s.iterations)) <= 1
    np.testing.assert_allclose(
        np.asarray(res_d.x)[:, :33, :33], np.asarray(res_s.x),
        rtol=1e-6, atol=1e-9,
    )


@pytest.mark.slow
def test_dist_schur_kkt_iterate_parity(mesh24):
    """Distributed KKT + Schur fieldsplit with a strong inner solve matches
    the serial iterate count — the flagship PC proven under shard_map."""
    from saddle_point_petsc_tpu.solvers import precond

    grid = dist.DistGrid.create(15, 15, mesh24)
    K, rhs, _ = dist.assemble_saddle_dist(grid, body_force="trig")
    ref = saddle.assemble_saddle(15, 15, body_force="trig")

    def run(K, rhs, A):
        inner0 = precond.jacobi(A)
        est = float(precond.estimate_lmax(A, M=inner0, template=K.Bf[0]))
        inner = precond.chebyshev_pc(
            A, inner=inner0, lmin=0.11 * est, lmax=1.1 * est, iters=3
        )
        M = precond.schur_pc(A, K.Bf, inner, fact_type="diag")
        return krylov.minres(K, rhs, M=M, rtol=1e-9, maxiter=1000)

    res_d = run(K, rhs, K.A)
    res_s = run(ref.K, ref.rhs, ref.A)
    assert res_d.converged_reason > 0
    assert abs(int(res_d.iterations) - int(res_s.iterations)) <= 1
    np.testing.assert_allclose(
        np.asarray(res_d.x[0]), np.asarray(res_s.x[0]), rtol=1e-4, atol=1e-8
    )


def test_dist_ilu0_one_device_matches_serial():
    """Per-patch ILU(0) on a 1-device mesh == serial ILU(0): identical
    iterate counts (the patch is the whole grid, so the factorization and
    sweep application coincide bit-for-bit)."""
    from saddle_point_petsc_tpu.models import poisson
    from saddle_point_petsc_tpu.solvers.ilu_stencil import (
        dist_ilu0,
        stencil_ilu0,
    )

    mesh1 = make_mesh(1)
    grid1 = dist.DistGrid.create(31, 31, mesh1)
    A1, f1, _ = dist.assemble_poisson_dist(grid1, dtype=jnp.float64)
    r1 = krylov.gmres(A1, f1, M=dist_ilu0(A1, sweeps=6), rtol=1e-8,
                      maxiter=500)
    prob = poisson.assemble_poisson(31, 31, dtype=jnp.float64)
    rs = krylov.gmres(prob.A, prob.f, M=stencil_ilu0(prob.A, sweeps=6),
                      rtol=1e-8, maxiter=500)
    assert int(r1.converged_reason) > 0
    assert int(r1.iterations) == int(rs.iterations)


def test_dist_ilu0_vs_chebyshev_local_solve():
    """PETSc parallel-default semantics: bjacobi + per-patch ILU(0) local
    solves (8 patches).  Converges, and its iterate count is within 1.5x
    of the Chebyshev local-solve variant (the two local solvers are
    comparable-quality block solves; recorded here as the VERDICT r2
    missing-#2 comparison)."""
    from saddle_point_petsc_tpu.solvers.ilu_stencil import dist_ilu0

    mesh = make_mesh(8)
    grid = dist.DistGrid.create(63, 63, mesh)
    A, f, _ = dist.assemble_poisson_dist(grid, dtype=jnp.float64)
    r_ilu = krylov.gmres(A, f, M=dist_ilu0(A, sweeps=6), rtol=1e-8,
                         maxiter=500)
    r_cheb = krylov.gmres(A, f, M=dist.dist_block_jacobi(A, iters=8),
                          rtol=1e-8, maxiter=500)
    assert int(r_ilu.converged_reason) > 0
    assert int(r_cheb.converged_reason) > 0
    ratio = int(r_ilu.iterations) / max(int(r_cheb.iterations), 1)
    assert ratio < 1.5, (int(r_ilu.iterations), int(r_cheb.iterations))


def test_make_pc_dist_ilu_and_sub_pc_type():
    """-pc_type ilu on a DistStencilOperator builds per-patch ILU(0);
    -pc_type bjacobi -sub_pc_type chebyshev keeps the Chebyshev local
    solve (both PETSc-parallel-default spellings round-trip)."""
    from saddle_point_petsc_tpu.solvers.ilu_stencil import DistILU0PC
    from saddle_point_petsc_tpu.solvers.ksp import make_pc
    from saddle_point_petsc_tpu.solvers.precond import ChebyshevPC
    from saddle_point_petsc_tpu.utils.options import Options

    mesh = make_mesh(8)
    grid = dist.DistGrid.create(31, 31, mesh)
    A, f, _ = dist.assemble_poisson_dist(grid, dtype=jnp.float64)
    pc = make_pc("ilu", A, Options())
    assert isinstance(pc, DistILU0PC)
    pc2 = make_pc("bjacobi", A, Options(["-sub_pc_type", "chebyshev"]))
    assert isinstance(pc2, ChebyshevPC)
    pc3 = make_pc("bjacobi", A, Options())  # PETSc default sub-PC: ilu
    assert isinstance(pc3, DistILU0PC)


def test_halo_exchange_1phase_matches_two_phase(mesh24):
    """The single-phase (8 concurrent ppermutes) box exchange returns the
    same padded field as the two-phase reference implementation,
    including the corner ghosts."""
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.standard_normal((2, 16, 16)))
    xs = shard_field(x, mesh24)

    def run(fn):
        return jax.shard_map(
            fn, mesh=mesh24,
            in_specs=P(None, GY, GX),
            out_specs=P(None, GY, GX),
        )

    # compare via a crop that keeps per-device shapes mesh-divisible:
    # fold the padded block back with the (linear) adjoint halo_add —
    # identical padded inputs give identical folded outputs, and corner
    # ghosts route through it
    a = run(lambda v: halo.halo_add(halo.halo_exchange(v)))(xs)
    b = run(lambda v: halo.halo_add(halo.halo_exchange_1phase(v)))(xs)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=0)
    # and elementwise: pad each variant, multiply by a fixed random
    # padded-shape weight, and reduce locally -> any ghost mismatch
    # (corners included) changes the per-patch sums
    w = jnp.asarray(rng.standard_normal((2, 10, 6)))  # (16/2+2, 16/4+2)

    def probe(fn):
        def local(v):
            return jnp.sum(fn(v) * w)[None, None]

        return np.asarray(
            jax.shard_map(
                local, mesh=mesh24,
                in_specs=P(None, GY, GX), out_specs=P(GY, GX),
            )(xs)
        )

    np.testing.assert_allclose(
        probe(halo.halo_exchange), probe(halo.halo_exchange_1phase),
        rtol=0, atol=0,
    )
