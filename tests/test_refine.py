"""Double-float arithmetic and mixed-precision refinement tests.

The refinement path must reach rtol 1e-8 (north star) using only f32
compute — verified against an f64 oracle on CPU.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from saddle_point_petsc_tpu.models import poisson
from saddle_point_petsc_tpu.ops import doublefloat as dfm
from saddle_point_petsc_tpu.ops.doublefloat import DF, df_from_f64, df_to_f64
from saddle_point_petsc_tpu.solvers import krylov, refine


def test_two_sum_exact(rng):
    a = jnp.asarray(rng.standard_normal(100).astype(np.float32))
    b = jnp.asarray((rng.standard_normal(100) * 1e-6).astype(np.float32))
    s, e = dfm.two_sum(a, b)
    exact = np.asarray(a, np.float64) + np.asarray(b, np.float64)
    got = np.asarray(s, np.float64) + np.asarray(e, np.float64)
    np.testing.assert_array_equal(got, exact)


def test_two_prod_exact(rng):
    a = jnp.asarray(rng.standard_normal(100).astype(np.float32))
    b = jnp.asarray(rng.standard_normal(100).astype(np.float32))
    p, e = dfm.two_prod(a, b)
    exact = np.asarray(a, np.float64) * np.asarray(b, np.float64)
    got = np.asarray(p, np.float64) + np.asarray(e, np.float64)
    np.testing.assert_array_equal(got, exact)


def test_df_roundtrip(rng):
    x = rng.standard_normal(50)  # f64
    df = df_from_f64(x)
    np.testing.assert_allclose(df_to_f64(df), x, rtol=1e-13)


def test_df_matvec_accuracy():
    """Compensated matvec must be ~1e-14 accurate vs the f64 oracle —
    far beyond the ~1e-7 of a plain f32 matvec."""
    rng = np.random.default_rng(3)
    prob64 = poisson.assemble_poisson(16, 16, dtype=jnp.float64)
    planes64 = np.asarray(prob64.A.planes)
    x64 = rng.standard_normal((2, 17, 17))
    y64 = np.asarray(prob64.A.matvec_field(jnp.asarray(x64)))

    planes_df = df_from_f64(planes64)
    x_df = df_from_f64(x64)
    y_df = dfm.df_planes_matvec(planes_df, x_df)
    err_df = np.abs(df_to_f64(y_df) - y64).max() / np.abs(y64).max()

    from saddle_point_petsc_tpu.ops.stencil import planes_matvec_field

    y_f32 = np.asarray(
        planes_matvec_field(
            jnp.asarray(planes64.astype(np.float32)),
            jnp.asarray(x64.astype(np.float32)),
        ),
        np.float64,
    )
    err_f32 = np.abs(y_f32 - y64).max() / np.abs(y64).max()
    assert err_df < 1e-12, err_df
    assert err_f32 > 1e-8  # sanity: plain f32 really is much worse
    assert err_df < err_f32 * 1e-4


def test_refined_solve_reaches_1em10_with_f32_inner():
    """f32 inner CG + df residuals must reach rtol 1e-10 (vs f64 oracle)."""
    prob64 = poisson.assemble_poisson(16, 16, dtype=jnp.float64)
    planes64 = np.asarray(prob64.A.planes)
    b64 = np.asarray(prob64.f)

    from saddle_point_petsc_tpu.ops.stencil import StencilOperator

    A32 = StencilOperator(jnp.asarray(planes64.astype(np.float32)))

    class DFOp:
        planes = A32.planes
        planes_df = df_from_f64(planes64)

    inner = refine.inner_cg(A32, rtol=1e-4, maxiter=300)
    res = refine.solve_refined(
        DFOp(), df_from_f64(b64), inner, rtol=1e-10, max_cycles=8
    )
    assert res.rnorm <= 1e-10 * res.rnorm0, (res.rnorm, res.rnorm0)
    # compare against the f64 solve
    ref = krylov.cg(prob64.A, prob64.f, rtol=1e-12, maxiter=1000)
    x64 = df_to_f64(res.x)
    np.testing.assert_allclose(
        x64, np.asarray(ref.x), rtol=1e-7, atol=1e-11
    )
    # and it must have taken more than one cycle (f32 alone can't do 1e-10)
    assert res.cycles >= 2


def test_refined_kkt_distributed_parity():
    """Refinement composed with the DISTRIBUTED operator: the fused
    refined-KKT loop over a DistSaddleOperator on the fake 8-device mesh
    must reach rtol 1e-8 with serial-parity cycles/inner iterations and
    the same solution.  (The reference reaches 1e-8 in every parallel run
    for free from f64 PETSc scalars, /root/reference/src/
    SaddlePointProblem.c:70; this is our f32-TPU equivalent, distributed.)
    """
    from saddle_point_petsc_tpu.models import saddle as smod
    from saddle_point_petsc_tpu.ops.stencil import StencilOperator
    from saddle_point_petsc_tpu.parallel import dist
    from saddle_point_petsc_tpu.parallel.mesh import make_mesh, shard_field
    from saddle_point_petsc_tpu.solvers import precond
    from saddle_point_petsc_tpu.solvers.operators import SaddleOperator

    nex = 31  # 32x32 nodes: divides the (2, 4) fake mesh exactly
    prob64 = smod.assemble_saddle(nex, nex, dtype=jnp.float64,
                                  body_force="trig")
    planes_df = df_from_f64(np.asarray(prob64.A.planes))
    Bf_df = df_from_f64(np.asarray(prob64.Bf))
    b_df = (df_from_f64(np.asarray(prob64.f)),
            df_from_f64(np.asarray(prob64.g)))

    # serial fused refinement
    A32 = StencilOperator(planes_df.hi)
    K32 = SaddleOperator(A32, Bf_df.hi)
    M = precond.schur_pc(A32, Bf_df.hi, fact_type="diag")
    out_s = refine.solve_refined_kkt_fused(
        K32, b_df, rtol=1e-8, planes_df=planes_df, Bf_df=Bf_df, M=M,
        inner_rtol=1e-4, inner_maxiter=1500,
    )()
    x_s, cyc_s, its_s, rn_s, bn_s = jax.device_get(out_s)
    assert rn_s <= 1e-8 * bn_s

    # distributed twin: same df data sharded over the mesh; the df residual
    # (plain jnp ops) is partitioned by XLA, the inner MINRES matvec runs
    # through the shard_map halo-exchange path
    mesh = make_mesh(8)
    sh = lambda df: DF(shard_field(df.hi, mesh), shard_field(df.lo, mesh))
    planes_dd, Bf_dd = sh(planes_df), sh(Bf_df)
    Ad = dist.DistStencilOperator(planes_dd.hi, mesh,
                                  active_shape=(nex + 1, nex + 1))
    Kd = dist.DistSaddleOperator(Ad, Bf_dd.hi)
    Md = precond.schur_pc(Ad, Bf_dd.hi, fact_type="diag")
    b_dd = (sh(b_df[0]), b_df[1])
    out_d = refine.solve_refined_kkt_fused(
        Kd, b_dd, rtol=1e-8, planes_df=planes_dd, Bf_df=Bf_dd, M=Md,
        inner_rtol=1e-4, inner_maxiter=1500,
    )()
    x_d, cyc_d, its_d, rn_d, bn_d = jax.device_get(out_d)
    assert rn_d <= 1e-8 * bn_d, (rn_d, bn_d)
    assert abs(int(cyc_d) - int(cyc_s)) <= 1, (cyc_d, cyc_s)
    assert abs(int(its_d) - int(its_s)) <= 5, (its_d, its_s)
    xu_s = df_to_f64(DF(np.asarray(x_s[0].hi), np.asarray(x_s[0].lo)))
    xu_d = df_to_f64(DF(np.asarray(x_d[0].hi), np.asarray(x_d[0].lo)))
    np.testing.assert_allclose(xu_d, xu_s, rtol=0, atol=1e-9)


def test_df_sum_accuracy(rng):
    x = rng.standard_normal(100000)
    df = df_from_f64(x)
    s = dfm.df_sum(df)
    exact = np.sum(x)
    got = float(s.hi) + float(s.lo)
    assert abs(got - exact) / abs(np.sum(np.abs(x))) < 1e-13
    # plain f32 sum is far worse
    naive = float(np.sum(x.astype(np.float32), dtype=np.float32))
    assert abs(got - exact) < abs(naive - exact) or abs(naive - exact) < 1e-12


def test_refined_kkt_reaches_1em9():
    from saddle_point_petsc_tpu.models import saddle as smod
    from saddle_point_petsc_tpu.ops.stencil import StencilOperator
    from saddle_point_petsc_tpu.solvers import precond
    from saddle_point_petsc_tpu.solvers.operators import SaddleOperator

    prob64 = smod.assemble_saddle(16, 16, dtype=jnp.float64, body_force="trig")
    planes_df = df_from_f64(np.asarray(prob64.A.planes))
    Bf_df = df_from_f64(np.asarray(prob64.Bf))
    A32 = StencilOperator(planes_df.hi)
    K32 = SaddleOperator(A32, Bf_df.hi)
    M = precond.schur_pc(A32, Bf_df.hi, fact_type="diag")

    @jax.jit
    def _run(ru, rlam):
        res = krylov.minres(K32, (ru, rlam), M=M, rtol=1e-4, maxiter=600)
        return res.x, res.iterations

    def inner(ru, rlam):
        (du, dlam), its = _run(ru, rlam)
        return (du, dlam), int(its)

    b_df = (df_from_f64(np.asarray(prob64.f)),
            df_from_f64(np.asarray(prob64.g)))
    res = refine.solve_refined_kkt(
        K32, b_df, inner, rtol=1e-9, max_cycles=12,
        planes_df=planes_df, Bf_df=Bf_df,
    )
    assert res.rnorm <= 1e-9 * res.rnorm0, (res.rnorm, res.rnorm0)
    # against the f64 oracle
    ref = krylov.minres(prob64.K, prob64.rhs, rtol=1e-11, maxiter=3000)
    np.testing.assert_allclose(
        df_to_f64(res.x[0]), np.asarray(ref.x[0]), rtol=1e-5, atol=1e-9
    )
