"""Device-side double-float assembly (models/assemble_df.py) vs the host
f64 oracle.

The df assembly must reproduce the f64 host assembly (models/saddle.py
under jax_enable_x64) to double-float accuracy (~1e-14 relative): it is
the input of the rtol-1e-8 refinement path, so any hi/lo compensation
bug shows up directly as a solve-accuracy regression.  ref: the
distributed-assembly semantics being mirrored are
/root/reference/src/Discretization.c:130-274.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from saddle_point_petsc_tpu.models import fem, saddle as smod
from saddle_point_petsc_tpu.models.assemble_df import (
    assemble_saddle_df,
    assemble_saddle_dist_df,
    element_stiffness_entries_df,
)
from saddle_point_petsc_tpu.ops.doublefloat import (
    DF,
    df_div,
    df_from_f64,
    df_mul_f,
    df_to_f64,
)
from saddle_point_petsc_tpu.parallel.dist import DistGrid
from saddle_point_petsc_tpu.parallel.mesh import GX, GY


def _oracle(nex, ney, body_force):
    prob = smod.assemble_saddle(
        nex, ney, dtype=jnp.float64, body_force=body_force
    )
    return (
        np.asarray(prob.A.planes),
        np.asarray(prob.f),
        np.asarray(prob.Bf),
        np.asarray(prob.bc_mask),
    )


def _relerr(a, b):
    return np.max(np.abs(a - b)) / max(np.max(np.abs(b)), 1e-30)


@pytest.mark.parametrize("method", ["separable", "element"])
@pytest.mark.parametrize("body_force", ["trig", "constant"])
def test_serial_df_assembly_matches_f64(body_force, method):
    p64, f64v, B64, m64 = _oracle(12, 12, body_force)
    (planes_df, Bf_df, f_df, g_df, mask), _ = assemble_saddle_df(
        12, 12, body_force=body_force, method=method
    )
    assert _relerr(df_to_f64(planes_df), p64) < 1e-12
    assert _relerr(df_to_f64(f_df), f64v) < 1e-12
    assert _relerr(df_to_f64(Bf_df), B64) < 1e-12
    assert np.array_equal(np.asarray(mask), m64)
    assert np.all(np.asarray(g_df.hi) == 0.0)


@pytest.mark.parametrize("method", ["separable", "element"])
def test_dist_df_assembly_matches_f64_with_padding(method):
    """4x2 fake mesh, 31x31 nodes padded to 32x32: true region matches the
    f64 oracle; pad rows are identity/zero (harmless to Krylov)."""
    p64, f64v, B64, _ = _oracle(30, 30, "trig")
    mesh = Mesh(np.array(jax.devices()).reshape(4, 2), (GY, GX))
    grid = DistGrid.create(30, 30, mesh)
    planes_df, Bf_df, f_df, g_df, mask = assemble_saddle_dist_df(
        grid, "trig", method=method
    )
    pd = df_to_f64(planes_df)
    assert _relerr(pd[..., :31, :31], p64) < 1e-12
    assert _relerr(df_to_f64(f_df)[..., :31, :31], f64v) < 1e-12
    assert _relerr(df_to_f64(Bf_df)[..., :31, :31], B64) < 1e-12
    assert np.all(pd[0, 1, 1, 31:, :] == 1.0)
    assert np.all(pd[3, 1, 1, :, 31:] == 1.0)
    assert np.all(df_to_f64(f_df)[:, 31:, :] == 0.0)


def test_general_coords_element_stiffness_df():
    """The batched df Ke path on NON-uniform per-element coords vs the f64
    element kernel (the general case the uniform shortcut broadcasts)."""
    rng = np.random.default_rng(3)
    base = fem.uniform_node_coords(4, 4, dtype=jnp.float64)
    pert = np.asarray(base) + 0.02 * rng.standard_normal(base.shape)
    el64 = np.asarray(
        fem.element_corner_coords(jnp.asarray(pert, jnp.float64))
    )
    ke64 = np.asarray(fem.element_stiffness(jnp.asarray(el64, jnp.float64)))
    K = element_stiffness_entries_df(df_from_f64(el64))
    for (a, c, b, d), v in K.items():
        got = df_to_f64(v)
        want = ke64[..., 2 * a + c, 2 * b + d]
        assert np.max(np.abs(got - want)) < 1e-12 * np.max(np.abs(ke64))


def test_df_div_and_mul_f():
    rng = np.random.default_rng(1)
    a64 = rng.standard_normal(64) * 10.0
    b64 = rng.standard_normal(64) + 3.0
    q = df_to_f64(df_div(df_from_f64(a64), df_from_f64(b64)))
    assert np.max(np.abs(q - a64 / b64) / np.abs(a64 / b64)) < 1e-13
    s = np.float32(1.7)
    m = df_to_f64(df_mul_f(df_from_f64(a64), s))
    assert np.max(np.abs(m - a64 * np.float64(s))) < 1e-12 * 10


def test_df_assembly_solves_to_1e8():
    """End-to-end: refine on the DEVICE-assembled df system reaches rel
    1e-8 (the config-5 pipeline with the host assembly stage removed)."""
    from saddle_point_petsc_tpu.parallel.dist import (
        DistSaddleOperator,
        DistStencilOperator,
    )
    from saddle_point_petsc_tpu.solvers import precond, refine

    mesh = Mesh(np.array(jax.devices()).reshape(4, 2), (GY, GX))
    grid = DistGrid.create(24, 24, mesh)
    planes_df, Bf_df, f_df, g_df, mask = assemble_saddle_dist_df(
        grid, "trig"
    )
    Ad = DistStencilOperator(
        planes_df.hi, mesh, active_shape=(25, 25)
    )
    Kd = DistSaddleOperator(Ad, Bf_df.hi)
    Md = precond.schur_pc(Ad, Bf_df.hi, fact_type="diag")
    run = refine.solve_refined_kkt_fused(
        Kd, (f_df, g_df), rtol=1e-8, planes_df=planes_df, Bf_df=Bf_df,
        M=Md, inner_rtol=1e-3, inner_maxiter=2000,
    )
    x, cycles, inner_its, rn, bn = jax.device_get(run())
    assert float(rn / bn) <= 1e-8
