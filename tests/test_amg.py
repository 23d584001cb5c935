"""Smoothed-aggregation AMG (-pc_type gamg) tests.

The algebraic counterpart of the geometric MG tests: hierarchy built from
the assembled sparse matrix only (no grid), V-cycle applied as a jitted
device program over ELL operators.  PETSc parity target: PCGAMG type
"agg" as the general-sparse strong preconditioner slot
(/root/reference/src/SaddlePointProblem.c:67 SetFromOptions semantics).
"""
import os

import numpy as np
import pytest
import scipy.sparse as sps

import jax.numpy as jnp

from saddle_point_petsc_tpu.ops import sparse as sp
from saddle_point_petsc_tpu.solvers import krylov
from saddle_point_petsc_tpu.solvers.amg import amg_pc
from saddle_point_petsc_tpu.solvers.ksp import make_pc
from saddle_point_petsc_tpu.utils.options import Options


def poisson2d(n):
    ix = sps.identity(n)
    t = sps.diags([-1.0, 4.0, -1.0], [-1, 0, 1], (n, n))
    return (sps.kron(ix, t) + sps.kron(t, ix)).tocsr()


def _solve(a_sp, M, rtol=1e-8, maxiter=300):
    csr = sp.scipy_to_csr(a_sp.astype(np.float64))
    rng = np.random.default_rng(7)
    b = jnp.asarray(rng.standard_normal(a_sp.shape[0]))
    res = krylov.cg(
        lambda v: sp.csr_matvec(csr, v), b, M=M, rtol=rtol, maxiter=maxiter
    )
    rrel = float(
        np.linalg.norm(a_sp @ np.asarray(res.x) - np.asarray(b))
        / np.linalg.norm(np.asarray(b))
    )
    return int(res.iterations), rrel, res


def test_gamg_poisson_converges_fast():
    a = poisson2d(48)  # 2304 rows -> 2+ AMG levels at coarse_max=100
    M = amg_pc(
        sp.scipy_to_csr(a.astype(np.float64)),
        coarse_max=100,
        dtype=jnp.float64,
    )
    assert len(M.levels) >= 2
    its, rrel, res = _solve(a, M)
    assert int(res.converged_reason) > 0
    assert rrel < 1e-7
    # AMG-class convergence: O(10) iterations where jacobi needs O(100)
    assert its <= 25
    its_j, _, _ = _solve(
        a, make_pc("jacobi", sp.scipy_to_csr(a.astype(np.float64)))
    )
    assert its_j > 2 * its


def test_gamg_iterations_grid_independent():
    """The AMG promise: iteration counts roughly flat as n grows."""
    counts = []
    for n in (24, 48, 96):
        a = poisson2d(n)
        M = amg_pc(
            sp.scipy_to_csr(a.astype(np.float64)), dtype=jnp.float64
        )
        its, rrel, _ = _solve(a, M)
        assert rrel < 1e-7
        counts.append(its)
    assert counts[-1] <= counts[0] + 6  # flat-ish, not O(n) growth


def test_gamg_vcycle_symmetric():
    """<M r1, r2> == <r1, M r2>: required for CG/MINRES validity."""
    a = poisson2d(32)
    M = amg_pc(sp.scipy_to_csr(a.astype(np.float64)), dtype=jnp.float64)
    rng = np.random.default_rng(3)
    r1 = jnp.asarray(rng.standard_normal(a.shape[0]))
    r2 = jnp.asarray(rng.standard_normal(a.shape[0]))
    s1 = float(jnp.vdot(M(r1), r2))
    s2 = float(jnp.vdot(r1, M(r2)))
    assert abs(s1 - s2) <= 1e-10 * max(abs(s1), 1.0)


def test_gamg_through_options():
    """-pc_type gamg reaches the PC factory with PCGAMG option names."""
    a = poisson2d(32)
    csr = sp.scipy_to_csr(a.astype(np.float64))
    opts = Options(
        ["-pc_type", "gamg", "-pc_gamg_threshold", "0.05",
         "-pc_gamg_coarse_eq_limit", "200"]
    )
    M = make_pc(opts.get_str("pc_type", ""), csr, opts)
    its, rrel, res = _solve(a, M)
    assert int(res.converged_reason) > 0 and rrel < 1e-7


def test_gamg_unstructured_permutation_invariant_class():
    """No grid assumption: a random symmetric permutation of the Poisson
    matrix (structure AMG can't see geometrically) still converges in
    AMG-class iteration counts."""
    a = poisson2d(40)
    rng = np.random.default_rng(11)
    p = rng.permutation(a.shape[0])
    Pm = sps.identity(a.shape[0]).tocsr()[p]
    ap = (Pm @ a @ Pm.T).tocsr()
    M = amg_pc(sp.scipy_to_csr(ap.astype(np.float64)), dtype=jnp.float64)
    its, rrel, res = _solve(ap, M)
    assert int(res.converged_reason) > 0
    assert rrel < 1e-7 and its <= 30


def test_dist_gamg_serial_iterate_parity():
    """gamg over DistAIJ on the 8-device mesh: the hierarchy is built from
    the same global matrix, so distributed CG must take (nearly) the same
    iterations as the serial gamg CG and reach the same answer."""
    from saddle_point_petsc_tpu.parallel import dist_csr
    from saddle_point_petsc_tpu.solvers.amg import dist_amg_pc

    a = poisson2d(40)  # 1600 rows over 8 shards
    mesh = dist_csr.make_mesh_1d()
    Ad = dist_csr.dist_aij_from_scipy(a.astype(np.float64), mesh)
    Md = dist_amg_pc(Ad, a_scipy=a, coarse_max=100)
    rng = np.random.default_rng(7)
    b_host = rng.standard_normal(a.shape[0])
    bd = dist_csr.pad_vector(b_host, Ad.n_pad, mesh)
    res_d = krylov.cg(Ad, bd, M=Md, rtol=1e-8, maxiter=100)
    assert int(res_d.converged_reason) > 0
    x = np.asarray(res_d.x)[: a.shape[0]]
    rrel = float(
        np.linalg.norm(a @ x - b_host) / np.linalg.norm(b_host)
    )
    assert rrel < 1e-7
    # serial twin on the same matrix
    M = amg_pc(
        sp.scipy_to_csr(a.astype(np.float64)),
        coarse_max=100,
        dtype=jnp.float64,
    )
    its_s, _, _ = _solve(a, M, maxiter=100)
    assert abs(int(res_d.iterations) - its_s) <= 3


def test_dist_gamg_through_options():
    """-pc_type gamg on a DistAIJ routes to the distributed hierarchy."""
    from saddle_point_petsc_tpu.parallel import dist_csr
    from saddle_point_petsc_tpu.solvers.amg import DistAMGPC

    a = poisson2d(32)
    mesh = dist_csr.make_mesh_1d()
    Ad = dist_csr.dist_aij_from_scipy(a.astype(np.float64), mesh)
    M = make_pc("gamg", Ad, Options(["-pc_gamg_coarse_eq_limit", "150"]))
    assert isinstance(M, DistAMGPC)
    assert len(M.levels) >= 2
    bd = dist_csr.pad_vector(
        np.random.default_rng(0).standard_normal(a.shape[0]),
        Ad.n_pad,
        mesh,
    )
    res = krylov.cg(Ad, bd, M=M, rtol=1e-8, maxiter=60)
    assert int(res.converged_reason) > 0 and int(res.iterations) <= 25


def test_dist_aij_to_scipy_roundtrip():
    """DistAIJ.to_scipy reconstructs the exact global matrix (the AMG
    setup input and a -A_mat_view-class utility)."""
    from saddle_point_petsc_tpu.parallel import dist_csr

    n = 30
    rng = np.random.default_rng(5)
    a = sps.random(
        n, n, density=0.12, random_state=rng, format="csr"
    ) + sps.identity(n)
    a = a.tocsr().astype(np.float64)
    mesh = dist_csr.make_mesh_1d()
    Ad = dist_csr.dist_aij_from_scipy(a, mesh)
    back = Ad.to_scipy()
    assert back.shape == a.shape
    assert abs(a - back).max() < 1e-12


def test_gamg_as_fieldsplit_schur_inner():
    """-fieldsplit_inner_pc_type gamg: the algebraic hierarchy as the
    Schur A-block inner solve on the full KKT system (the PETSc
    composition -pc_type fieldsplit -fieldsplit_0_pc_type gamg)."""
    from saddle_point_petsc_tpu.models import saddle
    from saddle_point_petsc_tpu.solvers.ksp import KSP

    prob = saddle.assemble_saddle(
        32, 32, dtype=jnp.float64, body_force="trig"
    )
    opts = Options(
        ["-ksp_type", "minres", "-pc_type", "fieldsplit",
         "-fieldsplit_inner_pc_type", "gamg",
         "-ksp_rtol", "1e-8", "-ksp_max_it", "400"]
    )
    ksp = KSP(opts).set_operators(prob.K).set_from_options().set_up()
    res = ksp.solve(prob.rhs)
    assert int(res.converged_reason) > 0
    # MG-class strength: diag-inner needs O(100) its here
    assert int(res.iterations) <= 30


def test_to_scipy_dia_roundtrip():
    """_to_scipy on the repo's ROW-indexed DIA must reproduce the matrix
    exactly (ADVICE r3 high: unshifted bands displaced every off-diagonal
    by its offset, silently corrupting the whole gamg hierarchy)."""
    from saddle_point_petsc_tpu.solvers.amg import _to_scipy

    a = poisson2d(13).astype(np.float64)  # offsets {-13,-1,0,1,13}
    dia, _ = sp.csr_to_dia(sp.scipy_to_csr(a))
    back = _to_scipy(dia)
    assert abs(a - back).max() < 1e-14
    # and the hierarchy built from DIA matches the CSR-built one
    M = amg_pc(dia, dtype=jnp.float64)
    its, rrel, res = _solve(a, M)
    assert int(res.converged_reason) > 0 and rrel < 1e-7


def test_gamg_small_system_no_levels():
    """Input already <= coarse_max: empty hierarchy applies the exact
    coarse solve instead of crashing (ADVICE r3 medium)."""
    a = poisson2d(10)  # 100 rows < default coarse_max=500
    M = amg_pc(sp.scipy_to_csr(a.astype(np.float64)), dtype=jnp.float64)
    assert len(M.levels) == 0
    its, rrel, res = _solve(a, M)
    assert int(res.converged_reason) > 0 and rrel < 1e-8
    assert its <= 2  # the PC is the exact inverse

    from saddle_point_petsc_tpu.parallel import dist_csr
    from saddle_point_petsc_tpu.solvers.amg import dist_amg_pc

    mesh = dist_csr.make_mesh_1d()
    Ad = dist_csr.dist_aij_from_scipy(a.astype(np.float64), mesh)
    Md = dist_amg_pc(Ad, a_scipy=a)
    bd = dist_csr.pad_vector(
        np.random.default_rng(0).standard_normal(a.shape[0]),
        Ad.n_pad,
        mesh,
    )
    res_d = krylov.cg(Ad, bd, M=Md, rtol=1e-8, maxiter=10)
    assert int(res_d.converged_reason) > 0 and int(res_d.iterations) <= 2


def test_gamg_w_cycle():
    """-pc_mg_cycles 2 = W-cycle (PCMGSetCycleType semantics): still
    symmetric, converges at least as fast as the V-cycle."""
    a = poisson2d(48)
    csr = sp.scipy_to_csr(a.astype(np.float64))
    Mv = amg_pc(csr, coarse_max=60, dtype=jnp.float64, cycles=1)
    Mw = amg_pc(csr, coarse_max=60, dtype=jnp.float64, cycles=2)
    assert len(Mw.levels) >= 2
    rng = np.random.default_rng(3)
    r1 = jnp.asarray(rng.standard_normal(a.shape[0]))
    r2 = jnp.asarray(rng.standard_normal(a.shape[0]))
    s1 = float(jnp.vdot(Mw(r1), r2))
    s2 = float(jnp.vdot(r1, Mw(r2)))
    assert abs(s1 - s2) <= 1e-10 * max(abs(s1), 1.0)
    its_v, _, _ = _solve(a, Mv)
    its_w, rrel, res = _solve(a, Mw)
    assert int(res.converged_reason) > 0 and rrel < 1e-7
    assert its_w <= its_v


def test_coarse_inv_singular_fallback():
    """A singular coarsest operator (pure-Neumann) yields the
    pseudoinverse, not inf/garbage (ADVICE r3 low)."""
    from saddle_point_petsc_tpu.solvers.amg import _coarse_inv_np

    n = 12
    t = sps.diags([-1.0, 2.0, -1.0], [-1, 0, 1], (n, n)).tolil()
    t[0, 0] = t[-1, -1] = 1.0  # Neumann ends: constants in nullspace
    t = t.tocsr()
    inv = _coarse_inv_np(t)
    assert np.all(np.isfinite(inv))
    # pinv solves consistent systems: b orthogonal to the nullspace
    b = np.zeros(n)
    b[0], b[-1] = 1.0, -1.0
    x = inv @ b
    assert np.linalg.norm(t @ x - b) < 1e-8


def test_native_aggregate_matches_numpy():
    from saddle_point_petsc_tpu.solvers.amg import (
        _aggregate_numpy,
        _strength_graph,
    )
    from saddle_point_petsc_tpu.utils import native

    if not native.available():
        pytest.skip("native toolchain unavailable")
    a = poisson2d(20)
    S = _strength_graph(a, 0.08)
    agg_c, na_c = native.aggregate(S.indptr, S.indices, S.shape[0])
    agg_py, na_py = _aggregate_numpy(S.indptr, S.indices, S.shape[0])
    assert na_c == na_py
    assert np.array_equal(agg_c, agg_py)
    # every node aggregated, ids dense in [0, na)
    assert agg_c.min() >= 0 and agg_c.max() == na_c - 1


def test_dist_gamg_stream_setup():
    """setup='stream' (O(local nnz) per step, no global host matrix)
    converges in AMG-class iterations; parity with the global setup
    within the boundary-restricted-aggregation allowance."""
    from saddle_point_petsc_tpu.parallel import dist_csr
    from saddle_point_petsc_tpu.solvers.amg import dist_amg_pc

    a = poisson2d(40)  # 1600 rows over 8 shards
    mesh = dist_csr.make_mesh_1d()
    Ad = dist_csr.dist_aij_from_scipy(a.astype(np.float64), mesh)
    Ms = dist_amg_pc(Ad, coarse_max=100, setup="stream")
    assert len(Ms.levels) >= 1
    rng_l = np.random.default_rng(7)
    b_host = rng_l.standard_normal(a.shape[0])
    bd = dist_csr.pad_vector(b_host, Ad.n_pad, mesh)
    res_s = krylov.cg(Ad, bd, M=Ms, rtol=1e-8, maxiter=100)
    assert int(res_s.converged_reason) > 0
    x = np.asarray(res_s.x)[: a.shape[0]]
    rrel = float(np.linalg.norm(a @ x - b_host) / np.linalg.norm(b_host))
    assert rrel < 1e-7
    Mg = dist_amg_pc(Ad, a_scipy=a, coarse_max=100)
    res_g = krylov.cg(Ad, bd, M=Mg, rtol=1e-8, maxiter=100)
    # boundary-restricted aggregation costs at most a few iterations
    assert int(res_s.iterations) <= int(res_g.iterations) + 6


def test_dist_gamg_stream_through_options():
    """-pc_gamg_setup stream reaches the streaming builder."""
    from saddle_point_petsc_tpu.parallel import dist_csr
    from saddle_point_petsc_tpu.solvers.amg import DistAMGPC

    a = poisson2d(32)
    mesh = dist_csr.make_mesh_1d()
    Ad = dist_csr.dist_aij_from_scipy(a.astype(np.float64), mesh)
    M = make_pc(
        "gamg", Ad,
        Options(["-pc_gamg_setup", "stream",
                 "-pc_gamg_coarse_eq_limit", "150"]),
    )
    assert isinstance(M, DistAMGPC)
    bd = dist_csr.pad_vector(
        np.random.default_rng(0).standard_normal(a.shape[0]),
        Ad.n_pad, mesh,
    )
    res = krylov.cg(Ad, bd, M=M, rtol=1e-8, maxiter=60)
    assert int(res.converged_reason) > 0 and int(res.iterations) <= 30


def test_dist_gamg_stream_1m_rows():
    """1M-row distributed gamg via the streaming setup (VERDICT r3
    missing #2 'done' criterion): no global host matrix is ever
    materialized during setup, and CG converges in AMG-class counts."""
    from saddle_point_petsc_tpu.parallel import dist_csr
    from saddle_point_petsc_tpu.solvers.amg import dist_amg_pc

    a = poisson2d(1000).astype(np.float64)  # 1,000,000 rows
    mesh = dist_csr.make_mesh_1d()
    Ad = dist_csr.dist_aij_from_scipy(a, mesh)
    M = dist_amg_pc(Ad, setup="stream")
    b = np.ones(a.shape[0])
    bd = dist_csr.pad_vector(b, Ad.n_pad, mesh)
    res = krylov.cg(Ad, bd, M=M, rtol=1e-8, maxiter=120)
    assert int(res.converged_reason) > 0
    x = np.asarray(res.x)[: a.shape[0]]
    rrel = float(np.linalg.norm(a @ x - b) / np.linalg.norm(b))
    assert rrel < 1e-7
    assert int(res.iterations) <= 60  # AMG-class at 1M rows


def test_gamg_dia_backend_option_parity():
    """-mat_dia_backend pallas routes banded levels through the 2D
    kernel with iterate parity vs the XLA backend (chip capture:
    bit-identical; interpret mode here)."""
    from saddle_point_petsc_tpu.utils.options import Options

    a = poisson2d(24).astype(np.float64)
    Mx = amg_pc(a, opts=Options(["-mat_dia_backend", "xla"]),
                coarse_max=100, dtype=jnp.float64)
    Mp = amg_pc(a, opts=Options(["-mat_dia_backend", "pallas"]),
                coarse_max=100, dtype=jnp.float64)
    assert any(
        getattr(l.A, "backend", None) == "pallas" for l in Mp.levels
    )
    its_x, rrel_x, _ = _solve(a, Mx, maxiter=60)
    its_p, rrel_p, res = _solve(a, Mp, maxiter=60)
    assert int(res.converged_reason) > 0 and rrel_p < 1e-7
    assert abs(its_p - its_x) <= 1
