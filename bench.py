"""Benchmark harness: prints ONE JSON line for the driver.

Primary metric (BASELINE.json): SpMV throughput in nnz/s per chip on the
stencil-form saddle-point operator, compared against the HBM-bandwidth
speed-of-light for this format.  Also reports time-to-rtol on the KKT
system as secondary keys in the same JSON object.

Timing notes: on the tunneled TPU backend `block_until_ready` does NOT
synchronize; we synchronize by fetching a scalar to host, and difference
two repetition counts to cancel the constant dispatch/fetch overhead.
"""
import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np


def _sync_scalar(x):
    """Force execution by pulling one scalar to host (works through the
    axon tunnel where block_until_ready is a no-op)."""
    return float(np.asarray(jax.tree_util.tree_leaves(x)[0]).ravel()[0])


def _sync_reduce(x):
    """Synchronize on a LARGE device array without shipping it through
    the tunnel: fetch a device-side scalar reduction (the tunnel
    transfers np.asarray'd arrays at ~30 MB/s — fetching a 723 MB
    planes array would bill ~20 s of pure transfer to the timing)."""
    return float(np.asarray(jnp.sum(x)))


def _timed(fn, *args):
    t0 = time.perf_counter()
    out = fn(*args)
    _sync_scalar(out)
    return time.perf_counter() - t0


def _bw_roofline_bytes_per_s():
    """Approximate HBM bandwidth of the local accelerator (B/s)."""
    dev = jax.devices()[0]
    kind = getattr(dev, "device_kind", "").lower()
    table = {
        "tpu v5 lite": 819e9,  # v5e
        "tpu v5e": 819e9,
        "tpu v4": 1228e9,
        "tpu v5p": 2765e9,
        "tpu v6 lite": 1640e9,  # v6e
        "tpu v6e": 1640e9,
    }
    for k, v in table.items():
        if k in kind:
            return v
    return 100e9  # CPU-ish fallback


def bench_spmv(n_nodes=1024, reps=100, dtype=jnp.float32, backend="xla"):
    from saddle_point_petsc_tpu.models import poisson
    from saddle_point_petsc_tpu.ops.stencil import StencilOperator

    nex = n_nodes - 1
    prob = poisson.assemble_poisson(nex, nex, dtype=dtype)

    # Pre-scale the operator so its spectral radius is < 1: the timed loop
    # body is then a PURE matvec chain (dependent iterations, bounded
    # values) with zero extra elementwise traffic.  (Round-1 bench divided
    # y by (1+i) each iteration — a full-field read+write that polluted
    # the kernel measurement, VERDICT.md "what's weak" #1.)  One jitted
    # program: eager ops over the tunneled backend pay per-op RTTs.
    @jax.jit
    def prescale(A, x):
        def body(_, y):
            y = A.matvec_field(y)
            return y / jnp.sqrt(jnp.sum(y * y))

        y = jax.lax.fori_loop(0, 12, body, x / jnp.sqrt(jnp.sum(x * x)))
        lmax = jnp.sum(y * A.matvec_field(y))
        return A.planes / (1.05 * lmax), y

    planes_scaled, x = prescale(prob.A, prob.f)
    # fail loudly rather than "benchmark" NaN data (bf16-einsum assembly
    # corruption at fine grids was caught exactly this way; fem.py _PREC)
    if not np.isfinite(float(jnp.sum(x))):
        raise RuntimeError("bench_spmv: non-finite assembly/prescale")
    A = StencilOperator(planes_scaled, backend)

    @jax.jit
    def k_spmv(A, x, reps):
        def body(i, x):
            return A.matvec_field(x)

        out = jax.lax.fori_loop(0, reps, body, x)
        return jnp.sum(out)

    _timed(k_spmv, A, x, 1)  # compile+warm
    t1 = min(_timed(k_spmv, A, x, reps) for _ in range(2))
    t2 = min(_timed(k_spmv, A, x, 2 * reps) for _ in range(2))
    dt = max(t2 - t1, 1e-9) / reps
    ny, nx = prob.A.grid_shape
    nnz = ny * nx * 36  # stored stencil entries
    nnz_per_s = nnz / dt
    bytes_per_nnz = jnp.dtype(dtype).itemsize * (1.0 + 4.0 / 18.0)
    sol = _bw_roofline_bytes_per_s() / float(bytes_per_nnz)
    return nnz_per_s, sol, dt, nnz


def bench_time_to_rtol(n_nodes=256, dtype=jnp.float32):
    from saddle_point_petsc_tpu.models import saddle
    from saddle_point_petsc_tpu.solvers import krylov, precond

    prob = saddle.assemble_saddle(
        n_nodes - 1, n_nodes - 1, dtype=dtype, body_force="trig"
    )
    rtol = 1e-8 if dtype == jnp.float64 else 1e-5

    @jax.jit
    def solve(K, rhs):
        M = precond.schur_pc(K.A, K.Bf, fact_type="diag")
        res = krylov.minres(K, rhs, M=M, rtol=rtol, maxiter=2000)
        return res.iterations, res.rnorm, res.rnorm0

    _timed(solve, prob.K, prob.rhs)  # compile+warm
    t1 = _timed(solve, prob.K, prob.rhs)
    its, rnorm, rnorm0 = jax.device_get(solve(prob.K, prob.rhs))
    # subtract the ~constant dispatch/fetch tunnel overhead measured by a
    # trivial fetch
    base = _timed(lambda K, r: r[1], prob.K, prob.rhs)
    return max(t1 - base, 1e-9), int(its), float(rnorm / rnorm0)


def bench_refined_kkt(n_nodes=257, rtol=1e-8, inner_kind="fgmres-mg"):
    """Time-to-rtol-1e-8 on the saddle-point KKT (the north-star metric)
    using f32 TPU compute + double-float residual refinement.

    Assembly runs in f64 on the host CPU backend; the inner correction
    solves and all matvecs run in f32 on the accelerator.  inner_kind:
    "fgmres-mg" (FGMRES outer + multigrid-Schur PC, ~100x fewer inner
    iterations at 256²) or "minres" (diag-Schur MINRES, round-1 path).
    """
    import numpy as np

    from saddle_point_petsc_tpu.ops.doublefloat import df_from_f64
    from saddle_point_petsc_tpu.ops.stencil import StencilOperator
    from saddle_point_petsc_tpu.solvers import krylov, precond, refine
    from saddle_point_petsc_tpu.solvers.operators import SaddleOperator

    jax.config.update("jax_enable_x64", True)
    try:
        cpu = jax.devices("cpu")[0]
        with jax.default_device(cpu):
            from saddle_point_petsc_tpu.models import saddle as smod

            prob64 = smod.assemble_saddle(
                n_nodes - 1, n_nodes - 1, dtype=jnp.float64, body_force="trig"
            )
            planes64 = np.asarray(prob64.A.planes)
            Bf64 = np.asarray(prob64.Bf)
            f64 = np.asarray(prob64.f)
            g64 = np.asarray(prob64.g)
    finally:
        jax.config.update("jax_enable_x64", False)

    planes_df = df_from_f64(planes64)
    Bf_df = df_from_f64(Bf64)
    A32 = StencilOperator(planes_df.hi)
    K32 = SaddleOperator(A32, Bf_df.hi)

    inner = None
    inner_ops = None
    M = None
    if inner_kind == "fgmres-mg":
        from saddle_point_petsc_tpu.solvers.multigrid import mg_pc

        Mmg = precond.schur_pc(
            A32, Bf_df.hi,
            inner_solve=mg_pc(A32, smoother="chebyshev"),
            fact_type="full",
        )
        inner_ops = (K32, Mmg)

        def inner(ru, rlam, ops):
            Kt, Mt = ops
            res = krylov.fgmres(
                Kt, (ru, rlam), M=Mt, rtol=1e-3, maxiter=60, restart=30
            )
            return res.x, res.iterations

    else:
        # diag-Schur MINRES with a Chebyshev(3) A-block inner: the r3
        # shootout (256^2, chip): diag 52.7ms / cheb3[lmax/4] 45.3 /
        # cheb3[lmax/16] 40.8 — wider windows hit the low spectrum the
        # outer MINRES otherwise grinds on.  SPD (valid under MINRES).
        Mj = precond.jacobi(A32)
        tmpl = jnp.zeros((2, n_nodes, n_nodes), jnp.float32)
        lmax = 1.1 * float(
            precond.estimate_lmax(A32, Mj, template=tmpl)
        )
        cheb = precond.chebyshev_pc(
            A32, inner=Mj, lmin=lmax / 16.0, lmax=lmax, iters=3
        )
        M = precond.schur_pc(A32, Bf_df.hi, cheb, fact_type="diag")

    b_df = (df_from_f64(f64), df_from_f64(g64))
    # inner_rtol 1e-3: tuned on the cycle/iteration tradeoff (sweep at
    # 256^2: 1e-4 -> 1766 total inner its, 1e-3 -> 1321, both 4 cycles;
    # 3e-3 converges with <15% margin — too thin for a headline bench)
    run = refine.solve_refined_kkt_fused(
        K32, b_df, rtol=rtol, planes_df=planes_df, Bf_df=Bf_df, M=M,
        inner_rtol=1e-3, inner_maxiter=1500, inner=inner,
        inner_operands=inner_ops,
    )

    _sync_scalar(run()[3])  # compile + warm
    t0 = time.perf_counter()
    out = run()
    rn = _sync_scalar(out[3])
    dt = time.perf_counter() - t0
    x, cycles, inner_its, rn_, bn = jax.device_get(out)
    # subtract one tunnel RTT (measured with a trivial fetch)
    t1 = time.perf_counter()
    _sync_scalar(out[4])
    base = time.perf_counter() - t1
    return max(dt - base, 1e-9), int(cycles), int(inner_its), float(
        rn_ / bn
    )


def bench_refined_kkt_bsr(n_nodes=257, rtol=1e-8):
    """BASELINE config 3 exactly as worded, to the north-star tolerance,
    on the chip: 256x256 grid, the A block stored AND applied as BSR 2x2
    blocks, FGMRES outer with an inner-CG Schur A-solve — composed with
    double-float residual refinement so the f32 TPU run reaches rtol
    1e-8 (VERDICT r3 weak #3: the worded config previously stopped at
    the f32 target 1e-5).

    The refinement residual runs over the df stencil planes (the same
    assembled operator, exact f64 split); every hot inner matvec applies
    the 2x2 blocks through the block-DIA layout (bsr_to_bdia: BSR blocks
    stored by block-diagonal, shift-only — the gather-based bsr_matvec
    measured 0.015 Gnnz/s on v5e and made this config 34 s; BDIA keeps
    the block semantics at DIA-class speed).  The refinement target is
    the f64-assembled system, so the captured rel_rnorm is a TRUE 1e-8
    on the config as worded."""
    import numpy as np

    from saddle_point_petsc_tpu.ops import sparse as sp
    from saddle_point_petsc_tpu.ops.doublefloat import df_from_f64
    from saddle_point_petsc_tpu.ops.stencil import (
        StencilOperator,
        field_to_flat,
        flat_to_field,
    )
    from saddle_point_petsc_tpu.solvers import krylov, precond, refine
    from saddle_point_petsc_tpu.solvers.multigrid import mg_pc
    from saddle_point_petsc_tpu.solvers.operators import SaddleOperator

    jax.config.update("jax_enable_x64", True)
    try:
        cpu = jax.devices("cpu")[0]
        with jax.default_device(cpu):
            from saddle_point_petsc_tpu.models import poisson, saddle as smod

            prob64 = smod.assemble_saddle(
                n_nodes - 1, n_nodes - 1, dtype=jnp.float64,
                body_force="trig",
            )
            planes64 = np.asarray(prob64.A.planes)
            Bf64 = np.asarray(prob64.Bf)
            f64v = np.asarray(prob64.f)
            g64 = np.asarray(prob64.g)
            csr64, _, _, _ = poisson.assemble_poisson_csr(
                n_nodes - 1, n_nodes - 1, dtype=jnp.float64
            )
            a32 = sp.csr_to_scipy(csr64).astype(np.float32)
            B32 = np.asarray(prob64.K.B, np.float32)
    finally:
        jax.config.update("jax_enable_x64", False)

    planes_df = df_from_f64(planes64)
    Bf_df = df_from_f64(Bf64)
    A32 = StencilOperator(planes_df.hi)
    K32 = SaddleOperator(A32, Bf_df.hi)
    bsr = sp.csr_to_bsr(sp.scipy_to_csr(a32), block=2)
    bdia = sp.bsr_to_bdia(bsr)
    # backend note: the 2D block-DIA Pallas kernel measures 140.7 vs
    # 71.4 Gnnz/s for these XLA chains (aij_tpu_bdia_* keys), but its
    # different summation order costs this config ~40 extra inner
    # iterations (2.79 s vs 2.08 s measured end-to-end on the chip), so
    # the config-3 production inner stays on the XLA lowering; select
    # the kernel via BDIA(backend="pallas") where the matvec dominates.
    B = jnp.asarray(B32)
    d = sp.csr_extract_diagonal(sp.scipy_to_csr(a32))
    dinv = 1.0 / jnp.where(d == 0, 1.0, d)
    S_inv = precond.inv_small(-jnp.einsum("mi,i,ki->mk", B, dinv, B))
    mg = mg_pc(A32)  # hierarchy from the planes (setup only)
    ny = nx = n_nodes

    def inner(ru, rlam, ops):
        # the whole correction solve runs in FIELD coordinates
        # ((2, ny, nx) == the dof-major (2, mb) block layout, since flat
        # row = (j*nx+i)*2 + c): the BDIA matvec is b^2 scalar-banded 1D
        # chains with zero transposes, and the MG PC is field-native
        bdia_t, Bff_t, S_inv_t, mg_t = ops

        def Ab(u):
            return sp.bdia_matvec_dofmajor(
                bdia_t, u.reshape(2, -1)
            ).reshape(u.shape)

        def Bu(u):
            return jnp.einsum("mcyx,cyx->m", Bff_t, u)

        def BTl(lam):
            return jnp.einsum("m,mcyx->cyx", lam, Bff_t)

        def Kb(v):
            u, lam = v
            return (Ab(u) + BTl(lam), Bu(u))

        def innerA(r):
            # the worded inner CG on the Schur A-solve (MG-preconditioned
            # CG over the 2x2-block matvec; cf. run_configs.config3)
            return krylov.cg(Ab, r, M=mg_t, rtol=1e-2, maxiter=10).x

        def M(r):
            ru_, rlam_ = r
            yu = innerA(ru_)
            zlam = S_inv_t @ (rlam_ - Bu(yu))
            zu = yu - innerA(BTl(zlam))
            return (zu, zlam)

        res = krylov.fgmres(
            Kb, (ru, rlam), M=M, rtol=1e-3, maxiter=60, restart=30
        )
        return res.x, res.iterations

    b_df = (df_from_f64(f64v), df_from_f64(g64))
    run = refine.solve_refined_kkt_fused(
        K32, b_df, rtol=rtol, planes_df=planes_df, Bf_df=Bf_df,
        inner=inner, inner_operands=(bdia, Bf_df.hi, S_inv, mg),
    )
    _sync_scalar(run()[3])  # compile + warm
    t0 = time.perf_counter()
    out = run()
    _sync_scalar(out[3])
    dt = time.perf_counter() - t0
    x, cycles, inner_its, rn_, bn = jax.device_get(out)
    t1 = time.perf_counter()
    _sync_scalar(out[4])
    base = time.perf_counter() - t1
    return max(dt - base, 1e-9), int(cycles), int(inner_its), float(
        rn_ / bn
    )


def bench_refined_kkt_config2(rtol=1e-8):
    """BASELINE config 2 exactly as worded, on the chip, to the
    north-star tolerance: 64x64 KKT, GMRES(30) outer with the full-Schur
    fieldsplit PC (diag(A)-based Schur complement), composed with
    double-float residual refinement (VERDICT r4 next #7: the only
    worded config never captured on TPU — r2 captured it on CPU f64).

    The df operator comes from the DEVICE df assembly (assemble_saddle_df
    on a 1x1 mesh) — no host f64 anywhere in this config."""
    from saddle_point_petsc_tpu.models.assemble_df import (
        assemble_saddle_df,
    )
    from saddle_point_petsc_tpu.ops.stencil import StencilOperator
    from saddle_point_petsc_tpu.solvers import krylov, precond, refine
    from saddle_point_petsc_tpu.solvers.operators import SaddleOperator

    (planes_df, Bf_df, f_df, g_df, _mask), _grid = assemble_saddle_df(
        64, 64, body_force="trig"
    )
    A32 = StencilOperator(planes_df.hi)
    K32 = SaddleOperator(A32, Bf_df.hi)
    M = precond.schur_pc(A32, Bf_df.hi, fact_type="full")

    def inner(ru, rlam, ops):
        Kt, Mt = ops
        res = krylov.gmres(
            Kt, (ru, rlam), M=Mt, rtol=1e-3, maxiter=400, restart=30
        )
        return res.x, res.iterations

    run = refine.solve_refined_kkt_fused(
        K32, (f_df, g_df), rtol=rtol, planes_df=planes_df, Bf_df=Bf_df,
        inner=inner, inner_operands=(K32, M),
    )
    _sync_scalar(run()[3])  # compile + warm
    t0 = time.perf_counter()
    out = run()
    _sync_scalar(out[3])
    dt = time.perf_counter() - t0
    x, cycles, inner_its, rn_, bn = jax.device_get(out)
    t1 = time.perf_counter()
    _sync_scalar(out[4])
    base = time.perf_counter() - t1
    return max(dt - base, 1e-9), int(cycles), int(inner_its), float(
        rn_ / bn
    )


def bench_refined_kkt_dist(
    n_nodes=705, rtol=1e-8, inner_maxiter=6000, return_nnz=False,
    inner_kind="minres-diag", assemble="host", out=None,
):
    """Config-4-class distributed rtol-1e-8: double-float refinement
    composed with the DISTRIBUTED operator (~1M-row KKT) over the attached
    device mesh (1 chip here; the same SPMD program spans N).

    The reference reaches 1e-8 in every parallel run for free from f64
    PETSc scalars (/root/reference/src/SaddlePointProblem.c:70); this is
    the f32-TPU equivalent at scale (VERDICT r2 missing #1).

    n_nodes=2241 gives the first config-5-scale capture (10.04M-row KKT
    on one chip, VERDICT r3 missing #2).  With return_nnz=True the
    per-matvec SpMV rate on the same operator is MEASURED with the
    standard chain-differencing protocol (not modeled from iteration
    counts — VERDICT r3 weak #4) and returned as a sixth element.

    assemble="device" (the production config-5 path, round 5) builds the
    double-float operator ON DEVICE via the SPMD df assembly
    (models/assemble_df.py) instead of the ~10-minute host f64 assembly
    (VERDICT r4 missing #1); the measured times land in `out` as
    {key}_assemble_s (warm execution) / {key}_assemble_total_s
    (compile + first run)."""
    import numpy as np

    from saddle_point_petsc_tpu.ops.doublefloat import DF, df_from_f64
    from saddle_point_petsc_tpu.parallel import dist
    from saddle_point_petsc_tpu.parallel.mesh import make_mesh, shard_field
    from saddle_point_petsc_tpu.solvers import precond, refine

    mesh = make_mesh()  # all attached devices
    if assemble == "device":
        from saddle_point_petsc_tpu.models.assemble_df import (
            assemble_saddle_dist_df,
        )

        grid = dist.DistGrid.create(n_nodes - 1, n_nodes - 1, mesh)
        t0 = time.perf_counter()
        planes_dd, Bf_dd, f_dd, b_df1, _m = assemble_saddle_dist_df(
            grid, "trig"
        )
        _sync_reduce(planes_dd.hi)
        t_total = time.perf_counter() - t0
        t0 = time.perf_counter()
        planes_dd, Bf_dd, f_dd, b_df1, _m = assemble_saddle_dist_df(
            grid, "trig"
        )
        _sync_reduce(planes_dd.hi)
        t_asm = time.perf_counter() - t0
        if out is not None:
            out["assemble_s"] = t_asm
            out["assemble_total_s"] = t_total
    else:
        jax.config.update("jax_enable_x64", True)
        try:
            cpu = jax.devices("cpu")[0]
            with jax.default_device(cpu):
                from saddle_point_petsc_tpu.models import saddle as smod

                prob64 = smod.assemble_saddle(
                    n_nodes - 1, n_nodes - 1, dtype=jnp.float64,
                    body_force="trig",
                )
                planes_df = df_from_f64(np.asarray(prob64.A.planes))
                Bf_df = df_from_f64(np.asarray(prob64.Bf))
                b_df0 = df_from_f64(np.asarray(prob64.f))
                b_df1 = df_from_f64(np.asarray(prob64.g))
        finally:
            jax.config.update("jax_enable_x64", False)

        sh = lambda df: DF(
            shard_field(df.hi, mesh), shard_field(df.lo, mesh)
        )
        planes_dd, Bf_dd, f_dd = sh(planes_df), sh(Bf_df), sh(b_df0)
    Ad = dist.DistStencilOperator(
        planes_dd.hi, mesh, active_shape=(n_nodes, n_nodes)
    )
    Kd = dist.DistSaddleOperator(Ad, Bf_dd.hi)
    # inner_kind "minres-diag": diag-Schur MINRES — at ~1M rows the
    # matvec is compute-bound and cheb3's 4x matvecs/iteration beat its
    # 3x iteration reduction (measured r3: 2.06 s cheb3 vs 0.81 s diag;
    # the cheb3 win at 256^2 comes from per-iteration fixed costs,
    # which vanish at this size).  "fgmres-mg": multigrid-Schur FGMRES
    # correction — at config-5 scale (10M rows) iteration counts, not
    # fixed costs, dominate, and the O(1)-iteration MG hierarchy wins.
    inner = None
    inner_ops = None
    Md = None
    if inner_kind == "fgmres-mg":
        from saddle_point_petsc_tpu.solvers import krylov
        from saddle_point_petsc_tpu.solvers.multigrid import mg_pc_dist

        Mmg = precond.schur_pc(
            Ad, Bf_dd.hi,
            inner_solve=mg_pc_dist(Ad, smoother="chebyshev"),
            fact_type="full",
        )
        inner_ops = (Kd, Mmg)

        def inner(ru, rlam, ops):
            Kt, Mt = ops
            res = krylov.fgmres(
                Kt, (ru, rlam), M=Mt, rtol=1e-3, maxiter=60, restart=30
            )
            return res.x, res.iterations

    elif inner_kind == "minres-mg":
        # MG V-cycle as the A-block inner of the diag-fact Schur PC
        # under MINRES: SPD (MG symmetric), 3-term recurrence — none of
        # the FGMRES(30) basis memory that OOM-crashed the worker at
        # 2241² — and MG-class iteration counts instead of diag-Schur's
        # ~1400/cycle
        from saddle_point_petsc_tpu.solvers.multigrid import mg_pc_dist

        Md = precond.schur_pc(
            Ad, Bf_dd.hi,
            mg_pc_dist(Ad, smoother="chebyshev"),
            fact_type="diag",
        )
    else:
        Md = precond.schur_pc(Ad, Bf_dd.hi, fact_type="diag")
    run = refine.solve_refined_kkt_fused(
        Kd, (f_dd, b_df1), rtol=rtol, planes_df=planes_dd, Bf_df=Bf_dd,
        M=Md, inner_rtol=1e-3, inner_maxiter=inner_maxiter,
        inner=inner, inner_operands=inner_ops,
    )

    _sync_scalar(run()[3])  # compile + warm
    t0 = time.perf_counter()
    out = run()
    _sync_scalar(out[3])
    dt = time.perf_counter() - t0
    x, cycles, inner_its, rn_, bn = jax.device_get(out)
    t1 = time.perf_counter()
    _sync_scalar(out[4])
    base = time.perf_counter() - t1
    ret = (
        max(dt - base, 1e-9), int(cycles), int(inner_its),
        float(rn_ / bn), n_nodes * n_nodes * 2 + 4,
    )
    if not return_nnz:
        return ret
    # measured SpMV rate on the same distributed operator (chain
    # protocol: pre-scaled pure matvec chain, differenced rep counts)
    nnz = n_nodes * n_nodes * 36

    @jax.jit
    def prescale(planes, x):
        At = dist.DistStencilOperator(
            planes, mesh, active_shape=(n_nodes, n_nodes)
        )

        def body(_, y):
            y = At.matvec_field(y)
            return y / jnp.sqrt(jnp.sum(y * y))

        y = jax.lax.fori_loop(0, 8, body, x / jnp.sqrt(jnp.sum(x * x)))
        return planes / (1.05 * jnp.sum(y * At.matvec_field(y))), y

    ps, xs = prescale(planes_dd.hi, f_dd.hi)

    @jax.jit
    def k_chain(planes, x, reps):
        At = dist.DistStencilOperator(
            planes, mesh, active_shape=(n_nodes, n_nodes)
        )
        return jnp.sum(
            jax.lax.fori_loop(0, reps, lambda i, v: At.matvec_field(v), x)
        )

    _timed(k_chain, ps, xs, 1)
    reps = 50
    t1_ = min(_timed(k_chain, ps, xs, reps) for _ in range(2))
    t2_ = min(_timed(k_chain, ps, xs, 2 * reps) for _ in range(2))
    nnz_per_s = nnz / (max(t2_ - t1_, 1e-9) / reps)
    return ret + (nnz_per_s,)


def bench_aij_tpu(n_nodes=512, reps=50):
    """General-sparse SpMV on the real chip (VERDICT r2 missing #3): the
    same 262k-row scalar 5-point operator through ELL / DIA / CSR / BSR
    and the 1-device DistAIJ matvec.  Values pre-scaled so the timed body
    is a pure matvec chain (same protocol as bench_spmv)."""
    import numpy as np
    import scipy.sparse as sps

    from saddle_point_petsc_tpu.ops import sparse as sp
    from saddle_point_petsc_tpu.parallel import dist_csr

    n1 = n_nodes
    ix = sps.identity(n1)
    t1 = sps.diags([-1.0, 4.0, -1.0], [-1, 0, 1], (n1, n1))
    a = (sps.kron(ix, t1) + sps.kron(t1, ix)).tocsr().astype(np.float32)
    a = a * np.float32(1.0 / 16.0)  # |lmax| < 1: pure chain stays bounded
    nnz = a.nnz
    csr = sp.scipy_to_csr(a)
    x0 = jnp.asarray(
        np.random.default_rng(0).standard_normal(a.shape[0]), jnp.float32
    )

    def chain_nnz_per_s(mv, x):
        @jax.jit
        def run(x, r):
            return jnp.sum(
                jax.lax.fori_loop(0, r, lambda i, v: mv(v), x)
            )

        _timed(run, x, 1)
        # escalate reps until the differenced time clears the tunnel
        # timing noise: at 50 reps a shift-only DIA chain (~10us/matvec)
        # is invisible under the ~ms dispatch jitter, which produced a
        # physically impossible 6.5e16 nnz/s capture in the first r3 run
        r = reps
        while True:
            t1_ = min(_timed(run, x, r) for _ in range(2))
            t2_ = min(_timed(run, x, 2 * r) for _ in range(2))
            if t2_ - t1_ > 0.02 or r >= 200_000:
                break
            r *= 8
        return nnz / (max(t2_ - t1_, 1e-9) / r)

    out = {"aij_tpu_rows": a.shape[0], "aij_tpu_nnz": int(nnz)}
    ell = sp.csr_to_ell(csr)
    out["aij_tpu_ell_nnz_per_s"] = chain_nnz_per_s(
        lambda v: sp.ell_matvec(ell, v), x0
    )
    dia, _ = sp.csr_to_dia(csr)
    out["aij_tpu_dia_nnz_per_s"] = chain_nnz_per_s(
        lambda v: sp.dia_matvec(dia, v), x0
    )
    try:
        from saddle_point_petsc_tpu.ops.pallas.spmv import (
            dia_spmv_pallas_2d,
        )

        interp = jax.default_backend() != "tpu"
        out["aij_tpu_dia_pallas_nnz_per_s"] = chain_nnz_per_s(
            lambda v: dia_spmv_pallas_2d(
                dia.data, v, dia.offsets, interpret=interp
            ),
            x0,
        )
    except Exception as e:
        out["aij_tpu_dia_pallas_error"] = repr(e)[:120]
    out["aij_tpu_csr_nnz_per_s"] = chain_nnz_per_s(
        lambda v: sp.csr_matvec(csr, v), x0
    )
    bsr = sp.csr_to_bsr(csr, block=2)
    out["aij_tpu_bsr_nnz_per_s"] = chain_nnz_per_s(
        lambda v: sp.bsr_matvec(bsr, v), x0
    )
    try:  # 2x2 blocks by block-diagonal: the BSR-class TPU fast path
        # (dof-major chain — production hot loops keep vectors dof-major;
        # r4 capture 78 Gnnz/s vs 0.015 for the gather BSR path)
        bdia = sp.bsr_to_bdia(bsr)
        xdm = jnp.asarray(
            np.ascontiguousarray(np.asarray(x0).reshape(-1, 2).T)
        )
        out["aij_tpu_bdia_nnz_per_s"] = chain_nnz_per_s(
            lambda v: sp.bdia_matvec_dofmajor(bdia, v), xdm
        )
        import dataclasses as _dc

        bdia_p = _dc.replace(bdia, backend="pallas")
        out["aij_tpu_bdia_pallas_nnz_per_s"] = chain_nnz_per_s(
            lambda v: sp.bdia_matvec_dofmajor(bdia_p, v), xdm
        )
    except Exception as e:
        out["aij_tpu_bdia_error"] = repr(e)[:120]
    # raw gather ceiling (VERDICT r4 missing #2): ELL costs one gathered
    # x element per stored nnz, so the dependent-chain throughput of
    # jnp.take with a random index vector IS the roofline for any
    # gather-based irregular-sparse path on this chip.  Captured as
    # elements/s; compare aij_tpu_ell_nnz_per_s against it (the ELL rate
    # matching the ceiling proves the format, not the kernel, is the
    # bottleneck — see ops/pallas/spmv.py ell_spmv_pallas docstring and
    # benchmarks/RESULTS.md "gather ceiling").
    perm = np.random.default_rng(1).permutation(a.shape[0]).astype(
        np.int32
    )
    idxg = jnp.asarray(perm)

    @jax.jit
    def gather_chain(x, idx, r):
        def body(i, v):
            return jnp.take(v, idx)

        return jnp.sum(jax.lax.fori_loop(0, r, body, x))

    _timed(gather_chain, x0, idxg, 1)
    rg = reps
    while True:
        t1g = min(_timed(gather_chain, x0, idxg, rg) for _ in range(2))
        t2g = min(
            _timed(gather_chain, x0, idxg, 2 * rg) for _ in range(2)
        )
        if t2g - t1g > 0.02 or rg >= 200_000:
            break
        rg *= 8
    out["aij_tpu_gather_elems_per_s"] = a.shape[0] / (
        max(t2g - t1g, 1e-9) / rg
    )
    mesh = dist_csr.make_mesh_1d()
    # production path (dia="auto" attaches the banded diag-block fast
    # path); the pure-ELL variant is kept for the before/after record
    # (r3 captured 0.134 Gnnz/s for it — VERDICT r3 missing #1)
    Ad = dist_csr.dist_aij_from_scipy(a, mesh)
    xd = dist_csr.pad_vector(np.asarray(x0), Ad.n_pad, mesh)
    out["aij_tpu_distaij_nnz_per_s"] = chain_nnz_per_s(
        lambda v: Ad.matvec(v), xd
    )
    out["aij_tpu_distaij_format"] = (
        "dia+ell" if Ad.dia_data is not None else "ell"
    )
    Ae = dist_csr.dist_aij_from_scipy(a, mesh, dia="off")
    out["aij_tpu_distaij_ell_nnz_per_s"] = chain_nnz_per_s(
        lambda v: Ae.matvec(v), xd
    )
    best = max(
        (k for k in out if k.endswith("_nnz_per_s")), key=lambda k: out[k]
    )
    out["aij_tpu_best_format"] = best.replace("aij_tpu_", "").replace(
        "_nnz_per_s", ""
    )
    out["aij_tpu_nnz_per_s"] = out[best]
    return out


def bench_spmm(n_nodes=512, k=8, reps=20, aij_nodes=512):
    """SpMM (operator x k right-hand sides) on the chip — the north-star
    kernel set pairs SpMV with SpMM ("distributed SpMV/SpMM as Pallas
    kernels") but no spmm key was ever captured (VERDICT r4 missing #3).

    Reports EFFECTIVE throughput nnz*k/s (the k columns amortize the
    operator stream, so the effective rate can exceed the SpMV HBM
    roofline by up to ~k until the VPU bound takes over).  Chain
    protocol as bench_spmv: prescaled operator, pure matmat chain,
    differenced rep counts.  Production consumer: KSP.mat_solve
    (pseudo-block CG over matmat_field, solvers/ksp.py).

    n_nodes defaults to 512: the 1024^2 stencil matmat chain WEDGED the
    tunneled backend on three separate runs (the same operator/sizes
    run fine as SpMV chains and as solver iterations; the 512^2 SpMM
    chain completes) — and this section runs LAST in main() so a wedge
    can only cost spmm keys, never the configs."""
    import numpy as np
    import scipy.sparse as sps

    from saddle_point_petsc_tpu.models import poisson
    from saddle_point_petsc_tpu.ops import sparse as sp
    from saddle_point_petsc_tpu.ops.stencil import StencilOperator

    out = {"spmm_k": k}
    prob = poisson.assemble_poisson(
        n_nodes - 1, n_nodes - 1, dtype=jnp.float32
    )

    @jax.jit
    def prescale(A, x):
        def body(_, y):
            y = A.matvec_field(y)
            return y / jnp.sqrt(jnp.sum(y * y))

        y = jax.lax.fori_loop(0, 12, body, x / jnp.sqrt(jnp.sum(x * x)))
        lmax = jnp.sum(y * A.matvec_field(y))
        return A.planes / (1.05 * lmax), y

    planes_s, x1 = prescale(prob.A, prob.f)
    A = StencilOperator(planes_s)
    ny, nx = A.grid_shape
    nnz = ny * nx * 36
    # one jitted program, not k eager ops: eager stacks of device arrays
    # are on the suspect list for the tunnel wedges this section hits
    _mk = jax.jit(
        lambda x: jnp.stack([x * (1.0 + 0.1 * i) for i in range(k)])
    )
    X0 = _mk(x1)

    def chain(mm, op, X, nnz_eff, rcap=50_000):
        # operands travel as jit ARGUMENTS, never closure constants: a
        # 151 MB planes array baked into the executable wedged the
        # tunneled remote-compile path for minutes (r5 lesson — the
        # bench_spmv chains always passed the operator as an argument)
        @jax.jit
        def run(op, X, r):
            return jnp.sum(
                jax.lax.fori_loop(0, r, lambda i, V: mm(op, V), X)
            )

        _timed(run, op, X, 1)
        r = reps
        while True:
            t1 = min(_timed(run, op, X, r) for _ in range(2))
            t2 = min(_timed(run, op, X, 2 * r) for _ in range(2))
            if t2 - t1 > 0.02 or r >= rcap:
                break
            r *= 8
        return nnz_eff / (max(t2 - t1, 1e-9) / r)

    out["spmm_stencil_nnz_per_s"] = chain(
        lambda op, V: op.matmat_field(V), A, X0, k * nnz
    )
    try:
        # the pallas SpMM kernel keeps one full padded field in VMEM
        # per pipeline stage (BlockSpec (1, 2, ny+2, nx+2)): at 1024^2
        # that overflows the 16 MB VMEM (hard-checked in the kernel) —
        # measure at 512^2 where it fits
        from saddle_point_petsc_tpu.ops.pallas.spmm import (
            stencil_spmm_pallas,
        )

        interp = jax.default_backend() != "tpu"
        n_p = min(n_nodes, 512)
        prob_p = poisson.assemble_poisson(
            n_p - 1, n_p - 1, dtype=jnp.float32
        )
        planes_p, xp1 = prescale(prob_p.A, prob_p.f)
        Xp0 = _mk(xp1)
        out["spmm_stencil_pallas_nnz_per_s"] = chain(
            lambda op, V: stencil_spmm_pallas(
                op, V, bm=32, interpret=interp
            ),
            planes_p, Xp0, k * n_p * n_p * 36,
        )
        out["spmm_stencil_pallas_n"] = n_p
    except Exception as e:
        out["spmm_stencil_pallas_error"] = repr(e)[:120]
    # distributed SpMM: one halo exchange ships all k columns' ghosts
    try:
        from saddle_point_petsc_tpu.parallel import dist
        from saddle_point_petsc_tpu.parallel.mesh import (
            make_mesh,
            shard_field,
        )

        mesh = make_mesh()
        Ad = dist.DistStencilOperator(
            shard_field(planes_s, mesh), mesh
        )
        Xd = jax.device_put(X0)
        out["spmm_dist_nnz_per_s"] = chain(
            lambda op, V: op.matmat_field(V), Ad, Xd, k * nnz
        )
    except Exception as e:
        out["spmm_dist_error"] = repr(e)[:120]
    # general banded (DIA / BDIA) on the 5-point aij operator
    try:
        n1 = aij_nodes
        ix = sps.identity(n1)
        t1m = sps.diags([-1.0, 4.0, -1.0], [-1, 0, 1], (n1, n1))
        a = (
            (sps.kron(ix, t1m) + sps.kron(t1m, ix)).tocsr()
            * np.float32(1.0 / 16.0)
        ).astype(np.float32)
        nnz_a = a.nnz
        csr = sp.scipy_to_csr(a)
        dia, _ = sp.csr_to_dia(csr)
        Xa = jnp.asarray(
            np.random.default_rng(0).standard_normal(
                (a.shape[0], k)
            ),
            jnp.float32,
        )
        out["spmm_dia_nnz_per_s"] = chain(
            lambda op, V: sp.dia_matmat(op, V), dia, Xa,
            k * nnz_a, rcap=200_000,
        )
        bdia = sp.bsr_to_bdia(sp.csr_to_bsr(csr, block=2))
        out["spmm_bdia_nnz_per_s"] = chain(
            lambda op, V: sp.bdia_matmat(op, V), bdia, Xa,
            k * nnz_a, rcap=200_000,
        )
    except Exception as e:
        out["spmm_dia_error"] = repr(e)[:120]
    best = max(
        (kk for kk in out if kk.endswith("_nnz_per_s")),
        key=lambda kk: out[kk],
        default=None,
    )
    if best:
        out["spmm_nnz_per_s"] = out[best]
        out["spmm_best"] = best.replace("spmm_", "").replace(
            "_nnz_per_s", ""
        )
    return out


def bench_gamg(n1=1024, rtol=1e-6):
    """Distributed gamg through the PRODUCTION streaming setup at the
    1M-row class, with PCSetUp cost as a measured key (VERDICT r4 weak
    #5: the chip verification lived only in RESULTS prose; PETSc parity
    includes -log_view stage visibility of PCSetUp).

    gamg_setup_s is wall-clock for `dist_amg_pc(setup="stream")` — the
    host+device streaming aggregation/Galerkin pipeline, O(local nnz)
    per level; gamg_solve_s is the warm jitted CG+gamg solve."""
    import numpy as np
    import scipy.sparse as sps

    from saddle_point_petsc_tpu.parallel import dist_csr
    from saddle_point_petsc_tpu.solvers import krylov
    from saddle_point_petsc_tpu.solvers.amg import dist_amg_pc

    ix = sps.identity(n1)
    t1m = sps.diags([-1.0, 4.0, -1.0], [-1, 0, 1], (n1, n1))
    a = (sps.kron(ix, t1m) + sps.kron(t1m, ix)).tocsr().astype(np.float32)
    mesh1 = dist_csr.make_mesh_1d()
    Ad = dist_csr.dist_aij_from_scipy(a, mesh1)
    b = dist_csr.pad_vector(
        np.ones(a.shape[0], np.float32), Ad.n_pad, mesh1
    )
    t0 = time.perf_counter()
    Mg = dist_amg_pc(Ad, setup="stream")
    _sync_scalar(Mg.coarse_inv)
    t_setup = time.perf_counter() - t0

    solve = jax.jit(
        lambda A, bb, M: krylov.cg(A, bb, M=M, rtol=rtol, maxiter=100)
    )
    res = solve(Ad, b, Mg)
    _sync_scalar(res.rnorm)  # compile + warm
    t0 = time.perf_counter()
    res = solve(Ad, b, Mg)
    _sync_scalar(res.rnorm)
    t_solve = time.perf_counter() - t0
    return {
        "gamg_rows": int(a.shape[0]),
        "gamg_setup_s": t_setup,
        "gamg_solve_s": t_solve,
        "gamg_its": int(res.iterations),
        "gamg_reason": int(res.converged_reason),
    }


def bench_scaling_subprocess(n_nodes=1024, reps=10, timeout=1800):
    """Run the fake-device CPU scaling harness in a subprocess (the main
    process owns the TPU backend) and return its JSON keys."""
    import pathlib
    import subprocess

    script = pathlib.Path(__file__).parent / "benchmarks" / "scaling.py"
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (
        env.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
    )
    try:
        out = subprocess.run(
            ["python", str(script), str(n_nodes), str(reps)],
            capture_output=True,
            text=True,
            timeout=timeout,
            env=env,
        )
        return json.loads(out.stdout.strip().splitlines()[-1])
    except Exception as e:  # never fail the headline bench on the ratio
        return {"scaling_error": repr(e)[:200]}


_PARTIAL = {}  # filled as sections complete; dumped if the deadline fires

# The driver records only the LAST 2000 bytes of stdout and json-parses
# them; r3's bench line grew past that window and the headline keys were
# lost (BENCH_r03.json parsed:null — VERDICT r3 weak #1).  The printed
# line is therefore a compacted selection (floats rounded to 4 significant
# digits, diagnostics first, headline keys LAST so any truncation eats
# detail, not the north star); the COMPLETE un-rounded dict is written to
# benchmarks/BENCH_FULL.json alongside.
_KEY_ORDER = (
    # ordered DROP-FIRST -> DROP-LAST: when the compact line exceeds the
    # driver's 2000-byte stdout window, _emit pops from the FRONT — so
    # per-format diagnostics sit first and the per-config / core-kernel
    # keys survive any truncation
    "device", "grid", "nnz",
    "aij_tpu_rows", "aij_tpu_csr_nnz_per_s", "aij_tpu_bsr_nnz_per_s",
    "aij_tpu_ell_nnz_per_s", "aij_tpu_gather_elems_per_s",
    "aij_tpu_distaij_ell_nnz_per_s", "aij_tpu_distaij_format",
    "aij_tpu_bdia_nnz_per_s", "aij_tpu_bdia_pallas_nnz_per_s",
    "spmm_k", "spmm_stencil_pallas_nnz_per_s", "spmm_dia_nnz_per_s",
    "spmm_bdia_nnz_per_s",
    "kkt_solve_s", "kkt_iterations", "kkt_rel_rnorm",
    "kkt_rtol1e8_minres_s", "kkt_rtol1e8_fgmresmg_s",
    "kkt_rtol1e8_cycles", "kkt_rtol1e8_inner_its",
    "kkt_rtol1e8_inner_kind",
    "scaling_devices", "scaling_eff_median", "scaling_eff_min",
    "scaling_eff_max", "scaling_halo_exchange_ms",
    "bench_deadline_hit_s",
    "gamg_rows", "gamg_its", "gamg_setup_s", "gamg_solve_s",
    "config2_rtol1e8_s", "config2_rtol1e8_rel_rnorm",
    "config3_seconds", "config3_iterations", "config3_rel_rnorm",
    "config3_rtol1e8_s", "config3_rtol1e8_rel_rnorm",
    "config4_seconds", "config4_iterations", "config4_rel_rnorm",
    "config4_rows",
    "kkt_rtol1e8_dist_rows", "kkt_rtol1e8_dist_cycles",
    "kkt_rtol1e8_dist_rel_rnorm", "kkt_rtol1e8_dist_s",
    "config5_rows", "config5_cycles", "config5_rel_rnorm",
    "config5_nnz_per_s", "config5_assemble_s", "config5_s",
    "roofline_nnz_per_s", "spmv_xla_nnz_per_s",
    "spmv_pallas_nnz_per_s", "spmv_ms",
    "aij_tpu_dia_nnz_per_s", "aij_tpu_dia_pallas_nnz_per_s",
    "aij_tpu_distaij_nnz_per_s", "aij_tpu_best_format",
    "aij_tpu_nnz_per_s",
    "spmm_stencil_nnz_per_s", "spmm_dist_nnz_per_s", "spmm_nnz_per_s",
    # headline (the driver's north-star keys) — keep LAST
    "metric", "unit", "value", "vs_baseline", "kkt_rtol1e8_s",
)
_HEADLINE = {"metric", "unit", "value", "vs_baseline", "kkt_rtol1e8_s"}


def _sig4(x):
    if isinstance(x, float):
        if not np.isfinite(x):
            return None  # strict-JSON safe (NaN = invalid reading)
        if x != 0.0:
            import math

            return round(x, -int(math.floor(math.log10(abs(x)))) + 3)
    return x


def _emit(out, limit=1900):
    """Write the full dict to benchmarks/BENCH_FULL.json and print the one
    compact JSON line (< `limit` bytes) for the driver."""
    import pathlib

    try:
        path = pathlib.Path(__file__).parent / "benchmarks" / "BENCH_FULL.json"
        path.write_text(json.dumps(out, indent=1, default=str) + "\n")
    except Exception:
        pass
    errs = sorted(
        k[: -len("_error")] for k in out if k.endswith("_error")
    )
    compact = {k: _sig4(out[k]) for k in _KEY_ORDER if k in out}
    if errs:
        compact = {"errors": ",".join(errs), **compact}
    line = json.dumps(compact)
    droppable = [
        k for k in compact if k not in _HEADLINE and k != "errors"
    ]
    while len(line) > limit and droppable:
        compact.pop(droppable.pop(0))
        line = json.dumps(compact)
    print(line, flush=True)


def _install_deadline(seconds):
    """Tunneled-TPU watchdog: if any device fetch wedges (the axon tunnel
    can hang indefinitely), print the sections measured so far as the one
    JSON line and exit instead of producing nothing.

    Implemented as a daemon THREAD, not SIGALRM: a wedged tunnel blocks
    the main thread inside a C recv loop that retries on EINTR, so a
    Python signal handler never gets to run (observed r5: a full bench
    run sailed straight through its 5200 s alarm).  The timer thread
    emits the partial line and hard-exits regardless of what the main
    thread is stuck in."""
    import threading

    def fire():
        _PARTIAL.setdefault("metric", "spmv_nnz_per_s")
        _PARTIAL.setdefault("value", 0.0)
        _PARTIAL.setdefault("unit", "nnz/s")
        _PARTIAL.setdefault("vs_baseline", 0.0)
        _PARTIAL["bench_deadline_hit_s"] = seconds
        _emit(_PARTIAL)
        os._exit(0)

    t = threading.Timer(seconds, fire)
    t.daemon = True
    t.start()


def _progress(name):
    """Section progress to STDERR (stdout stays one JSON line): lets a
    wedged run show WHERE it stopped."""
    import sys

    print(f"[bench {time.strftime('%H:%M:%S')}] {name}",
          file=sys.stderr, flush=True)


def main():
    # watchdog headroom: the r3 full run measured ~2500 s; round 4 adds
    # config3-to-1e-8 (~4 min) and the 10M-row config 5 (~28 min wall,
    # dominated by f64 host assembly on 2 cores).  5200 covers it while
    # still converting a wedged tunnel fetch into a partial JSON; the
    # long config-5 section runs LAST so a deadline fire costs only its
    # keys.
    _install_deadline(int(os.environ.get("BENCH_DEADLINE_S", "5200")))
    if os.environ.get("BENCH_CPU"):
        jax.config.update("jax_platforms", "cpu")
    # NOTE: do NOT enable the persistent compile cache here — on the
    # tunneled axon backend cache-deserialized executables break the
    # host-fetch synchronization this harness times with (measured 3.5x
    # above the HBM roofline = impossible; and 14x below in a mixed run).
    n = int(os.environ.get("BENCH_N", "1024"))
    reps = int(os.environ.get("BENCH_REPS", "100"))
    out = _PARTIAL  # sections land here as they finish (deadline-safe)
    out["device"] = str(jax.devices()[0])
    _progress("spmv")
    nnz_per_s, sol, dt, nnz = bench_spmv(n_nodes=n, reps=reps)
    pallas_nnz_per_s, _, dt_pal, _ = bench_spmv(
        n_nodes=n, reps=reps, backend="pallas"
    )
    # headline = best production backend for this chip
    best, best_dt = max(
        [(nnz_per_s, dt), (pallas_nnz_per_s, dt_pal)], key=lambda p: p[0]
    )
    out.update(
        metric="spmv_nnz_per_s",
        value=best,
        unit="nnz/s",
        vs_baseline=best / sol,
        spmv_ms=best_dt * 1e3,
        spmv_xla_nnz_per_s=nnz_per_s,
        spmv_pallas_nnz_per_s=pallas_nnz_per_s,
        grid=f"{n}x{n}x2dof",
        nnz=nnz,
        roofline_nnz_per_s=sol,
    )
    _progress("kkt_solve")
    t_solve, its, rrel = bench_time_to_rtol()
    out.update(
        kkt_solve_s=t_solve, kkt_iterations=its, kkt_rel_rnorm=rrel
    )
    # time-to-rtol-1e-8 (north-star): BOTH refined inner kinds measured,
    # the better one is the headline (VERDICT r2 weak #1: captured ==
    # claimed, best-of like the SpMV backends)
    _progress("kkt_rtol1e8")
    kinds = {}
    kn = int(os.environ.get("BENCH_KKT_N", "257"))  # 1025 favors the MG kind
    for kind in ("minres", "fgmres-mg"):
        try:
            t_ref, cycles, inner_its, rrel8 = bench_refined_kkt(
                n_nodes=kn, inner_kind=kind
            )
            kinds[kind] = (t_ref, cycles, inner_its, rrel8)
        except Exception as e:
            out[f"kkt_rtol1e8_{kind}_error"] = repr(e)[:160]
    if kinds:
        for kind, (t_ref, cycles, inner_its, rrel8) in kinds.items():
            key = kind.replace("-", "")
            out[f"kkt_rtol1e8_{key}_s"] = t_ref
        kind = min(kinds, key=lambda k: kinds[k][0])
        t_ref, cycles, inner_its, rrel8 = kinds[kind]
        out.update(
            kkt_rtol1e8_s=t_ref,
            kkt_rtol1e8_rel_rnorm=rrel8,
            kkt_rtol1e8_cycles=cycles,
            kkt_rtol1e8_inner_its=inner_its,
            kkt_rtol1e8_inner_kind=kind,
        )
    # distributed rtol-1e-8 at config-4 scale (~1M rows)
    _progress("kkt_dist")
    try:
        t_d, cyc_d, its_d, rrel_d, rows_d = bench_refined_kkt_dist()
        out.update(
            kkt_rtol1e8_dist_s=t_d,
            kkt_rtol1e8_dist_rel_rnorm=rrel_d,
            kkt_rtol1e8_dist_cycles=cyc_d,
            kkt_rtol1e8_dist_inner_its=its_d,
            kkt_rtol1e8_dist_rows=rows_d,
        )
    except Exception as e:
        out["kkt_rtol1e8_dist_error"] = repr(e)[:160]
    # general-sparse formats on the real chip
    _progress("aij")
    try:
        out.update(bench_aij_tpu())
    except Exception as e:
        out["aij_tpu_error"] = repr(e)[:160]
    # gamg streaming setup + solve at the 1M-row class (VERDICT r4 weak #5)
    _progress("gamg")
    try:
        out.update(bench_gamg())
    except Exception as e:
        out["gamg_error"] = repr(e)[:160]
    # BASELINE config 4 (distributed KKT, full PC stack) — recorded into
    # the driver JSON (VERDICT r2 weak #4)
    _progress("config4")
    try:
        import pathlib
        import sys as _sys

        _sys.path.insert(
            0, str(pathlib.Path(__file__).parent / "benchmarks")
        )
        import contextlib
        import io

        import run_configs

        with contextlib.redirect_stdout(io.StringIO()):
            c4 = run_configs.config4()  # keep bench stdout = ONE JSON line
        out.update({f"config4_{k}": v for k, v in c4.items()})
    except Exception as e:
        out["config4_error"] = repr(e)[:160]
    # BASELINE config 3 as worded (FGMRES + inner-CG Schur) on the chip
    _progress("config3")
    try:
        with contextlib.redirect_stdout(io.StringIO()):
            c3 = run_configs.config3()
        out.update({f"config3_{k}": v for k, v in c3.items()})
    except Exception as e:
        out["config3_error"] = repr(e)[:160]
    # config 2 as worded + df refinement, on the chip (VERDICT r4 next #7)
    _progress("config2")
    try:
        t2c, cyc2, its2, rrel2 = bench_refined_kkt_config2()
        out.update(
            config2_rtol1e8_s=t2c,
            config2_rtol1e8_rel_rnorm=rrel2,
            config2_cycles=cyc2,
            config2_inner_its=its2,
        )
    except Exception as e:
        out["config2_error"] = repr(e)[:160]
    # config 3 as worded + df refinement: BSR KKT to a TRUE rtol 1e-8
    _progress("config3bsr")
    try:
        t3, cyc3, its3, rrel3 = bench_refined_kkt_bsr()
        out.update(
            config3_rtol1e8_s=t3,
            config3_rtol1e8_rel_rnorm=rrel3,
            config3_rtol1e8_cycles=cyc3,
            config3_rtol1e8_inner_its=its3,
        )
    except Exception as e:
        out["config3_rtol1e8_error"] = repr(e)[:160]
    _progress("scaling")
    out.update(bench_scaling_subprocess())
    # BASELINE config 5 scale LAST (the longest section: ~10 min f64
    # host assembly + compile + 40 s solve on the chip) so a deadline
    # fire can only cost these keys, never the headline
    try:
        # minres-mg inner: the r4 shootout on the chip put the
        # crossover between the diag-Schur and MG-Schur inners between
        # 1M and 10M rows (994k: diag 0.80 s vs mg 1.31; 10.04M: mg
        # 19.4 s vs diag 38.6 — V-cycle fixed costs amortize, iteration
        # counts dominate: 35 total inner its vs 11,204)
        _progress("config5")
        # assemble="device": the round-5 production path — SPMD df
        # assembly on the chip (seconds) instead of ~10 min of host f64
        c5extra = {}
        t5, cyc5, its5, rrel5, rows5, nnz5 = bench_refined_kkt_dist(
            n_nodes=int(os.environ.get("BENCH_C5_N", "2241")),
            inner_maxiter=20000, return_nnz=True,
            inner_kind="minres-mg",
            assemble=os.environ.get("BENCH_C5_ASSEMBLE", "device"),
            out=c5extra,
        )
        out.update(
            config5_s=t5,
            config5_rel_rnorm=rrel5,
            config5_cycles=cyc5,
            config5_inner_its=its5,
            config5_rows=rows5,
            config5_nnz_per_s=nnz5,
            **{f"config5_{k}": v for k, v in c5extra.items()},
        )
    except Exception as e:
        out["config5_error"] = repr(e)[:160]
    # SpMM LAST (VERDICT r4 missing #3) — see bench_spmm docstring
    _progress("spmm")
    for attempt in range(2):  # remote_compile flakes transiently (r5)
        try:
            out.update(bench_spmm())
            out.pop("spmm_error", None)
            break
        except Exception as e:
            out["spmm_error"] = repr(e)[:160]
    _emit(out)


if __name__ == "__main__":
    main()
