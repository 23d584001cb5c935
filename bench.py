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
        M = precond.schur_pc(A32, Bf_df.hi, fact_type="diag")

    b_df = (df_from_f64(f64), df_from_f64(g64))
    run = refine.solve_refined_kkt_fused(
        K32, b_df, rtol=rtol, planes_df=planes_df, Bf_df=Bf_df, M=M,
        inner_rtol=1e-4, inner_maxiter=1500, inner=inner,
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


def main():
    if os.environ.get("BENCH_CPU"):
        jax.config.update("jax_platforms", "cpu")
    # NOTE: do NOT enable the persistent compile cache here — on the
    # tunneled axon backend cache-deserialized executables break the
    # host-fetch synchronization this harness times with (measured 3.5x
    # above the HBM roofline = impossible; and 14x below in a mixed run).
    n = int(os.environ.get("BENCH_N", "1024"))
    reps = int(os.environ.get("BENCH_REPS", "100"))
    nnz_per_s, sol, dt, nnz = bench_spmv(n_nodes=n, reps=reps)
    pallas_nnz_per_s, _, dt_pal, _ = bench_spmv(
        n_nodes=n, reps=reps, backend="pallas"
    )
    # headline = best production backend for this chip
    best, best_dt = max(
        [(nnz_per_s, dt), (pallas_nnz_per_s, dt_pal)], key=lambda p: p[0]
    )
    t_solve, its, rrel = bench_time_to_rtol()
    t_ref, cycles, inner_its, rrel8 = bench_refined_kkt()
    out = {
        "metric": "spmv_nnz_per_s",
        "value": best,
        "unit": "nnz/s",
        "vs_baseline": best / sol,
        "spmv_ms": best_dt * 1e3,
        "spmv_xla_nnz_per_s": nnz_per_s,
        "spmv_pallas_nnz_per_s": pallas_nnz_per_s,
        "grid": f"{n}x{n}x2dof",
        "nnz": nnz,
        "roofline_nnz_per_s": sol,
        "kkt_solve_s": t_solve,
        "kkt_iterations": its,
        "kkt_rel_rnorm": rrel,
        "kkt_rtol1e8_s": t_ref,
        "kkt_rtol1e8_rel_rnorm": rrel8,
        "kkt_rtol1e8_cycles": cycles,
        "kkt_rtol1e8_inner_its": inner_its,
        "device": str(jax.devices()[0]),
    }
    out.update(bench_scaling_subprocess())
    print(json.dumps(out))


if __name__ == "__main__":
    main()
