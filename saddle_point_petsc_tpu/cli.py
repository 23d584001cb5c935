"""CLI entrypoint mirroring the reference `saddle_point_run` binary.

ref: /root/reference/src/main.c:7-19 — PetscInitialize(argv) ->
SolveSaddlePointProblem(3,3) -> Finalize, with all solver/grid behavior
injected through the options database (SURVEY.md §3.5), e.g.:

    python -m saddle_point_petsc_tpu.cli -da_grid_x 65 -da_grid_y 65 \
        -ksp_type minres -pc_type jacobi -ksp_rtol 1e-8 -ksp_monitor -log_view

Flags follow the reference/PETSc names:
  -da_grid_x/-da_grid_y <nodes>   grid node counts (default 4 = 3x3 elements,
                                  ref main.c:14 + Discretization.c:17 nx+1)
  -problem_type {poisson,saddle}  poisson = reference behavior (constraints
                                  disabled); saddle = full KKT (the intent)
  -ksp_type/-pc_type/-ksp_rtol/-ksp_atol/-ksp_max_it/-ksp_monitor
  -ksp_converged_reason           (see solvers/ksp.py for the full set)
  -A_mat_view -f_vec_view -solution_view     object viewers (ref
                                  SaddlePointProblem.c:20,62-63)
  -mat_stencil_backend {xla,pallas}  SpMV kernel for the stencil operator
  -mat_type {stencil,aij,dia,bdia} poisson operator storage: stencil planes
                                  (default, fastest), general-sparse CSR
                                  (MATAIJ, ref Discretization.c:19 — with
                                  -dist: DistAIJ = MATMPIAIJ over a 1D
                                  mesh), or banded DIA
  -dist                           distribute over all attached devices
                                  (SPMD assembly + halo-exchange SpMV)
  -mesh <py,px>                   device-mesh shape for -dist (default:
                                  PETSC_DECIDE near-square factorization)
  -vtk <path>                     VTK output file (default test.vtk,
                                  ref SaddlePointProblem.c:22)
  -no_vtk                         skip VTK output
  -log_view                       phase timing report (PETSc -log_view)
  -options_left                   warn about unused options
"""
from __future__ import annotations

import sys
import time


class _DistProb:
    """Distributed problem wrapper exposing the serial problem surface the
    CLI consumes (A, f, coords for VTK)."""

    def __init__(self, A, f, mask, nex, ney, dtype):
        self.A, self.f, self.bc_mask = A, f, mask
        self.nex, self.ney = nex, ney
        self._dtype = dtype

    @property
    def coords(self):
        from saddle_point_petsc_tpu.models import fem

        return fem.uniform_node_coords(self.nex, self.ney, dtype=self._dtype)


def main(argv=None):
    import jax

    argv = sys.argv[1:] if argv is None else argv
    from saddle_point_petsc_tpu.utils.options import Options

    opts = Options(argv)
    if opts.get_bool("use_cpu") or opts.get_str("device", "") == "cpu":
        jax.config.update("jax_platforms", "cpu")
    # default dtype by backend: f64 on CPU (reference/PETSc precision),
    # f32 on TPU — TPU has no f64 units and emulation is impractical; use
    # -dtype f64 to force, or the refined path for rtol 1e-8 on TPU
    # (solvers/refine.py).
    on_cpu = jax.default_backend() == "cpu"
    dtype_str = opts.get_str("dtype", "f64" if on_cpu else "f32")
    if dtype_str == "f64":
        jax.config.update("jax_enable_x64", True)

    import jax.numpy as jnp

    from saddle_point_petsc_tpu.models import poisson, saddle
    from saddle_point_petsc_tpu.solvers.ksp import KSP
    from saddle_point_petsc_tpu.utils import monitor, viewers, vtk

    dtype = jnp.float64 if dtype_str == "f64" else jnp.float32
    log = monitor.LogView()

    # grid: reference default Nx=Ny=3 elements -> 4x4 nodes (main.c:14);
    # -da_grid_x/-da_grid_y override node counts (DMSetFromOptions,
    # Discretization.c:20)
    mx = opts.get_int("da_grid_x", 4)
    my = opts.get_int("da_grid_y", 4)
    nex, ney = mx - 1, my - 1
    problem_type = opts.get_str("problem_type", "poisson")

    body_force = opts.get_str("body_force", "constant")
    backend = opts.get_str("mat_stencil_backend", "xla")
    mat_type = opts.get_str("mat_type", "stencil")
    distributed = opts.get_bool("dist")
    grid = None
    aij_n = None  # true row count for -mat_type aij (crop pads for VTK)
    with log.phase("Assembly"):
        if mat_type in ("aij", "dia", "bdia") and problem_type == "poisson":
            # MATAIJ route (ref DMSetMatType(MATAIJ), Discretization.c:19):
            # the SAME assembled system through the general-sparse layer
            from saddle_point_petsc_tpu.ops import sparse as _sp

            csr, f_flat, mask, coords_a = poisson.assemble_poisson_csr(
                nex, ney, dtype=dtype
            )
            aij_n = csr.shape[0]
            if distributed:
                # MATMPIAIJ: row-partitioned over a 1D mesh, banded diag
                # fast path auto-attached, ghost-only all_to_all scatter
                from saddle_point_petsc_tpu.parallel import dist_csr

                mesh1 = dist_csr.make_mesh_1d()
                A = dist_csr.dist_aij_from_scipy(
                    _sp.csr_to_scipy(csr), mesh1, dtype=str(dtype.__name__)
                )
                b = dist_csr.pad_vector(f_flat, A.n_pad, mesh1)
            elif mat_type == "dia":
                import dataclasses as _dc

                A, _ = _sp.csr_to_dia(csr)
                # honor -mat_dia_backend on this route too (it was only
                # plumbed through amg_pc level operators before)
                A = _dc.replace(
                    A, backend=opts.get_str("mat_dia_backend", A.backend)
                )
                b = f_flat
            elif mat_type == "bdia":
                # MATBAIJ-class route: 2x2 blocks (the dof=2 interleaved
                # DMDA layout, ref Discretization.c:17) stored by
                # block-diagonal; -mat_bdia_backend selects the XLA b^2
                # scalar chains or the 2D Pallas block kernel
                import dataclasses as _dc

                A = _sp.bsr_to_bdia(_sp.csr_to_bsr(csr, block=2))
                A = _dc.replace(
                    A,
                    backend=opts.get_str("mat_bdia_backend", A.backend),
                )
                b = f_flat
            else:
                A, b = csr, f_flat

            class _AijProb:
                coords = coords_a
                f = f_flat

            prob = _AijProb()
            prob.A = A
        elif distributed:
            # configs 4-5: SPMD assembly + halo-exchange operators over a
            # device mesh (-mesh py,px overrides PETSC_DECIDE)
            from saddle_point_petsc_tpu.models import fem
            from saddle_point_petsc_tpu.parallel import dist as pdist
            from saddle_point_petsc_tpu.parallel.mesh import make_mesh

            mesh_str = opts.get_str("mesh", "")
            shape = (
                tuple(int(t) for t in mesh_str.split(",")) if mesh_str else None
            )
            mesh = make_mesh(shape=shape, ny=my, nx=mx)
            grid = pdist.DistGrid.create(nex, ney, mesh)
            if problem_type == "saddle":
                A, b, mask = pdist.assemble_saddle_dist(
                    grid, dtype=dtype, body_force=body_force
                )
                prob = _DistProb(A.A, b[0], mask, nex, ney, dtype)
            else:
                A, f, mask = pdist.assemble_poisson_dist(
                    grid, dtype=dtype, body_force=body_force
                )
                b = f
                prob = _DistProb(A, f, mask, nex, ney, dtype)
        elif problem_type == "saddle":
            prob = saddle.assemble_saddle(
                nex, ney, dtype=dtype, body_force=body_force, backend=backend
            )
            A, b = prob.K, prob.rhs
        else:
            prob = poisson.assemble_poisson(
                nex, ney, dtype=dtype, body_force=body_force, backend=backend
            )
            A, b = prob.A, prob.f
        jax.block_until_ready(prob.f)

    viewers.view_from_options(A if problem_type != "saddle" else prob.A,
                              opts, "A_mat_view", "A")
    viewers.view_from_options(prob.f, opts, "f_vec_view", "f")

    # solver defaults mirror PETSc (gmres) but pick saddle-appropriate ones
    ksp = KSP(opts)
    if problem_type == "saddle":
        ksp.ksp_type, ksp.pc_type = "minres", "fieldsplit"
    ksp.set_operators(A).set_from_options()
    with log.phase("PCSetUp"):
        ksp.set_up()
    profile_dir = opts.get_str("profile", None)
    if profile_dir:
        # device trace around the solve (PETSc -log_view's deep-profiling
        # analog; view with TensorBoard / xprof)
        with jax.profiler.trace(profile_dir):
            with log.phase("KSPSolve"):
                res = ksp.solve(b)
                jax.block_until_ready(res.x)
    else:
        with log.phase("KSPSolve"):
            res = ksp.solve(b)
            jax.block_until_ready(res.x)

    its = int(res.iterations)
    # credit SpMV traffic to the solve phase for the nnz/s report
    op = prob.A
    st = log.phases.get("KSPSolve")
    if st is not None:
        st.nnz_processed += float(op.nnz) * max(its, 1)
        st.flops += 2.0 * float(op.nnz) * max(its, 1)
    print(
        f"{problem_type}: grid {mx}x{my} nodes, ksp={ksp.ksp_type} "
        f"pc={ksp.pc_type}, its={its}, reason={res.reason_name()}, "
        f"rnorm={float(res.rnorm):.6e}"
    )

    u = res.x[0] if problem_type == "saddle" else res.x
    viewers.view_from_options(u, opts, "solution_view", "u")

    if not opts.get_bool("no_vtk"):
        path = opts.get_str("vtk", "test.vtk")
        with log.phase("WriteVTK"):
            if aij_n is not None:  # flat MATAIJ solution -> field
                from saddle_point_petsc_tpu.ops.stencil import flat_to_field

                u = flat_to_field(u[:aij_n], my, mx)
            elif distributed:
                u = u[:, :my, :mx]  # crop mesh-divisibility padding
            vtk.write_vtk(path, prob.coords, u)

    if opts.get_bool("log_view"):
        log.report()
    if opts.get_bool("options_left"):
        for name in opts.unused():
            print(f"WARNING! unused option: -{name}", file=sys.stderr)
    return 0 if res.converged_reason > 0 else 1


if __name__ == "__main__":
    sys.exit(main())
