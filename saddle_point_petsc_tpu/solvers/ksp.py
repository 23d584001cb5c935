"""KSP: runtime-configurable Krylov solve driver (PETSc KSP + PC contract).

Mirrors the reference's use of the options database to pick solver and
preconditioner at runtime with no recompilation of user code:
KSPCreate/KSPSetOperators/KSPSetFromOptions/KSPSolve
(/root/reference/src/SaddlePointProblem.c:65-72).

Supported options (prefix-scoped; defaults follow PETSc where sensible):
  -ksp_type {cg,minres,gmres,fgmres,bcgs,richardson,chebyshev}  [gmres]
  -ksp_rtol <r>       [1e-5]      -ksp_atol <a>   [1e-50]
  -ksp_divtol <d>     [1e5]       -ksp_max_it <n> [10000]
  -ksp_gmres_restart <m>          [30]
  -ksp_norm_type {preconditioned,unpreconditioned,natural}  [preconditioned]
  -ksp_monitor                    (per-iteration residual printing)
  -ksp_converged_reason           (print reason after solve)
  -pc_type {none,jacobi,pbjacobi,sor,bjacobi,ilu,chebyshev,fieldsplit,mg,
            gamg}  [jacobi]
  -pc_gamg_threshold <t> [0.08]   -pc_gamg_coarse_eq_limit <n> [500]
  -pc_gamg_setup {global,stream}  [global]  (stream: O(local nnz) setup)
  -pc_mg_cycles {1,2} [1]         (PCMGSetCycleType: 1 = V, 2 = W)
  -pc_bjacobi_blocks <n>  [4]     -pc_sor_omega <w> [1.0]
  -pc_ilu_sweeps <k>  [6]         (0 = exact sequential triangular solves)
  -pc_fieldsplit_type {additive,multiplicative,schur}
  -pc_fieldsplit_schur_fact_type {diag,lower,upper,full}
  -fieldsplit_inner_* (inner KSP options for the Schur A-solve)
"""
from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional

import jax.numpy as jnp

from saddle_point_petsc_tpu.ops import sparse as sp
from saddle_point_petsc_tpu.ops.stencil import StencilOperator
from saddle_point_petsc_tpu.solvers import krylov, precond
from saddle_point_petsc_tpu.solvers.operators import SaddleOperator
from saddle_point_petsc_tpu.utils.options import Options


def make_pc(pc_type: str, A, opts: Optional[Options] = None, ksp_type=None):
    """Build a preconditioner for operator A from options (PC factory).

    ksp_type (when known) picks solver-appropriate defaults: MINRES/CG
    require an SPD PC, so the Schur factorization defaults to "diag" for
    them and "full" for (F)GMRES (matching PETSc's constraint that
    -pc_fieldsplit_schur_fact_type full needs a nonsymmetric-capable KSP).
    """
    from saddle_point_petsc_tpu.parallel.dist import (
        DistSaddleOperator,
        DistStencilOperator,
        dist_block_jacobi,
    )

    opts = opts if opts is not None else Options()
    if pc_type in ("none", ""):
        return precond.IdentityPC()

    if isinstance(A, (SaddleOperator, DistSaddleOperator)):
        # block system: only fieldsplit/schur (and none) make sense
        if pc_type != "fieldsplit":
            raise ValueError(
                f"pc_type {pc_type!r} unsupported for the KKT block system;"
                " use -pc_type fieldsplit (schur)"
            )
        # -pc_fieldsplit_type on the KKT block system: only schur applies
        # (the (lam, lam) block is zero, so additive/multiplicative have
        # no invertible split) — read and validate rather than imply.
        fs_type = opts.get_str("pc_fieldsplit_type", "schur")
        if fs_type != "schur":
            raise ValueError(
                f"-pc_fieldsplit_type {fs_type!r} unsupported for the KKT"
                " block system (zero (1,1) block); use schur"
            )
        default_fact = "diag" if ksp_type in ("minres", "cg") else "full"
        fact = opts.get_str("pc_fieldsplit_schur_fact_type", default_fact)
        inner_type = opts.get_str("fieldsplit_inner_ksp_type", "none")
        inner_pc = make_pc(
            opts.get_str("fieldsplit_inner_pc_type", "jacobi"), A.A, opts
        )
        if inner_type == "none":
            inner_solve = inner_pc
        else:
            inner_solve = precond.KSPInnerPC(
                A.A,
                inner_pc,
                solver=inner_type,
                rtol=opts.get_float("fieldsplit_inner_ksp_rtol", 1e-2),
                maxiter=opts.get_int("fieldsplit_inner_ksp_max_it", 10),
            )
        return precond.schur_pc(A.A, A.Bf, inner_solve, fact_type=fact)

    if pc_type == "jacobi":
        return precond.jacobi(A)
    if pc_type == "pbjacobi":
        return precond.pbjacobi(A)
    if pc_type == "sor":
        if not isinstance(A, (StencilOperator, DistStencilOperator)):
            raise ValueError("sor PC requires a stencil operator")
        return precond.sor(
            A,
            omega=opts.get_float("pc_sor_omega", 1.0),
            sweeps=opts.get_int("pc_sor_its", 1),
        )
    if pc_type == "bjacobi":
        from saddle_point_petsc_tpu.parallel.dist_csr import (
            DistAIJ,
            dist_aij_block_jacobi,
            dist_aij_ilu0,
        )
        from saddle_point_petsc_tpu.solvers.ilu_stencil import dist_ilu0

        # PETSc's parallel bjacobi takes a per-block local solver via
        # -sub_pc_type; default ilu mirrors PETSc (SaddlePointProblem.c:67
        # SetFromOptions semantics), chebyshev is the inner-product-free
        # alternative local solve.
        sub = opts.get_str("sub_pc_type", "ilu")
        if isinstance(A, DistAIJ):
            if sub == "ilu":
                return dist_aij_ilu0(
                    A, sweeps=opts.get_int("pc_ilu_sweeps", 6)
                )
            return dist_aij_block_jacobi(
                A, iters=opts.get_int("pc_bjacobi_local_its", 8)
            )
        if isinstance(A, DistStencilOperator):
            # one block per device patch (PETSc's parallel default:
            # bjacobi with a local solve per rank, SaddlePointProblem.c:67)
            if sub == "ilu":
                return dist_ilu0(
                    A, sweeps=opts.get_int("pc_ilu_sweeps", 6)
                )
            return dist_block_jacobi(
                A, iters=opts.get_int("pc_bjacobi_local_its", 8)
            )
        nb = opts.get_int("pc_bjacobi_blocks", 4)
        if isinstance(A, StencilOperator):
            return precond.block_jacobi_stencil(A, nb)
        if isinstance(A, sp.CSR):
            return precond.block_jacobi(A, nb)
        raise ValueError("bjacobi PC requires stencil or CSR operator")
    if pc_type == "ilu":
        from saddle_point_petsc_tpu.parallel.dist_csr import (
            DistAIJ,
            dist_aij_ilu0,
        )
        from saddle_point_petsc_tpu.solvers.ilu_stencil import (
            dist_ilu0,
            stencil_ilu0,
        )

        sweeps = opts.get_int("pc_ilu_sweeps", 6)
        if isinstance(A, DistAIJ):
            # PETSc semantics: parallel "ilu" = bjacobi + per-rank ILU(0)
            return dist_aij_ilu0(A, sweeps=sweeps)
        if isinstance(A, DistStencilOperator):
            # per-patch ILU(0) in stencil form (zero-collective apply)
            return dist_ilu0(A, sweeps=sweeps)
        if isinstance(A, StencilOperator):
            # stencil-form factors: bit-identical to the CSR path at equal
            # sweeps, applied as shifted-slice contractions (no gathers)
            return stencil_ilu0(A, sweeps=sweeps)
        if isinstance(A, sp.CSR):
            return precond.ilu0(A, sweeps=sweeps)
        raise ValueError("ilu PC requires stencil or CSR operator")
    if pc_type == "chebyshev":
        lmin = opts.get_float("pc_chebyshev_lmin", 0.1)
        lmax = opts.get_float("pc_chebyshev_lmax", 1.1)
        if opts.get_bool("pc_chebyshev_esteig") and hasattr(A, "grid_shape"):
            # PETSc -pc_chebyshev_esteig analog: power-iteration bound on
            # lambda_max(D^-1 A), with the usual (0.1, 1.1)*lmax window.
            inner = precond.jacobi(A)
            tmpl = jnp.zeros((2,) + tuple(A.grid_shape), A.planes.dtype)
            est = float(
                precond.estimate_lmax(A, M=inner, template=tmpl)
            )
            lmin, lmax = 0.1 * 1.1 * est, 1.1 * est
        return precond.chebyshev_pc(
            A,
            lmin=lmin,
            lmax=lmax,
            iters=opts.get_int("pc_chebyshev_its", 3),
        )
    if pc_type == "fieldsplit":
        fs_type = opts.get_str("pc_fieldsplit_type", "additive")
        if not isinstance(A, (StencilOperator, DistStencilOperator)):
            raise ValueError("fieldsplit PC requires a stencil operator")
        return precond.fieldsplit(A, fs_type=fs_type)
    if pc_type == "mg":
        from saddle_point_petsc_tpu.solvers.multigrid import mg_pc, mg_pc_dist

        if isinstance(A, DistStencilOperator):
            return mg_pc_dist(A, opts)
        return mg_pc(A, opts)
    if pc_type == "gamg":
        # PCGAMG (smoothed aggregation): the algebraic hierarchy for
        # general sparse (MATAIJ-class) operators — no grid needed.
        from saddle_point_petsc_tpu.parallel.dist_csr import DistAIJ
        from saddle_point_petsc_tpu.solvers.amg import amg_pc, dist_amg_pc

        if isinstance(A, DistAIJ):
            return dist_amg_pc(A, opts)
        return amg_pc(A, opts)
    raise ValueError(f"unknown pc_type {pc_type!r}")


@dataclasses.dataclass
class KSP:
    """Krylov solve context configured from the options database."""

    opts: Options = dataclasses.field(default_factory=Options)
    prefix: str = ""
    ksp_type: str = "gmres"
    pc_type: str = "jacobi"
    rtol: float = 1e-5
    atol: float = 1e-50
    dtol: float = 1e5
    max_it: int = 10000
    restart: int = 30
    monitor: bool = False
    norm_type: str = "preconditioned"
    A: Any = None
    M: Any = None

    def set_operators(self, A, M=None):
        self.A = A
        self.M = M
        return self

    def set_from_options(self):
        """Read -ksp_*/-pc_* (with this KSP's prefix) from the database.
        ref contract: KSPSetFromOptions (SaddlePointProblem.c:67)."""
        o = self.opts.scoped(self.prefix) if self.prefix else self.opts
        self.ksp_type = o.get_str("ksp_type", self.ksp_type)
        self.rtol = o.get_float("ksp_rtol", self.rtol)
        self.atol = o.get_float("ksp_atol", self.atol)
        self.dtol = o.get_float("ksp_divtol", self.dtol)
        self.max_it = o.get_int("ksp_max_it", self.max_it)
        self.restart = o.get_int("ksp_gmres_restart", self.restart)
        self.monitor = o.get_bool("ksp_monitor", self.monitor)
        # PETSc -ksp_norm_type {preconditioned,unpreconditioned,natural}
        # (consumed by solvers that support a norm choice, i.e. CG)
        self.norm_type = o.get_str("ksp_norm_type", self.norm_type)
        self.pc_type = o.get_str("pc_type", self.pc_type)
        return self

    def set_up(self):
        """Build the PC (ref: KSPSetUp, SaddlePointProblem.c:68)."""
        if self.M is None and self.A is not None:
            o = self.opts.scoped(self.prefix) if self.prefix else self.opts
            self.M = make_pc(self.pc_type, self.A, o, ksp_type=self.ksp_type)
        return self

    def view(self):
        """PETSc -ksp_view-style description of the configured solve."""
        lines = [
            "KSP Object:",
            f"  type: {self.ksp_type}",
            (
                f"  maximum iterations={self.max_it}, "
                f"tolerances: relative={self.rtol:g}, "
                f"absolute={self.atol:g}, divergence={self.dtol:g}"
            ),
            f"  norm type: {self.norm_type}",
        ]
        if self.ksp_type in ("gmres", "fgmres"):
            lines.append(f"  restart={self.restart}")
        lines += [
            "PC Object:",
            f"  type: {self.pc_type}",
            f"  implementation: {type(self.M).__name__}"
            if self.M is not None
            else "  (not set up)",
        ]
        if self.A is not None:
            shape = getattr(self.A, "shape", None)
            lines.append(
                f"Mat Object: {type(self.A).__name__}"
                + (f", size {shape[0]}x{shape[1]}" if shape else "")
            )
        return "\n".join(lines)

    def mat_solve(self, B, x0=None) -> krylov.KrylovResult:
        """Solve A X = B for a batch of right-hand sides (k leading axis)
        — PETSc KSPMatSolve.  Runs the pseudo-block CG over the
        operator's SpMM path (`matmat_field`), so the operator is
        streamed ONCE per iteration for all k columns (and, distributed,
        one halo exchange ships every column's ghosts together)."""
        if self.M is None:
            self.set_up()
        if self.ksp_type != "cg":
            raise ValueError(
                "mat_solve currently implements the pseudo-block CG "
                f"(KSPMatSolve) path only; got ksp_type={self.ksp_type}"
            )
        import jax as _jax

        A = self.A
        Ab = (
            A.matmat_field
            if hasattr(A, "matmat_field")
            else _jax.vmap(A)
        )
        Mb = _jax.vmap(self.M) if self.M is not None else None
        return krylov.cg_multi(
            Ab, B, M=Mb, x0=x0, rtol=self.rtol, atol=self.atol,
            dtol=self.dtol, maxiter=self.max_it,
        )

    def solve(self, b, x0=None) -> krylov.KrylovResult:
        if self.M is None:
            self.set_up()
        ov = self.opts.scoped(self.prefix) if self.prefix else self.opts
        if ov.get_bool("ksp_view"):
            print(self.view())
        kwargs = dict(
            M=self.M,
            x0=x0,
            rtol=self.rtol,
            atol=self.atol,
            dtol=self.dtol,
            maxiter=self.max_it,
            monitor=self.monitor,
        )
        if self.ksp_type in ("gmres", "fgmres"):
            kwargs["restart"] = self.restart
        if self.ksp_type == "cg":
            kwargs["norm_type"] = self.norm_type
        if self.ksp_type == "chebyshev":
            # PETSc KSPCHEBYSHEV defaults to eigenvalue estimation with the
            # transform (0.1*lmax, 1.1*lmax); -ksp_chebyshev_eigenvalues a,b
            # overrides with explicit bounds.
            o = self.opts.scoped(self.prefix) if self.prefix else self.opts
            ev = o.get_str("ksp_chebyshev_eigenvalues", "")
            if ev:
                lmin, lmax = (float(t) for t in ev.split(","))
            else:
                est = float(
                    precond.estimate_lmax(self.A, M=self.M, template=b)
                )
                lmin, lmax = 0.1 * est, 1.1 * est
            kwargs["lmin"], kwargs["lmax"] = lmin, lmax
        fn = krylov.SOLVERS[self.ksp_type]
        res = fn(self.A, b, **kwargs)
        o = self.opts.scoped(self.prefix) if self.prefix else self.opts
        if o.get_bool("ksp_converged_reason"):
            import sys

            name = res.reason_name()
            its = int(res.iterations)
            word = "CONVERGED" if int(res.converged_reason) > 0 else "DIVERGED"
            print(
                f"Linear solve {word} due to {name} iterations {its}",
                file=sys.stdout,
            )
        return res
