r"""Saddle-point (KKT) problem: the constraint block the reference scaffolded.

The reference declares a 4 x nCols constraint matrix B and 4-vector g for
"barycentre and volume constraints" (src/main.c:1 help text) but leaves the
assembly stubbed (AssembleOperator_Constraints / AssembleRHS_Constraints,
/root/reference/src/Discretization.c:277-290; creation and call sites
commented out at src/SaddlePointProblem.c:45-60).  Per SURVEY.md §8 (B10)
and the BASELINE.json north star, we implement the evident *intent*: the
full KKT system

    [[A, B^T], [B, 0]] (u, lam) = (f, g)

with A the BC'd vector-Laplace operator and B four integral constraint
functionals.  Since the reference never defined the functionals, we pick a
documented, linearly independent set that remains meaningful under the
homogeneous Dirichlet BCs (note: int div u and int curl u vanish
identically for u in H^1_0, so they'd give zero rows):

    row 0  "barycentre-x":  \int Ux dOmega          (zeroth moment)
    row 1  "barycentre-y":  \int Uy dOmega
    row 2  "volume-x":      \int x * Ux dOmega      (first moment)
    row 3  "volume-y":      \int y * Uy dOmega

All rows are assembled consistently with Q1 quadrature (the same 2x2 Gauss
rule as the operator) and restricted to interior (non-Dirichlet) dofs.
Custom functionals can be supplied as weight callables.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp

from saddle_point_petsc_tpu.models import fem
from saddle_point_petsc_tpu.models.poisson import (
    PoissonProblem,
    assemble_poisson,
)
from saddle_point_petsc_tpu.solvers.operators import SaddleOperator


def default_constraints(dtype=jnp.float64):
    """The 4 default constraint weight functions (x, y) -> (wx, wy)."""
    return (
        lambda x, y: (jnp.ones_like(x), jnp.zeros_like(x)),  # barycentre-x
        lambda x, y: (jnp.zeros_like(x), jnp.ones_like(x)),  # barycentre-y
        lambda x, y: (x, jnp.zeros_like(x)),  # volume-x (first moment)
        lambda x, y: (jnp.zeros_like(x), y),  # volume-y
    )


def assemble_constraints(coords, constraint_fns=None, bc_mask=None):
    """Assemble the constraint rows as dof-major fields Bf (m, 2, ny, nx).

    B[r, dof(a,c)] = sum_e sum_p w_p detJ_p N_a(xi_p) w_c(x_p), accumulated
    with the same static-slice scatter as the RHS (models/poisson.py).
    Dirichlet columns are zeroed for consistency with the BC'd operator
    (the eliminated dofs carry u = 0).

    TPU-native equivalent of the intended AssembleOperator_Constraints
    (ref Discretization.c:277-283): B is 4 rows — a dense row-block, not a
    sparse matrix (ref's MATAIJ choice at SaddlePointProblem.c:48-50 is the
    wrong layout on TPU for m=4).
    """
    if constraint_fns is None:
        constraint_fns = default_constraints(coords.dtype)
    ny, nx = coords.shape[:2]
    ney, nex = ny - 1, nx - 1
    el_coords = fem.element_corner_coords(coords)  # (ney, nex, 4, 2)
    xi, w = fem.gauss_quadrature_q1(coords.dtype)
    ni = fem.shape_q1(xi)  # (gp, 4)
    gni = fem.grad_shape_q1(xi)
    _, det = fem.grad_shape_physical(gni, el_coords[..., None, :, :])
    xp = jnp.einsum("pi,...id->...pd", ni, el_coords,
                    precision=jax.lax.Precision.HIGHEST)  # (ney, nex, gp, 2)

    rows = []
    for fn in constraint_fns:
        wx, wy = fn(xp[..., 0], xp[..., 1])  # (ney, nex, gp)
        wcomp = jnp.stack([wx, wy], axis=-1)  # (ney, nex, gp, 2)
        # per-element nodal weights: (ney, nex, 4 nodes, 2 comps)
        be = jnp.einsum("...p,pa,...pc->...ac", w * det, ni, wcomp,
                        precision=jax.lax.Precision.HIGHEST)
        field = jnp.zeros((ny, nx, 2), coords.dtype)
        for a, (aj, ai) in enumerate(((0, 0), (1, 0), (1, 1), (0, 1))):
            field = field.at[aj : aj + ney, ai : ai + nex].add(be[:, :, a])
        rows.append(jnp.transpose(field, (2, 0, 1)))  # dof-major row field
    Bf = jnp.stack(rows, axis=0)  # (m, 2, ny, nx)
    if bc_mask is not None:
        Bf = jnp.where(bc_mask[None, None, :, :], 0.0, Bf)
    return Bf


@dataclasses.dataclass(frozen=True)
class SaddleProblem:
    """Assembled KKT system: K (u,lam) = (f, g)."""

    K: SaddleOperator  # [[A, B^T], [B, 0]]
    f: Any  # canonical dof-major (2, ny, nx) field
    g: Any  # (m,)
    bc_mask: Any
    coords: Any

    @property
    def A(self):
        return self.K.A

    @property
    def B(self):
        return self.K.B

    @property
    def Bf(self):
        return self.K.Bf

    @property
    def rhs(self):
        return (self.f, self.g)

    @property
    def grid_shape(self):
        return self.f.shape[1:]


jax.tree_util.register_pytree_node(
    SaddleProblem,
    lambda p: ((p.K, p.f, p.g, p.bc_mask, p.coords), None),
    lambda _, d: SaddleProblem(*d),
)


@partial(
    jax.jit,
    static_argnames=(
        "nex", "ney", "dtype", "nconstraints", "body_force", "backend",
    ),
)
def assemble_saddle(
    nex,
    ney,
    dtype=jnp.float64,
    g=None,
    nconstraints=4,
    body_force="constant",
    backend="xla",
):
    """Assemble the full KKT saddle-point system on an nex x ney grid.

    Implements the intended SolveConstraintLaplaceProblem pipeline with the
    constraint block enabled (ref SaddlePointProblem.c:34-76 + commented
    sections).  g defaults to zeros (constraints pin the moments to 0).

    Note: with the reference's constant body force f=(1,2), f lies exactly
    in range(B^T) of the default constraints (the barycentre rows are the
    lumped-mass vectors), so the KKT solution is u=0, lam=(1,2,0,0).
    Use body_force="trig" (the force commented out in the reference's
    FormRHS) for a non-trivial constrained solve — benchmarks do.
    """
    prob = assemble_poisson(
        nex, ney, dtype=dtype, body_force=body_force, backend=backend
    )
    fns = default_constraints(dtype)[:nconstraints]
    Bf = assemble_constraints(prob.coords, fns, prob.bc_mask)
    if g is None:
        g = jnp.zeros((Bf.shape[0],), dtype)
    K = SaddleOperator(prob.A, Bf)
    return SaddleProblem(K, prob.f, g, prob.bc_mask, prob.coords)


def solve_saddle_point_problem(
    nex=3,
    ney=3,
    opts=None,
    constraints=True,
    body_force="constant",
    vtk_path=None,
    dtype=jnp.float64,
):
    """High-level driver mirroring the reference entry point.

    ref: SolveSaddlePointProblem(nx, ny) (src/SaddlePointProblem.c:8-25):
    grid setup -> assemble -> options-configured KSP solve -> optional
    viewers -> optional VTK.  `constraints=False` reproduces the reference
    binary's actual behavior (constraint block disabled); True solves the
    intended full KKT system.  Returns (u_field, KrylovResult, problem).
    """
    from saddle_point_petsc_tpu.models.poisson import assemble_poisson
    from saddle_point_petsc_tpu.solvers.ksp import KSP
    from saddle_point_petsc_tpu.utils import viewers
    from saddle_point_petsc_tpu.utils.options import Options

    opts = opts if opts is not None else Options()
    if constraints:
        prob = assemble_saddle(nex, ney, dtype=dtype, body_force=body_force)
        A, b = prob.K, prob.rhs
        default_ksp, default_pc = "minres", "fieldsplit"
    else:
        prob = assemble_poisson(nex, ney, dtype=dtype, body_force=body_force)
        A, b = prob.A, prob.f
        default_ksp, default_pc = "gmres", "jacobi"
    ksp = KSP(opts)
    ksp.ksp_type, ksp.pc_type = default_ksp, default_pc
    ksp.set_operators(A).set_from_options().set_up()
    viewers.view_from_options(prob.A, opts, "A_mat_view", "A")
    viewers.view_from_options(prob.f, opts, "f_vec_view", "f")
    res = ksp.solve(b)
    u = res.x[0] if constraints else res.x
    viewers.view_from_options(u, opts, "solution_view", "u")
    if vtk_path:
        from saddle_point_petsc_tpu.utils.vtk import write_vtk

        write_vtk(vtk_path, prob.coords, u)
    return u, res, prob
