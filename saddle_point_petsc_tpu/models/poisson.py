"""Vector-Poisson ("stress"/vector-Laplace) problem on a structured grid.

The TPU-native equivalent of the reference's assemble-and-BC pipeline:
  SetupDMDA                 -> Grid geometry helpers (models/fem.py)
  AssembleOperator_Laplace  -> assemble_operator (batched elements -> stencil/CSR)
  AssembleRHS_Laplace       -> assemble_rhs
  ApplyBC_Laplace           -> apply_dirichlet_bc
ref: /root/reference/src/Discretization.c:130-274,
     /root/reference/src/SaddlePointProblem.c:34-76.

The default problem matches the reference: unit coefficient, body force
f=(1,2), homogeneous Dirichlet BCs on the whole boundary, domain [0,1]^2.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Callable

import jax
import jax.numpy as jnp

from saddle_point_petsc_tpu.models import fem
from saddle_point_petsc_tpu.ops import sparse
from saddle_point_petsc_tpu.ops.stencil import (
    StencilOperator,
    assemble_stencil,
    boundary_mask,
    nodes_to_field,
    stencil_to_coo,
    stencil_zero_rows_columns,
)


@dataclasses.dataclass(frozen=True)
class PoissonProblem:
    """Assembled vector-Poisson problem in stencil form.

    A: StencilOperator (BCs applied, symmetric); f: canonical dof-major
    (2, ny, nx) RHS field; bc_mask: (ny, nx) boundary-node mask; coords:
    (ny, nx, 2) node coords (geometry stays node-major).
    """

    A: StencilOperator
    f: Any
    bc_mask: Any
    coords: Any

    @property
    def grid_shape(self):
        return self.A.grid_shape

    @property
    def n(self):
        return self.A.n


jax.tree_util.register_pytree_node(
    PoissonProblem,
    lambda p: ((p.A, p.f, p.bc_mask, p.coords), None),
    lambda _, d: PoissonProblem(*d),
)


@partial(
    jax.jit,
    static_argnames=("nex", "ney", "dtype", "body_force", "backend"),
)
def assemble_poisson(
    nex, ney, dtype=jnp.float64, body_force="constant", backend="xla"
):
    """Assemble the BC'd vector-Poisson system on an nex x ney element grid.

    Fully on-device: batched element stiffness (vmap over the whole grid),
    static-slice stencil accumulation, symmetric BC elimination, RHS with
    f zeroed on boundary rows.  Equivalent end-to-end to
    SolveConstraintLaplaceProblem's assembly phase
    (ref SaddlePointProblem.c:54-56).
    """
    coords = fem.uniform_node_coords(nex, ney, dtype=dtype)
    ke = fem.batched_element_matrices(coords, nex, ney)
    W = assemble_stencil(ke)
    bf = fem.BODY_FORCES[body_force] if isinstance(body_force, str) else body_force
    f = nodes_to_field(assemble_rhs(coords, body_force=bf, dtype=dtype))
    mask = boundary_mask(ney + 1, nex + 1)
    W = stencil_zero_rows_columns(W, mask, diag=1.0)
    f = jnp.where(mask[None, :, :], 0.0, f)
    return PoissonProblem(
        StencilOperator.from_block(W, backend), f, mask, coords
    )


def assemble_rhs(coords, body_force=None, dtype=jnp.float64):
    """Assemble the global load vector as an (ny, nx, 2) field.

    Element load vectors are scattered to nodes with 4 static-slice adds —
    the TPU-native replacement for the ghosted local-vector accumulation +
    DMLocalToGlobalBegin/End(ADD_VALUES) (ref Discretization.c:196-219).
    """
    if body_force is None:
        body_force = fem.default_body_force
    ny, nx = coords.shape[:2]
    ney, nex = ny - 1, nx - 1
    el_coords = fem.element_corner_coords(coords)
    fe = fem.element_rhs(el_coords, body_force)  # (ney, nex, 8)
    fe = fe.reshape(ney, nex, 4, 2)
    f = jnp.zeros((ny, nx, 2), coords.dtype)
    # node offsets CCW from lower-left (see fem.element_eqnums)
    for a, (aj, ai) in enumerate(((0, 0), (1, 0), (1, 1), (0, 1))):
        f = f.at[aj : aj + ney, ai : ai + nex].add(fe[:, :, a])
    return f


def assemble_poisson_csr(nex, ney, dtype=jnp.float64, compact=True):
    """Assemble the same system in CSR format (general sparse path).

    COO triplets from all elements -> device sort/dedup -> CSR -> symmetric
    BC elimination.  `compact=True` shrinks padding on the host (setup time).
    """
    coords = fem.uniform_node_coords(nex, ney, dtype=dtype)
    ke = fem.batched_element_matrices(coords, nex, ney)
    eq = fem.element_eqnums(nex, ney)  # (ney, nex, 8)
    rows = jnp.broadcast_to(eq[..., :, None], eq.shape + (8,)).reshape(-1)
    cols = jnp.broadcast_to(eq[..., None, :], eq.shape + (8,)).reshape(-1)
    vals = ke.reshape(-1)
    n = (nex + 1) * (ney + 1) * 2
    coo = sparse.COO(rows, cols, vals, (n, n))
    mask_field = boundary_mask(ney + 1, nex + 1)
    mask = jnp.repeat(mask_field.reshape(-1), 2)
    coo = sparse.coo_zero_rows_columns(coo, mask, diag=1.0)
    csr = sparse.coo_to_csr(coo)
    if compact:
        csr = sparse.csr_compact(csr)
    f = assemble_rhs(coords, dtype=dtype)
    f = jnp.where(mask_field[:, :, None], 0.0, f).reshape(-1)
    return csr, f, mask, coords
