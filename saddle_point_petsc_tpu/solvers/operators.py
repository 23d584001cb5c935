"""Operator abstractions: LinearOperator wrappers and the saddle-point
BlockOperator [[A, B^T], [B, 0]].

TPU-native equivalent of PETSc's Mat interface as exercised by the
reference: KSPSetOperators (ref /root/reference/src/SaddlePointProblem.c:66)
takes "the operator" abstractly — here an operator is any callable pytree
-> pytree, and the KKT block system the reference scaffolded
(SaddlePointProblem.c:45-60, stubs at Discretization.c:277-290) is a
first-class composite operator over (u, lam) tuple pytrees.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Callable

import jax
import jax.numpy as jnp

# Assembly/constraint einsums cancel O(1) coordinates down to O(h)
# entries; on TPU the default matmul precision routes large batched
# einsums through the MXU in bf16, which zeroes/flips the Jacobian
# determinant at fine grids (NaN planes at 704^2 f32, measured).
# HIGHEST forces f32-exact contraction; setup-time cost only.
_PREC = jax.lax.Precision.HIGHEST



@dataclasses.dataclass(frozen=True)
class SaddleOperator:
    """KKT operator [[A, B^T], [B, 0]] acting on (u, lam) tuples.

    A: SPD operator on canonical (2, ny, nx) fields; Bf: constraint rows
    stored as m dof-major fields (m, 2, ny, nx).  The reference declared B
    as a 4 x nCols MATMPIAIJ (SaddlePointProblem.c:48-50); at m=4 rows a
    dense row-block in the field layout is the right TPU shape — B u is one
    contraction (psum when sharded), B^T lam a rank-4 broadcast, and no
    layout changes touch the hot path.
    """

    A: Any
    Bf: Any  # (m, 2, ny, nx)

    def __call__(self, v):
        u, lam = v
        au = self.A(u)
        btl = jnp.einsum("m,mcyx->cyx", lam, self.Bf, precision=_PREC)
        bu = jnp.einsum("mcyx,cyx->m", self.Bf, u, precision=_PREC)
        return (au + btl, bu)

    @property
    def B(self):
        """Dense (m, n) natural-ordering view (tests/interop)."""
        m = self.Bf.shape[0]
        return jnp.transpose(self.Bf, (0, 2, 3, 1)).reshape(m, -1)


jax.tree_util.register_pytree_node(
    SaddleOperator,
    lambda o: ((o.A, o.Bf), None),
    lambda _, d: SaddleOperator(*d),
)
