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


@dataclasses.dataclass(frozen=True)
class MatOperator:
    """Wrap a sparse/dense matrix container (anything with .matvec)."""

    mat: Any

    def __call__(self, x):
        return self.mat.matvec(x)

    @property
    def shape(self):
        return self.mat.shape


jax.tree_util.register_pytree_node(
    MatOperator, lambda o: ((o.mat,), None), lambda _, d: MatOperator(*d)
)


@dataclasses.dataclass(frozen=True)
class SaddleOperator:
    """KKT operator [[A, B^T], [B, 0]] acting on (u, lam) tuples.

    A: callable (field or flat) SPD operator on u;
    B: dense (m, n) constraint matrix acting on *flattened* u.
    The reference declared B as a 4 x nCols MATMPIAIJ
    (SaddlePointProblem.c:48-50); at m=4 rows a dense row-block is the
    right TPU layout — B u is a tall-skinny matvec (one psum), B^T lam a
    rank-4 broadcast.
    """

    A: Any
    B: Any  # (m, n)

    def __call__(self, v):
        u, lam = v
        ushape = u.shape
        uflat = u.reshape(-1)
        au = self.A(u)
        btl = (self.B.T @ lam).reshape(ushape)
        return (au + btl, self.B @ uflat)


jax.tree_util.register_pytree_node(
    SaddleOperator,
    lambda o: ((o.A, o.B), None),
    lambda _, d: SaddleOperator(*d),
)


@dataclasses.dataclass(frozen=True)
class ComposedOperator:
    """alpha*A + beta*B for operator algebra (e.g. shifted systems)."""

    A: Any
    B: Any
    alpha: Any = 1.0
    beta: Any = 1.0

    def __call__(self, x):
        return jax.tree_util.tree_map(
            lambda a, b: self.alpha * a + self.beta * b, self.A(x), self.B(x)
        )


jax.tree_util.register_pytree_node(
    ComposedOperator,
    lambda o: ((o.A, o.B, o.alpha, o.beta), None),
    lambda _, d: ComposedOperator(*d),
)
