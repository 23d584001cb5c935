"""Q1 finite-element numerics, vectorized for TPU.

Reimplements the *intent* of the reference element kernels
(`/root/reference/src/Discretization.c`) as batched, jit-friendly JAX ops:

- Gauss quadrature (2x2 rule)            ref: Discretization.c:49-63
- Q1 shape functions N_i                 ref: Discretization.c:65-76
- Reference-space gradients dN/dxi       ref: Discretization.c:78-94
- Isoparametric map dN/dx, detJ          ref: Discretization.c:96-128
- Element stiffness ("stress" operator)  ref: Discretization.c:293-332
- Element RHS (load vector)              ref: Discretization.c:334-374
- Element equation numbering             ref: Discretization.c:377-395

Reference bug B1 (GetElementCoords collapsing all 4 corner coords onto one
node, Discretization.c:34-38) is NOT replicated; we implement the
commented-out correct version (Discretization.c:40-43).  Bug B3 (RHS
evaluated at reference-space Gauss coords, Discretization.c:362-363) is fixed
by mapping Gauss points through the Q1 isoparametric map.

Node numbering within an element is CCW from the lower-left corner,
matching DMDAGetElementEqnums (Discretization.c:377-395):

    n1=(i,j+1) --- n2=(i+1,j+1)
       |               |
    n0=(i,j)   --- n3=(i+1,j)

Equation ordering is (node, dof)-interleaved: eqn[2*a + c] = dof c of node a.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

# Assembly/constraint einsums cancel O(1) coordinates down to O(h)
# entries; on TPU the default matmul precision routes large batched
# einsums through the MXU in bf16, which zeroes/flips the Jacobian
# determinant at fine grids (NaN planes at 704^2 f32, measured).
# HIGHEST forces f32-exact contraction; setup-time cost only.
_PREC = jax.lax.Precision.HIGHEST


DIM = 2
NODES_PER_ELEMENT = 4
U_DOF = 2
GAUSS_POINTS = 4

# The reference hardcodes 1/sqrt(3) to 11 digits (Discretization.c:51-54);
# we use the same literal so small-grid numerics agree to roundoff.
_GP = 0.57735026919


def gauss_quadrature_q1(dtype=jnp.float64):
    """2x2 Gauss rule on [-1,1]^2. Returns (xi (4,2), w (4,)).

    Point order matches ConstructGaussQuadratureQ12D (Discretization.c:49-63).
    """
    xi = jnp.array(
        [[-_GP, -_GP], [-_GP, _GP], [_GP, _GP], [_GP, -_GP]], dtype=dtype
    )
    w = jnp.ones((4,), dtype=dtype)
    return xi, w


def shape_q1(xi):
    """Q1 bilinear shape functions, shape (..., 4).

    ref: ConstructQ12D_Ni (Discretization.c:65-76).
    """
    x, e = xi[..., 0], xi[..., 1]
    return jnp.stack(
        [
            0.25 * (1.0 - x) * (1.0 - e),
            0.25 * (1.0 - x) * (1.0 + e),
            0.25 * (1.0 + x) * (1.0 + e),
            0.25 * (1.0 + x) * (1.0 - e),
        ],
        axis=-1,
    )


def grad_shape_q1(xi):
    """Reference-space gradients dN_i/d(xi,eta), shape (..., 2, 4).

    ref: ConstructQ12D_GNi (Discretization.c:78-94).
    """
    x, e = xi[..., 0], xi[..., 1]
    gxi = jnp.stack(
        [
            -0.25 * (1.0 - e),
            -0.25 * (1.0 + e),
            0.25 * (1.0 + e),
            0.25 * (1.0 - e),
        ],
        axis=-1,
    )
    geta = jnp.stack(
        [
            -0.25 * (1.0 - x),
            0.25 * (1.0 - x),
            0.25 * (1.0 + x),
            -0.25 * (1.0 + x),
        ],
        axis=-1,
    )
    return jnp.stack([gxi, geta], axis=-2)


def grad_shape_physical(gni, el_coords):
    """Physical gradients dN/dx and detJ from reference gradients + coords.

    gni: (..., 2, 4) reference gradients; el_coords: (..., 4, 2) corner coords.
    Returns (gnx (..., 2, 4), detJ (...,)).

    ref: ConstructQ12D_GNx (Discretization.c:96-128).
    """
    # Jac[c][d] = sum_i GNi[c][i] * coords[i][d]
    jac = jnp.einsum("...ci,...id->...cd", gni, el_coords,
                     precision=_PREC)
    det = jac[..., 0, 0] * jac[..., 1, 1] - jac[..., 0, 1] * jac[..., 1, 0]
    inv = (
        jnp.stack(
            [
                jnp.stack([jac[..., 1, 1], -jac[..., 0, 1]], axis=-1),
                jnp.stack([-jac[..., 1, 0], jac[..., 0, 0]], axis=-1),
            ],
            axis=-2,
        )
        / det[..., None, None]
    )
    gnx = jnp.einsum("...cd,...di->...ci", inv, gni, precision=_PREC)
    return gnx, det


def element_stiffness(el_coords, coeff=None):
    """8x8 element stiffness for the 2D vector-Laplace/"stress" operator.

    Ke = sum_p B_p^T diag(2,2,1)*w_p*detJ_p*coeff_p B_p with the
    strain-displacement matrix B (3x8).  Batched over leading dims of
    el_coords (..., 4, 2).  Returns (..., 8, 8).

    ref: FormStressOperatorQ12D (Discretization.c:293-332); coeff=1 at the
    call site (Discretization.c:156-157).
    """
    dtype = el_coords.dtype
    xi, w = gauss_quadrature_q1(dtype)
    if coeff is None:
        coeff = jnp.ones((GAUSS_POINTS,), dtype=dtype)
    gni = grad_shape_q1(xi)  # (4, 2, 4): per gauss point
    # broadcast coords over gauss points: (..., 1, 4, 2) vs gni (4, 2, 4)
    gnx, det = grad_shape_physical(gni, el_coords[..., None, :, :])
    # gnx: (..., 4gp, 2, 4nodes), det: (..., 4gp)
    # B matrix (..., gp, 3, 8): rows [dx interleaved x | dy at y | dy,dx]
    z = jnp.zeros_like(gnx[..., 0, :])
    dx, dy = gnx[..., 0, :], gnx[..., 1, :]

    def interleave(a, b):
        # (..., 4),(...,4) -> (..., 8) as [a0,b0,a1,b1,...]
        return jnp.stack([a, b], axis=-1).reshape(*a.shape[:-1], 8)

    B = jnp.stack(
        [interleave(dx, z), interleave(z, dy), interleave(dy, dx)], axis=-2
    )  # (..., gp, 3, 8)
    fac = w * det * coeff  # (..., gp)
    tildeD = fac[..., None] * jnp.asarray([2.0, 2.0, 1.0], dtype=dtype)
    ke = jnp.einsum("...pki,...pk,...pkj->...ij", B, tildeD, B,
                    precision=_PREC)
    return ke


def element_rhs(el_coords, body_force):
    """Element load vector Fe (..., 8) with Fe[2i+c] = sum_p w*detJ*N_i*f_c.

    `body_force(x)` maps physical coords (..., 2) -> (..., 2).  Gauss points
    are mapped to physical space through the Q1 isoparametric map (fixes
    reference bug B3, Discretization.c:362-363).

    ref: FormLaplaceRHSQ12D (Discretization.c:334-374).
    """
    dtype = el_coords.dtype
    xi, w = gauss_quadrature_q1(dtype)
    ni = shape_q1(xi)  # (gp, 4)
    gni = grad_shape_q1(xi)
    _, det = grad_shape_physical(gni, el_coords[..., None, :, :])  # (..., gp)
    # physical gauss coords: x_p = sum_i N_i * coords_i  -> (..., gp, 2)
    xp = jnp.einsum("pi,...id->...pd", ni, el_coords, precision=_PREC)
    fp = body_force(xp)  # (..., gp, 2)
    fac = w * det  # (..., gp)
    fe = jnp.einsum("...p,pi,...pc->...ic", fac, ni, fp, precision=_PREC)
    return fe.reshape(*fe.shape[:-2], 8)


def default_body_force(x):
    """Constant body force f = (1, 2).  ref: FormRHS (Discretization.c:397-402)."""
    shape = x.shape[:-1] + (2,)
    return jnp.broadcast_to(jnp.asarray([1.0, 2.0], dtype=x.dtype), shape)


def trig_body_force(x):
    """Non-constant body force f = (sin(x)*cos(y), 2) — the intent commented
    out in the reference's FormRHS (Discretization.c:399: 'sin(x[0])*cos(x[1])').
    Used for benchmarks where the constant force makes the constrained
    (saddle) problem trivial (f in range(B^T))."""
    fx = jnp.sin(jnp.pi * x[..., 0]) * jnp.cos(jnp.pi * x[..., 1])
    fy = jnp.full_like(fx, 2.0)
    return jnp.stack([fx, fy], axis=-1)


BODY_FORCES = {"constant": default_body_force, "trig": trig_body_force}


def uniform_node_coords(nex, ney, dtype=jnp.float64, extent=(1.0, 1.0)):
    """Node coordinates of a uniform (nex x ney)-element grid on [0,Lx]x[0,Ly].

    Returns (ney+1, nex+1, 2) array, coords[j, i] = (x_i, y_j).
    ref: DMDASetUniformCoordinates (Discretization.c:25) on [0,1]^2.
    """
    xs = jnp.linspace(0.0, extent[0], nex + 1, dtype=dtype)
    ys = jnp.linspace(0.0, extent[1], ney + 1, dtype=dtype)
    X, Y = jnp.meshgrid(xs, ys, indexing="xy")
    return jnp.stack([X, Y], axis=-1)


def element_corner_coords(node_coords):
    """Gather per-element corner coords (ney, nex, 4, 2) from node coords.

    Corner order CCW from lower-left per DMDAGetElementEqnums
    (Discretization.c:377-395): n0=(i,j), n1=(i,j+1), n2=(i+1,j+1), n3=(i+1,j).
    Implements the *intended* GetElementCoords (bug B1 fixed; intent at
    Discretization.c:40-43).
    """
    c00 = node_coords[:-1, :-1]  # (ej, ei)     -> n0
    c10 = node_coords[1:, :-1]  # (ej+1, ei)   -> n1
    c11 = node_coords[1:, 1:]  # (ej+1, ei+1) -> n2
    c01 = node_coords[:-1, 1:]  # (ej, ei+1)   -> n3
    return jnp.stack([c00, c10, c11, c01], axis=-2)


def element_eqnums(nex, ney, nx_nodes=None):
    """Global equation numbers per element, (ney, nex, 8) int32.

    Natural (PETSc-global) ordering: node (i, j) -> j*(nex+1) + i, with
    interleaved dof: eqn = node*2 + c.
    ref: DMDAGetElementEqnums (Discretization.c:377-395).
    """
    if nx_nodes is None:
        nx_nodes = nex + 1
    ei = jnp.arange(nex, dtype=jnp.int32)
    ej = jnp.arange(ney, dtype=jnp.int32)
    I, J = jnp.meshgrid(ei, ej, indexing="xy")  # (ney, nex)
    n0 = J * nx_nodes + I
    n1 = (J + 1) * nx_nodes + I
    n2 = (J + 1) * nx_nodes + (I + 1)
    n3 = J * nx_nodes + (I + 1)
    nodes = jnp.stack([n0, n1, n2, n3], axis=-1)  # (ney, nex, 4)
    eq = jnp.stack([nodes * 2, nodes * 2 + 1], axis=-1)  # (ney, nex, 4, 2)
    return eq.reshape(ney, nex, 8)


@functools.partial(jax.jit, static_argnames=("nex", "ney"))
def batched_element_matrices(node_coords, nex, ney, coeff=None):
    """All element stiffness matrices for a structured grid.

    Returns (ney, nex, 8, 8).  This is the TPU-native replacement for the
    per-element loop in AssembleOperator_Laplace (Discretization.c:146-166):
    the whole grid of 8x8 matrices is produced in one fused XLA computation.
    """
    del nex, ney
    el = element_corner_coords(node_coords)
    return element_stiffness(el, coeff)
