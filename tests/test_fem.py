"""Unit tests for the Q1 FEM numerics against independent oracles.

Strategy per SURVEY.md §4 ladder step 1: shape functions / quadrature /
element matrices vs analytic values; assembled operator vs an independently
written numpy/scipy assembly.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from saddle_point_petsc_tpu.models import fem


def test_quadrature_integrates_bilinear_exactly():
    xi, w = fem.gauss_quadrature_q1()
    # 2x2 Gauss integrates polynomials up to degree 3 per axis exactly
    for px, py in [(0, 0), (1, 0), (2, 1), (3, 3)]:
        val = jnp.sum(w * xi[:, 0] ** px * xi[:, 1] ** py)
        exact = _mono_integral(px) * _mono_integral(py)
        assert abs(float(val) - exact) < 1e-9


def _mono_integral(p):
    # integral of t^p over [-1, 1]
    return 0.0 if p % 2 == 1 else 2.0 / (p + 1)


def test_shape_functions_partition_of_unity_and_nodal():
    xi, _ = fem.gauss_quadrature_q1()
    ni = fem.shape_q1(xi)
    np.testing.assert_allclose(np.sum(np.asarray(ni), axis=-1), 1.0)
    # nodal interpolation: N_a(node_b) = delta_ab; nodes in CCW order
    nodes = jnp.array(
        [[-1.0, -1.0], [-1.0, 1.0], [1.0, 1.0], [1.0, -1.0]]
    )
    vals = fem.shape_q1(nodes)
    np.testing.assert_allclose(np.asarray(vals), np.eye(4), atol=1e-14)


def test_grad_shape_consistency_with_finite_differences():
    pts = jnp.array([[0.3, -0.7], [0.0, 0.0], [-0.9, 0.5]])
    g = np.asarray(fem.grad_shape_q1(pts))
    h = 1e-6
    for d in range(2):
        e = np.zeros(2)
        e[d] = h
        fd = (
            np.asarray(fem.shape_q1(pts + e)) - np.asarray(fem.shape_q1(pts - e))
        ) / (2 * h)
        np.testing.assert_allclose(g[:, d, :], fd, atol=1e-8)


def _element_stiffness_oracle(coords):
    """Independent numpy implementation of the stress element matrix."""
    gp = 0.57735026919
    pts = [(-gp, -gp), (-gp, gp), (gp, gp), (gp, -gp)]
    ke = np.zeros((8, 8))
    for (xi, eta) in pts:
        gni = np.array(
            [
                [-(1 - eta), -(1 + eta), (1 + eta), (1 - eta)],
                [-(1 - xi), (1 - xi), (1 + xi), -(1 + xi)],
            ]
        ) / 4.0
        jac = gni @ coords  # (2,2)
        det = np.linalg.det(jac)
        gnx = np.linalg.solve(jac, gni)
        B = np.zeros((3, 8))
        for i in range(4):
            B[0, 2 * i] = gnx[0, i]
            B[1, 2 * i + 1] = gnx[1, i]
            B[2, 2 * i] = gnx[1, i]
            B[2, 2 * i + 1] = gnx[0, i]
        D = np.diag([2.0, 2.0, 1.0]) * det
        ke += B.T @ D @ B
    return ke


@pytest.mark.parametrize(
    "coords",
    [
        np.array([[0, 0], [0, 1], [1, 1], [1, 0]], float),
        np.array([[0, 0], [0.1, 0.9], [1.2, 1.1], [0.9, -0.05]], float),
    ],
)
def test_element_stiffness_vs_oracle(coords):
    ke = np.asarray(fem.element_stiffness(jnp.asarray(coords)))
    expect = _element_stiffness_oracle(coords)
    np.testing.assert_allclose(ke, expect, rtol=1e-10, atol=1e-12)
    # symmetry and (for the Laplace-type operator) positive semidefiniteness
    np.testing.assert_allclose(ke, ke.T, atol=1e-12)
    evals = np.linalg.eigvalsh(expect)
    assert evals.min() > -1e-10


def test_element_rhs_constant_force_unit_square():
    # For f=(1,2) on a h x h element: Fe[node,c] = f_c * h^2 / 4
    h = 0.25
    coords = jnp.asarray(
        np.array([[0, 0], [0, h], [h, h], [h, 0]], float)
    )
    fe = np.asarray(fem.element_rhs(coords, fem.default_body_force))
    expect = np.tile([1.0, 2.0], 4) * h * h / 4.0
    np.testing.assert_allclose(fe, expect, rtol=1e-12)


def test_element_eqnums_matches_reference_ordering():
    # ref DMDAGetElementEqnums (Discretization.c:377-395) for element (i,j)
    eq = np.asarray(fem.element_eqnums(3, 3))
    i, j, nxn = 1, 2, 4
    nodes = [
        j * nxn + i,
        (j + 1) * nxn + i,
        (j + 1) * nxn + (i + 1),
        j * nxn + (i + 1),
    ]
    expect = [n * 2 + c for n in nodes for c in range(2)]
    np.testing.assert_array_equal(eq[j, i], expect)


def test_uniform_coords():
    c = np.asarray(fem.uniform_node_coords(3, 3))
    assert c.shape == (4, 4, 2)
    np.testing.assert_allclose(c[0, 0], [0, 0])
    np.testing.assert_allclose(c[-1, -1], [1, 1])
    np.testing.assert_allclose(c[0, 2], [2 / 3, 0])


@pytest.mark.slow
def test_f32_assembly_finite_and_accurate_at_fine_grid():
    """f32 assembly at a fine grid stays finite and f64-accurate.

    Regression guard for the TPU bf16-einsum corruption: the Jacobian
    einsum cancels O(1) coordinates down to O(h) entries, and the default
    matmul precision routed it through the MXU in bf16 at large batch
    sizes — dets rounded to <= 0, 71% NaN planes at 704^2 f32 (fixed by
    Precision.HIGHEST in fem.py; this test pins the invariant on every
    backend)."""
    import jax.numpy as jnp

    from saddle_point_petsc_tpu.models import poisson

    prob32 = poisson.assemble_poisson(255, 255, dtype=jnp.float32)
    p32 = np.asarray(prob32.A.planes)
    assert np.all(np.isfinite(p32))
    prob64 = poisson.assemble_poisson(255, 255, dtype=jnp.float64)
    p64 = np.asarray(prob64.A.planes)
    # plain-f32 cancellation noise is ~1e-5 relative; bf16 corruption was
    # O(1)-to-NaN — orders of magnitude beyond this bound
    rel = np.max(np.abs(p32 - p64)) / np.max(np.abs(p64))
    assert rel < 1e-4, rel
