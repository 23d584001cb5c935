"""Geometric multigrid preconditioner on stencil operators.

The "AMG-smoother-class" capability of the north star (SURVEY.md §2b P7),
built TPU-first:

- Prolongation = bilinear interpolation on the nested node grids
  (coarse spacing 2); restriction = its exact adjoint P^T.  Both are pure
  static-slice ops — no gathers.
- Coarse operators are *algebraic Galerkin products* A_c = P^T A P computed
  directly in stencil form by probing with comb fields (spacing-4 deltas):
  32 fine-grid applications per level at setup, fully on device.  This
  works for any 3x3-block stencil operator, including BC'd rows and
  variable coefficients (for nested Q1 FEM spaces it reproduces the
  rediscretized operator exactly).
- Smoother: red-black symmetric block-SOR (parallel half-sweeps, zero
  reductions) — the TPU answer to sequential Gauss-Seidel.
- Coarsest level: dense Cholesky, factorized once at setup.

The V-cycle is linear and symmetric, so it is a valid CG/MINRES
preconditioner.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from saddle_point_petsc_tpu.ops import sparse as sp
from saddle_point_petsc_tpu.ops.stencil import (
    StencilOperator,
    stencil_to_coo,
)
from saddle_point_petsc_tpu.solvers import precond


def prolong(xc, ny, nx):
    """Bilinear interpolation on the last two (spatial) dims:
    (..., nyc, nxc) -> (..., ny, nx) with ny = 2*nyc-1, nx = 2*nxc-1
    (nested node grids).  Works on canonical (2, nyc, nxc) fields."""
    xf = jnp.zeros(xc.shape[:-2] + (ny, nx), xc.dtype)
    xf = xf.at[..., 0::2, 0::2].set(xc)
    xf = xf.at[..., 0::2, 1::2].set(0.5 * (xc[..., :, :-1] + xc[..., :, 1:]))
    xf = xf.at[..., 1::2, 0::2].set(0.5 * (xc[..., :-1, :] + xc[..., 1:, :]))
    xf = xf.at[..., 1::2, 1::2].set(
        0.25
        * (
            xc[..., :-1, :-1]
            + xc[..., :-1, 1:]
            + xc[..., 1:, :-1]
            + xc[..., 1:, 1:]
        )
    )
    return xf


def restrict(rf, nyc, nxc):
    """Exact adjoint of `prolong`: (..., ny, nx) -> (..., nyc, nxc)."""
    ny, nx = rf.shape[-2:]
    fp = jnp.pad(rf, ((0, 0),) * (rf.ndim - 2) + ((1, 1), (1, 1)))

    def F(dj, di):
        return fp[..., 1 + dj : 1 + dj + ny : 2, 1 + di : 1 + di + nx : 2]

    return (
        F(0, 0)
        + 0.5 * (F(0, 1) + F(0, -1) + F(1, 0) + F(-1, 0))
        + 0.25 * (F(1, 1) + F(1, -1) + F(-1, 1) + F(-1, -1))
    )


def galerkin_coarse_stencil(op: StencilOperator):
    """A_c = P^T A P in stencil form, computed in closed form.

    Bilinear prolongation has separable hat weights w(-1,0,1) = (1/2, 1, 1/2)
    per dimension, so the Galerkin entry coupling coarse nodes (J,I) and
    (J+dJ, I+dI) is a finite sum over fine offsets (a,b) around (2J,2I) and
    (c,d) around the neighbor:

        Wc[J,I,dJ,dI] = sum_{a,c: |2dJ+c-a|<=1} sum_{b,d: |2dI+d-b|<=1}
            w(a) w(c) w(b) w(d) * W[2J+a, 2I+b, 2dJ+c-a, 2dI+d-b]

    — 169 strided-slice multiply-adds on coarse-sized arrays, no probing
    matvecs and no scatters.  This replaced a comb-probing implementation
    (32 fine-grid matvecs + 288 strided scatter writes per level) that
    dominated jit compile time at 256^2; kept as
    `galerkin_coarse_stencil_probe` for cross-validation in tests.
    Out-of-grid fine entries are zero (zero-padded), matching the fine
    operator's zero Dirichlet exterior.
    """
    return StencilOperator(_galerkin_planes_jit(op.planes))


@jax.jit
def _galerkin_planes_jit(planes):
    """Jitted body of `galerkin_coarse_stencil` (planes -> coarse planes).

    Kept jitted so MG setup is one device program per level instead of
    ~1500 eager ops — decisive on remote/tunneled backends where each
    eager op pays a round trip.
    """
    op = StencilOperator(planes)
    W = op.W  # (ny, nx, 3, 3, 2, 2) block layout
    ny, nx = op.grid_shape
    nyc, nxc = (ny + 1) // 2, (nx + 1) // 2
    Wp = jnp.pad(W, ((1, 1), (1, 1), (0, 0), (0, 0), (0, 0), (0, 0)))
    w1d = {-1: 0.5, 0: 1.0, 1: 0.5}
    planes_out = []
    for dJ in (-1, 0, 1):
        y_terms = [
            (a, c, w1d[a] * w1d[c])
            for a in (-1, 0, 1)
            for c in (-1, 0, 1)
            if abs(2 * dJ + c - a) <= 1
        ]
        for dI in (-1, 0, 1):
            x_terms = [
                (b, d, w1d[b] * w1d[d])
                for b in (-1, 0, 1)
                for d in (-1, 0, 1)
                if abs(2 * dI + d - b) <= 1
            ]
            acc = jnp.zeros((nyc, nxc, 2, 2), W.dtype)
            for a, c, wy in y_terms:
                sj = 2 * dJ + c - a
                rows = slice(1 + a, 1 + a + 2 * nyc - 1, 2)
                for b, d, wx in x_terms:
                    si = 2 * dI + d - b
                    cols = slice(1 + b, 1 + b + 2 * nxc - 1, 2)
                    acc = acc + (wy * wx) * Wp[
                        rows, cols, sj + 1, si + 1
                    ]
            planes_out.append(acc)
    # (9, nyc, nxc, 2, 2) -> (nyc, nxc, 3, 3, 2, 2)
    Wc = jnp.stack(planes_out).reshape(3, 3, nyc, nxc, 2, 2)
    Wc = jnp.transpose(Wc, (2, 3, 0, 1, 4, 5))
    return StencilOperator.from_block(Wc).planes


def galerkin_coarse_stencil_probe(op: StencilOperator):
    """A_c = P^T A P in stencil form via comb probing (validation path).

    Coarse stencil reach is <= 1 coarse node (= 2 fine nodes + P reach 1
    = 3 fine < comb spacing 4), so spacing-4 delta combs isolate single
    columns of A_c exactly.
    """
    ny, nx = op.grid_shape
    nyc, nxc = (ny + 1) // 2, (nx + 1) // 2
    Wc = jnp.zeros((nyc, nxc, 3, 3, 2, 2), op.planes.dtype)
    for pj in range(4):
        for pi in range(4):
            for d in range(2):
                xc = jnp.zeros((2, nyc, nxc), op.planes.dtype)
                xc = xc.at[d, pj::4, pi::4].set(1.0)
                rc = restrict(op.matvec_field(prolong(xc, ny, nx)), nyc, nxc)
                rc_nodes = jnp.transpose(rc, (1, 2, 0))  # (nyc, nxc, 2)
                for dJ in (-1, 0, 1):
                    for dI in (-1, 0, 1):
                        sj = (pj + dJ) % 4
                        si = (pi + dI) % 4
                        Wc = Wc.at[
                            sj::4, si::4, 1 - dJ, 1 - dI, :, d
                        ].set(rc_nodes[sj::4, si::4, :])
    return StencilOperator.from_block(Wc)


@dataclasses.dataclass(frozen=True)
class MGLevel:
    A: StencilOperator
    smoother: Any  # PC applied as pre-smoother
    post_smoother: Any = None  # defaults to `smoother` (None = same)

    @property
    def post(self):
        return self.post_smoother if self.post_smoother is not None else (
            self.smoother
        )


jax.tree_util.register_pytree_node(
    MGLevel,
    lambda l: ((l.A, l.smoother, l.post_smoother), None),
    lambda _, d: MGLevel(*d),
)


@dataclasses.dataclass(frozen=True)
class MGPC:
    """V(1,1)-cycle geometric multigrid as a (symmetric, linear) PC."""

    levels: Tuple[MGLevel, ...]
    coarse_inv: Any  # dense inverse of the coarsest operator (host setup)
    cycles: int = 1

    def __call__(self, r):
        from saddle_point_petsc_tpu.ops.stencil import (
            field_to_flat,
            flat_to_field,
        )

        flat = False
        ny, nx = self.levels[0].A.grid_shape
        if r.ndim == 1:
            flat = True
            r = flat_to_field(r, ny, nx)
        z = jnp.zeros_like(r)
        for _ in range(self.cycles):
            z = z + self._vcycle(0, r - self.levels[0].A.matvec_field(z))
        return field_to_flat(z) if flat else z

    def _vcycle(self, k, r):
        from saddle_point_petsc_tpu.ops.stencil import (
            field_to_flat,
            flat_to_field,
        )

        if k == len(self.levels):
            ny, nx = r.shape[-2:]
            flat = field_to_flat(r)  # coarse inverse is in natural ordering
            # dense inverse applied as a matmul: the coarsest system is tiny
            # and a matmul avoids device triangular solves (no f64
            # TriangularSolve/LU on TPU) while riding the MXU.
            z = self.coarse_inv @ flat
            return flat_to_field(z, ny, nx)
        lvl = self.levels[k]
        z = lvl.smoother(r)  # pre-smooth from zero initial guess
        res = r - lvl.A.matvec_field(z)
        nyc = (r.shape[-2] + 1) // 2
        nxc = (r.shape[-1] + 1) // 2
        zc = self._vcycle(k + 1, restrict(res, nyc, nxc))
        z = z + prolong(zc, r.shape[-2], r.shape[-1])
        z = z + lvl.post(r - lvl.A.matvec_field(z))  # post-smooth
        return z


jax.tree_util.register_pytree_node(
    MGPC,
    lambda m: ((m.levels, m.coarse_inv), (m.cycles,)),
    lambda meta, d: MGPC(*d, *meta),
)


@dataclasses.dataclass(frozen=True)
class DistMGPC:
    """Geometric multigrid on a padded distributed grid.

    The distributed operator's grid is padded to divide the device mesh
    (identity rows, parallel/dist.py), which breaks the odd-node-count
    nesting MG needs.  This wrapper solves the two regions exactly as the
    operator decouples them (the true-domain boundary is
    Dirichlet-eliminated, so active and padding never couple):

    - active (nyt, nxt) region: a standard MGPC hierarchy whose stencil
      ops run on the globally *sharded* planes under plain jit — the XLA
      SPMD partitioner inserts the halo collectives for the shifted-slice
      stencils, restrictions and prolongations (no shard_map divisibility
      constraints on the coarse grids);
    - padding region: identity rows, exact solve z = r.

    Symmetric and linear (valid under CG/MINRES).
    """

    inner: "MGPC"  # hierarchy on the active region
    active: tuple  # (nyt, nxt) static
    pad_shape: tuple  # full padded (ny, nx) static

    def __call__(self, r):
        nyt, nxt = self.active
        ny, nx = self.pad_shape
        z_act = self.inner(r[:, :nyt, :nxt])
        z = jnp.pad(z_act, ((0, 0), (0, ny - nyt), (0, nx - nxt)))
        if ny > nyt:
            z = z.at[:, nyt:, :].set(r[:, nyt:, :])
        if nx > nxt:
            z = z.at[:, :, nxt:].set(r[:, :, nxt:])
        return z


jax.tree_util.register_pytree_node(
    DistMGPC,
    lambda m: ((m.inner,), (m.active, m.pad_shape)),
    lambda meta, d: DistMGPC(*d, *meta),
)


def mg_pc_dist(A, opts=None, **kw) -> "DistMGPC | MGPC":
    """Multigrid for a DistStencilOperator.

    The hierarchy is built from the operator's (sharded) active-region
    planes; all cycle ops are global-array ops partitioned by XLA.  When
    the grid has no padding this degenerates to the plain MGPC on the
    sharded planes."""
    ny, nx = A.grid_shape
    nyt, nxt = A.active_shape or (ny, nx)
    act = StencilOperator(A.planes[..., :nyt, :nxt])
    inner = mg_pc(act, opts, **kw)
    if (nyt, nxt) == (ny, nx):
        return inner
    return DistMGPC(inner, (nyt, nxt), (ny, nx))


def mg_pc(
    A: StencilOperator,
    opts=None,
    max_levels=10,
    coarse_size=5,
    smoother="sor",
    cycles=1,
) -> MGPC:
    """Build the multigrid hierarchy (setup runs on device; factorization of
    the coarsest level on host/device dense)."""
    if opts is not None:
        max_levels = opts.get_int("pc_mg_levels", max_levels)
        smoother = opts.get_str("pc_mg_smoother", smoother)
        cycles = opts.get_int("pc_mg_cycles", cycles)
    levels = []
    op = A
    while len(levels) < max_levels - 1:
        ny, nx = op.grid_shape
        if ny <= coarse_size or nx <= coarse_size:
            break
        if (ny - 1) % 2 or (nx - 1) % 2:
            break  # not coarsenable further (need odd node counts)
        post = None
        if smoother == "sor":
            sm = precond.sor(op, omega=1.0, sweeps=1)
        elif smoother == "sor-fb":
            # forward pre / backward post: V-cycle symmetric as a whole at
            # HALF the smoothing matvecs of SSOR at both ends (2 vs 4 per
            # smoother application) — the fast V-cycle for FGMRES-class
            # outers and the refined-KKT inner solve
            sm = precond.sor(op, omega=1.0, sweeps=1, order="forward")
            post = precond.sor(op, omega=1.0, sweeps=1, order="backward")
        elif smoother == "chebyshev":
            # Chebyshev smoothing targets the UPPER spectrum [lmax/4, lmax]
            # of the Jacobi-preconditioned operator (PETSc PCMG default
            # smoother semantics).  The generic chebyshev_pc default
            # lmax=1.1 assumes a well-scaled PC'd spectrum; for D^-1 A the
            # spectrum reaches ~2 and an undershot lmax makes the smoother
            # AMPLIFY high modes (divergence).  Estimate per level.
            Mj = precond.jacobi(op)
            tmpl = jnp.ones((2, ny, nx), op.planes.dtype)
            lmax = 1.1 * float(
                precond.estimate_lmax(op, Mj, template=tmpl)
            )
            sm = precond.chebyshev_pc(
                op, inner=Mj, lmin=lmax / 4.0, lmax=lmax, iters=3
            )
        elif smoother == "jacobi":
            base = precond.pbjacobi(op)
            sm = _DampedPBJacobi(base.inv_blocks, 0.8)
        else:
            raise ValueError(f"mg smoother {smoother!r}")
        levels.append(MGLevel(op, sm, post))
        op = galerkin_coarse_stencil(op)
    cny, cnx = op.grid_shape
    # 8192-dof cap: the old 32768 admitted a 4.3 GB dense inverse whose
    # LAPACK call SEGFAULTS (n^2 exceeds 32-bit workspace indexing) —
    # e.g. any even node count, which never coarsens at all
    if cny * cnx * 2 > 8192:
        raise ValueError(
            f"mg_pc: coarsest level is {cny}x{cnx} nodes "
            f"({cny * cnx * 2} dofs) — too large for a dense coarse solve. "
            "Grids coarsen only while node counts are odd (2^k+1 nodes = "
            "2^k elements per axis coarsen fully); choose such a grid or "
            "raise max_levels."
        )
    dense = _stencil_to_dense_host(np.asarray(op.W))
    coarse_inv = jnp.asarray(np.linalg.inv(dense))
    return MGPC(tuple(levels), coarse_inv, cycles)


def _stencil_to_dense_host(W):
    """Coarsest-level dense assembly in pure numpy (one device fetch for
    W, zero further device traffic — the device-side
    stencil_to_coo -> coo_to_csr -> todense chain is ~60 eager ops, which
    a remote backend turns into a minute of round trips)."""
    ny, nx = W.shape[:2]
    n = ny * nx * 2
    dense = np.zeros((n, n), W.dtype)
    for dj in range(3):
        for di in range(3):
            blk = W[:, :, dj, di]  # (ny, nx, 2, 2)
            jlo, jhi = max(0, 1 - dj), ny - max(0, dj - 1)
            ilo, ihi = max(0, 1 - di), nx - max(0, di - 1)
            for j in range(jlo, jhi):
                for i in range(ilo, ihi):
                    r = (j * nx + i) * 2
                    c = ((j + dj - 1) * nx + (i + di - 1)) * 2
                    dense[r : r + 2, c : c + 2] += blk[j, i]
    return dense


@dataclasses.dataclass(frozen=True)
class _DampedPBJacobi:
    inv_blocks: Any
    omega: float = 0.8

    def __call__(self, r):
        return self.omega * jnp.einsum(
            "yxcd,dyx->cyx", self.inv_blocks, r
        )


jax.tree_util.register_pytree_node(
    _DampedPBJacobi,
    lambda o: ((o.inv_blocks,), (o.omega,)),
    lambda m, d: _DampedPBJacobi(*d, *m),
)
