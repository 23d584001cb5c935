"""Preconditioners (PC subset) — composable, jit-friendly pytrees.

TPU-native equivalents of the PCs the reference reaches through
`-pc_type` / KSPSetFromOptions (/root/reference/src/SaddlePointProblem.c:67;
PETSc defaults: ILU serial, block-Jacobi+ILU parallel).  North-star set
(SURVEY.md §2b P7): Jacobi, point-block Jacobi, domain block-Jacobi,
ILU(0)-class, Chebyshev/AMG-smoother-class, fieldsplit with Schur
complement.

Every PC is a registered pytree with `__call__(r) -> z`, so it can be
passed straight into the Krylov solvers (including through jit boundaries)
and composed (e.g. fieldsplit sub-PCs, Chebyshev over Jacobi).

TPU design notes:
- ILU(0) triangular solves are inherently sequential (SURVEY.md §7 hard
  part (c)); the factorization runs on host at setup (numpy; C++ kernel in
  csrc/ when built), and application uses *fixed-sweep Jacobi iteration on
  the triangular factors* — fully parallel on the VPU, exact in the limit,
  and in practice 4-8 sweeps reproduce exact-ILU iterate counts.  An exact
  `lax.scan` path exists for small systems/validation.
- Red-black SOR exploits the structured-grid 2-coloring: each half-sweep
  is a dense masked stencil op — the TPU answer to sequential Gauss-Seidel.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from saddle_point_petsc_tpu.ops import sparse as sp
from saddle_point_petsc_tpu.ops.stencil import (
    StencilOperator,
    field_to_flat,
    flat_to_field,
)


def _register(cls, fields, meta=()):
    jax.tree_util.register_pytree_node(
        cls,
        lambda o: (
            tuple(getattr(o, f) for f in fields),
            tuple(getattr(o, m) for m in meta),
        ),
        lambda m, d: cls(*d, *m),
    )
    return cls


# ---------------------------------------------------------------------------
# Identity / Jacobi family
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class IdentityPC:
    def __call__(self, r):
        return r


jax.tree_util.register_pytree_node(
    IdentityPC, lambda o: ((), None), lambda m, d: IdentityPC()
)


@dataclasses.dataclass(frozen=True)
class JacobiPC:
    """Diagonal scaling z = D^{-1} r (PETSc PCJACOBI)."""

    inv_diag: Any  # same pytree structure as vectors

    def __call__(self, r):
        return jax.tree_util.tree_map(jnp.multiply, self.inv_diag, r)


_register(JacobiPC, ("inv_diag",))


def jacobi(A) -> JacobiPC:
    """Build from anything exposing .diagonal() (stencil, CSR via helper)."""
    if isinstance(A, StencilOperator):
        d = A.diagonal()
    elif isinstance(A, sp.CSR):
        d = sp.csr_extract_diagonal(A)
    else:
        d = A.diagonal()
    safe = jnp.where(d == 0, 1.0, d)
    return JacobiPC(1.0 / safe)


@dataclasses.dataclass(frozen=True)
class PBJacobiPC:
    """Point-block Jacobi: invert the dof x dof diagonal blocks
    (PETSc PCPBJACOBI; natural for the 2-dof interleaved DMDA layout,
    ref Discretization.c:17)."""

    inv_blocks: Any  # (..., b, b) matching the field layout

    def __call__(self, r):
        if r.ndim == 1:
            b = self.inv_blocks.shape[-1]
            rb = r.reshape(-1, b)
            ib = self.inv_blocks.reshape(-1, b, b)
            return jnp.einsum("ncd,nd->nc", ib, rb).reshape(-1)
        if r.ndim == 3 and r.shape[0] == self.inv_blocks.shape[-1]:
            # canonical dof-major field (2, ny, nx)
            return jnp.einsum("yxcd,dyx->cyx", self.inv_blocks, r)
        return jnp.einsum("...cd,...d->...c", self.inv_blocks, r)


_register(PBJacobiPC, ("inv_blocks",))


def inv_small(M):
    """Inverse of small trailing (b, b) blocks without LU.

    XLA's LuDecomposition is unimplemented for f64 on TPU, so
    jnp.linalg.inv cannot appear on the device path.  b == 1/2 use the
    closed-form adjugate; larger (static, small) b uses unrolled
    Gauss-Jordan with diagonal pivots — valid for the definite blocks this
    library inverts (diagonal blocks of assembled operators, Schur
    complements), and cheaper than LU at these sizes anyway.
    """
    b = M.shape[-1]
    if b == 1:
        return 1.0 / M
    if b == 2:
        a = M[..., 0, 0]
        bb = M[..., 0, 1]
        c = M[..., 1, 0]
        d = M[..., 1, 1]
        det = a * d - bb * c
        adj = jnp.stack(
            [jnp.stack([d, -bb], -1), jnp.stack([-c, a], -1)], -2
        )
        return adj / det[..., None, None]
    eye = jnp.broadcast_to(jnp.eye(b, dtype=M.dtype), M.shape)
    aug = jnp.concatenate([M, eye], axis=-1)
    for i in range(b):
        row = aug[..., i, :] / aug[..., i, i][..., None]
        aug = aug.at[..., i, :].set(row)
        for j in range(b):
            if j != i:
                aug = aug.at[..., j, :].add(
                    -aug[..., j, i][..., None] * row
                )
    return aug[..., b:]


def pbjacobi(A) -> PBJacobiPC:
    if isinstance(A, StencilOperator):
        return PBJacobiPC(_inv_diag_blocks_jit(A.planes))
    if isinstance(A, sp.BSR):
        blocks = sp.bsr_extract_diag_blocks(A)
    elif hasattr(A, "diag_blocks"):
        # distributed stencil operator: diag_blocks is elementwise on the
        # sharded planes, so the inverse blocks inherit the sharding
        blocks = A.diag_blocks()
    else:
        raise TypeError(f"pbjacobi: unsupported operator {type(A)}")
    return PBJacobiPC(inv_small(blocks))


# ---------------------------------------------------------------------------
# Domain block-Jacobi with dense Cholesky sub-solves
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class BlockJacobiPC:
    """Contiguous row blocks, each solved exactly via a precomputed dense
    inverse applied as one batched (nb, bs, bs) x (nb, bs) matmul.

    The TPU-native version of PETSc PCBJACOBI (+LU/ILU sub-PC): equal-size
    blocks so the per-block solves batch onto the MXU.  Inverses are
    host-factorized at setup — device triangular solves are sequential on
    TPU (and unimplemented for f64), while a batched matmul is one MXU op.
    """

    inv: Any  # (nb, bs, bs) dense block inverses
    n: int  # true vector length (blocks may be padded)

    def __call__(self, r):
        field_shape = None
        if r.ndim == 3 and r.shape[0] == 2:
            # canonical dof-major field -> natural flat (matches the CSR
            # row ordering the blocks were extracted from)
            field_shape = r.shape
            r = field_to_flat(r)
        elif r.ndim != 1:
            field_shape = ("reshape",) + tuple(r.shape)
            r = r.reshape(-1)
        nb, bs, _ = self.inv.shape
        pad = nb * bs - self.n
        rp = jnp.pad(r, (0, pad)).reshape(nb, bs)
        z = jnp.einsum("bij,bj->bi", self.inv, rp)
        z = z.reshape(-1)[: self.n]
        if field_shape is None:
            return z
        if field_shape[0] == "reshape":
            return z.reshape(field_shape[1:])
        return flat_to_field(z, field_shape[1], field_shape[2])


_register(BlockJacobiPC, ("inv",), ("n",))


def block_jacobi(A_dense_or_csr, nblocks=4, max_block=4096) -> BlockJacobiPC:
    """Host setup: extract nb diagonal blocks and invert them.

    Accepts a CSR (host extraction via scipy) or a dense array.
    Blocks are equal-size (last one padded with identity).

    Blocks are capped at `max_block` rows: a dense inverse is O(bs^2)
    memory and O(bs^3) setup, so at large n the block count is raised
    until bs <= max_block (PETSc's PCBJACOBI likewise picks the block
    count when PETSC_DECIDE; a 1024^2-grid operator with nblocks=4 would
    otherwise try to invert four dense ~500k^2 blocks).
    """
    if isinstance(A_dense_or_csr, sp.CSR):
        a = sp.csr_to_scipy(A_dense_or_csr)
        n = a.shape[0]
        get = lambda lo, hi: a[lo:hi, lo:hi].toarray()
    else:
        a = np.asarray(A_dense_or_csr)
        n = a.shape[0]
        get = lambda lo, hi: a[lo:hi, lo:hi]
    nblocks = max(nblocks, -(-n // max_block))
    bs = -(-n // nblocks)
    blocks = np.zeros((nblocks, bs, bs), a.dtype if hasattr(a, "dtype") else np.float64)
    for k in range(nblocks):
        lo, hi = k * bs, min((k + 1) * bs, n)
        m = hi - lo
        blocks[k, :m, :m] = get(lo, hi)
        if m < bs:
            blocks[k, m:, m:] = np.eye(bs - m)
    inv = np.linalg.inv(blocks)
    return BlockJacobiPC(jnp.asarray(inv), n)


def block_jacobi_stencil(op: StencilOperator, nblocks=4) -> BlockJacobiPC:
    """Block-Jacobi over row strips of a stencil operator (host setup)."""
    from saddle_point_petsc_tpu.ops.stencil import stencil_to_coo

    csr = sp.coo_to_csr(stencil_to_coo(op.W))
    return block_jacobi(sp.csr_compact(csr), nblocks)


# ---------------------------------------------------------------------------
# ILU(0)
# ---------------------------------------------------------------------------


def ilu0_factor_host(csr: sp.CSR):
    """ILU(0) factorization on host (setup time).  Returns (L, U) CSR parts:
    L strictly lower (unit diagonal implicit), U upper incl. diagonal.

    Standard IKJ algorithm restricted to the sparsity pattern of A.
    Uses the C++ kernel from csrc/ when available, else numpy/python.
    """
    a = sp.csr_to_scipy(csr).copy()
    a.sort_indices()
    n = a.shape[0]
    indptr, indices, data = a.indptr, a.indices, a.data
    try:
        from saddle_point_petsc_tpu.utils import native

        data = native.ilu0(indptr, indices, data.copy(), n)
    except Exception:
        data = _ilu0_python(indptr, indices, data.copy(), n)
    import scipy.sparse as sps

    f = sps.csr_matrix((data, indices, indptr), shape=a.shape)
    L = sps.tril(f, k=-1).tocsr()
    U = sps.triu(f, k=0).tocsr()
    return sp.scipy_to_csr(L), sp.scipy_to_csr(U)


def _ilu0_python(indptr, indices, data, n):
    """Reference ILU(0) (numpy/python; slow — C++ path preferred)."""
    diag_idx = np.zeros(n, np.int64)
    colpos = {}
    for i in range(n):
        row = slice(indptr[i], indptr[i + 1])
        cols = indices[row]
        colpos[i] = {c: indptr[i] + k for k, c in enumerate(cols)}
        d = colpos[i].get(i)
        if d is None:
            raise ValueError(f"ILU0: missing diagonal in row {i}")
        diag_idx[i] = d
    for i in range(n):
        for kk in range(indptr[i], indptr[i + 1]):
            k = indices[kk]
            if k >= i:
                break
            akk = data[diag_idx[k]]
            data[kk] /= akk
            lik = data[kk]
            rowk = colpos[k]
            for jj in range(kk + 1, indptr[i + 1]):
                j = indices[jj]
                pos = rowk.get(j)
                if pos is not None and j > k:
                    data[jj] -= lik * data[pos]
    return data


@dataclasses.dataclass(frozen=True)
class ILU0PC:
    """Apply z = U^{-1} L^{-1} r.

    sweeps > 0: fixed-count Jacobi sweeps on each triangular factor
    (parallel, TPU-friendly, approximate — exact as sweeps -> n).
    sweeps == 0: exact sequential solve via lax.scan over ELL rows
    (for validation / small systems).
    """

    L: Any  # strictly-lower CSR
    U: Any  # upper CSR incl. diag
    inv_udiag: Any  # (n,)
    ell_L: Any  # ELL forms for the exact scan path
    ell_U: Any
    sweeps: int = 6

    def __call__(self, r):
        field = None
        if r.ndim == 3 and r.shape[0] == 2:
            # canonical dof-major field -> natural flat (CSR row ordering)
            field = r.shape
            r = field_to_flat(r)
        elif r.ndim != 1:
            field = ("reshape",) + tuple(r.shape)
            r = r.reshape(-1)
        if self.sweeps > 0:
            # (I + L) y = r, unit diagonal: y <- r - L y
            y = r
            for _ in range(self.sweeps):
                y = r - sp.csr_matvec(self.L, y)
            # (D + U_strict) z = y: z <- Dinv * (y - U_strict z)
            z = self.inv_udiag * y
            for _ in range(self.sweeps):
                z = self.inv_udiag * (y - sp.csr_matvec(self.U, z))
            out = z
        else:
            y = _scan_lower_solve(self.ell_L, r)
            out = _scan_upper_solve(self.ell_U, self.inv_udiag, y)
        if field is None:
            return out
        if field[0] == "reshape":
            return out.reshape(field[1:])
        return flat_to_field(out, field[1], field[2])


_register(ILU0PC, ("L", "U", "inv_udiag", "ell_L", "ell_U"), ("sweeps",))


def _scan_lower_solve(ell, r):
    """Exact y = (I + L)^{-1} r sequentially over rows (validation path)."""
    n = r.shape[0]
    cols, vals = ell.cols, ell.vals

    def step(y, i):
        c = cols[i]
        v = jnp.where(c >= 0, vals[i], 0.0)
        yi = r[i] - jnp.sum(v * y[jnp.where(c >= 0, c, 0)])
        return y.at[i].set(yi), None

    y0 = jnp.zeros_like(r)
    y, _ = jax.lax.scan(step, y0, jnp.arange(n))
    return y


def _scan_upper_solve(ell, inv_diag, r):
    n = r.shape[0]
    cols, vals = ell.cols, ell.vals

    def step(z, i):
        c = cols[i]
        v = jnp.where(c >= 0, vals[i], 0.0)
        zi = inv_diag[i] * (r[i] - jnp.sum(v * z[jnp.where(c >= 0, c, 0)]))
        return z.at[i].set(zi), None

    z0 = jnp.zeros_like(r)
    z, _ = jax.lax.scan(step, z0, jnp.arange(n, 0, -1) - 1)
    return z


def ilu0(csr: sp.CSR, sweeps: int = 6) -> ILU0PC:
    """ILU(0) preconditioner: host factorization + device application."""
    L, U = ilu0_factor_host(csr)
    ud = sp.csr_extract_diagonal(U)
    inv_ud = 1.0 / jnp.where(ud == 0, 1.0, ud)
    import scipy.sparse as sps

    Ls = sp.csr_to_scipy(L)
    Us = sp.csr_to_scipy(U).copy()
    Us.setdiag(0.0)
    Us.eliminate_zeros()
    # strictly-upper for the sweep path; ELL (incl. diag handling) for scan
    U_strict = sp.scipy_to_csr(Us)
    ell_L = sp.csr_to_ell(L)
    ell_U = sp.csr_to_ell(U_strict)
    return ILU0PC(L, U_strict, inv_ud, ell_L, ell_U, sweeps)


# ---------------------------------------------------------------------------
# Red-black SOR (structured grids)
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class RedBlackSORPC:
    """Red-black Gauss-Seidel/SOR on a stencil operator.

    The 9-point stencil couples each node only to the opposite color in the
    (i+j) 2-coloring for the 5-point part; with the full box stencil the
    coloring is approximate GS, which is still an effective smoother.  Each
    half-sweep is a full-grid masked stencil op — no sequential dependence.

    order: "symmetric" (red-black-black-red SSOR, 4 matvecs/sweep — a
    symmetric PC, valid under CG/MINRES), "forward" (red-black) or
    "backward" (black-red), 2 matvecs/sweep.  A multigrid V-cycle with
    forward pre-smoothing and backward post-smoothing is symmetric as a
    whole at half the smoothing cost of SSOR at both ends
    (solvers/multigrid.py uses exactly that pairing).
    """

    op: StencilOperator
    inv_blocks: Any  # (ny, nx, 2, 2)
    omega: float = 1.0
    sweeps: int = 1
    order: str = "symmetric"

    def __call__(self, r):
        flat = False
        ny, nx = self.op.grid_shape
        if r.ndim == 1:
            flat = True
            r = flat_to_field(r, ny, nx)
        j = jnp.arange(ny)[:, None]
        i = jnp.arange(nx)[None, :]
        red = ((i + j) % 2 == 0)[None, :, :]
        z = jnp.zeros_like(r)

        def half(z, color_mask):
            res = r - self.op.matvec_field(z)
            dz = jnp.einsum("yxcd,dyx->cyx", self.inv_blocks, res)
            return z + self.omega * jnp.where(color_mask, dz, 0.0)

        colors = {
            "symmetric": (red, ~red, ~red, red),
            "forward": (red, ~red),
            "backward": (~red, red),
        }[self.order]
        for _ in range(self.sweeps):
            for c in colors:
                z = half(z, c)
        return field_to_flat(z) if flat else z


_register(RedBlackSORPC, ("op", "inv_blocks"), ("omega", "sweeps", "order"))


@jax.jit
def _inv_diag_blocks_jit(planes):
    """Jitted (planes -> inverted diagonal blocks): keeps PC setup at one
    device call instead of ~10 eager ops (matters on remote backends)."""
    return inv_small(StencilOperator(planes).diag_blocks())


def sor(
    op: StencilOperator, omega=1.0, sweeps=1, order="symmetric"
) -> RedBlackSORPC:
    return RedBlackSORPC(
        op, _inv_diag_blocks_jit(op.planes), omega, sweeps, order
    )


# ---------------------------------------------------------------------------
# Chebyshev smoother PC (AMG-smoother-class)
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class ChebyshevPC:
    """Fixed Chebyshev iterations with Jacobi inner scaling — the standard
    parallel AMG smoother (inner-product-free: zero psums on TPU)."""

    A: Any
    inner: Any  # inner PC (e.g. JacobiPC)
    lmin: float
    lmax: float
    iters: int

    def __call__(self, r):
        from saddle_point_petsc_tpu.solvers.krylov import chebyshev_fixed

        return chebyshev_fixed(
            self.A, r, M=self.inner, lmin=self.lmin, lmax=self.lmax,
            maxiter=self.iters,
        ).x


_register(ChebyshevPC, ("A", "inner"), ("lmin", "lmax", "iters"))


def chebyshev_pc(A, inner=None, lmin=0.1, lmax=1.1, iters=3) -> ChebyshevPC:
    if inner is None:
        inner = jacobi(A)
    return ChebyshevPC(A, inner, lmin, lmax, iters)


def estimate_lmax(A, M=None, n=None, iters=10, key=None, template=None):
    """Power iteration estimate of lambda_max(M A) for Chebyshev bounds.

    Runs as ONE jitted program: an eager loop of operator applications is
    pathological both over tunneled backends (per-op RTTs) and for eager
    shard_map dispatch on distributed operators.
    """
    if M is None:
        M = IdentityPC()
    if key is None:
        key = jax.random.PRNGKey(0)
    if template is None:
        raise ValueError("need a template vector")
    v0 = jax.tree_util.tree_map(
        lambda a: jax.random.normal(key, a.shape, a.dtype), template
    )
    from saddle_point_petsc_tpu.solvers.krylov import tnorm, tscale

    dt = jax.tree_util.tree_leaves(template)[0].dtype

    @jax.jit
    def run(A, M, v):
        def body(_, carry):
            v, lam = carry
            w = M(A(v))
            lam = tnorm(w)
            return (tscale(1.0 / lam, w), lam)

        _, lam = jax.lax.fori_loop(
            0, iters, body, (v, jnp.asarray(1.0, dt))
        )
        return lam

    return run(A, M, v0)


# ---------------------------------------------------------------------------
# FieldSplit / Schur for the KKT block system
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class SchurPC:
    """Fieldsplit Schur-complement PC for [[A, B^T], [B, 0]] on (u, lam).

    PETSc PCFIELDSPLIT with -pc_fieldsplit_type schur and
    Schur-pre 'selfp'-style approximation S ~= -B diag(A)^{-1} B^T
    (BASELINE.json north star).  `fact_type` mirrors
    -pc_fieldsplit_schur_fact_type: diag | lower | upper | full.
    For MINRES use fact_type="diag" (SPD: uses |S|); for GMRES/FGMRES the
    triangular/full variants give the classic 1-2-iteration outer solves.

    inner_solve: callable r_u -> approx A^{-1} r_u (a PC or inner KSP).
    S is m x m dense (m = #constraints = 4 in the reference's design) and
    factorized exactly on device.
    """

    inner_solve: Any
    Bf: Any  # (m, 2, ny, nx) constraint row fields (canonical layout)
    S_inv: Any  # (m, m) dense inverse of the (sign-definite) Schur approx
    fact_type: str = "full"

    def _Bu(self, u):
        return jnp.einsum("mcyx,cyx->m", self.Bf, u,
                          precision=jax.lax.Precision.HIGHEST)

    def _Bt(self, lam):
        return jnp.einsum("m,mcyx->cyx", lam, self.Bf,
                          precision=jax.lax.Precision.HIGHEST)

    def __call__(self, r):
        ru, rlam = r
        Ainv = self.inner_solve
        if self.fact_type == "diag":
            # MINRES needs an SPD PC: the lambda block uses +(B D^-1 B^T)^-1
            # = -(S_inv), since S = -B D^-1 B^T is negative definite.
            return (Ainv(ru), -(self.S_inv @ rlam))
        if self.fact_type == "lower":
            zu = Ainv(ru)
            zlam = self.S_inv @ (rlam - self._Bu(zu))
            return (zu, zlam)
        if self.fact_type == "upper":
            zlam = self.S_inv @ rlam
            zu = Ainv(ru - self._Bt(zlam))
            return (zu, zlam)
        # full: L-D-U application
        yu = Ainv(ru)
        zlam = self.S_inv @ (rlam - self._Bu(yu))
        zu = yu - Ainv(self._Bt(zlam))
        return (zu, zlam)


_register(SchurPC, ("inner_solve", "Bf", "S_inv"), ("fact_type",))


def schur_pc(A, Bf, inner_solve=None, fact_type="full") -> SchurPC:
    """Build the Schur PC with S = -B diag(A)^{-1} B^T (dense m x m).

    A: operator exposing .diagonal() as a (2, ny, nx) field;
    Bf: constraint rows (m, 2, ny, nx)."""
    d = A.diagonal()
    dinv = 1.0 / jnp.where(d == 0, 1.0, d)
    S = -jnp.einsum("mcyx,cyx,kcyx->mk", Bf, dinv, Bf,
                    precision=jax.lax.Precision.HIGHEST)  # negative definite
    S_inv = inv_small(S)
    if inner_solve is None:
        inner_solve = JacobiPC(dinv)
    return SchurPC(inner_solve, Bf, S_inv, fact_type)


@dataclasses.dataclass(frozen=True)
class ScalarStencilOp:
    """Scalar 9-point stencil operator for one (c, d) dof block, stored in
    the fast planes layout (3, 3, ny, nx) — exactly one plane group of
    StencilOperator.planes."""

    Ws: Any  # (3, 3, ny, nx)

    def __call__(self, x):
        ny, nx = self.Ws.shape[-2:]
        xp = jnp.pad(x, ((1, 1), (1, 1)))
        y = jnp.zeros_like(x)
        for dj in range(3):
            for di in range(3):
                y = y + self.Ws[dj, di] * xp[dj : dj + ny, di : di + nx]
        return y

    def diagonal(self):
        return self.Ws[1, 1]


jax.tree_util.register_pytree_node(
    ScalarStencilOp, lambda o: ((o.Ws,), None), lambda _, d: ScalarStencilOp(*d)
)


@dataclasses.dataclass(frozen=True)
class FieldSplitPC:
    """Additive/multiplicative fieldsplit over the 2 velocity components
    (Ux/Uy), exploiting the interleaved-dof layout the reference sets up
    via DMDASetFieldName (ref Discretization.c:23-24).

    The four dof-blocks are stored as scalar plane stencils at setup;
    fs_type: "additive" (block-diag) or "multiplicative" (block
    Gauss-Seidel over fields, applying the A10 coupling).
    """

    A10: ScalarStencilOp  # coupling field0 -> field1 rows
    sub0: Any  # PC for field 0 system
    sub1: Any
    fs_type: str = "additive"

    def __call__(self, r):
        flat = False
        if r.ndim == 1:
            ny, nx = self.A10.Ws.shape[-2:]
            flat = True
            r = flat_to_field(r, ny, nx)
        r0, r1 = r[0], r[1]
        z0 = self.sub0(r0)
        if self.fs_type == "multiplicative":
            r1 = r1 - self.A10(z0)
        z1 = self.sub1(r1)
        z = jnp.stack([z0, z1], axis=0)
        return field_to_flat(z) if flat else z


_register(FieldSplitPC, ("A10", "sub0", "sub1"), ("fs_type",))


def fieldsplit(op: StencilOperator, sub="jacobi", fs_type="additive") -> FieldSplitPC:
    subs = []
    for c in range(2):
        s_op = ScalarStencilOp(op.planes[2 * c + c])  # (c, c) diag block
        if sub == "jacobi":
            d = s_op.diagonal()
            inv = 1.0 / jnp.where(d == 0, 1.0, d)
            subs.append(JacobiPC(inv))
        else:
            raise ValueError(f"fieldsplit sub-PC {sub!r} unsupported")
    return FieldSplitPC(
        ScalarStencilOp(op.planes[2]), subs[0], subs[1], fs_type
    )


# ---------------------------------------------------------------------------
# Inner-KSP as a PC (for FGMRES / Schur inner solves)
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class KSPInnerPC:
    """Wrap an inner Krylov solve as a (generally nonlinear) PC.

    Use under FGMRES.  solver: name in krylov.SOLVERS; fixed iteration
    count/tolerance set at construction.
    """

    A: Any
    M: Any
    solver: str = "cg"
    rtol: float = 1e-2
    maxiter: int = 10

    def __call__(self, r):
        from saddle_point_petsc_tpu.solvers import krylov

        fn = krylov.SOLVERS[self.solver]
        return fn(
            self.A, r, M=self.M, rtol=self.rtol, maxiter=self.maxiter
        ).x


_register(KSPInnerPC, ("A", "M"), ("solver", "rtol", "maxiter"))
