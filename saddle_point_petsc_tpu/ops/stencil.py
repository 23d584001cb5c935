"""Structured-grid stencil operator — the TPU-native DMDA fast path.

PETSc stores the assembled DMDA operator as a distributed CSR (MATAIJ,
ref /root/reference/src/Discretization.c:19) and pays gather/indices
bandwidth on every MatMult.  On TPU the same operator is far faster stored
in *stencil form*: for a 2D grid with a box stencil of width 1 and 2 dof per
node, every node row is a 3x3 neighborhood of 2x2 blocks,

    W[j, i, dj, di, :, :]   (ny, nx, 3, 3, 2, 2)

and SpMV is nine shifted block-einsums over a zero-padded field — fully
regular, no index arrays, no gathers, perfectly fusable by XLA and
vectorizable on the VPU.  Per node row this reads 36 values (vs ~36 values
+ 36 int32 indices for CSR): the stencil form is the bandwidth
speed-of-light for this operator class.

Assembly from batched element matrices uses only *static-slice* adds
(no scatter), replacing MatSetValuesStencil(ADD_VALUES)
(ref Discretization.c:165).
"""
from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

# Element-local node offsets (dj, di), CCW from lower-left, matching
# DMDAGetElementEqnums (ref Discretization.c:377-395).
_NODE_OFF = ((0, 0), (1, 0), (1, 1), (0, 1))


def block_to_planes(W):
    """(ny, nx, 3, 3, 2, 2) block layout -> (4, 3, 3, ny, nx) planes.

    Plane index p = 2*c + d (row dof c, col dof d).  The planes layout puts
    the grid's x-dimension last (the 128-lane VPU axis), which measured
    2.4x faster SpMV than the block layout on TPU v5e (94-111% of the naive
    HBM roofline vs 40%).
    """
    ny, nx = W.shape[:2]
    return jnp.transpose(W, (4, 5, 2, 3, 0, 1)).reshape(4, 3, 3, ny, nx)


def planes_to_block(planes):
    """(4, 3, 3, ny, nx) planes -> (ny, nx, 3, 3, 2, 2) block layout."""
    _, _, _, ny, nx = planes.shape
    return jnp.transpose(
        planes.reshape(2, 2, 3, 3, ny, nx), (4, 5, 2, 3, 0, 1)
    )


def planes_matvec_padded(planes, xpT):
    """y[c] = sum_{dj,di,d} planes[2c+d, dj, di] * xpT[d] windows.

    planes: (4, 3, 3, ny, nx); xpT: (2, ny+2, nx+2) halo-padded dof-major
    field.  Returns (2, ny, nx).  This is the speed-of-light kernel: 36
    fused elementwise multiply-adds with nx on the lane axis.
    """
    ny, nx = planes.shape[-2:]
    y0 = jnp.zeros((ny, nx), xpT.dtype)
    y1 = y0
    for dj in range(3):
        for di in range(3):
            w0 = xpT[0, dj : dj + ny, di : di + nx]
            w1 = xpT[1, dj : dj + ny, di : di + nx]
            y0 = y0 + planes[0, dj, di] * w0 + planes[1, dj, di] * w1
            y1 = y1 + planes[2, dj, di] * w0 + planes[3, dj, di] * w1
    return jnp.stack([y0, y1])


def planes_matvec_field(planes, xT):
    """Matvec on a canonical dof-major (2, ny, nx) field."""
    xpT = jnp.pad(xT, ((0, 0), (1, 1), (1, 1)))
    return planes_matvec_padded(planes, xpT)


def planes_matmat_field(planes, XT):
    """SpMM on a batch of canonical fields: (k, 2, ny, nx) -> (k, 2, ny, nx).

    vmapped over the batch axis — the planes are read once per window and
    broadcast over k columns, amortizing operator bandwidth across the
    right-hand sides (the SpMM half of the north-star kernel set).
    """
    return jax.vmap(planes_matvec_field, in_axes=(None, 0))(planes, XT)


def field_to_flat(xT):
    """(2, ny, nx) dof-major field -> natural interleaved flat vector
    (row = (j*nx + i)*2 + c, the PETSc/CSR ordering)."""
    return jnp.transpose(xT, (1, 2, 0)).reshape(-1)


def flat_to_field(x, ny, nx):
    """Natural interleaved flat vector -> (2, ny, nx) dof-major field."""
    return jnp.transpose(x.reshape(ny, nx, 2), (2, 0, 1))


def field_to_nodes(xT):
    """(2, ny, nx) -> (ny, nx, 2) node-major view (IO/geometry)."""
    return jnp.transpose(xT, (1, 2, 0))


def nodes_to_field(x):
    """(ny, nx, 2) node-major -> (2, ny, nx) canonical dof-major."""
    return jnp.transpose(x, (2, 0, 1))


@dataclasses.dataclass(frozen=True)
class StencilOperator:
    """3x3-block-stencil operator on an (ny, nx) node grid with 2 dof/node.

    Canonical storage is the TPU-fast *planes* layout (4, 3, 3, ny, nx) and
    the canonical vector layout is the dof-major field (2, ny, nx): the
    grid x-dimension sits on the 128-lane VPU axis for both, which measured
    ~4x faster SpMV than dof-minor layouts on TPU v5e (180+ Gnnz/s, ~95% of
    HBM bandwidth).  The block view W (ny, nx, 3, 3, 2, 2) and the natural
    interleaved flat ordering (row = (j*nx+i)*2+c) are provided for
    setup-time structural ops and CSR/dense interop.

    `backend` selects the matvec kernel: "xla" (shifted-window einsums,
    fused by XLA) or "pallas" (explicit double-buffered DMA schedule,
    ops/pallas/spmv.py).  Selectable at runtime via -mat_stencil_backend.
    """

    planes: Any  # (4, 3, 3, ny, nx)
    backend: str = "xla"  # static: "xla" | "pallas"

    @staticmethod
    def from_block(W, backend="xla"):
        return StencilOperator(block_to_planes(W), backend)

    def with_backend(self, backend):
        return dataclasses.replace(self, backend=backend)

    @property
    def W(self):
        """Block-layout view (setup-time use only — materializes a copy)."""
        return planes_to_block(self.planes)

    @property
    def grid_shape(self):
        return self.planes.shape[-2:]

    @property
    def n(self):
        ny, nx = self.grid_shape
        return ny * nx * 2

    @property
    def shape(self):
        return (self.n, self.n)

    @property
    def nnz(self):
        """Number of stored (stencil) entries — the bandwidth-relevant count."""
        return self.planes.size

    def matvec_field(self, xT):
        """Canonical matvec: (2, ny, nx) -> (2, ny, nx)."""
        if self.backend == "pallas":
            from saddle_point_petsc_tpu.ops.pallas.spmv import (
                stencil_spmv_pallas,
            )

            return stencil_spmv_pallas(
                self.planes, xT, interpret=jax.default_backend() != "tpu"
            )
        return planes_matvec_field(self.planes, xT)

    def matvec(self, xflat):
        """Natural-ordering flat matvec (interop/tests)."""
        ny, nx = self.grid_shape
        return field_to_flat(self.matvec_field(flat_to_field(xflat, ny, nx)))

    def matmat_field(self, XT):
        """SpMM on batched canonical fields (k, 2, ny, nx)."""
        return planes_matmat_field(self.planes, XT)

    def matmat(self, X):
        """Y = A @ X for dense X (n, k) in the natural flat ordering."""
        ny, nx = self.grid_shape
        XT = jax.vmap(lambda col: flat_to_field(col, ny, nx), in_axes=1)(X)
        YT = self.matmat_field(XT)
        return jax.vmap(field_to_flat, out_axes=1)(YT)

    def __call__(self, x):
        if x.ndim == 1:
            return self.matvec(x)
        return self.matvec_field(x)

    def diag_blocks(self):
        """Dense diagonal 2x2 blocks, shape (ny, nx, 2, 2)."""
        d = self.planes[:, 1, 1]  # (4, ny, nx)
        return jnp.transpose(d.reshape(2, 2, *d.shape[1:]), (2, 3, 0, 1))

    def diagonal(self):
        """diag(A) as a canonical (2, ny, nx) field."""
        return jnp.stack([self.planes[0, 1, 1], self.planes[3, 1, 1]])


jax.tree_util.register_pytree_node(
    StencilOperator,
    lambda op: ((op.planes,), op.backend),
    lambda backend, data: StencilOperator(data[0], backend),
)


def assemble_stencil(Ke):
    """Accumulate batched element matrices into node-stencil form.

    Ke: (ney, nex, 8, 8) element matrices, (node,dof)-interleaved.
    Returns W: (ney+1, nex+1, 3, 3, 2, 2).

    Uses 16 static-slice adds (one per (row-node, col-node) pair) — the
    TPU-native replacement for the MatSetValuesStencil loop
    (ref Discretization.c:146-166).
    """
    ney, nex, _, _ = Ke.shape
    ny, nx = ney + 1, nex + 1
    Kb = Ke.reshape(ney, nex, 4, 2, 4, 2)
    W = jnp.zeros((ny, nx, 3, 3, 2, 2), Ke.dtype)
    for a, (aj, ai) in enumerate(_NODE_OFF):
        for b, (bj, bi) in enumerate(_NODE_OFF):
            sj, si = bj - aj + 1, bi - ai + 1
            W = W.at[aj : aj + ney, ai : ai + nex, sj, si].add(
                Kb[:, :, a, :, b, :]
            )
    return W


def stencil_matvec(W, x):
    """y[j,i,c] = sum_{dj,di,d} W[j,i,dj,di,c,d] * x[j+dj-1, i+di-1, d].

    x: (ny, nx, 2) field; out-of-grid neighbors are zero.
    """
    ny, nx = x.shape[:2]
    xp = jnp.pad(x, ((1, 1), (1, 1), (0, 0)))
    y = jnp.zeros_like(x)
    for dj in range(3):
        for di in range(3):
            y = y + jnp.einsum(
                "yxcd,yxd->yxc",
                W[:, :, dj, di],
                xp[dj : dj + ny, di : di + nx],
            )
    return y


def stencil_matvec_padded(W, xp):
    """Matvec taking an already halo-padded field xp of shape (ny+2, nx+2, 2).

    Used by the distributed path: the halo ring comes from ppermute
    neighbor exchange instead of zero padding.
    """
    ny, nx = W.shape[:2]
    y = jnp.zeros(W.shape[:2] + (2,), xp.dtype)
    for dj in range(3):
        for di in range(3):
            y = y + jnp.einsum(
                "yxcd,yxd->yxc",
                W[:, :, dj, di],
                xp[dj : dj + ny, di : di + nx],
            )
    return y


def boundary_mask(ny, nx):
    """True at boundary nodes (i==0, i==nx-1, j==0, j==ny-1).

    ref: boundary scan in ApplyBC_Laplace (Discretization.c:244-261).
    """
    j = jnp.arange(ny)[:, None]
    i = jnp.arange(nx)[None, :]
    return (i == 0) | (i == nx - 1) | (j == 0) | (j == ny - 1)


def stencil_zero_rows_columns(W, mask, diag=1.0):
    """Symmetric BC elimination in stencil form.

    Zeros every block whose row node OR column node is masked, then sets the
    masked diagonal blocks to diag*I.  Equivalent to MatZeroRowsColumns
    (ref Discretization.c:268): keeps the operator symmetric (SPD preserved).
    """
    ny, nx = W.shape[:2]
    # rows: zero all stencil entries of masked nodes
    W = jnp.where(mask[:, :, None, None, None, None], 0.0, W)
    # columns: entry (j,i,dj,di) couples to node (j+dj-1, i+di-1)
    maskp = jnp.pad(mask, ((1, 1), (1, 1)))
    for dj in range(3):
        for di in range(3):
            nbr = maskp[dj : dj + ny, di : di + nx]
            W = W.at[:, :, dj, di].multiply(
                jnp.where(nbr, 0.0, 1.0)[:, :, None, None]
            )
    # unit diagonal at masked nodes
    eye = jnp.asarray(diag, W.dtype) * jnp.eye(2, dtype=W.dtype)
    W = W.at[:, :, 1, 1].set(
        jnp.where(mask[:, :, None, None], eye, W[:, :, 1, 1])
    )
    return W


def stencil_to_coo(W):
    """Stencil -> COO triplets (device-side; out-of-grid entries padded)."""
    ny, nx = W.shape[:2]
    j = jnp.arange(ny, dtype=jnp.int32)[:, None]
    i = jnp.arange(nx, dtype=jnp.int32)[None, :]
    rows_list, cols_list, vals_list = [], [], []
    for dj in range(3):
        for di in range(3):
            nj, ni = j + dj - 1, i + di - 1
            inb = (nj >= 0) & (nj < ny) & (ni >= 0) & (ni < nx)
            rnode = j * nx + i
            cnode = jnp.where(inb, nj * nx + ni, 0)
            blk = W[:, :, dj, di]  # (ny, nx, 2, 2)
            for c in range(2):
                for d in range(2):
                    rows_list.append(
                        jnp.where(inb, rnode * 2 + c, -1).reshape(-1)
                    )
                    cols_list.append(
                        jnp.where(inb, cnode * 2 + d, -1).reshape(-1)
                    )
                    vals_list.append(
                        jnp.where(inb, blk[:, :, c, d], 0.0).reshape(-1)
                    )
    from saddle_point_petsc_tpu.ops.sparse import COO

    n = ny * nx * 2
    return COO(
        jnp.concatenate(rows_list),
        jnp.concatenate(cols_list),
        jnp.concatenate(vals_list),
        (n, n),
    )
