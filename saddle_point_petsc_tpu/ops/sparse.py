"""Sparse matrix formats and device-side assembly (TPU-native MATAIJ subset).

Covers the exercised-PETSc matrix capabilities (SURVEY.md §2b P4/P5):
COO triplet accumulation with duplicate summation (MatSetValues ADD_VALUES,
ref src/Discretization.c:165), assembly finalization (MatAssemblyBegin/End,
ref :168-169), CSR/BSR storage (MATAIJ, ref :19), and symmetric row+column
elimination with unit diagonal (MatZeroRowsColumns, ref :268).

Everything here is functional and jit-friendly.  COO->CSR runs fully on
device with static shapes (sort + segment-sum dedup, padded to the static
triplet count); `csr_compact` optionally shrinks to exact nnz on the host at
setup time.

All containers are registered pytrees so they pass transparently through
jit/vmap/shard_map.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np


def _pytree_dataclass(cls, data_fields, meta_fields):
    def flatten(obj):
        return (
            tuple(getattr(obj, f) for f in data_fields),
            tuple(getattr(obj, f) for f in meta_fields),
        )

    def unflatten(meta, data):
        kwargs = dict(zip(data_fields, data))
        kwargs.update(dict(zip(meta_fields, meta)))
        return cls(**kwargs)

    jax.tree_util.register_pytree_node(cls, flatten, unflatten)
    return cls


@dataclasses.dataclass(frozen=True)
class COO:
    """Triplet format; duplicates allowed (summed on conversion).

    Entries with row < 0 are treated as padding and dropped.
    """

    rows: Any  # (nnz,) int32
    cols: Any  # (nnz,) int32
    vals: Any  # (nnz,) float
    shape: tuple  # (m, n) static

    @property
    def nnz(self):
        return self.rows.shape[0]

    def todense(self):
        m, n = self.shape
        valid = self.rows >= 0
        r = jnp.where(valid, self.rows, 0)
        c = jnp.where(valid, self.cols, 0)
        v = jnp.where(valid, self.vals, 0.0)
        return jnp.zeros((m, n), self.vals.dtype).at[r, c].add(v)


_pytree_dataclass(COO, ("rows", "cols", "vals"), ("shape",))


@dataclasses.dataclass(frozen=True)
class CSR:
    """Compressed sparse row.  Padding entries have col == -1 (val ignored).

    `indptr` has length m+1; column indices within a row are sorted.
    """

    indptr: Any  # (m+1,) int32
    cols: Any  # (nnz,) int32  (-1 padding)
    vals: Any  # (nnz,) float
    shape: tuple

    @property
    def nnz(self):
        return self.cols.shape[0]

    def todense(self):
        m, n = self.shape
        rows = row_ids_from_indptr(self.indptr, self.nnz)
        valid = self.cols >= 0
        r = jnp.where(valid, rows, 0)
        c = jnp.where(valid, self.cols, 0)
        v = jnp.where(valid, self.vals, 0.0)
        return jnp.zeros((m, n), self.vals.dtype).at[r, c].add(v)

    def matvec(self, x):
        return csr_matvec(self, x)

    def matmat(self, X):
        return csr_matmat(self, X)

    def __call__(self, x):
        return self.matvec(x)


_pytree_dataclass(CSR, ("indptr", "cols", "vals"), ("shape",))


@dataclasses.dataclass(frozen=True)
class BSR:
    """Block CSR with dense b x b blocks (b = block size, e.g. 2 for 2 dof).

    Block-row i covers scalar rows [i*b, (i+1)*b).  Padding block-cols == -1.
    """

    indptr: Any  # (mb+1,) int32
    cols: Any  # (nnzb,) int32 block-column indices (-1 padding)
    vals: Any  # (nnzb, b, b) float
    shape: tuple  # scalar shape (m, n)
    block: int = 2

    @property
    def nnzb(self):
        return self.cols.shape[0]

    def todense(self):
        m, n = self.shape
        b = self.block
        rows = row_ids_from_indptr(self.indptr, self.nnzb)
        valid = self.cols >= 0
        r = jnp.where(valid, rows, 0)
        c = jnp.where(valid, self.cols, 0)
        v = jnp.where(valid[:, None, None], self.vals, 0.0)
        dense = jnp.zeros((m // b, n // b, b, b), self.vals.dtype)
        dense = dense.at[r, c].add(v)
        return dense.transpose(0, 2, 1, 3).reshape(m, n)

    def matvec(self, x):
        return bsr_matvec(self, x)

    def matmat(self, X):
        return bsr_matmat(self, X)

    def __call__(self, x):
        return self.matvec(x)


_pytree_dataclass(BSR, ("indptr", "cols", "vals"), ("shape", "block"))


@dataclasses.dataclass(frozen=True)
class ELL:
    """Sliced-ELLPACK: fixed entries-per-row, padded with col == -1.

    cols/vals have shape (m, k).  TPU-friendly: SpMV is a dense gather +
    row-reduction with no indirection in the reduction.
    """

    cols: Any  # (m, k) int32
    vals: Any  # (m, k) float
    shape: tuple

    def todense(self):
        m, n = self.shape
        r = jnp.broadcast_to(jnp.arange(m)[:, None], self.cols.shape)
        valid = self.cols >= 0
        rr = jnp.where(valid, r, 0)
        cc = jnp.where(valid, self.cols, 0)
        vv = jnp.where(valid, self.vals, 0.0)
        return jnp.zeros((m, n), self.vals.dtype).at[rr, cc].add(vv)

    def matvec(self, x):
        return ell_matvec(self, x)

    def matmat(self, X):
        return ell_matmat(self, X)

    def __call__(self, x):
        return self.matvec(x)


_pytree_dataclass(ELL, ("cols", "vals"), ("shape",))


def row_ids_from_indptr(indptr, nnz):
    """Expand CSR indptr to per-entry row ids, statically sized."""
    m = indptr.shape[0] - 1
    # row of entry e = number of row starts <= e, minus 1
    return (
        jnp.searchsorted(
            indptr, jnp.arange(nnz, dtype=indptr.dtype), side="right"
        ).astype(jnp.int32)
        - 1
    ).clip(0, m - 1)


# ---------------------------------------------------------------------------
# Assembly: COO -> CSR (device-side, static shapes)
# ---------------------------------------------------------------------------


def coo_sum_duplicates(coo: COO) -> COO:
    """Sort triplets by (row, col) and sum duplicates on device.

    The result keeps the same static nnz; collapsed slots become padding
    (row = col = -1) gathered at the end.  This is the TPU-native equivalent
    of PETSc's MatAssembly stash-and-merge (ref Discretization.c:168-169).
    """
    m, n = coo.shape
    rows = coo.rows.astype(jnp.int32)
    cols = coo.cols.astype(jnp.int32)
    pad = rows < 0
    # Sort key: (is_pad, row, col) — padding sorts last.
    key_rows = jnp.where(pad, m, rows)
    order = jnp.lexsort((cols, key_rows))
    r, c, v = rows[order], cols[order], coo.vals[order]
    first = jnp.concatenate(
        [
            jnp.ones((1,), bool),
            (r[1:] != r[:-1]) | (c[1:] != c[:-1]),
        ]
    )
    uid = jnp.cumsum(first) - 1  # group index per entry
    nnz = coo.nnz
    summed = jax.ops.segment_sum(v, uid, num_segments=nnz)
    ur = jax.ops.segment_max(r, uid, num_segments=nnz)
    uc = jax.ops.segment_max(c, uid, num_segments=nnz)
    ngroups = uid[-1] + 1
    slot = jnp.arange(nnz, dtype=jnp.int32)
    live = slot < ngroups
    pad_out = ~live | (ur >= m) | (ur < 0)
    ur = jnp.where(pad_out, -1, ur)
    uc = jnp.where(pad_out, -1, uc)
    summed = jnp.where(pad_out, 0.0, summed)
    return COO(ur, uc, summed, coo.shape)


def coo_to_csr(coo: COO) -> CSR:
    """Device-side COO->CSR with duplicate summation (static shapes).

    Padded entries (col == -1) remain at the tail of the value arrays; the
    indptr covers only live entries.
    """
    m, _ = coo.shape
    dedup = coo_sum_duplicates(coo)
    r = dedup.rows
    counts = jax.ops.segment_sum(
        jnp.where(r >= 0, 1, 0), jnp.where(r >= 0, r, 0), num_segments=m
    )
    indptr = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(counts).astype(jnp.int32)]
    )
    return CSR(indptr, dedup.cols, dedup.vals, coo.shape)


def csr_compact(csr: CSR) -> CSR:
    """Host-side shrink of a padded CSR to exact nnz (setup-time only)."""
    indptr = np.asarray(csr.indptr)
    cols = np.asarray(csr.cols)
    vals = np.asarray(csr.vals)
    nnz = int(indptr[-1])
    return CSR(
        jnp.asarray(indptr),
        jnp.asarray(cols[:nnz]),
        jnp.asarray(vals[:nnz]),
        csr.shape,
    )


def csr_to_ell(csr: CSR, k: int | None = None) -> ELL:
    """Convert CSR to fixed-width ELL (host- or device-side).

    k defaults to the max row length (host-computed if not given).
    """
    m, n = csr.shape
    if k is None:
        indptr = np.asarray(csr.indptr)
        k = int(np.max(np.diff(indptr))) if m else 0
    rows = row_ids_from_indptr(csr.indptr, csr.nnz)
    # position of each entry within its row
    pos = jnp.arange(csr.nnz, dtype=jnp.int32) - csr.indptr[rows]
    valid = (csr.cols >= 0) & (pos < k)
    r = jnp.where(valid, rows, 0)
    p = jnp.where(valid, pos, 0)
    cols = jnp.full((m, k), -1, jnp.int32)
    vals = jnp.zeros((m, k), csr.vals.dtype)
    cols = cols.at[r, p].set(jnp.where(valid, csr.cols, -1), mode="drop")
    vals = vals.at[r, p].set(jnp.where(valid, csr.vals, 0.0), mode="drop")
    return ELL(cols, vals, csr.shape)


def csr_to_bsr(csr: CSR, block: int = 2) -> BSR:
    """Host-side CSR -> BSR conversion (setup time)."""
    import scipy.sparse as sp

    m, n = csr.shape
    a = csr_to_scipy(csr).tobsr(blocksize=(block, block))
    a.sort_indices()
    return BSR(
        jnp.asarray(a.indptr.astype(np.int32)),
        jnp.asarray(a.indices.astype(np.int32)),
        jnp.asarray(a.data),
        (m, n),
        block,
    )


def csr_to_scipy(csr: CSR):
    """Host-side CSR -> scipy.sparse.csr_matrix (drops padding)."""
    import scipy.sparse as sp

    indptr = np.asarray(csr.indptr)
    cols = np.asarray(csr.cols)
    vals = np.asarray(csr.vals)
    nnz = int(indptr[-1])
    return sp.csr_matrix(
        (vals[:nnz], cols[:nnz], indptr), shape=csr.shape
    )


def scipy_to_csr(a) -> CSR:
    a = a.tocsr()
    a.sort_indices()
    return CSR(
        jnp.asarray(a.indptr.astype(np.int32)),
        jnp.asarray(a.indices.astype(np.int32)),
        jnp.asarray(a.data),
        a.shape,
    )


# ---------------------------------------------------------------------------
# SpMV (XLA paths; Pallas kernels live in ops/pallas/)
# ---------------------------------------------------------------------------


def coo_matvec(coo: COO, x):
    valid = coo.rows >= 0
    r = jnp.where(valid, coo.rows, 0)
    c = jnp.where(valid, coo.cols, 0)
    v = jnp.where(valid, coo.vals, 0.0)
    return jax.ops.segment_sum(v * x[c], r, num_segments=coo.shape[0])


def csr_matvec(csr: CSR, x):
    """y = A @ x via gather + segment-sum (XLA path)."""
    rows = row_ids_from_indptr(csr.indptr, csr.nnz)
    valid = csr.cols >= 0
    c = jnp.where(valid, csr.cols, 0)
    v = jnp.where(valid, csr.vals, 0.0)
    return jax.ops.segment_sum(
        v * x[c], rows, num_segments=csr.shape[0], indices_are_sorted=True
    )


def ell_matvec(ell: ELL, x):
    """y = A @ x: dense gather (m,k) + row sum.  No indirect reduction."""
    valid = ell.cols >= 0
    c = jnp.where(valid, ell.cols, 0)
    v = jnp.where(valid, ell.vals, 0.0)
    return jnp.sum(v * x[c], axis=1)


def bsr_matvec(bsr: BSR, x):
    """y = A @ x for block-CSR: gathers b-vectors, 2x2 block matvecs, segment sum."""
    b = bsr.block
    mb = bsr.shape[0] // b
    rows = row_ids_from_indptr(bsr.indptr, bsr.nnzb)
    valid = bsr.cols >= 0
    c = jnp.where(valid, bsr.cols, 0)
    v = jnp.where(valid[:, None, None], bsr.vals, 0.0)
    xb = x.reshape(-1, b)
    xi = xb[c]  # (nnzb, b)
    yi = jnp.einsum("ecd,ed->ec", v, xi)
    yb = jax.ops.segment_sum(
        yi, rows, num_segments=mb, indices_are_sorted=True
    )
    return yb.reshape(-1)


# ---------------------------------------------------------------------------
# SpMM — sparse times dense multi-vector (MatMatMult over a thin dense X).
#
# The north-star demands SpMM alongside SpMV (BASELINE.json `north_star`:
# "distributed SpMV/SpMM as Pallas kernels").  Column convention: X is
# (n, k) with k right-hand sides; returns (m, k).  On TPU the k axis rides
# the 128-lane dimension, so the gather cost of SpMV is amortized over k
# columns — BSR SpMM additionally maps the (b x b) x (b x k) block products
# onto the MXU via a single batched einsum.
# ---------------------------------------------------------------------------


def coo_matmat(coo: COO, X):
    valid = coo.rows >= 0
    r = jnp.where(valid, coo.rows, 0)
    c = jnp.where(valid, coo.cols, 0)
    v = jnp.where(valid, coo.vals, 0.0)
    return jax.ops.segment_sum(
        v[:, None] * X[c], r, num_segments=coo.shape[0]
    )


def csr_matmat(csr: CSR, X):
    """Y = A @ X for dense X (n, k): one gather, k-wide fma, segment-sum."""
    rows = row_ids_from_indptr(csr.indptr, csr.nnz)
    valid = csr.cols >= 0
    c = jnp.where(valid, csr.cols, 0)
    v = jnp.where(valid, csr.vals, 0.0)
    return jax.ops.segment_sum(
        v[:, None] * X[c],
        rows,
        num_segments=csr.shape[0],
        indices_are_sorted=True,
    )


def ell_matmat(ell: ELL, X):
    """Y = A @ X: dense gather (m, w, k) + row reduction; no indirection."""
    valid = ell.cols >= 0
    c = jnp.where(valid, ell.cols, 0)
    v = jnp.where(valid, ell.vals, 0.0)
    return jnp.sum(v[:, :, None] * X[c], axis=1)


def bsr_matmat(bsr: BSR, X):
    """Y = A @ X for block-CSR: block products run on the MXU.

    X: (n, k).  Each nonzero block contributes a (b x b) @ (b x k) matmul —
    batched into one einsum so XLA tiles it onto the systolic array.
    """
    b = bsr.block
    mb = bsr.shape[0] // b
    k = X.shape[1]
    rows = row_ids_from_indptr(bsr.indptr, bsr.nnzb)
    valid = bsr.cols >= 0
    c = jnp.where(valid, bsr.cols, 0)
    v = jnp.where(valid[:, None, None], bsr.vals, 0.0)
    Xb = X.reshape(-1, b, k)
    Yi = jnp.einsum("ecd,edk->eck", v, Xb[c])
    Yb = jax.ops.segment_sum(
        Yi, rows, num_segments=mb, indices_are_sorted=True
    )
    return Yb.reshape(-1, k)


def dia_matmat(dia: DIA, X):
    """Y = A @ X via shifted row-slices of X (no gathers at all)."""
    n = dia.shape[0]
    Y = jnp.zeros_like(X)
    for d, off in enumerate(dia.offsets):
        if off == 0:
            Y = Y + dia.data[d][:, None] * X
        elif off > 0:
            Y = Y.at[: n - off].add(dia.data[d, : n - off, None] * X[off:])
        else:
            Y = Y.at[-off:].add(dia.data[d, -off:, None] * X[: n + off])
    return Y


# ---------------------------------------------------------------------------
# Boundary-condition elimination
# ---------------------------------------------------------------------------


def coo_zero_rows_columns(coo: COO, mask, diag=1.0) -> COO:
    """Symmetric elimination: zero all entries whose row OR col is masked,
    then add unit diagonal at masked rows.

    `mask` is a boolean (m,) array (True = eliminate).  Equivalent to PETSc
    MatZeroRowsColumns(A, ..., 1.0, NULL, NULL) (ref Discretization.c:268);
    keeps symmetry/SPD so CG/MINRES remain applicable.  The diagonal entries
    are appended as extra triplets (caller controls static sizing).
    """
    m, n = coo.shape
    valid = coo.rows >= 0
    hit = valid & (
        mask[jnp.where(valid, coo.rows, 0)]
        | mask[jnp.where(valid, coo.cols, 0)]
    )
    vals = jnp.where(hit, 0.0, coo.vals)
    # Keep (row,col) of zeroed entries so sparsity pattern is unchanged.
    diag_rows = jnp.where(mask, jnp.arange(m, dtype=jnp.int32), -1)
    diag_vals = jnp.where(mask, jnp.asarray(diag, coo.vals.dtype), 0.0)
    return COO(
        jnp.concatenate([coo.rows, diag_rows]),
        jnp.concatenate([coo.cols, diag_rows]),
        jnp.concatenate([vals, diag_vals]),
        coo.shape,
    )


def csr_extract_diagonal(csr: CSR):
    """diag(A) as a dense (m,) vector."""
    rows = row_ids_from_indptr(csr.indptr, csr.nnz)
    isdiag = (csr.cols == rows) & (csr.cols >= 0)
    return jax.ops.segment_sum(
        jnp.where(isdiag, csr.vals, 0.0), rows, num_segments=csr.shape[0]
    )


def bsr_extract_diag_blocks(bsr: BSR):
    """Dense diagonal blocks (mb, b, b)."""
    rows = row_ids_from_indptr(bsr.indptr, bsr.nnzb)
    isdiag = (bsr.cols == rows) & (bsr.cols >= 0)
    mb = bsr.shape[0] // bsr.block
    return jax.ops.segment_sum(
        jnp.where(isdiag[:, None, None], bsr.vals, 0.0),
        rows,
        num_segments=mb,
    )


# ---------------------------------------------------------------------------
# DIA (diagonal/banded) format — the TPU-native general-ish sparse format
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class DIA:
    """Diagonal storage: data[d, i] = A[i, i + offsets[d]].

    SpMV is a sum of elementwise products with *shifted* x — no gathers, no
    index arrays in the inner loop: the layout a TPU wants for banded
    matrices.  FEM/stencil matrices are naturally banded; arbitrary sparse
    matrices become banded after RCM reordering (utils/native.py `rcm`).
    Offsets are static (part of the pytree aux data).

    backend: "xla" (default; shifted adds, 116 Gnnz/s on v5e) or
    "pallas" (the 2D-tiled kernel in ops/pallas/spmv.py, 154-165 Gnnz/s
    — r4 chip captures at 262k rows).  Selectable at runtime via
    `-mat_dia_backend` (amg_pc plumbs it into every level operator).
    """

    data: Any  # (ndiag, n)
    offsets: tuple  # static ints
    shape: tuple
    backend: str = "xla"  # static

    @property
    def nnz(self):
        return self.data.size

    def todense(self):
        m, n = self.shape
        out = jnp.zeros((m, n), self.data.dtype)
        i = jnp.arange(m)
        for d, off in enumerate(self.offsets):
            valid = (i + off >= 0) & (i + off < n)
            out = out.at[i, jnp.clip(i + off, 0, n - 1)].add(
                jnp.where(valid, self.data[d], 0.0)
            )
        return out

    def matvec(self, x):
        return dia_matvec(self, x)

    def matmat(self, X):
        return dia_matmat(self, X)

    def __call__(self, x):
        return self.matvec(x)

    def diagonal(self):
        if 0 in self.offsets:
            return self.data[self.offsets.index(0)]
        return jnp.zeros((self.shape[0],), self.data.dtype)


_pytree_dataclass(DIA, ("data",), ("offsets", "shape", "backend"))


def csr_to_dia(csr: CSR, rcm_reorder=False):
    """Host-side CSR -> DIA conversion; optionally RCM-permutes first to
    minimize bandwidth (returns (dia, perm) — perm is None without RCM).

    A^(perm)[i,j] = A[perm[i], perm[j]]; solves of the permuted system
    relate by x = x_perm[inv_perm].

    Note: use RCM only for genuinely unstructured patterns — on matrices
    from structured grids the natural ordering is already optimally banded
    and RCM *increases* the number of distinct diagonals (measured 21 -> 103
    on a 13x13 grid operator).
    """
    a = csr_to_scipy(csr)
    perm = None
    if rcm_reorder:
        try:
            from saddle_point_petsc_tpu.utils import native

            perm = native.rcm(a.indptr, a.indices, a.shape[0])
        except Exception:
            from scipy.sparse.csgraph import reverse_cuthill_mckee

            perm = reverse_cuthill_mckee(a, symmetric_mode=True)
        a = a[perm][:, perm].tocsr()
    d = a.todia()
    offsets = tuple(int(o) for o in d.offsets)
    n = a.shape[0]
    # scipy dia stores data[d, j] = A[j - off, j] (column-indexed);
    # convert to row-indexed data[d, i] = A[i, i + off]
    data = np.zeros((len(offsets), n), d.data.dtype)
    for k, off in enumerate(offsets):
        if off >= 0:
            data[k, : n - off] = d.data[k, off:]
        else:
            data[k, -off:] = d.data[k, : n + off]
    return DIA(jnp.asarray(data), offsets, a.shape), perm


def dia_matvec(dia: DIA, x):
    """y = A @ x: shifted elementwise products (XLA) or the 2D-tiled
    Pallas kernel, per dia.backend."""
    if dia.backend == "pallas":
        from saddle_point_petsc_tpu.ops.pallas.spmv import (
            dia_spmv_pallas_2d,
        )
        import jax as _jax

        return dia_spmv_pallas_2d(
            dia.data, x, dia.offsets,
            interpret=_jax.default_backend() != "tpu",
        )
    n = dia.shape[0]
    y = jnp.zeros_like(x)
    for k, off in enumerate(dia.offsets):
        if off == 0:
            y = y + dia.data[k] * x
        elif off > 0:
            y = y.at[: n - off].add(dia.data[k, : n - off] * x[off:])
        else:
            y = y.at[-off:].add(dia.data[k, -off:] * x[: n + off])
    return y


# ---------------------------------------------------------------------------
# Block-DIA: BSR blocks stored by block-diagonal — the TPU-native fast
# path for banded block matrices (dof-interleaved FEM operators).  The
# gather-based bsr_matvec measured 0.015 Gnnz/s on v5e vs 110+ for
# shift-only layouts; BDIA keeps the 2x2 block semantics (MATBAIJ class,
# BASELINE config 3 "BSR blocks") while the matvec is per-block-offset
# shifted einsums with zero gathers.
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class BDIA:
    """Block-diagonal storage: data[k, :, :, i] = block A[i, i+offsets[k]]
    (block indices, row-indexed like DIA).

    data: (nblockdiag, b, b, mb) — the block-row axis is LAST so it
    rides the 128-lane dimension (a (mb, b, b) layout puts the size-b
    block dims on the lanes: measured 0.97 Gnnz/s on v5e vs 100+ for
    this dof-major layout, the same lesson as the stencil planes).
    offsets: static tuple of BLOCK offsets; shape: scalar (m, n),
    m = mb * b.
    """

    data: Any  # (ndiag, b, b, mb)
    offsets: tuple  # static block offsets
    shape: tuple  # scalar shape
    block: int = 2
    # static (k, c, d) triples with a structurally nonzero band: the
    # matvec loops over exactly these, each a 1D shifted multiply-add
    # (empty tuple = treat every triple as active)
    active: tuple = ()
    # "xla" (b^2 scalar-banded 1D chains) or "pallas" (2D row-shift +
    # lane-rotate block kernel, ops/pallas/spmv.py bdia_spmv_pallas_2d
    # — shares each rolled x window across the block row, closing the
    # ~1.6x block tax of the XLA chains).  -mat_bdia_backend selects.
    backend: str = "xla"  # static

    @property
    def nnz(self):
        return self.data.size

    def todense(self):
        m, n = self.shape
        b = self.block
        mb = m // b
        out = jnp.zeros((mb, n // b, b, b), self.data.dtype)
        i = jnp.arange(mb)
        for k, off in enumerate(self.offsets):
            valid = (i + off >= 0) & (i + off < n // b)
            blk = jnp.moveaxis(self.data[k], -1, 0)  # (mb, b, b)
            out = out.at[i, jnp.clip(i + off, 0, n // b - 1)].add(
                jnp.where(valid[:, None, None], blk, 0.0)
            )
        return out.transpose(0, 2, 1, 3).reshape(m, n)

    def matvec(self, x):
        return bdia_matvec(self, x)

    def matmat(self, X):
        return bdia_matmat(self, X)

    def __call__(self, x):
        return self.matvec(x)

    def diagonal(self):
        b = self.block
        if 0 in self.offsets:
            blk = self.data[self.offsets.index(0)]  # (b, b, mb)
            return jnp.einsum("cci->ic", blk).reshape(-1)
        return jnp.zeros((self.shape[0],), self.data.dtype)


_pytree_dataclass(
    BDIA, ("data",), ("offsets", "shape", "block", "active", "backend")
)


def bsr_to_bdia(bsr: BSR, max_diag_blowup=4.0, max_diags=256) -> BDIA:
    """Host-side BSR -> block-DIA (setup time).  Raises ValueError when
    the block-band structure would blow storage past `max_diag_blowup` x
    the block nnz (RCM-reorder first for irregular patterns)."""
    indptr = np.asarray(bsr.indptr)
    cols = np.asarray(bsr.cols)
    vals = np.asarray(bsr.vals)
    mb = bsr.shape[0] // bsr.block
    rows = np.repeat(np.arange(mb), np.diff(indptr))
    live = cols[: len(rows)] >= 0
    r, c, v = rows[live], cols[: len(rows)][live], vals[: len(rows)][live]
    offs = np.unique(c.astype(np.int64) - r)
    if len(offs) > max_diags or len(offs) * mb > max_diag_blowup * max(
        len(r), 1
    ):
        raise ValueError(
            f"bsr_to_bdia: {len(offs)} block bands x {mb} block rows "
            f"exceeds {max_diag_blowup}x the block nnz ({len(r)})"
        )
    b = bsr.block
    data = np.zeros((len(offs), b, b, mb), vals.dtype)
    d_idx = np.searchsorted(offs, c.astype(np.int64) - r)
    data[d_idx, :, :, r] = v
    active = tuple(
        (int(k), int(cc), int(dd))
        for k in range(len(offs))
        for cc in range(b)
        for dd in range(b)
        if np.any(data[k, cc, dd] != 0)
    )
    return BDIA(
        jnp.asarray(data),
        tuple(int(o) for o in offs),
        bsr.shape,
        b,
        active,
    )


def bdia_matvec_dofmajor(bdia: BDIA, xb):
    """y = A @ x on a dof-major (b, mb) vector (the TPU-fast layout:
    block-row axis on the lanes).

    A block-banded matrix in dof-major form is exactly a b x b grid of
    SCALAR banded matrices: y_c = sum_d A^(cd) x_d, each band a 1D
    shifted multiply-add (the 116 Gnnz/s scalar-DIA pattern).  The loop
    runs over the static `active` (band, c, d) triples only; everything
    is 1D — no einsum (a batched (mb, 2, 2) dot_general pads
    catastrophically on the MXU: 0.97 Gnnz/s captured), no gathers, no
    2D row-slice relayouts (5.1 Gnnz/s captured for that variant).

    backend="pallas" routes through the 2D block kernel
    (ops/pallas/spmv.py bdia_spmv_pallas_2d)."""
    b = bdia.block
    mb = xb.shape[1]
    active = bdia.active or tuple(
        (k, c, d)
        for k in range(len(bdia.offsets))
        for c in range(b)
        for d in range(b)
    )
    if bdia.backend == "pallas":
        import jax as _jax

        from saddle_point_petsc_tpu.ops.pallas.spmv import (
            bdia_spmv_pallas_2d,
        )

        return bdia_spmv_pallas_2d(
            bdia.data, xb, bdia.offsets, active,
            interpret=_jax.default_backend() != "tpu",
        )
    ys = [jnp.zeros((mb,), xb.dtype) for _ in range(b)]
    for k, c, d in active:
        off = bdia.offsets[k]
        w = bdia.data[k, c, d]  # (mb,) band
        xd = xb[d]
        if off == 0:
            ys[c] = ys[c] + w * xd
        elif off > 0:
            ys[c] = ys[c].at[: mb - off].add(w[: mb - off] * xd[off:])
        else:
            ys[c] = ys[c].at[-off:].add(w[-off:] * xd[: mb + off])
    return jnp.stack(ys)


def bdia_matvec(bdia: BDIA, x):
    """y = A @ x for flat dof-interleaved x: transposes to dof-major,
    applies bdia_matvec_dofmajor, transposes back.  For hot loops keep
    vectors dof-major and call bdia_matvec_dofmajor directly — the two
    (mb, b) transposes here are pure layout cost."""
    b = bdia.block
    mb = bdia.shape[0] // b
    xb = x.reshape(mb, b).T  # dof-major (b, mb)
    return bdia_matvec_dofmajor(bdia, xb).T.reshape(-1)


def bdia_matmat(bdia: BDIA, X):
    """Y = A @ X for dense X (n, k): shifted block products, dof-major."""
    b = bdia.block
    mb = bdia.shape[0] // b
    Xb = jnp.moveaxis(X.reshape(mb, b, X.shape[1]), 0, -1)  # (b, k, mb)
    Y = jnp.zeros_like(Xb)
    for k, off in enumerate(bdia.offsets):
        blk = bdia.data[k]  # (b, b, mb)
        if off == 0:
            Y = Y + jnp.einsum("cdi,dki->cki", blk, Xb)
        elif off > 0:
            Y = Y.at[:, :, : mb - off].add(
                jnp.einsum(
                    "cdi,dki->cki",
                    blk[:, :, : mb - off],
                    Xb[:, :, off:],
                )
            )
        else:
            Y = Y.at[:, :, -off:].add(
                jnp.einsum(
                    "cdi,dki->cki",
                    blk[:, :, -off:],
                    Xb[:, :, : mb + off],
                )
            )
    return jnp.moveaxis(Y, -1, 0).reshape(bdia.shape[0], -1)
