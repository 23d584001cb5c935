"""Row-partitioned distributed general sparse matrix (MATMPIAIJ).

PETSc's MatMPIAIJ stores each rank's rows as two local blocks — the
"diagonal" block (columns owned by the rank) and the "off-diagonal" block
(everything else) — plus a VecScatter that ships exactly the ghost entries
each MatMult needs (the implicit scatter inside every KSPSolve MatMult,
ref /root/reference/src/SaddlePointProblem.c:70; assembly-time
stash-and-ship, ref /root/reference/src/Discretization.c:165,168-169).

`DistAIJ` is the TPU-native equivalent:

- rows block-partitioned over a 1D mesh axis; both blocks stored per shard
  in fixed-width ELL (dense gather + row reduction: static shapes, no
  indirect scatter, VPU-friendly);
- the diag block carries LOCAL column ids, the offdiag block indexes a
  compact GHOST buffer;
- the VecScatter is a precomputed send plan realized as ONE
  `lax.all_to_all` of a (ndev, max_send) buffer — per-device communication
  volume is O(ghost entries), independent of the global dimension.  (The
  round-1 DistELL all_gathered the entire vector every matvec — O(n)
  traffic and memory per device; disqualifying at 10M rows.)
- the diag-block SpMV depends only on local data, so XLA overlaps it with
  the all_to_all (interior-before-halo, BASELINE.md config 4).

Assembly parity: `exchange_triplets` routes COO triplets to their row
owners via bucketed all_to_all entirely on device (MatSetValuesStencil
ADD_VALUES stash-and-ship semantics); `dist_aij_from_coo` composes it with
the host-side scatter-plan build (a one-time setup step — PETSc builds its
VecScatter plans on the host too).

For operators with structured 2D-grid locality, parallel/dist.py's stencil
path remains the fast path; DistAIJ is the general/irregular-coupling case.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

SHARD = "shard"


def make_mesh_1d(ndev=None, devices=None) -> Mesh:
    if devices is None:
        devices = jax.devices()
    if ndev is None:
        ndev = len(devices)
    return Mesh(np.asarray(devices[:ndev]), (SHARD,))


def _put_sharded(arr, sharding):
    """Place a host array onto a (possibly cross-process) sharding.

    device_put of a host array works only when every shard is locally
    addressable; make_array_from_callback covers single- AND multi-
    process runs (each process materializes only its own shards — the
    pattern the multihost VTK/ILU paths already use)."""
    arr = np.asarray(arr)
    return jax.make_array_from_callback(
        arr.shape, sharding, lambda idx: arr[idx]
    )


def _device_get_global(x):
    """Fetch a (possibly cross-process) sharded array to host, whole."""
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        return np.asarray(
            multihost_utils.process_allgather(x, tiled=True)
        )
    return np.asarray(jax.device_get(x))


def _ell_rowsum(cols, vals, vec):
    """y_i = sum_k vals[i,k] * vec[cols[i,k]]  (cols<0 = padding)."""
    valid = cols >= 0
    c = jnp.where(valid, cols, 0)
    v = jnp.where(valid, vals, 0.0)
    return jnp.sum(v * vec[c], axis=1)


def _dia_local_matvec(data, x, offsets):
    """Per-shard banded SpMV: y_i = sum_k data[k,i] * x[i+off_k].

    Shift-only (static slices, zero gathers) — the layout TPUs want: the
    ELL gather path measured 0.13 Gnnz/s on v5e against 110 Gnnz/s for
    the same operator in DIA (BENCH r3 aij_tpu_*; VERDICT r3 missing #1).
    """
    n = x.shape[0]
    y = jnp.zeros_like(x)
    for k, off in enumerate(offsets):
        if off == 0:
            y = y + data[k] * x
        elif off > 0:
            y = y.at[: n - off].add(data[k, : n - off] * x[off:])
        else:
            y = y.at[-off:].add(data[k, -off:] * x[: n + off])
    return y


def _dia_local_matmat(data, X, offsets):
    """Banded SpMM sibling of _dia_local_matvec (X: (n_loc, k))."""
    n = X.shape[0]
    Y = jnp.zeros_like(X)
    for k, off in enumerate(offsets):
        if off == 0:
            Y = Y + data[k][:, None] * X
        elif off > 0:
            Y = Y.at[: n - off].add(data[k, : n - off, None] * X[off:])
        else:
            Y = Y.at[-off:].add(data[k, -off:, None] * X[: n + off])
    return Y


@dataclasses.dataclass(frozen=True)
class DistAIJ:
    """MATMPIAIJ-style sharded sparse matrix over a 1D `shard` mesh axis.

    diag_cols/diag_vals: (n_pad, kd) — local-block ELL, LOCAL column ids
    off_cols/off_vals:   (n_pad, ko) — offdiag ELL, ids into the ghost
                         buffer layout (src_shard * max_send + slot)
    send_idx:            (ndev, ndev, max_send) int32 — send_idx[s, d, t]
                         is the LOCAL index on shard s of the t-th vector
                         entry shard s ships to shard d (-? padding sends
                         slot 0, never referenced by any off_cols)
    All row-dim arrays are sharded P(SHARD, ...); -1 = ELL padding.
    """

    diag_cols: Any
    diag_vals: Any
    off_cols: Any
    off_vals: Any
    send_idx: Any
    shape: tuple  # true (m, n)
    n_pad: int
    mesh: Mesh
    # Optional banded fast path for the diag blocks: dia_data[k, i] is
    # the band `dia_offsets[k]` entry of LOCAL row i's diag block (the
    # union of every shard's band set; absent bands hold zeros).  When
    # present, matvec/matmat run the local block as shift-only DIA
    # instead of ELL gathers — see dist_aij_to_dia.
    dia_data: Any = None  # (ndiag, n_pad), sharded P(None, SHARD)
    dia_offsets: tuple = ()  # static
    # Rectangular support (MatCreateAIJ with m != n — e.g. AMG transfer
    # operators): rows partitioned to n_pad, columns to n_pad_c.  None =
    # square (n_pad_c == n_pad), the common operator case.
    n_pad_col: Any = None  # int | None (static)

    @property
    def ndev(self):
        return self.mesh.devices.size

    @property
    def n_loc(self):
        return self.n_pad // self.ndev

    @property
    def n_pad_c(self):
        return self.n_pad if self.n_pad_col is None else self.n_pad_col

    @property
    def n_loc_c(self):
        return self.n_pad_c // self.ndev

    @property
    def max_send(self):
        return self.send_idx.shape[-1]

    @property
    def nnz(self):
        """Stored entries (ELL slots incl. padding) — throughput/report
        accounting, same convention as the other containers."""
        return self.diag_cols.size + self.off_cols.size

    @property
    def ghost_count(self):
        """Per-device ghost-buffer length = comm volume per matvec (in
        elements).  Independent of the global n — the scaling invariant
        the round-1 all_gather design violated."""
        return self.ndev * self.max_send

    def matvec(self, x):
        """y = A @ x for x of length n_pad, sharded over SHARD."""
        if self.dia_data is not None:
            offs = self.dia_offsets

            def local_dia(dd, oc, ov, sidx, xl):
                buf = xl[sidx[0]]  # (ndev, max_send)
                ghost = lax.all_to_all(
                    buf, SHARD, split_axis=0, concat_axis=0
                ).reshape(-1)
                # shift-only banded local block; overlaps the all_to_all
                yd = _dia_local_matvec(dd, xl, offs)
                return yd + _ell_rowsum(oc, ov, ghost)

            fn = jax.shard_map(
                local_dia,
                mesh=self.mesh,
                in_specs=(
                    P(None, SHARD),
                    P(SHARD, None),
                    P(SHARD, None),
                    P(SHARD, None, None),
                    P(SHARD),
                ),
                out_specs=P(SHARD),
            )
            return fn(
                self.dia_data, self.off_cols, self.off_vals,
                self.send_idx, x,
            )

        def local(dc, dv, oc, ov, sidx, xl):
            # ghost exchange: ship exactly the precomputed entries
            buf = xl[sidx[0]]  # (ndev, max_send)
            ghost = lax.all_to_all(
                buf, SHARD, split_axis=0, concat_axis=0
            ).reshape(-1)
            # local (diag-block) SpMV depends only on xl -> XLA overlaps
            # it with the all_to_all
            yd = _ell_rowsum(dc, dv, xl)
            return yd + _ell_rowsum(oc, ov, ghost)

        fn = jax.shard_map(
            local,
            mesh=self.mesh,
            in_specs=(
                P(SHARD, None),
                P(SHARD, None),
                P(SHARD, None),
                P(SHARD, None),
                P(SHARD, None, None),
                P(SHARD),
            ),
            out_specs=P(SHARD),
        )
        return fn(
            self.diag_cols,
            self.diag_vals,
            self.off_cols,
            self.off_vals,
            self.send_idx,
            x,
        )

    def matmat(self, X):
        """Y = A @ X for X of shape (n_pad, k), row-sharded over SHARD.

        One ghost exchange amortized over all k right-hand sides — the
        distributed SpMM the north star pairs with SpMV."""
        if self.dia_data is not None:
            offs = self.dia_offsets

            def local_dia(dd, oc, ov, sidx, Xl):
                buf = Xl[sidx[0]]  # (ndev, max_send, k)
                ghost = lax.all_to_all(
                    buf, SHARD, split_axis=0, concat_axis=0
                ).reshape(-1, Xl.shape[1])
                Yd = _dia_local_matmat(dd, Xl, offs)
                valid_o = oc >= 0
                Yo = jnp.sum(
                    jnp.where(valid_o, ov, 0.0)[:, :, None]
                    * ghost[jnp.where(valid_o, oc, 0)],
                    axis=1,
                )
                return Yd + Yo

            fn = jax.shard_map(
                local_dia,
                mesh=self.mesh,
                in_specs=(
                    P(None, SHARD),
                    P(SHARD, None),
                    P(SHARD, None),
                    P(SHARD, None, None),
                    P(SHARD, None),
                ),
                out_specs=P(SHARD, None),
            )
            return fn(
                self.dia_data, self.off_cols, self.off_vals,
                self.send_idx, X,
            )

        def local(dc, dv, oc, ov, sidx, Xl):
            buf = Xl[sidx[0]]  # (ndev, max_send, k)
            ghost = lax.all_to_all(buf, SHARD, split_axis=0, concat_axis=0)
            ghost = ghost.reshape(-1, Xl.shape[1])
            valid = dc >= 0
            yd = jnp.sum(
                jnp.where(valid, dv, 0.0)[:, :, None]
                * Xl[jnp.where(valid, dc, 0)],
                axis=1,
            )
            valid_o = oc >= 0
            yo = jnp.sum(
                jnp.where(valid_o, ov, 0.0)[:, :, None]
                * ghost[jnp.where(valid_o, oc, 0)],
                axis=1,
            )
            return yd + yo

        fn = jax.shard_map(
            local,
            mesh=self.mesh,
            in_specs=(
                P(SHARD, None),
                P(SHARD, None),
                P(SHARD, None),
                P(SHARD, None),
                P(SHARD, None, None),
                P(SHARD, None),
            ),
            out_specs=P(SHARD, None),
        )
        return fn(
            self.diag_cols,
            self.diag_vals,
            self.off_cols,
            self.off_vals,
            self.send_idx,
            X,
        )

    def __call__(self, x):
        return self.matvec(x)

    def diagonal(self):
        """diag(A): the diag-block entry whose local col == local row.
        Pure elementwise on the sharded arrays (no comm)."""
        if self.n_pad_col is not None:
            raise ValueError("diagonal(): square operators only")
        rloc = (jnp.arange(self.n_pad, dtype=jnp.int32) % self.n_loc)[:, None]
        isdiag = self.diag_cols == rloc
        return jnp.sum(jnp.where(isdiag, self.diag_vals, 0.0), axis=1)

    def to_scipy_rows(self, s):
        """Reconstruct ONLY shard s's row block as a (n_loc, n_pad_c)
        scipy CSR — O(local nnz) host memory.  The building block of the
        streaming AMG setup (each host touches its own shards' rows, as
        PETSc's parallel PCSetUp does)."""
        import scipy.sparse as sps

        n_loc, n_loc_c, ndev = self.n_loc, self.n_loc_c, self.ndev
        sl = slice(s * n_loc, (s + 1) * n_loc)
        dc = _device_get_global(self.diag_cols[sl])
        dv = _device_get_global(self.diag_vals[sl])
        oc = _device_get_global(self.off_cols[sl])
        ov = _device_get_global(self.off_vals[sl])
        sidx = _device_get_global(self.send_idx)
        rows, cols, vals = [], [], []
        ri, ki = np.nonzero(dc >= 0)
        rows.append(ri)
        cols.append(dc[ri, ki].astype(np.int64) + s * n_loc_c)
        vals.append(dv[ri, ki])
        gcols = (
            np.arange(ndev, dtype=np.int64)[:, None] * n_loc_c
            + sidx[:, s, :]
        ).reshape(-1)
        ri, ki = np.nonzero(oc >= 0)
        rows.append(ri)
        cols.append(gcols[oc[ri, ki]])
        vals.append(ov[ri, ki])
        return sps.coo_matrix(
            (
                np.concatenate(vals),
                (np.concatenate(rows), np.concatenate(cols)),
            ),
            shape=(n_loc, self.n_pad_c),
        ).tocsr()

    def to_scipy(self):
        """Reconstruct the global (true-size) matrix on host.

        Inverts the diag/offdiag + scatter-plan storage: ghost slot
        s*max_send + t on shard d refers to global column
        s*n_loc + send_idx[s, d, t].  Setup-time utility (MatView parity,
        AMG setup); never on the solve path."""
        import scipy.sparse as sps

        dc = _device_get_global(self.diag_cols)
        dv = _device_get_global(self.diag_vals)
        oc = _device_get_global(self.off_cols)
        ov = _device_get_global(self.off_vals)
        sidx = _device_get_global(self.send_idx)
        ndev, n_loc, n_loc_c = self.ndev, self.n_loc, self.n_loc_c
        rows, cols, vals = [], [], []
        for d in range(ndev):
            sl = slice(d * n_loc, (d + 1) * n_loc)
            c, v = dc[sl], dv[sl]
            ri, ki = np.nonzero(c >= 0)
            rows.append(ri + d * n_loc)
            cols.append(c[ri, ki].astype(np.int64) + d * n_loc_c)
            vals.append(v[ri, ki])
            gcols = (
                np.arange(ndev, dtype=np.int64)[:, None] * n_loc_c
                + sidx[:, d, :]
            ).reshape(-1)
            c, v = oc[sl], ov[sl]
            ri, ki = np.nonzero(c >= 0)
            rows.append(ri + d * n_loc)
            cols.append(gcols[c[ri, ki]])
            vals.append(v[ri, ki])
        m, n = self.shape
        a = sps.coo_matrix(
            (
                np.concatenate(vals),
                (np.concatenate(rows), np.concatenate(cols)),
            ),
            shape=(self.n_pad, self.n_pad_c),
        ).tocsr()
        return a[:m, :n]

    def diag_block_operator(self):
        """The block-diagonal part: offdiag dropped -> shards decouple.

        Its matvec needs NO communication (the ghost exchange ships
        zero-referenced slots only); this is the operator behind
        per-shard block-Jacobi (PETSc PCBJACOBI, one block per rank)."""
        return dataclasses.replace(
            self, off_vals=jnp.zeros_like(self.off_vals)
        )


jax.tree_util.register_pytree_node(
    DistAIJ,
    lambda o: (
        (
            o.diag_cols, o.diag_vals, o.off_cols, o.off_vals,
            o.send_idx, o.dia_data,
        ),
        (o.shape, o.n_pad, o.mesh, o.dia_offsets, o.n_pad_col),
    ),
    lambda m, d: DistAIJ(
        *d[:5], m[0], m[1], m[2],
        dia_data=d[5], dia_offsets=m[3], n_pad_col=m[4],
    ),
)


def _diag_band_layout(
    dc, dv, n_loc, n_pad, max_diag_blowup=4.0, max_diags=512
):
    """(ndiag, n_pad) band array + static offsets for the diag blocks
    (host numpy; raises ValueError on irregular band structures)."""
    r_all, k_all = np.nonzero(dc >= 0)
    loc_r = r_all % n_loc
    off_all = dc[r_all, k_all].astype(np.int64) - loc_r
    offs = np.unique(off_all)
    nnz_diag = len(r_all)
    if len(offs) > max_diags or len(offs) * n_pad > max_diag_blowup * max(
        nnz_diag, 1
    ):
        raise ValueError(
            f"dist_aij diag bands: {len(offs)} bands x {n_pad} rows "
            f"exceeds {max_diag_blowup}x the diag nnz ({nnz_diag}); "
            "RCM-reorder first (local_rcm_permutation) or keep ELL"
        )
    data = np.zeros((len(offs), n_pad), dv.dtype)
    data[np.searchsorted(offs, off_all), r_all] = dv[r_all, k_all]
    return data, tuple(int(o) for o in offs)


def dist_aij_to_dia(
    A: DistAIJ, max_diag_blowup=4.0, max_diags=512
) -> DistAIJ:
    """Attach a banded (DIA) fast path for the diag blocks of a DistAIJ.

    Host setup: each shard's diag block is scanned for its band set; the
    union of offsets becomes one static tuple (shard_map runs a single
    program over all shards), and the per-band values land in a
    (ndiag, n_pad) array sharded over its second axis.  matvec/matmat
    then run the local block shift-only — measured 110 Gnnz/s (DIA) vs
    0.13 (ELL gathers) on v5e for the same 262k-row operator
    (VERDICT r3 missing #1: MATMPIAIJ local blocks had no fast TPU path).

    Raises ValueError when the band structure would blow storage past
    `max_diag_blowup` x the diag-block nnz or `max_diags` bands — use
    `local_rcm_permutation` first for band-reducible irregular patterns.
    The ELL arrays are kept (diagonal(), ILU setup, to_scipy); only the
    matvec path switches.
    """
    if A.dia_data is not None:
        return A
    if A.n_pad_col is not None:
        raise ValueError("dist_aij_to_dia: square operators only")
    dc = _device_get_global(A.diag_cols)
    dv = _device_get_global(A.diag_vals)
    data, offs = _diag_band_layout(
        dc, dv, A.n_loc, A.n_pad, max_diag_blowup, max_diags
    )
    dia = _put_sharded(data, NamedSharding(A.mesh, P(None, SHARD)))
    return dataclasses.replace(A, dia_data=dia, dia_offsets=offs)


def local_rcm_permutation(a, ndev):
    """Per-shard symmetric RCM: a block-diagonal permutation that never
    moves a row across shard boundaries (row ownership is preserved), so
    each shard's diag block becomes banded for DIA storage.

    Returns `perm` with A_perm = A[perm][:, perm]; solve in permuted
    space and map back with x = x_perm[argsort(perm)] (PETSc's
    MatOrdering + KSPSolve-on-permuted-system pattern).
    """
    from scipy.sparse.csgraph import reverse_cuthill_mckee

    a = a.tocsr()
    m = a.shape[0]
    n_loc = -(-m // ndev)
    perm = np.arange(m, dtype=np.int64)
    for s in range(ndev):
        lo, hi = s * n_loc, min((s + 1) * n_loc, m)
        blk = a[lo:hi, lo:hi].tocsr()
        p = reverse_cuthill_mckee(blk, symmetric_mode=True)
        perm[lo:hi] = lo + p.astype(np.int64)
    return perm


def _ell_pack(rows, cols, vals, nrows, k, dtype):
    """Pack row-major-sorted triplets into (nrows, k) ELL arrays (host)."""
    out_c = np.full((nrows, k), -1, np.int32)
    out_v = np.zeros((nrows, k), dtype)
    if len(rows):
        cnt = np.bincount(rows, minlength=nrows)
        firsts = np.concatenate([[0], np.cumsum(cnt)[:-1]])
        pos = np.arange(len(rows)) - firsts[rows]
        out_c[rows, pos] = cols
        out_v[rows, pos] = vals
    return out_c, out_v


def dist_aij_from_scipy(a, mesh: Mesh, dtype=None, dia="auto"):
    """Partition a scipy sparse matrix into a DistAIJ (host setup phase).

    Builds the diag/offdiag split and the ghost scatter plan — the
    TPU-native VecScatter construction.  Rows are padded to a multiple of
    the device count with identity rows (harmless to Krylov with zero rhs
    entries).  Fully vectorized (numpy); no per-entry Python loops.

    dia: "auto" (default) attaches the banded diag-block fast path when
    the band structure keeps DIA storage within 2x the diag nnz (the
    production TPU path — see dist_aij_to_dia); "off" keeps pure ELL;
    "force" attaches it with the permissive 4x/512-band thresholds and
    raises if even those are exceeded.
    """
    import scipy.sparse as sp

    a = a.tocsr()
    a.sum_duplicates()
    a.sort_indices()
    m, n = a.shape
    ndev = int(mesh.devices.size)
    n_loc = -(-m // ndev)
    n_pad = n_loc * ndev
    n_loc_c = -(-n // ndev)
    n_pad_c = n_loc_c * ndev
    square = m == n
    dtype = np.dtype(dtype or a.dtype)

    # entry arrays (CSR row-major); square systems append identity
    # padding rows (harmless to Krylov with zero rhs entries), while a
    # rectangular operator (m != n, e.g. an AMG transfer) pads with
    # EMPTY rows — its padded output entries are exact zeros
    nnz = a.indptr[-1]
    rows = np.repeat(np.arange(m, dtype=np.int64), np.diff(a.indptr))
    cols = a.indices.astype(np.int64)
    vals = a.data.astype(dtype)
    if square and n_pad > m:
        pad_r = np.arange(m, n_pad, dtype=np.int64)
        rows = np.concatenate([rows, pad_r])
        cols = np.concatenate([cols, pad_r])
        vals = np.concatenate([vals, np.ones(n_pad - m, dtype)])

    owner_row = rows // n_loc
    owner_col = cols // n_loc_c
    isdiag = owner_col == owner_row

    # ---- diag block: LOCAL column ids ----
    kd = 1
    dr, dcg, dvv = rows[isdiag], cols[isdiag], vals[isdiag]
    if len(dr):
        kd = max(1, int(np.bincount(dr, minlength=n_pad).max()))
    diag_cols, diag_vals = _ell_pack(
        dr, (dcg % n_loc_c).astype(np.int32), dvv, n_pad, kd, dtype
    )

    # ---- ghost plan: unique (dest, col) needs, grouped by (src, dest) ----
    off = ~isdiag
    orow, ocol, oval = rows[off], cols[off], vals[off]
    if len(orow):
        comb = owner_row[off] * n_pad_c + ocol  # radix (dest, col)
        comb_pairs = np.unique(comb)  # sorted
        dest_p = comb_pairs // n_pad_c
        col_p = comb_pairs % n_pad_c
        src_p = col_p // n_loc_c
        # order within each (src, dest) group, columns ascending
        ordr = np.lexsort((col_p, dest_p, src_p))
        gkey = src_p[ordr] * ndev + dest_p[ordr]
        grp_cnt = np.bincount(gkey, minlength=ndev * ndev)
        max_send = max(1, int(grp_cnt.max()))
        grp_first = np.concatenate([[0], np.cumsum(grp_cnt)[:-1]])
        slot = np.arange(len(ordr)) - grp_first[gkey]
        ghost_of_pair = np.empty(len(ordr), np.int64)
        ghost_of_pair[ordr] = src_p[ordr] * max_send + slot
        send_idx = np.zeros((ndev, ndev, max_send), np.int32)
        send_idx[src_p[ordr], dest_p[ordr], slot] = (
            col_p[ordr] % n_loc_c
        ).astype(np.int32)
        # map each offdiag entry to its ghost-buffer index
        pos = np.searchsorted(comb_pairs, comb)
        gidx = ghost_of_pair[pos].astype(np.int32)
        ko = max(1, int(np.bincount(orow, minlength=n_pad).max()))
        off_cols, off_vals = _ell_pack(orow, gidx, oval, n_pad, ko, dtype)
    else:
        max_send = 1
        send_idx = np.zeros((ndev, ndev, 1), np.int32)
        off_cols = np.full((n_pad, 1), -1, np.int32)
        off_vals = np.zeros((n_pad, 1), dtype)

    # banded diag-block fast path, computed from the HOST arrays before
    # placement (multihost-safe: no device_get of remote shards needed)
    dia_data_np, dia_offs = None, ()
    if square and dia in ("auto", "force"):
        try:
            dia_data_np, dia_offs = _diag_band_layout(
                diag_cols, diag_vals, n_loc, n_pad,
                max_diag_blowup=2.0 if dia == "auto" else 4.0,
            )
        except ValueError:
            if dia == "force":
                raise
    row_shard = NamedSharding(mesh, P(SHARD, None))
    return DistAIJ(
        _put_sharded(diag_cols, row_shard),
        _put_sharded(diag_vals, row_shard),
        _put_sharded(off_cols, row_shard),
        _put_sharded(off_vals, row_shard),
        _put_sharded(
            send_idx, NamedSharding(mesh, P(SHARD, None, None))
        ),
        (m, n),
        n_pad,
        mesh,
        dia_data=(
            None
            if dia_data_np is None
            else _put_sharded(
                dia_data_np, NamedSharding(mesh, P(None, SHARD))
            )
        ),
        dia_offsets=dia_offs,
        n_pad_col=None if square else n_pad_c,
    )


def dist_aij_block_jacobi(A: DistAIJ, iters=8):
    """Per-shard block-Jacobi for DistAIJ: fixed Chebyshev iterations on
    the (communication-free) block-diagonal operator — linear + symmetric
    for symmetric A, valid under CG/MINRES.  The general-sparse sibling of
    parallel/dist.dist_block_jacobi (PETSc parallel-default bjacobi+ILU,
    ref /root/reference/src/SaddlePointProblem.c:67 SetFromOptions)."""
    from saddle_point_petsc_tpu.solvers import precond

    Ad = A.diag_block_operator()
    d = Ad.diagonal()
    inner = precond.JacobiPC(1.0 / jnp.where(d == 0, 1.0, d))
    tmpl = jnp.zeros((A.n_pad,), A.diag_vals.dtype)
    est = float(precond.estimate_lmax(Ad, M=inner, template=tmpl))
    return precond.chebyshev_pc(
        Ad, inner=inner, lmin=0.1 * 1.1 * est, lmax=1.1 * est, iters=iters
    )


def pad_vector(b, n_pad, mesh: Mesh):
    """Zero-pad a host/device vector to n_pad and shard it over the mesh."""
    b = np.asarray(b)
    out = np.zeros((n_pad,) + b.shape[1:], b.dtype)
    out[: b.shape[0]] = b
    spec = P(SHARD) if b.ndim == 1 else P(SHARD, None)
    return _put_sharded(out, NamedSharding(mesh, spec))


# ---------------------------------------------------------------------------
# Device-side distributed assembly: off-shard triplet exchange
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("mesh", "n_loc", "cap"))
def exchange_triplets(rows, cols, vals, mesh: Mesh, n_loc: int, cap: int):
    """Route COO triplets to the shard that owns their row (stash-and-ship,
    ref MatAssemblyBegin/End, /root/reference/src/Discretization.c:168-169).

    rows/cols/vals: (E,) entry-sharded P(SHARD); rows < 0 marks padding.
    cap: static per-(src,dst) bucket capacity.  Returns (rows, cols, vals,
    overflow) where the outputs are (ndev^2 * cap,) row-owner-sharded
    triplets (padding rows = -1) and `overflow` flags any shard that had
    more than `cap` triplets for one destination (entries were dropped —
    re-run with a larger cap; PETSc's stash similarly resizes).
    """
    ndev = mesh.devices.size

    def local(r, c, v):
        me = lax.axis_index(SHARD)
        dest = jnp.where(r >= 0, r // n_loc, me)  # padding stays local
        order = jnp.argsort(dest)
        ds, rs, cs, vs = dest[order], r[order], c[order], v[order]
        first = jnp.searchsorted(ds, jnp.arange(ndev))
        slot = jnp.arange(r.shape[0]) - first[ds]
        ok = slot < cap
        overflow = jnp.any(~ok & (rs >= 0))
        # out-of-range slot -> dropped by mode="drop" (never clobbers)
        slot = jnp.where(ok, slot, cap)
        br = (
            jnp.full((ndev, cap + 1), -1, rs.dtype)
            .at[ds, slot]
            .set(rs, mode="drop")[:, :cap]
        )
        bc = (
            jnp.zeros((ndev, cap + 1), cs.dtype)
            .at[ds, slot]
            .set(cs, mode="drop")[:, :cap]
        )
        bv = (
            jnp.zeros((ndev, cap + 1), vs.dtype)
            .at[ds, slot]
            .set(vs, mode="drop")[:, :cap]
        )
        ex = lambda b: lax.all_to_all(
            b, SHARD, split_axis=0, concat_axis=0
        ).reshape(-1)
        return ex(br), ex(bc), ex(bv), lax.psum(overflow, SHARD)

    fn = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(SHARD), P(SHARD), P(SHARD)),
        out_specs=(P(SHARD), P(SHARD), P(SHARD), P()),
    )
    return fn(rows, cols, vals)


def dist_aij_from_coo(rows, cols, vals, n, mesh: Mesh, cap=None, dtype=None):
    """Distributed assembly: device-side triplet exchange + host plan build.

    Triplets may live on any shard with duplicates (ADD_VALUES semantics).
    The row exchange runs on device via all_to_all; the one-time static
    scatter-plan construction runs on host (as PETSc's VecScatter setup
    does).
    """
    import scipy.sparse as sp

    ndev = int(mesh.devices.size)
    n_loc = -(-n // ndev)
    E = int(np.shape(rows)[0])
    if cap is None:
        cap = E  # always enough; callers with locality pass a tight cap
    r, c, v, overflow = exchange_triplets(
        jnp.asarray(rows), jnp.asarray(cols), jnp.asarray(vals),
        mesh, n_loc, int(cap),
    )
    if bool(overflow):
        raise ValueError(
            f"exchange_triplets overflow: bucket capacity {cap} too small"
        )
    r, c, v = np.asarray(r), np.asarray(c), np.asarray(v)
    keep = r >= 0
    a = sp.coo_matrix(
        (v[keep], (r[keep], c[keep])), shape=(n, n)
    ).tocsr()
    return dist_aij_from_scipy(a, mesh, dtype=dtype)


# ---------------------------------------------------------------------------
# Per-shard ILU(0) local solves (PETSc parallel-default bjacobi + ILU)
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class DistAIJILU0PC:
    """Block-Jacobi with per-shard ILU(0) local solves for DistAIJ.

    The factors of each shard's diag block are stored in fixed-width ELL
    sharded with the matrix rows; application is `sweeps` Jacobi sweeps
    per triangular factor — pure local compute under shard_map, zero
    collectives (the real PETSc parallel-default semantics, ref
    /root/reference/src/SaddlePointProblem.c:67, replacing the Chebyshev
    stand-in of dist_aij_block_jacobi)."""

    L_cols: Any  # (n_pad, kL) sharded
    L_vals: Any
    U_cols: Any  # (n_pad, kU) strictly upper
    U_vals: Any
    inv_diag: Any  # (n_pad,)
    mesh: Any  # static
    sweeps: int = 6  # static

    def __call__(self, r):
        def local(lc, lv, uc, uv, ivd, rl):
            y = rl
            for _ in range(self.sweeps):
                y = rl - _ell_rowsum(lc, lv, y)
            z = ivd * y
            for _ in range(self.sweeps):
                z = ivd * (y - _ell_rowsum(uc, uv, z))
            return z

        fn = jax.shard_map(
            local,
            mesh=self.mesh,
            in_specs=(
                P(SHARD, None), P(SHARD, None), P(SHARD, None),
                P(SHARD, None), P(SHARD), P(SHARD),
            ),
            out_specs=P(SHARD),
        )
        return fn(
            self.L_cols, self.L_vals, self.U_cols, self.U_vals,
            self.inv_diag, r,
        )


jax.tree_util.register_pytree_node(
    DistAIJILU0PC,
    lambda o: (
        (o.L_cols, o.L_vals, o.U_cols, o.U_vals, o.inv_diag),
        (o.mesh, o.sweeps),
    ),
    lambda m, d: DistAIJILU0PC(*d, *m),
)


def dist_aij_ilu0(A: DistAIJ, sweeps=6) -> DistAIJILU0PC:
    """Host setup: factorize every shard's diag block with the native
    ILU(0) kernel; ELL-pack the triangular factors and re-shard them."""
    import scipy.sparse as sps

    dc = _device_get_global(A.diag_cols)
    dv = _device_get_global(A.diag_vals).astype(np.float64)
    ndev, n_loc = A.ndev, A.n_loc
    parts = []
    for s in range(ndev):
        c = dc[s * n_loc : (s + 1) * n_loc]
        v = dv[s * n_loc : (s + 1) * n_loc]
        r_idx, k_idx = np.nonzero(c >= 0)
        a = sps.csr_matrix(
            (v[r_idx, k_idx], (r_idx, c[r_idx, k_idx])),
            shape=(n_loc, n_loc),
        )
        missing = np.nonzero(a.diagonal() == 0)[0]
        if len(missing):  # structurally missing/zero diag: identity rows
            a = a + sps.csr_matrix(
                (np.ones(len(missing)), (missing, missing)), shape=a.shape
            )
        a.sum_duplicates()
        a.sort_indices()
        data = a.data.astype(np.float64).copy()
        try:
            from saddle_point_petsc_tpu.utils import native

            data = native.ilu0(
                a.indptr.astype(np.int32), a.indices.astype(np.int32),
                data, n_loc,
            )
        except Exception:
            from saddle_point_petsc_tpu.solvers.precond import _ilu0_python

            data = _ilu0_python(
                a.indptr.astype(np.int64), a.indices, data, n_loc
            )
        f = sps.csr_matrix((data, a.indices, a.indptr), shape=a.shape)
        L = sps.tril(f, k=-1).tocsr()
        U = sps.triu(f, k=1).tocsr()
        d = f.diagonal()
        parts.append((L, U, 1.0 / np.where(d == 0, 1.0, d)))
    kL = max(1, max(int(np.diff(L.indptr).max(initial=0)) for L, _, _ in parts))
    kU = max(1, max(int(np.diff(U.indptr).max(initial=0)) for _, U, _ in parts))
    dtype = np.dtype(str(A.diag_vals.dtype))  # factorize f64, apply in A's

    def pack(mats, k):
        cs, vs = [], []
        for m in mats:
            rows = np.repeat(np.arange(n_loc), np.diff(m.indptr))
            c_, v_ = _ell_pack(rows, m.indices, m.data, n_loc, k, dtype)
            cs.append(c_)
            vs.append(v_)
        return np.concatenate(cs), np.concatenate(vs)

    Lc, Lv = pack([p[0] for p in parts], kL)
    Uc, Uv = pack([p[1] for p in parts], kU)
    ivd = np.concatenate([p[2] for p in parts]).astype(dtype)
    row_shard = NamedSharding(A.mesh, P(SHARD, None))
    vec_shard = NamedSharding(A.mesh, P(SHARD))
    return DistAIJILU0PC(
        _put_sharded(Lc, row_shard),
        _put_sharded(Lv, row_shard),
        _put_sharded(Uc, row_shard),
        _put_sharded(Uv, row_shard),
        _put_sharded(ivd, vec_shard),
        A.mesh,
        sweeps,
    )


# ---------------------------------------------------------------------------
# Double-float (compensated) SpMV: rtol 1e-8+ refinement on general sparse
# ---------------------------------------------------------------------------


def dist_aij_df_from_scipy(a64, mesh: Mesh):
    """Split an f64 scipy matrix into (DistAIJ hi, (diag_lo, off_vals_lo)).

    The reference gets f64 MATMPIAIJ for free from PetscScalar=double
    (/root/reference/src/SaddlePointProblem.c:70); on f64-less TPUs the
    equivalent is double-float storage: hi = f32 round of the values, lo
    the f32 remainder, ELL layouts bit-aligned (the layout depends only
    on the sparsity pattern, so two builds share it)."""
    a64 = a64.tocsr().astype(np.float64)
    hi = a64.copy()
    hi.data = a64.data.astype(np.float32).astype(np.float64)
    lo = a64.copy()
    lo.data = a64.data - hi.data  # exact f64 remainder, same pattern
    A = dist_aij_from_scipy(a64, mesh, dtype=np.float32)
    # lo is only read through the ELL arrays in dist_aij_matvec_df;
    # skip the DIA attach (the hi operator A keeps it for inner solves)
    Alo = dist_aij_from_scipy(lo, mesh, dtype=np.float32, dia="off")
    # padding rows get an identity 1.0 in every build; zero the lo copy
    # so padded df values are exactly (1, 0)
    m = a64.shape[0]
    if A.n_pad > m:
        rloc = (
            jnp.arange(A.n_pad, dtype=jnp.int32) % A.n_loc
        )[:, None]
        ispad = jnp.arange(A.n_pad)[:, None] >= m
        dl = jnp.where(ispad & (Alo.diag_cols == rloc), 0.0, Alo.diag_vals)
    else:
        dl = Alo.diag_vals
    return A, (dl, Alo.off_vals)


def dist_aij_matvec_df(A: DistAIJ, lo_vals, x_df):
    """Compensated y = A x with A and x double-float (DF of (n_pad,)
    sharded vectors).  One all_to_all ships hi and lo ghosts together;
    the rowsums accumulate in df arithmetic (~1e-14 relative) — the
    residual accuracy iterative refinement needs (solvers/refine.py)."""
    from saddle_point_petsc_tpu.ops import doublefloat as dfo

    diag_lo, off_lo = lo_vals

    def local(dc, dv, dvl, oc, ov, ovl, sidx, xh, xl):
        buf = jnp.stack([xh[sidx[0]], xl[sidx[0]]], axis=-1)
        ghost = lax.all_to_all(buf, SHARD, split_axis=0, concat_axis=0)
        gh = ghost[..., 0].reshape(-1)
        gl = ghost[..., 1].reshape(-1)

        def rowsum(cols, vh, vl, uh, ul, acc):
            valid = cols >= 0
            c = jnp.where(valid, cols, 0)
            vh = jnp.where(valid, vh, 0.0)
            vl = jnp.where(valid, vl, 0.0)
            for k in range(cols.shape[1]):
                w = dfo.DF(vh[:, k], vl[:, k])
                u = dfo.DF(uh[c[:, k]], ul[c[:, k]])
                acc = dfo.df_add(acc, dfo.df_mul(w, u))
            return acc

        z = jnp.zeros_like(xh)
        acc = rowsum(dc, dv, dvl, xh, xl, dfo.DF(z, z))
        acc = rowsum(oc, ov, ovl, gh, gl, acc)
        return acc.hi, acc.lo  # plain tuple: matches out_specs pytree

    fn = jax.shard_map(
        local,
        mesh=A.mesh,
        in_specs=(
            P(SHARD, None), P(SHARD, None), P(SHARD, None),
            P(SHARD, None), P(SHARD, None), P(SHARD, None),
            P(SHARD, None, None), P(SHARD), P(SHARD),
        ),
        out_specs=(P(SHARD), P(SHARD)),
    )
    from saddle_point_petsc_tpu.ops.doublefloat import DF

    hi, lo = fn(
        A.diag_cols, A.diag_vals, diag_lo, A.off_cols, A.off_vals,
        off_lo, A.send_idx, x_df.hi, x_df.lo,
    )
    return DF(hi, lo)
