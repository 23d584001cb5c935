"""Row-partitioned distributed general sparse matrix (MATMPIAIJ subset).

The structured-grid fast path lives in parallel/dist.py (stencil +
ppermute halos).  This module covers the *general* sparse case the
north star also demands (distributed CSR/BSR SpMV for arbitrary
patterns): rows are block-partitioned over a 1D device axis, each shard
stores its rows in fixed-width sliced-ELL form (TPU-friendly: dense
gather + row reduction, no indirect scatter), and the off-shard vector
entries arrive via all_gather over the shard axis.

PETSc analogy: MatMPIAIJ's diag/offdiag split + VecScatter becomes
ELL rows over a gathered vector.  For matrices with 2D-grid locality
prefer the stencil path; for irregular coupling (the general library
case) this is the robust default.  An `offdiag_width`-limited variant
that ppermutes only neighbor slices is a planned optimization.
"""
from __future__ import annotations

import dataclasses
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


@dataclasses.dataclass(frozen=True)
class DistELL:
    """Sharded fixed-width sparse rows.

    cols/vals: (n_pad, k) with the row dim sharded over the 1D mesh;
    col ids are GLOBAL (into the padded vector); -1 = padding.
    """

    cols: Any  # (n_pad, k) int32, sharded P(SHARD, None)
    vals: Any  # (n_pad, k)
    shape: tuple  # true (m, n)
    n_pad: int
    mesh: Mesh

    def matvec(self, x):
        """y = A @ x for x of length n_pad, sharded over SHARD."""

        def local(cols, vals, xl):
            xg = lax.all_gather(xl, SHARD, tiled=True)  # (n_pad,)
            valid = cols >= 0
            c = jnp.where(valid, cols, 0)
            v = jnp.where(valid, vals, 0.0)
            return jnp.sum(v * xg[c], axis=1)

        fn = jax.shard_map(
            local,
            mesh=self.mesh,
            in_specs=(P(SHARD, None), P(SHARD, None), P(SHARD)),
            out_specs=P(SHARD),
        )
        return fn(self.cols, self.vals, x)

    def matmat(self, X):
        """Y = A @ X for X of shape (n_pad, k), row-sharded over SHARD.

        The gathered vector block is reused across all k columns — the
        distributed SpMM the north star pairs with SpMV: one all_gather
        amortized over k right-hand sides.
        """

        def local(cols, vals, Xl):
            Xg = lax.all_gather(Xl, SHARD, tiled=True)  # (n_pad, k)
            valid = cols >= 0
            c = jnp.where(valid, cols, 0)
            v = jnp.where(valid, vals, 0.0)
            return jnp.sum(v[:, :, None] * Xg[c], axis=1)

        fn = jax.shard_map(
            local,
            mesh=self.mesh,
            in_specs=(P(SHARD, None), P(SHARD, None), P(SHARD, None)),
            out_specs=P(SHARD, None),
        )
        return fn(self.cols, self.vals, X)

    def __call__(self, x):
        return self.matvec(x)

    def diagonal(self):
        rows = jnp.arange(self.n_pad, dtype=jnp.int32)[:, None]
        isdiag = self.cols == rows
        d = jnp.sum(jnp.where(isdiag, self.vals, 0.0), axis=1)
        return jnp.where(rows[:, 0] < self.shape[0], d, 1.0)


jax.tree_util.register_pytree_node(
    DistELL,
    lambda o: ((o.cols, o.vals), (o.shape, o.n_pad, o.mesh)),
    lambda m, d: DistELL(*d, *m),
)


def dist_ell_from_scipy(a, mesh: Mesh, k=None, dtype=None):
    """Partition a scipy sparse matrix into a sharded DistELL (host setup).

    Pads rows to a common width k and the row count to a multiple of the
    device count; padded rows are identity (so Krylov on padded vectors
    with zero rhs entries is unaffected).
    """
    import scipy.sparse as sp

    a = a.tocsr()
    a.sort_indices()
    m, n = a.shape
    assert m == n, "square systems only for padded identity rows"
    ndev = mesh.devices.size
    n_pad = -(-m // ndev) * ndev
    if k is None:
        k = max(1, int(np.max(np.diff(a.indptr))) if m else 1)
    cols = np.full((n_pad, k), -1, np.int32)
    vals = np.zeros((n_pad, k), np.float64 if dtype is None else dtype)
    for i in range(m):
        lo, hi = a.indptr[i], a.indptr[i + 1]
        w = hi - lo
        assert w <= k, f"row {i} has {w} > k={k} entries"
        cols[i, :w] = a.indices[lo:hi]
        vals[i, :w] = a.data[lo:hi]
    for i in range(m, n_pad):  # identity padding
        cols[i, 0] = i
        vals[i, 0] = 1.0
    sharding = NamedSharding(mesh, P(SHARD, None))
    return DistELL(
        jax.device_put(jnp.asarray(cols), sharding),
        jax.device_put(jnp.asarray(vals), sharding),
        (m, n),
        n_pad,
        mesh,
    )


def pad_vector(b, n_pad, mesh: Mesh):
    """Zero-pad a host/device vector to n_pad and shard it over the mesh."""
    b = np.asarray(b)
    out = np.zeros((n_pad,), b.dtype)
    out[: b.shape[0]] = b
    return jax.device_put(jnp.asarray(out), NamedSharding(mesh, P(SHARD)))
