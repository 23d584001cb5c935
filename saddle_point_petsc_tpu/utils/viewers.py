"""Flag-gated object viewers (PETSc {Mat,Vec}ViewFromOptions subset).

The reference exposes -A_mat_view, -f_vec_view and -solution_view
(/root/reference/src/SaddlePointProblem.c:20,62-63).  We reproduce the
contract: when the flag is present in the options DB, dump the object —
ASCII to stdout by default, or `:path.npz` / `:path.txt` style targets.

Large sparse operators are NEVER densified: above `DENSE_LIMIT` rows a
StencilOperator/CSR is dumped in coordinate (row, col, value) form —
O(nnz) memory instead of the O(n^2) materialization that would OOM at the
grid sizes this framework targets (e.g. 1024^2 nodes = 2M rows).
"""
from __future__ import annotations

import sys

import numpy as np

# above this many rows, sparse operators are viewed as COO triplets
DENSE_LIMIT = 16384


def _resolve_target(value):
    if value in ("", "ascii", "stdout"):
        return None, "ascii"
    if ":" in value:
        path, fmt = value.rsplit(":", 1)
        return path, fmt
    return value, "txt"


def view_from_options(obj, opts, flag, name=""):
    """Dump `obj` if `flag` is present.  obj: array/field, CSR, or stencil."""
    if not opts.has(flag):
        return False
    target, fmt = _resolve_target(opts.get_str(flag, ""))
    kind, payload = _to_view(obj)
    name = name or flag
    if target is None:
        _print_view(kind, payload, name, sys.stdout)
    elif fmt == "npz":
        if kind == "coo":
            np.savez(target, **{f"{name}_{k}": v for k, v in payload.items()})
        else:
            np.savez(target, **{name or "data": payload})
    else:
        with open(target, "w") as f:
            _print_view(kind, payload, name, f)
    return True


def _to_view(obj):
    """Lower `obj` to ("dense", ndarray) or ("coo", dict) for display.

    Sparse operators larger than DENSE_LIMIT rows keep their sparse
    structure (COO triplets) — a 2M-row stencil operator views fine.
    """
    from saddle_point_petsc_tpu.ops.sparse import CSR
    from saddle_point_petsc_tpu.ops.stencil import StencilOperator

    if isinstance(obj, StencilOperator):
        from saddle_point_petsc_tpu.ops.sparse import coo_to_csr
        from saddle_point_petsc_tpu.ops.stencil import stencil_to_coo

        if obj.n <= DENSE_LIMIT:
            return "dense", np.asarray(
                coo_to_csr(stencil_to_coo(obj.W)).todense()
            )
        coo = stencil_to_coo(obj.W)
        return "coo", _coo_payload(
            np.asarray(coo.rows), np.asarray(coo.cols),
            np.asarray(coo.vals), (obj.n, obj.n),
        )
    if isinstance(obj, CSR):
        if obj.shape[0] <= DENSE_LIMIT:
            return "dense", np.asarray(obj.todense())
        indptr = np.asarray(obj.indptr)
        rows = np.repeat(
            np.arange(obj.shape[0]), np.diff(indptr).astype(np.int64)
        )
        return "coo", _coo_payload(
            rows, np.asarray(obj.indices), np.asarray(obj.data), obj.shape
        )
    return "dense", np.asarray(obj)


def _coo_payload(row, col, data, shape):
    # drop padding (row < 0) and explicit zeros (stencil planes store the
    # full 3x3x2x2 box even where entries vanish, e.g. outside the grid)
    keep = (data != 0) & (row >= 0)
    return {
        "row": row[keep],
        "col": col[keep],
        "data": data[keep],
        "shape": np.asarray(shape),
    }


def _print_view(kind, payload, name, file):
    if kind == "dense":
        print(f"{name} = [{payload.shape}]", file=file)
        with np.printoptions(precision=6, suppress=False, threshold=10000):
            print(payload, file=file)
        return
    shape = tuple(payload["shape"])
    nnz = payload["data"].shape[0]
    print(f"{name} = sparse {shape[0]}x{shape[1]}, nnz={nnz}", file=file)
    # PETSc-ish "row (col, value) ..." lines, truncated for stdout sanity
    limit = 10000
    row, col, data = payload["row"], payload["col"], payload["data"]
    order = np.lexsort((col, row))
    shown = order[:limit]
    cur = -1
    parts = []
    for k in shown:
        if row[k] != cur:
            if parts:
                print(" ".join(parts), file=file)
            cur = int(row[k])
            parts = [f"row {cur}:"]
        parts.append(f"({int(col[k])}, {data[k]:.6g})")
    if parts:
        print(" ".join(parts), file=file)
    if nnz > limit:
        print(f"... ({nnz - limit} more entries; use :path.npz for all)",
              file=file)
