"""Flag-gated object viewers (PETSc {Mat,Vec}ViewFromOptions subset).

The reference exposes -A_mat_view, -f_vec_view and -solution_view
(/root/reference/src/SaddlePointProblem.c:20,62-63).  We reproduce the
contract: when the flag is present in the options DB, dump the object —
ASCII to stdout by default, or `:path.npz` / `:path.txt` style targets.
"""
from __future__ import annotations

import sys

import numpy as np


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
    arr = _to_array(obj)
    if target is None:
        _print_ascii(arr, name or flag, sys.stdout)
    elif fmt == "npz":
        np.savez(target, **{name or "data": arr})
    else:
        with open(target, "w") as f:
            _print_ascii(arr, name or flag, f)
    return True


def _to_array(obj):
    from saddle_point_petsc_tpu.ops.sparse import CSR
    from saddle_point_petsc_tpu.ops.stencil import StencilOperator

    if isinstance(obj, StencilOperator):
        from saddle_point_petsc_tpu.ops.sparse import coo_to_csr
        from saddle_point_petsc_tpu.ops.stencil import stencil_to_coo

        return np.asarray(coo_to_csr(stencil_to_coo(obj.W)).todense())
    if isinstance(obj, CSR):
        return np.asarray(obj.todense())
    return np.asarray(obj)


def _print_ascii(arr, name, file):
    print(f"{name} = [{arr.shape}]", file=file)
    with np.printoptions(precision=6, suppress=False, threshold=10000):
        print(arr, file=file)
