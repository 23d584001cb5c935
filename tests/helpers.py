"""Shared test helpers for layout conversions."""
import numpy as np


def fflat(xT):
    """Canonical dof-major field (2, ny, nx) -> natural interleaved flat
    numpy vector (row = (j*nx+i)*2 + c), matching CSR/dense ordering."""
    x = np.asarray(xT)
    return np.transpose(x, (1, 2, 0)).reshape(-1)


def ffield(x, ny, nx):
    """Natural flat -> canonical (2, ny, nx) numpy field."""
    return np.transpose(np.asarray(x).reshape(ny, nx, 2), (2, 0, 1))
