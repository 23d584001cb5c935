"""Golden / parity tests (SURVEY.md §4 item 5).

Iterate-count parity: the north star requires matching PETSc iterate counts
±20% at rtol 1e-8.  PETSc is not installed here, so we use
scipy.sparse.linalg (same textbook algorithms and the same
unpreconditioned-norm ||r|| <= rtol*||b|| stopping rule as
KSPConvergedDefault) as the convention oracle; counts must agree within
the same ±20% window.

Golden integration: the reference's default run (3x3 elements, constant
force) pinned to committed values.
"""
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse as sps
import scipy.sparse.linalg as spla

from saddle_point_petsc_tpu.models import poisson, saddle
from saddle_point_petsc_tpu.ops import sparse as sp
from saddle_point_petsc_tpu.ops.stencil import stencil_to_coo
from saddle_point_petsc_tpu.solvers import krylov

from helpers import fflat


def _system(nex=16, ney=16):
    prob = poisson.assemble_poisson(nex, ney)
    csr = sp.csr_compact(sp.coo_to_csr(stencil_to_coo(prob.A.W)))
    a = sp.csr_to_scipy(csr)
    b = fflat(prob.f)
    return prob, a, b


class _Counter:
    def __init__(self):
        self.n = 0

    def __call__(self, *_):
        self.n += 1


@pytest.mark.parametrize("nex", [8, 16, 32])
def test_cg_iterate_count_parity(nex):
    prob, a, b = _system(nex, nex)
    res = krylov.cg(
        prob.A, prob.f, rtol=1e-8, maxiter=2000,
        norm_type="unpreconditioned",
    )
    assert res.converged_reason > 0
    c = _Counter()
    _, info = spla.cg(a, b, rtol=1e-8, atol=0.0, maxiter=2000, callback=c)
    assert info == 0
    ours, ref = int(res.iterations), c.n
    assert abs(ours - ref) <= max(0.2 * ref, 2), (ours, ref)


@pytest.mark.parametrize("nex", [8, 16])
def test_minres_iterate_count_parity(nex):
    prob, a, b = _system(nex, nex)
    res = krylov.minres(prob.A, prob.f, rtol=1e-8, maxiter=2000)
    assert res.converged_reason > 0
    c = _Counter()
    _, info = spla.minres(a, b, rtol=1e-8, maxiter=2000, callback=c)
    assert info == 0
    ours, ref = int(res.iterations), c.n
    assert abs(ours - ref) <= max(0.2 * ref, 2), (ours, ref)


def test_gmres_iterate_count_parity():
    prob, a, b = _system(16, 16)
    res = krylov.gmres(prob.A, prob.f, rtol=1e-8, maxiter=2000, restart=30)
    assert res.converged_reason > 0
    c = _Counter()
    _, info = spla.gmres(
        a, b, rtol=1e-8, atol=0.0, maxiter=2000, restart=30,
        callback=c, callback_type="pr_norm",
    )
    assert info == 0
    ours, ref = int(res.iterations), c.n
    assert abs(ours - ref) <= max(0.2 * ref, 3), (ours, ref)


def test_iterate_count_goldens_pinned():
    """Committed iterate-count goldens (tests/goldens/iterate_counts.json):
    exact regression pins for OUR counts (+-1 reduction roundoff) and the
    +-20% window against the recorded scipy oracle counts.  Freezes the
    PETSc norm/stopping conventions against silent drift (VERDICT round-1
    item 9; true PETSc goldens need an external PETSc run — provenance
    documented in the JSON)."""
    import json
    import pathlib

    g = json.loads(
        (pathlib.Path(__file__).parent / "goldens/iterate_counts.json")
        .read_text()
    )
    for nex in (8, 16, 32):
        prob = poisson.assemble_poisson(nex, nex)
        r = krylov.cg(
            prob.A, prob.f, rtol=1e-8, maxiter=4000,
            norm_type="unpreconditioned",
        )
        pin = g[f"poisson{nex}_cg"]
        assert abs(int(r.iterations) - pin["ours"]) <= 1
        assert abs(int(r.iterations) - pin["scipy"]) <= max(
            0.2 * pin["scipy"], 2
        )
        r = krylov.minres(prob.A, prob.f, rtol=1e-8, maxiter=4000)
        assert abs(int(r.iterations) - g[f"poisson{nex}_minres"]["ours"]) <= 1
    prob = saddle.assemble_saddle(64, 64, body_force="trig")
    from saddle_point_petsc_tpu.solvers import precond

    M = precond.schur_pc(prob.A, prob.Bf, fact_type="diag")
    r = krylov.minres(prob.K, prob.rhs, M=M, rtol=1e-8, maxiter=4000)
    assert abs(int(r.iterations) - g["kkt64_minres_schurdiag"]["ours"]) <= 2


def test_golden_default_run():
    """The reference's default problem (3x3 elements, f=(1,2), zero BCs).

    Golden values recorded from the verified f64 solve (independently
    cross-checked against a dense numpy solve in test_krylov).
    """
    prob = poisson.assemble_poisson(3, 3)
    res = krylov.cg(prob.A, prob.f, rtol=1e-12, maxiter=100)
    assert res.converged_reason > 0
    u = np.asarray(res.x)  # (2, 4, 4)
    # interior node (1,1): recorded golden
    np.testing.assert_allclose(
        u[:, 1, 1], [0.0496586033, 0.0918684], rtol=1e-6
    )
    # invariance under point reflection (x,y) -> (1-x,1-y): the operator
    # and the constant body force are both invariant, so u(p) = u(1-p)
    np.testing.assert_allclose(u, u[:, ::-1, ::-1], atol=1e-10)


def test_golden_kkt_trivial_solution():
    """Constant body force + default constraints: u = 0, lam = (1, 2, 0, 0)
    exactly (f in range(B^T); see models/saddle.py docstring)."""
    prob = saddle.assemble_saddle(8, 8)  # constant force
    res = krylov.minres(prob.K, prob.rhs, rtol=1e-12, maxiter=2000)
    assert res.converged_reason > 0
    np.testing.assert_allclose(np.asarray(res.x[0]), 0.0, atol=1e-9)
    np.testing.assert_allclose(
        np.asarray(res.x[1]), [1.0, 2.0, 0.0, 0.0], atol=1e-8
    )


def test_golden_vtk_bytes(tmp_path):
    """VTK output for the default run is byte-stable (header + topology)."""
    from saddle_point_petsc_tpu.utils import vtk

    prob = poisson.assemble_poisson(3, 3)
    res = krylov.cg(prob.A, prob.f, rtol=1e-10, maxiter=100)
    path = tmp_path / "g.vtk"
    vtk.write_vtk(path, prob.coords, res.x)
    lines = path.read_text().splitlines()
    assert lines[0] == "# vtk DataFile Version 2.0"
    assert lines[3] == "DATASET POLYDATA"
    assert lines[4] == "POINTS 16 double"
    assert lines[21] == "POLYGONS 9 45"
    assert lines[22] == "4 0 1 5 4"
