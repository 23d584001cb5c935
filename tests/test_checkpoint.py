"""Checkpoint/resume tests: pytree roundtrip and Krylov warm restart."""
import jax.numpy as jnp
import numpy as np

from saddle_point_petsc_tpu.models import poisson
from saddle_point_petsc_tpu.solvers import krylov
from saddle_point_petsc_tpu.utils import checkpoint


def test_pytree_roundtrip(tmp_path):
    prob = poisson.assemble_poisson(4, 4)
    p = checkpoint.save_pytree(tmp_path / "prob.npz", prob)
    back = checkpoint.load_like(p, prob)
    np.testing.assert_allclose(
        np.asarray(back.A.planes), np.asarray(prob.A.planes)
    )
    np.testing.assert_allclose(np.asarray(back.f), np.asarray(prob.f))


def test_warm_restart_reduces_iterations(tmp_path):
    prob = poisson.assemble_poisson(16, 16)
    partial = krylov.cg(prob.A, prob.f, rtol=1e-4, maxiter=500)
    p = checkpoint.save_solver_state(
        tmp_path / "state.npz", partial, meta={"rtol": 1e-4}
    )
    resumed = checkpoint.resume_solve(
        krylov.cg, prob.A, prob.f, p, partial, rtol=1e-10, maxiter=500
    )
    cold = krylov.cg(prob.A, prob.f, rtol=1e-10, maxiter=500)
    assert resumed.converged_reason > 0
    assert int(resumed.iterations) < int(cold.iterations)
