"""Stencil Pallas schedule sweep vs XLA on the chip; DIA pallas recheck."""
import json, time, sys
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
import numpy as np
from functools import partial

probe = float(np.asarray(jnp.sum(jnp.ones((128,128)) @ jnp.ones((128,128)))))
import bench
from saddle_point_petsc_tpu.models import poisson
from saddle_point_petsc_tpu.ops.stencil import StencilOperator
from saddle_point_petsc_tpu.ops.pallas.spmv import stencil_spmv_pallas

n = 1024
prob = poisson.assemble_poisson(n-1, n-1, dtype=jnp.float32)

@jax.jit
def prescale(A, x):
    def body(_, y):
        y = A.matvec_field(y)
        return y / jnp.sqrt(jnp.sum(y * y))
    y = jax.lax.fori_loop(0, 12, body, x / jnp.sqrt(jnp.sum(x * x)))
    lmax = jnp.sum(y * A.matvec_field(y))
    return A.planes / (1.05 * lmax), y

planes, x0 = prescale(prob.A, prob.f)
nnz = n * n * 36

def chain(mv, x, reps=100):
    @jax.jit
    def run(x, r):
        return jnp.sum(jax.lax.fori_loop(0, r, lambda i, v: mv(v), x))
    bench._timed(run, x, 1)
    t1 = min(bench._timed(run, x, reps) for _ in range(3))
    t2 = min(bench._timed(run, x, 2*reps) for _ in range(3))
    return nnz / (max(t2-t1, 1e-9)/reps)

res = {}
res["xla"] = round(chain(lambda v: StencilOperator(planes).matvec_field(v), x0)/1e9, 1)
for bm in (8, 16, 32, 64):
    try:
        res[f"pallas_bm{bm}"] = round(chain(
            lambda v: stencil_spmv_pallas(planes, v, bm=bm), x0)/1e9, 1)
    except Exception as e:
        res[f"pallas_bm{bm}"] = repr(e)[:80]
    print(json.dumps(res), flush=True)
