"""Chip validation of the round-5 bench sections, sequential."""
import json, time, sys
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
import numpy as np

probe = float(np.asarray(jnp.sum(jnp.ones((128,128)) @ jnp.ones((128,128)))))
import bench

def run(name, fn):
    t0 = time.perf_counter()
    try:
        out = fn()
        print(json.dumps({"section": name, "wall_s": round(time.perf_counter()-t0,1), "out": out}, default=str), flush=True)
    except Exception as e:
        print(json.dumps({"section": name, "error": repr(e)[:300]}), flush=True)

run("aij", lambda: {k: v for k, v in bench.bench_aij_tpu().items()})
run("spmm", lambda: bench.bench_spmm())
run("gamg", lambda: bench.bench_gamg())
run("config2", lambda: bench.bench_refined_kkt_config2())
def c5():
    extra = {}
    ret = bench.bench_refined_kkt_dist(
        n_nodes=2241, inner_maxiter=20000, return_nnz=True,
        inner_kind="minres-mg", assemble="device", out=extra)
    return {"ret": ret, "extra": extra}
run("config5", c5)
