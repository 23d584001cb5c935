"""Remaining chip sections after the spmm VMEM fix: spmm, gamg, config2, config5."""
import json, time, sys
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
import numpy as np

# probe with retries: the tunnel needs ~10 min to recover from a killed client
for attempt in range(30):
    try:
        t0 = time.perf_counter()
        v = float(np.asarray(jnp.sum(jnp.ones((128,128)) @ jnp.ones((128,128)))))
        print(json.dumps({"probe_attempt": attempt, "probe_s": round(time.perf_counter()-t0,1)}), flush=True)
        break
    except Exception as e:
        print(json.dumps({"probe_attempt": attempt, "err": repr(e)[:80]}), flush=True)
        time.sleep(30)
import bench

def run(name, fn):
    t0 = time.perf_counter()
    try:
        out = fn()
        print(json.dumps({"section": name, "wall_s": round(time.perf_counter()-t0,1), "out": out}, default=str), flush=True)
    except Exception as e:
        print(json.dumps({"section": name, "error": repr(e)[:300]}), flush=True)

run("config2", lambda: bench.bench_refined_kkt_config2())
run("gamg", lambda: bench.bench_gamg())
def c5():
    extra = {}
    ret = bench.bench_refined_kkt_dist(
        n_nodes=2241, inner_maxiter=20000, return_nnz=True,
        inner_kind="minres-mg", assemble="device", out=extra)
    return {"ret": ret, "extra": extra}
run("config5", c5)
run("config3bsr", lambda: bench.bench_refined_kkt_bsr())
run("spmm", lambda: bench.bench_spmm())
