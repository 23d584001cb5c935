"""spmm after warming the backend with a small spmv section (mirrors the
full-bench context where spmm runs last)."""
import json, time, sys
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
import numpy as np
v = float(np.asarray(jnp.sum(jnp.ones((128,128)) @ jnp.ones((128,128)))))
print(json.dumps({"probe": "ok"}), flush=True)
import bench
nnz_per_s, sol, dt, nnz = bench.bench_spmv(n_nodes=256, reps=20)
print(json.dumps({"warm_spmv_gnnz": round(nnz_per_s/1e9,1)}), flush=True)
t0 = time.perf_counter()
for attempt in range(2):
    try:
        out = bench.bench_spmm()
        print(json.dumps({"section": "spmm", "attempt": attempt,
                          "wall_s": round(time.perf_counter()-t0,1), "out": out}, default=str), flush=True)
        break
    except Exception as e:
        print(json.dumps({"section": "spmm", "attempt": attempt, "error": repr(e)[:200]}), flush=True)
