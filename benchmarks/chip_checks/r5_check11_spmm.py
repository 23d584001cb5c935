"""spmm section alone, after the closure-constant fix."""
import json, time, sys
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
import numpy as np
for attempt in range(30):
    try:
        v = float(np.asarray(jnp.sum(jnp.ones((128,128)) @ jnp.ones((128,128)))))
        print(json.dumps({"probe_attempt": attempt}), flush=True)
        break
    except Exception as e:
        print(json.dumps({"probe_attempt": attempt, "err": repr(e)[:80]}), flush=True)
        time.sleep(30)
import bench
t0 = time.perf_counter()
try:
    out = bench.bench_spmm()
    print(json.dumps({"section": "spmm", "wall_s": round(time.perf_counter()-t0,1), "out": out}, default=str), flush=True)
except Exception as e:
    print(json.dumps({"section": "spmm", "error": repr(e)[:300]}), flush=True)
