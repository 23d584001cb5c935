import json, time, sys
import jax, jax.numpy as jnp
import numpy as np

def sync(x): return float(np.asarray(x).ravel()[0])
def timed(fn, *a):
    t0=time.perf_counter(); out=fn(*a); sync(out); return time.perf_counter()-t0

probe = jnp.ones((128,128)) @ jnp.ones((128,128)); sync(probe)
res = {}
@jax.jit
def chain(v, reps):
    def body(i, y):
        return y * 1.0000001 + 0.5
    return jax.lax.fori_loop(0, reps, body, v)

for n in (2048, 2176, 2240, 2241, 2242, 2243, 2244, 2248, 2272, 2304, 2368, 2432):
    v = jnp.ones((n, n), jnp.float32)
    timed(chain, v, 1)
    t1 = min(timed(chain, v, 50) for _ in range(3))
    t2 = min(timed(chain, v, 100) for _ in range(3))
    gbps = n*n*4*2 / (max(t2-t1,1e-9)/50) / 1e9
    res[str(n)] = round(gbps,1)
    print(json.dumps({str(n): res[str(n)]}), flush=True)
print(json.dumps(res), flush=True)
