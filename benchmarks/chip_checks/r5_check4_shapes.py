import json, time, sys
import jax, jax.numpy as jnp
import numpy as np

def sync(x): return float(np.asarray(x).ravel()[0])
def timed(fn, *a):
    t0=time.perf_counter(); out=fn(*a); sync(out); return time.perf_counter()-t0

probe = jnp.ones((128,128)) @ jnp.ones((128,128)); sync(probe)
res = {}
import functools
@functools.partial(jax.jit, static_argnames=())
def chain(v, reps):
    def body(i, y):
        return y * 1.0000001 + 0.5
    return jax.lax.fori_loop(0, reps, body, v)

for shape in [(1024,1024), (2048,2048), (2240,2240), (2240,2304), (2304,2304), (4096,1024), (1024,4096)]:
    v = jnp.ones(shape, jnp.float32)
    timed(chain, v, 1)
    t1 = min(timed(chain, v, 50) for _ in range(2))
    t2 = min(timed(chain, v, 100) for _ in range(2))
    gbps = shape[0]*shape[1]*4*2 / ((t2-t1)/50) / 1e9
    res[f"{shape[0]}x{shape[1]}_gbps"] = round(gbps,1)
print(json.dumps(res), flush=True)
