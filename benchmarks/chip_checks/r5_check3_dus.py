"""Microbench: unaligned vs aligned dynamic-update-slice + df_add chains."""
import json, time, sys
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
import numpy as np

def sync(x):
    return float(np.asarray(x).ravel()[0])

def timed(fn, *a):
    t0=time.perf_counter(); out=fn(*a); sync(out); return time.perf_counter()-t0

probe = jnp.ones((128,128)) @ jnp.ones((128,128)); sync(probe)
N = 2240
v = jnp.ones((N, N), jnp.float32)
res = {}

@jax.jit
def dus_unaligned(v, reps):
    def body(i, acc):
        z = jnp.zeros((N+2, N+2), jnp.float32)
        z = z.at[1:1+N, 1:1+N].set(v + acc[0,0])
        return z
    return jax.lax.fori_loop(0, reps, body, jnp.zeros((N+2,N+2)))

@jax.jit
def dus_aligned(v, reps):
    def body(i, acc):
        z = jnp.zeros((N+2, N+2), jnp.float32)
        z = z.at[0:N, 0:N].set(v + acc[0,0])
        return z
    return jax.lax.fori_loop(0, reps, body, jnp.zeros((N+2,N+2)))

@jax.jit
def elemwise_chain(v, reps):
    def body(i, y):
        return y * 1.0000001 + 0.5
    return jax.lax.fori_loop(0, reps, body, v)

from saddle_point_petsc_tpu.ops.doublefloat import DF, df_add, df_mul

@jax.jit
def dfadd_chain(v, reps):
    acc = DF(v, jnp.zeros_like(v))
    def body(i, acc):
        s = df_add(acc, DF(v * 1e-8, jnp.zeros_like(v)))
        return s
    out = jax.lax.fori_loop(0, reps, body, acc)
    return out.hi

for name, fn in [("dus_unaligned", dus_unaligned), ("dus_aligned", dus_aligned),
                 ("elemwise", elemwise_chain), ("dfadd", dfadd_chain)]:
    timed(fn, v, 1)
    t1 = min(timed(fn, v, 10) for _ in range(2))
    t2 = min(timed(fn, v, 20) for _ in range(2))
    res[name + "_ms_per_iter"] = round((t2-t1)/10*1e3, 3)
print(json.dumps(res), flush=True)
