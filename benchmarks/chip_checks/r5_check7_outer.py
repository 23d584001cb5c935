import json, time, sys
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
import numpy as np
from functools import partial

def sync(x): return float(np.asarray(x).ravel()[0])

probe = jnp.ones((128,128)) @ jnp.ones((128,128)); sync(probe)
from saddle_point_petsc_tpu.ops.doublefloat import DF, df_add, df_mul

@partial(jax.jit, static_argnames=("nterms","my","mx"))
def outer_sums(rh, rl, ch, cl, nterms, my, mx):
    # nterms df outer products + adds -> one (my, mx) df result
    acc = None
    for t in range(nterms):
        term = df_mul(DF(rh[t][:, None], rl[t][:, None]),
                      DF(ch[t][None, :], cl[t][None, :]))
        acc = term if acc is None else df_add(acc, term)
    return acc.hi

@partial(jax.jit, static_argnames=("nops","my","mx"))
def plain_chain(v, nops, my, mx):
    for t in range(nops):
        v = v * 1.0000001 + 0.5
    return v

res = {}
for my, mx in ((2240, 2240), (2304, 2304), (2240, 2304)):
    rng = np.random.default_rng(0)
    T = 16
    rh = jnp.asarray(rng.standard_normal((T, my)), jnp.float32)
    rl = rh * 1e-8; ch = jnp.asarray(rng.standard_normal((T, mx)), jnp.float32); cl = ch*1e-8
    t0=time.perf_counter(); sync(outer_sums(rh, rl, ch, cl, T, my, mx)); tc = time.perf_counter()-t0
    ts=[]
    for _ in range(3):
        t0=time.perf_counter(); sync(outer_sums(rh, rl, ch, cl, T, my, mx)); ts.append(time.perf_counter()-t0)
    res[f"outer16_{my}x{mx}_s"] = round(min(ts),3)
    v = jnp.ones((my, mx), jnp.float32)
    sync(plain_chain(v, 64, my, mx))
    ts=[]
    for _ in range(3):
        t0=time.perf_counter(); sync(plain_chain(v, 64, my, mx)); ts.append(time.perf_counter()-t0)
    res[f"chain64_{my}x{mx}_s"] = round(min(ts),3)
    print(json.dumps(res), flush=True)
