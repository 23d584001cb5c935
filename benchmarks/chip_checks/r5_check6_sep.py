import json, time, sys
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
import numpy as np

def sync(x):
    return float(np.asarray(jax.tree_util.tree_leaves(x)[0]).ravel()[0])

probe = jnp.ones((128,128)) @ jnp.ones((128,128)); sync(probe)
from saddle_point_petsc_tpu.models.assemble_df import assemble_saddle_dist_df
from saddle_point_petsc_tpu.parallel import dist
from saddle_point_petsc_tpu.parallel.mesh import make_mesh

mesh = make_mesh()
for n_nodes in (1121, 2241):
    grid = dist.DistGrid.create(n_nodes-1, n_nodes-1, mesh)
    t0=time.perf_counter()
    out = assemble_saddle_dist_df(grid, "trig"); sync(out[0].hi)
    t_tot = time.perf_counter()-t0
    tw = []
    for _ in range(3):
        t0=time.perf_counter()
        out = assemble_saddle_dist_df(grid, "trig"); sync(out[0].hi)
        tw.append(time.perf_counter()-t0)
    print(json.dumps({"n": n_nodes, "total_s": round(t_tot,2), "warm_s": round(min(tw),3)}), flush=True)
