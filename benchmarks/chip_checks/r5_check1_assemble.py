"""Chip check 1: TPU probe + device df assembly timing at config-5 scale."""
import json, time
import jax, jax.numpy as jnp
import numpy as np

def sync(x):
    return float(np.asarray(jax.tree_util.tree_leaves(x)[0]).ravel()[0])

out = {}
t0 = time.perf_counter()
probe = jnp.ones((256, 256)) @ jnp.ones((256, 256))
sync(probe)
out["probe_s"] = time.perf_counter() - t0
out["device"] = str(jax.devices()[0])
print(json.dumps(out), flush=True)

from saddle_point_petsc_tpu.models.assemble_df import assemble_saddle_dist_df
from saddle_point_petsc_tpu.parallel import dist
from saddle_point_petsc_tpu.parallel.mesh import make_mesh

n_nodes = 2241
mesh = make_mesh()
grid = dist.DistGrid.create(n_nodes - 1, n_nodes - 1, mesh)
t0 = time.perf_counter()
planes_df, Bf_df, f_df, g_df, mask = assemble_saddle_dist_df(grid, "trig")
sync(planes_df.hi)
out["assemble_total_s"] = time.perf_counter() - t0
t0 = time.perf_counter()
planes_df, Bf_df, f_df, g_df, mask = assemble_saddle_dist_df(grid, "trig")
sync(planes_df.hi)
out["assemble_warm_s"] = time.perf_counter() - t0
# sanity: finite, boundary identity
ph = np.asarray(planes_df.hi[0, 1, 1])
out["finite"] = bool(np.isfinite(ph).all())
out["corner_diag"] = float(ph[0, 0])
print(json.dumps(out), flush=True)
