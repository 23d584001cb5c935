"""VTK legacy-ASCII output from (possibly sharded) solution fields.

TPU-native replacement for the reference's MPI-IO token-ring writer
(/root/reference/src/Visulaization.c:3-266).  On TPU pods the right
pattern is host gather -> single-writer file IO (SURVEY.md §2c), not a
rank ring: `np.asarray` on a sharded jax array performs the global gather
(multihost: combine with multihost_utils.process_allgather and write on
process 0 — see parallel/).

Fixes two reference bugs (SURVEY.md §8):
- B4: the reference read an uninitialized local vector (Visulaization.c:27-28
  never scatters u); we take the actual solution.
- B5: the reference wrote only POINTS+POLYGONS and no solution data
  (Visulaization.c:53-56); we emit POINT_DATA with the Ux/Uy vector field
  (names per DMDASetFieldName, ref Discretization.c:23-24).

Format matches the reference writer's layout: POLYDATA with one quad
POLYGON per element, points in row-major node order
(ref WriteVTKPoints :104-177, WriteVTKPolygones :179-246).
"""
from __future__ import annotations

import numpy as np


def _gather_host(x):
    """Fetch a (possibly multi-host-sharded) array to every host.

    Single-host: np.asarray gathers across local devices.  Multi-host: a
    sharded array's remote shards are NOT addressable, so gather via
    multihost_utils.process_allgather first — the TPU-pod replacement for
    the reference's MPI-IO token ring (ref Visulaization.c:146-173)."""
    if x is None:
        return None
    try:
        import jax

        if (
            isinstance(x, jax.Array)
            and jax.process_count() > 1
            and not x.is_fully_addressable
        ):
            # cross-process-sharded global array: every process holds only
            # its shards, so materialize the global value collectively.
            # (Fully-addressable arrays — local or replicated — must NOT
            # take this path: process_allgather would concatenate the
            # per-process copies and double the grid.)
            from jax.experimental import multihost_utils

            x = multihost_utils.process_allgather(x, tiled=True)
    except (ImportError, AttributeError, TypeError):
        pass
    return np.asarray(x)


def write_vtk(path, coords, u=None, title="saddle_point_petsc_tpu output"):
    """Write a legacy VTK POLYDATA file.

    coords: (ny, nx, 2) node coordinates; u: optional (ny, nx, 2) solution
    field written as a POINT_DATA vector (Ux, Uy, 0).
    Host gather -> process-0 single writer (multihost-safe).
    """
    import jax

    coords = _gather_host(coords)
    u = _gather_host(u)
    if jax.process_count() > 1 and jax.process_index() != 0:
        return path  # gathered collectively; only process 0 writes
    ny, nx = coords.shape[:2]
    if u is not None:
        u = np.asarray(u)
        if u.ndim == 3 and u.shape == (2, ny, nx):
            # canonical dof-major field -> node-major for point data
            u = np.transpose(u, (1, 2, 0))
    npoints = ny * nx
    ney, nex = ny - 1, nx - 1
    lines = []
    # header: 4 lines like WriteVTKHeader (ref Visulaization.c:69-102)
    lines.append("# vtk DataFile Version 2.0")
    lines.append(title)
    lines.append("ASCII")
    lines.append("DATASET POLYDATA")
    lines.append(f"POINTS {npoints} double")
    pts = coords.reshape(-1, 2)
    for x, y in pts:
        lines.append(f"{x:.6e} {y:.6e} {0.0:.6e}")
    # one quad per element; node ids in CCW order (ref DMDAGetElements use)
    ncells = ney * nex
    lines.append(f"POLYGONS {ncells} {ncells * 5}")
    for ej in range(ney):
        for ei in range(nex):
            n0 = ej * nx + ei
            n1 = (ej + 1) * nx + ei
            n2 = (ej + 1) * nx + ei + 1
            n3 = ej * nx + ei + 1
            lines.append(f"4 {n0} {n3} {n2} {n1}")
    if u is not None:
        u = np.asarray(u).reshape(ny, nx, 2)
        lines.append(f"POINT_DATA {npoints}")
        lines.append("VECTORS U double")
        for ux, uy in u.reshape(-1, 2):
            lines.append(f"{ux:.9e} {uy:.9e} {0.0:.9e}")
        # also scalar fields with the reference's names (Ux, Uy)
        for c, name in enumerate(("Ux", "Uy")):
            lines.append(f"SCALARS {name} double 1")
            lines.append("LOOKUP_TABLE default")
            for v in u[..., c].reshape(-1):
                lines.append(f"{v:.9e}")
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")
    return path


def read_vtk_points(path):
    """Minimal reader for round-trip tests: returns (points, polygons, u)."""
    with open(path) as f:
        toks = f.read().split("\n")
    i = 0
    pts = polys = u = None
    while i < len(toks):
        line = toks[i]
        if line.startswith("POINTS"):
            n = int(line.split()[1])
            pts = np.array(
                [[float(v) for v in toks[i + 1 + k].split()] for k in range(n)]
            )
            i += n
        elif line.startswith("POLYGONS"):
            n = int(line.split()[1])
            polys = np.array(
                [
                    [int(v) for v in toks[i + 1 + k].split()[1:]]
                    for k in range(n)
                ]
            )
            i += n
        elif line.startswith("VECTORS"):
            n = pts.shape[0]
            u = np.array(
                [[float(v) for v in toks[i + 1 + k].split()] for k in range(n)]
            )
            i += n
        i += 1
    return pts, polys, u
