"""saddle_point_petsc_tpu — a TPU-native sparse linear-algebra framework.

A from-scratch JAX/XLA/Pallas framework with the capabilities exercised by the
reference PETSc harness (p-m-mueller/saddle_point_petsc): structured-grid Q1
FEM assembly, distributed CSR/BSR/stencil sparse operators, Krylov solvers
(CG/MINRES/GMRES/FGMRES), composable preconditioners (Jacobi, block-Jacobi,
ILU(0)-class, Chebyshev, fieldsplit/Schur), a PETSc-style options database,
monitors/profiling, and VTK output — designed TPU-first: SPMD over
`jax.sharding.Mesh`, halo exchange via `ppermute` under `shard_map`, Krylov
reductions via `psum`, and Pallas kernels for the hot SpMV paths.

Reference parity map (file:line citations refer to /root/reference):
- FEM numerics ............ models/fem.py      (src/Discretization.c:49-402)
- Problem assembly ........ models/poisson.py  (src/Discretization.c:130-274)
- Constraint/KKT system ... models/saddle.py   (src/SaddlePointProblem.c:34-76)
- Sparse formats/SpMV ..... ops/               (PETSc MATAIJ subset)
- Krylov solvers .......... solvers/krylov.py  (PETSc KSP subset)
- Preconditioners ......... solvers/precond.py (PETSc PC subset)
- Grid decomposition ...... parallel/          (PETSc DMDA subset)
- Options database ........ utils/options.py   (PETSc options DB subset)
- VTK output .............. utils/vtk.py       (src/Visulaization.c:3-266)
"""

__version__ = "0.1.0"

from saddle_point_petsc_tpu.utils.options import Options  # noqa: F401
