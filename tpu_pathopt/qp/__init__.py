"""Batched OSQP-semantics ADMM QP solvers.

The reference solves every QP through OSQP (ADMM with direct KKT solves,
osqp-eigen wrapper; settings at base_solver.cpp:59-62). This package provides:

- ``oracle``: a NumPy float64 reference implementation of the OSQP algorithm
  (Ruiz equilibration, per-constraint rho, adaptive rho, direct KKT solve) used
  as the parity oracle in tests — the stand-in for the reference's OSQP.
- ``admm``: a batched JAX implementation (dense reduced-KKT Cholesky) used for
  the smoothing QPs and as the correctness baseline for the structured solver.
- ``btridiag``: block-tridiagonal Cholesky factor/solve kernels — the
  structure-exploiting fast path for the lateral path QP.
"""

from tpu_pathopt.qp.admm import solve_qp, QPSolution  # noqa: F401
