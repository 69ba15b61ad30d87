"""Lateral path QP: structured assembly + two-pass SQP driver.

TPU-native re-design of the reference's BaseSolver (src/solver/base_solver.cpp):
the Frenet kinematic-bicycle linearization, soft collision corridor, and
slack-relaxed QP — assembled directly in block form (never as a dense
cons x vars matrix) and solved by a block-tridiagonal ADMM.
"""

from tpu_pathopt.solver.assembly import PathQP, assemble_path_qp  # noqa: F401
from tpu_pathopt.solver.path_solver import solve_path_qp  # noqa: F401
