"""tpu_pathopt — a TPU-native batched path-optimization engine.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
LiJiangnanBit/path_optimizer_2 (C++/ROS/OSQP): reference-line smoothing,
DP corridor search over a grid-map distance field, and a two-pass
linearized-kinematic-bicycle lateral QP — batched over thousands of scenarios
per chip and sharded across TPU meshes.
"""

__version__ = "0.1.0"

from tpu_pathopt.config import PlannerConfig, DEFAULT_CONFIG  # noqa: F401
