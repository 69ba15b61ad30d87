"""Planner configuration.

The reference keeps ~40 gflags (reference: src/config/planning_flags.cpp) plus a
number of hardcoded weights scattered through the code (base_solver.cpp:123-126,
reference_path_smoother.cpp:113-117, :587-589). Here the *live* flag set and those
hardcoded constants are lifted into two explicit objects:

- ``PlannerConfig``: static, hashable configuration (shapes, toggles, geometry).
  Passed as a static argument to jitted functions; changing it triggers a recompile.
- no separate "dynamic weights" pytree for now — weights live on PlannerConfig since
  the reference treats them as compile-time constants too.

Fixed shapes are a first-class concept: every stage is padded to a static maximum
(``n_knots``, ``dp_layers``, ...) with validity masks so one XLA compilation serves
every scenario in a batch.
"""

from __future__ import annotations

import dataclasses
import math


@dataclasses.dataclass(frozen=True)
class PlannerConfig:
    # --- Car geometry (reference: planning_flags.cpp:10-22) ---
    car_width: float = 2.0
    car_length: float = 4.9
    safety_margin: float = 0.3          # mandatory margin in bound extraction
    wheel_base: float = 2.5
    rear_length: float = -1.0           # rear axle to rear edge (signed, along heading)
    front_length: float = 3.9           # rear axle to front edge
    max_steering_angle: float = 35.0 * math.pi / 180.0

    # --- Smoothing (planning_flags.cpp:27-67) ---
    smoothing_method: str = "TENSION2"  # "TENSION" | "TENSION2"
    search_lateral_range: float = 10.0
    search_longitudinal_spacing: float = 1.5
    search_lateral_spacing: float = 0.6
    cartesian_curvature_weight: float = 1.0
    cartesian_curvature_rate_weight: float = 50.0
    cartesian_deviation_weight: float = 0.0
    tension_2_deviation_weight: float = 0.005
    tension_2_curvature_weight: float = 1.0
    tension_2_curvature_rate_weight: float = 10.0
    search_obstacle_cost: float = 0.4
    search_deviation_cost: float = 0.4
    # Corridor search variant: "DP" (graphSearchDp — the live path in the
    # reference, reference_path_smoother.cpp:31-45) or "ASTAR" (graphSearch,
    # :297-484 — present-but-uncalled in the reference; exposed here as a
    # real toggle).
    corridor_method: str = "DP"

    # --- DP corridor search weights (hardcoded in reference at
    #     reference_path_smoother.cpp:113-117) ---
    dp_weight_ref_offset: float = 1.0
    dp_weight_obstacle: float = 0.5
    dp_weight_angle_change: float = 16.0
    dp_weight_ref_angle_diff: float = 0.5
    dp_safe_distance: float = 3.0

    # --- Post-smoothing QP weights (hardcoded at
    #     reference_path_smoother.cpp:587-589) ---
    post_weight_l: float = 1.0
    post_weight_dl: float = 100.0
    post_weight_ddl: float = 1000.0

    # --- Path QP weights (hardcoded at base_solver.cpp:123-126; the
    #     FLAGS_KP_* flags are dead in the reference) ---
    weight_l: float = 0.0
    weight_kappa: float = 20.0
    weight_dkappa: float = 100.0
    weight_slack: float = 10.0
    expected_safety_margin: float = 0.6  # soft shrink of collision corridor
    constraint_end_heading: bool = True

    # --- Output / discretization (planning_flags.cpp:106-114) ---
    output_spacing: float = 0.3
    epsilon: float = 1e-6
    # Newton projection iteration cap. The reference hardcodes 20
    # (tools.cpp:107); Newton is quadratically convergent on these cubics and
    # reaches f32 fixed point in <8 iterations, so the extra passes are pure
    # latency — 12 keeps a 4-iteration safety margin while matching the
    # reference's answers to f32 precision.
    newton_iters: int = 12
    # Directional-projection grid pre-scan fallback in bound extraction
    # (getDirectionalProjection, tools.cpp:128-155 — implemented with its
    # min-tracking bug FIXED, see splines.project_directional). The reference
    # mainline only ever calls the Newton variant
    # (reference_path_impl.cpp:192-205), so OFF matches reference behavior;
    # ON adds a bounded +-5 m grid pre-scan per axle projection and keeps
    # whichever candidate lands closer to the ray — robust when the Newton
    # hint is far from the optimum (e.g. kinked high-curvature refits).
    directional_prescan_fallback: bool = False
    # Curvature-adaptive resampling (reference_path_impl.cpp:321-335, default
    # ON in the reference): spacing ramps from output_spacing down to half of
    # it as |k| rises through [0.08, 0.2]. Implemented as a fixed-length scan
    # (static shapes). Default ON, matching the reference — the benched
    # config IS the reference-default config (>= 1000 solves/s holds with
    # the scan on).
    enable_dynamic_segmentation: bool = True
    rough_constraints_far_away: bool = False
    precise_planning_length: float = 30.0

    # --- Static shapes (new; fixed-shape padding for XLA) ---
    n_knots: int = 128          # max path-QP horizon (reference: ~ref_len/0.3)
    n_segment_points: int = 64  # max points for the smoothing QPs (@1 m spacing)
    dp_layers: int = 32         # max DP longitudinal layers
    dp_laterals: int = 35       # lateral samples: 2*10/0.6 + 1 ≈ 34.3 → 35
    bspline_samples: int = 256  # max raw B-spline samples (@ ~1 m)

    # --- QP solver settings (base_solver.cpp:59-62) ---
    # These are the user-level OSQP knobs the reference sets on its solver
    # (eps_abs/eps_rel/max_iter + the residual-check interval). They are
    # LIVE: every pipeline/dist entry point that takes ``settings=None``
    # derives its ``QPSettings`` from them via :meth:`qp_settings`, so e.g.
    # ``PlannerConfig(qp_max_iter=500)`` really caps the device solvers
    # (pinned by tests/test_pipeline.py::test_config_qp_fields_are_live).
    # Pass an explicit ``QPSettings`` only to reach the solver-internal
    # knobs (rho policy, fused kernels, pscan).
    qp_eps_abs: float = 2e-3
    qp_eps_rel: float = 2e-3
    qp_max_iter: int = 4000
    qp_check_every: int = 25

    def qp_settings(self, **overrides):
        """The ``QPSettings`` implied by this config's qp_* fields.

        One constructor so the user-level QP knobs cannot silently diverge
        from what the device solvers run (the reference's dead-flag disease,
        SURVEY.md §5.6, reproduced here in rounds 2-4 and fixed by this).
        ``overrides`` reach any remaining ``QPSettings`` field."""
        from tpu_pathopt.qp.admm import QPSettings
        base = dict(eps_abs=self.qp_eps_abs, eps_rel=self.qp_eps_rel,
                    max_iter=self.qp_max_iter, check_every=self.qp_check_every)
        base.update(overrides)
        return QPSettings(**base)

    def __post_init__(self):
        # The reference registers gflags validators for its method strings
        # (planning_flags.cpp:28-32, :75-79); mirror that instead of silently
        # falling back on a typo.
        if self.smoothing_method not in ("TENSION", "TENSION2"):
            raise ValueError(
                f"smoothing_method must be 'TENSION' or 'TENSION2', "
                f"got {self.smoothing_method!r}")
        if self.corridor_method not in ("DP", "ASTAR"):
            raise ValueError(
                f"corridor_method must be 'DP' or 'ASTAR', "
                f"got {self.corridor_method!r}")

    @property
    def kappa_limit(self) -> float:
        # base_solver.cpp:226
        return math.tan(self.max_steering_angle) / self.wheel_base


DEFAULT_CONFIG = PlannerConfig()
