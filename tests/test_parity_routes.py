"""Non-default-configuration end-to-end parity routes on gridmap.png.

tests/test_parity_gridmap.py covers the reference's DEFAULT configuration
(TENSION2 smoothing + DP corridor + full precise constraints). This module
runs the same float64-oracle parity harness on the reference's non-default
code paths, each on the real demo fixture:

- ``smoothing_method="TENSION"`` (tension_smoother.cpp:20-176) on the
  straight route — the Cartesian [x, y, d] smoothing QP;
- ``corridor_method="ASTAR"`` (graphSearch, reference_path_smoother.cpp:
  297-484) on the S-curve route — the oracle implements the reference's
  priority-queue A* (non-admissible h, getH :645-651) while the engine uses
  an exact layered relaxation; the documented divergence (a possibly
  sub-minimal settled g in the reference) must stay bounded;
- ``rough_constraints_far_away=True`` (base_solver.cpp:25-37) on a 40 m
  corridor — knots beyond 30 m drop to single center-corridor rows, so the
  route must be long enough that rough rows actually bind.

Each configuration is a separate XLA compilation; the module is marked slow.
"""

import os

import numpy as np
import pytest

GRIDMAP = "/root/reference/gridmap.png"

pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(not os.path.exists(GRIDMAP),
                       reason="reference gridmap.png not available"),
]

# The straight / scurve routes of test_parity_gridmap.py, plus a 40 m
# corridor (x = 65, y in [0, -40], clearance >= 2 m the whole way) long
# enough to engage rough constraints beyond precise_planning_length = 30.
ROUTES = {
    "straight": dict(
        pts=[(-60, 56.5), (-54, 56.5), (-48, 56.5), (-42, 56.5),
             (-36, 56.5), (-30, 56.5)],
        start=(-60.0, 56.5, 0.0), target=(-30.0, 56.5, 0.0)),
    "scurve": dict(
        pts=[(-52, 56.5), (-44, 56.0), (-37, 52.0), (-32, 45.0),
             (-29.5, 38.0)],
        start=(-52.0, 56.5, 0.0), target=(-29.5, 38.0, -1.2)),
    "long": dict(
        pts=[(65.0, 0.0), (65.0, -8.0), (65.0, -16.0), (65.0, -24.0),
             (65.0, -32.0), (65.0, -40.0)],
        start=(65.0, 0.0, -np.pi / 2), target=(65.0, -40.0, -np.pi / 2)),
}


def _make_cfg(**kw):
    from tpu_pathopt.config import PlannerConfig
    return PlannerConfig(**kw)


CONFIGS = {
    "tension": (dict(smoothing_method="TENSION"), "straight"),
    # cartesian_deviation_weight is a LIVE reference flag (planning_flags.
    # cpp:44, default 0): nonzero it makes the TENSION d-channel carry cost,
    # so the smoothing optimum is unique and pointwise parity is well-posed
    # (the w_dev=0 route below can only assert envelopes).
    "tension_dev": (dict(smoothing_method="TENSION",
                         cartesian_deviation_weight=0.5), "scurve"),
    "astar": (dict(corridor_method="ASTAR"), "scurve"),
    "rough": (dict(rough_constraints_far_away=True), "long"),
}


@pytest.fixture(scope="module")
def maps_pair():
    import jax.numpy as jnp
    from PIL import Image
    import oracle_pipeline as op
    from tpu_pathopt import maps

    img = np.array(Image.open(GRIDMAP).convert("L"))
    om = op.build_map(img < 128, resolution=0.2)
    gm = maps.build_map(jnp.asarray(img < 128), resolution=0.2)
    return gm, om


def _run_pair(maps_pair, cfg_kw, route_name):
    """(pipeline stages, oracle dict, cfg, route) for one configuration."""
    import jax
    import jax.numpy as jnp
    import oracle_pipeline as op
    from tpu_pathopt import pipeline
    from tpu_pathopt.cli import demo_scenario
    from tpu_pathopt.qp.admm import QPSettings

    gm, om = maps_pair
    cfg = _make_cfg(**cfg_kw)
    settings = QPSettings()
    route = ROUTES[route_name]

    @jax.jit
    def run(gm, scs):
        with jax.default_matmul_precision("highest"):
            prep_out = pipeline.stage_prep(scs, cfg)
            smooth_out = pipeline.stage_smooth(gm, prep_out, cfg, settings)
            xs2, ys2, cor = pipeline.stage_corridor(gm, scs, smooth_out, cfg)
            l_post, ok_post = pipeline.stage_post_smooth(cor, cfg, settings)
            geo_out = pipeline.stage_geometry(gm, scs, xs2, ys2, cor, l_post,
                                              cfg)
            sol1, sol2 = pipeline.stage_path_qp(scs, geo_out, cfg, settings)
            outs = pipeline.stage_finalize(geo_out[0], sol2, geo_out[5], cfg)
        return prep_out, smooth_out, cor, l_post, geo_out, sol1, sol2, outs

    sc = demo_scenario(route["pts"], route["start"], route["target"])
    scs = jax.tree_util.tree_map(lambda a: jnp.asarray(a)[None], sc)
    stages = jax.tree_util.tree_map(np.asarray, run(gm, scs))
    o = op.solve(om, [p[0] for p in route["pts"]],
                 [p[1] for p in route["pts"]],
                 route["start"], route["target"], cfg)
    return stages, o, cfg, route


@pytest.fixture(scope="module")
def results(maps_pair):
    return {name: _run_pair(maps_pair, kw, route)
            for name, (kw, route) in CONFIGS.items()}


def _common_asserts(stages, o, init_tol=2e-3, heading_tol=5e-3):
    """Stage flags + init-state parity shared by every configuration.

    ``init_tol``/``heading_tol`` loosen for TENSION: with
    cartesian_deviation_weight = 0 (planning_flags.cpp:44) the smoothing
    optimum is non-unique — near-affine tilts of the line are cost-free
    within the d-bounds — so the absolute line position AND its start
    heading can drift (~0.1 m / ~0.1 rad) between two solvers while both
    are optimal."""
    prep_out, smooth_out, cor, l_post, geo_out, sol1, sol2, outs = stages
    assert bool(smooth_out[4][0]) and o["smooth"]["ok"]
    assert bool(sol1.converged[0]) and bool(sol2.converged[0])
    assert o["qp"]["ok"]
    ref, cb, init_offset, init_heading_error, ok_init, n_valid = geo_out
    assert bool(ok_init[0]) and o["init"]["ok"]
    assert abs(float(init_offset[0]) - o["init"]["offset"]) < init_tol
    assert abs(float(init_heading_error[0]) - o["init"]["heading_error"]) \
        < heading_tol
    nv, nvo = int(n_valid[0]), o["init"]["n_valid"]
    assert abs(nv - nvo) <= 1
    return min(nv, nvo)


def _qp_optimality(stages, o, cfg, route):
    """Same-inputs path-QP parity (the strong check, mirroring
    test_parity_gridmap.test_qp_optimality_parity): the oracle re-solves the
    pass-2 QP on the PIPELINE's own f64-cast geometry; the pipeline solution
    must be feasible, cost-optimal within tolerance, and pointwise-match the
    strongly-weighted coordinates (kappa, e_psi)."""
    import oracle_pipeline as op
    *_, geo_out, sol1, sol2, outs = stages
    ref, cb, init_offset, init_heading_error, ok_init, n_valid = geo_out
    nv = int(n_valid[0])

    refd = dict(s=np.float64(ref.s[0]), k=np.float64(ref.k[0]),
                heading=np.float64(ref.heading[0]), n_valid=nv)
    cbd = dict(front_lb=np.float64(cb.front_lb[0]),
               front_ub=np.float64(cb.front_ub[0]),
               rear_lb=np.float64(cb.rear_lb[0]),
               rear_ub=np.float64(cb.rear_ub[0]),
               center_lb=np.float64(cb.center_lb[0]),
               center_ub=np.float64(cb.center_ub[0]),
               blocked=bool(cb.blocked[0]), n_valid=nv)

    P, q, A, lbq, ubq = op.assemble_path_qp(
        refd, cbd, np.float64(sol1.v[0][:nv, 0]),
        np.float64(sol1.v[0][:nv, 1]), np.float64(sol1.v[0][:nv, 2]),
        float(init_offset[0]), float(init_heading_error[0]), 0.0,
        route["target"][2], cbd["blocked"], cfg)
    xp = np.float64(sol2.v[0][:nv].reshape(-1))
    Ax = A @ xp
    assert float(np.maximum(lbq - Ax, Ax - ubq).max()) < 5e-3

    opt = op.qp_oracle.solve(P, q, A, lbq, ubq, eps_abs=1e-6, eps_rel=1e-6,
                             max_iter=40000)
    assert opt.status == "solved"
    cost = lambda x: 0.5 * x @ P @ x + q @ x
    assert cost(xp) - cost(opt.x) < 0.05 * max(1.0, abs(cost(opt.x)))
    vo = opt.x.reshape(nv, 6)
    assert np.max(np.abs(sol2.v[0][:nv, 2] - vo[:, 2])) < 2e-3   # kappa
    assert np.max(np.abs(sol2.v[0][:nv, 1] - vo[:, 1])) < 8e-3   # e_psi


def test_tension_route_parity(results, maps_pair):
    """TENSION smoothing end-to-end. With cartesian_deviation_weight = 0 the
    smoothed line is NON-UNIQUE (the d-channel is cost-free, so any
    low-curvature wander within the clamped-clearance d-bounds — up to
    +-2 m on an open route — is optimal; both solvers stop at eps 2e-3 on
    different members of the family). Pointwise line parity is therefore
    ill-posed; the meaningful smoothing parity is feasibility + cost under
    the oracle's dense float64 TENSION QP, then QP-optimality of the path
    solve on the pipeline's own geometry."""
    import oracle_pipeline as op
    stages, o, cfg, route = results["tension"]
    prep_out, smooth_out, cor, l_post, geo_out, sol1, sol2, outs = stages
    mv = _common_asserts(stages, o, init_tol=0.2, heading_tol=0.15)

    n_seg = int(prep_out[6][0])
    assert n_seg == o["seg"]["n"]

    # Rebuild the oracle's dense [x, y, d] problem on its own (matching)
    # segmentation inputs, lift the pipeline's solution into it, and demand
    # feasibility + near-optimal cost.
    _, om = maps_pair
    P, q, A, lbq, ubq = op.tension_qp_dense(
        om, o["seg"]["x"], o["seg"]["y"], o["seg"]["angle"], cfg)
    x2 = np.float64(smooth_out[0][0][:n_seg])
    y2 = np.float64(smooth_out[1][0][:n_seg])
    th = o["seg"]["angle"] + np.pi / 2
    d = (x2 - o["seg"]["x"]) * np.cos(th) + (y2 - o["seg"]["y"]) * np.sin(th)
    v = np.concatenate([x2, y2, d])
    Av = A @ v
    # OSQP-style termination is RELATIVE: eps_pri = eps_abs + eps_rel *
    # max(|Ax|, |z|), and the tie rows carry world coordinates (~60 m on
    # this map), so an accepted solution can violate the ties by up to
    # ~2e-3 * 60 = 0.12 — the reference's own OSQP accepts the same
    # (it does not even tighten the smoothing eps from the 1e-3 default,
    # tension_smoother.cpp:60-62). Assert that envelope.
    assert float(np.maximum(lbq - Av, Av - ubq).max()) < 0.15

    opt = op.qp_oracle.solve(P, q, A, lbq, ubq, eps_abs=1e-8, eps_rel=1e-8,
                             max_iter=200000)
    assert opt.status == "solved"
    cost = lambda x: 0.5 * x @ P @ x + q @ x
    # Zero-gradient problem: optimal cost is tiny; compare absolutely.
    assert cost(v) <= cost(opt.x) + 5e-2

    _qp_optimality(stages, o, cfg, route)


def test_tension_unique_optimum_pointwise_parity(results):
    """TENSION with cartesian_deviation_weight = 0.5: the d-channel carries
    cost, so the smoothing QP has a unique optimum and the smoothed line can
    be compared POINTWISE against the float64 oracle (no 0.15 m envelopes) —
    the reference-tolerance check the w_dev=0 route structurally cannot do
    (tension_smoother.cpp:102-126; planning_flags.cpp:44)."""
    stages, o, cfg, route = results["tension_dev"]
    prep_out, smooth_out, cor, l_post, geo_out, sol1, sol2, outs = stages
    _common_asserts(stages, o, init_tol=2e-2, heading_tol=2e-2)

    n_seg = int(prep_out[6][0])
    assert n_seg == o["seg"]["n"]
    x2 = np.float64(smooth_out[0][0][:n_seg])
    y2 = np.float64(smooth_out[1][0][:n_seg])
    assert np.max(np.abs(x2 - o["smooth"]["x"])) < 0.05
    assert np.max(np.abs(y2 - o["smooth"]["y"])) < 0.05
    # d recovered in the segmented frame must match too (the QP's own
    # variable layout, tension_smoother.cpp:143-156).
    th = o["seg"]["angle"] + np.pi / 2
    d_pipe = ((x2 - o["seg"]["x"]) * np.cos(th)
              + (y2 - o["seg"]["y"]) * np.sin(th))
    d_orac = ((o["smooth"]["x"] - o["seg"]["x"]) * np.cos(th)
              + (o["smooth"]["y"] - o["seg"]["y"]) * np.sin(th))
    assert np.max(np.abs(d_pipe - d_orac)) < 0.05

    _qp_optimality(stages, o, cfg, route)


def test_astar_route_parity(results):
    """A* corridor end-to-end: the engine's exact relaxation vs the oracle's
    reference-faithful priority-queue A*. Lattice bounds must agree up to
    single 0.2 m march-step flips; the path QP on that corridor must be
    optimal (w_l = 0 leaves pointwise l ill-posed on the curved route, so
    optimality + kappa/e_psi is the meaningful path-level parity)."""
    stages, o, cfg, route = results["astar"]
    prep_out, smooth_out, cor, l_post, geo_out, sol1, sol2, outs = stages
    mv = _common_asserts(stages, o)

    nl = int(cor.n_layers[0])
    assert nl == o["corridor"]["n_layers"]
    assert np.max(np.abs(cor.layers_s[0][:nl] - o["corridor"]["layers_s"])) \
        < 1e-3
    for pipe_b, orac_b in ((cor.lower[0][:nl], o["corridor"]["lower"]),
                           (cor.upper[0][:nl], o["corridor"]["upper"])):
        diff = np.abs(pipe_b - orac_b)
        assert np.max(diff) < 0.2 + 1e-3
        assert np.mean(diff < 1e-3) >= 0.8

    x_out, y_out, heading_out, l, e, k, dk, s_out = outs
    assert np.max(np.abs(k[0][:mv] - o["path"]["k"][:mv])) < 2e-3
    _qp_optimality(stages, o, cfg, route)


def test_rough_route_parity(results):
    """rough_constraints_far_away end-to-end on a 40 m corridor: knots at
    s >= 30 m must actually use the rough center rows, and the full path
    must match the oracle at the reference tolerance."""
    stages, o, cfg, route = results["rough"]
    prep_out, smooth_out, cor, l_post, geo_out, sol1, sol2, outs = stages
    mv = _common_asserts(stages, o)
    ref, cb, *_ = geo_out

    # The route is long enough that rough rows genuinely bind.
    n_rough = int(np.sum(ref.s[0][:mv] >= cfg.precise_planning_length))
    assert n_rough >= 10
    # Center bounds were extracted (nonzero where free space exists).
    assert np.max(cb.center_ub[0][:mv]) > 0.5

    x_out, y_out, heading_out, l, e, k, dk, s_out = outs
    assert np.max(np.abs(l[0][:mv] - o["path"]["l"][:mv])) < 5e-3
    assert np.max(np.abs(heading_out[0][:mv] - o["path"]["heading"][:mv])) \
        < 5e-3
    assert np.max(np.abs(k[0][:mv] - o["path"]["k"][:mv])) < 5e-3
