"""End-to-end parity on the reference's own demo fixture (gridmap.png).

The north-star claim (BASELINE.md): the TPU pipeline matches an OSQP-semantics
float64 oracle of the full reference pipeline on the `gridmap.png` scenario
(reference: src/test/demo.cpp:94-113, 710x701 px @ 0.2 m/px) within the
reference's own QP tolerance (eps_abs = eps_rel = 2e-3, base_solver.cpp:61-62).

Three routes on the real map:
- straight: a wide corridor (the path QP optimum is unique) — full end-to-end
  (l, heading, k) parity at 2e-3;
- scurve: a curved corridor exercising curvature costs, the DP lattice's turn
  radius limit, and dynamic segmentation's adaptive spacing;
- blocked: drives into a wall — blocked detection + horizon truncation parity.

Where the reference QP's optimum is NOT unique (w_l = 0 leaves a flat valley
in l; the blocked route also drops the end-heading pin, base_solver.cpp:254),
pointwise l parity is ill-posed — two OSQP runs land on different
near-optima. There parity is asserted the meaningful way: the pipeline's
solution is *feasible* under the float64 oracle's constraints and its cost is
within tolerance of the float64 optimum, plus pointwise parity on the
well-determined coordinates (kappa, e_psi).

Discrete-threshold stages (ESDF ray marches quantized at 0.2 m / 0.05 m steps,
reference_path_impl.cpp:232-312, reference_path_smoother.cpp:250-287) may flip
by exactly one quantum when f32 vs f64 positions straddle a clearance
threshold; those comparisons allow single-quantum flips on a small fraction of
knots and exact agreement elsewhere.
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

ROUTES = {
    "straight": dict(
        pts=[(-60, 56.5), (-54, 56.5), (-48, 56.5), (-42, 56.5),
             (-36, 56.5), (-30, 56.5)],
        start=(-60.0, 56.5, 0.0), target=(-30.0, 56.5, 0.0)),
    "scurve": dict(
        pts=[(-52, 56.5), (-44, 56.0), (-37, 52.0), (-32, 45.0),
             (-29.5, 38.0)],
        start=(-52.0, 56.5, 0.0), target=(-29.5, 38.0, -1.2)),
    "blocked": dict(
        pts=[(-52, 56.5), (-44, 56.5), (-36, 56.5), (-28, 56.5),
             (-20, 56.5), (-12, 56.5)],
        start=(-52.0, 56.5, 0.0), target=(-12.0, 56.5, 0.0)),
}


@pytest.fixture(scope="module")
def maps_pair():
    import jax.numpy as jnp
    from PIL import Image
    import oracle_pipeline as op
    from tpu_pathopt import maps

    img = np.array(Image.open(GRIDMAP).convert("L"))
    assert img.shape == (701, 710)          # demo.cpp:98 fixture
    om = op.build_map(img < 128, resolution=0.2)
    gm = maps.build_map(jnp.asarray(img < 128), resolution=0.2)
    return gm, om


@pytest.fixture(scope="module")
def stage_runner():
    """One jitted stage-by-stage pipeline shared by all routes (shapes are
    identical across routes, so this compiles once)."""
    import jax
    from tpu_pathopt import pipeline
    from tpu_pathopt.config import PlannerConfig
    from tpu_pathopt.qp.admm import QPSettings

    cfg = PlannerConfig()
    settings = QPSettings()

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

    def runner(gm, route):
        import jax
        import jax.numpy as jnp
        from tpu_pathopt.cli import demo_scenario
        sc = demo_scenario(route["pts"], route["start"], route["target"])
        scs = jax.tree_util.tree_map(lambda a: jnp.asarray(a)[None], sc)
        return jax.tree_util.tree_map(np.asarray, run(gm, scs)), cfg

    return runner


@pytest.fixture(scope="module")
def results(maps_pair, stage_runner):
    """(pipeline stages, oracle dict, cfg) per route."""
    import oracle_pipeline as op
    gm, om = maps_pair
    out = {}
    for name, route in ROUTES.items():
        stages, cfg = stage_runner(gm, route)
        o = op.solve(om, [p[0] for p in route["pts"]],
                     [p[1] for p in route["pts"]],
                     route["start"], route["target"], cfg)
        out[name] = (stages, o, cfg, route)
    return out


def test_esdf_matches_reference_construction(maps_pair):
    gm, om = maps_pair
    assert np.max(np.abs(np.asarray(gm.esdf) - om.esdf)) < 2e-6


@pytest.mark.parametrize("name", list(ROUTES))
def test_stage_parity(results, name):
    stages, o, cfg, route = results[name]
    prep_out, smooth_out, cor, l_post, geo_out, sol1, sol2, outs = stages

    # Segmentation.
    n_seg = int(prep_out[6][0])
    assert n_seg == o["seg"]["n"]
    assert np.max(np.abs(prep_out[1][0][:n_seg] - o["seg"]["x"])) < 1e-4
    assert np.max(np.abs(prep_out[2][0][:n_seg] - o["seg"]["y"])) < 1e-4

    # Smoothing QP (w_dev = 0.005 leaves the endpoints weakly determined;
    # both solvers converge at 2e-3 — compare at the combined tolerance).
    assert bool(smooth_out[4][0]) and o["smooth"]["ok"]
    assert np.max(np.abs(smooth_out[0][0][:n_seg] - o["smooth"]["x"])) < 2e-2
    assert np.max(np.abs(smooth_out[1][0][:n_seg] - o["smooth"]["y"])) < 2e-2

    # DP corridor: layer count exact, bounds equal up to single 0.2 m
    # march-step flips on a small fraction of layers.
    nl = int(cor.n_layers[0])
    assert nl == o["corridor"]["n_layers"]
    assert np.max(np.abs(cor.layers_s[0][:nl] - o["corridor"]["layers_s"])) \
        < 1e-3
    for pipe_b, orac_b in ((cor.lower[0][:nl], o["corridor"]["lower"]),
                           (cor.upper[0][:nl], o["corridor"]["upper"])):
        diff = np.abs(pipe_b - orac_b)
        assert np.max(diff) < 0.2 + 1e-3
        assert np.mean(diff < 1e-3) >= 0.8

    # Post-smoothing QP.
    assert np.max(np.abs(l_post[0][:nl] - o["post"]["l"])) < 1e-3

    # Reference states after re-projection/trim/resample (incl. dynamic
    # segmentation when enabled): blocked truncation within one knot.
    ref, cb, init_offset, init_heading_error, ok_init, n_valid = geo_out
    nv, nvo = int(n_valid[0]), o["init"]["n_valid"]
    assert abs(nv - nvo) <= 1
    assert bool(cb.blocked[0]) == o["bounds"]["blocked"]
    assert abs(float(init_offset[0]) - o["init"]["offset"]) < 1e-3
    assert abs(float(init_heading_error[0]) - o["init"]["heading_error"]) \
        < 2e-3
    mv = min(nv, nvo)
    assert np.max(np.abs(ref.s[0][:mv] - o["ref"]["s"][:mv])) < 1e-3
    # Absolute x/y inherit the smoothing QP's flat-valley drift (w_dev=0.005
    # barely pins the line; both solvers stop at 2e-3) — compare at the
    # smoothing tolerance. The Frenet quantities (s, heading, k, l) that the
    # path QP actually consumes stay tight.
    assert np.max(np.abs(ref.x[0][:mv] - o["ref"]["x"][:mv])) < 2e-2
    assert np.max(np.abs(ref.y[0][:mv] - o["ref"]["y"][:mv])) < 2e-2
    assert np.max(np.abs(ref.heading[0][:mv] - o["ref"]["heading"][:mv])) \
        < 2e-3
    assert np.max(np.abs(ref.k[0][:mv] - o["ref"]["k"][:mv])) < 5e-4

    # Collision bounds: exact except single 0.05 m fine-march flips on a few
    # knots. Near the blockage (last knots of a blocked route) the corridor
    # is collapsing and a handful of knots sit on f32 razor edges: a 1-ulp
    # position difference across the 0.5 m clearance cutoff flips a march
    # step (or the in-collision gate, reference_path_impl.cpp:240-247), and
    # which knots flip changes with ANY recompilation (fusion order moves
    # the rounding). Measured on this route the tail is <= one fine quantum
    # on all but <= 3 knots. So instead of skipping the whole tail (rounds
    # 1-4): every tail knot except at most 3 razor-edge outliers must be
    # within one fine quantum, most must be tight, and the blocked index
    # itself is pinned within one knot by the n_valid check above.
    n_tail = 15 if o["bounds"]["blocked"] else 0
    core = slice(0, mv - n_tail)
    for pipe_b, orac_b in ((cb.front_lb, "front_lb"), (cb.front_ub, "front_ub"),
                           (cb.rear_lb, "rear_lb"), (cb.rear_ub, "rear_ub")):
        diff = np.abs(pipe_b[0][:mv] - o["bounds"][orac_b][:mv])
        assert np.max(diff[core]) < 0.05 + 2e-3, orac_b
        assert np.mean(diff[core] < 2e-3) >= 0.9, orac_b
        if n_tail:
            tail = np.sort(diff[mv - n_tail:])
            assert tail[-4] < 0.05 + 2e-3, (orac_b, tail)   # <= 3 outliers
            assert np.mean(tail < 2e-3) >= 0.6, (orac_b, tail)

    # Both QP passes converged on both sides.
    assert bool(sol1.converged[0]) and bool(sol2.converged[0])
    assert o["qp"]["ok"]


def test_end_to_end_parity_straight(results):
    """The unique-optimum route: full (l, heading, k) parity at the
    reference's 2e-3 OSQP tolerance, pipeline vs float64 oracle."""
    stages, o, cfg, route = results["straight"]
    *_, geo_out, sol1, sol2, outs = stages
    nv = int(geo_out[5][0])
    # Dynamic segmentation accumulates ~100 f32 vs f64 spacing steps; the
    # final knot can straddle max_s, flipping the count by one.
    assert abs(nv - o["init"]["n_valid"]) <= 1
    mv = min(nv, o["init"]["n_valid"])
    x_out, y_out, heading_out, l, e, k, dk, s_out = outs
    assert np.max(np.abs(l[0][:mv] - o["path"]["l"][:mv])) < 2e-3
    assert np.max(np.abs(heading_out[0][:mv] - o["path"]["heading"][:mv])) \
        < 2e-3
    assert np.max(np.abs(k[0][:mv] - o["path"]["k"][:mv])) < 2e-3


@pytest.mark.parametrize("name", list(ROUTES))
def test_qp_optimality_parity(results, name):
    """Same-inputs QP parity: the float64 oracle re-solves the pass-2 path QP
    on the PIPELINE's own (f64-cast) bounds/ref. The pipeline's solution must
    be feasible under the oracle's constraints and cost-optimal within
    tolerance of a high-accuracy (eps = 1e-6) float64 solve, with pointwise
    parity on the well-determined coordinates (kappa, e_psi)."""
    import oracle_pipeline as op
    stages, o, cfg, route = results[name]
    *_, geo_out, sol1, sol2, outs = stages
    ref, cb, init_offset, init_heading_error, ok_init, n_valid = geo_out
    nv = int(n_valid[0])

    refd = dict(s=np.float64(ref.s[0]), k=np.float64(ref.k[0]),
                heading=np.float64(ref.heading[0]), n_valid=nv)
    cbd = dict(front_lb=np.float64(cb.front_lb[0]),
               front_ub=np.float64(cb.front_ub[0]),
               rear_lb=np.float64(cb.rear_lb[0]),
               rear_ub=np.float64(cb.rear_ub[0]),
               blocked=bool(cb.blocked[0]), n_valid=nv)

    s1o, s2o = op.solve_path_qp_two_pass(
        refd, cbd, float(init_offset[0]), float(init_heading_error[0]),
        0.0, route["target"][2], cfg)
    assert s2o.status == "solved"
    vo = s2o.x.reshape(nv, 6)

    # Pointwise parity on the strongly-weighted coordinates.
    assert np.max(np.abs(sol2.v[0][:nv, 2] - vo[:, 2])) < 1e-3   # kappa
    assert np.max(np.abs(sol2.v[0][:nv, 1] - vo[:, 1])) < 5e-3   # e_psi

    # Optimality: cost of the pipeline's solution under the oracle's exact
    # pass-2 QP vs a high-accuracy optimum.
    P, q, A, lbq, ubq = op.assemble_path_qp(
        refd, cbd, np.float64(sol1.v[0][:nv, 0]),
        np.float64(sol1.v[0][:nv, 1]), np.float64(sol1.v[0][:nv, 2]),
        float(init_offset[0]), float(init_heading_error[0]), 0.0,
        route["target"][2], cbd["blocked"], cfg)
    xp = np.float64(sol2.v[0][:nv].reshape(-1))
    Ax = A @ xp
    feas_viol = float(np.maximum(lbq - Ax, Ax - ubq).max())
    assert feas_viol < 5e-3     # eps_abs 2e-3 + f32 headroom

    opt = op.qp_oracle.solve(P, q, A, lbq, ubq, eps_abs=1e-6, eps_rel=1e-6,
                             max_iter=20000)
    assert opt.status == "solved"
    def cost(x):
        return 0.5 * x @ P @ x + q @ x
    gap = cost(xp) - cost(opt.x)
    assert gap < max(1e-4, 5e-3 * abs(cost(opt.x)))
