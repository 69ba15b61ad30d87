"""Batch-wide property tests on an adversarial scenario mix.

SURVEY.md §4's strategy for the new framework: batched solutions must
satisfy the physical constraints the QP encodes — |kappa| within the
steering limit (base_solver.cpp:226-231), the lateral offset within the
soft collision corridor up to the slack the soft bounds permit
(:232-248, getSoftBounds :290-296), and infeasible scenarios must return
truncated candidate paths (isBlocked semantics,
reference_path_impl.cpp:220-229). Exercised here on one mixed batch drawn
from bench.py's adversarial generator (easy / pinched / slalom / dead-end
lanes) at the reference-default configuration.
"""

import numpy as np
import pytest

import bench
from tpu_pathopt.config import PlannerConfig

CFG = PlannerConfig()


@pytest.fixture(scope="module")
def mixed_batch():
    from tpu_pathopt import pipeline
    gm, scs, n_lane = bench.build_adversarial(batch=8)
    res = pipeline.solve_batch_jit(gm, scs, CFG)
    return gm, scs, res, n_lane


def test_mixed_batch_converges_and_blocked_lane_truncates(mixed_batch):
    gm, scs, res, n_lane = mixed_batch
    ok = np.asarray(res.ok)
    blocked = np.asarray(res.blocked)
    assert ok.all()
    # Lanes are [easy, tight, slalom, blocked] x n_lane.
    assert blocked[3 * n_lane:].all()
    assert not blocked[: 3 * n_lane].any()
    # Blocked candidates end before the dead-end wall (x = 10) and are
    # shorter than the unblocked solves.
    nv = np.asarray(res.n_valid)
    assert (nv[3 * n_lane:] < nv[:n_lane].min()).all()
    for b in range(3 * n_lane, 4 * n_lane):
        x = np.asarray(res.x[b])[: nv[b]]
        assert x.max() < 10.5


def test_curvature_within_steering_limit(mixed_batch):
    _, _, res, _ = mixed_batch
    nv = np.asarray(res.n_valid)
    k = np.asarray(res.k)
    for b in range(k.shape[0]):
        # ADMM stops at eps 2e-3 on the constraint residual.
        assert np.abs(k[b][: nv[b]]).max() <= CFG.kappa_limit + 5e-3


def test_path_within_soft_collision_corridor(mixed_batch):
    """l + L_axle * e_psi must stay inside the soft corridor up to the slack
    allowance; with converged solves and finite corridors the slack should
    be near zero except where the corridor pinches below the expected
    safety margin."""
    _, _, res, _ = mixed_batch
    nv = np.asarray(res.n_valid)
    l = np.asarray(res.l)
    e = np.asarray(res.d_heading)
    cb = res.bounds
    for b in range(l.shape[0]):
        n = nv[b]
        for L_ax, lb, ub in (
                (CFG.front_length, np.asarray(cb.front_lb[b]),
                 np.asarray(cb.front_ub[b])),
                (CFG.rear_length, np.asarray(cb.rear_lb[b]),
                 np.asarray(cb.rear_ub[b]))):
            pos = l[b][:n] + L_ax * e[b][:n]
            # Hard corridor (pre-softening) + solver tolerance: the slack
            # relaxes only the soft shrink, never the hard bounds beyond
            # the QP's own eps.
            assert (pos <= ub[:n] + 5e-2).all()
            assert (pos >= lb[:n] - 5e-2).all()


def test_path_is_collision_free(mixed_batch):
    """End-to-end: the optimized paths clear the actual obstacle field under
    the six-circle footprint check (post-validation API, collision.py)."""
    import jax
    from tpu_pathopt import collision
    gm, _, res, n_lane = mixed_batch
    car = collision.make_car_geometry(CFG)
    for b in range(np.asarray(res.ok).shape[0]):
        one = jax.tree_util.tree_map(lambda a: a[b], res)
        frac = float(collision.path_collision_free(gm, car, one))
        assert frac >= 0.95, f"scenario {b}: only {frac:.2f} collision-free"


def test_batch_permutation_invariance(mixed_batch):
    """The pipeline sorts scenarios twice internally (corridor-width order
    for QP pass 1, pass-1 iterations for pass 2) and scatters results back;
    per-scenario outputs must therefore be IDENTICAL regardless of the
    caller's batch order. Guards the order/inverse bookkeeping — a silent
    mis-permutation would assign solutions to the wrong scenarios."""
    import jax
    from tpu_pathopt import pipeline

    gm, scs, res, _ = mixed_batch
    B = int(scs.n_raw.shape[0])
    rng = np.random.default_rng(11)
    perm = rng.permutation(B)
    inv = np.argsort(perm)
    scs_p = jax.tree_util.tree_map(lambda a: a[perm], scs)
    res_p = pipeline.solve_batch_jit(gm, scs_p, CFG)
    for name in ("l", "k", "x", "y", "n_valid", "ok", "qp_iters"):
        a = np.asarray(getattr(res, name))
        b = np.asarray(getattr(res_p, name))[inv]
        np.testing.assert_array_equal(a, b, err_msg=name)
