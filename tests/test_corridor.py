"""Corridor search tests: the A* lattice variant (reference graphSearch,
reference_path_smoother.cpp:297-484) against behavioral properties and the DP
variant, plus an end-to-end pipeline run with corridor_method="ASTAR"."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_pathopt import corridor, maps, pipeline, splines
from tpu_pathopt.config import PlannerConfig

CFG = PlannerConfig()


@pytest.fixture(scope="module")
def blocky_map():
    """Corridor with an asymmetric obstacle block on the upper side."""
    res, size = 0.2, 300
    mask = np.zeros((size, size), bool)
    yy = (0.5 * size - 0.5 - np.arange(size)) * res
    xx = (0.5 * size - 0.5 - np.arange(size)) * res
    mask[:, np.abs(yy) >= 12.0] = True
    mask[np.ix_((xx >= -5) & (xx <= 0), (yy >= -1) & (yy <= 12))] = True
    return maps.build_map(jnp.asarray(mask), resolution=res)


def _straight_ref(length=50.0, x0=-25.0):
    s = jnp.linspace(0.0, length, 16)
    xs = splines.fit_natural(s, x0 + s)
    ys = splines.fit_natural(s, jnp.zeros_like(s))
    return xs, ys, length


def test_astar_corridor_avoids_obstacle(blocky_map):
    xs, ys, length = _straight_ref()
    cor = jax.jit(corridor.search_corridor_astar, static_argnums=7)(
        blocky_map, xs, ys, length, -25.0, 0.3, 0.0, CFG)
    assert bool(cor.ok)
    n = int(cor.n_layers)
    assert n >= 10
    ls = np.asarray(cor.layers_s)[:n]
    lo = np.asarray(cor.lower)[:n]
    up = np.asarray(cor.upper)[:n]
    assert (up[1:] >= lo[1:]).all()
    # Layers facing the obstacle block (x in [-5, 0] -> s in [20, 25]) must
    # have their upper bound below the block's lower edge (y = -1).
    zone = (ls >= 20.5) & (ls <= 24.5) & (np.arange(n) > 0)
    assert zone.any()
    assert up[zone].max() < -0.9
    # Free layers keep a wide corridor inside the +-12 m walls.
    free = (ls > 30.0) & (ls < 45.0)
    assert (up[free] > 5.0).all() and (lo[free] < -5.0).all()


def test_astar_matches_dp_on_free_map():
    """On an obstacle-free corridor both variants must return near-identical
    corridors (the walls dominate; costs differ but the geometry agrees)."""
    res, size = 0.2, 300
    mask = np.zeros((size, size), bool)
    yy = (0.5 * size - 0.5 - np.arange(size)) * res
    mask[:, np.abs(yy) >= 12.0] = True
    gm = maps.build_map(jnp.asarray(mask), resolution=res)
    xs, ys, length = _straight_ref()
    cor_a = jax.jit(corridor.search_corridor_astar, static_argnums=7)(
        gm, xs, ys, length, -25.0, 0.0, 0.0, CFG)
    cor_d = jax.jit(corridor.search_corridor, static_argnums=7)(
        gm, xs, ys, length, -25.0, 0.0, 0.0, CFG)
    na, nd = int(cor_a.n_layers), int(cor_d.n_layers)
    assert na == nd
    # Expansion thresholds differ slightly (1.2/1.3 half-width vs the DP
    # variant's half-width + 0.2 = 1.2 m for the 2 m car) -> one 0.2 m step.
    np.testing.assert_allclose(np.asarray(cor_a.upper[1:na]),
                               np.asarray(cor_d.upper[1:nd]), atol=0.41)
    np.testing.assert_allclose(np.asarray(cor_a.lower[1:na]),
                               np.asarray(cor_d.lower[1:nd]), atol=0.41)


def test_pipeline_with_astar(blocky_map):
    cfg = PlannerConfig(corridor_method="ASTAR")
    sc = pipeline.Scenario(
        raw_x=jnp.asarray(np.concatenate([np.linspace(-25, 25, 8),
                                          np.full(8, 25.0)]), jnp.float32),
        raw_y=jnp.zeros((16,), jnp.float32),
        n_raw=jnp.asarray(8, jnp.int32),
        start_x=jnp.asarray(-25.0), start_y=jnp.asarray(0.0),
        start_heading=jnp.asarray(0.0), start_k=jnp.asarray(0.0),
        target_x=jnp.asarray(25.0), target_y=jnp.asarray(0.0),
        target_heading=jnp.asarray(0.0))
    out = pipeline.solve_jit(blocky_map, sc, cfg)
    assert bool(out.ok)
    nv = int(out.n_valid)
    x = np.asarray(out.x)[:nv]
    y = np.asarray(out.y)[:nv]
    zone = (x >= -5.5) & (x <= 0.5)
    assert zone.any()
    assert y[zone].max() < -0.9


def test_hold_from_run_start_matches_scan_semantics():
    """The cummax run-start hold must reproduce the reference's
    nearest-infeasible-neighbor scan (reference_path_smoother.cpp:210-226)
    on random feasibility patterns: infeasible entries keep their own value,
    feasible entries take the value at the start of their contiguous run."""
    from tpu_pathopt.corridor import _hold_from_run_start
    rng = np.random.default_rng(11)
    for _ in range(20):
        L, K = 5, 17
        feas = rng.random((L, K)) < 0.6
        vals = rng.standard_normal((L, K)).astype(np.float32)

        def brute(reverse):
            f = feas[:, ::-1] if reverse else feas
            v = vals[:, ::-1] if reverse else vals
            out = np.empty_like(v)
            for i in range(L):
                for k in range(K):
                    j = k
                    while j > 0 and f[i, j] and f[i, j - 1]:
                        j -= 1
                    out[i, k] = v[i, j]
            return out[:, ::-1] if reverse else out

        for reverse in (False, True):
            got = np.asarray(_hold_from_run_start(
                jnp.asarray(feas), jnp.asarray(vals), reverse))
            np.testing.assert_array_equal(got, brute(reverse))


def test_dp_forward_pallas_matches_scan():
    """The fused DP forward kernel (one grid step per layer, frontier in
    VMEM scratch) must reproduce the lax.scan forward exactly — costs,
    parents and alive flags — including dead layers and INF propagation."""
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(7)
    B, Lm1, K = 5, 9, 11
    dir_all = jnp.asarray(rng.uniform(-np.pi, np.pi, (B, Lm1, K, K)),
                          jnp.float32)
    base = rng.uniform(0.0, 3.0, (B, Lm1, K, K))
    # Random infeasible edges + one fully dead layer in one scenario.
    base[rng.random((B, Lm1, K, K)) < 0.3] = corridor._INF
    base[1, 4] = corridor._INF
    base_all = jnp.asarray(base, jnp.float32)
    h_in = jnp.asarray(rng.uniform(-np.pi, np.pi, (B, Lm1)), jnp.float32)
    cost0 = np.full((B, K), corridor._INF, np.float32)
    cost0[np.arange(B), rng.integers(0, K, B)] = 0.0
    cost0 = jnp.asarray(cost0)
    dir0 = jnp.asarray(rng.uniform(-np.pi, np.pi, (B, 1)), jnp.float32)
    dir0 = jnp.broadcast_to(dir0, (B, K))
    w1 = 16.0

    ref = jax.vmap(lambda d, b, h, c0, d0: corridor._dp_forward_scan(
        d, b, h, c0, d0, w1))(dir_all, base_all, h_in, cost0, dir0)
    got = corridor._dp_forward_pallas(dir_all, base_all, h_in, cost0, dir0,
                                      w1, interpret=True)
    np.testing.assert_allclose(np.asarray(got[0]), np.asarray(ref[0]),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(got[1]), np.asarray(ref[1]))
    np.testing.assert_array_equal(np.asarray(got[2]), np.asarray(ref[2]))
