import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_pathopt import maps, pipeline
from tpu_pathopt.config import PlannerConfig

CFG = PlannerConfig()


@pytest.fixture(scope="module")
def corridor_map():
    """60x60 m corridor with an obstacle block on the upper side."""
    res, size = 0.2, 300
    mask = np.zeros((size, size), bool)
    yy = (0.5 * size - 0.5 - np.arange(size)) * res
    xx = (0.5 * size - 0.5 - np.arange(size)) * res
    mask[:, np.abs(yy) >= 12.0] = True
    mask[np.ix_((xx >= -5) & (xx <= 0), (yy >= -1) & (yy <= 12))] = True
    return maps.build_map(jnp.asarray(mask), resolution=res)


def _scenario(start=(-25.0, 0.0, 0.0), target=(25.0, 0.0, 0.0)):
    R = 16
    raw_x = np.linspace(-25, 25, 8)
    raw_y = np.zeros(8)
    raw_x = np.concatenate([raw_x, np.full(R - 8, raw_x[-1])])
    raw_y = np.concatenate([raw_y, np.full(R - 8, raw_y[-1])])
    return pipeline.Scenario(
        raw_x=jnp.asarray(raw_x, jnp.float32),
        raw_y=jnp.asarray(raw_y, jnp.float32),
        n_raw=jnp.asarray(8, jnp.int32),
        start_x=jnp.asarray(start[0]), start_y=jnp.asarray(start[1]),
        start_heading=jnp.asarray(start[2]), start_k=jnp.asarray(0.0),
        target_x=jnp.asarray(target[0]), target_y=jnp.asarray(target[1]),
        target_heading=jnp.asarray(target[2]))


@pytest.fixture(scope="module")
def solved(corridor_map):
    return pipeline.solve_jit(corridor_map, _scenario(), CFG)


def test_pipeline_succeeds(solved):
    assert bool(solved.ok)
    assert not bool(solved.blocked)
    assert int(solved.n_valid) > 60


def test_path_avoids_obstacle(solved):
    nv = int(solved.n_valid)
    x = np.asarray(solved.x)[:nv]
    y = np.asarray(solved.y)[:nv]
    # Obstacle block spans x in [-5, 0], y in [-1, 12]; with half car width
    # 1 m the center must stay below y ~= -1.
    zone = (x >= -5.5) & (x <= 0.5)
    assert zone.any()
    assert y[zone].max() < -0.9


def test_path_respects_curvature_limit(solved):
    nv = int(solved.n_valid)
    k = np.asarray(solved.k)[:nv]
    assert np.abs(k).max() <= CFG.kappa_limit + 1e-3


def test_path_starts_at_vehicle(solved):
    # Initial-offset pin: the first path point is the vehicle position.
    assert abs(float(solved.x[0]) - (-25.0)) < 0.3
    assert abs(float(solved.y[0]) - 0.0) < 0.3


def test_blocked_scenario_truncates(corridor_map):
    res, size = 0.2, 300
    mask = np.zeros((size, size), bool)
    yy = (0.5 * size - 0.5 - np.arange(size)) * res
    xx = (0.5 * size - 0.5 - np.arange(size)) * res
    mask[:, np.abs(yy) >= 12.0] = True
    mask[np.abs(xx - 10.0) < 0.5, :] = True     # full wall at x = 10
    gm = maps.build_map(jnp.asarray(mask), resolution=res)
    res_p = pipeline.solve_jit(gm, _scenario(), CFG)
    # DP cannot pass the wall either, so the candidate path ends before it.
    nv = int(res_p.n_valid)
    assert nv > 5
    x = np.asarray(res_p.x)[:nv]
    assert x.max() < 10.5


def test_batch_matches_single(corridor_map):
    starts = [(-25.0, 0.0, 0.0), (-25.0, 2.0, 0.1)]
    scs = [_scenario(start=st) for st in starts]
    batch = jax.tree.map(lambda *xs: jnp.stack(xs), *scs)
    out = pipeline.solve_batch_jit(corridor_map, batch, CFG)
    assert bool(jnp.all(out.ok))
    single0 = pipeline.solve_jit(corridor_map, scs[0], CFG)
    nv = int(single0.n_valid)
    # vmapped and single compilations reassociate float reductions and ADMM
    # stops at tolerance, so agreement is only to the solver eps (2e-3).
    np.testing.assert_allclose(np.asarray(out.l[0][:nv]),
                               np.asarray(single0.l[:nv]), atol=2e-3)


def test_config_qp_fields_are_live(corridor_map):
    """PlannerConfig's qp_* fields must reach the DEVICE solvers when no
    explicit QPSettings is passed (settings=None derives them via
    PlannerConfig.qp_settings) — the round-4 review found them consumed
    only by the test oracle while cli.py --small silently ran the default
    4000-iteration cap."""
    from tpu_pathopt.qp.admm import QPSettings

    # The default-config derivation is the identity.
    assert PlannerConfig().qp_settings() == QPSettings()

    # Unreachable tolerance + a tiny iteration cap: if the cap is live the
    # path QP stops at exactly qp_max_iter per pass; if the dead default
    # (4000) still ruled, qp_iters would be 8000.
    cfg = PlannerConfig(n_knots=64, n_segment_points=32, dp_layers=24,
                        bspline_samples=64,
                        qp_eps_abs=0.0, qp_eps_rel=0.0,
                        qp_max_iter=50, qp_check_every=25)
    res = pipeline.solve_jit(corridor_map, _scenario(), cfg)
    assert int(res.qp_iters) == 100          # 2 passes x 50
    assert not bool(res.ok_qp)               # honest: did not converge


def test_scalar_rho0_broadcasts_in_chunked_solver(monkeypatch):
    """The advertised scalar-rho0 API must survive the chunked (B > 128,
    B % 128 == 0) TPU driver path, which reshapes the batch into 128-lane
    chunks (advisor finding, round 4: a scalar rho0 crashed resh()). The
    chunk branch only engages on TPU backends, so the backend probe is
    patched and the fused chunk solver stubbed — the code under test is the
    chunk driver's broadcast + reshape, not the kernels."""
    from tpu_pathopt.solver import path_solver
    from tpu_pathopt.solver.path_solver import PathQPSolution
    from tpu_pathopt.qp.admm import QPSettings

    B, N = 256, 16
    key = jax.random.PRNGKey(0)
    ref_s = jnp.cumsum(jnp.full((B, N), 0.3), axis=-1)
    ref_k = 0.01 * jax.random.normal(key, (B, N))
    zeros = jnp.zeros((B, N))
    qp = jax.vmap(
        lambda s, k, z: pipeline.assemble_path_qp(
            ref_s=s, ref_k=k, ref_heading_last=jnp.float32(0.0),
            input_l=z, input_e=z, input_k=k,
            front_lb=z - 2.0, front_ub=z + 2.0,
            rear_lb=z - 2.0, rear_ub=z + 2.0,
            init_offset=jnp.float32(0.0),
            init_heading_error=jnp.float32(0.0),
            start_k=jnp.float32(0.0), target_heading=jnp.float32(0.0),
            blocked=jnp.asarray(False),
            n_valid=jnp.asarray(N, jnp.int32), config=CFG,
            center_lb=z, center_ub=z))(ref_s, ref_k, zeros)

    chunk_rho_shapes = []

    def fake_chunk(qp_i, v0, yk, ye, settings, rho0=None):
        b = qp_i.p_diag.shape[0]
        n = qp_i.p_diag.shape[1]
        chunk_rho_shapes.append(None if rho0 is None else rho0.shape)
        rb = (jnp.zeros((b,)) if rho0 is None else rho0)
        return PathQPSolution(
            v=jnp.zeros((b, n, 6)), y_knot=jnp.zeros((b, n, 6)),
            y_end=jnp.zeros((b, 2)), iters=jnp.zeros((b,), jnp.int32),
            converged=jnp.ones((b,), bool), pri_res=jnp.zeros((b,)),
            dua_res=jnp.zeros((b,)), rho_bar=rb)

    monkeypatch.setattr(path_solver.jax, "default_backend", lambda: "tpu")
    monkeypatch.setattr(path_solver, "_solve_chunk_fused", fake_chunk)
    sol = path_solver._solve_batched_impl(
        qp, None, None, None, QPSettings(max_iter=50), rho0=0.2)
    assert sol.iters.shape == (B,)
    assert chunk_rho_shapes == [(128,)]      # broadcast before chunking


def test_geometry_chunking_matches_unchunked(corridor_map, monkeypatch):
    """stage_geometry chunks the batch at the B=512 knee (bounds the one-hot
    fusion working set, PERF.md batch sweep); chunked and unchunked paths
    must agree. Chunk size patched small so B=4 exercises the lax.map path."""
    from tpu_pathopt import pipeline as pl

    starts = [(-25.0, o, 0.0) for o in (-1.5, -0.5, 0.5, 1.5)]
    scs = [_scenario(start=st) for st in starts]
    batch = jax.tree.map(lambda *xs: jnp.stack(xs), *scs)
    out_plain = pipeline.solve_batch_jit(corridor_map, batch, CFG)
    monkeypatch.setattr(pl, "_GEO_CHUNK", 2)
    out_chunk = jax.jit(pl.solve_batch, static_argnames=("config",))(
        corridor_map, batch, CFG)
    assert bool(jnp.all(out_chunk.ok))
    nv = np.asarray(out_plain.n_valid)
    np.testing.assert_array_equal(nv, np.asarray(out_chunk.n_valid))
    # Same geometry feeds the same QP; solutions agree to solver tolerance
    # (the chunked vmap reassociates float reductions).
    for b in range(4):
        n = int(nv[b])
        np.testing.assert_allclose(np.asarray(out_chunk.l[b][:n]),
                                   np.asarray(out_plain.l[b][:n]), atol=2e-3)
        np.testing.assert_allclose(np.asarray(out_chunk.k[b][:n]),
                                   np.asarray(out_plain.k[b][:n]), atol=2e-3)
