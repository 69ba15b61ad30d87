"""Quickstart: batched path optimization with tpu_pathopt.

Builds a small synthetic obstacle map, solves a batch of scenarios through
the full pipeline (smoothing -> corridor -> bounds -> two-pass path QP),
inspects the per-scenario results, runs one warm-started replanning cycle,
and renders a PNG. Uses reduced static shapes so it runs in ~a minute on
CPU; drop the shape overrides for the production (reference-default)
configuration. Run:

    python examples/quickstart.py [--out quickstart.png]
"""

import argparse
import os
import sys

import numpy as np

# Make `python examples/quickstart.py` work from anywhere: the repo root
# (for `tpu_pathopt` and the top-level `bench` helper) is the script's
# parent directory, not sys.path[0].
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=None, help="optional PNG path")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from bench import enable_compilation_cache
    from tpu_pathopt import maps, pipeline, replan
    from tpu_pathopt.config import PlannerConfig

    enable_compilation_cache()   # persistent XLA cache: reruns start fast

    # --- 1. A grid map: boolean obstacle mask -> ESDF-backed GridMap. ---
    # 40 m x 40 m at 0.4 m/px: corridor walls plus one post mid-lane.
    res, size = 0.4, 100
    mask = np.zeros((size, size), bool)
    yy = (0.5 * size - 0.5 - np.arange(size)) * res   # col -> world y
    xx = (0.5 * size - 0.5 - np.arange(size)) * res   # row -> world x
    mask[:, np.abs(yy) >= 6.0] = True                  # corridor walls
    mask[np.ix_(np.abs(xx - 2.0) <= 1.0, (yy >= -6.0) & (yy <= 1.2))] = True
    gm = maps.build_map(jnp.asarray(mask), resolution=res)

    # --- 2. A scenario batch: raw reference polyline + start/target poses.
    # Every Scenario leaf gets a leading batch axis (vmap over a builder).
    R = 8                                    # padded raw-point capacity
    raw_x = np.concatenate([np.linspace(-15, 15, 6), np.full(R - 6, 15.0)])
    raw_y = np.zeros(R)

    def make(start_y, heading):
        z = jnp.float32
        return pipeline.Scenario(
            raw_x=jnp.asarray(raw_x, z), raw_y=jnp.asarray(raw_y, z),
            n_raw=jnp.asarray(6, jnp.int32),
            start_x=jnp.asarray(-15.0, z), start_y=start_y,
            start_heading=heading, start_k=jnp.asarray(0.0, z),
            target_x=jnp.asarray(15.0, z), target_y=jnp.asarray(0.0, z),
            target_heading=jnp.asarray(0.0, z))

    B = 8
    rng = np.random.default_rng(0)
    scs = jax.vmap(make)(
        jnp.asarray(rng.uniform(-1.5, 1.5, B), jnp.float32),
        jnp.asarray(rng.uniform(-0.2, 0.2, B), jnp.float32))

    # --- 3. Solve. PlannerConfig defaults mirror the reference's flags;
    # the *_knots/... overrides shrink the static shapes for a fast demo
    # compile (production uses the defaults: n_knots=128 etc.).
    cfg = PlannerConfig(n_knots=64, n_segment_points=32, dp_layers=24,
                        bspline_samples=64)
    res_b = pipeline.solve_batch_jit(gm, scs, cfg)

    ok = np.asarray(res_b.ok)
    print(f"solved {B} scenarios: ok={int(ok.sum())}/{B}, "
          f"blocked={int(np.asarray(res_b.blocked).sum())}, "
          f"mean QP iters={float(np.asarray(res_b.qp_iters).mean()):.0f}")
    i = int(np.argmax(ok))
    nv = int(np.asarray(res_b.n_valid)[i])
    k = np.asarray(res_b.k)[i, :nv]
    print(f"scenario {i}: {nv} knots, max |curvature| {np.abs(k).max():.3f} "
          f"(limit {cfg.kappa_limit:.3f})")

    # --- 4. Warm-started replanning cycles (the reference demo's 30 Hz
    # loop): each jitted replan_step solves, carries the QP solver state,
    # and advances the fleet 1 m along its solved paths.
    # replan.replan_stream drives whole streams of these.
    warm = pipeline.QPWarmStart.cold(B, cfg)
    res2, warm, scs2 = replan.replan_step(gm, scs, warm, cfg)   # cold cycle
    res3, _, _ = replan.replan_step(gm, scs2, warm, cfg)        # warm cycle
    print(f"replanned (warm): ok={int(np.asarray(res3.ok).sum())}/{B}, "
          f"mean QP iters={float(np.asarray(res3.qp_iters).mean()):.0f} "
          f"(vs {float(np.asarray(res2.qp_iters).mean()):.0f} cold)")

    # --- 5. Render. ---
    if args.out:
        from tpu_pathopt import viz
        one = jax.tree_util.tree_map(lambda a: a[i], res_b)
        sc_one = jax.tree_util.tree_map(lambda a: a[i], scs)
        viz.plot_result(gm, one, scenario=sc_one, path_out=args.out,
                        title="tpu_pathopt quickstart")
        print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
