"""Command-line demo driver.

Replaces the reference's interactive RViz node (reference: src/test/demo.cpp):
loads a grid map from a PNG (0 = obstacle, 255 = free, 0.2 m/px — the
reference's gridmap.png format) or generates a synthetic corridor map, builds
the ESDF, runs batched path optimization and renders the result to PNG.

Usage:
    python -m tpu_pathopt.cli --map /root/reference/gridmap.png \
        --out /tmp/demo.png
    python -m tpu_pathopt.cli --synthetic --batch 64
"""

from __future__ import annotations

import argparse
import time

import numpy as np


def load_png_map(path, resolution=0.2):
    from PIL import Image
    from tpu_pathopt.runtime import native
    img = np.array(Image.open(path).convert("L"))
    # Host-side native ESDF (C++ Felzenszwalb); falls back to the JAX EDT.
    return native.build_map_native(img < 128, resolution=resolution)


def synthetic_map(size=300, resolution=0.2):
    import jax.numpy as jnp
    from tpu_pathopt import maps
    mask = np.zeros((size, size), bool)
    yy = (0.5 * size - 0.5 - np.arange(size)) * resolution
    xx = (0.5 * size - 0.5 - np.arange(size)) * resolution
    mask[:, np.abs(yy) >= 0.4 * size * resolution] = True
    mask[np.ix_((xx >= -5) & (xx <= 0), (yy >= -1) & (yy <= 20))] = True
    mask[np.ix_((xx >= 8) & (xx <= 12), (yy <= 1) & (yy >= -20))] = True
    return maps.build_map(jnp.asarray(mask), resolution=resolution)


def demo_scenario(raw_points, start, target, n_raw_pad=16):
    import jax.numpy as jnp
    from tpu_pathopt import pipeline
    pts = np.asarray(raw_points, np.float32)
    n = len(pts)
    pad = np.tile(pts[-1], (n_raw_pad - n, 1))
    pts = np.concatenate([pts, pad])
    return pipeline.Scenario(
        raw_x=jnp.asarray(pts[:, 0]), raw_y=jnp.asarray(pts[:, 1]),
        n_raw=jnp.asarray(n, jnp.int32),
        start_x=jnp.asarray(start[0], jnp.float32),
        start_y=jnp.asarray(start[1], jnp.float32),
        start_heading=jnp.asarray(start[2], jnp.float32),
        start_k=jnp.asarray(0.0, jnp.float32),
        target_x=jnp.asarray(target[0], jnp.float32),
        target_y=jnp.asarray(target[1], jnp.float32),
        target_heading=jnp.asarray(target[2], jnp.float32))


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--map", type=str, default=None,
                        help="PNG obstacle map (0=occupied, 255=free)")
    parser.add_argument("--resolution", type=float, default=0.2)
    parser.add_argument("--synthetic", action="store_true")
    parser.add_argument("--cpu", action="store_true", help="force CPU backend")
    parser.add_argument("--out", type=str, default="demo_path.png")
    parser.add_argument("--batch", type=int, default=0,
                        help="also time a batched solve of this size")
    parser.add_argument("--points", type=str, default=None,
                        help="raw ref points as 'x1,y1;x2,y2;...'")
    parser.add_argument("--start", type=str, default=None, help="'x,y,heading'")
    parser.add_argument("--target", type=str, default=None, help="'x,y,heading'")
    parser.add_argument("--profile", action="store_true",
                        help="per-stage timing (the reference's TimeRecorder, "
                             "path_optimizer.cpp:41-69)")
    parser.add_argument("--verbose-qp", action="store_true",
                        help="print the path QP's per-round ADMM residuals "
                             "for this solve (the reference runs OSQP with "
                             "verbose=true, base_solver.cpp:59)")
    parser.add_argument("--small", action="store_true",
                        help="small static shapes (fast compile preview)")
    # The reference demo is driven by gflags on its command line
    # (--smoothing_method etc., planning_flags.cpp); expose the live method
    # toggles the same way.
    parser.add_argument("--smoothing-method", choices=["TENSION", "TENSION2"],
                        default="TENSION2",
                        help="reference FLAGS_smoothing_method "
                             "(planning_flags.cpp:27)")
    parser.add_argument("--corridor-method", choices=["DP", "ASTAR"],
                        default="DP",
                        help="DP (graphSearchDp, the reference's live path) "
                             "or the A* variant")
    args = parser.parse_args(argv)

    if args.cpu:
        import os
        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax
        jax.config.update("jax_platforms", "cpu")

    import jax
    import jax.numpy as jnp
    from tpu_pathopt import pipeline, viz
    from tpu_pathopt.config import PlannerConfig

    method_kw = dict(smoothing_method=args.smoothing_method,
                     corridor_method=args.corridor_method)
    cfg = (PlannerConfig(n_knots=64, n_segment_points=32, dp_layers=24,
                         bspline_samples=64, qp_max_iter=1000, **method_kw)
           if args.small else PlannerConfig(**method_kw))
    if args.map:
        gm = load_png_map(args.map, args.resolution)
        # Default demo route: a wide corridor of the reference's gridmap.png
        # (>= 3 m clearance along the way, found from the ESDF).
        default_pts = [(-62, 56.5), (-55, 56.5), (-48, 56.5), (-41, 56.5),
                       (-34, 56.5), (-28, 56.5), (-22, 56.5)]
        default_start = (-62.0, 56.5, 0.0)
        default_target = (-22.0, 56.5, 0.0)
    else:
        gm = synthetic_map()
        default_pts = [(-25, 0), (-18, 0), (-11, 0), (-4, 0), (3, 0),
                       (10, 0), (18, 0), (25, 0)]
        default_start = (-25.0, 0.0, 0.0)
        default_target = (25.0, 0.0, 0.0)

    pts = (default_pts if args.points is None else
           [tuple(map(float, p.split(","))) for p in args.points.split(";")])
    start = (default_start if args.start is None else
             tuple(map(float, args.start.split(","))))
    target = (default_target if args.target is None else
              tuple(map(float, args.target.split(","))))

    sc = demo_scenario(pts, start, target)
    print(f"devices: {jax.devices()}")
    t0 = time.time()
    result = pipeline.solve_jit(gm, sc, cfg)
    result.x.block_until_ready()
    t_first = time.time() - t0
    t0 = time.time()
    result = pipeline.solve_jit(gm, sc, cfg)
    result.x.block_until_ready()
    t_warm = time.time() - t0
    nv = int(result.n_valid)
    print(f"solve: ok={bool(result.ok)} blocked={bool(result.blocked)} "
          f"knots={nv} qp_iters={int(result.qp_iters)}")
    print(f"timing: first (compile) {t_first:.1f}s, warm {t_warm * 1e3:.1f}ms")
    if args.profile:
        from tpu_pathopt import profiling
        scs1 = jax.tree_util.tree_map(lambda a: jnp.asarray(a)[None], sc)
        pipeline.solve_batch_profiled(gm, scs1, cfg)       # compile stages
        rec = profiling.TimeRecorder("pipeline")
        pipeline.solve_batch_profiled(gm, scs1, cfg, recorder=rec)
        print(rec.print_time())
    if args.verbose_qp:
        # Per-round ADMM residual trace of this solve's pass-1 path QP —
        # the surface the reference gets from OSQP's verbose=true
        # (base_solver.cpp:59 prints residuals at every check interval).
        from tpu_pathopt.solver.path_solver import trace_path_rounds
        st = cfg.qp_settings()
        scs1 = jax.tree_util.tree_map(lambda a: jnp.asarray(a)[None], sc)

        @jax.jit
        def geo(gm_, scs_):
            with jax.default_matmul_precision("highest"):
                return pipeline.run_to_geometry(gm_, scs_, cfg, st)[0]

        geo_out = geo(gm, scs1)
        qp1 = jax.tree_util.tree_map(lambda a: a[0],
                                     pipeline.build_path_qp(scs1, geo_out,
                                                            cfg))
        # Cap the traced rounds (the trace is an unrolled scan; 40 rounds =
        # 1000 iterations covers every converging bench scenario) but SAY
        # so when the solve needs more — OSQP's verbose=true prints to
        # termination, so an unmarked cut would read as non-convergence.
        # Ceil division: the solver's while loop runs a final PARTIAL round
        # when max_iter is not a multiple of check_every — floor would drop
        # it and a solve converging there would print as truncated.
        n_rounds = min(40, max(-(-cfg.qp_max_iter // cfg.qp_check_every), 1))
        # rho0 = rho_bar_path matches what stage_path_qp seeds pass 1 with.
        # Caveat: the trace runs the scalar round body; the batched TPU
        # solve runs the fused Pallas chunk kernels — same math, but float
        # reassociation can shift razor-edge check outcomes by a round.
        tr = jax.tree_util.tree_map(
            np.asarray, trace_path_rounds(qp1, st, n_rounds=n_rounds,
                                          rho0=st.rho_bar_path))
        print("path QP pass 1, per-round residuals "
              "(OSQP verbose equivalent):")
        print(f"  {'iter':>5} {'pri_res':>12} {'dua_res':>12} {'rho':>10}")
        converged = False
        for r in range(n_rounds):
            print(f"  {int(tr['iters'][r]):>5} {tr['pri_res'][r]:>12.3e} "
                  f"{tr['dua_res'][r]:>12.3e} {tr['rho_bar'][r]:>10.4f}"
                  + ("   converged" if bool(tr["converged"][r]) else ""))
            if bool(tr["converged"][r]):
                converged = True
                break
        if not converged:
            print(f"  ... trace truncated after {int(tr['iters'][-1])} "
                  f"iterations (solver max_iter {st.max_iter}; not yet "
                  f"converged at the last traced check)")
    if not bool(result.ok):
        # Failure diagnostic (the reference's logBoundsInfo,
        # reference_path_impl.cpp:88-95).
        from tpu_pathopt import diagnostics
        print(diagnostics.dump_bounds(result))
    if nv:
        k = np.abs(np.asarray(result.k)[:nv]).max()
        print(f"max |curvature| {k:.4f} (limit {cfg.kappa_limit:.4f})")
    out = viz.plot_result(gm, result, sc, path_out=args.out, config=cfg)
    print(f"wrote {out}")

    if args.batch:
        B = args.batch
        rng = np.random.default_rng(0)
        offs = rng.uniform(-1.5, 1.5, size=B).astype(np.float32)
        scs = jax.vmap(
            lambda off: sc.replace(start_y=sc.start_y + off))(jnp.asarray(offs))
        t0 = time.time()
        batch_res = pipeline.solve_batch_jit(gm, scs, cfg)
        batch_res.x.block_until_ready()
        t_compile = time.time() - t0
        t0 = time.time()
        batch_res = pipeline.solve_batch_jit(gm, scs, cfg)
        batch_res.x.block_until_ready()
        dt = time.time() - t0
        n_ok = int(jnp.sum(batch_res.ok))
        print(f"batch {B}: {n_ok}/{B} ok, compile {t_compile:.1f}s, "
              f"run {dt * 1e3:.1f}ms -> {B / dt:.1f} solves/s")


if __name__ == "__main__":
    main()
