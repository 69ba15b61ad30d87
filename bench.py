"""Benchmark: batched end-to-end path solves per second per chip.

Adversarial by construction (not a single easy corridor): one 60 m x 60 m map
with four lanes —

- easy:    a wide straight corridor,
- tight:   a corridor pinched to 3.0 m by staggered juts (2.0 m car),
- slalom:  four posts forcing an S-weave (high curvature),
- blocked: a dead-end wall mid-lane (candidate-path semantics,
           reference README.md:10),

and a 256-scenario batch mixing them 64/64/64/64 — so 25% of the batch is
blocked and the batched while_loop pays the slowest element's iterations.
The headline number is the MIXED batch throughput (config = the library
default, i.e. the reference-default config incl. dynamic segmentation).
Also reported: p50/p99 batch seconds across repetitions, ok/blocked
fractions, an easy-only batch for comparison, and a mixed batch on the
reference's real gridmap.png fixture when mounted.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline", ...};
vs_baseline is relative to the 1000 solves/s/chip north star (BASELINE.md).
"""

import json
import os
import time

import numpy as np

GRIDMAP = "/root/reference/gridmap.png"
R_RAW = 16   # padded raw reference points per scenario
# All bench maps are zero-padded to one canonical array shape so the three
# sections (adversarial 300x300, easy 300x300, gridmap.png 701x710 rows x
# cols) share a single compiled solve program (maps.GridMap carries the
# valid extent as dynamic scalars). 704x712 covers the reference fixture
# with 8-multiples.
PAD_SHAPE = (704, 712)


def _machine_fingerprint() -> str:
    """Short fingerprint of the host CPU microarchitecture. XLA:CPU embeds
    AOT-compiled machine code in its cache artifacts; reusing a cache entry
    written on a different CPU type can SIGILL (cpu_aot_loader warns exactly
    that). Keying the cache directory by this fingerprint makes entries
    machine-local while still persisting across processes/rounds."""
    import hashlib
    import platform
    bits = [platform.machine()]
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("model name", "flags", "Features")):
                    bits.append(line.strip())
                    if len(bits) >= 3:
                        break
    except OSError:
        bits.append(platform.processor() or "unknown")
    return hashlib.sha1("|".join(bits).encode()).hexdigest()[:10]


def enable_compilation_cache():
    """Persistent XLA compilation cache (survives processes/rounds): the
    pipeline compile is ~10 min on the TPU tunnel, ~0.2 s from cache.
    The directory is keyed by a CPU-microarch fingerprint so XLA:CPU AOT
    artifacts are never loaded on a machine type they weren't built for."""
    import jax
    d = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache",
                     _machine_fingerprint())
    os.makedirs(d, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", d)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)


def _scenarios(route_pts, starts, targets):
    """Build a Scenario batch from per-scenario raw polylines/poses."""
    import jax
    import jax.numpy as jnp
    from tpu_pathopt import pipeline

    def make(rx, ry, n, sx, sy, sh, tx, ty, th):
        return pipeline.Scenario(
            raw_x=rx, raw_y=ry, n_raw=n,
            start_x=sx, start_y=sy, start_heading=sh,
            start_k=jnp.zeros_like(sx),
            target_x=tx, target_y=ty, target_heading=th)

    raw_x = np.stack([p[0] for p in route_pts]).astype(np.float32)
    raw_y = np.stack([p[1] for p in route_pts]).astype(np.float32)
    n_raw = np.asarray([p[2] for p in route_pts], np.int32)
    s = np.asarray(starts, np.float32)
    t = np.asarray(targets, np.float32)
    return jax.vmap(make)(
        jnp.asarray(raw_x), jnp.asarray(raw_y), jnp.asarray(n_raw),
        jnp.asarray(s[:, 0]), jnp.asarray(s[:, 1]), jnp.asarray(s[:, 2]),
        jnp.asarray(t[:, 0]), jnp.asarray(t[:, 1]), jnp.asarray(t[:, 2]))


def _lane_route(y_lane, n_sc, rng, x0=-25.0, x1=25.0):
    """n_sc randomized scenarios along a straight lane at y = y_lane."""
    pts, starts, targets = [], [], []
    for _ in range(n_sc):
        off = rng.uniform(-1.0, 1.0)
        head = rng.uniform(-0.12, 0.12)
        xs = np.linspace(x0, x1, 8)
        ys = np.full(8, y_lane)
        rx = np.concatenate([xs, np.full(R_RAW - 8, xs[-1])])
        ry = np.concatenate([ys, np.full(R_RAW - 8, ys[-1])])
        pts.append((rx, ry, 8))
        starts.append((x0, y_lane + off, head))
        targets.append((x1, y_lane, 0.0))
    return pts, starts, targets


def build_adversarial(batch=256):
    """The 4-lane map + a mixed batch (easy/tight/slalom/blocked)."""
    import jax.numpy as jnp
    from tpu_pathopt import maps

    res, size = 0.2, 300
    mask = np.zeros((size, size), bool)
    xx = (0.5 * size - 0.5 - np.arange(size)) * res   # rows
    yy = (0.5 * size - 0.5 - np.arange(size)) * res   # cols

    def block(x_lo, x_hi, y_lo, y_hi):
        mask[np.ix_((xx >= x_lo) & (xx <= x_hi),
                    (yy >= y_lo) & (yy <= y_hi))] = True

    mask[:, np.abs(yy) >= 24.0] = True                # outer walls
    # lane separators
    for y_sep in (10.0, 0.0, -10.0):
        block(-30.0, 30.0, y_sep - 0.4, y_sep + 0.4)
    # tight lane (y in [0.8, 9.6]): staggered pinch juts -> 3.0 m gaps
    # (wide enough to clear the reference's 0.5 m clearance-march cutoff for
    # a 2.0 m car, narrow enough to engage the soft collision bounds)
    block(-10.0, -8.0, 0.8, 2.6)
    block(-10.0, -8.0, 5.6, 9.6)
    block(5.0, 7.0, 0.8, 4.0)
    block(5.0, 7.0, 7.0, 9.6)
    # slalom lane (y in [-9.6, -0.8]): four posts forcing an S-weave
    block(-16.0, -14.0, -9.6, -4.6)
    block(-6.0, -4.0, -5.8, -0.8)
    block(4.0, 6.0, -9.6, -4.6)
    block(14.0, 16.0, -5.8, -0.8)
    # blocked lane (y in [-23.6, -10.4]): dead-end wall across the lane
    block(10.0, 11.0, -23.6, -10.4)

    gm = maps.build_map(jnp.asarray(mask), resolution=res,
                        pad_shape=PAD_SHAPE)

    n = batch // 4
    rng = np.random.default_rng(0)
    lanes = [
        _lane_route(16.0, n, rng),            # easy (wide straight)
        _lane_route(5.0, n, rng),             # tight (pinched)
        _lane_route(-5.0, n, rng),            # slalom (high curvature)
        _lane_route(-17.0, n, rng),           # blocked (dead end)
    ]
    pts = sum((l[0] for l in lanes), [])
    starts = sum((l[1] for l in lanes), [])
    targets = sum((l[2] for l in lanes), [])
    return gm, _scenarios(pts, starts, targets), n


def build_easy(batch=256):
    """Round-1 style easy batch (one wide corridor) for comparison."""
    import jax.numpy as jnp
    from tpu_pathopt import maps

    res, size = 0.2, 300
    mask = np.zeros((size, size), bool)
    yy = (0.5 * size - 0.5 - np.arange(size)) * res
    mask[:, np.abs(yy) >= 24.0] = True
    gm = maps.build_map(jnp.asarray(mask), resolution=res,
                        pad_shape=PAD_SHAPE)
    rng = np.random.default_rng(1)
    pts, starts, targets = _lane_route(0.0, batch, rng)
    return gm, _scenarios(pts, starts, targets)


def build_gridmap(batch=64):
    """Mixed batch on the reference's real demo fixture (demo.cpp:94-113)."""
    import jax.numpy as jnp
    from PIL import Image
    from tpu_pathopt import maps

    img = np.array(Image.open(GRIDMAP).convert("L"))
    gm = maps.build_map(jnp.asarray(img < 128), resolution=0.2,
                        pad_shape=PAD_SHAPE)
    routes = {
        "straight": ([(-60, 56.5), (-54, 56.5), (-48, 56.5), (-42, 56.5),
                      (-36, 56.5), (-30, 56.5)],
                     (-60.0, 56.5, 0.0), (-30.0, 56.5, 0.0)),
        "scurve": ([(-52, 56.5), (-44, 56.0), (-37, 52.0), (-32, 45.0),
                    (-29.5, 38.0)],
                   (-52.0, 56.5, 0.0), (-29.5, 38.0, -1.2)),
        "blocked": ([(-52, 56.5), (-44, 56.5), (-36, 56.5), (-28, 56.5),
                     (-20, 56.5), (-12, 56.5)],
                    (-52.0, 56.5, 0.0), (-12.0, 56.5, 0.0)),
    }
    rng = np.random.default_rng(2)
    pts, starts, targets = [], [], []
    names = list(routes)
    for i in range(batch):
        rpts, start, target = routes[names[i % len(names)]]
        rx = np.asarray([p[0] for p in rpts], np.float64)
        ry = np.asarray([p[1] for p in rpts], np.float64)
        k = len(rx)
        rx = np.concatenate([rx, np.full(R_RAW - k, rx[-1])])
        ry = np.concatenate([ry, np.full(R_RAW - k, ry[-1])])
        pts.append((rx, ry, k))
        off = rng.uniform(-0.5, 0.5)
        starts.append((start[0], start[1] + off, start[2]))
        targets.append(target)
    return gm, _scenarios(pts, starts, targets)


def _time_batch(fn, gm, scs, reps, groups=1):
    """(result, per-batch synced seconds, pipelined seconds-per-batch,
    pipelined relative half-spread).

    Synced timing pays the host<->device round trip every batch (~25-50 ms
    on a tunneled TPU) — that is the single-query LATENCY. The pipelined
    number dispatches all reps back-to-back and syncs once — the serving
    THROUGHPUT, matching how a fleet actually feeds the chip (and how
    dist.solve_streamed runs). The headline uses the pipelined number.

    ``groups`` > 1 repeats the WHOLE reps-long pipelined measurement that
    many times and reports the median with a relative half-spread
    ((max-min)/2/median) — same methodology per measurement (so the series
    stays comparable across rounds), but the record carries its own noise
    floor instead of PERF.md's prose "~3% tunnel drift" claim."""
    import numpy as np
    out = fn(gm, scs)
    np.asarray(out.x)            # sync (block_until_ready unreliable on axon)
    times = []
    for _ in range(reps):
        t0 = time.time()
        out = fn(gm, scs)
        np.asarray(out.x)
        times.append(time.time() - t0)
    rates = []
    for _ in range(groups):
        t0 = time.time()
        for _ in range(reps):
            out = fn(gm, scs)
        np.asarray(out.x)
        rates.append((time.time() - t0) / reps)
    pipelined = float(np.median(rates))
    spread = float((np.max(rates) - np.min(rates)) / 2.0 / pipelined)
    return out, np.asarray(times), pipelined, spread


def stream_64k(n_total=65536):
    """64k-scenario streamed sharded run (BASELINE.md scaling config): the
    mixed adversarial batch streamed through ``dist.solve_streamed`` on a
    mesh over all local devices. Returns the stats dict (also runs inside
    ``main``; ``python bench.py --stream64k`` prints it as its own line).

    Warm-up is a short UNTIMED stream through the identical code path, not
    just a ``solve_sharded`` call: per-batch dispatch tracing (round 5)
    showed a one-time ~0.4 s stall on the first streamed dispatches that a
    plain warmed call does not absorb; past it, the steady-state stream
    runs at the plain pipelined rate (gap p50 ~1 ms/batch, flat across all
    four quarters of a 256-batch stream — the round-4 record's 39% deficit
    did not reproduce once warm-up covered the stream path itself)."""
    import jax
    from tpu_pathopt import dist
    from tpu_pathopt.config import PlannerConfig

    cfg = PlannerConfig()
    mesh = dist.make_mesh()
    batch = 256
    gm, scs, _ = build_adversarial(batch)
    # Warm up / compile OUTSIDE the timed stream, through the stream path.
    dist.solve_streamed(gm, (scs for _ in range(2)), cfg, mesh)
    total, dt, sps = dist.solve_streamed(
        gm, (scs for _ in range(n_total // batch)), cfg, mesh)
    return {
        "metric": "streamed 64k-scenario sharded run",
        "value": round(sps, 2), "unit": "solves/s",
        "vs_baseline": round(sps / 1000.0, 4),
        "n_total": int(total.n_total), "n_ok": int(total.n_ok),
        "n_blocked": int(total.n_blocked), "seconds": round(dt, 2),
        "n_devices": len(jax.devices()),
    }


# TPU v5e ("v5 lite") public peaks, the roofline axes. The pipeline is
# f32 VPU/gather work, so bf16-MXU peak is a deliberately generous
# denominator — the point of the table is the ORDER of magnitude: stages
# sitting at ~1e-3 of both compute and bandwidth peaks are bound by
# neither; their ceiling is serial latency (dependent-op chains) or
# gather-issue rate (measured, PERF.md).
V5E_PEAK_BF16_FLOPS = 197e12
V5E_HBM_BYTES_S = 819e9
MEASURED_GATHER_IDX_S = 0.18e9       # march-pattern ceiling (PERF.md)


def roofline(batch=256, reps=5):
    """Per-stage roofline accounting on the adversarial batch: XLA's own
    compiled-program cost model (flops + bytes accessed) per stage, the
    analytic ESDF-probe counts for the gather-bound stages, and measured
    per-stage device times — reported as achieved rates vs the v5e peaks
    and the measured gather ceiling, with a binding-resource verdict. This
    makes PERF.md's "at the gather ceiling" claims auditable numbers
    (VERDICT r4 #2)."""
    import jax
    from tpu_pathopt import bounds as bounds_mod
    from tpu_pathopt import corridor as corridor_mod
    from tpu_pathopt import pipeline
    from tpu_pathopt.config import PlannerConfig

    cfg = PlannerConfig()
    settings = cfg.qp_settings()
    gm, scs, _ = build_adversarial(batch)
    B, N, L, K = batch, cfg.n_knots, cfg.dp_layers, cfg.dp_laterals

    # Analytic ESDF probe counts per SOLVE (each probe = one packed
    # quad-stencil gather, 16 B row), derived from the march modules' own
    # step constants so the accounting cannot silently drift from the code:
    # - bounds (clearance_strict over (2 axles, N)): 2 sides x (coarse +
    #   fine) march steps + 1 origin probe per axle-knot;
    # - corridor: L*K lattice nodes + expansion marches 2 sides x L steps.
    march_steps = bounds_mod._COARSE_STEPS + bounds_mod._FINE_STEPS
    probes = {
        "bounds": N * 2 * (2 * march_steps + 1),
        "corridor": L * K + 2 * L * corridor_mod._EXPAND_STEPS,
    }

    # Mirror solve_batch_profiled's stage chain, but AOT-compile each stage
    # so XLA's cost analysis is read from the exact program that runs.
    stats = {}
    order = []

    def _sync(out):
        # block_until_ready can resolve before the computation retires on
        # the axon tunnel (see SKILL.md); fetching a leaf is the real sync.
        np.asarray(jax.tree_util.tree_leaves(out)[0])

    def run_stage(name, fn, *args, **statics):
        # One AOT compile per stage, used for BOTH cost_analysis and the
        # timed runs (calling the jit wrapper after lower().compile() would
        # compile the identical program a second time through the jit
        # cache; a Compiled executable takes only the dynamic args).
        jfn = jax.jit(fn, static_argnames=tuple(statics))
        compiled = jfn.lower(*args, **statics).compile()
        ca = compiled.cost_analysis()
        if not isinstance(ca, dict):          # older jax returns [dict]
            ca = ca[0]
        out = compiled(*args)
        _sync(out)
        t0 = time.time()
        for _ in range(reps):
            out = compiled(*args)
        _sync(out)
        dt = (time.time() - t0) / reps
        stats[name] = {
            "time_ms": dt * 1e3,
            "flops": float(ca.get("flops", 0.0)),
            "bytes": float(ca.get("bytes accessed", 0.0)),
        }
        order.append(name)
        return out

    with jax.default_matmul_precision("highest"):
        prep_out = run_stage("prep", pipeline.stage_prep, scs, config=cfg)
        smooth_out = run_stage("smooth", pipeline.stage_smooth, gm, prep_out,
                               config=cfg, settings=settings)
        xs2, ys2, cor = run_stage("corridor", pipeline.stage_corridor, gm,
                                  scs, smooth_out, config=cfg)
        l_post, _ = run_stage("post_smooth", pipeline.stage_post_smooth, cor,
                              config=cfg, settings=settings)
        geo_out = run_stage("bounds", pipeline.stage_geometry, gm, scs, xs2,
                            ys2, cor, l_post, config=cfg)
        sol1, sol2 = run_stage("path_qp", pipeline.stage_path_qp, scs,
                               geo_out, config=cfg, settings=settings)
        run_stage("finalize", pipeline.stage_finalize, geo_out[0], sol2,
                  geo_out[5], config=cfg)

    mean_iters = float(np.mean(np.asarray(sol1.iters + sol2.iters)))
    table = {}
    for name in order:
        s = stats[name]
        t = s["time_ms"] / 1e3
        fl_ut = s["flops"] / t / V5E_PEAK_BF16_FLOPS if t > 0 else 0.0
        # XLA's "bytes accessed" counts every LOGICAL operand access before
        # fusion dedup (fusion-internal traffic that never leaves VMEM is
        # included), so bytes/t is an UPPER BOUND on HBM bandwidth use, not
        # a utilization — values can exceed 1.0 of peak. It still bounds:
        # a stage whose logical-bytes rate is far BELOW peak is certainly
        # not bandwidth-bound.
        bw_ub = s["bytes"] / t / V5E_HBM_BYTES_S if t > 0 else 0.0
        row = {
            "time_ms": round(s["time_ms"], 2),
            "est_gflops_per_solve": round(s["flops"] / B / 1e9, 4),
            "est_logical_mbytes_per_solve": round(s["bytes"] / B / 1e6, 3),
            "achieved_flops_frac_of_peak": round(fl_ut, 5),
            "hbm_frac_upper_bound": round(bw_ub, 5),
        }
        if name in probes:
            idx = probes[name] * B
            row["est_gather_idx_per_solve"] = probes[name]
            row["achieved_gather_gidx_s"] = round(idx / t / 1e9, 3)
            row["gather_frac_of_measured_ceiling"] = round(
                idx / t / MEASURED_GATHER_IDX_S, 3)
            # Bound verdict: compute utilization is negligible and the
            # probe rate reaches a large share of the measured per-index
            # gather ceiling -> the gather issue rate is the binding
            # resource.
            row["bound"] = ("gather-issue"
                            if row["gather_frac_of_measured_ceiling"] > 0.4
                            and fl_ut < 0.02 else "mixed")
        else:
            # Non-gather stages at a tiny fraction of compute peak are
            # bound by serial latency (dependent-op chains: ADMM
            # iterations, scan sweeps), not by a hardware throughput axis.
            row["bound"] = ("serial-latency" if fl_ut < 0.02 else "compute")
        table[name] = row
    total_flops = sum(s["flops"] for s in stats.values()) / B
    total_bytes = sum(s["bytes"] for s in stats.values()) / B
    return {
        "batch": B,
        "mean_qp_iters": round(mean_iters, 1),
        "est_flops_per_solve": round(total_flops, 0),
        "est_logical_bytes_per_solve": round(total_bytes, 0),
        "stages": table,
        "peaks": {"bf16_flops": V5E_PEAK_BF16_FLOPS,
                  "hbm_bytes_s": V5E_HBM_BYTES_S,
                  "measured_gather_idx_s": MEASURED_GATHER_IDX_S},
    }


def replan_bench(batch=256, n_steps=16):
    """Warm-started replanning stream (the reference demo's 30 Hz loop,
    demo.cpp:133-211, as a batch — ``tpu_pathopt.replan``) vs the SAME
    stream run cold: measures the serving throughput of evolving queries
    and what the (v, y, rho) carry buys in ADMM iterations."""
    from tpu_pathopt import replan
    from tpu_pathopt.config import PlannerConfig

    cfg = PlannerConfig()
    gm, scs, _ = build_adversarial(batch)
    # Compile both step variants, then absorb the one-time program
    # (re)load with a short untimed stream IMMEDIATELY before each timed
    # one: on the tunneled device, compiling another large program evicts
    # the first executable, and its reload (~several s) otherwise lands in
    # whichever stream runs it next (measured round 5: 7.8 s vs 0.94 s for
    # the identical 16-step stream, zero recompiles logged).
    replan.replan_stream(gm, scs, cfg, n_steps=1)
    replan.replan_stream(gm, scs, cfg, n_steps=1, use_warm=False)
    replan.replan_stream(gm, scs, cfg, n_steps=3)
    sw = replan.replan_stream(gm, scs, cfg, n_steps=n_steps)
    replan.replan_stream(gm, scs, cfg, n_steps=3, use_warm=False)
    sc = replan.replan_stream(gm, scs, cfg, n_steps=n_steps, use_warm=False)
    return {
        "replan_solves_per_s": round(sw.solves_per_s, 2),
        "replan_solves_per_s_cold": round(sc.solves_per_s, 2),
        # Iterations on the warm cycles (cycle 0 is cold either way).
        "replan_iter_ratio": round(
            sw.mean_iters_rest / max(sc.mean_iters_rest, 1e-9), 4),
        "replan_mean_iters_warm": round(sw.mean_iters_rest, 1),
        "replan_mean_iters_cold": round(sc.mean_iters_rest, 1),
        "replan_steps": n_steps,
        "replan_ok_fraction": round(sw.n_ok / sw.n_total, 4),
    }


def b1_latency(reps=30):
    """Single-scenario (B=1) solve latency against the reference's implicit
    real-time budget: the demo plans in a 30 Hz loop (demo.cpp:133), so one
    solve must fit well under 33 ms. Times a synced B=1 solve end-to-end,
    measures the host<->device tunnel RTT with a trivial jitted op, and
    reports both — device-side latency ~= synced latency minus RTT. Uses a
    tight-lane scenario (soft collision bounds engaged), a representative
    hard single query."""
    import jax
    import jax.numpy as jnp
    from tpu_pathopt import pipeline
    from tpu_pathopt.config import PlannerConfig

    cfg = PlannerConfig()
    gm, scs, _ = build_adversarial(8)            # 2 scenarios per lane
    sc1 = jax.tree_util.tree_map(lambda a: a[2:3], scs)   # tight lane

    out = pipeline.solve_batch_jit(gm, sc1, cfg)
    np.asarray(out.x)                            # compile + warm
    lat = []
    for _ in range(reps):
        t0 = time.time()
        out = pipeline.solve_batch_jit(gm, sc1, cfg)
        np.asarray(out.x)
        lat.append(time.time() - t0)

    triv = jax.jit(lambda x: x + 1.0)
    z = jnp.zeros((8,), jnp.float32)
    np.asarray(triv(z))
    rtts = []
    for _ in range(reps):
        t0 = time.time()
        np.asarray(triv(z))
        rtts.append(time.time() - t0)

    p50 = float(np.percentile(lat, 50)) * 1e3
    rtt = float(np.percentile(rtts, 50)) * 1e3
    dev = max(p50 - rtt, 0.0)
    return {
        "b1_latency_ms": round(p50, 2),          # synced, incl. tunnel RTT
        "b1_rtt_ms": round(rtt, 2),
        "b1_device_ms": round(dev, 2),
        "b1_budget_ms": 33.3,                    # demo.cpp:133 (30 Hz loop)
        "b1_scenario": "tight",
        # Both verdicts, explicitly (round-4 review: the synced figure sits
        # close to budget and is tunnel-jitter-sensitive; the device figure
        # is the hardware's answer, the synced one includes ~25-50 ms of
        # tunnel RTT a production deployment would not pay).
        "b1_within_budget": bool(dev < 33.3),
        "b1_within_budget_synced": bool(p50 < 33.3),
    }


def sweep(batches=(128, 256, 512, 1024), reps=8):
    """Batch-size sweep on the adversarial mix (``python bench.py --sweep``):
    prints solves/s for each B — the lane-chunked fused kernels (128 lanes per
    chunk) make the throughput-vs-B curve non-obvious."""
    from tpu_pathopt import pipeline
    from tpu_pathopt.config import PlannerConfig

    cfg = PlannerConfig()
    fn = lambda g, s: pipeline.solve_batch_jit(g, s, cfg)
    out = {}
    for b in batches:
        gm, scs, _ = build_adversarial(b)
        _, times, pipelined, _ = _time_batch(fn, gm, scs, reps)
        out[b] = round(b / pipelined, 2)
        print(json.dumps({
            "batch": b, "solves_per_s": out[b],
            "synced_solves_per_s": round(b / float(np.mean(times)), 2),
            "p50_batch_s": round(float(np.percentile(times, 50)), 4)}))
    return out


def main():
    import sys
    import jax
    from tpu_pathopt import pipeline
    from tpu_pathopt.config import PlannerConfig

    t_start = time.time()
    # Sections run in priority order (headline -> gridmap fixture -> easy ->
    # streamed 64k), each in its own try/except (an exception in one
    # best-effort extra must not suppress the others) and each gated on the
    # remaining wall-clock budget. A provisional headline JSON line is printed
    # as soon as the headline number exists, so even a hard timeout later
    # leaves a parseable record; the final line (last JSON line on stdout)
    # supersedes it. All maps share PAD_SHAPE => one compile serves every
    # section, and the persistent compilation cache makes repeat runs start
    # in seconds instead of ~10 min.
    budget = float(os.environ.get("BENCH_BUDGET_S", "1500"))
    batch = int(os.environ.get("BENCH_BATCH", "256"))
    reps = int(os.environ.get("BENCH_REPS", "20"))
    cfg = PlannerConfig()      # the reference-default config, dyn-seg ON
    fn = lambda g, s: pipeline.solve_batch_jit(g, s, cfg)

    print("bench: compiling + timing adversarial batch...", file=sys.stderr,
          flush=True)
    gm, scs, n_lane = build_adversarial(batch)
    out, times, pipelined, spread = _time_batch(fn, gm, scs, reps, groups=3)
    ok = np.asarray(out.ok)
    blocked = np.asarray(out.blocked)
    p50, p99 = float(np.percentile(times, 50)), float(np.percentile(times, 99))
    solves_per_s = batch / pipelined
    print(f"bench: adversarial done at t={time.time() - t_start:.0f}s",
          file=sys.stderr, flush=True)

    result = {
        "metric": "adversarial mixed-batch path solves/s/chip "
                  "(horizon N=%d, 25%% blocked, pipelined serving "
                  "throughput)" % cfg.n_knots,
        "value": round(solves_per_s, 2),
        "unit": "solves/s",
        # Median of 3 identical pipelined measurements; the half-spread is
        # the run's own noise floor (differences inside it are tunnel
        # drift, not build changes).
        "value_spread_frac": round(spread, 4),
        "vs_baseline": round(solves_per_s / 1000.0, 4),
        # The 1000/s north star predates the pipelined methodology; the
        # synced series is the one comparable to rounds 1-2 records.
        "vs_baseline_synced": round(
            batch / float(np.mean(times)) / 1000.0, 4),
        "batch": batch,
        "mix": "easy/tight/slalom/blocked = %d each" % n_lane,
        "ok_fraction": float(ok.mean()),
        "blocked_fraction": float(blocked.mean()),
        # Throughput (the headline `value`) is pipelined: batches dispatched
        # back-to-back, one sync — the serving pattern. p50/p99 are
        # round-trip LATENCY per synced batch and include the host<->device
        # tunnel RTT (~25-50 ms), so p50 * value != batch in general.
        "synced_solves_per_s": round(batch / float(np.mean(times)), 2),
        "p50_batch_s": round(p50, 4),
        "p99_batch_s": round(p99, 4),
        "easy_solves_per_s": None,
        "gridmap_solves_per_s": None,
        "gridmap_ok_fraction": None,
        "stream64k_solves_per_s": None,
        "b1_latency_ms": None,
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(result), flush=True)   # provisional headline

    def remaining():
        return budget - (time.time() - t_start)

    try:
        if os.path.exists(GRIDMAP) and remaining() > 30:
            # Same batch + padded map shape as adversarial -> no recompile.
            gm_g, scs_g = build_gridmap(batch)
            out_g, times_g, pipe_g, _ = _time_batch(fn, gm_g, scs_g,
                                                    max(reps // 4, 3))
            result["gridmap_solves_per_s"] = round(batch / pipe_g, 2)
            result["gridmap_ok_fraction"] = float(
                np.asarray(out_g.ok).mean())
            result["gridmap_blocked_fraction"] = float(
                np.asarray(out_g.blocked).mean())
            print(f"bench: gridmap done at t={time.time() - t_start:.0f}s",
                  file=sys.stderr, flush=True)
    except Exception as e:
        print(f"bench: gridmap section failed: {e!r}", file=sys.stderr,
              flush=True)

    try:
        if remaining() > 30:
            gm_e, scs_e = build_easy(batch)
            out_e, times_e, pipe_e, _ = _time_batch(fn, gm_e, scs_e,
                                                    max(reps // 4, 3))
            result["easy_solves_per_s"] = round(batch / pipe_e, 2)
            print(f"bench: easy done at t={time.time() - t_start:.0f}s",
                  file=sys.stderr, flush=True)
    except Exception as e:
        print(f"bench: easy section failed: {e!r}", file=sys.stderr,
              flush=True)

    try:
        # Run the stream before the B=1 section (keeps the section order of
        # the round-4 record comparable).
        import gc
        gc.collect()
        # The sharded-stream program is a second compile (shard_map); gate on
        # a bigger margin when the cache is cold.
        if remaining() > max(90.0, 65536.0 / max(solves_per_s, 1.0) + 30):
            s = stream_64k()
            result["stream64k_solves_per_s"] = s["value"]
            result["stream64k_seconds"] = s["seconds"]
            result["stream64k_n_ok"] = s["n_ok"]
            # The honest streaming-overhead metric (VERDICT r4 #1): the
            # stream vs the SAME process's plain pipelined rate.
            result["stream64k_frac_of_plain"] = round(
                s["value"] / solves_per_s, 4)
            print(f"bench: stream64k done at t={time.time() - t_start:.0f}s",
                  file=sys.stderr, flush=True)
    except Exception as e:
        print(f"bench: stream64k section failed: {e!r}", file=sys.stderr,
              flush=True)

    try:
        # B=1 latency vs the reference's 30 Hz budget (demo.cpp:133). A B=1
        # program is its own compile; the persistent cache amortizes it.
        # Runs BEFORE the replan/roofline extras: on a cold cache their many
        # fresh compiles could otherwise exhaust the budget and starve this
        # long-standing record field.
        if remaining() > 60:
            result.update(b1_latency())
            print(f"bench: b1 latency done at t={time.time() - t_start:.0f}s",
                  file=sys.stderr, flush=True)
    except Exception as e:
        print(f"bench: b1 latency section failed: {e!r}", file=sys.stderr,
              flush=True)

    try:
        # Warm-started replanning stream (reference demo's 30 Hz loop).
        if remaining() > 180:
            result.update(replan_bench())
            print(f"bench: replan done at t={time.time() - t_start:.0f}s",
                  file=sys.stderr, flush=True)
    except Exception as e:
        print(f"bench: replan section failed: {e!r}", file=sys.stderr,
              flush=True)

    try:
        # Roofline accounting (per-stage flops/bytes/probe rates vs peaks).
        # Stage programs are separate compiles; the persistent cache
        # amortizes them across rounds.
        if remaining() > 240:
            rf = roofline()
            result["est_flops_per_solve"] = rf["est_flops_per_solve"]
            result["est_logical_bytes_per_solve"] = \
                rf["est_logical_bytes_per_solve"]
            result["roofline_stages"] = rf["stages"]
            print(f"bench: roofline done at t={time.time() - t_start:.0f}s",
                  file=sys.stderr, flush=True)
    except Exception as e:
        print(f"bench: roofline section failed: {e!r}", file=sys.stderr,
              flush=True)

    print(json.dumps(result))


if __name__ == "__main__":
    import sys
    enable_compilation_cache()
    if "--stream64k" in sys.argv:
        print(json.dumps(stream_64k()))
    elif "--sweep" in sys.argv:
        sweep()
    elif "--roofline" in sys.argv:
        print(json.dumps(roofline(), indent=1))
    elif "--replan" in sys.argv:
        print(json.dumps(replan_bench()))
    else:
        main()
