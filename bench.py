"""Benchmark: batched end-to-end path solves per second per chip.

Runs the full pipeline (B-spline fit -> smoothing QP -> DP corridor ->
post-smooth QP -> bounds -> two-pass path QP) over a batch of randomized
scenarios on the default backend (TPU under the driver) and prints ONE JSON
line: {"metric", "value", "unit", "vs_baseline"} with vs_baseline relative to
the 1000 solves/s/chip north-star target (BASELINE.md).
"""

import json
import time

import numpy as np


def build_inputs(batch):
    import jax
    import jax.numpy as jnp
    from tpu_pathopt import maps, pipeline

    res, size = 0.2, 300
    mask = np.zeros((size, size), bool)
    yy = (0.5 * size - 0.5 - np.arange(size)) * res
    xx = (0.5 * size - 0.5 - np.arange(size)) * res
    mask[:, np.abs(yy) >= 24.0] = True
    mask[np.ix_((xx >= -5) & (xx <= 0), (yy >= -1) & (yy <= 24))] = True
    mask[np.ix_((xx >= 8) & (xx <= 12), (yy <= 1) & (yy >= -24))] = True
    gm = maps.build_map(jnp.asarray(mask), resolution=res)

    R = 16
    raw_x = np.linspace(-25, 25, 8)
    raw_y = np.zeros(8)
    raw_x = np.concatenate([raw_x, np.full(R - 8, raw_x[-1])])
    raw_y = np.concatenate([raw_y, np.full(R - 8, raw_y[-1])])
    rng = np.random.default_rng(0)
    off = rng.uniform(-1.5, 1.5, size=batch).astype(np.float32)
    head = rng.uniform(-0.15, 0.15, size=batch).astype(np.float32)

    def make(o, h):
        return pipeline.Scenario(
            raw_x=jnp.asarray(raw_x, jnp.float32),
            raw_y=jnp.asarray(raw_y, jnp.float32),
            n_raw=jnp.asarray(8, jnp.int32),
            start_x=jnp.asarray(-25.0, jnp.float32),
            start_y=jnp.asarray(0.0, jnp.float32) + o,
            start_heading=jnp.asarray(0.0, jnp.float32) + h,
            start_k=jnp.asarray(0.0, jnp.float32),
            target_x=jnp.asarray(25.0, jnp.float32),
            target_y=jnp.asarray(0.0, jnp.float32),
            target_heading=jnp.asarray(0.0, jnp.float32))

    scs = jax.vmap(make)(jnp.asarray(off), jnp.asarray(head))
    return gm, scs


def main():
    import jax
    from tpu_pathopt import pipeline
    from tpu_pathopt.config import PlannerConfig

    batch = 256
    cfg = PlannerConfig()
    gm, scs = build_inputs(batch)

    fn = lambda g, s: pipeline.solve_batch_jit(g, s, cfg)
    out = fn(gm, scs)            # compile + first run
    # NOTE: block_until_ready does not reliably synchronize on the remote
    # (axon) backend — force a device-to-host transfer instead.
    np.asarray(out.x)

    n_rep = 5
    t0 = time.time()
    for _ in range(n_rep):
        out = fn(gm, scs)
        np.asarray(out.x)
    dt = (time.time() - t0) / n_rep

    solves_per_s = batch / dt
    n_ok = int(np.asarray(out.ok).sum())
    result = {
        "metric": "batched end-to-end path solves/s/chip (horizon N=%d)"
                  % cfg.n_knots,
        "value": round(solves_per_s, 2),
        "unit": "solves/s",
        "vs_baseline": round(solves_per_s / 1000.0, 4),
        "batch": batch,
        "ok_fraction": n_ok / batch,
        "seconds_per_batch": round(dt, 4),
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
