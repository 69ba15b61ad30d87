"""Multi-host (multi-process) distributed execution test.

SURVEY.md §2.8/§5.8: the engine's cross-host story is ``jax.distributed`` +
a global mesh with the scenario batch sharded over it. Real pods are not
available in CI, so this launches two OS processes, each with 4 virtual CPU
devices (8 global), initializes the distributed runtime against a local
coordinator, feeds each process its local half of a 16-scenario batch via
``dist.make_global_batch``, and runs the sharded solve with its psum fleet
reductions across the process boundary. The replicated FleetStats must agree
between the two processes and with a single-process solve of the same batch.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

_WORKER = r"""
import json, os, sys
pid, nproc, port, outdir = (int(sys.argv[1]), int(sys.argv[2]), sys.argv[3],
                            sys.argv[4])
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np
from bench import enable_compilation_cache
from tpu_pathopt import dist, maps, pipeline
from tpu_pathopt.config import PlannerConfig
from tpu_pathopt.qp.admm import QPSettings

enable_compilation_cache()

n = dist.init_distributed(f"localhost:{port}", num_processes=nproc,
                          process_id=pid)
assert n == nproc and jax.process_count() == nproc
assert len(jax.local_devices()) == 4 and len(jax.devices()) == 4 * nproc

cfg = PlannerConfig(n_knots=16, n_segment_points=16, dp_layers=8,
                    dp_laterals=9, bspline_samples=32, qp_max_iter=100)
st = QPSettings(max_iter=100)

res_m, size = 0.4, 100
mask = np.zeros((size, size), bool)
yy = (0.5 * size - 0.5 - np.arange(size)) * res_m
mask[:, np.abs(yy) >= 15.0] = True
gm = maps.build_map(jnp.asarray(mask), resolution=res_m)

B = 16
offs_global = np.linspace(-0.5, 0.5, B).astype(np.float32)
lo = pid * (B // nproc)
offs_local = offs_global[lo:lo + B // nproc]
R = 8
raw_x = np.concatenate([np.linspace(-12, 12, 6), np.full(R - 6, 12.0)])
raw_y = np.zeros(R)

def make(off):
    return pipeline.Scenario(
        raw_x=jnp.asarray(raw_x, jnp.float32),
        raw_y=jnp.asarray(raw_y, jnp.float32),
        n_raw=jnp.asarray(6, jnp.int32),
        start_x=jnp.asarray(-12.0, jnp.float32),
        start_y=jnp.asarray(0.0, jnp.float32) + off,
        start_heading=jnp.asarray(0.0, jnp.float32),
        start_k=jnp.asarray(0.0, jnp.float32),
        target_x=jnp.asarray(12.0, jnp.float32),
        target_y=jnp.asarray(0.0, jnp.float32),
        target_heading=jnp.asarray(0.0, jnp.float32))

scs_local = jax.vmap(make)(jnp.asarray(offs_local))
mesh = dist.make_mesh()
gm_g, scs_g = dist.make_global_batch(gm, scs_local, mesh)
res, stats = dist.solve_sharded(gm_g, scs_g, cfg, mesh, st)

# Local shard of the sharded result: this process's scenarios.
l_local = np.concatenate([np.asarray(s.data).reshape(-1, res.l.shape[-1])
                          for s in res.l.addressable_shards], axis=0)
out = dict(pid=pid, n_total=int(stats.n_total), n_ok=int(stats.n_ok),
           n_blocked=int(stats.n_blocked),
           mean_qp_iters=float(stats.mean_qp_iters),
           l_local=l_local.tolist(), lo=lo)

# --- Uneven per-host shards (a straggler host with fewer scenarios must not
# wedge the fleet): proc0 holds 5 scenarios, proc1 holds 3. make_global_batch
# pads each host to the fleet max (rounded to its local device count) and
# returns the validity mask; stats must count only the 8 real scenarios. ---
offs_un_global = np.linspace(-0.4, 0.4, 8).astype(np.float32)
offs_un = offs_un_global[:5] if pid == 0 else offs_un_global[5:]
scs_un = jax.vmap(make)(jnp.asarray(offs_un))
gm_g2, scs_g2, valid_g = dist.make_global_batch(gm, scs_un, mesh, uneven=True)
res2, stats2 = dist.solve_sharded(gm_g2, scs_g2, cfg, mesh, st, valid=valid_g)
# Streamed with the uneven mask (2 batches through the cached compilation).
total, dt, sps = dist.solve_streamed(
    gm_g2, ((scs_g2, valid_g) for _ in range(2)), cfg, mesh, st)
# valid_g spans both processes; count this host's real scenarios from its
# addressable shards (the global count is already in stats2.n_total).
un_valid_local = int(sum(np.asarray(s.data).sum()
                         for s in valid_g.addressable_shards))
out.update(un_n_total=int(stats2.n_total), un_n_ok=int(stats2.n_ok),
           un_valid_local=un_valid_local,
           un_batch_padded=int(res2.ok.shape[0]),
           st_n_total=int(total.n_total), st_n_ok=int(total.n_ok))

# --- Flagship shapes (n_knots=128, default DP lattice — the production
# program the TPU bench runs) across the real OS-process boundary. Only the
# ADMM iteration cap is reduced, as in __graft_entry__.dryrun_multichip; the
# persistent compilation cache makes repeats cost seconds. ---
cfg_f = PlannerConfig(qp_max_iter=200)
st_f = QPSettings(max_iter=200)
offs_f = np.linspace(-0.5, 0.5, 8).astype(np.float32)
scs_f = jax.vmap(make)(jnp.asarray(offs_f[pid * 4:pid * 4 + 4]))
gm_gf, scs_gf = dist.make_global_batch(gm, scs_f, mesh)
res_f, stats_f = dist.solve_sharded(gm_gf, scs_gf, cfg_f, mesh, st_f)
nv_f = [int(v) for s in res_f.n_valid.addressable_shards
        for v in np.asarray(s.data).reshape(-1)]
out.update(f_n_total=int(stats_f.n_total), f_n_ok=int(stats_f.n_ok),
           f_mean_iters=float(stats_f.mean_qp_iters), f_nv=nv_f)
with open(os.path.join(outdir, f"worker{pid}.json"), "w") as f:
    json.dump(out, f)
"""


def _free_port():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_sharded_solve(tmp_path):
    port = _free_port()
    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER)
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    env["PYTHONPATH"] = os.pathsep.join(
        [os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
         env.get("PYTHONPATH", "")]).rstrip(os.pathsep)
    procs = [subprocess.Popen(
        [sys.executable, str(worker), str(pid), "2", str(port), str(tmp_path)],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE)
        for pid in range(2)]
    outs = [p.communicate(timeout=1500) for p in procs]
    for p, (so, se) in zip(procs, outs):
        assert p.returncode == 0, se.decode()[-3000:]

    w0 = json.loads((tmp_path / "worker0.json").read_text())
    w1 = json.loads((tmp_path / "worker1.json").read_text())

    # Replicated fleet stats identical across processes.
    for key in ("n_total", "n_ok", "n_blocked", "mean_qp_iters",
                "un_n_total", "un_n_ok", "st_n_total", "st_n_ok",
                "f_n_total", "f_n_ok", "f_mean_iters"):
        assert w0[key] == w1[key], key
    assert w0["n_total"] == 16

    # Flagship shapes (n_knots=128, default DP lattice): the production
    # program executed across the OS-process boundary — all 8 scenarios
    # solved, full horizons, psum stats agreeing between hosts.
    assert w0["f_n_total"] == 8
    assert w0["f_n_ok"] == 8
    assert len(w0["f_nv"]) == 4 and len(w1["f_nv"]) == 4
    assert all(nv > 64 for nv in w0["f_nv"] + w1["f_nv"])

    # Uneven shards: 5 + 3 real scenarios, padded to 8 per process (local
    # device count 4), stats count only the real 8; the 2-batch stream
    # accumulates 16 without wedging on the straggler.
    assert w0["un_valid_local"] == 5 and w1["un_valid_local"] == 3
    assert w0["un_batch_padded"] == 16
    assert w0["un_n_total"] == 8
    assert w0["st_n_total"] == 16
    assert w0["st_n_ok"] == 2 * w0["un_n_ok"]

    # Against a single-process solve of the same global batch.
    import jax
    import jax.numpy as jnp
    from tpu_pathopt import maps, pipeline
    from tpu_pathopt.config import PlannerConfig
    from tpu_pathopt.qp.admm import QPSettings

    cfg = PlannerConfig(n_knots=16, n_segment_points=16, dp_layers=8,
                        dp_laterals=9, bspline_samples=32, qp_max_iter=100)
    st = QPSettings(max_iter=100)
    res_m, size = 0.4, 100
    mask = np.zeros((size, size), bool)
    yy = (0.5 * size - 0.5 - np.arange(size)) * res_m
    mask[:, np.abs(yy) >= 15.0] = True
    gm = maps.build_map(jnp.asarray(mask), resolution=res_m)
    offs = np.linspace(-0.5, 0.5, 16).astype(np.float32)
    R = 8
    raw_x = np.concatenate([np.linspace(-12, 12, 6), np.full(R - 6, 12.0)])
    raw_y = np.zeros(R)

    def make(off):
        return pipeline.Scenario(
            raw_x=jnp.asarray(raw_x, jnp.float32),
            raw_y=jnp.asarray(raw_y, jnp.float32),
            n_raw=jnp.asarray(6, jnp.int32),
            start_x=jnp.asarray(-12.0, jnp.float32),
            start_y=jnp.asarray(0.0, jnp.float32) + off,
            start_heading=jnp.asarray(0.0, jnp.float32),
            start_k=jnp.asarray(0.0, jnp.float32),
            target_x=jnp.asarray(12.0, jnp.float32),
            target_y=jnp.asarray(0.0, jnp.float32),
            target_heading=jnp.asarray(0.0, jnp.float32))

    res_local = pipeline.solve_batch(gm, jax.vmap(make)(jnp.asarray(offs)),
                                     cfg, st)
    assert w0["n_ok"] == int(jnp.sum(res_local.ok.astype(jnp.int32)))

    l_ref = np.asarray(res_local.l)
    for w in (w0, w1):
        l_w = np.asarray(w["l_local"], np.float32)
        np.testing.assert_allclose(
            l_w, l_ref[w["lo"]:w["lo"] + l_w.shape[0]], atol=5e-3)
