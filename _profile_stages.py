import numpy as np, time, jax
import bench
from tpu_pathopt import pipeline
from tpu_pathopt.config import PlannerConfig
from tpu_pathopt.qp.admm import QPSettings

cfg = PlannerConfig(); st = QPSettings()
gm, scs, _ = bench.build_inputs if False else bench.build_adversarial(256)[:2] + (None,)
gm, scs, _ = bench.build_adversarial(256)
S = {"static_argnames": ("config",)}
SS = {"static_argnames": ("config", "settings")}
j_prep = jax.jit(pipeline.stage_prep, **S)
j_smooth = jax.jit(pipeline.stage_smooth, **SS)
j_cor = jax.jit(pipeline.stage_corridor, **S)
j_post = jax.jit(pipeline.stage_post_smooth, **SS)
j_geo = jax.jit(pipeline.stage_geometry, **S)
j_qp = jax.jit(pipeline.stage_path_qp, **SS)
j_fin = jax.jit(pipeline.stage_finalize, **S)

def sync(x):
    leaf = jax.tree_util.tree_leaves(x)[0]
    np.asarray(leaf)

def run(report=False):
    t = {}
    def tick(name, f):
        t0 = time.time(); out = f(); sync(out); t[name] = (time.time()-t0)*1e3
        return out
    prep = tick("prep", lambda: j_prep(scs, cfg))
    sm = tick("smooth", lambda: j_smooth(gm, prep, cfg, st))
    cor3 = tick("corridor", lambda: j_cor(gm, scs, sm, cfg))
    xs2, ys2, cor = cor3
    lp = tick("post_smooth", lambda: j_post(cor, cfg, st))
    geo = tick("bounds", lambda: j_geo(gm, scs, xs2, ys2, cor, lp[0], cfg))
    sols = tick("path_qp", lambda: j_qp(scs, geo, cfg, st))
    fin = tick("finalize", lambda: j_fin(geo[0], sols[1], geo[5], cfg))
    if report:
        tot = sum(t.values())
        for k, v in t.items():
            print(f"  {k}: {v:.1f} ms ({100*v/tot:.0f}%)")
        print(f"  total {tot:.1f} ms -> {256/tot*1000:.0f} solves/s (staged)")

run(); run()
run(report=True)
