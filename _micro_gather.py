import numpy as np, time, jax, jax.numpy as jnp
import bench
from tpu_pathopt import maps, splines

gm, scs, _ = bench.build_adversarial(256)
rng = np.random.default_rng(0)

def timeit(f, *a, reps=20):
    out = f(*a); np.asarray(out)
    t0 = time.time()
    for _ in range(reps):
        out = f(*a); np.asarray(out)
    return (time.time() - t0) / reps * 1e3

# ESDF probes at bench-like volume: bounds stage ~ (B=256, N=128, ~100 probes)
for S in (25, 100):
    px = jnp.asarray(rng.uniform(-28, 28, size=(256, 128, S)), jnp.float32)
    py = jnp.asarray(rng.uniform(-22, 22, size=(256, 128, S)), jnp.float32)
    f = jax.jit(lambda px, py: maps.obstacle_distance(gm, px, py))
    print(f"esdf gather ({256*128*S/1e6:.1f}M probes): {timeit(f, px, py):.1f} ms")

# Spline fused pair-eval at Newton volume: (B, N) x 12 iters
x = jnp.asarray(np.linspace(0, 50, 40), jnp.float32)
y = jnp.asarray(rng.normal(size=40).cumsum(), jnp.float32)
xs = splines.fit_natural(x, x)
ys = splines.fit_natural(x, y)
xsb = jax.tree_util.tree_map(lambda a: jnp.broadcast_to(a, (256,) + a.shape), xs)
ysb = jax.tree_util.tree_map(lambda a: jnp.broadcast_to(a, (256,) + a.shape), ys)
tx = jnp.asarray(rng.uniform(0, 50, size=(256, 128)), jnp.float32)
ty = jnp.asarray(rng.normal(size=(256, 128)), jnp.float32)
hint = tx
maxs = jnp.full((256, 128), 50.0)
pd = jax.jit(jax.vmap(lambda xs, ys, tx, ty, ms, h: splines.project_directional_newton(
    xs, ys, tx, ty, jnp.zeros_like(tx), ms, h, iters=12)))
print(f"newton proj 12 iters (256x128): {timeit(pd, xsb, ysb, tx, ty, maxs, hint):.1f} ms")
