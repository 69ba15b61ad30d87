import jax
import jax.numpy as jnp
import numpy as np

from tpu_pathopt.qp import btridiag


def _random_spd_btd(rng, m=10, nb=4):
    """SPD block-tridiagonal M = L L^T with block-bidiagonal L."""
    Ld = []
    Lo = []
    for i in range(m):
        T = np.tril(rng.normal(size=(nb, nb)))
        np.fill_diagonal(T, np.abs(T.diagonal()) + 1.0)
        Ld.append(T)
        if i < m - 1:
            Lo.append(rng.normal(size=(nb, nb)) * 0.3)
    diag = []
    off = []
    for i in range(m):
        D = Ld[i] @ Ld[i].T
        if i > 0:
            D = D + Lo[i - 1] @ Lo[i - 1].T
        diag.append(D)
        if i < m - 1:
            off.append(Lo[i] @ Ld[i].T)
    return np.stack(diag), np.stack(off)


def test_factor_solve_matches_dense():
    rng = np.random.default_rng(0)
    diag, off = _random_spd_btd(rng)
    b = rng.normal(size=(10, 4))
    dj = jnp.asarray(diag, jnp.float32)
    oj = jnp.asarray(off, jnp.float32)
    C, W = btridiag.factor(dj, oj)
    x = np.asarray(btridiag.solve(C, W, jnp.asarray(b, jnp.float32)))
    M = np.asarray(btridiag.to_dense(dj, oj), np.float64)
    x_ref = np.linalg.solve(M, b.reshape(-1)).reshape(10, 4)
    np.testing.assert_allclose(x, x_ref, atol=1e-3, rtol=1e-3)


def test_matvec_matches_dense():
    rng = np.random.default_rng(1)
    diag, off = _random_spd_btd(rng, m=7, nb=3)
    x = rng.normal(size=(7, 3))
    dj = jnp.asarray(diag, jnp.float32)
    oj = jnp.asarray(off, jnp.float32)
    y = np.asarray(btridiag.matvec(dj, oj, jnp.asarray(x, jnp.float32)))
    M = np.asarray(btridiag.to_dense(dj, oj), np.float64)
    np.testing.assert_allclose(y.reshape(-1), M @ x.reshape(-1), atol=1e-4,
                               rtol=1e-4)


def test_vmapped_factor_solve():
    rng = np.random.default_rng(2)
    diags, offs, bs, refs = [], [], [], []
    for _ in range(3):
        d, o = _random_spd_btd(rng, m=6, nb=6)
        b = rng.normal(size=(6, 6))
        M = np.asarray(btridiag.to_dense(jnp.asarray(d), jnp.asarray(o)), np.float64)
        refs.append(np.linalg.solve(M, b.reshape(-1)).reshape(6, 6))
        diags.append(d)
        offs.append(o)
        bs.append(b)
    dj = jnp.asarray(np.stack(diags), jnp.float32)
    oj = jnp.asarray(np.stack(offs), jnp.float32)
    bj = jnp.asarray(np.stack(bs), jnp.float32)

    def fs(d, o, b):
        C, W = btridiag.factor(d, o)
        return btridiag.solve(C, W, b)

    xs = np.asarray(jax.vmap(fs)(dj, oj, bj))
    np.testing.assert_allclose(xs, np.stack(refs), atol=2e-3, rtol=2e-3)


def test_batched_and_pscan_solves_match_dense():
    """solve_batched and solve_batched_pscan (inverted factors) agree with a
    dense float64 oracle across a batch."""
    rng = np.random.default_rng(3)
    B, m, nb = 3, 16, 4
    diags, offs, bs = [], [], []
    for _ in range(B):
        d, o = _random_spd_btd(rng, m=m, nb=nb)
        diags.append(d)
        offs.append(o)
        bs.append(rng.normal(size=(m, nb)))
    dj = jnp.asarray(np.stack(diags), jnp.float32)
    oj = jnp.asarray(np.stack(offs), jnp.float32)
    bj = jnp.asarray(np.stack(bs), jnp.float32)
    C, W = jax.vmap(btridiag.factor)(dj, oj)
    Ci, W2 = btridiag.inv_factors(C, W)
    x_seq = np.asarray(btridiag.solve_batched(Ci, W2, bj))
    x_par = np.asarray(btridiag.solve_batched_pscan(Ci, W2, bj))
    for i in range(B):
        M = np.asarray(btridiag.to_dense(dj[i], oj[i]), np.float64)
        x_ref = np.linalg.solve(M, bs[i].reshape(-1)).reshape(m, nb)
        np.testing.assert_allclose(x_seq[i], x_ref, atol=2e-3, rtol=2e-3)
        np.testing.assert_allclose(x_par[i], x_ref, atol=2e-3, rtol=2e-3)
