"""Batched block-tridiagonal Cholesky factorization and solve.

The reduced ADMM normal matrix of the lateral path QP,
M = P + sigma I + A^T diag(rho) A, is block-tridiagonal when variables are
ordered per knot as [l, e_psi, kappa, u, slack_front, slack_rear] (6 per knot):
the only cross-knot coupling comes from the transition rows
x_{i+1} = A_i x_i + B_i u_i + c_i (reference: base_solver.cpp:160-187), which
touch adjacent knots only. This replaces the generic sparse LDL^T inside OSQP
(and the O(n^3) dense Cholesky) with an O(n * nb^3) scan.

Factor/solve are written as ``lax.scan`` over the knot dimension with small
(nb x nb) dense blocks — ``vmap`` over the scenario batch turns every step into
a (B, nb, nb) batched matmul/triangular-solve, which XLA maps onto the MXU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _tri_solve(L, B, lower=True, trans=False):
    """Solve L X = B (or L^T X = B) for small lower-triangular L. Shapes:
    L (nb, nb), B (nb, k)."""
    if trans:
        return jax.scipy.linalg.solve_triangular(L, B, lower=lower, trans=1)
    return jax.scipy.linalg.solve_triangular(L, B, lower=lower)


def factor(diag, off):
    """Block Cholesky of a symmetric positive-definite block-tridiagonal M.

    diag: (m, nb, nb) diagonal blocks D_i (symmetric).
    off:  (m-1, nb, nb) sub-diagonal blocks O_i = M[i+1, i].

    Returns (C, W): C (m, nb, nb) lower Cholesky factors of the Schur
    complements, W (m-1, nb, nb) with W_i = O_i C_i^{-T} (the block factors
    such that M = L L^T with L block-bidiagonal [C_i on diag, W_{i-1} below]).
    """
    m, nb, _ = diag.shape

    def step(carry, inp):
        C_prev, first = carry
        D_i, O_im1 = inp
        # W = O_{i-1} C_{i-1}^{-T}  <=>  W^T = C_{i-1}^{-1} O_{i-1}^T
        # (zero for the first block via the zero-padded off entry)
        del first
        W = _tri_solve(C_prev, O_im1.T).T
        S = D_i - W @ W.T
        C = jnp.linalg.cholesky(S)
        return (C, jnp.asarray(False)), (C, W)

    off_padded = jnp.concatenate([jnp.zeros((1, nb, nb), diag.dtype), off])
    (_, _), (C, W) = jax.lax.scan(
        step, (jnp.eye(nb, dtype=diag.dtype), jnp.asarray(True)),
        (diag, off_padded))
    return C, W[1:]


def solve(C, W, b):
    """Solve M x = b given the factorization from :func:`factor`.
    b: (m, nb) -> x: (m, nb)."""
    m, nb, _ = C.shape
    W_padded = jnp.concatenate([jnp.zeros((1, nb, nb), C.dtype), W])

    def fwd(y_prev, inp):
        C_i, W_i, b_i = inp
        y = _tri_solve(C_i, (b_i - W_i @ y_prev)[:, None])[:, 0]
        return y, y

    _, ys = jax.lax.scan(fwd, jnp.zeros(nb, C.dtype), (C, W_padded, b))

    W_next = jnp.concatenate([W, jnp.zeros((1, nb, nb), C.dtype)])

    def bwd(x_next, inp):
        C_i, W_ip1, y_i = inp
        x = _tri_solve(C_i, (y_i - W_ip1.T @ x_next)[:, None], trans=True)[:, 0]
        return x, x

    _, xs = jax.lax.scan(bwd, jnp.zeros(nb, C.dtype),
                         (C, W_next, ys), reverse=True)
    return xs


def matvec(diag, off, x):
    """M @ x for block-tridiagonal M. x: (m, nb)."""
    y = jnp.einsum("mij,mj->mi", diag, x)
    lo = jnp.einsum("mij,mj->mi", off, x[:-1])       # contributes to rows 1..
    hi = jnp.einsum("mji,mj->mi", off, x[1:])        # O_i^T x_{i+1} to rows 0..
    y = y.at[1:].add(lo)
    y = y.at[:-1].add(hi)
    return y


def to_dense(diag, off):
    """Assemble the dense matrix (tests / small problems)."""
    m, nb, _ = diag.shape
    M = jnp.zeros((m * nb, m * nb), diag.dtype)
    for i in range(m):
        M = M.at[i * nb:(i + 1) * nb, i * nb:(i + 1) * nb].set(diag[i])
    for i in range(m - 1):
        M = M.at[(i + 1) * nb:(i + 2) * nb, i * nb:(i + 1) * nb].set(off[i])
        M = M.at[i * nb:(i + 1) * nb, (i + 1) * nb:(i + 2) * nb].set(off[i].T)
    return M
