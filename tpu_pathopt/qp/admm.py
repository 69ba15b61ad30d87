"""Batched JAX ADMM QP solver with OSQP semantics (dense reduced KKT).

Solves  min 0.5 x^T P x + q^T x  s.t.  l <= A x <= u  following the OSQP
algorithm (the solver behind every QP in the reference — base_solver.cpp:80-88,
tension_smoother.cpp:74-82, reference_path_smoother.cpp:546-553):

- modified Ruiz equilibration + cost scaling (fixed iteration count),
- relaxed ADMM (alpha=1.6, sigma=1e-6) on the reduced normal equations
  M = P + sigma I + A^T diag(rho) A, factored by dense Cholesky,
- per-constraint rho with 1e3 boost on equality rows and adaptive rho
  (refactor when the primal/dual residual ratio drifts >5x),
- OSQP termination on unscaled residuals (eps_abs/eps_rel), warm starting.

The function is a pure jittable computation on fixed shapes; batch by ``vmap``
(converged elements are frozen so early finishers don't drift while stragglers
iterate). Dense factorization is the right call for the smoothing QPs
(hundreds of variables); the lateral path QP uses the block-tridiagonal
structured path in ``tpu_pathopt.qp.btridiag`` instead.
"""

from __future__ import annotations

import dataclasses
import functools

import flax.struct
import jax
import jax.numpy as jnp

INFTY = 1e20


@dataclasses.dataclass(frozen=True)
class QPSettings:
    eps_abs: float = 2e-3
    eps_rel: float = 2e-3
    max_iter: int = 4000
    sigma: float = 1e-6
    alpha: float = 1.6
    rho_bar: float = 0.1
    # Initial rho for the lateral path QP specifically (pipeline.stage_path_qp
    # passes it through the solver's rho0); pass 2 additionally inherits pass
    # 1's final adapted rho, mirroring the reference's persistent OSQP solver
    # object (base_solver.cpp:97-117). Measured tradeoff curve (round 5,
    # adversarial B=256 throughput / worst gridmap-route gap vs the
    # high-accuracy float64 optimum):
    #   0.1 -> 4089/s, kappa 4.4e-4, e_psi 3.0e-3   (default; full parity)
    #   0.3 -> 4338/s, kappa 6.2e-4, e_psi 5.4e-3
    #   0.5 -> 4473/s, kappa 8.1e-4, e_psi 7.0e-3   (+9%; e_psi past 5e-3)
    #   0.8 -> 4299/s, kappa 1.8e-3, e_psi 8.6e-3
    # Every faster setting moves some coordinate past the pinned parity
    # tolerances (kappa 1e-3 / e_psi 5e-3), so the default stays at the
    # OSQP default 0.1 (parity first); raise it only when throughput
    # matters more than reference-grade solution accuracy.
    rho_bar_path: float = 0.1
    scaling_iters: int = 10
    check_every: int = 25
    adaptive_rho: bool = True
    # Parallel-prefix (associative-scan) block-bidiagonal solves in the
    # structured path solver: log2(N) einsum levels instead of 2N sequential
    # scan steps per ADMM iteration. Identical math, different summation
    # order. Off by default: with the (B, m, 6, 6) layout the tiny-matmul
    # einsums underutilize the vector lanes and lose to the sequential sweep.
    pscan: bool = False
    # Fuse each check_every-iteration ADMM round of the structured path
    # solver into one Pallas TPU kernel (lane-major batch layout, factors
    # resident in VMEM, in-kernel knot sweeps). Falls back to the XLA round
    # on non-TPU backends unless the batch also fits interpret mode.
    fused_rounds: bool = True


@flax.struct.dataclass
class QPSolution:
    x: jax.Array
    y: jax.Array
    z: jax.Array
    iters: jax.Array
    converged: jax.Array
    pri_res: jax.Array
    dua_res: jax.Array


def _ruiz(P, q, A, iters):
    nv = P.shape[0]
    nc = A.shape[0]
    dt = P.dtype
    D = jnp.ones(nv, dt)
    E = jnp.ones(nc, dt)
    c = jnp.asarray(1.0, dt)

    def body(_, carry):
        P, q, A, D, E, c = carry
        col = jnp.maximum(jnp.max(jnp.abs(P), axis=0), jnp.max(jnp.abs(A), axis=0))
        row = jnp.max(jnp.abs(A), axis=1)
        d = jnp.clip(1.0 / jnp.sqrt(jnp.maximum(col, 1e-12)), 1e-8, 1e8)
        e = jnp.clip(1.0 / jnp.sqrt(jnp.maximum(row, 1e-12)), 1e-8, 1e8)
        P = d[:, None] * P * d[None, :]
        A = e[:, None] * A * d[None, :]
        q = d * q
        D = D * d
        E = E * e
        p_mean = jnp.mean(jnp.max(jnp.abs(P), axis=0))
        g = 1.0 / jnp.maximum(jnp.maximum(p_mean, jnp.max(jnp.abs(q))), 1e-12)
        g = jnp.clip(g, 1e-8, 1e8)
        return P * g, q * g, A, D, E, c * g

    P, q, A, D, E, c = jax.lax.fori_loop(
        0, iters, body, (P, q, A, D, E, c))
    return P, q, A, D, E, c


def _make_rho(rho_bar, eq, loose):
    rho = jnp.where(eq, rho_bar * 1e3, rho_bar)
    return jnp.where(loose, rho_bar * 1e-6, rho)


def _factor(Ps, As, rho, sigma):
    nv = Ps.shape[0]
    M = Ps + sigma * jnp.eye(nv, dtype=Ps.dtype) + As.T @ (rho[:, None] * As)
    return jnp.linalg.cholesky(M)


def _chol_solve(L, b):
    w = jax.scipy.linalg.solve_triangular(L, b, lower=True)
    return jax.scipy.linalg.solve_triangular(L.T, w, lower=False)


@functools.partial(jax.jit, static_argnames=("settings",))
def solve_qp(P, q, A, l, u, x0=None, y0=None,
             settings: QPSettings = QPSettings()) -> QPSolution:
    """Solve one QP (unbatched shapes; vmap for batches, or prefer
    :func:`solve_qp_batched` for large batches — it shares factorization
    control flow across the batch)."""
    with jax.default_matmul_precision("highest"):
        return _solve_qp_impl(P, q, A, l, u, x0, y0, settings)


@functools.partial(jax.jit, static_argnames=("settings",))
def solve_qp_batched(P, q, A, l, u, x0=None, y0=None,
                     settings: QPSettings = QPSettings()) -> QPSolution:
    """Solve a batch of QPs with leading batch axis on every input.

    Unlike ``vmap(solve_qp)`` this keeps the expensive control flow
    batch-global, which is what makes it fast on TPU:

    - the KKT normal matrix is Cholesky-factored ONCE per rho update and the
      triangular factor is explicitly inverted (one batched
      ``solve_triangular`` against I), so every ADMM iteration is two batched
      matmuls (MXU work) instead of two batched triangular solves
      (sequential-latency work);
    - rho refactorization runs under a batch-global ``lax.cond`` — it only
      costs anything when at least one batch element actually needs it
      (a per-element ``cond`` under vmap degenerates to computing both sides
      every round).

    Semantics match :func:`solve_qp` (OSQP algorithm; reference consumes OSQP
    at base_solver.cpp:80-88).
    """
    with jax.default_matmul_precision("highest"):
        return _solve_qp_batched_impl(P, q, A, l, u, x0, y0, settings)


def _solve_qp_batched_impl(P, q, A, l, u, x0, y0, settings) -> QPSolution:
    st = settings
    dt = P.dtype
    B, nv = P.shape[0], P.shape[1]
    nc = A.shape[1]

    Ps, qs, As, D, E, c = jax.vmap(
        lambda P_, q_, A_: _ruiz(P_, q_, A_, st.scaling_iters))(P, q, A)
    ls = E * jnp.clip(l, -INFTY, INFTY)
    us = E * jnp.clip(u, -INFTY, INFTY)
    eq = (u - l) < 1e-9
    loose = (l < -0.5 * INFTY) & (u > 0.5 * INFTY)

    AsT = jnp.swapaxes(As, -1, -2)
    eye = jnp.eye(nv, dtype=dt)

    def factor_inv(rho):
        """Inverse-transpose-free iteration operator: returns Linv with
        M^{-1} b = Linv^T (Linv b)."""
        M = Ps + st.sigma * eye + AsT @ (rho[:, :, None] * As)
        L = jnp.linalg.cholesky(M)
        Linv = jax.scipy.linalg.solve_triangular(
            L, jnp.broadcast_to(eye, L.shape), lower=True)
        return Linv

    def msolve(Linv, b):
        w = jnp.einsum("bij,bj->bi", Linv, b)
        return jnp.einsum("bji,bj->bi", Linv, w)

    rho_bar0 = jnp.full((B,), st.rho_bar, dt)
    rho0 = jax.vmap(_make_rho)(rho_bar0, eq, loose)
    Linv0 = factor_inv(rho0)

    x = jnp.zeros((B, nv), dt) if x0 is None else x0 / D
    y = jnp.zeros((B, nc), dt) if y0 is None else y0 * E / c[:, None]
    z = jnp.einsum("bij,bj->bi", As, x)

    def admm_round(carry):
        x, z, y, rho, Linv, rho_bar, it, conv, pri, dua = carry

        def step(_, xyz):
            x, z, y = xyz
            rhs = st.sigma * x - qs + jnp.einsum("bji,bj->bi", As, rho * z - y)
            xt = msolve(Linv, rhs)
            zt = jnp.einsum("bij,bj->bi", As, xt)
            x_new = st.alpha * xt + (1 - st.alpha) * x
            z_tmp = st.alpha * zt + (1 - st.alpha) * z + y / rho
            z_new = jnp.clip(z_tmp, ls, us)
            y_new = rho * (z_tmp - z_new)
            return x_new, z_new, y_new

        x_n, z_n, y_n = jax.lax.fori_loop(0, st.check_every, step, (x, z, y))
        cv = conv[:, None]
        x = jnp.where(cv, x, x_n)
        z = jnp.where(cv, z, z_n)
        y = jnp.where(cv, y, y_n)
        it = jnp.where(conv, it, it + st.check_every)

        # Unscaled residuals, per batch element.
        x_u = D * x
        z_u = z / E
        y_u = (E * y) / c[:, None]
        Ax = jnp.einsum("bij,bj->bi", A, x_u)
        Px = jnp.einsum("bij,bj->bi", P, x_u)
        Aty = jnp.einsum("bji,bj->bi", A, y_u)
        amax = lambda v: jnp.max(jnp.abs(v), axis=-1)
        pri_res = amax(Ax - z_u)
        dua_res = amax(Px + q + Aty)
        eps_pri = st.eps_abs + st.eps_rel * jnp.maximum(amax(Ax), amax(z_u))
        eps_dua = st.eps_abs + st.eps_rel * jnp.maximum(
            jnp.maximum(amax(Px), amax(Aty)), amax(q))
        conv_new = conv | ((pri_res <= eps_pri) & (dua_res <= eps_dua))

        if st.adaptive_rho:
            num = pri_res / jnp.maximum(jnp.maximum(amax(Ax), amax(z_u)), 1e-12)
            den = dua_res / jnp.maximum(jnp.maximum(
                amax(Px), jnp.maximum(amax(Aty), amax(q))), 1e-12)
            ratio = jnp.sqrt(num / jnp.maximum(den, 1e-12))
            need = (~conv_new) & ((ratio > 5.0) | (ratio < 0.2))
            rho_bar_new = jnp.where(
                need, jnp.clip(rho_bar * ratio, 1e-6, 1e6), rho_bar)
            rho_new = jax.vmap(_make_rho)(rho_bar_new, eq, loose)
            # Batch-global refactor: only pay for it when some element needs it.
            Linv_new = jax.lax.cond(
                jnp.any(need),
                lambda: jnp.where(need[:, None, None],
                                  factor_inv(rho_new), Linv),
                lambda: Linv)
            rho = jnp.where(need[:, None], rho_new, rho)
            Linv, rho_bar = Linv_new, rho_bar_new

        return (x, z, y, rho, Linv, rho_bar, it, conv_new,
                jnp.where(conv, pri, pri_res), jnp.where(conv, dua, dua_res))

    def cond(carry):
        *_, it, conv, _p, _d = carry
        return jnp.any((~conv) & (it < st.max_iter))

    init = (x, z, y, rho0, Linv0, rho_bar0, jnp.zeros((B,), jnp.int32),
            jnp.zeros((B,), bool), jnp.full((B,), jnp.inf, dt),
            jnp.full((B,), jnp.inf, dt))
    x, z, y, rho, Linv, rho_bar, it, conv, pri, dua = jax.lax.while_loop(
        cond, admm_round, init)

    return QPSolution(x=D * x, y=(E * y) / c[:, None], z=z / E, iters=it,
                      converged=conv, pri_res=pri, dua_res=dua)


def _setup_scalar(P, q, A, l, u, x0, y0, st):
    """Scale the problem and build the initial carry (shared by the solver
    and the iterate tracer so both run the identical code path)."""
    dt = P.dtype
    nv = P.shape[0]
    nc = A.shape[0]

    Ps, qs, As, D, E, c = _ruiz(P, q, A, st.scaling_iters)
    ls = E * jnp.clip(l, -INFTY, INFTY)
    us = E * jnp.clip(u, -INFTY, INFTY)
    eq = (u - l) < 1e-9
    loose = (l < -0.5 * INFTY) & (u > 0.5 * INFTY)

    rho_bar0 = jnp.asarray(st.rho_bar, dt)
    rho0 = _make_rho(rho_bar0, eq, loose)
    L0 = _factor(Ps, As, rho0, st.sigma)

    x = jnp.zeros(nv, dt) if x0 is None else x0 / D
    y = jnp.zeros(nc, dt) if y0 is None else y0 * E / c
    z = As @ x

    scaled = (Ps, qs, As, D, E, c, ls, us, eq, loose)
    init = (x, z, y, rho0, L0, rho_bar0, jnp.asarray(0, jnp.int32),
            jnp.asarray(False), jnp.asarray(jnp.inf, dt),
            jnp.asarray(jnp.inf, dt))
    return scaled, init


def _make_scalar_round(P, q, A, scaled, st):
    """One check_every-iteration ADMM round + residual check + adaptive rho
    (the while_loop body of :func:`solve_qp`)."""
    Ps, qs, As, D, E, c, ls, us, eq, loose = scaled

    def admm_round(carry):
        x, z, y, rho, L, rho_bar, it, conv, pri, dua = carry

        def step(_, xyz):
            x, z, y = xyz
            rhs = st.sigma * x - qs + As.T @ (rho * z - y)
            xt = _chol_solve(L, rhs)
            zt = As @ xt
            x_new = st.alpha * xt + (1 - st.alpha) * x
            z_tmp = st.alpha * zt + (1 - st.alpha) * z + y / rho
            z_new = jnp.clip(z_tmp, ls, us)
            y_new = rho * (z_tmp - z_new)
            return x_new, z_new, y_new

        x_n, z_n, y_n = jax.lax.fori_loop(0, st.check_every, step, (x, z, y))
        # Freeze converged problems.
        x = jnp.where(conv, x, x_n)
        z = jnp.where(conv, z, z_n)
        y = jnp.where(conv, y, y_n)
        it = jnp.where(conv, it, it + st.check_every)

        # Unscaled residuals.
        x_u = D * x
        z_u = z / E
        y_u = (E * y) / c
        Ax = A @ x_u
        Px = P @ x_u
        Aty = A.T @ y_u
        pri_res = jnp.max(jnp.abs(Ax - z_u))
        dua_res = jnp.max(jnp.abs(Px + q + Aty))
        eps_pri = st.eps_abs + st.eps_rel * jnp.maximum(
            jnp.max(jnp.abs(Ax)), jnp.max(jnp.abs(z_u)))
        eps_dua = st.eps_abs + st.eps_rel * jnp.maximum(
            jnp.maximum(jnp.max(jnp.abs(Px)), jnp.max(jnp.abs(Aty))),
            jnp.max(jnp.abs(q)))
        conv_new = conv | ((pri_res <= eps_pri) & (dua_res <= eps_dua))

        # Adaptive rho (only for unconverged).
        if st.adaptive_rho:
            num = pri_res / jnp.maximum(
                jnp.maximum(jnp.max(jnp.abs(Ax)), jnp.max(jnp.abs(z_u))), 1e-12)
            den = dua_res / jnp.maximum(jnp.maximum(
                jnp.max(jnp.abs(Px)), jnp.maximum(jnp.max(jnp.abs(Aty)),
                                                  jnp.max(jnp.abs(q)))), 1e-12)
            ratio = jnp.sqrt(num / jnp.maximum(den, 1e-12))
            need = (~conv_new) & ((ratio > 5.0) | (ratio < 0.2))
            rho_bar_new = jnp.where(
                need, jnp.clip(rho_bar * ratio, 1e-6, 1e6), rho_bar)
            rho_new = _make_rho(rho_bar_new, eq, loose)
            L_new = jax.lax.cond(
                need,
                lambda: _factor(Ps, As, rho_new, st.sigma),
                lambda: L)
            # Rescale dual-ish variable y? OSQP keeps y; only rho changes.
            rho = jnp.where(need, rho_new, rho)
            L, rho_bar = L_new, rho_bar_new

        return (x, z, y, rho, L, rho_bar, it, conv_new,
                jnp.where(conv, pri, pri_res), jnp.where(conv, dua, dua_res))

    return admm_round


def _solve_qp_impl(P, q, A, l, u, x0, y0, settings) -> QPSolution:
    st = settings
    scaled, init = _setup_scalar(P, q, A, l, u, x0, y0, st)
    D, E, c = scaled[3], scaled[4], scaled[5]
    admm_round = _make_scalar_round(P, q, A, scaled, st)

    def cond(carry):
        *_, it, conv, _p, _d = carry
        return (~conv) & (it < st.max_iter)

    x, z, y, rho, L, rho_bar, it, conv, pri, dua = jax.lax.while_loop(
        cond, admm_round, init)

    return QPSolution(x=D * x, y=(E * y) / c, z=z / E, iters=it,
                      converged=conv, pri_res=pri, dua_res=dua)


@functools.partial(jax.jit, static_argnames=("settings", "n_rounds"))
def trace_rounds(P, q, A, l, u, settings: QPSettings = QPSettings(),
                 n_rounds: int = 8, x0=None, y0=None):
    """Run exactly ``n_rounds`` ADMM rounds of :func:`solve_qp` (the SAME
    round body — shared via ``_make_scalar_round``) and return the unscaled
    per-round trajectory: dict of (x, z, y, rho_bar, pri_res, dua_res), each
    with a leading ``n_rounds`` axis. Iterate-by-iterate parity diagnostics
    against the float64 oracle (``qp.oracle.solve(trace=True)``); set
    eps_abs = eps_rel = 0 in ``settings`` to disable convergence freezing so
    the raw trajectory is observed."""
    with jax.default_matmul_precision("highest"):
        st = settings
        scaled, init = _setup_scalar(P, q, A, l, u, x0, y0, st)
        D, E, c = scaled[3], scaled[4], scaled[5]
        admm_round = _make_scalar_round(P, q, A, scaled, st)

        def body(carry, _):
            carry = admm_round(carry)
            x, z, y, rho, L, rho_bar, it, conv, pri, dua = carry
            return carry, dict(x=D * x, z=z / E, y=(E * y) / c,
                               rho_bar=rho_bar, pri_res=pri, dua_res=dua)

        _, tr = jax.lax.scan(body, init, None, length=n_rounds)
        return tr
