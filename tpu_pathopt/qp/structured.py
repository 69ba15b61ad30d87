"""Generic block-banded structured ADMM engine.

Every QP in the pipeline has the same shape: variables grouped per knot
(nb per knot), constraint rows grouped per knot (r per knot) touching at most
the current and previous knot, and a quadratic cost whose Hessian is block
tridiagonal. The reference solves them all through generic sparse OSQP
(SURVEY.md §2.7); here they all run through one structured engine whose
normal matrix M = P + sigma I + A^T rho A is block-tridiagonal by
construction, factored and iterated by the fused Pallas kernels
(``solver.fused_rounds``) with the scenario batch riding the vector lanes.

Problem form:

    min 0.5 v^T P v + q^T v   s.t.  lb <= A v <= ub

    P block-tridiagonal: p_diag[i] = P[i, i], p_off[i] = P[i, i-1]
    A block-banded:      row group i = a_cur[i] v_i + a_prev[i] v_{i-1}

Instantiations (builders live next to each stage):
- lateral path QP: nb=6, r=8 — kept on its own specialized kernel
  (``solver.path_solver``) whose A-structure is constant and sparser;
- TENSION2 smoothing QP: nb=4 ([x, y, theta, k]), r=3 (linearized unicycle
  transitions; reference tension_smoother_2.cpp:96-145);
- post-smoothing QP: nb=3 ([l, l', l'']), r=3 (corridor + integration chains;
  reference reference_path_smoother.cpp:598-636).

OSQP semantics follow ``qp.admm``: relaxed ADMM, per-row rho with equality
boost, batch-global adaptive rho, unscaled-residual termination, warm starts.
"""

from __future__ import annotations

import functools

import flax.struct
import jax
import jax.numpy as jnp

from tpu_pathopt.jaxutil import with_vma_of
from tpu_pathopt.qp.admm import INFTY, QPSettings
from tpu_pathopt.qp import btridiag


@flax.struct.dataclass
class BlockBandedQP:
    """One structured QP (leading batch axis optional on every field)."""

    p_diag: jax.Array    # (N, nb, nb) symmetric diagonal Hessian blocks
    p_off: jax.Array     # (N, nb, nb) sub-diagonal blocks, p_off[0] = 0
    q: jax.Array         # (N, nb)
    a_cur: jax.Array     # (N, r, nb)
    a_prev: jax.Array    # (N, r, nb), a_prev[0] = 0
    lb: jax.Array        # (N, r)
    ub: jax.Array        # (N, r)

    @property
    def nb(self) -> int:
        return self.p_diag.shape[-1]

    @property
    def r(self) -> int:
        return self.a_cur.shape[-2]


# --------------------------- structured operators ---------------------------

def a_mul(qp: BlockBandedQP, v):
    """A @ v: (N, nb) -> (N, r)."""
    v_prev = jnp.concatenate([jnp.zeros_like(v[:1]), v[:-1]])
    return (jnp.einsum("nrj,nj->nr", qp.a_cur, v)
            + jnp.einsum("nrj,nj->nr", qp.a_prev, v_prev))


def at_mul(qp: BlockBandedQP, w):
    """A^T @ w: (N, r) -> (N, nb)."""
    out = jnp.einsum("nrj,nr->nj", qp.a_cur, w)
    shifted = jnp.einsum("nrj,nr->nj", qp.a_prev, w)
    return out.at[:-1].add(shifted[1:])


def p_mul(qp: BlockBandedQP, v):
    """P @ v for the block-tridiagonal Hessian."""
    y = jnp.einsum("nij,nj->ni", qp.p_diag, v)
    lo = jnp.einsum("nij,nj->ni", qp.p_off, jnp.concatenate(
        [jnp.zeros_like(v[:1]), v[:-1]]))
    hi = jnp.einsum("nji,nj->ni", qp.p_off[1:], v[1:])
    return y.at[:].add(lo).at[:-1].add(hi)


def rho_classes(qp: BlockBandedQP):
    """Per-row rho multipliers: 1e3 on equality rows, 1e-6 on loose rows
    (OSQP rho policy; qp.admm._make_rho)."""
    eq = (qp.ub - qp.lb) < 1e-9
    loose = (qp.lb < -0.5 * INFTY) & (qp.ub > 0.5 * INFTY)
    ones = jnp.ones_like(qp.lb)
    return jnp.where(eq, 1e3, jnp.where(loose, 1e-6, ones))


def normal_blocks(qp: BlockBandedQP, rho, sigma):
    """Block-tridiagonal blocks of M = P + sigma I + A^T diag(rho) A.
    rho: (N, r). Returns (diag (N, nb, nb), offp (N, nb, nb) with offp[0]=0
    and offp[i] = M[i, i-1])."""
    nb = qp.nb
    eye = jnp.eye(nb, dtype=qp.p_diag.dtype)
    diag = qp.p_diag + sigma * eye
    diag = diag + jnp.einsum("nri,nr,nrj->nij", qp.a_cur, rho, qp.a_cur)
    ap_term = jnp.einsum("nri,nr,nrj->nij", qp.a_prev, rho, qp.a_prev)
    diag = diag.at[:-1].add(ap_term[1:])
    # M[i, i-1] from row group i: a_prev[i] acts on i-1, a_cur[i] on i.
    offp = qp.p_off + jnp.einsum("nri,nr,nrj->nij", qp.a_cur, rho, qp.a_prev)
    return diag, offp


def to_dense(qp: BlockBandedQP):
    """Materialize dense (P, q, A, l, u) — oracle/parity tests only."""
    N, nb, r = qp.p_diag.shape[0], qp.nb, qp.r
    dt = qp.p_diag.dtype
    P = jnp.zeros((N * nb, N * nb), dt)
    A = jnp.zeros((N * r, N * nb), dt)
    for i in range(N):
        P = P.at[i * nb:(i + 1) * nb, i * nb:(i + 1) * nb].set(qp.p_diag[i])
        if i > 0:
            P = P.at[i * nb:(i + 1) * nb, (i - 1) * nb:i * nb].set(qp.p_off[i])
            P = P.at[(i - 1) * nb:i * nb, i * nb:(i + 1) * nb].set(
                qp.p_off[i].T)
            A = A.at[i * r:(i + 1) * r, (i - 1) * nb:i * nb].set(qp.a_prev[i])
        A = A.at[i * r:(i + 1) * r, i * nb:(i + 1) * nb].set(qp.a_cur[i])
    return P, qp.q.reshape(-1), A, qp.lb.reshape(-1), qp.ub.reshape(-1)


# ------------------------------ batched solver ------------------------------

@flax.struct.dataclass
class StructuredSolution:
    v: jax.Array         # (B, N, nb)
    y: jax.Array         # (B, N, r)
    z: jax.Array         # (B, N, r)
    iters: jax.Array
    converged: jax.Array
    pri_res: jax.Array
    dua_res: jax.Array


@functools.partial(jax.jit, static_argnames=("settings",))
def solve_structured_batched(qp: BlockBandedQP, v0=None, y0=None,
                             settings: QPSettings = QPSettings()
                             ) -> StructuredSolution:
    """Solve a batch of block-banded QPs (leading batch axis on every field).

    Same control structure as the path solver: batch-global rounds with
    per-element convergence freezing, batch-global adaptive-rho refactor
    under ``lax.cond``, fused Pallas round/factor kernels on TPU with XLA
    fallbacks elsewhere."""
    with jax.default_matmul_precision("highest"):
        return _solve_impl(qp, v0, y0, settings)


def _solve_impl(qp: BlockBandedQP, v0, y0, settings) -> StructuredSolution:
    st = settings
    B, N, nb = qp.p_diag.shape[:3]
    r = qp.r
    dt = qp.p_diag.dtype

    cls_rho = jax.vmap(rho_classes)(qp)
    amul = jax.vmap(a_mul)
    atmul = jax.vmap(at_mul)
    pmul = jax.vmap(p_mul)

    on_tpu = jax.default_backend() in ("tpu", "axon")
    # Any batch size takes the fused path (lane padding inside fused_rounds).
    use_fused = st.fused_rounds and on_tpu
    lane = lambda a: jnp.moveaxis(a, 0, -1)
    unlane = lambda a: jnp.moveaxis(a, -1, 0)
    if use_fused:
        from tpu_pathopt.solver import fused_rounds
        ac_l = lane(qp.a_cur)            # (N, r, nb, B)
        ap_l = lane(qp.a_prev)
        q_l = lane(qp.q)                 # (N, nb, B)
        lb_l, ub_l = lane(qp.lb), lane(qp.ub)

    def factor(rho_bar):
        rho = rho_bar[:, None, None] * cls_rho
        diag, offp = jax.vmap(normal_blocks, in_axes=(0, 0, None))(
            qp, rho, st.sigma)
        if use_fused:
            Ci_l, Wp_l = fused_rounds.fused_factor(lane(diag), lane(offp))
            return rho, Ci_l, Wp_l
        C, W = jax.vmap(btridiag.factor)(diag, offp[:, 1:])
        Cinv, W = btridiag.inv_factors(C, W)
        return rho, Cinv, W

    # Carry inits derive their varying-axes type from the (possibly
    # shard-varying) problem data so check_vma-checked shard_map accepts the
    # while/fori carries (jaxutil.with_vma_of).
    rho_bar0 = with_vma_of(jnp.full((B,), st.rho_bar, dt), qp)
    rho0, Ci0, W0 = factor(rho_bar0)

    v = with_vma_of(jnp.zeros((B, N, nb), dt), qp) if v0 is None else v0
    y = with_vma_of(jnp.zeros((B, N, r), dt), qp) if y0 is None else y0
    z = amul(qp, v)

    amax = lambda a: jnp.max(jnp.abs(a.reshape(a.shape[0], -1)), axis=-1)

    def admm_round(carry):
        v, z, y, rho, Ci, W, rho_bar, it, conv, pri, dua = carry

        if use_fused:
            v_n, z_n, y_n = map(unlane, fused_rounds.fused_structured_round(
                Ci, W, ac_l, ap_l, q_l, lb_l, ub_l, lane(rho),
                lane(v), lane(z), lane(y),
                iters=st.check_every, alpha=st.alpha, sigma=st.sigma))
        else:
            def step(_, state):
                v, z, y = state
                rhs = st.sigma * v - qp.q + atmul(qp, rho * z - y)
                vt = btridiag.solve_batched(Ci, W, rhs)
                zt = amul(qp, vt)
                v_new = st.alpha * vt + (1 - st.alpha) * v
                z_tmp = st.alpha * zt + (1 - st.alpha) * z + y / rho
                z_new = jnp.clip(z_tmp, qp.lb, qp.ub)
                y_new = rho * (z_tmp - z_new)
                return v_new, z_new, y_new

            v_n, z_n, y_n = jax.lax.fori_loop(
                0, st.check_every, step, (v, z, y))

        c3 = conv[:, None, None]
        v = jnp.where(c3, v, v_n)
        z = jnp.where(c3, z, z_n)
        y = jnp.where(c3, y, y_n)
        it = jnp.where(conv, it, it + st.check_every)

        Av = amul(qp, v)
        pv = pmul(qp, v) + qp.q
        Aty = atmul(qp, y)
        pri_res = amax(Av - z)
        dua_res = amax(pv + Aty)
        eps_pri = st.eps_abs + st.eps_rel * jnp.maximum(amax(Av), amax(z))
        eps_dua = st.eps_abs + st.eps_rel * jnp.maximum(
            jnp.maximum(amax(pv - qp.q), amax(Aty)), amax(qp.q))
        conv_new = conv | ((pri_res <= eps_pri) & (dua_res <= eps_dua))

        if st.adaptive_rho:
            num = pri_res / jnp.maximum(jnp.maximum(amax(Av), amax(z)), 1e-12)
            den = dua_res / jnp.maximum(jnp.maximum(
                amax(pv - qp.q), jnp.maximum(amax(Aty), amax(qp.q))), 1e-12)
            ratio = jnp.sqrt(num / jnp.maximum(den, 1e-12))
            need = (~conv_new) & ((ratio > 5.0) | (ratio < 0.2))
            rho_bar_new = jnp.where(
                need, jnp.clip(rho_bar * ratio, 1e-6, 1e6), rho_bar)

            def refactor():
                rho_n, Ci_n, W_n = factor(rho_bar_new)
                fsel = (need[None, None, None, :] if use_fused
                        else need[:, None, None, None])
                return (jnp.where(need[:, None, None], rho_n, rho),
                        jnp.where(fsel, Ci_n, Ci), jnp.where(fsel, W_n, W))

            rho, Ci, W = jax.lax.cond(
                jnp.any(need), refactor, lambda: (rho, Ci, W))
            rho_bar = rho_bar_new

        return (v, z, y, rho, Ci, W, rho_bar, it, conv_new,
                jnp.where(conv, pri, pri_res), jnp.where(conv, dua, dua_res))

    def cond(carry):
        it, conv = carry[7], carry[8]
        return jnp.any((~conv) & (it < st.max_iter))

    init = (v, z, y, rho0, Ci0, W0, rho_bar0,
            with_vma_of(jnp.zeros((B,), jnp.int32), qp),
            with_vma_of(jnp.zeros((B,), bool), qp),
            with_vma_of(jnp.full((B,), jnp.inf, dt), qp),
            with_vma_of(jnp.full((B,), jnp.inf, dt), qp))
    out = jax.lax.while_loop(cond, admm_round, init)
    v, z, y = out[:3]
    it, conv, pri, dua = out[7], out[8], out[9], out[10]
    return StructuredSolution(v=v, y=y, z=z, iters=it, converged=conv,
                              pri_res=pri, dua_res=dua)
