"""Structured ADMM solver for the lateral path QP.

Same OSQP-semantics ADMM as ``tpu_pathopt.qp.admm`` (relaxation, per-row rho
with equality boost, adaptive rho, unscaled-residual termination — matching
the settings of base_solver.cpp:59-62), but all linear algebra is structured:

- A / A^T products are per-knot einsums (no cons x vars matrix is ever built —
  the reference materializes a dense one and sparsifies it, base_solver.cpp:159),
- the reduced normal matrix M = P + sigma I + A^T rho A is assembled directly
  in block-tridiagonal form and factored with the ``qp.btridiag`` scan kernels,
  O(N) instead of O(N^3).

Warm starting across the two SQP passes mirrors OSQP's warm start
(base_solver.cpp:60, 97-117): pass 2 reuses (x, y) from pass 1.
"""

from __future__ import annotations

import functools

import flax.struct
import jax
import jax.numpy as jnp

from tpu_pathopt.jaxutil import with_vma_of
from tpu_pathopt.qp.admm import QPSettings
from tpu_pathopt.qp import btridiag
from tpu_pathopt.solver import assembly
from tpu_pathopt.solver.assembly import PathQP


@flax.struct.dataclass
class PathQPSolution:
    v: jax.Array           # (N, 6) per-knot [l, e_psi, kappa, u, s_f, s_r]
    y_knot: jax.Array      # (N, 6) duals in the z layout
    y_end: jax.Array       # (2,)
    iters: jax.Array
    converged: jax.Array
    pri_res: jax.Array
    dua_res: jax.Array
    # Final per-element rho. OSQP keeps its rho across warm-started
    # re-solves (the reference's pass 2 reuses the SAME solver object,
    # base_solver.cpp:97-117), so the pipeline threads pass-1's final rho
    # into pass 2 via ``rho0`` instead of restarting adaptation.
    rho_bar: jax.Array


def _inf_norm2(a, b):
    return jnp.maximum(jnp.max(jnp.abs(a)), jnp.max(jnp.abs(b)))


@functools.partial(jax.jit, static_argnames=("settings",))
def solve_path_qp(qp: PathQP, v0=None, y0_knot=None, y0_end=None,
                  settings: QPSettings = QPSettings(),
                  rho0=None) -> PathQPSolution:
    with jax.default_matmul_precision("highest"):
        return _solve_impl(qp, v0, y0_knot, y0_end, settings, rho0)


def _scalar_round_setup(qp: PathQP, v0, y0_knot, y0_end,
                        settings: QPSettings, rho0=None):
    """Initial carry + (cond, round) for the scalar structured solver —
    shared by :func:`solve_path_qp` and :func:`trace_path_rounds` so the
    tracer observes the exact production round body (same pattern as
    ``qp.admm._make_scalar_round``)."""
    st = settings
    N = qp.p_diag.shape[0]
    dt = qp.p_diag.dtype

    lb_knot, ub_knot, lb_end, ub_end = assembly.bounds(qp)
    cls_knot, cls_end = assembly.rho_classes(qp)

    def factor(rho_bar):
        rk = rho_bar * cls_knot
        re = rho_bar * cls_end
        diag, off = assembly.normal_blocks(qp, rk, re, st.sigma)
        C, W = btridiag.factor(diag, off)
        return rk, re, C, W

    rho_bar0 = (jnp.asarray(st.rho_bar, dt) if rho0 is None
                else jnp.asarray(rho0, dt))
    rk0, re0, C0, W0 = factor(rho_bar0)

    v = jnp.zeros((N, assembly.NB), dt) if v0 is None else v0
    yk = jnp.zeros((N, 6), dt) if y0_knot is None else y0_knot
    ye = jnp.zeros((2,), dt) if y0_end is None else y0_end
    zk, ze = assembly.a_mul(qp, v)

    def admm_round(carry):
        v, zk, ze, yk, ye, rk, re, C, W, rho_bar, it, conv, pri, dua = carry

        def step(_, state):
            v, zk, ze, yk, ye = state
            rhs = (st.sigma * v
                   + assembly.at_mul(qp, rk * zk - yk, re * ze - ye))
            vt = btridiag.solve(C, W, rhs)
            ztk, zte = assembly.a_mul(qp, vt)
            v_new = st.alpha * vt + (1 - st.alpha) * v
            ztmp_k = st.alpha * ztk + (1 - st.alpha) * zk + yk / rk
            ztmp_e = st.alpha * zte + (1 - st.alpha) * ze + ye / re
            zk_new = jnp.clip(ztmp_k, lb_knot, ub_knot)
            ze_new = jnp.clip(ztmp_e, lb_end, ub_end)
            yk_new = rk * (ztmp_k - zk_new)
            ye_new = re * (ztmp_e - ze_new)
            return v_new, zk_new, ze_new, yk_new, ye_new

        v_n, zk_n, ze_n, yk_n, ye_n = jax.lax.fori_loop(
            0, st.check_every, step, (v, zk, ze, yk, ye))
        v = jnp.where(conv, v, v_n)
        zk = jnp.where(conv, zk, zk_n)
        ze = jnp.where(conv, ze, ze_n)
        yk = jnp.where(conv, yk, yk_n)
        ye = jnp.where(conv, ye, ye_n)
        it = jnp.where(conv, it, it + st.check_every)

        # Residuals (the problem is built unscaled).
        Avk, Ave = assembly.a_mul(qp, v)
        pv = qp.p_diag * v
        Aty = assembly.at_mul(qp, yk, ye)
        pri_res = _inf_norm2(Avk - zk, Ave - ze)
        dua_res = jnp.max(jnp.abs(pv + Aty))
        eps_pri = st.eps_abs + st.eps_rel * jnp.maximum(
            _inf_norm2(Avk, Ave), _inf_norm2(zk, ze))
        eps_dua = st.eps_abs + st.eps_rel * jnp.maximum(
            jnp.max(jnp.abs(pv)), jnp.max(jnp.abs(Aty)))
        conv_new = conv | ((pri_res <= eps_pri) & (dua_res <= eps_dua))

        if st.adaptive_rho:
            num = pri_res / jnp.maximum(
                jnp.maximum(_inf_norm2(Avk, Ave), _inf_norm2(zk, ze)), 1e-12)
            den = dua_res / jnp.maximum(
                jnp.maximum(jnp.max(jnp.abs(pv)), jnp.max(jnp.abs(Aty))), 1e-12)
            ratio = jnp.sqrt(num / jnp.maximum(den, 1e-12))
            need = (~conv_new) & ((ratio > 5.0) | (ratio < 0.2))
            rho_bar_new = jnp.where(
                need, jnp.clip(rho_bar * ratio, 1e-6, 1e6), rho_bar)
            rk_n, re_n, C_n, W_n = factor(rho_bar_new)
            rk = jnp.where(need, rk_n, rk)
            re = jnp.where(need, re_n, re)
            C = jnp.where(need, C_n, C)
            W = jnp.where(need, W_n, W)
            rho_bar = rho_bar_new

        return (v, zk, ze, yk, ye, rk, re, C, W, rho_bar, it, conv_new,
                jnp.where(conv, pri, pri_res), jnp.where(conv, dua, dua_res))

    def cond(carry):
        it, conv = carry[10], carry[11]
        return (~conv) & (it < st.max_iter)

    init = (v, zk, ze, yk, ye, rk0, re0, C0, W0, rho_bar0,
            jnp.asarray(0, jnp.int32), jnp.asarray(False),
            jnp.asarray(jnp.inf, dt), jnp.asarray(jnp.inf, dt))
    return init, cond, admm_round


def _solution_from_carry(out) -> PathQPSolution:
    v, zk, ze, yk, ye = out[:5]
    it, conv, pri, dua = out[10], out[11], out[12], out[13]
    return PathQPSolution(v=v, y_knot=yk, y_end=ye, iters=it, converged=conv,
                          pri_res=pri, dua_res=dua, rho_bar=out[9])


def _solve_impl(qp: PathQP, v0, y0_knot, y0_end,
                settings: QPSettings, rho0=None) -> PathQPSolution:
    init, cond, admm_round = _scalar_round_setup(qp, v0, y0_knot, y0_end,
                                                 settings, rho0)
    return _solution_from_carry(jax.lax.while_loop(cond, admm_round, init))


@functools.partial(jax.jit, static_argnames=("settings", "n_rounds"))
def trace_path_rounds(qp: PathQP, settings: QPSettings = QPSettings(),
                      n_rounds: int = 16, v0=None, y0_knot=None, y0_end=None,
                      rho0=None):
    """Run exactly ``n_rounds`` ADMM rounds of the scalar structured path
    solver (the SAME round body — shared via ``_scalar_round_setup``) and
    return the per-round trajectory: dict of (iters, pri_res, dua_res,
    rho_bar, converged), each with a leading ``n_rounds`` axis. This is the
    per-solve verbose surface matching the reference's OSQP
    ``settings.verbose = true`` (base_solver.cpp:59), which prints residuals
    at every residual check — exposed on the CLI as ``--verbose-qp``.
    Converged rounds freeze (identical to the production while_loop), so the
    printed trajectory is exactly what :func:`solve_path_qp` executed."""
    with jax.default_matmul_precision("highest"):
        init, _cond, admm_round = _scalar_round_setup(
            qp, v0, y0_knot, y0_end, settings, rho0)

        def body(carry, _):
            carry = admm_round(carry)
            return carry, dict(iters=carry[10], pri_res=carry[12],
                               dua_res=carry[13], rho_bar=carry[9],
                               converged=carry[11])

        _, tr = jax.lax.scan(body, init, None, length=n_rounds)
        return tr


@functools.partial(jax.jit, static_argnames=("settings",))
def solve_path_qp_batched(qp: PathQP, v0=None, y0_knot=None, y0_end=None,
                          settings: QPSettings = QPSettings(),
                          rho0=None) -> PathQPSolution:
    """Batched structured solver: every ``qp`` field has a leading batch axis.

    Differences from ``vmap(solve_path_qp)`` that matter on TPU:

    - the block-Cholesky factors are explicitly inverted once per rho update
      (``btridiag.inv_factors``), so the per-iteration solve scans are
      matvec-only einsums with the whole batch riding the vector lanes;
    - rho refactorization runs under a chunk-global ``lax.cond`` instead of
      being recomputed every round for every element;
    - termination is per-128-lane-chunk (all lanes of a chunk converged),
      with per-element freezing so early finishers don't drift (OSQP
      warm-start semantics preserved across the two SQP passes,
      base_solver.cpp:97-117) — see ``_solve_batched_impl``.
    """
    with jax.default_matmul_precision("highest"):
        return _solve_batched_impl(qp, v0, y0_knot, y0_end, settings, rho0)


def _solve_batched_impl(qp: PathQP, v0, y0_knot, y0_end,
                        settings: QPSettings, rho0=None) -> PathQPSolution:
    """Chunked driver. When the fused kernels engage (TPU backends) and the
    batch spans several 128-lane chunks, each chunk runs its OWN while_loop
    (via ``lax.map``), so a chunk whose lanes all converged stops paying
    rounds for stragglers in other chunks. Per-element trajectories are
    identical to the batch-global loop (converged lanes are frozen either
    way); only wasted post-convergence rounds disappear. Callers that sort
    scenarios by difficulty (pipeline pass 2 sorts by pass-1 iterations)
    concentrate stragglers into few chunks and harvest the tail."""
    st = settings
    B = qp.p_diag.shape[0]
    # Fused-Pallas rounds only on TPU backends — on CPU the kernels would
    # run in interpret mode (orders of magnitude slower than the XLA
    # rounds); kernel parity on CPU is covered by dedicated interpret tests.
    on_tpu = jax.default_backend() in ("tpu", "axon")
    if not (st.fused_rounds and on_tpu):
        return _solve_chunk_xla(qp, v0, y0_knot, y0_end, settings, rho0)
    ch = 128  # fused_rounds._MAX_LANES — one hardware lane tile per chunk
    if B <= ch or B % ch != 0:
        return _solve_chunk_fused(qp, v0, y0_knot, y0_end, settings,
                                  rho0=rho0)

    N = qp.p_diag.shape[1]
    dtp = qp.p_diag.dtype
    if v0 is None:
        v0 = with_vma_of(jnp.zeros((B, N, assembly.NB), dtp), qp)
    if y0_knot is None:
        y0_knot = with_vma_of(jnp.zeros((B, N, 6), dtp), qp)
    if y0_end is None:
        y0_end = with_vma_of(jnp.zeros((B, 2), dtp), qp)
    # A caller-supplied rho0 may be a plain scalar (the advertised API);
    # broadcast it to (B,) BEFORE chunking or resh() below fails on it.
    rho0 = with_vma_of(
        jnp.full((B,), st.rho_bar, dtp) if rho0 is None
        else jnp.broadcast_to(jnp.asarray(rho0, dtp), (B,)), qp)
    nc = B // ch
    resh = lambda a: a.reshape((nc, ch) + a.shape[1:])
    chunked = jax.tree_util.tree_map(resh, (qp, v0, y0_knot, y0_end, rho0))

    def run(args):
        qp_i, v0_i, yk_i, ye_i, rho_i = args
        return _solve_chunk_fused(qp_i, v0_i, yk_i, ye_i, settings,
                                  rho0=rho_i)

    sol = jax.lax.map(run, chunked)
    return jax.tree_util.tree_map(
        lambda a: a.reshape((B,) + a.shape[2:]), sol)


def _solve_chunk_fused(qp: PathQP, v0, y0_knot, y0_end,
                       settings: QPSettings, rho0=None) -> PathQPSolution:
    """One (<= 128-lane) chunk through the fused Pallas round/factor kernels.

    All loop state is carried LANE-MAJOR ((N, 6, B), batch on the lanes)
    across the while_loop, and the kernel returns the per-lane residual
    scales, so the per-round XLA glue reduces to (B,)-shaped termination and
    adaptive-rho logic — no transposes and no (B, N, 6) traffic between
    rounds (that glue measured ~2 ms/round at B=256, more than the 25
    in-kernel iterations themselves)."""
    from tpu_pathopt.solver import fused_rounds
    st = settings
    B, N = qp.p_diag.shape[0], qp.p_diag.shape[1]
    dt = qp.p_diag.dtype
    lane = lambda a: jnp.moveaxis(a, 0, -1)
    unlane = lambda a: jnp.moveaxis(a, -1, 0)

    lb_knot, ub_knot, lb_end, ub_end = jax.vmap(assembly.bounds)(qp)
    cls_knot, cls_end = jax.vmap(assembly.rho_classes)(qp)
    a_mul = jax.vmap(assembly.a_mul)

    # Static per-solve constants in kernel layout.
    geom = qp.coll_coef[:1, 0, :, 1]                       # (1, 2) lf, lr
    es_l = lane((jnp.arange(N)[None, :]
                 == qp.end_idx[:, None]).astype(dt))[:, None, :]  # (N, 1, B)
    tp_l = lane(qp.t_prev)                                 # (N, 3, 6, B)
    lbk_l, ubk_l = lane(lb_knot), lane(ub_knot)
    lbe_l, ube_l = lane(lb_end), lane(ub_end)
    pd_l = lane(qp.p_diag)                                 # (N, 6, B)

    def factor(rho_bar):
        rk = rho_bar[:, None, None] * cls_knot
        re = rho_bar[:, None] * cls_end
        diag, off = jax.vmap(assembly.normal_blocks, in_axes=(0, 0, 0, None))(
            qp, rk, re, st.sigma)
        # Lane-major fused factor kernel; W comes back already padded
        # ((N, 6, 6, B) with W[0] = 0) in the kernel layout.
        offp = jnp.concatenate([jnp.zeros((B, 1, 6, 6), dt), off], axis=1)
        Ci_l, Wp_l = fused_rounds.fused_factor(lane(diag), lane(offp))
        return lane(rk), lane(re), Ci_l, Wp_l

    # Carry inits inherit the vma type of the problem data (check_vma support
    # under shard_map; jaxutil.with_vma_of).
    # A caller-supplied rho0 may be a plain constant (e.g. rho_bar_path) —
    # broadcast it to the (B,) per-element shape the factor math expects and
    # fold the problem's vma type in so the while-loop carry types check
    # under shard_map(check_vma=True).
    rho_bar0 = with_vma_of(
        jnp.full((B,), st.rho_bar, dt) if rho0 is None
        else jnp.broadcast_to(jnp.asarray(rho0, dt), (B,)), qp)
    rk0, re0, Ci0, W0 = factor(rho_bar0)

    v = (with_vma_of(jnp.zeros((B, N, assembly.NB), dt), qp)
         if v0 is None else v0)
    yk = (with_vma_of(jnp.zeros((B, N, 6), dt), qp)
          if y0_knot is None else y0_knot)
    ye = (with_vma_of(jnp.zeros((B, 2), dt), qp)
          if y0_end is None else y0_end)
    zk, ze = a_mul(qp, v)

    def admm_round(carry):
        (v, zk, ze, yk, ye, rk, re, Ci, W, rho_bar, it, conv, pri, dua) = carry

        v_n, zk_n, ze_n, yk_n, ye_n, res = fused_rounds.fused_admm_round(
            geom, Ci, W, tp_l, lbk_l, ubk_l, lbe_l, ube_l, rk, re, es_l,
            pd_l, v, zk, ze, yk, ye,
            iters=st.check_every, alpha=st.alpha, sigma=st.sigma)
        cl = conv[None, None, :]
        v = jnp.where(cl, v, v_n)
        zk = jnp.where(cl, zk, zk_n)
        ze = jnp.where(conv[None, :], ze, ze_n)
        yk = jnp.where(cl, yk, yk_n)
        ye = jnp.where(conv[None, :], ye, ye_n)
        it = jnp.where(conv, it, it + st.check_every)

        # In-kernel residuals are measured on the unfrozen iterate; for
        # converged lanes they differ from the frozen state's, but conv is
        # sticky and their pri/dua values are discarded below, so the
        # recorded trajectory is identical to the XLA branch.
        pri_res, dua_res, n_az, n_pd = res[0], res[1], res[2], res[3]
        eps_pri = st.eps_abs + st.eps_rel * n_az
        eps_dua = st.eps_abs + st.eps_rel * n_pd
        conv_new = conv | ((pri_res <= eps_pri) & (dua_res <= eps_dua))

        if st.adaptive_rho:
            num = pri_res / jnp.maximum(n_az, 1e-12)
            den = dua_res / jnp.maximum(n_pd, 1e-12)
            ratio = jnp.sqrt(num / jnp.maximum(den, 1e-12))
            need = (~conv_new) & ((ratio > 5.0) | (ratio < 0.2))
            rho_bar_new = jnp.where(
                need, jnp.clip(rho_bar * ratio, 1e-6, 1e6), rho_bar)

            def refactor():
                rk_n, re_n, Ci_n, W_n = factor(rho_bar_new)
                fsel = need[None, None, None, :]
                return (jnp.where(need[None, None, :], rk_n, rk),
                        jnp.where(need[None, :], re_n, re),
                        jnp.where(fsel, Ci_n, Ci),
                        jnp.where(fsel, W_n, W))

            rk, re, Ci, W = jax.lax.cond(
                jnp.any(need), refactor, lambda: (rk, re, Ci, W))
            rho_bar = rho_bar_new

        return (v, zk, ze, yk, ye, rk, re, Ci, W, rho_bar, it, conv_new,
                jnp.where(conv, pri, pri_res), jnp.where(conv, dua, dua_res))

    def cond(carry):
        it, conv = carry[10], carry[11]
        return jnp.any((~conv) & (it < st.max_iter))

    init = (lane(v), lane(zk), lane(ze), lane(yk), lane(ye),
            rk0, re0, Ci0, W0, rho_bar0,
            with_vma_of(jnp.zeros((B,), jnp.int32), qp),
            with_vma_of(jnp.zeros((B,), bool), qp),
            with_vma_of(jnp.full((B,), jnp.inf, dt), qp),
            with_vma_of(jnp.full((B,), jnp.inf, dt), qp))
    out = jax.lax.while_loop(cond, admm_round, init)
    it, conv, pri, dua = out[10], out[11], out[12], out[13]
    return PathQPSolution(v=unlane(out[0]), y_knot=unlane(out[3]),
                          y_end=unlane(out[4]), iters=it, converged=conv,
                          pri_res=pri, dua_res=dua, rho_bar=out[9])


def _solve_chunk_xla(qp: PathQP, v0, y0_knot, y0_end,
                     settings: QPSettings, rho0=None) -> PathQPSolution:
    """Batch-global XLA rounds (non-TPU backends / fused_rounds=False)."""
    st = settings
    B, N = qp.p_diag.shape[0], qp.p_diag.shape[1]
    dt = qp.p_diag.dtype

    lb_knot, ub_knot, lb_end, ub_end = jax.vmap(assembly.bounds)(qp)
    cls_knot, cls_end = jax.vmap(assembly.rho_classes)(qp)

    a_mul = jax.vmap(assembly.a_mul)
    at_mul = jax.vmap(assembly.at_mul)

    def factor(rho_bar):
        rk = rho_bar[:, None, None] * cls_knot
        re = rho_bar[:, None] * cls_end
        diag, off = jax.vmap(assembly.normal_blocks, in_axes=(0, 0, 0, None))(
            qp, rk, re, st.sigma)
        C, W = jax.vmap(btridiag.factor)(diag, off)
        Cinv, W = btridiag.inv_factors(C, W)
        return rk, re, Cinv, W

    # Carry inits inherit the vma type of the problem data (check_vma support
    # under shard_map; jaxutil.with_vma_of).
    # A caller-supplied rho0 may be a plain constant (e.g. rho_bar_path) —
    # broadcast it to the (B,) per-element shape the factor math expects and
    # fold the problem's vma type in so the while-loop carry types check
    # under shard_map(check_vma=True).
    rho_bar0 = with_vma_of(
        jnp.full((B,), st.rho_bar, dt) if rho0 is None
        else jnp.broadcast_to(jnp.asarray(rho0, dt), (B,)), qp)
    rk0, re0, Ci0, W0 = factor(rho_bar0)

    v = (with_vma_of(jnp.zeros((B, N, assembly.NB), dt), qp)
         if v0 is None else v0)
    yk = (with_vma_of(jnp.zeros((B, N, 6), dt), qp)
          if y0_knot is None else y0_knot)
    ye = (with_vma_of(jnp.zeros((B, 2), dt), qp)
          if y0_end is None else y0_end)
    zk, ze = a_mul(qp, v)

    amax = lambda a: jnp.max(jnp.abs(a.reshape(a.shape[0], -1)), axis=-1)
    inf2 = lambda a, b: jnp.maximum(amax(a), amax(b))

    def admm_round(carry):
        (v, zk, ze, yk, ye, rk, re, Ci, W, rho_bar, it, conv, pri, dua) = carry

        solve_fn = (btridiag.solve_batched_pscan if st.pscan
                    else btridiag.solve_batched)

        def step(_, state):
            v, zk, ze, yk, ye = state
            rhs = st.sigma * v + at_mul(qp, rk * zk - yk, re * ze - ye)
            vt = solve_fn(Ci, W, rhs)
            ztk, zte = a_mul(qp, vt)
            v_new = st.alpha * vt + (1 - st.alpha) * v
            ztmp_k = st.alpha * ztk + (1 - st.alpha) * zk + yk / rk
            ztmp_e = st.alpha * zte + (1 - st.alpha) * ze + ye / re
            zk_new = jnp.clip(ztmp_k, lb_knot, ub_knot)
            ze_new = jnp.clip(ztmp_e, lb_end, ub_end)
            yk_new = rk * (ztmp_k - zk_new)
            ye_new = re * (ztmp_e - ze_new)
            return v_new, zk_new, ze_new, yk_new, ye_new

        v_n, zk_n, ze_n, yk_n, ye_n = jax.lax.fori_loop(
            0, st.check_every, step, (v, zk, ze, yk, ye))
        c3 = conv[:, None, None]
        v = jnp.where(c3, v, v_n)
        zk = jnp.where(c3, zk, zk_n)
        ze = jnp.where(conv[:, None], ze, ze_n)
        yk = jnp.where(c3, yk, yk_n)
        ye = jnp.where(conv[:, None], ye, ye_n)
        it = jnp.where(conv, it, it + st.check_every)

        Avk, Ave = a_mul(qp, v)
        pv = qp.p_diag * v
        Aty = at_mul(qp, yk, ye)
        pri_res = inf2(Avk - zk, Ave - ze)
        dua_res = amax(pv + Aty)
        n_az = jnp.maximum(inf2(Avk, Ave), inf2(zk, ze))
        n_pd = jnp.maximum(amax(pv), amax(Aty))
        eps_pri = st.eps_abs + st.eps_rel * n_az
        eps_dua = st.eps_abs + st.eps_rel * n_pd
        conv_new = conv | ((pri_res <= eps_pri) & (dua_res <= eps_dua))

        if st.adaptive_rho:
            num = pri_res / jnp.maximum(n_az, 1e-12)
            den = dua_res / jnp.maximum(n_pd, 1e-12)
            ratio = jnp.sqrt(num / jnp.maximum(den, 1e-12))
            need = (~conv_new) & ((ratio > 5.0) | (ratio < 0.2))
            rho_bar_new = jnp.where(
                need, jnp.clip(rho_bar * ratio, 1e-6, 1e6), rho_bar)

            def refactor():
                rk_n, re_n, Ci_n, W_n = factor(rho_bar_new)
                fsel = need[:, None, None, None]
                return (jnp.where(need[:, None, None], rk_n, rk),
                        jnp.where(need[:, None], re_n, re),
                        jnp.where(fsel, Ci_n, Ci),
                        jnp.where(fsel, W_n, W))

            rk, re, Ci, W = jax.lax.cond(
                jnp.any(need), refactor, lambda: (rk, re, Ci, W))
            rho_bar = rho_bar_new

        return (v, zk, ze, yk, ye, rk, re, Ci, W, rho_bar, it, conv_new,
                jnp.where(conv, pri, pri_res), jnp.where(conv, dua, dua_res))

    def cond(carry):
        it, conv = carry[10], carry[11]
        return jnp.any((~conv) & (it < st.max_iter))

    init = (v, zk, ze, yk, ye, rk0, re0, Ci0, W0, rho_bar0,
            with_vma_of(jnp.zeros((B,), jnp.int32), qp),
            with_vma_of(jnp.zeros((B,), bool), qp),
            with_vma_of(jnp.full((B,), jnp.inf, dt), qp),
            with_vma_of(jnp.full((B,), jnp.inf, dt), qp))
    out = jax.lax.while_loop(cond, admm_round, init)
    v, zk, ze, yk, ye = out[:5]
    it, conv, pri, dua = out[10], out[11], out[12], out[13]
    return PathQPSolution(v=v, y_knot=yk, y_end=ye, iters=it, converged=conv,
                          pri_res=pri, dua_res=dua, rho_bar=out[9])
