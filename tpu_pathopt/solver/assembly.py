"""Structured assembly of the lateral path QP.

Rebuilds the QP of the reference's BaseSolver (base_solver.cpp:119-261) in a
knot-blocked structured form. Variables are ordered per knot
``v_i = [l, e_psi, kappa, u, s_front, s_rear]`` (6 per knot; the reference's
flat ordering [states | controls | slacks] with 6n-1 variables is equivalent —
our extra u_{n-1} is an unconstrained dummy regularized by its own cost).

Constraint rows per knot (6N + 2 total, matching cons_size_ = 6n+2 at
base_solver.cpp:37 with rough_constraints_far_away=false):

- 3 transition rows producing x_i:  T_prev_i v_{i-1} + T_cur v_i = rhs_i with
  T_cur = [-I3 | 0], T_prev_i = [A_{i-1} | B_{i-1} | 0], rhs_0 = -x0 (initial
  state pin) and rhs_i = -c_{i-1} (linearized dynamics, base_solver.cpp:160-187).
- 1 curvature row: kappa_i in [-kappa_max, kappa_max] (base_solver.cpp:189-231).
- 2 collision rows: l + L_f e + s_f in front soft bounds, l + L_r e + s_r in
  rear soft bounds (base_solver.cpp:193-206, 232-248); slacks are penalized in
  the cost but unconstrained in sign — the candidate-path mechanism.
- 2 end rows (on the last valid knot): end l in [-1, 1]; end e_psi optionally
  pinned near the goal heading (base_solver.cpp:249-260).

Fixed-shape padding: knots with index >= n_valid get their transition rows
turned into x_i = 0 pins, collision rows into slack pins with zero bounds,
and zero cross-knot coupling, so the padded problem's solution restricted to
valid knots equals the unpadded solution exactly.
"""

from __future__ import annotations

import flax.struct
import jax
import jax.numpy as jnp

from tpu_pathopt.config import PlannerConfig
from tpu_pathopt.geometry import constrain_angle
from tpu_pathopt.qp.admm import INFTY

NB = 6  # variables per knot


@flax.struct.dataclass
class PathQP:
    """Structured lateral path QP over N knots (padded)."""

    # Per-knot cost diagonal (N, 6).
    p_diag: jax.Array
    # Transition structure: T_prev[i] (3, 6) acts on knot i-1 (zero for i=0 and
    # padded rows); rhs (N, 3) equality right-hand side.
    t_prev: jax.Array           # (N, 3, 6)
    trans_rhs: jax.Array        # (N, 3)
    # Collision rows: coefficient vectors (N, 2, 6) [front; rear] + bounds.
    coll_coef: jax.Array        # (N, 2, 6)
    coll_lb: jax.Array          # (N, 2)
    coll_ub: jax.Array          # (N, 2)
    # Curvature bounds (N,).
    kappa_lb: jax.Array
    kappa_ub: jax.Array
    # End rows: applied at knot end_idx.
    end_idx: jax.Array          # () int32
    end_lb: jax.Array           # (2,) [l, e_psi]
    end_ub: jax.Array           # (2,)
    # Validity.
    n_valid: jax.Array          # () int32
    knot_mask: jax.Array        # (N,) bool

    @property
    def n(self) -> int:
        return self.p_diag.shape[0]


# Host-side (numpy) constant: a module-level device array would be committed
# to the default backend at import and fetched back during every lowering.
import numpy as _np
T_CUR = _np.concatenate([-_np.eye(3, dtype=_np.float32),
                         _np.zeros((3, 3), _np.float32)], axis=1)  # (3, 6)


def soft_bounds(lb, ub, safety_margin, min_clearance=0.1):
    """Shrink a corridor by up to `safety_margin` per side keeping at least
    `min_clearance` of width (reference: getSoftBounds, base_solver.cpp:290-296)."""
    clearance = ub - lb
    remain = jnp.maximum(min_clearance, clearance - 2.0 * safety_margin)
    shrink = jnp.maximum(0.0, (clearance - remain) / 2.0)
    return lb + shrink, ub - shrink


def assemble_path_qp(
    ref_s, ref_k, ref_heading_last,
    input_l, input_e, input_k,
    front_lb, front_ub, rear_lb, rear_ub,
    init_offset, init_heading_error, start_k,
    target_heading, blocked,
    n_valid,
    config: PlannerConfig,
    center_lb=None, center_ub=None,
) -> PathQP:
    """Build the structured QP. All per-knot arrays have static length N.

    input_* are the linearization path (pass 1: the reference states with
    l=e=0, k=k_ref; pass 2: the pass-1 solution) — SQP re-linearization per
    base_solver.cpp:97-117 and path_optimizer.cpp:124-157.
    """
    N = ref_s.shape[0]
    dt = ref_s.dtype
    idx = jnp.arange(N)
    n_valid = jnp.asarray(n_valid, jnp.int32)
    knot_mask = idx < n_valid

    # --- Cost diagonal (base_solver.cpp:119-148; hardcoded weights) ---
    p_diag = jnp.broadcast_to(
        jnp.asarray([config.weight_l, 0.0, config.weight_kappa,
                     config.weight_dkappa, config.weight_slack,
                     config.weight_slack], dt), (N, NB))

    # --- Transition linearization (base_solver.cpp:160-187) ---
    ds = jnp.diff(ref_s)                                   # (N-1,)
    ds = jnp.where(ds > 1e-6, ds, 1.0)
    lbar, ebar, kbar = input_l[:-1], input_e[:-1], input_k[:-1]
    cos_e = jnp.cos(ebar)
    tan_e = jnp.tan(ebar)
    one_kl = 1.0 - kbar * lbar
    z = jnp.zeros_like(lbar)
    df_x = jnp.stack([
        jnp.stack([-kbar * tan_e, one_kl / cos_e ** 2, z], axis=-1),
        jnp.stack([-kbar ** 2 / cos_e, one_kl * kbar * tan_e / cos_e,
                   one_kl / cos_e], axis=-1),
        jnp.stack([z, z, z], axis=-1),
    ], axis=-2)                                            # (N-1, 3, 3)
    A = jnp.eye(3, dtype=dt) + ds[:, None, None] * df_x
    B = ds[:, None] * jnp.asarray([0.0, 0.0, 1.0], dt)     # (N-1, 3)
    u_input = (input_k[1:] - input_k[:-1]) / ds
    f = jnp.stack([
        one_kl * tan_e,
        one_kl * kbar / cos_e - ref_k[:-1],
        u_input,
    ], axis=-1)                                            # (N-1, 3)
    xbar = jnp.stack([lbar, ebar, kbar], axis=-1)          # (N-1, 3)
    c = ds[:, None] * (f - jnp.einsum("nij,nj->ni", df_x, xbar)
                       - B * u_input[:, None])             # (N-1, 3)

    # T_prev for knot i (i >= 1): [A_{i-1} | B_{i-1} | 0]; zero where the row
    # is an init pin (i=0) or a padded pin (i >= n_valid).
    t_prev_body = jnp.concatenate(
        [A, B[:, :, None], jnp.zeros((N - 1, 3, 2), dt)], axis=-1)  # (N-1,3,6)
    t_prev = jnp.concatenate([jnp.zeros((1, 3, NB), dt), t_prev_body])
    coupled = (idx >= 1) & (idx < n_valid)
    t_prev = jnp.where(coupled[:, None, None], t_prev, 0.0)

    x0 = jnp.stack([jnp.asarray(init_offset, dt),
                    jnp.asarray(init_heading_error, dt),
                    jnp.asarray(start_k, dt)])
    trans_rhs_body = jnp.concatenate([-x0[None, :], -c])   # (N, 3)
    trans_rhs = jnp.where(coupled[:, None] | (idx[:, None] == 0),
                          trans_rhs_body, 0.0)             # padded rows pin x=0

    # --- Curvature rows (base_solver.cpp:226-231) ---
    kl = jnp.asarray(config.kappa_limit, dt)
    kappa_lb = jnp.full((N,), -kl, dt)
    kappa_ub = jnp.full((N,), kl, dt)

    # --- Collision rows (base_solver.cpp:193-206, 232-248) ---
    cf = jnp.asarray([1.0, config.front_length, 0.0, 0.0, 1.0, 0.0], dt)
    cr = jnp.asarray([1.0, config.rear_length, 0.0, 0.0, 0.0, 1.0], dt)
    coll_coef = jnp.broadcast_to(jnp.stack([cf, cr]), (N, 2, NB))
    f_lb, f_ub = soft_bounds(front_lb, front_ub, config.expected_safety_margin)
    r_lb, r_ub = soft_bounds(rear_lb, rear_ub, config.expected_safety_margin)
    coll_lb = jnp.stack([f_lb, r_lb], axis=-1)
    coll_ub = jnp.stack([f_ub, r_ub], axis=-1)
    if config.rough_constraints_far_away:
        # Beyond precise_planning_length, the reference drops to a single
        # center-corridor row per knot with one slack (base_solver.cpp:25-37,
        # :193-206, :232-248). Fixed-shape version: row 0 becomes the center
        # row (l + s_front in center soft bounds), row 1 pins the now-unused
        # rear slack to 0 so the static 2-row layout is preserved.
        assert center_lb is not None and center_ub is not None, \
            "rough_constraints_far_away needs center bounds " \
            "(update_bounds(..., with_center=True))"
        rough = (ref_s >= config.precise_planning_length) & knot_mask
        cc = jnp.asarray([1.0, 0.0, 0.0, 0.0, 1.0, 0.0], dt)
        pin_r = jnp.asarray([0.0, 0.0, 0.0, 0.0, 0.0, 1.0], dt)
        rough_coef = jnp.broadcast_to(jnp.stack([cc, pin_r]), (N, 2, NB))
        coll_coef = jnp.where(rough[:, None, None], rough_coef, coll_coef)
        c_lb, c_ub = soft_bounds(center_lb, center_ub,
                                 config.expected_safety_margin)
        zero = jnp.zeros_like(c_lb)
        coll_lb = jnp.where(rough[:, None],
                            jnp.stack([c_lb, zero], axis=-1), coll_lb)
        coll_ub = jnp.where(rough[:, None],
                            jnp.stack([c_ub, zero], axis=-1), coll_ub)
    # Padded knots: pin rows to 0 (vars are pinned to 0 by the transition pins,
    # so [0, 0] bounds keep the rows consistent and well-conditioned).
    coll_lb = jnp.where(knot_mask[:, None], coll_lb, 0.0)
    coll_ub = jnp.where(knot_mask[:, None], coll_ub, 0.0)

    # --- End rows (base_solver.cpp:249-260) ---
    end_idx = n_valid - 1
    end_psi = constrain_angle(jnp.asarray(target_heading, dt)
                              - jnp.asarray(ref_heading_last, dt))
    use_heading = (jnp.asarray(config.constraint_end_heading)
                   & ~jnp.asarray(blocked)
                   & (end_psi < 70.0 * jnp.pi / 180.0))
    end_lb = jnp.stack([jnp.asarray(-1.0, dt),
                        jnp.where(use_heading, end_psi - 0.087, -INFTY)])
    end_ub = jnp.stack([jnp.asarray(1.0, dt),
                        jnp.where(use_heading, end_psi + 0.087, INFTY)])

    return PathQP(
        p_diag=p_diag, t_prev=t_prev, trans_rhs=trans_rhs,
        coll_coef=coll_coef, coll_lb=coll_lb, coll_ub=coll_ub,
        kappa_lb=kappa_lb, kappa_ub=kappa_ub,
        end_idx=end_idx, end_lb=end_lb, end_ub=end_ub,
        n_valid=n_valid, knot_mask=knot_mask)


# ---------------------------------------------------------------------------
# Structured constraint operators. The "z" layout packs per-knot rows as
# (N, 6) = [trans(3), kappa(1), coll(2)] plus the 2 end rows.
# ---------------------------------------------------------------------------

def a_mul(qp: PathQP, v):
    """A @ v. v: (N, 6) -> (z_knot (N, 6), z_end (2,))."""
    trans = jnp.einsum("ij,nj->ni", T_CUR, v)
    trans = trans + jnp.einsum("nij,nj->ni", qp.t_prev,
                               jnp.concatenate([jnp.zeros_like(v[:1]), v[:-1]]))
    kappa = v[:, 2:3]
    coll = jnp.einsum("nij,nj->ni", qp.coll_coef, v)
    z_knot = jnp.concatenate([trans, kappa, coll], axis=-1)
    z_end = jax.lax.dynamic_slice(v, (qp.end_idx, 0), (1, NB))[0, :2]
    return z_knot, z_end


def at_mul(qp: PathQP, w_knot, w_end):
    """A^T @ w. w_knot: (N, 6), w_end: (2,) -> (N, 6)."""
    wt = w_knot[:, :3]          # transition rows
    wk = w_knot[:, 3]           # kappa rows
    wc = w_knot[:, 4:6]         # collision rows
    out = jnp.einsum("ij,ni->nj", T_CUR, wt)
    # T_prev of row-block i+1 acts on knot i:
    contrib = jnp.einsum("nij,ni->nj", qp.t_prev[1:], wt[1:])
    out = out.at[:-1].add(contrib)
    out = out.at[:, 2].add(wk)
    out = out + jnp.einsum("nij,ni->nj", qp.coll_coef, wc)
    out = out.at[qp.end_idx, 0].add(w_end[0])
    out = out.at[qp.end_idx, 1].add(w_end[1])
    return out


def bounds(qp: PathQP):
    """(lb_knot (N,6), ub_knot, lb_end (2,), ub_end) in the z layout."""
    lb_knot = jnp.concatenate(
        [qp.trans_rhs, qp.kappa_lb[:, None], qp.coll_lb], axis=-1)
    ub_knot = jnp.concatenate(
        [qp.trans_rhs, qp.kappa_ub[:, None], qp.coll_ub], axis=-1)
    return lb_knot, ub_knot, qp.end_lb, qp.end_ub


def rho_classes(qp: PathQP):
    """Per-row rho multiplier pattern: 1e3 on equality (transition) rows,
    1e-6 on loose rows, 1 elsewhere. Returns (knot (N,6), end (2,))."""
    N = qp.p_diag.shape[0]
    dt = qp.p_diag.dtype
    knot = jnp.concatenate([
        jnp.full((N, 3), 1e3, dt),           # transitions are equalities
        jnp.ones((N, 1), dt),                # kappa
        jnp.where((qp.coll_ub - qp.coll_lb) < 1e-9, 1e3, 1.0),  # padded pins
    ], axis=-1)
    end_loose = (qp.end_lb < -0.5 * INFTY) & (qp.end_ub > 0.5 * INFTY)
    end = jnp.where(end_loose, 1e-6, 1.0).astype(dt)
    return knot, end


def normal_blocks(qp: PathQP, rho_knot, rho_end, sigma):
    """Block-tridiagonal blocks of M = P + sigma I + A^T diag(rho) A.

    rho_knot: (N, 6) per-row rho in the z layout; rho_end: (2,).
    Returns (diag (N, 6, 6), off (N-1, 6, 6)) with off[i] = M[i+1, i].
    """
    N = qp.p_diag.shape[0]
    dt = qp.p_diag.dtype
    rho_t = rho_knot[:, :3]
    rho_k = rho_knot[:, 3]
    rho_c = rho_knot[:, 4:6]

    diag = jax.vmap(jnp.diag)(qp.p_diag + sigma)
    # Transition rows of block i: T_cur on knot i.
    diag = diag + jnp.einsum("ij,ni,ik->njk", T_CUR, rho_t, T_CUR)
    # Transition rows of block i+1: T_prev[i+1] on knot i.
    tp = qp.t_prev[1:]                                       # (N-1, 3, 6)
    diag = diag.at[:-1].add(
        jnp.einsum("nij,ni,nik->njk", tp, rho_t[1:], tp))
    # Kappa rows.
    ek = jnp.zeros((NB,), dt).at[2].set(1.0)
    diag = diag + jnp.einsum("n,j,k->njk", rho_k, ek, ek)
    # Collision rows.
    diag = diag + jnp.einsum("nij,ni,nik->njk", qp.coll_coef, rho_c,
                             qp.coll_coef)
    # End rows at end_idx.
    e0 = jnp.zeros((NB,), dt).at[0].set(1.0)
    e1 = jnp.zeros((NB,), dt).at[1].set(1.0)
    end_block = rho_end[0] * jnp.outer(e0, e0) + rho_end[1] * jnp.outer(e1, e1)
    diag = diag.at[qp.end_idx].add(end_block)

    # Off-diagonal: rows of block i+1 couple T_cur (knot i+1) with T_prev[i+1]
    # (knot i): O_i = T_cur^T rho_{i+1} T_prev[i+1].
    off = jnp.einsum("ij,ni,nik->njk", T_CUR, rho_t[1:], tp)
    return diag, off


def to_dense(qp: PathQP):
    """Materialize dense (P, q, A, l, u) with knot-major variable ordering —
    for oracle parity tests only."""
    N = qp.p_diag.shape[0]
    dt = qp.p_diag.dtype
    nv = N * NB
    nc = N * 6 + 2
    P = jnp.diag(qp.p_diag.reshape(-1))
    q = jnp.zeros((nv,), dt)
    Adense = jnp.zeros((nc, nv), dt)
    for i in range(N):
        r = i * 6
        Adense = Adense.at[r:r + 3, i * NB:(i + 1) * NB].set(T_CUR)
        if i >= 1:
            Adense = Adense.at[r:r + 3, (i - 1) * NB:i * NB].add(qp.t_prev[i])
        Adense = Adense.at[r + 3, i * NB + 2].set(1.0)
        Adense = Adense.at[r + 4:r + 6, i * NB:(i + 1) * NB].set(qp.coll_coef[i])
    ei = qp.end_idx
    Adense = Adense.at[N * 6, ei * NB + 0].set(1.0)
    Adense = Adense.at[N * 6 + 1, ei * NB + 1].set(1.0)
    lb_knot, ub_knot, lb_end, ub_end = bounds(qp)
    l = jnp.concatenate([lb_knot.reshape(-1), lb_end])
    u = jnp.concatenate([ub_knot.reshape(-1), ub_end])
    return P, q, Adense, l, u
