"""Fused Pallas TPU kernel for the structured path-QP ADMM round.

The batched structured solver (``solver.path_solver.solve_path_qp_batched``)
spends its time in the inner loop: per ADMM iteration, two sequential sweeps
of N knot steps (block-bidiagonal solve) plus the structured A/A^T products
and projection updates. Expressed in XLA that is ~2N While iterations per
ADMM step — pure loop-latency on TPU.

This kernel fuses one full round of ``check_every`` ADMM iterations into a
single Pallas program:

- layout is knot-major with the scenario batch riding the **lanes**
  (arrays are (N, 6, B): 6 sublanes x B lanes — every elementwise op and
  every 6x6 block matvec uses full vector width across the batch);
- the inverted Cholesky factors (Cinv, W), the transition blocks, bounds and
  rho arrays stay resident in VMEM across all iterations (no HBM roundtrips
  inside the round);
- the sequential knot sweeps are in-kernel ``fori_loop``s — hardware loops,
  no XLA While overhead;
- the per-scenario end-row constraint (dynamic knot index, base_solver.cpp:
  249-260) is applied through a precomputed one-hot selector so there is no
  per-lane dynamic indexing.

Residual evaluation and adaptive-rho refactorization stay outside in XLA
(once per round — cheap). The kernel is numerically identical to the XLA
round (same operations, same order) and is validated against it in tests.

Reference for the QP being iterated: src/solver/base_solver.cpp:56-117.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Max lanes per kernel invocation; the scenario batch is processed in chunks
# of this size (the lane dimension is padded to 128 by the hardware anyway,
# and one chunk's working set must fit VMEM: ~11.5 MB at N=128, BB=128).
_MAX_LANES = 128

NB = 6  # block size (variables per knot)

# The default Mosaic scoped-VMEM limit is 16 MiB; the fully VMEM-resident
# round kernel's working set at N=128, B=128 is ~16.4 MiB once the 6-sublane
# arrays are padded to 8 sublanes (observed OOM by 363 KiB on the gridmap
# batch). v5e has 128 MiB VMEM per core — grant the kernels real headroom.
_COMPILER_PARAMS = pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024)


def _sds(like):
    """ShapeDtypeStruct matching ``like``, carrying its varying-axes (vma)
    type: under a ``check_vma=True`` shard_map (dist.solve_sharded) every
    pallas_call output must declare how it varies over the mesh, or the
    sharded solve fails to trace on real TPU hardware."""
    vma = getattr(jax.typeof(like), "vma", None)
    if vma:
        return jax.ShapeDtypeStruct(like.shape, like.dtype, vma=vma)
    return jax.ShapeDtypeStruct(like.shape, like.dtype)


def _pad_lanes(a, b_padded: int):
    """Edge-replicate the lane (last) dim of ``a`` up to ``b_padded`` lanes.

    Replicating the last real lane (instead of zero-fill) keeps every padded
    lane on the same numerical path as a real problem — no sqrt(0) / division
    hazards inside the factor kernel. Padded lanes are sliced off on return.
    """
    b = a.shape[-1]
    if b == b_padded:
        return a
    reps = jnp.broadcast_to(a[..., -1:], a.shape[:-1] + (b_padded - b,))
    return jnp.concatenate([a, reps], axis=-1)


def _padded_lane_count(b: int, interpret: bool = False) -> int:
    """Lane count the kernels run at: the next multiple of _MAX_LANES.

    Always a FULL 128-lane chunk on hardware, even for small b: the physical
    tiles are 128 lanes wide regardless, and feeding the kernel a partial
    lane dim makes Mosaic materialize retiling copies that push the scoped
    VMEM allocation over the 16M limit (observed: N=128 at B=64 or B=1
    requests 16.67M and OOMs, while the identical B=128 chunk fits).
    Interpret mode (CPU tests) pads only up to the chunking requirement —
    there full-lane padding would be 128x real work instead of free lanes."""
    if interpret and b <= _MAX_LANES:
        return b
    return -(-b // _MAX_LANES) * _MAX_LANES


def _factor_kernel(diag_ref, offp_ref, ci_ref, w_ref, *, n: int):
    """Block-Cholesky factorization + explicit block inversion, fused.

    Per knot i (sequential, in-kernel):
        W_i    = Off_{i-1} Cinv_{i-1}^T          (zero for i = 0)
        S_i    = Diag_i - W_i W_i^T
        C_i    = chol(S_i)      (unrolled nb x nb Cholesky-Crout, lanes = batch)
        Cinv_i = C_i^{-1}       (unrolled forward substitution)

    diag/offp: (N, nb, nb, B) with offp[0] = 0. Outputs ci (Cinv) and w (W),
    both (N, nb, nb, B). Replaces an N-step XLA While of batched cholesky +
    triangular solves — the dominant fixed cost of a solve. Works for any
    static block size nb (6 for the path QP, 4/3 for the smoothing QPs).
    """
    NB = diag_ref.shape[1]

    def step(i, ci_prev):
        O = offp_ref[i]                                     # (nb, nb, B)
        D = diag_ref[i]
        # Everything below is unrolled over the static 6x6 block structure —
        # each entry is a (B,) lanes vector; no cross-dim broadcasts (Mosaic
        # rejects replicated-singleton relayouts on rank-4 temporaries).
        # W = O @ Cinv_prev^T : W[a][b] = sum_j O[a, j] Cp[b, j]
        W = [[None] * NB for _ in range(NB)]
        for a in range(NB):
            for bcol in range(NB):
                acc = O[a, 0] * ci_prev[bcol, 0]
                for j in range(1, NB):
                    acc = acc + O[a, j] * ci_prev[bcol, j]
                W[a][bcol] = acc
        # S = D - W W^T (symmetric; lower triangle only).
        S = [[None] * NB for _ in range(NB)]
        for a in range(NB):
            for bcol in range(a + 1):
                acc = W[a][0] * W[bcol][0]
                for j in range(1, NB):
                    acc = acc + W[a][j] * W[bcol][j]
                S[a][bcol] = D[a, bcol] - acc
        w_ref[i] = jnp.stack([jnp.stack(row, axis=0) for row in W], axis=0)

        # Unrolled 6x6 Cholesky (row lists of (B,) lanes vectors).
        C = [[None] * NB for _ in range(NB)]
        for j in range(NB):
            d = S[j][j]
            for kk in range(j):
                d = d - C[j][kk] * C[j][kk]
            cjj = jnp.sqrt(jnp.maximum(d, 1e-12))
            C[j][j] = cjj
            inv_cjj = 1.0 / cjj
            for a in range(j + 1, NB):
                e = S[a][j]
                for kk in range(j):
                    e = e - C[a][kk] * C[j][kk]
                C[a][j] = e * inv_cjj

        # Unrolled forward-substitution inverse of lower-triangular C.
        Ci = [[None] * NB for _ in range(NB)]
        zero = jnp.zeros_like(C[0][0])
        for j in range(NB):
            Ci[j][j] = 1.0 / C[j][j]
            for a in range(j + 1, NB):
                acc = zero
                for kk in range(j, a):
                    acc = acc + C[a][kk] * Ci[kk][j]
                Ci[a][j] = -acc / C[a][a]
            for a in range(j):
                Ci[a][j] = zero

        ci_val = jnp.stack([jnp.stack(row, axis=0) for row in Ci], axis=0)
        ci_ref[i] = ci_val
        return ci_val

    b = diag_ref.shape[-1]
    jax.lax.fori_loop(0, n, step,
                      jnp.zeros((NB, NB, b), diag_ref.dtype))


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_factor(diag, offp, interpret: bool = False):
    """Factor a batch of block-tridiagonal normal matrices in one fused
    kernel per lane-chunk. diag/offp: (N, 6, 6, B) lane-major, offp[0] = 0.
    Returns (Cinv, W) in the same layout."""
    n, _, _, B = diag.shape

    def run_chunk(dg, op):
        return pl.pallas_call(
            functools.partial(_factor_kernel, n=n),
            out_shape=(
                _sds(dg),
                _sds(dg),
            ),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=tuple([pl.BlockSpec(memory_space=pltpu.VMEM)] * 2),
            compiler_params=_COMPILER_PARAMS,
            interpret=interpret,
        )(dg, op)

    Bp = _padded_lane_count(B, interpret)
    if Bp == B and B <= _MAX_LANES:
        return run_chunk(diag, offp)
    diag, offp = _pad_lanes(diag, Bp), _pad_lanes(offp, Bp)
    outs = [run_chunk(diag[..., sl], offp[..., sl])
            for sl in (slice(c * _MAX_LANES, (c + 1) * _MAX_LANES)
                       for c in range(Bp // _MAX_LANES))]
    return (jnp.concatenate([o[0] for o in outs], axis=-1)[..., :B],
            jnp.concatenate([o[1] for o in outs], axis=-1)[..., :B])


def _round_kernel(geom_ref, Ci_ref, Wp_ref, tp_ref, lbk_ref, ubk_ref, lbe_ref,
                  ube_ref, rk_ref, re_ref, es_ref, pd_ref, v_ref, zk_ref,
                  ze_ref, yk_ref, ye_ref, vo_ref, zko_ref, zeo_ref, yko_ref,
                  yeo_ref, res_ref, sweep_ref, rhs_ref,
                  *, iters: int, alpha: float, sigma: float, n: int):
    lf = geom_ref[0, 0]     # front axle arm (collision-row coefficient)
    lr = geom_ref[0, 1]     # rear axle arm
    tp = tp_ref[:]          # (N, 3, 6, B) transition blocks (knot i-1 coupling)
    rk = rk_ref[:]          # (N, 6, B) per-row rho
    re = re_ref[:]          # (2, B)
    lbk = lbk_ref[:]
    ubk = ubk_ref[:]
    lbe = lbe_ref[:]
    ube = ube_ref[:]
    es = es_ref[:]          # (N, 1, B) one-hot end-knot selector

    def atmul(w, we):
        # A^T [w; we] for (w, we) in the z layout (structured at_mul).
        wt = w[:, 0:3]                                     # transition rows
        wcf = w[:, 4:5]                                    # (N, 1, B)
        wcr = w[:, 5:6]
        contrib = jnp.sum(tp * wt[:, :, None, :], axis=1)  # (N, 6, B)
        we0 = jnp.reshape(we[0:1], (1, 1, we.shape[-1]))
        we1 = jnp.reshape(we[1:2], (1, 1, we.shape[-1]))
        out0 = -wt[:, 0:1] + wcf + wcr + es * we0
        out1 = -wt[:, 1:2] + lf * wcf + lr * wcr + es * we1
        out2 = -wt[:, 2:3] + w[:, 3:4]
        out = jnp.concatenate(
            [out0, out1, out2, jnp.zeros_like(out0), wcf, wcr], axis=1)
        # out[i] += contrib[i+1] (shift-down add; .at[].add is a scatter,
        # which Mosaic does not lower — use concat instead).
        return out + jnp.concatenate(
            [contrib[1:], jnp.zeros_like(contrib[:1])], axis=0)

    def amul(vt):
        # A vt in the z layout (structured a_mul).
        vt_shift = jnp.concatenate([jnp.zeros_like(vt[:1]), vt[:-1]])
        ctr = jnp.sum(tp * vt_shift[:, None, :, :], axis=2)  # (N, 3, B)
        ztk = jnp.concatenate([
            -vt[:, 0:3] + ctr,
            vt[:, 2:3],
            vt[:, 0:1] + lf * vt[:, 1:2] + vt[:, 4:5],
            vt[:, 0:1] + lr * vt[:, 1:2] + vt[:, 5:6],
        ], axis=1)                                          # (N, 6, B)
        zte = jnp.sum(es * vt[:, 0:2], axis=0)              # (2, B)
        return ztk, zte

    def one_iter(_, state):
        v, zk, ze, yk, ye = state

        # ---- rhs = sigma v + A^T (rho z - y) ----
        rhs_ref[:] = sigma * v + atmul(rk * zk - yk, re * ze - ye)

        # ---- forward sweep: y_i = Cinv_i (rhs_i - W_i y_{i-1}) ----
        def fwd(i, y_prev):
            t = rhs_ref[i] - jnp.sum(Wp_ref[i] * y_prev[None], axis=1)
            y = jnp.sum(Ci_ref[i] * t[None], axis=1)
            sweep_ref[i] = y
            return y

        jax.lax.fori_loop(0, n, fwd, jnp.zeros_like(rhs_ref[0]))

        # ---- backward sweep: vt_i = Cinv_i^T (y_i - W_{i+1}^T vt_{i+1}) ----
        def bwd(j, vt_next):
            i = n - 1 - j
            nxt = jnp.minimum(i + 1, n - 1)
            gate = jnp.where(i < n - 1, 1.0, 0.0)
            t = sweep_ref[i] - gate * jnp.sum(
                Wp_ref[nxt] * vt_next[:, None], axis=0)
            vt = jnp.sum(Ci_ref[i] * t[:, None], axis=0)
            sweep_ref[i] = vt
            return vt

        jax.lax.fori_loop(0, n, bwd, jnp.zeros_like(rhs_ref[0]))
        vt = sweep_ref[:]                                   # (N, 6, B)

        ztk, zte = amul(vt)

        # ---- relaxed projection + dual update ----
        v_new = alpha * vt + (1 - alpha) * v
        ztmp_k = alpha * ztk + (1 - alpha) * zk + yk / rk
        ztmp_e = alpha * zte + (1 - alpha) * ze + ye / re
        zk_new = jnp.clip(ztmp_k, lbk, ubk)
        ze_new = jnp.clip(ztmp_e, lbe, ube)
        yk_new = rk * (ztmp_k - zk_new)
        ye_new = re * (ztmp_e - ze_new)
        return v_new, zk_new, ze_new, yk_new, ye_new

    init = (v_ref[:], zk_ref[:], ze_ref[:], yk_ref[:], ye_ref[:])
    v, zk, ze, yk, ye = jax.lax.fori_loop(0, iters, one_iter, init)
    vo_ref[:] = v
    zko_ref[:] = zk
    zeo_ref[:] = ze
    yko_ref[:] = yk
    yeo_ref[:] = ye

    # ---- OSQP unscaled residuals on the final iterate, per lane ----
    # Computed in-kernel so the caller's per-round XLA glue (a_mul/at_mul +
    # full-array reductions, measured ~2 ms/round at B=256 — more than the
    # 25 iterations themselves) disappears. Values for already-converged
    # lanes are discarded by the caller (its conv mask is sticky), so
    # iterating those lanes here is harmless — identical to the XLA round's
    # freeze-then-measure semantics.
    avk, ave = amul(v)
    aty = atmul(yk, ye)
    pv = pd_ref[:] * v
    mk = lambda a: jnp.max(jnp.abs(a), axis=(0, 1))         # (N, 6, B) -> (B,)
    me = lambda a: jnp.max(jnp.abs(a), axis=0)              # (2, B) -> (B,)
    res_ref[0] = jnp.maximum(mk(avk - zk), me(ave - ze))    # pri_res
    res_ref[1] = mk(pv + aty)                               # dua_res
    res_ref[2] = jnp.maximum(jnp.maximum(mk(avk), me(ave)),
                             jnp.maximum(mk(zk), me(ze)))   # |Ax| / |z| scale
    res_ref[3] = jnp.maximum(mk(pv), mk(aty))               # |Px| / |Aty| scale


def _structured_round_kernel(Ci_ref, Wp_ref, ac_ref, ap_ref, q_ref, lb_ref,
                             ub_ref, rho_ref, v_ref, z_ref, y_ref,
                             vo_ref, zo_ref, yo_ref, sweep_ref, rhs_ref,
                             *, iters: int, alpha: float, sigma: float,
                             n: int):
    """Generic block-banded ADMM round (see qp.structured.BlockBandedQP):
    row group i = a_cur[i] v_i + a_prev[i] v_{i-1}. Same fusion strategy as
    the specialized path-QP kernel; A blocks are data instead of hardcoded
    structure, so one kernel serves every nb/r instantiation."""
    ac = ac_ref[:]          # (N, r, nb, B)
    ap = ap_ref[:]
    qv = q_ref[:]           # (N, nb, B)
    lb = lb_ref[:]          # (N, r, B)
    ub = ub_ref[:]
    rho = rho_ref[:]

    def one_iter(_, state):
        v, z, y = state

        # rhs = sigma v - q + A^T (rho z - y)
        w = rho * z - y                                     # (N, r, B)
        atw = jnp.sum(ac * w[:, :, None, :], axis=1)        # (N, nb, B)
        apw = jnp.sum(ap * w[:, :, None, :], axis=1)
        atw = atw + jnp.concatenate(
            [apw[1:], jnp.zeros_like(apw[:1])], axis=0)
        rhs_ref[:] = sigma * v - qv + atw

        def fwd(i, y_prev):
            t = rhs_ref[i] - jnp.sum(Wp_ref[i] * y_prev[None], axis=1)
            yy = jnp.sum(Ci_ref[i] * t[None], axis=1)
            sweep_ref[i] = yy
            return yy

        jax.lax.fori_loop(0, n, fwd, jnp.zeros_like(rhs_ref[0]))

        def bwd(j, vt_next):
            i = n - 1 - j
            nxt = jnp.minimum(i + 1, n - 1)
            gate = jnp.where(i < n - 1, 1.0, 0.0)
            t = sweep_ref[i] - gate * jnp.sum(
                Wp_ref[nxt] * vt_next[:, None], axis=0)
            vt = jnp.sum(Ci_ref[i] * t[:, None], axis=0)
            sweep_ref[i] = vt
            return vt

        jax.lax.fori_loop(0, n, bwd, jnp.zeros_like(rhs_ref[0]))
        vt = sweep_ref[:]                                   # (N, nb, B)

        vt_prev = jnp.concatenate([jnp.zeros_like(vt[:1]), vt[:-1]])
        zt = (jnp.sum(ac * vt[:, None, :, :], axis=2)
              + jnp.sum(ap * vt_prev[:, None, :, :], axis=2))  # (N, r, B)

        v_new = alpha * vt + (1 - alpha) * v
        z_tmp = alpha * zt + (1 - alpha) * z + y / rho
        z_new = jnp.clip(z_tmp, lb, ub)
        y_new = rho * (z_tmp - z_new)
        return v_new, z_new, y_new

    v, z, y = jax.lax.fori_loop(
        0, iters, one_iter, (v_ref[:], z_ref[:], y_ref[:]))
    vo_ref[:] = v
    zo_ref[:] = z
    yo_ref[:] = y


@functools.partial(
    jax.jit, static_argnames=("iters", "alpha", "sigma", "interpret"))
def fused_structured_round(Ci, Wp, ac, ap, q, lb, ub, rho, v, z, y,
                           iters: int, alpha: float, sigma: float,
                           interpret: bool = False):
    """Generic-QP counterpart of :func:`fused_admm_round`. Lane-major shapes:
    Ci/Wp (N, nb, nb, B), ac/ap (N, r, nb, B), q/v (N, nb, B),
    lb/ub/rho/z/y (N, r, B). Returns (v, z, y)."""
    n, _, _, B = Ci.shape
    kern = functools.partial(_structured_round_kernel, iters=iters,
                             alpha=alpha, sigma=sigma, n=n)

    def run_chunk(args):
        Ci, Wp, ac, ap, q, lb, ub, rho, v, z, y = args
        return pl.pallas_call(
            kern,
            out_shape=(
                _sds(v),
                _sds(z),
                _sds(y),
            ),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 11,
            out_specs=tuple([pl.BlockSpec(memory_space=pltpu.VMEM)] * 3),
            scratch_shapes=[
                pltpu.VMEM(v.shape, v.dtype),   # sweep buffer
                pltpu.VMEM(v.shape, v.dtype),   # rhs buffer
            ],
            compiler_params=_COMPILER_PARAMS,
            interpret=interpret,
        )(Ci, Wp, ac, ap, q, lb, ub, rho, v, z, y)

    Bp = _padded_lane_count(B, interpret)
    if Bp == B and B <= _MAX_LANES:
        return run_chunk((Ci, Wp, ac, ap, q, lb, ub, rho, v, z, y))
    padded = tuple(_pad_lanes(a, Bp)
                   for a in (Ci, Wp, ac, ap, q, lb, ub, rho, v, z, y))
    outs = []
    for c in range(Bp // _MAX_LANES):
        sl = slice(c * _MAX_LANES, (c + 1) * _MAX_LANES)
        outs.append(run_chunk(tuple(a[..., sl] for a in padded)))
    return tuple(jnp.concatenate([o[i] for o in outs], axis=-1)[..., :B]
                 for i in range(3))


@functools.partial(
    jax.jit, static_argnames=("iters", "alpha", "sigma", "interpret"))
def fused_admm_round(geom, Ci, Wp, tp, lbk, ubk, lbe, ube, rk, re, es, pd,
                     v, zk, ze, yk, ye,
                     iters: int, alpha: float, sigma: float,
                     interpret: bool = False):
    """Run ``iters`` ADMM iterations fused in one Pallas call per lane-chunk.

    geom: (1, 2) [front_length, rear_length]. All other arrays are
    lane-major: Ci/Wp (N, 6, 6, B), tp (N, 3, 6, B), lbk/ubk/rk/pd (N, 6, B),
    lbe/ube/re/ze/ye (2, B), es (N, 1, B), v/zk/yk (N, 6, B).
    Returns updated (v, zk, ze, yk, ye, res) where res is (4, B): per-lane
    [pri_res, dua_res, max(|Av|,|z|), max(|Pv|,|A^T y|)] on the final
    iterate — everything the caller needs for OSQP termination + adaptive
    rho without touching the (N, 6, B) arrays in XLA.
    """
    n, _, _, B = Ci.shape
    kern = functools.partial(_round_kernel, iters=iters, alpha=alpha,
                             sigma=sigma, n=n)

    def run_chunk(args):
        (geom, Ci, Wp, tp, lbk, ubk, lbe, ube, rk, re, es, pd,
         v, zk, ze, yk, ye) = args
        vma = getattr(jax.typeof(v), "vma", None)
        res_sds = (jax.ShapeDtypeStruct((4, v.shape[-1]), v.dtype, vma=vma)
                   if vma else
                   jax.ShapeDtypeStruct((4, v.shape[-1]), v.dtype))
        return pl.pallas_call(
            kern,
            out_shape=(
                _sds(v),
                _sds(zk),
                _sds(ze),
                _sds(yk),
                _sds(ye),
                res_sds,
            ),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
            + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 16,
            out_specs=tuple([pl.BlockSpec(memory_space=pltpu.VMEM)] * 6),
            scratch_shapes=[
                pltpu.VMEM((n, 6, v.shape[-1]), v.dtype),   # sweep buffer
                pltpu.VMEM((n, 6, v.shape[-1]), v.dtype),   # rhs buffer
            ],
            compiler_params=_COMPILER_PARAMS,
            interpret=interpret,
        )(geom, Ci, Wp, tp, lbk, ubk, lbe, ube, rk, re, es, pd,
          v, zk, ze, yk, ye)

    Bp = _padded_lane_count(B, interpret)
    if Bp == B and B <= _MAX_LANES:
        return run_chunk((geom, Ci, Wp, tp, lbk, ubk, lbe, ube, rk, re, es,
                          pd, v, zk, ze, yk, ye))

    # Chunk the lane dimension into FULL _MAX_LANES chunks (see
    # _padded_lane_count); a partial batch is edge-replicated up (the padded
    # lanes iterate real numerics and are sliced off).
    padded = tuple(_pad_lanes(a, Bp)
                   for a in (Ci, Wp, tp, lbk, ubk, lbe, ube, rk, re, es, pd,
                             v, zk, ze, yk, ye))
    outs = []
    for c in range(Bp // _MAX_LANES):
        sl = slice(c * _MAX_LANES, (c + 1) * _MAX_LANES)
        outs.append(run_chunk((geom,) + tuple(a[..., sl] for a in padded)))
    return tuple(jnp.concatenate([o[i] for o in outs], axis=-1)[..., :B]
                 for i in range(6))
