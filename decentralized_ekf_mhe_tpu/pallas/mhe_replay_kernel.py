"""Pallas TPU mega-kernel: the ENTIRE MHE replay loop in one kernel.

The lanes fleet runner (ops/mhe_lanes.py scanned by estimator.run_mhe_lanes)
already keeps every tensor in instance-on-lanes layout, but the `lax.scan`
still round-trips the full window state (~3.5 MB/tile at N=20, s=9, B=1024)
through HBM on every one of the T ticks, and each tick is dozens of separate
XLA ops. This kernel fuses the complete per-tick pipeline —

    VO ingestion (Bezier carry + masked slot activation, DecentralEst.cpp:
    883-945/987-1009) → arrival-cost marginalization (MheSrb.cpp:475-713) →
    window shift + dynamics/measurement assembly (DecentralEst.cpp:353-585)
    → block-tridiagonal normal-equation solve

— into a single `pl.pallas_call` that loops over a chunk of ticks with the
window state RESIDENT IN VMEM (state enters/leaves HBM once per chunk via
input_output_aliases, not once per tick). The ring buffer is addressed by a
circular base index (base_t = t mod N) instead of rolling, so a shift is
just two slot writes. Semantics are identical to ops/mhe_lanes.step —
equivalence vs the scanned path is asserted in tests/test_megakernel.py:
exact (<1e-9) at float64; at float32 op-reordering roundoff compounds
through the recursive arrival-cost marginalization, so agreement with the
*scanned f32 path* is loose (~1e-2 relative after tens of ticks) while both
f32 paths stay equally close to the f64 oracle (velocity-RMSE delta ≪1e-3 —
the production accuracy gate, asserted in the same test file).

Layout: grid over B lane-tiles of 128; every window tensor is (N, ..., 128)
per tile; all small-matrix algebra is fully unrolled VPU arithmetic (see
pallas/tridiag_kernel.py); products with the CONSTANT measurement/VO
selector matrices (A_meas, P_cam — mostly zeros) skip zero terms at trace
time.

Two solver tails share the assembly/ingestion/marginalization body:

- unconstrained (default): streaming forward block-Thomas — only the newest
  state is consumed per tick, so the backward sweep is skipped.
- CONSTRAINED (``c.x_lb`` set): the assembled block-tridiagonal system runs
  the full OSQP-semantics box-ADMM (pallas/admm_core.py — ρ-epoch
  factorizations, α-relaxed projections, converged-freeze, adaptive ρ,
  active-set polish; MheSrb.cpp:272-349 / parameters_go1.yaml:37-50) per
  tick, with the warm-start iterates (z, y) ring-carried in VMEM exactly
  like the window tensors (OSQP setWarmStart(true), DecentralEst.cpp:204)
  and per-lane (s, B) bounds as kernel operands. This makes the constrained
  production pipeline tick-chunked and VMEM-resident — the reference's
  200 Hz cycle IS the inequality-capable solver (DecentralEst.cpp:172-177),
  so the constrained fleet rides the same mega-kernel as the
  unconstrained one.

Restrictions (same as the lanes path): shared VO schedule across the fleet
unless per_instance, single instance axis.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from decentralized_ekf_mhe_tpu.pallas.tridiag_kernel import (
    LANE_TILE,
    _chol,
    _gj_inv,
    _matmul,
    _matmul_tn,
    _matvec_t,
    _trsm_l,
    _trsv_l,
    _trsv_lt,
)


def _matvec(A, v):
    """w[i,b] = Σ_k A[i,k,b]·v[k,b], unrolled — general (non-square) form
    (the tridiag-kernel _matvec assumes square A)."""
    k_dim = A.shape[1]
    w = A[:, 0, :] * v[0, :][None, :]
    for k in range(1, k_dim):
        w = w + A[:, k, :] * v[k, :][None, :]
    return w


# ---------------------------------------------------------------- helpers
# All operands are lanes-layout (rows, cols, Bt) with Bt on the minor axis.


def _cmm_t(C: np.ndarray, A):
    """Cᵀ @ A with a constant C (k,i): (k,l,Bt) -> (i,l,Bt), zero-skipped."""
    k_dim, i_dim = C.shape
    rows = []
    for i in range(i_dim):
        acc = None
        for k in range(k_dim):
            coef = float(C[k, i])
            if coef == 0.0:
                continue
            term = A[k] if coef == 1.0 else coef * A[k]
            acc = term if acc is None else acc + term
        rows.append(acc if acc is not None else jnp.zeros_like(A[0]))
    return jnp.stack(rows, axis=0)


def _mmc(A, C: np.ndarray):
    """A @ C with a constant C (k,j): (i,k,Bt) -> (i,j,Bt), zero-skipped."""
    k_dim, j_dim = C.shape
    cols = []
    for j in range(j_dim):
        acc = None
        for k in range(k_dim):
            coef = float(C[k, j])
            if coef == 0.0:
                continue
            term = A[:, k] if coef == 1.0 else coef * A[:, k]
            acc = term if acc is None else acc + term
        cols.append(acc if acc is not None else jnp.zeros_like(A[:, 0]))
    return jnp.stack(cols, axis=1)


def _matmul_nt(A, B):
    """A @ Bᵀ: (i,k,Bt),(j,k,Bt) -> (i,j,Bt), unrolled."""
    k_dim = A.shape[1]
    C = A[:, 0, :][:, None, :] * B[:, 0, :][None, :, :]
    for k in range(1, k_dim):
        C = C + A[:, k, :][:, None, :] * B[:, k, :][None, :, :]
    return C


def _cdiag_mm_nt(R, Cd: np.ndarray):
    """R · diag-blocks-const · Rᵀ for (3,3,Bt) R and constant 3x3 Cd."""
    RC = _mmc(R, Cd)
    return _matmul_nt(RC, R)


def _skew_mul(v, A):
    """[v]× @ A for v (3,Bt), A (3,k,Bt) — cross each column, unrolled."""
    x, y, z = v[0], v[1], v[2]
    return jnp.stack(
        [-z * A[1] + y * A[2], z * A[0] - x * A[2], -y * A[0] + x * A[1]],
        axis=0,
    )


def _cross(a, b):
    return jnp.stack(
        [
            a[1] * b[2] - a[2] * b[1],
            a[2] * b[0] - a[0] * b[2],
            a[0] * b[1] - a[1] * b[0],
        ],
        axis=0,
    )


def _inv3(A):
    """Adjugate inverse of (3,3,Bt) (ops/lanes.inv3 semantics)."""
    a, b, c = A[0, 0], A[0, 1], A[0, 2]
    d, e, f = A[1, 0], A[1, 1], A[1, 2]
    g, h, i = A[2, 0], A[2, 1], A[2, 2]
    A11, A12, A13 = e * i - f * h, c * h - b * i, b * f - c * e
    A21, A22, A23 = f * g - d * i, a * i - c * g, c * d - a * f
    A31, A32, A33 = d * h - e * g, b * g - a * h, a * e - b * d
    det = a * A11 + b * A21 + c * A31
    adj = jnp.stack(
        [
            jnp.stack([A11, A12, A13], axis=0),
            jnp.stack([A21, A22, A23], axis=0),
            jnp.stack([A31, A32, A33], axis=0),
        ],
        axis=0,
    )
    return adj / det[None, None, :]



def _const_mat(C: np.ndarray, like):
    """Materialize a constant (r,c) matrix as (r,c,Bt) from scalar entries
    (Pallas kernels may not capture array constants)."""
    rows = []
    for r in range(C.shape[0]):
        rows.append(jnp.stack(
            [jnp.full_like(like, float(C[r, cc])) for cc in range(C.shape[1])],
            axis=0,
        ))
    return jnp.stack(rows, axis=0)


def _add_const_vec(v, c: np.ndarray):
    """v (n,Bt) + constant (n,) via scalar adds."""
    return jnp.stack(
        [v[i] + float(c[i]) for i in range(v.shape[0])], axis=0
    )


def _skew3(v):
    """[v]x as (3,3,Bt) from v (3,Bt)."""
    x, y, z = v[0], v[1], v[2]
    o = jnp.zeros_like(x)
    return jnp.stack(
        [
            jnp.stack([o, -z, y], axis=0),
            jnp.stack([z, o, -x], axis=0),
            jnp.stack([-y, x, o], axis=0),
        ],
        axis=0,
    )


def _blockcat(rows):
    """Assemble a block matrix from a nested list of (r,c,Bt) blocks."""
    return jnp.concatenate(
        [jnp.concatenate(r, axis=1) for r in rows], axis=0
    )


class KernelConsts(NamedTuple):
    """Trace-time (numpy) constants closed over by the kernel body."""

    N: int
    s: int
    m: int
    L: int
    lot: int              # leg_odom_type
    dt: float
    A_meas: np.ndarray    # (m,s)
    P_cam: np.ndarray     # (3,s)
    Q_vo_p: np.ndarray    # (3,3)
    C_p: np.ndarray
    C_accel: np.ndarray
    Q_accel_bias: np.ndarray
    C_enc_pos: np.ndarray
    C_enc_vel: np.ndarray
    C_gyro: np.ndarray
    Q_foot_slide: np.ndarray
    Q_foot_swing: np.ndarray
    gravity: np.ndarray   # (3,)


def consts_from_mhe(c) -> KernelConsts:
    """Extract the numpy constants the kernel needs from ops.mhe.MHEConsts."""
    nc = c.nc
    f = lambda a: np.asarray(a, np.float64)
    return KernelConsts(
        N=int(c.N), s=int(c.dim_state), m=int(c.dim_meas),
        L=int(c.num_legs), lot=int(c.leg_odom_type), dt=float(c.dt),
        A_meas=f(c.A_meas), P_cam=f(c.P_cam), Q_vo_p=f(c.Q_vo_p),
        C_p=f(nc.C_p), C_accel=f(nc.C_accel),
        Q_accel_bias=f(nc.Q_accel_bias), C_enc_pos=f(nc.C_enc_pos),
        C_enc_vel=f(nc.C_enc_vel), C_gyro=f(nc.C_gyro),
        Q_foot_slide=f(nc.Q_foot_slide), Q_foot_swing=f(nc.Q_foot_swing),
        gravity=f(nc.gravity),
    )


# ------------------------------------------------------------- kernel body


def _build_dynamics(kc: KernelConsts, R, accel_s, contact, dtype):
    """assembly_lanes.build_dynamics transcribed to in-kernel values."""
    dt, L, s = kc.dt, kc.L, kc.s
    Bt = R.shape[-1]
    i3 = _const_mat(np.eye(3), R[0, 0])
    z3 = jnp.zeros((3, 3, Bt), dtype)
    A_rows = [
        [i3, dt * i3, -(dt * dt / 2) * R],
        [z3, i3, -dt * R],
        [z3, z3, i3],
    ]
    b_parts = [-(dt * dt / 2) * accel_s, -dt * accel_s,
               jnp.zeros((3, Bt), dtype)]

    RCpRt = _cdiag_mm_nt(R, kc.C_p)
    RCaRt = _cdiag_mm_nt(R, kc.C_accel)
    C_pv = _blockcat([
        [dt * dt * RCpRt + 0.25 * dt**4 * RCaRt, 0.5 * dt**3 * RCaRt],
        [0.5 * dt**3 * RCaRt, dt * dt * RCaRt],
    ])
    Q_pv = _gj_inv(C_pv)
    Qab = _const_mat((1.0 / (dt * dt)) * kc.Q_accel_bias, R[0, 0])
    zsb = jnp.zeros((6, 3, Bt), dtype)
    Q_rows = [[Q_pv, zsb], [jnp.swapaxes(zsb, 0, 1), Qab]]

    if kc.lot == 1:
        zf3 = jnp.zeros((3, 3, Bt), dtype)
        foot_A, foot_Q = [], []
        for i in range(L):
            ci = contact[i][None, None, :]
            Qf = jnp.where(
                ci > 0,
                _const_mat(kc.Q_foot_slide, R[0, 0]),
                _const_mat(kc.Q_foot_swing, R[0, 0]),
            )
            Qfi = (1.0 / (dt * dt)) * _matmul_nt(_matmul(R, Qf), R)
            foot_A.append(i3)
            foot_Q.append(Qfi)
        # extend A/Q/b to block-diagonal s=9+3L
        nA = [r + [z3] * L for r in A_rows]
        for i in range(L):
            nA.append([z3] * 3 + [z3 if k != i else foot_A[i] for k in range(L)])
        A_rows = nA
        zq = jnp.zeros((9, 3 * L, Bt), dtype)
        Q_top = jnp.concatenate(
            [_blockcat(Q_rows), zq], axis=1
        )
        Q_bot_blocks = []
        for i in range(L):
            row = [jnp.zeros((3, 9, Bt), dtype)] + [
                foot_Q[i] if k == i else z3 for k in range(L)
            ]
            Q_bot_blocks.append(jnp.concatenate(row, axis=1))
        Q = jnp.concatenate([Q_top] + Q_bot_blocks, axis=0)
        b = jnp.concatenate(b_parts + [jnp.zeros((3 * L, Bt), dtype)], axis=0)
        A = _blockcat(A_rows)
        return A, b, Q

    A = _blockcat(A_rows)
    b = jnp.concatenate(b_parts, axis=0)
    Q = _blockcat(Q_rows)
    return A, b, Q


def _build_measurement(kc: KernelConsts, R, omega_b, p_foot, J_foot, dq,
                       contact, dtype):
    """assembly_lanes.build_measurement transcribed to in-kernel values."""
    L = kc.L
    Bt = R.shape[-1]
    y_blocks, Q_blocks = [], []
    if kc.lot == 0:
        for i in range(L):
            Ji, pi, dqi = J_foot[i], p_foot[i], dq[i]
            RJ = _matmul(R, Ji)
            bi = -_matvec(RJ, dqi) - _matvec(R, _cross(omega_b, pi))
            y_blocks.append(bi)
            wJ = _skew_mul(omega_b, Ji)
            # G Cblk Gᵀ = Ji Cev Jiᵀ + (ωxJi) Cep (ωxJi)ᵀ + [pi]x Cg [pi]xᵀ
            pskew = _skew3(pi)
            inner = (
                _matmul_nt(_mmc(Ji, kc.C_enc_vel), Ji)
                + _matmul_nt(_mmc(wJ, kc.C_enc_pos), wJ)
                + _matmul_nt(_mmc(pskew, kc.C_gyro), pskew)
            )
            C_stance = _matmul_nt(_matmul(R, inner), R)
            Q_stance = _inv3(C_stance)
            ci = contact[i][None, None, :]
            Qi = jnp.where(ci > 0, Q_stance,
                           _const_mat(kc.Q_foot_swing, R[0, 0]))
            Q_blocks.append(Qi)
    else:
        for i in range(L):
            Ji, pi = J_foot[i], p_foot[i]
            y_blocks.append(_matvec(R, pi))
            inner = _matmul_nt(_mmc(Ji, kc.C_enc_pos), Ji)
            Qi = _matmul_nt(_matmul(R, _inv3(inner)), R)
            Q_blocks.append(Qi)
    y = jnp.concatenate(y_blocks, axis=0)
    z3 = jnp.zeros((3, 3, Bt), dtype)
    Q_rows = []
    for i in range(L):
        Q_rows.append([Q_blocks[i] if k == i else z3 for k in range(L)])
    return y, _blockcat(Q_rows)


def _bezier_node(pts, u):
    """Cubic Bezier at scalar u over pts (4,3,Bt) (Bezier_simple.cpp:73-82)."""
    P0, P1, P2, P3 = pts[0], pts[1], pts[2], pts[3]
    return (
        u**3 * (-P0 + 3 * P1 - 3 * P2 + P3)
        + u**2 * (3 * P0 - 6 * P1 + 3 * P2)
        + u * (-3 * P0 + 3 * P1)
        + P0
    )


def _make_kernel(kc: KernelConsts, Tc: int, dtype, per_instance: bool = False,
                 admm_ks=None, ablate: str = "", mk_solve: str = "gj"):
    """``per_instance=True`` compiles the PER-INSTANCE-VO variant: the VO
    event metadata (active/tick_pre/tick_now) and the Bezier schedule
    (times/count) carry a lane axis, and the ingestion block runs fully
    masked every tick (the in-kernel twin of
    mhe_lanes._apply_vo_per_instance) instead of pl.when-gated — each lane
    follows its own camera clock (DecentralEst.cpp:883-945 per instance).

    ``admm_ks`` (an admm_core.ADMMCoreStatic) compiles the CONSTRAINED
    variant: per-lane bounds arrive as (s, Bt) operands, the warm-start
    iterates (z, y) ride two extra ring-carried state tensors, and each
    tick's window solve is the full in-VMEM box-ADMM instead of the
    streaming Thomas sweep.

    ``ablate`` (TIMING DIAGNOSTICS ONLY — output is wrong by construction)
    skips one stage so measured deltas attribute per-stage cycles
    (tools/roofline.py --ablate): 'ingest' (VO), 'marg' (arrival cost),
    'build' (dynamics/measurement congruences), 'solve' (the Thomas
    inverse chain; assembly kept live), 'assembly' (the whole j-loop)."""
    N, s, m, L = kc.N, kc.s, kc.m, kc.L
    H, P = kc.A_meas, kc.P_cam
    dt = kc.dt
    dtype = jnp.dtype(dtype)
    dt_c = dtype.type(dt)
    one = dtype.type(1.0)
    constrained = admm_ks is not None

    def kernel(*refs):
        # unpack by position (the constrained variant adds lb/ub operands
        # after the tensor inputs and a z/y ring pair to the state)
        (t0_ref, vo_active_ref, vo_tick_pre_ref, vo_tick_now_ref,
         bez_times_in, bez_count_in,
         R_ref, accel_ref, omega_ref, pfoot_ref, Jfoot_ref, dq_ref,
         contact_ref, vo_inc_ref) = refs[:14]
        k = 14
        if constrained:
            lb_ref, ub_ref = refs[k:k + 2]
            k += 2
        n_state = 20 if constrained else 18
        state_in = refs[k:k + n_state]
        k += n_state
        x_ref = refs[k]
        k += 1
        state_out = refs[k:k + n_state]
        k += n_state
        bez_times_o, bez_count_o = refs[k:k + 2]
        (y_meas_o, Q_meas_o, A_dyn_o, b_dyn_o, Q_dyn_o, b_cam_o, Q_cam_o,
         cam_act_o, M_p_o, n_p_o, bez_pts_o, p_accum_o, prev_R_o,
         prev_acc_o, prev_ct_o,
         # incremental assembly caches (MheSrb.cpp:351-447 updateQP, the
         # ring way): per-slot cam-free normal-equation pieces, updated
         # only for the two slots that change per tick —
         #   Dslot[p] = HᵀR_p H + A_pᵀQd_p A_p;  Ub[p] = −A_pᵀQd_p;
         #   routb[p] = HᵀR_p y_p + A_pᵀQd_p b_p
         Dslot_o, Ub_o, routb_o) = state_out[:18]
        if constrained:
            z_adm_o, y_adm_o = state_out[18:20]

        # copy the incoming state into the output refs once; the tick loop
        # then mutates the output refs in place (state lives in VMEM for the
        # whole chunk)
        state_pairs = list(zip(state_in, state_out))
        for src, dst in state_pairs:
            dst[...] = src[...]
        if per_instance:
            bez_times_o[...] = bez_times_in[...]
            bez_count_o[...] = bez_count_in[...]
        else:
            for k in range(4):
                bez_times_o[k] = bez_times_in[k]
            bez_count_o[0] = bez_count_in[0]


        def tick(i, _):
            t = t0_ref[0] + i          # absolute tick (>= 1)
            base_old = jax.lax.rem(t - 1, jnp.asarray(N, t.dtype))
            base_new = jax.lax.rem(t, jnp.asarray(N, t.dtype))

            if ablate == "ingest":
                pass
            elif per_instance:
                # ---- per-lane VO ingestion (_apply_vo_per_instance) ----
                # fully masked — every lane follows its own camera clock;
                # vo_inc is pre-zeroed on inactive lanes by the host
                act = vo_active_ref[i] != 0                # (Bt,)
                tick_pre = vo_tick_pre_ref[i]              # (Bt,) int32
                tick_now = vo_tick_now_ref[i]
                p_acc = p_accum_o[:, :] + vo_inc_ref[i]
                p_accum_o[:, :] = p_acc
                count = bez_count_o[0]                     # (Bt,) int32
                full = (count >= 4) & act
                fm = full[None, :]
                ps = [bez_pts_o[0], bez_pts_o[1], bez_pts_o[2], bez_pts_o[3]]
                ts = [bez_times_o[0], bez_times_o[1], bez_times_o[2],
                      bez_times_o[3]]
                ps = [jnp.where(fm, ps[1], ps[0]), jnp.where(fm, ps[2], ps[1]),
                      jnp.where(fm, ps[3], ps[2]), ps[3]]
                ts = [jnp.where(full, ts[1], ts[0]),
                      jnp.where(full, ts[2], ts[1]),
                      jnp.where(full, ts[3], ts[2]), ts[3]]
                w = jnp.minimum(count, 3)
                tv = tick_now.astype(dtype) * dt_c
                for k in range(4):
                    mk = act & (w == k)
                    ps[k] = jnp.where(mk[None, :], p_acc, ps[k])
                    ts[k] = jnp.where(mk, tv, ts[k])
                    bez_pts_o[k] = ps[k]
                    bez_times_o[k] = ts[k]
                count_new = jnp.where(act, count + 1, count)
                bez_count_o[0] = count_new

                window_start = t - jnp.minimum(N, t)       # scalar
                start = jnp.maximum(window_start, tick_pre)
                num = tick_now - start + 1
                do_interp = act & (tick_now > window_start) & (count_new >= 4)
                t_int = ts[3] - ts[0]
                t_int = jnp.where(t_int == 0, one, t_int)
                u0 = (start.astype(dtype) * dt_c - ts[0]) / t_int
                du = dt_c / t_int
                pts = jnp.stack(ps, axis=0)
                for l in range(N):                         # logical slot
                    pj = jax.lax.rem(base_old + l, jnp.asarray(N, t.dtype))
                    i_b = l + t - N - start                # (Bt,) node index
                    ok = (do_interp & (i_b >= 0) & (i_b <= num - 2)
                          & (l <= N - 2))
                    uf = i_b.astype(dtype)
                    lo = _bezier_node(pts, u0 + uf * du)
                    hi = _bezier_node(pts, u0 + (uf + one) * du)
                    b_cam_o[pj] = jnp.where(ok[None, :], -(hi - lo),
                                            b_cam_o[pj])
                    cam_act_o[pj] = jnp.where(
                        ok, jnp.ones_like(cam_act_o[pj]), cam_act_o[pj])
            else:
                # ---- VO ingestion (mhe_lanes._apply_vo) ----------------
                @pl.when(vo_active_ref[i] != 0)
                def _():
                    tick_pre = vo_tick_pre_ref[i]
                    tick_now = vo_tick_now_ref[i]
                    inc = vo_inc_ref[i]                       # (3,Bt)
                    p_acc = p_accum_o[:, :] + inc
                    p_accum_o[:, :] = p_acc
                    # add_way_point (Bezier_simple.cpp:12-27)
                    count = bez_count_o[0]
                    full = count >= 4

                    @pl.when(full)
                    def _():
                        bez_pts_o[0] = bez_pts_o[1]
                        bez_pts_o[1] = bez_pts_o[2]
                        bez_pts_o[2] = bez_pts_o[3]
                        bez_times_o[0] = bez_times_o[1]
                        bez_times_o[1] = bez_times_o[2]
                        bez_times_o[2] = bez_times_o[3]

                    w = jnp.minimum(count, 3)
                    bez_pts_o[w] = p_acc
                    bez_times_o[w] = tick_now.astype(dtype) * dt_c
                    bez_count_o[0] = count + 1

                    # interpolate_increments over the window (masked writes)
                    window_start = t - jnp.minimum(N, t)
                    start = jnp.maximum(window_start, tick_pre)
                    num = tick_now - start + 1
                    do_interp = jnp.logical_and(
                        tick_now > window_start, bez_count_o[0] >= 4
                    )
                    t_int = bez_times_o[3] - bez_times_o[0]
                    t_int = jnp.where(t_int == 0, one, t_int)
                    u0 = (start.astype(dtype) * dt_c - bez_times_o[0]) / t_int
                    du = dt_c / t_int
                    pts = bez_pts_o[:, :, :]
                    node_prev = _bezier_node(pts, u0)
                    for k in range(N):
                        node_k = _bezier_node(pts, u0 + (k + 1) * du)
                        slot = start + k - t + N
                        ok = (
                            do_interp
                            & (k <= num - 2)
                            & (slot >= 0)
                            & (slot <= N - 2)
                        )

                        @pl.when(ok)
                        def _(node_k=node_k, node_prev=node_prev, slot=slot):
                            pj = jax.lax.rem(base_old + slot,
                                             jnp.asarray(N, t.dtype))
                            b_cam_o[pj] = -(node_k - node_prev)
                            cam_act_o[pj] = jnp.ones_like(cam_act_o[pj])

                        node_prev = node_k

            # ---- marginalization (mhe_lanes._marginalize) --------------
            @pl.when((t >= N) & (ablate != "marg"))
            def _():
                p0 = base_old
                A = A_dyn_o[p0]
                b = b_dyn_o[p0]
                Qd = Q_dyn_o[p0]
                Rm = Q_meas_o[p0]
                yv = y_meas_o[p0]
                Qc = Q_cam_o[p0]
                c0 = b_cam_o[p0]
                act = cam_act_o[p0][None, None, :]
                act_v = cam_act_o[p0][None, :]

                AtQd = _matmul_tn(A, Qd)
                PtQc = _cmm_t(P, Qc)
                PtQcP = _mmc(PtQc, P)
                HtR = _cmm_t(H, Rm)
                M_p = M_p_o[:, :, :]
                n_p = n_p_o[:, :]

                S = M_p + _matmul(AtQd, A) + _mmc(HtR, H) + act * PtQcP
                C01 = -(AtQd + act * PtQcP)
                D1 = Qd + act * PtQcP
                l0 = (n_p - _matvec(AtQd, b) - _matvec(HtR, yv)
                      - act_v * _matvec(PtQc, c0))
                l1 = _matvec(Qd, b) + act_v * _matvec(PtQc, c0)
                Sinv = _gj_inv(S)
                M_p_o[:, :, :] = D1 - _matmul_tn(C01, _matmul(Sinv, C01))
                n_p_o[:, :] = l1 - _matvec_t(C01, _matvec(Sinv, l0))

            # ---- shift + assembly (mhe_lanes.step) ---------------------
            R_t = R_ref[i]
            accel_t = accel_ref[i]
            omega_t = omega_ref[i]
            pfoot_t = pfoot_ref[i]
            Jfoot_t = Jfoot_ref[i]
            dq_t = dq_ref[i]
            contact_t = contact_ref[i]

            if ablate == "build":
                Bt = R_t.shape[-1]
                A_d = jnp.zeros((s, s, Bt), dtype)
                b_d = jnp.zeros((s, Bt), dtype)
                Q_d = jnp.zeros((s, s, Bt), dtype)
                Q_cam_new = jnp.zeros((3, 3, Bt), dtype)
                y_T = jnp.zeros((m, Bt), dtype)
                Q_T = jnp.zeros((m, m, Bt), dtype)
            else:
                A_d, b_d, Q_d = _build_dynamics(
                    kc, prev_R_o[:, :, :], prev_acc_o[:, :], prev_ct_o[:, :],
                    dtype,
                )
                Q_cam_new = _matmul_nt(_mmc(prev_R_o[:, :, :], kc.Q_vo_p),
                                       prev_R_o[:, :, :])
                y_T, Q_T = _build_measurement(
                    kc, R_t, omega_t, pfoot_t, Jfoot_t, dq_t, contact_t, dtype
                )

            pN1 = base_old                     # physical slot of logical N-1
            pN2 = jax.lax.rem(base_old + N - 1, jnp.asarray(N, t.dtype))   # logical N-2 post-shift
            y_meas_o[pN1] = y_T
            Q_meas_o[pN1] = Q_T
            A_dyn_o[pN1] = jnp.zeros_like(A_d)
            b_dyn_o[pN1] = jnp.zeros_like(b_d)
            Q_dyn_o[pN1] = jnp.zeros_like(Q_d)
            b_cam_o[pN1] = jnp.zeros_like(b_cam_o[pN1])
            Q_cam_o[pN1] = jnp.zeros_like(Q_cam_new)
            cam_act_o[pN1] = jnp.zeros_like(cam_act_o[pN1])
            A_dyn_o[pN2] = A_d
            b_dyn_o[pN2] = b_d
            Q_dyn_o[pN2] = Q_d
            Q_cam_o[pN2] = Q_cam_new
            b_cam_o[pN2] = jnp.zeros_like(b_cam_o[pN2])
            cam_act_o[pN2] = jnp.zeros_like(cam_act_o[pN2])

            # incremental assembly-cache update: only these two slots'
            # cam-free pieces changed this tick (fresh measurement at pN1,
            # fresh dynamics at pN2 whose measurement terms were cached when
            # it was the pN1 of the previous tick)
            HtR_n = _cmm_t(H, Q_T)
            Dslot_o[pN1] = _mmc(HtR_n, H)
            Ub_o[pN1] = jnp.zeros_like(Ub_o[pN1])
            routb_o[pN1] = _matvec(HtR_n, y_T)
            AtQd_n = _matmul_tn(A_d, Q_d)
            Dslot_o[pN2] = Dslot_o[pN2] + _matmul(AtQd_n, A_d)
            Ub_o[pN2] = -AtQd_n
            routb_o[pN2] = routb_o[pN2] + _matvec(AtQd_n, b_d)

            prev_R_o[:, :, :] = R_t
            prev_acc_o[:, :] = _add_const_vec(_matvec(R_t, accel_t), kc.gravity)
            prev_ct_o[:, :] = contact_t

            if constrained:
                # warm-start iterate shift: the fresh slot (new logical N-1
                # = physical pN1) reuses the previous newest iterate (old
                # logical N-1 = physical pN2) — the ring twin of
                # mhe_lanes.step's z_adm/y_adm _shift_set
                z_adm_o[pN1] = z_adm_o[pN2]
                y_adm_o[pN1] = y_adm_o[pN2]

            # ---- normal equations assembly -----------------------------
            n_states = jnp.minimum(t + 1, N)
            first = N - n_states
            eye_s = _const_mat(np.eye(s), M_p_o[0, 0])

            if ablate == "assembly":
                x_ref[i] = n_p_o[:, :]
                return 0
            Sinv = None
            yv = None
            U_prev = None
            prev_QdPP = None
            prev_rin = None
            abl_acc = None
            Ds, Us, rs, z0s, y0s = [], [], [], [], []
            for j in range(N):
                pj = jax.lax.rem(base_new + j, jnp.asarray(N, t.dtype))
                valid = j >= first
                iv = valid & (j <= N - 2)
                # cam-free pieces come from the incremental caches (their
                # masking is implicit: pN1/dead slots hold zeroed data, so
                # the cached AᵀQd/Ub/routb terms vanish exactly where the
                # explicit iv masks used to apply); the CHEAP cam terms
                # (P_cam is a 3-row selector — a handful of picks) are
                # recomputed inline because VO events mutate them mid-window
                Qd_j = Q_dyn_o[pj]
                b_j = b_dyn_o[pj]
                Qc_j = Q_cam_o[pj]
                c0_j = b_cam_o[pj]
                act_j = jnp.where(iv, cam_act_o[pj], 0.0)[None, None, :]

                PtQc = act_j * _cmm_t(P, Qc_j)
                PtQcP = _mmc(PtQc, P)
                Qd_m = jnp.where(iv, Qd_j, jnp.zeros_like(Qd_j))
                Qd_b = _matvec(Qd_m, b_j)
                PtQc_c = _matvec(PtQc, c0_j)

                D_j = Dslot_o[pj] + PtQcP
                r_j = routb_o[pj] + PtQc_c
                if j > 0:
                    D_j = D_j + prev_QdPP
                    r_j = r_j - prev_rin
                is_first = j == first
                D_j = D_j + jnp.where(is_first, 1.0, 0.0) * M_p_o[:, :, :]
                r_j = r_j - jnp.where(is_first, 1.0, 0.0) * n_p_o[:, :]
                prev_QdPP = Qd_m + PtQcP
                prev_rin = Qd_b + PtQc_c

                D_j = jnp.where(valid, D_j, eye_s)
                r_j = jnp.where(valid, r_j, jnp.zeros_like(r_j))
                U_j = Ub_o[pj] - PtQcP
                U_j = jnp.where(iv & ((j + 1) >= first), U_j,
                                jnp.zeros_like(U_j))

                if constrained:
                    # collect the masked system + ring-gathered warm starts
                    # for the whole-window ADMM below
                    Ds.append(D_j)
                    rs.append(r_j)
                    if j < N - 1:
                        Us.append(U_j)
                    z0s.append(z_adm_o[pj])
                    y0s.append(y_adm_o[pj])
                    continue

                if ablate == "solve":
                    # keep the assembled system live so Mosaic cannot DCE
                    # the assembly work, but skip the inverse chain
                    term = D_j[:, 0, :] + r_j + U_j[:, 0, :]
                    abl_acc = term if abl_acc is None else abl_acc + term
                    continue

                # forward Thomas step — only the newest state x_{N-1} is
                # consumed per tick (run_mhe_lanes uses x_window[N-1]), so
                # the backward substitution sweep is skipped entirely.
                # mk_solve='chol': factor-and-substitute SPD chain
                # (W = L⁻¹U, S_j = D_j − WᵀW; ~1.3s³ mults/slot vs GJ's
                # ~4s³) — measured ~2% SLOWER on v5e (serial-dependency
                # bound, see replay()); 'gj' is the default.
                if mk_solve == "chol":
                    if j == 0:
                        Lc, rdc = _chol(D_j)
                        yv = r_j
                    else:
                        W = _trsm_l(Lc, rdc, U_prev)        # rows list
                        # S_j = D_j − WᵀW (symmetric — mirror the triangle)
                        wtw = [[None] * s for _ in range(s)]
                        for a_ in range(s):
                            for b_ in range(a_, s):
                                acc = W[0][a_] * W[0][b_]
                                for i_ in range(1, s):
                                    acc = acc + W[i_][a_] * W[i_][b_]
                                wtw[a_][b_] = acc
                                wtw[b_][a_] = acc
                        S_j = D_j - jnp.stack(
                            [jnp.stack(row, axis=0) for row in wtw], axis=0)
                        z_r = _trsv_l(Lc, rdc, yv)
                        wz = []
                        for a_ in range(s):
                            acc = W[0][a_] * z_r[0]
                            for i_ in range(1, s):
                                acc = acc + W[i_][a_] * z_r[i_]
                            wz.append(acc)
                        yv = r_j - jnp.stack(wz, axis=0)
                        Lc, rdc = _chol(S_j)
                else:
                    if j == 0:
                        Sinv = _gj_inv(D_j)
                        yv = r_j
                    else:
                        W = _matmul(Sinv, U_prev)
                        S_j = D_j - _matmul_tn(U_prev, W)
                        yv = r_j - _matvec_t(U_prev, _matvec(Sinv, yv))
                        Sinv = _gj_inv(S_j)
                U_prev = U_j

            if ablate == "solve":
                x_ref[i] = abl_acc
                return 0
            if constrained:
                # ---- whole-window box-ADMM (admm_core) -----------------
                from decentralized_ekf_mhe_tpu.pallas import admm_core

                x_w, z_w, y_w, _ = admm_core.admm_box_solve(
                    jnp.stack(Ds, axis=0), jnp.stack(Us, axis=0),
                    jnp.stack(rs, axis=0), jnp.stack(z0s, axis=0),
                    jnp.stack(y0s, axis=0), lb_ref[...], ub_ref[...],
                    admm_ks, dtype)
                for j in range(N):
                    pj = jax.lax.rem(base_new + j, jnp.asarray(N, t.dtype))
                    z_adm_o[pj] = z_w[j]
                    y_adm_o[pj] = y_w[j]
                x_ref[i] = x_w[N - 1]
            elif mk_solve == "chol":
                x_ref[i] = _trsv_lt(Lc, rdc, _trsv_l(Lc, rdc, yv))
            else:
                x_ref[i] = _matvec(Sinv, yv)  # logical N-1 = newest state
            return 0

        jax.lax.fori_loop(0, Tc, tick, 0)

    return kernel


# -------------------------------------------------------------- host side


def _state_to_arrays(st, c, constrained=False):
    """mhe_lanes.MHEStateL -> kernel state tuple (lanes layout, f32-ready),
    including the incremental assembly caches (computed here from whatever
    state is handed in, so resumed states work too)."""
    from decentralized_ekf_mhe_tpu.ops import lanes

    pts = jnp.moveaxis(st.bez.pts, 0, -1)        # (B,4,3) -> (4,3,B)
    p_accum = jnp.moveaxis(st.bez.p_accum, 0, -1)  # (B,3) -> (3,B)
    H = jnp.asarray(c.A_meas, st.y_meas.dtype)
    HtR = lanes.cmm_t(H, st.Q_meas)              # (N,s,m,B)
    AtQd = lanes.mm_tn(st.A_dyn, st.Q_dyn)       # (N,s,s,B)
    Dslot = lanes.mmc(HtR, H) + lanes.mm(AtQd, st.A_dyn)
    Ub = -AtQd
    routb = lanes.mv(HtR, st.y_meas) + lanes.mv(AtQd, st.b_dyn)
    base = (
        st.y_meas, st.Q_meas, st.A_dyn, st.b_dyn, st.Q_dyn, st.b_cam,
        st.Q_cam, st.cam_active.astype(st.y_meas.dtype), st.M_p, st.n_p,
        pts, p_accum, st.prev_R, st.prev_accel_s, st.prev_contact,
        Dslot, Ub, routb,
    )
    if constrained:
        return base + (st.z_adm, st.y_adm)
    return base


def _replay_chunk(kc: KernelConsts, Tc: int, t0, vo_meta, bez_scalars,
                  tensors, state, interpret=False, per_instance=False,
                  admm_ks=None, bounds=None, ablate="", mk_solve="chol"):
    """One pallas_call over a chunk of Tc ticks. Returns (x, state').

    With ``per_instance`` the vo metadata and Bezier schedule carry the lane
    axis: vo_meta entries are (Tc,B), bez_scalars are ((4,B), (1,B)).
    With ``admm_ks``/``bounds`` ((lb, ub) per-lane (s,B)) the constrained
    kernel runs and ``state`` carries the (z, y) warm-start rings."""
    N, s, m, L = kc.N, kc.s, kc.m, kc.L
    dtype = state[0].dtype
    B = state[0].shape[-1]
    assert B % LANE_TILE == 0, B
    grid = (B // LANE_TILE,)
    constrained = admm_ks is not None

    def vspec(shape):
        nd = len(shape)
        return pl.BlockSpec(
            shape + (LANE_TILE,),
            lambda i, nd=nd: (0,) * nd + (i,),
            memory_space=pltpu.VMEM,
        )

    def sspec():
        return pl.BlockSpec(memory_space=pltpu.SMEM)

    vo_active, vo_tick_pre, vo_tick_now = vo_meta
    bez_times, bez_count = bez_scalars
    (R_c, accel_c, omega_c, pfoot_c, dq_c, Jfoot_c, contact_c, vo_inc_c) = tensors

    state_shapes = [
        (N, m), (N, m, m), (N, s, s), (N, s), (N, s, s), (N, 3),
        (N, 3, 3), (N,), (s, s), (s,), (4, 3), (3,), (3, 3), (3,), (L,),
        (N, s, s), (N, s, s), (N, s),          # Dslot, Ub, routb caches
    ]
    if constrained:
        state_shapes += [(N, s), (N, s)]
    n_state = len(state_shapes)
    vo_spec = vspec((Tc,)) if per_instance else sspec()
    bez_t_spec = vspec((4,)) if per_instance else sspec()
    bez_c_spec = vspec((1,)) if per_instance else sspec()
    bound_specs = [vspec((s,)), vspec((s,))] if constrained else []
    in_specs = (
        [sspec()] + [vo_spec] * 3             # t0, vo meta
        + [bez_t_spec, bez_c_spec]            # bez times/count
        + [vspec((Tc, 3, 3)), vspec((Tc, 3)), vspec((Tc, 3)),
           vspec((Tc, L, 3)), vspec((Tc, L, 3, 3)), vspec((Tc, L, 3)),
           vspec((Tc, L)), vspec((Tc, 3))]
        + bound_specs
        + [vspec(sh) for sh in state_shapes]
    )
    out_specs = (
        [vspec((Tc, s))]
        + [vspec(sh) for sh in state_shapes]
        + [bez_t_spec, bez_c_spec]
    )
    if per_instance:
        bez_out_shape = [jax.ShapeDtypeStruct((4, B), dtype),
                         jax.ShapeDtypeStruct((1, B), jnp.int32)]
    else:
        bez_out_shape = [jax.ShapeDtypeStruct((4,), dtype),
                         jax.ShapeDtypeStruct((1,), jnp.int32)]
    out_shape = (
        [jax.ShapeDtypeStruct((Tc, s, B), dtype)]
        + [jax.ShapeDtypeStruct(sh + (B,), dtype) for sh in state_shapes]
        + bez_out_shape
    )

    kernel = _make_kernel(kc, Tc, dtype, per_instance=per_instance,
                          admm_ks=admm_ks, ablate=ablate, mk_solve=mk_solve)
    # alias the window-state inputs onto the matching state outputs
    # (positions 1..n_state): the state enters/leaves HBM once per chunk
    # with no extra copy; the scalar SMEM carries are copied (tiny)
    n_before_state = 14 + (2 if constrained else 0)
    aliases = {n_before_state + i: 1 + i for i in range(n_state)}
    bound_args = list(bounds) if constrained else []
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        input_output_aliases=aliases,
        # the fully unrolled tick body keeps ~29 MB of live temporaries per
        # lane tile; raise Mosaic's scoped-vmem ceiling (v5e has 128 MB)
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(
        jnp.asarray([t0], jnp.int32),
        vo_active.astype(jnp.int32), vo_tick_pre.astype(jnp.int32),
        vo_tick_now.astype(jnp.int32),
        bez_times, bez_count,
        R_c, accel_c, omega_c, pfoot_c, Jfoot_c, dq_c, contact_c, vo_inc_c,
        *bound_args,
        *state,
    )
    x = outs[0]
    new_state = tuple(outs[1:1 + n_state])
    new_scalars = (outs[1 + n_state], outs[2 + n_state])
    return x, new_state, new_scalars


def replay(c, data_l, vo, dtype=jnp.float32, chunk=64, interpret=False,
           ablate="", mk_solve=None):
    """Full-log fleet MHE replay through the mega-kernel.

    Args:
      c: ops.mhe.MHEConsts.
      data_l: estimator.TickData in LANES layout (T, ..., B).
      vo: estimator.VOData — the shared fleet schedule (active (T,), dp_body
        (T,3) or per-lane (T,3,B) content), or a fully PER-INSTANCE schedule
        (active (T,B), dp_body (T,3,B), ticks (T,B)) — detected by active's
        rank, compiling the per-instance kernel variant.
    Returns x_seq (T, s, B) — newest-state estimate per tick (tick 0 is the
    init-window solve, as in estimator.run_mhe_lanes).

    Constrained consts (``c.x_lb`` set — (s,) shared or (s,B) per-lane box)
    run the CONSTRAINED kernel variant: each tick's window solve is the
    in-VMEM OSQP-semantics box-ADMM with ring-carried warm starts
    (pallas/admm_core.py; equivalence vs the scanned constrained lanes path
    in tests/test_megakernel.py).
    """
    from decentralized_ekf_mhe_tpu.ops import lanes, mhe_lanes

    import os as _os

    if mk_solve is None:
        # 'gj' (default): explicit Gauss-Jordan Schur chain. The 'chol'
        # factor-and-substitute variant has ~3x fewer multiplies but
        # MEASURED ~2% SLOWER on v5e (209.2 vs 204.7 ms at T=2000/B=1024,
        # 2026-08-21) — like the rejected reciprocal-multiply pivot
        # (commit 47d0a3d), the solve chain is bound by its serial
        # dependency depth, not multiply throughput; GJ's per-pivot row
        # eliminations expose more parallel VPU work per step than
        # triangular-solve row recurrences. Kept selectable for re-testing
        # on future hardware.
        mk_solve = _os.environ.get("DEM_MK_SOLVE", "gj")
    kc = consts_from_mhe(c)
    N, s = kc.N, kc.s
    T_total = data_l.accel_b.shape[0]
    B = data_l.accel_b.shape[-1]
    per_instance = vo.active.ndim == 2
    constrained = c.x_lb is not None
    pad = (-B) % LANE_TILE
    if pad:
        # pad the fleet to a whole lane tile by repeating the last instance
        # (keeps every padded matrix well-conditioned), then slice back
        def pad_lane(a):
            return jnp.concatenate(
                [a, jnp.repeat(a[..., -1:], pad, axis=-1)], axis=-1)

        data_p = jax.tree.map(pad_lane, data_l)
        vo_p = vo
        if per_instance:
            vo_p = jax.tree.map(pad_lane, vo)
        elif vo.dp_body.ndim == 3:
            vo_p = vo._replace(dp_body=pad_lane(vo.dp_body))
        c_p = c
        if constrained and getattr(c.x_lb, "ndim", 1) == 2:
            # per-lane bounds ride the same last-instance-repeat padding
            c_p = c._replace(x_lb=pad_lane(c.x_lb), x_ub=pad_lane(c.x_ub))
        return replay(c_p, data_p, vo_p, dtype=dtype, chunk=chunk,
                      interpret=interpret, ablate=ablate,
                      mk_solve=mk_solve)[..., :B]

    admm_ks = None
    bounds = None
    if constrained:
        from decentralized_ekf_mhe_tpu.pallas import admm_kernel as ak
        from decentralized_ekf_mhe_tpu.pallas.admm_core import ADMMCoreStatic

        admm_ks = ADMMCoreStatic.from_settings(c.admm, N=N, s=s)
        bounds = ak.broadcast_bounds(c.x_lb, c.x_ub, s, B, jnp.dtype(dtype))

    d0 = jax.tree.map(lambda a: a[0], data_l)
    st0 = mhe_lanes.init(c, d0.R_sb, d0.accel_b, d0.omega_b, d0.p_foot,
                         d0.J_foot, d0.dq, d0.contact, dtype=dtype,
                         per_instance_vo=per_instance)
    x0 = mhe_lanes.solve_window(c, st0)[N - 1]            # (s,B)

    # precompute VO world-frame increments: R_seq[tick_pre] @ dp  (T,3,B);
    # dp_body may be shared (T,3) or per-lane (T,3,B) — the Bezier carry and
    # b_cam writes are per-lane in VMEM either way, so per-instance vision
    # CONTENT costs nothing extra in-kernel. Per-instance TIMING gathers
    # R_pre per lane and masks per lane.
    dp = vo.dp_body.astype(dtype)
    if per_instance:
        R_pre = jnp.take_along_axis(
            data_l.R_sb, vo.tick_pre[:, None, None, :], axis=0)  # (T,3,3,B)
        act_l = vo.active.astype(dtype)[:, None, :]              # (T,1,B)
    else:
        R_pre = jnp.take(data_l.R_sb, vo.tick_pre, axis=0)       # (T,3,3,B)
        act_l = vo.active.astype(dtype)[:, None, None]
    dp_l = jnp.broadcast_to(
        dp[:, :, None] if dp.ndim == 2 else dp, (T_total, 3, B))
    vo_inc = lanes.mv(R_pre, dp_l) * act_l

    state = _state_to_arrays(st0, c, constrained=constrained)
    if per_instance:
        # per-instance Bezier schedule: times (B,4) -> (4,B), count (B,)->(1,B)
        bez_scalars = (jnp.moveaxis(st0.bez.times, 0, -1).astype(dtype),
                       st0.bez.count[None].astype(jnp.int32))
    else:
        bez_scalars = (st0.bez.times.astype(dtype),
                       jnp.reshape(st0.bez.count, (1,)).astype(jnp.int32))

    def slice_inputs(sl):
        tensors = (
            data_l.R_sb[sl], data_l.accel_b[sl], data_l.omega_b[sl],
            data_l.p_foot[sl], data_l.dq[sl], data_l.J_foot[sl],
            data_l.contact[sl], vo_inc[sl],
        )
        vo_meta = (vo.active[sl], vo.tick_pre[sl], vo.tick_now[sl])
        return tensors, vo_meta

    xs = [x0[None]]
    t = 1
    # whole chunks ride ONE lax.scan over a (n_full, chunk, ...) reshape —
    # a single pallas_call in the graph regardless of log length (an
    # unrolled host loop of T/chunk calls made T=20k soak logs uncompilable)
    n_full = (T_total - 1) // chunk
    if n_full > 1:
        sl = slice(1, 1 + n_full * chunk)
        tensors, vo_meta = slice_inputs(sl)

        def chunked(a):
            return a.reshape((n_full, chunk) + a.shape[1:])

        tensors_c = jax.tree.map(chunked, tensors)
        vo_meta_c = jax.tree.map(chunked, vo_meta)
        t0s = 1 + chunk * jnp.arange(n_full, dtype=jnp.int32)

        def chunk_step(carry, inp):
            state, bez_scalars = carry
            t0, vm, tn = inp
            x, state, bez_scalars = _replay_chunk(
                kc, chunk, t0, vm, bez_scalars, tn, state,
                interpret=interpret, per_instance=per_instance,
                admm_ks=admm_ks, bounds=bounds, ablate=ablate,
                mk_solve=mk_solve,
            )
            return (state, bez_scalars), x

        (state, bez_scalars), x_scan = jax.lax.scan(
            chunk_step, (state, bez_scalars), (t0s, vo_meta_c, tensors_c))
        xs.append(x_scan.reshape((n_full * chunk,) + x_scan.shape[2:]))
        t = 1 + n_full * chunk
    while t < T_total:
        Tc = min(chunk, T_total - t)
        tensors, vo_meta = slice_inputs(slice(t, t + Tc))
        x, state, bez_scalars = _replay_chunk(
            kc, Tc, t, vo_meta, bez_scalars, tensors, state,
            interpret=interpret, per_instance=per_instance,
            admm_ks=admm_ks, bounds=bounds, ablate=ablate,
            mk_solve=mk_solve,
        )
        xs.append(x)
        t += Tc
    return jnp.concatenate(xs, axis=0)
