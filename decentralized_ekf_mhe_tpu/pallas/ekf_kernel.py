"""Pallas TPU kernel: the whole orientation-EKF stage in VMEM.

The staged fleet pipeline (estimator.run_pipeline_lanes) scans
ekf_lanes.substep_block over MHE ticks; at B=1024 that lax.scan round-trips
the EKF state — including the (R,4,4,B) covariance history ring for the
delayed-VO replay (orien_ekf.cpp:156-212) — through HBM every tick and pays
XLA op/fusion overhead per substep, which made the EKF stage the pipeline's
binding cost (~20% of the cycle) once the MHE stage moved into the
mega-kernel. This kernel fuses the complete stage — history push, delayed-VO
rewind/replay, gyro predict, (‖a‖/g)²-scaled accel correct
(orien_ekf.cpp:77-212) — over a chunk of ticks with the state and rings
RESIDENT IN VMEM (entering/leaving HBM once per chunk via
input_output_aliases).

Semantics are identical to ekf_lanes.substep_block scanned over the chunk
(equivalence at float64 in interpret mode: tests/test_ekf_kernel.py).
Scope: the fleet's SHARED camera clock (valid/vo_active/steps_back shared
per substep — the benched production configuration; per-lane vision CONTENT
via a (T,S,4,B) measured-quaternion operand is supported). Fleets with
per-lane VO timing use the scanned path (estimator.scan_ekf_blocks).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from decentralized_ekf_mhe_tpu.ops.ekf import GRAVITY
from decentralized_ekf_mhe_tpu.pallas.tridiag_kernel import LANE_TILE


# ---------------------------------------------------- general lanes algebra
# (i,k,Bt) operands with Bt minor; fully unrolled VPU arithmetic. The
# tridiag-kernel helpers assume square matrices; these are general.


def _mm(A, B):
    k_dim = A.shape[1]
    C = A[:, 0, :][:, None, :] * B[0, :, :][None, :, :]
    for k in range(1, k_dim):
        C = C + A[:, k, :][:, None, :] * B[k, :, :][None, :, :]
    return C


def _mm_nt(A, B):
    """A @ Bᵀ: (i,k,Bt),(j,k,Bt) -> (i,j,Bt)."""
    k_dim = A.shape[1]
    C = A[:, 0, :][:, None, :] * B[:, 0, :][None, :, :]
    for k in range(1, k_dim):
        C = C + A[:, k, :][:, None, :] * B[:, k, :][None, :, :]
    return C


def _mv(A, v):
    k_dim = A.shape[1]
    w = A[:, 0, :] * v[0, :][None, :]
    for k in range(1, k_dim):
        w = w + A[:, k, :] * v[k, :][None, :]
    return w


def _mv_t(A, v):
    """Aᵀ v: (k,i,Bt),(k,Bt) -> (i,Bt)."""
    k_dim = A.shape[0]
    w = A[0, :, :] * v[0, :][None, :]
    for k in range(1, k_dim):
        w = w + A[k, :, :] * v[k, :][None, :]
    return w


def _mmc_nt(A, C: np.ndarray):
    """A @ diag-ish-constᵀ... general A (i,k,Bt) @ const Cᵀ with C (j,k):
    -> (i,j,Bt), zero terms skipped at trace time."""
    j_dim, k_dim = C.shape
    cols = []
    for j in range(j_dim):
        acc = None
        for k in range(k_dim):
            coef = float(C[j, k])
            if coef == 0.0:
                continue
            term = A[:, k] if coef == 1.0 else coef * A[:, k]
            acc = term if acc is None else acc + term
        cols.append(acc if acc is not None else jnp.zeros_like(A[:, 0]))
    return jnp.stack(cols, axis=1)


def _add_const_mat(A, C: np.ndarray, scale=None):
    """A (r,c,Bt) + const C (r,c) [optionally * scale (Bt,)]."""
    rows = []
    for i in range(C.shape[0]):
        cols = []
        for j in range(C.shape[1]):
            coef = float(C[i, j])
            if coef == 0.0:
                cols.append(A[i, j])
            elif scale is None:
                cols.append(A[i, j] + coef)
            else:
                cols.append(A[i, j] + coef * scale)
        rows.append(jnp.stack(cols, axis=0))
    return jnp.stack(rows, axis=0)


def _inv3(A):
    """Adjugate inverse of (3,3,Bt)."""
    a, b, c = A[0, 0], A[0, 1], A[0, 2]
    d, e, f = A[1, 0], A[1, 1], A[1, 2]
    g, h, i = A[2, 0], A[2, 1], A[2, 2]
    A11, A12, A13 = e * i - f * h, c * h - b * i, b * f - c * e
    A21, A22, A23 = f * g - d * i, a * i - c * g, c * d - a * f
    A31, A32, A33 = d * h - e * g, b * g - a * h, a * e - b * d
    det = a * A11 + b * A21 + c * A31
    adj = jnp.stack(
        [jnp.stack([A11, A12, A13], axis=0),
         jnp.stack([A21, A22, A23], axis=0),
         jnp.stack([A31, A32, A33], axis=0)], axis=0)
    return adj / det[None, None, :]


def _gj_inv4(A):
    """Pivot-free Gauss-Jordan inverse of (4,4,Bt) (SPD input)."""
    s, Bt = A.shape[0], A.shape[-1]
    eye = jnp.broadcast_to(jnp.eye(s, dtype=A.dtype)[:, :, None], (s, s, Bt))
    aug = jnp.concatenate([A, eye], axis=1)
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (s, 1, 1), 0)
    for i in range(s):
        piv = aug[i, i, :][None, :]
        row = aug[i, :, :] / piv
        col = aug[:, i, :][:, None, :]
        aug = jnp.where(row_ids == i, row[None, :, :],
                        aug - col * row[None, :, :])
    return aug[:, s:, :]


# ------------------------------------------------------- EKF stage algebra
# Transcriptions of ops/ekf_lanes.py to in-kernel values (same anchors).


def _normalize(q):
    return q / jnp.sqrt(jnp.sum(q * q, axis=0, keepdims=True))


def _omega_F(gyro, dt, dtype):
    """F = I + dt/2·Ω(ω) as (4,4,Bt) (gyro_2_Ohm, orien_ekf.cpp:214-228)."""
    h = dtype.type(dt / 2)
    wx, wy, wz = h * gyro[0], h * gyro[1], h * gyro[2]
    one = jnp.ones_like(wx)
    return jnp.stack(
        [jnp.stack([one, -wx, -wy, -wz], axis=0),
         jnp.stack([wx, one, wz, -wy], axis=0),
         jnp.stack([wy, -wz, one, wx], axis=0),
         jnp.stack([wz, wy, -wx, one], axis=0)], axis=0)


def _quat_W(q, dt, quirk, dtype):
    """(4,3,Bt) process-noise Jacobian (quat_2_W, orien_ekf.cpp:270-294)."""
    w, x, y, z = q[0], q[1], q[2], q[3]
    zero = jnp.zeros_like(w)
    if quirk:
        rows = [
            jnp.stack([-x, -y, -z], axis=0),
            jnp.stack([w, -z, y], axis=0),
            jnp.stack([z, x, w], axis=0),
            jnp.stack([-y, zero, zero], axis=0),
        ]
    else:
        rows = [
            jnp.stack([-x, -y, -z], axis=0),
            jnp.stack([w, -z, y], axis=0),
            jnp.stack([z, w, -x], axis=0),
            jnp.stack([-y, x, w], axis=0),
        ]
    return dtype.type(0.5 * dt) * jnp.stack(rows, axis=0)


def _to_rot(q):
    qn = _normalize(q)
    w, x, y, z = qn[0], qn[1], qn[2], qn[3]
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    one = jnp.ones_like(w)
    two = qn.dtype.type(2.0)
    return jnp.stack(
        [jnp.stack([one - two * (yy + zz), two * (xy - wz), two * (xz + wy)],
                   axis=0),
         jnp.stack([two * (xy + wz), one - two * (xx + zz), two * (yz - wx)],
                   axis=0),
         jnp.stack([two * (xz - wy), two * (yz + wx), one - two * (xx + yy)],
                   axis=0)], axis=0)


def _quat_H(q, gravity, dtype):
    """(3,4,Bt) Jacobian of R(q)ᵀg (quat_2_H, orien_ekf.cpp:307-329)."""
    w, x, y, z = q[0], q[1], q[2], q[3]
    gx, gy, gz = (float(gravity[0]), float(gravity[1]), float(gravity[2]))
    two = dtype.type(2.0)
    return two * jnp.stack(
        [jnp.stack([gx * w + gy * z - gz * y,
                    gx * x + gy * y + gz * z,
                    -gx * y + gy * x - gz * w,
                    -gx * z + gy * w + gz * x], axis=0),
         jnp.stack([-gx * z + gy * w + gz * x,
                    gx * y - gy * x + gz * w,
                    gx * x + gy * y + gz * z,
                    -gx * w - gy * z + gz * y], axis=0),
         jnp.stack([gx * y - gy * x + gz * w,
                    gx * z - gy * w - gz * x,
                    gx * w + gy * z - gz * y,
                    gx * x + gy * y + gz * z], axis=0)], axis=0)


def _make_kernel(ec, R: int, Tc: int, S: int, dtype, per_lane_vo_q: bool):
    """ec: ops/ekf_lanes.EKFConstsL (numpy constants)."""
    dtype = jnp.dtype(dtype)
    dt = float(ec.dt)
    C_gyro = np.asarray(ec.C_gyro, np.float64)
    C_accel = np.asarray(ec.C_accel, np.float64)
    C_vo = np.asarray(ec.C_vo, np.float64)
    grav = np.asarray(ec.gravity, np.float64)
    quirk = bool(ec.quirk_W)
    inv_g2 = 1.0 / (GRAVITY * GRAVITY)

    def predict(q, P, gyro):
        F = _omega_F(gyro, dt, dtype)
        W = _quat_W(q, dt, quirk, dtype)
        q_pred = _normalize(_mv(F, q))
        # P⁺ = FPFᵀ + W C_gyro Wᵀ (orien_ekf.cpp:120-122)
        P_pred = _mm_nt(_mm(F, P), F) + _mm_nt(_mmc_nt(W, C_gyro.T), W)
        return q_pred, P_pred

    def accel_correct(q, P, accel):
        Rm = _to_rot(q)
        # accel_hat = Rᵀ g; with g = (0,0,G) this is G · (bottom row of R)
        g2 = dtype.type(float(grav[2]))
        accel_hat = g2 * jnp.stack([Rm[2, 0], Rm[2, 1], Rm[2, 2]], axis=0)
        Hm = _quat_H(q, grav, dtype)
        rel2 = (accel[0] * accel[0] + accel[1] * accel[1]
                + accel[2] * accel[2]) * dtype.type(inv_g2)
        S_m = _add_const_mat(_mm_nt(_mm(Hm, P), Hm), C_accel, scale=rel2)
        K = _mm(_mm_nt(P, Hm), _inv3(S_m))
        q_new = _normalize(q + _mv(K, accel - accel_hat))
        KH = _mm(K, Hm)
        P_new = P - _mm(KH, P)
        return q_new, P_new

    def vo_correct(q, P, q_vo):
        S_m = _add_const_mat(P, C_vo)
        K = _mm(P, _gj_inv4(S_m))
        q_new = _normalize(q + _mv(K, q_vo - q))
        P_new = P - _mm(K, P)
        return q_new, P_new

    def kernel(t0_ref, valid_ref, vo_active_ref, vo_sb_ref, vo_q_s_ref,
               gyro_ref, accel_ref, vo_q_l_ref,
               q_in, P_in, gh_in, ah_in, qh_in, Ph_in,
               q_seq_ref, t_out,
               q_o, P_o, gh_o, ah_o, qh_o, Ph_o,
               t_sm):
        for src, dst in ((q_in, q_o), (P_in, P_o), (gh_in, gh_o),
                         (ah_in, ah_o), (qh_in, qh_o), (Ph_in, Ph_o)):
            dst[...] = src[...]
        t_sm[0] = t0_ref[0]

        def substep(i, j):
            t = t_sm[0]
            slot = jax.lax.rem(t, jnp.asarray(R, t.dtype))
            gyro = gyro_ref[i, j]
            accel = accel_ref[i, j]
            gh_o[slot] = gyro
            ah_o[slot] = accel
            qh_o[slot] = q_o[...]
            Ph_o[slot] = P_o[...]

            sb = vo_sb_ref[i, j]
            vo_valid = ((vo_active_ref[i, j] != 0) & (sb >= 1) & (sb <= t)
                        & (sb < R))

            @pl.when(vo_valid)
            def _():
                # delayed-VO rewind + replay (orien_ekf.cpp:156-212)
                if per_lane_vo_q:
                    q_vo = vo_q_l_ref[i, j]                  # (4,Bt)
                else:
                    q_vo = jnp.stack(
                        [jnp.full_like(q_o[0], vo_q_s_ref[i, j, k])
                         for k in range(4)], axis=0)
                sync = jax.lax.rem(t - sb, jnp.asarray(R, t.dtype))

                def replay_body(k, carry):
                    q, P = carry

                    def do(q, P):
                        sl = jax.lax.rem(sync + k, jnp.asarray(R, t.dtype))
                        qp, Pp = predict(q, P, gh_o[sl])
                        qc, Pc = accel_correct(qp, Pp, ah_o[sl])
                        return jax.lax.cond(
                            k == 0, lambda a, b: vo_correct(a, b, q_vo),
                            lambda a, b: (a, b), qc, Pc)

                    return jax.lax.cond(k < sb - 1, do,
                                        lambda a, b: (a, b), q, P)

                q_r, P_r = jax.lax.fori_loop(
                    0, R, replay_body, (qh_o[sync], Ph_o[sync]))
                q_o[...] = q_r
                P_o[...] = P_r

            qp, Pp = predict(q_o[...], P_o[...], gyro)
            qc, Pc = accel_correct(qp, Pp, accel)
            q_o[...] = qc
            P_o[...] = Pc
            t_sm[0] = t + 1

        def tick(i, _):
            for j in range(S):
                @pl.when(valid_ref[i, j] != 0)
                def _(j=j):
                    substep(i, j)
            q_seq_ref[i] = q_o[...]
            return 0

        jax.lax.fori_loop(0, Tc, tick, 0)
        t_out[0] = t_sm[0]

    return kernel


def _chunk_call(ec, R, Tc, S, dtype, t0, meta, streams, state,
                per_lane_vo_q, interpret):
    B = state[0].shape[-1]
    grid = (B // LANE_TILE,)

    def vspec(shape):
        nd = len(shape)
        return pl.BlockSpec(shape + (LANE_TILE,),
                            lambda i, nd=nd: (0,) * nd + (i,),
                            memory_space=pltpu.VMEM)

    def sspec():
        return pl.BlockSpec(memory_space=pltpu.SMEM)

    valid, vo_active, vo_sb, vo_q_s = meta
    gyro, accel, vo_q_l = streams
    state_shapes = [(4,), (4, 4), (R, 3), (R, 3), (R, 4), (R, 4, 4)]
    # with a SHARED measured quaternion, vo_q_l is a (Tc, 1) dummy riding
    # SMEM (the kernel never reads it); the real per-lane tensor is VMEM
    in_specs = (
        [sspec()] * 5
        + [vspec((Tc, S, 3)), vspec((Tc, S, 3))]
        + [vspec((Tc, S, 4)) if per_lane_vo_q else sspec()]
        + [vspec(sh) for sh in state_shapes]
    )
    out_specs = (
        [vspec((Tc, 4)), sspec()]
        + [vspec(sh) for sh in state_shapes]
    )
    out_shape = (
        [jax.ShapeDtypeStruct((Tc, 4, B), dtype),
         jax.ShapeDtypeStruct((1,), jnp.int32)]
        + [jax.ShapeDtypeStruct(sh + (B,), dtype) for sh in state_shapes]
    )
    kernel = _make_kernel(ec, R, Tc, S, dtype, per_lane_vo_q)
    # state inputs are positions 8..13; matching outputs 2..7
    aliases = {8 + i: 2 + i for i in range(6)}
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        input_output_aliases=aliases,
        scratch_shapes=[pltpu.SMEM((1,), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(
        jnp.asarray([t0], jnp.int32) if np.isscalar(t0) or t0.ndim == 0
        else t0,
        valid, vo_active, vo_sb, vo_q_s, gyro, accel, vo_q_l, *state,
    )
    return outs[0], outs[1], tuple(outs[2:8])


def replay(ec, ekf_st, eb, chunk: int = 64, interpret: bool = False):
    """Full-log EKF stage through the kernel: the fused twin of
    estimator.scan_ekf_blocks.

    Args:
      ec: ekf_lanes.EKFConstsL.
      ekf_st: ekf_lanes.EKFStateL (lanes layout, B divisible by 128 —
        callers pad like the MHE mega-kernel).
      eb: estimator.EKFBlocks with lanes gyro/accel (T,S,3,B), SHARED
        valid/vo_active/vo_steps_back, vo_q shared (T,S,4) or per-lane
        (T,S,4,B).
    Returns (q_seq (T,4,B), final_state).
    """
    T, S = eb.gyro.shape[:2]
    B = eb.gyro.shape[-1]
    R = ekf_st.gyro_hist.shape[0]
    dtype = ekf_st.q.dtype
    per_lane_vo_q = eb.vo_q.ndim == 4
    assert B % LANE_TILE == 0, B
    assert eb.vo_active.ndim == 2, (
        "per-lane VO timing uses estimator.scan_ekf_blocks")

    state = (ekf_st.q, ekf_st.P, ekf_st.gyro_hist, ekf_st.accel_hist,
             ekf_st.q_hist, ekf_st.P_hist)
    valid = jnp.asarray(eb.valid, jnp.int32)
    vo_active = jnp.asarray(eb.vo_active, jnp.int32)
    vo_sb = jnp.asarray(eb.vo_steps_back, jnp.int32)
    if per_lane_vo_q:
        vo_q_s = jnp.zeros((T, S, 4), dtype)
        vo_q_l = eb.vo_q.astype(dtype)
    else:
        vo_q_s = jnp.asarray(eb.vo_q, dtype)
        vo_q_l = jnp.zeros((T, 1), dtype)     # unread SMEM dummy

    qs = []
    t0 = ekf_st.t.astype(jnp.int32)
    t_arr = jnp.reshape(t0, (1,))
    n_full = T // chunk
    if n_full > 1:
        sl = slice(0, n_full * chunk)

        def ch(a):
            return a[sl].reshape((n_full, chunk) + a.shape[1:])

        meta_c = (ch(valid), ch(vo_active), ch(vo_sb), ch(vo_q_s))
        streams_c = (ch(eb.gyro.astype(dtype)), ch(eb.accel.astype(dtype)),
                     ch(vo_q_l))

        def chunk_step(carry, inp):
            t_arr, state = carry
            meta, streams = inp
            q_seq, t_arr, state = _chunk_call(
                ec, R, chunk, S, dtype, t_arr, meta, streams, state,
                per_lane_vo_q, interpret)
            return (t_arr, state), q_seq

        (t_arr, state), q_scan = jax.lax.scan(
            chunk_step, (t_arr, state), (meta_c, streams_c))
        qs.append(q_scan.reshape((n_full * chunk,) + q_scan.shape[2:]))
        t = n_full * chunk
    else:
        t = 0
    while t < T:
        Tc = min(chunk, T - t)
        sl = slice(t, t + Tc)
        meta = (valid[sl], vo_active[sl], vo_sb[sl], vo_q_s[sl])
        streams = (eb.gyro[sl].astype(dtype), eb.accel[sl].astype(dtype),
                   vo_q_l[sl])
        q_seq, t_arr, state = _chunk_call(
            ec, R, Tc, S, dtype, t_arr, meta, streams, state,
            per_lane_vo_q, interpret)
        qs.append(q_seq)
        t += Tc
    from decentralized_ekf_mhe_tpu.ops.ekf_lanes import EKFStateL

    final = EKFStateL(q=state[0], P=state[1], t=t_arr[0],
                      gyro_hist=state[2], accel_hist=state[3],
                      q_hist=state[4], P_hist=state[5])
    return jnp.concatenate(qs, axis=0), final
