"""Quaternion EKF in instance-on-lanes layout — the fleet orientation stage.

Same semantics as ops/ekf.py (reference: src/orien_est/src/orien_ekf.cpp —
predict :108-123, accel correct with (‖a‖/g)² covariance scaling :125-142,
VO quaternion correction :144-154, delayed-VO rewind + trajectory replay
:156-212), with every tensor keeping the instance batch B on the trailing
lane axis: q (4,B), P (4,4,B), history rings (R,·,B). This is the stage that
feeds the lanes MHE in the fused EKF→MHE fleet pipeline
(ops/estimator.run_pipeline_lanes), replacing the reference's imu/filter DDS
handoff (orien_ekf.cpp:90-105 → EstSub.cpp:34-43) with an in-graph array.

The VO schedule (active flags, steps-back) is shared across the fleet — the
per-tick `lax.cond`s stay real branches inside the scan; the measured VO
quaternion is also shared (one camera log), while gyro/accel streams are
per-instance (Monte-Carlo perturbed). Equivalence with ops/ekf.py is
asserted at float64 in tests/test_pipeline.py.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from decentralized_ekf_mhe_tpu.config import EKFParams, std_to_cov
from decentralized_ekf_mhe_tpu.ops import lanes
from decentralized_ekf_mhe_tpu.ops.ekf import GRAVITY
from decentralized_ekf_mhe_tpu.utils.precision import full_precision


class EKFConstsL(NamedTuple):
    """Host-side (numpy/float) constants: baked into the trace as literals so
    the kernels stay jit-safe regardless of where consts are constructed."""

    dt: float
    C_gyro: np.ndarray    # (3,3)
    C_accel: np.ndarray   # (3,3)
    C_vo: np.ndarray      # (4,4)
    gravity: np.ndarray   # (3,)
    quirk_W: bool


def make_consts(params: EKFParams, dtype=jnp.float32) -> EKFConstsL:
    f = lambda a: np.asarray(a, np.float64)
    return EKFConstsL(
        dt=float(params.dt),
        C_gyro=f(std_to_cov(params.process_std)),
        C_accel=f(std_to_cov(params.gravity_meas_std)),
        C_vo=f(std_to_cov(params.vo_meas_std)),
        gravity=np.array([0.0, 0.0, GRAVITY]),
        quirk_W=params.quirk_compatible_W,
    )


class EKFStateL(NamedTuple):
    """Lanes twin of ekf.EKFState (field docs there)."""

    q: jnp.ndarray            # (4,B)
    P: jnp.ndarray            # (4,4,B)
    t: jnp.ndarray            # scalar int32
    gyro_hist: jnp.ndarray    # (R,3,B)
    accel_hist: jnp.ndarray   # (R,3,B)
    q_hist: jnp.ndarray       # (R,4,B)
    P_hist: jnp.ndarray       # (R,4,4,B)


def init_state(params: EKFParams, B: int, ring_len: int = 16,
               dtype=jnp.float32) -> EKFStateL:
    q0 = jnp.broadcast_to(
        jnp.asarray(params.quaternion_init, dtype)[:, None], (4, B))
    P0 = jnp.broadcast_to(
        jnp.asarray(std_to_cov(params.init_std), dtype)[:, :, None], (4, 4, B))
    return EKFStateL(
        q=q0,
        P=P0,
        t=jnp.asarray(0, jnp.int32),
        gyro_hist=jnp.zeros((ring_len, 3, B), dtype),
        accel_hist=jnp.zeros((ring_len, 3, B), dtype),
        q_hist=jnp.broadcast_to(q0, (ring_len, 4, B)),
        P_hist=jnp.broadcast_to(P0, (ring_len, 4, 4, B)),
    )


# ------------------------------------------------- lanes quaternion algebra


def normalize(q):
    """(...,4,B) -> unit quaternion per lane."""
    return q / jnp.sqrt(jnp.sum(q * q, axis=-2, keepdims=True))


def gyro_to_omega(w):
    """(...,3,B) gyro -> (...,4,4,B) Ω(ω) (gyro_2_Ohm, orien_ekf.cpp:214-228)."""
    z = jnp.zeros_like(w[..., 0, :])
    wx, wy, wz = w[..., 0, :], w[..., 1, :], w[..., 2, :]
    return jnp.stack(
        [
            jnp.stack([z, -wx, -wy, -wz], axis=-2),
            jnp.stack([wx, z, wz, -wy], axis=-2),
            jnp.stack([wy, -wz, z, wx], axis=-2),
            jnp.stack([wz, wy, -wx, z], axis=-2),
        ],
        axis=-3,
    )


def to_rot(q):
    """(...,4,B) -> (...,3,3,B) rotation of the normalized quaternion."""
    qn = normalize(q)
    w, x, y, z = qn[..., 0, :], qn[..., 1, :], qn[..., 2, :], qn[..., 3, :]
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    one = jnp.ones_like(w)
    return jnp.stack(
        [
            jnp.stack([one - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy)], axis=-2),
            jnp.stack([2 * (xy + wz), one - 2 * (xx + zz), 2 * (yz - wx)], axis=-2),
            jnp.stack([2 * (xz - wy), 2 * (yz + wx), one - 2 * (xx + yy)], axis=-2),
        ],
        axis=-3,
    )


def quat_to_W(q, dt, quirk_compatible: bool = True):
    """(...,4,B) -> (...,4,3,B) process-noise Jacobian (quat_2_W,
    orien_ekf.cpp:270-294; quirk flag semantics in utils/quaternion.py)."""
    w, x, y, z = q[..., 0, :], q[..., 1, :], q[..., 2, :], q[..., 3, :]
    zero = jnp.zeros_like(w)
    if quirk_compatible:
        rows = [
            jnp.stack([-x, -y, -z], axis=-2),
            jnp.stack([w, -z, y], axis=-2),
            jnp.stack([z, x, w], axis=-2),
            jnp.stack([-y, zero, zero], axis=-2),
        ]
    else:
        rows = [
            jnp.stack([-x, -y, -z], axis=-2),
            jnp.stack([w, -z, y], axis=-2),
            jnp.stack([z, w, -x], axis=-2),
            jnp.stack([-y, x, w], axis=-2),
        ]
    return (0.5 * dt) * jnp.stack(rows, axis=-3)


def quat_to_H(q, gravity: np.ndarray):
    """(...,4,B) -> (...,3,4,B) Jacobian of R(q)ᵀg (quat_2_H, :307-329);
    ``gravity`` is the constant (3,) vector."""
    w, x, y, z = q[..., 0, :], q[..., 1, :], q[..., 2, :], q[..., 3, :]
    gx, gy, gz = (float(gravity[0]), float(gravity[1]), float(gravity[2]))
    return 2.0 * jnp.stack(
        [
            jnp.stack([gx * w + gy * z - gz * y,
                       gx * x + gy * y + gz * z,
                       -gx * y + gy * x - gz * w,
                       -gx * z + gy * w + gz * x], axis=-2),
            jnp.stack([-gx * z + gy * w + gz * x,
                       gx * y - gy * x + gz * w,
                       gx * x + gy * y + gz * z,
                       -gx * w - gy * z + gz * y], axis=-2),
            jnp.stack([gx * y - gy * x + gz * w,
                       gx * z - gy * w - gz * x,
                       gx * w + gy * z - gz * y,
                       gx * x + gy * y + gz * z], axis=-2),
        ],
        axis=-3,
    )


# ----------------------------------------------------------- filter stages


def predict(q, P, gyro, c: EKFConstsL):
    """q⁺ = norm((I + dt/2 Ω)q), P⁺ = FPFᵀ + W C_gyro Wᵀ (orien_ekf.cpp:108-123)."""
    dt = float(c.dt)
    eye4 = jnp.eye(4, dtype=q.dtype)[:, :, None]
    F = eye4 + (dt / 2) * gyro_to_omega(gyro)
    W = quat_to_W(q, dt, quirk_compatible=c.quirk_W)
    q_pred = normalize(lanes.mv(F, q))
    C_gyro = np.asarray(c.C_gyro, q.dtype)
    P_pred = lanes.mm_nt(lanes.mm(F, P), F) + lanes.mm_nt(
        lanes.mmc(W, C_gyro), W)
    return q_pred, P_pred


def accel_correct(q, P, accel, c: EKFConstsL):
    """Gravity-direction correction, (‖a‖/g)²-scaled covariance (:125-142)."""
    g = np.asarray(c.gravity)
    R = to_rot(q)
    B = q.shape[-1]
    g_l = jnp.broadcast_to(jnp.asarray(g, q.dtype)[:, None], (3, B))
    accel_hat = lanes.mv_t(R, g_l)
    H = quat_to_H(q, g)
    rel2 = jnp.sum(accel * accel, axis=-2) / (GRAVITY * GRAVITY)  # (B,)
    S = lanes.mm_nt(lanes.mm(H, P), H) + rel2[None, None, :] * jnp.asarray(
        c.C_accel, q.dtype)[:, :, None]
    K = lanes.mm(lanes.mm_nt(P, H), lanes.inv3(S))
    q_new = normalize(q + lanes.mv(K, accel - accel_hat))
    eye4 = jnp.eye(4, dtype=q.dtype)[:, :, None]
    P_new = lanes.mm(eye4 - lanes.mm(K, H), P)
    return q_new, P_new


def vo_correct(q, P, q_vo, c: EKFConstsL):
    """Full-quaternion VO correction, H = I₄ (orien_ekf.cpp:144-154);
    ``q_vo`` is the measured quaternion — shared (4,) or per-lane (4,B)
    (Monte-Carlo fleets perturbing vision content per instance)."""
    B = q.shape[-1]
    S = P + jnp.asarray(c.C_vo, q.dtype)[:, :, None]
    K = lanes.mm(P, lanes.gj_inv(S))
    q_vo = jnp.asarray(q_vo, q.dtype)
    q_vo_l = jnp.broadcast_to(
        q_vo[:, None] if q_vo.ndim == 1 else q_vo, (4, B))
    q_new = normalize(q + lanes.mv(K, q_vo_l - q))
    eye4 = jnp.eye(4, dtype=q.dtype)[:, :, None]
    P_new = lanes.mm(eye4 - K, P)
    return q_new, P_new


def _replay(state: EKFStateL, q_vo, steps_back, c: EKFConstsL):
    """Rewind + forward replay (orien_ekf.cpp:186-205) — lanes twin of
    ekf._replay; ``steps_back`` is a shared scalar."""
    R = state.gyro_hist.shape[0]
    sync_slot = jnp.mod(state.t - steps_back, R)
    q0 = state.q_hist[sync_slot]
    P0 = state.P_hist[sync_slot]

    def body(i, carry):
        q, P = carry

        def do_step(q, P):
            slot = jnp.mod(sync_slot + i, R)
            qp, Pp = predict(q, P, state.gyro_hist[slot], c)
            qc, Pc = accel_correct(qp, Pp, state.accel_hist[slot], c)
            return jax.lax.cond(
                i == 0, lambda q_, P_: vo_correct(q_, P_, q_vo, c),
                lambda q_, P_: (q_, P_), qc, Pc)

        return jax.lax.cond(i < steps_back - 1, do_step,
                            lambda q_, P_: (q_, P_), q, P)

    return jax.lax.fori_loop(0, R, body, (q0, P0))


def _gather_ring(hist, slot):
    """hist (R, ..., B) gathered at per-lane ring slots slot (B,)."""
    tail = hist.shape[1:]
    idx = slot.reshape((1,) * len(tail) + slot.shape)
    idx = jnp.broadcast_to(idx, (1,) + tail)
    return jnp.take_along_axis(hist, idx, axis=0)[0]


def _replay_per_lane(state: EKFStateL, q_vo, steps_back, lane_valid,
                     c: EKFConstsL):
    """Per-lane delayed-VO replay: ``steps_back`` (B,) int32, ``q_vo`` (4,B),
    ``lane_valid`` (B,) bool. The rewind/replay of orien_ekf.cpp:186-205 runs
    MASKED per lane (the jit-safe analog of per-instance event timing): each
    lane rewinds to its own sync slot and replays its own number of steps;
    lanes with lane_valid=False return their current (q, P) untouched.
    Equivalence with the shared-schedule path on a uniform fleet and with the
    vmapped single-instance EKF on a mixed fleet:
    tests/test_per_instance_vo.py."""
    R = state.gyro_hist.shape[0]
    sb = jnp.where(lane_valid, steps_back, 1)       # benign index for masked
    sync_slot = jnp.mod(state.t - sb, R)            # (B,)
    q0 = _gather_ring(state.q_hist, sync_slot)
    P0 = _gather_ring(state.P_hist, sync_slot)

    def body(i, carry):
        q, P = carry
        slot = jnp.mod(sync_slot + i, R)
        gyro_i = _gather_ring(state.gyro_hist, slot)
        accel_i = _gather_ring(state.accel_hist, slot)
        qp, Pp = predict(q, P, gyro_i, c)
        qc, Pc = accel_correct(qp, Pp, accel_i, c)
        qc, Pc = jax.lax.cond(
            i == 0, lambda q_, P_: vo_correct(q_, P_, q_vo, c),
            lambda q_, P_: (q_, P_), qc, Pc)
        step_on = (i < sb - 1) & lane_valid          # (B,)
        q = jnp.where(step_on[None, :], qc, q)
        P = jnp.where(step_on[None, None, :], Pc, P)
        return q, P

    q_r, P_r = jax.lax.fori_loop(0, R, body, (q0, P0))
    q = jnp.where(lane_valid[None, :], q_r, state.q)
    P = jnp.where(lane_valid[None, None, :], P_r, state.P)
    return q, P


@full_precision
def tick(state: EKFStateL, gyro, accel, vo_active, q_vo, vo_steps_back,
         c: EKFConstsL) -> EKFStateL:
    """One EKF tick — mirror of ekf.tick (orien_ekf.cpp:77-106): push history,
    delayed-VO replay if valid, predict, accel-correct. gyro/accel are (3,B).

    VO metadata are either shared log-driven scalars (vo_active/vo_steps_back
    scalar, q_vo (4,) or (4,B)) or PER-LANE event streams (vo_active (B,),
    vo_steps_back (B,), q_vo (4,B)) — detected by vo_active's rank. The
    per-lane path runs the masked replay (_replay_per_lane), gated by a real
    lax.cond on "any lane active" so quiet ticks stay cheap."""
    R = state.gyro_hist.shape[0]
    slot = jnp.mod(state.t, R)
    state = state._replace(
        gyro_hist=state.gyro_hist.at[slot].set(gyro),
        accel_hist=state.accel_hist.at[slot].set(accel),
        q_hist=state.q_hist.at[slot].set(state.q),
        P_hist=state.P_hist.at[slot].set(state.P),
    )

    vo_active = jnp.asarray(vo_active, bool)
    vo_steps_back = jnp.asarray(vo_steps_back, jnp.int32)
    valid = (
        vo_active
        & (vo_steps_back >= 1)
        & (vo_steps_back <= state.t)
        & (vo_steps_back < R)
    )
    if vo_active.ndim == 1:
        q, P = jax.lax.cond(
            jnp.any(valid),
            lambda: _replay_per_lane(state, q_vo, vo_steps_back, valid, c),
            lambda: (state.q, state.P),
        )
    else:
        q, P = jax.lax.cond(
            valid,
            lambda: _replay(state, q_vo, vo_steps_back, c),
            lambda: (state.q, state.P),
        )
    q_pred, P_pred = predict(q, P, gyro, c)
    q_corr, P_corr = accel_correct(q_pred, P_pred, accel, c)
    return state._replace(q=q_corr, P=P_corr, t=state.t + 1)


@full_precision
def substep_block(state: EKFStateL, gyro_blk, accel_blk, valid_blk,
                  vo_active_blk, vo_q_blk, vo_sb_blk, c: EKFConstsL):
    """Run one MHE tick's worth of EKF substeps (the 500/200 Hz rate-mismatch
    sub-stepping of SURVEY §2's parallelism table).

    Args are padded per-tick blocks: gyro/accel (S,3,B); valid (S,) shared
    bools (False ⇒ padding slot, skipped via a real lax.cond). VO metadata
    are shared (vo_active (S,), vo_q (S,4) or (S,4,B), vo_sb (S,)) or
    per-lane (vo_active (S,B), vo_q (S,4,B), vo_sb (S,B)) — see tick().
    Returns the advanced state.
    """
    S = gyro_blk.shape[0]

    def sub(j, st):
        def do(st):
            return tick(st, gyro_blk[j], accel_blk[j], vo_active_blk[j],
                        vo_q_blk[j], vo_sb_blk[j], c)

        return jax.lax.cond(valid_blk[j], do, lambda st: st, st)

    return jax.lax.fori_loop(0, S, sub, state)
