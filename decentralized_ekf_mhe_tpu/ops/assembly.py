"""Per-tick dynamics/measurement model assembly for the MHE/KF stage.

Builds the time-varying linear model the decentralization idea rests on: with
orientation R_sb supplied by the EKF stage, base dynamics and leg-odometry
measurements are linear in the decision variables, with R_sb entering only as
coefficients (reference: DecentralEst.cpp:353-585, 702-861).

State layout (dim_state = 9 + 3·leg_odom_type·L, DecentralEst.cpp:20):
    x = [p_s(3), v_s(3), accel_bias_b(3), (foot positions p_f_s(3L) if type 1)]

Dynamics (A_dyn/b_dyn/Q_dyn, DecentralEst.cpp:387-458):
    A_dyn = [[I, dt·I, −dt²/2·R], [0, I, −dt·R], [0,0,I], ([0..I] feet)]
    b_dyn = [−dt²/2·a_s, −dt·a_s, 0, (0)]  with a_s = R·a_b + g, g=(0,0,−9.81)
    C_dyn = G·diag(C_p, C_accel, C_bias, C_feet)·Gᵀ,  Q_dyn = C_dyn⁻¹ blockwise

Leg odometry (A_meas/b_meas/Q_meas, DecentralEst.cpp:86-120, 492-572):
    type 0 (velocity): rows [0 I 0];  b = −R(J·dq) − R(ω×p)
       stance: Q = (R·G_i·diag(C_enc_vel,C_enc_pos,C_gyro)·G_iᵀ·Rᵀ)⁻¹,
               G_i = [−J, −ω^x·J, p^x];     swing: Q = Q_foot_swing (tiny)
    type 1 (position): rows [−I 0 0 | I]; b = R·p;  Q = (R·J·C_pos·Jᵀ·Rᵀ)⁻¹;
       contact gates the *process* foot blocks instead (slide vs swing).

All builders broadcast over leading batch axes; shapes are static per config.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from decentralized_ekf_mhe_tpu.config import EstimatorParams, std_to_cov, std_to_gain
from decentralized_ekf_mhe_tpu.ops import smallmat
from decentralized_ekf_mhe_tpu.utils.quaternion import skew

GRAVITY_S = np.array([0.0, 0.0, -9.81])  # DecentralEst.cpp:27


class NoiseConsts(NamedTuple):
    """Covariance/gain diagonals derived from stds (DecentralEst.cpp:39-51)."""

    C_p: jnp.ndarray
    C_accel: jnp.ndarray
    C_accel_bias: jnp.ndarray
    C_enc_pos: jnp.ndarray
    C_enc_vel: jnp.ndarray
    C_gyro: jnp.ndarray
    C_foot_slide: jnp.ndarray
    C_foot_swing: jnp.ndarray
    Q_accel_bias: jnp.ndarray
    Q_foot_slide: jnp.ndarray
    Q_foot_swing: jnp.ndarray
    Q_vo_p: jnp.ndarray
    # priors (InitializeMHE/KF, DecentralEst.cpp:236-253, 612-625)
    Q_p_init: jnp.ndarray
    Q_v_init: jnp.ndarray
    Q_accel_bias_init: jnp.ndarray
    Q_foot_init: jnp.ndarray
    C_p_init: jnp.ndarray
    C_v_init: jnp.ndarray
    C_accel_bias_init: jnp.ndarray
    C_foot_init: jnp.ndarray
    gravity: jnp.ndarray
    dt: jnp.ndarray


def make_noise_consts(p: EstimatorParams, dtype=jnp.float32) -> NoiseConsts:
    f = lambda a: jnp.asarray(a, dtype)
    return NoiseConsts(
        C_p=f(std_to_cov(p.p_process_std)),
        C_accel=f(std_to_cov(p.accel_input_std)),
        C_accel_bias=f(std_to_cov(p.accel_bias_std)),
        C_enc_pos=f(std_to_cov(p.joint_position_std)),
        C_enc_vel=f(std_to_cov(p.joint_velocity_std)),
        C_gyro=f(std_to_cov(p.gyro_input_std)),
        C_foot_slide=f(std_to_cov(p.foot_slide_std)),
        C_foot_swing=f(std_to_cov(p.foot_swing_std)),
        Q_accel_bias=f(std_to_gain(p.accel_bias_std)),
        Q_foot_slide=f(std_to_gain(p.foot_slide_std)),
        Q_foot_swing=f(std_to_gain(p.foot_swing_std)),
        Q_vo_p=f(std_to_gain(p.vo_p_std)),
        Q_p_init=f(std_to_gain(p.p_init_std)),
        Q_v_init=f(std_to_gain(p.v_init_std)),
        Q_accel_bias_init=f(std_to_gain(p.accel_bias_init_std)),
        Q_foot_init=f(std_to_gain(p.foot_init_std)),
        C_p_init=f(std_to_cov(p.p_init_std)),
        C_v_init=f(std_to_cov(p.v_init_std)),
        C_accel_bias_init=f(std_to_cov(p.accel_bias_init_std)),
        C_foot_init=f(std_to_cov(p.foot_init_std)),
        gravity=f(GRAVITY_S),
        dt=f(p.dt),
    )


def spatial_accel(R_sb: jnp.ndarray, accel_b: jnp.ndarray, nc: NoiseConsts) -> jnp.ndarray:
    """a_s = R_sb·a_b + g (GetMeasurement, DecentralEst.cpp:871)."""
    return jnp.einsum("...ij,...j->...i", R_sb, accel_b) + nc.gravity


def a_meas(p: EstimatorParams, dtype=jnp.float32) -> jnp.ndarray:
    """Constant measurement matrix (dim_meas, dim_state) (DecentralEst.cpp:86-120)."""
    L, s, m = p.num_legs, p.dim_state, p.dim_meas
    A = np.zeros((m, s))
    if p.leg_odom_type == 0:
        for i in range(L):
            A[i * 3: i * 3 + 3, 3:6] = np.eye(3)
    elif p.leg_odom_type == 1:
        for i in range(L):
            A[i * 3: i * 3 + 3, 0:3] = -np.eye(3)
            A[i * 3: i * 3 + 3, 9 + i * 3: 12 + i * 3] = np.eye(3)
    else:
        raise ValueError(f"{p.leg_odom_type} not a valid leg odom type")
    return jnp.asarray(A, dtype)


def build_dynamics(
    p: EstimatorParams,
    nc: NoiseConsts,
    R_sb: jnp.ndarray,        # (...,3,3)
    accel_s: jnp.ndarray,     # (...,3)
    contact: jnp.ndarray,     # (...,L)
):
    """A_dyn, b_dyn, C_dyn, Q_dyn for one tick (DecentralEst.cpp:387-458, 716-785).

    Q_dyn is the *blockwise* inverse the reference computes: the (p,v) 6x6
    block inverted jointly, bias and foot blocks inverted separately — the
    cross-covariance between the pv block and the rest is exactly zero, so
    this equals the full inverse.
    """
    s = p.dim_state
    L = p.num_legs
    dt = nc.dt
    batch = jnp.broadcast_shapes(R_sb.shape[:-2], accel_s.shape[:-1], contact.shape[:-1])
    dtype = R_sb.dtype
    eye3 = jnp.eye(3, dtype=dtype)

    A = jnp.zeros(batch + (s, s), dtype)
    A = A.at[..., 0:3, 0:3].set(eye3)
    A = A.at[..., 3:6, 3:6].set(eye3)
    A = A.at[..., 6:9, 6:9].set(eye3)
    A = A.at[..., 0:3, 3:6].set(dt * eye3)
    A = A.at[..., 0:3, 6:9].set(-(dt * dt / 2) * R_sb)
    A = A.at[..., 3:6, 6:9].set(-dt * R_sb)

    b = jnp.zeros(batch + (s,), dtype)
    b = b.at[..., 0:3].set(-(dt * dt / 2) * accel_s)
    b = b.at[..., 3:6].set(-dt * accel_s)

    # C_dyn blocks: pv 6x6 via G_pv C_pv G_pvᵀ (DecentralEst.cpp:409-418)
    G_pv = jnp.zeros(batch + (6, 6), dtype)
    G_pv = G_pv.at[..., 0:3, 0:3].set(dt * R_sb)
    G_pv = G_pv.at[..., 0:3, 3:6].set((0.5 * dt * dt) * R_sb)
    G_pv = G_pv.at[..., 3:6, 3:6].set(dt * R_sb)
    C_pv = jnp.zeros(batch + (6, 6), dtype)
    C_pv = C_pv.at[..., 0:3, 0:3].set(nc.C_p)
    C_pv = C_pv.at[..., 3:6, 3:6].set(nc.C_accel)
    C_pv_full = G_pv @ C_pv @ jnp.swapaxes(G_pv, -1, -2)
    Q_pv = smallmat.gj_inv(C_pv_full)

    C = jnp.zeros(batch + (s, s), dtype)
    Q = jnp.zeros(batch + (s, s), dtype)
    C = C.at[..., 0:6, 0:6].set(C_pv_full)
    Q = Q.at[..., 0:6, 0:6].set(Q_pv)
    C = C.at[..., 6:9, 6:9].set((dt * dt) * nc.C_accel_bias)
    Q = Q.at[..., 6:9, 6:9].set((1.0 / (dt * dt)) * nc.Q_accel_bias)

    if p.leg_odom_type == 1:
        RT = jnp.swapaxes(R_sb, -1, -2)
        for i in range(L):
            ci = contact[..., i][..., None, None]
            # foot process: contact -> slide (tight), swing -> loose
            # (DecentralEst.cpp:434-450; KF covariances :759-774)
            C_foot = jnp.where(ci > 0, nc.C_foot_slide, nc.C_foot_swing)
            Q_foot = jnp.where(ci > 0, nc.Q_foot_slide, nc.Q_foot_swing)
            sl = slice(9 + 3 * i, 12 + 3 * i)
            C = C.at[..., sl, sl].set((dt * dt) * (R_sb @ C_foot @ RT))
            Q = Q.at[..., sl, sl].set((1.0 / (dt * dt)) * (R_sb @ Q_foot @ RT))
            A = A.at[..., sl, sl].set(eye3)
    return A, b, C, Q


def build_measurement(
    p: EstimatorParams,
    nc: NoiseConsts,
    R_sb: jnp.ndarray,        # (...,3,3)
    omega_b: jnp.ndarray,     # (...,3)
    p_foot: jnp.ndarray,      # (...,L,3) IMU-frame foot positions
    J_foot: jnp.ndarray,      # (...,L,3,3) per-leg Jacobians
    dq: jnp.ndarray,          # (...,L,3) joint velocities
    contact: jnp.ndarray,     # (...,L)
):
    """b_meas, C_meas, Q_meas for one tick (DecentralEst.cpp:496-572, 789-855)."""
    L = p.num_legs
    m = p.dim_meas
    dtype = R_sb.dtype
    batch = jnp.broadcast_shapes(
        R_sb.shape[:-2], omega_b.shape[:-1], p_foot.shape[:-2], contact.shape[:-1]
    )
    RT = jnp.swapaxes(R_sb, -1, -2)

    b = jnp.zeros(batch + (m,), dtype)
    C = jnp.zeros(batch + (m, m), dtype)
    Q = jnp.zeros(batch + (m, m), dtype)

    if p.leg_odom_type == 0:
        omega_skew = skew(omega_b)  # (...,3,3)
        for i in range(L):
            Ji = J_foot[..., i, :, :]
            pi = p_foot[..., i, :]
            dqi = dq[..., i, :]
            sl = slice(3 * i, 3 * i + 3)
            # b = −R·J·dq − R·(ω×p)
            bi = -jnp.einsum("...ij,...j->...i", R_sb @ Ji, dqi) - jnp.einsum(
                "...ij,...j->...i", R_sb, jnp.cross(omega_b, pi)
            )
            b = b.at[..., sl].set(bi)
            # stance: C = R·G·diag(C_vel,C_pos,C_gyro)·Gᵀ·Rᵀ, G = [−J, −ω^x J, p^x]
            G = jnp.concatenate([-Ji, -(omega_skew @ Ji), skew(pi)], axis=-1)
            Cblk = jnp.zeros(batch + (9, 9), dtype)
            Cblk = Cblk.at[..., 0:3, 0:3].set(nc.C_enc_vel)
            Cblk = Cblk.at[..., 3:6, 3:6].set(nc.C_enc_pos)
            Cblk = Cblk.at[..., 6:9, 6:9].set(nc.C_gyro)
            C_stance = R_sb @ (G @ Cblk @ jnp.swapaxes(G, -1, -2)) @ RT
            Q_stance = smallmat.inv3(C_stance)
            ci = contact[..., i][..., None, None]
            C = C.at[..., sl, sl].set(jnp.where(ci > 0, C_stance, nc.C_foot_swing))
            Q = Q.at[..., sl, sl].set(jnp.where(ci > 0, Q_stance, nc.Q_foot_swing))
    elif p.leg_odom_type == 1:
        for i in range(L):
            Ji = J_foot[..., i, :, :]
            pi = p_foot[..., i, :]
            sl = slice(3 * i, 3 * i + 3)
            b = b.at[..., sl].set(jnp.einsum("...ij,...j->...i", R_sb, pi))
            C_i = R_sb @ (Ji @ nc.C_enc_pos @ jnp.swapaxes(Ji, -1, -2)) @ RT
            # reference computes Q via the *unrotated* inner inverse:
            # R·(J C Jᵀ)⁻¹·Rᵀ (DecentralEst.cpp:556-561) == (R J C Jᵀ Rᵀ)⁻¹
            Q_i = R_sb @ smallmat.inv3(Ji @ nc.C_enc_pos @ jnp.swapaxes(Ji, -1, -2)) @ RT
            C = C.at[..., sl, sl].set(C_i)
            Q = Q.at[..., sl, sl].set(Q_i)
    else:
        raise ValueError(f"{p.leg_odom_type} not a valid leg odom type")
    return b, C, Q


def prior_state(
    p: EstimatorParams,
    nc: NoiseConsts,
    b_meas0: jnp.ndarray,
):
    """x_prior, Q_prior, C_prior at t=0 (DecentralEst.cpp:222-253, 598-625).

    For leg_odom_type 1 the foot-position states are seeded from the first
    leg-odometry measurement (x_prior[9+3i] = b_meas[3i], DecentralEst.cpp:321,683).
    """
    s = p.dim_state
    dtype = b_meas0.dtype
    batch = b_meas0.shape[:-1]
    x0 = jnp.zeros(batch + (s,), dtype)
    Qp = jnp.zeros(batch + (s, s), dtype)
    Cp = jnp.zeros(batch + (s, s), dtype)
    Qp = Qp.at[..., 0:3, 0:3].set(nc.Q_p_init)
    Qp = Qp.at[..., 3:6, 3:6].set(nc.Q_v_init)
    Qp = Qp.at[..., 6:9, 6:9].set(nc.Q_accel_bias_init)
    Cp = Cp.at[..., 0:3, 0:3].set(nc.C_p_init)
    Cp = Cp.at[..., 3:6, 3:6].set(nc.C_v_init)
    Cp = Cp.at[..., 6:9, 6:9].set(nc.C_accel_bias_init)
    if p.leg_odom_type == 1:
        for i in range(p.num_legs):
            sl = slice(9 + 3 * i, 12 + 3 * i)
            x0 = x0.at[..., sl].set(b_meas0[..., 3 * i: 3 * i + 3])
            Qp = Qp.at[..., sl, sl].set(nc.Q_foot_init)
            Cp = Cp.at[..., sl, sl].set(nc.C_foot_init)
    return x0, Qp, Cp
