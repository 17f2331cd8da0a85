"""Per-tick model assembly in instance-on-lanes layout.

Lanes-layout twin of ops/assembly.py (same math, same reference anchors:
DecentralEst.cpp:353-585 dynamics/measurement builders) for the fused fleet
runner: inputs carry the instance batch B on the trailing axis — R_sb
(3,3,B), accel_s (3,B), p_foot (L,3,B), J_foot (L,3,3,B), dq (L,3,B),
contact (L,B) — and outputs are (s,s,B)/(s,B) ready for the lanes MHE window
(ops/mhe_lanes.py) with no layout transposes on the hot path.

Only the quantities the MHE consumes are built (b/Q; the covariances C feed
the KF path, which keeps the standard layout). Equivalence with the standard
builders is asserted in tests/test_mhe_lanes.py at float64.
"""

from __future__ import annotations

import jax.numpy as jnp

from decentralized_ekf_mhe_tpu.config import EstimatorParams
from decentralized_ekf_mhe_tpu.ops import lanes
from decentralized_ekf_mhe_tpu.ops.assembly import NoiseConsts


def build_dynamics(
    p: EstimatorParams,
    nc: NoiseConsts,
    R_sb: jnp.ndarray,       # (3,3,B)
    accel_s: jnp.ndarray,    # (3,B)
    contact: jnp.ndarray,    # (L,B)
):
    """A_dyn (s,s,B), b_dyn (s,B), Q_dyn (s,s,B) for one tick
    (DecentralEst.cpp:387-458; see ops/assembly.py for the block math)."""
    s = p.dim_state
    L = p.num_legs
    dt = nc.dt
    dtype = R_sb.dtype
    B = R_sb.shape[-1]
    eye3 = lanes.eye(3, dtype)

    A = jnp.zeros((s, s, B), dtype)
    A = A.at[0:3, 0:3].set(eye3)
    A = A.at[3:6, 3:6].set(eye3)
    A = A.at[6:9, 6:9].set(eye3)
    A = A.at[0:3, 3:6].set(dt * eye3)
    A = A.at[0:3, 6:9].set(-(dt * dt / 2) * R_sb)
    A = A.at[3:6, 6:9].set(-dt * R_sb)

    b = jnp.zeros((s, B), dtype)
    b = b.at[0:3].set(-(dt * dt / 2) * accel_s)
    b = b.at[3:6].set(-dt * accel_s)

    G = jnp.zeros((6, 6, B), dtype)
    G = G.at[0:3, 0:3].set(dt * R_sb)
    G = G.at[0:3, 3:6].set((0.5 * dt * dt) * R_sb)
    G = G.at[3:6, 3:6].set(dt * R_sb)
    C_pv = jnp.zeros((6, 6), dtype)
    C_pv = C_pv.at[0:3, 0:3].set(nc.C_p).at[3:6, 3:6].set(nc.C_accel)
    C_pv_full = lanes.mm_nt(lanes.mmc(G, C_pv), G)
    Q_pv = lanes.gj_inv(C_pv_full)

    Q = jnp.zeros((s, s, B), dtype)
    Q = Q.at[0:6, 0:6].set(Q_pv)
    Q = Q.at[6:9, 6:9].set((1.0 / (dt * dt)) * lanes.const(nc.Q_accel_bias))

    if p.leg_odom_type == 1:
        for i in range(L):
            ci = contact[i][None, None, :]
            Q_foot = jnp.where(
                ci > 0, lanes.const(nc.Q_foot_slide), lanes.const(nc.Q_foot_swing)
            )
            sl = slice(9 + 3 * i, 12 + 3 * i)
            Q = Q.at[sl, sl].set(
                (1.0 / (dt * dt)) * lanes.mm_nt(lanes.mm(R_sb, Q_foot), R_sb)
            )
            A = A.at[sl, sl].set(eye3)
    return A, b, Q


def build_measurement(
    p: EstimatorParams,
    nc: NoiseConsts,
    R_sb: jnp.ndarray,       # (3,3,B)
    omega_b: jnp.ndarray,    # (3,B)
    p_foot: jnp.ndarray,     # (L,3,B)
    J_foot: jnp.ndarray,     # (L,3,3,B)
    dq: jnp.ndarray,         # (L,3,B)
    contact: jnp.ndarray,    # (L,B)
):
    """y_meas (m,B), Q_meas (m,m,B) for one tick (DecentralEst.cpp:496-572)."""
    L = p.num_legs
    m = p.dim_meas
    dtype = R_sb.dtype
    B = R_sb.shape[-1]

    y = jnp.zeros((m, B), dtype)
    Q = jnp.zeros((m, m, B), dtype)

    if p.leg_odom_type == 0:
        omega_skew = lanes.skew(omega_b)
        for i in range(L):
            Ji = J_foot[i]
            pi = p_foot[i]
            dqi = dq[i]
            sl = slice(3 * i, 3 * i + 3)
            bi = -lanes.mv(lanes.mm(R_sb, Ji), dqi) - lanes.mv(
                R_sb, lanes.cross(omega_b, pi)
            )
            y = y.at[sl].set(bi)
            G = jnp.concatenate(
                [-Ji, -lanes.mm(omega_skew, Ji), lanes.skew(pi)], axis=1
            )  # (3,9,B)
            Cblk = jnp.zeros((9, 9), dtype)
            Cblk = (
                Cblk.at[0:3, 0:3].set(nc.C_enc_vel)
                .at[3:6, 3:6].set(nc.C_enc_pos)
                .at[6:9, 6:9].set(nc.C_gyro)
            )
            inner = lanes.mm_nt(lanes.mmc(G, Cblk), G)
            C_stance = lanes.mm_nt(lanes.mm(R_sb, inner), R_sb)
            Q_stance = lanes.inv3(C_stance)
            ci = contact[i][None, None, :]
            Q = Q.at[sl, sl].set(
                jnp.where(ci > 0, Q_stance, lanes.const(nc.Q_foot_swing))
            )
    elif p.leg_odom_type == 1:
        for i in range(L):
            Ji = J_foot[i]
            pi = p_foot[i]
            sl = slice(3 * i, 3 * i + 3)
            y = y.at[sl].set(lanes.mv(R_sb, pi))
            inner = lanes.mm_nt(lanes.mmc(Ji, nc.C_enc_pos), Ji)
            Q_i = lanes.mm_nt(lanes.mm(R_sb, lanes.inv3(inner)), R_sb)
            Q = Q.at[sl, sl].set(Q_i)
    else:
        raise ValueError(f"{p.leg_odom_type} not a valid leg odom type")
    return y, Q


def prior_state(p: EstimatorParams, nc: NoiseConsts, y0: jnp.ndarray):
    """x_prior (s,B), Q_prior (s,s,B) at t=0 (DecentralEst.cpp:222-253)."""
    s = p.dim_state
    dtype = y0.dtype
    B = y0.shape[-1]
    x0 = jnp.zeros((s, B), dtype)
    Qp = jnp.zeros((s, s), dtype)
    Qp = (
        Qp.at[0:3, 0:3].set(nc.Q_p_init)
        .at[3:6, 3:6].set(nc.Q_v_init)
        .at[6:9, 6:9].set(nc.Q_accel_bias_init)
    )
    if p.leg_odom_type == 1:
        for i in range(p.num_legs):
            sl = slice(9 + 3 * i, 12 + 3 * i)
            x0 = x0.at[sl].set(y0[3 * i: 3 * i + 3])
            Qp = Qp.at[sl, sl].set(nc.Q_foot_init)
    return x0, jnp.broadcast_to(Qp[:, :, None], (s, s, B))


def spatial_accel(R_sb, accel_b, nc: NoiseConsts):
    """a_s = R_sb·a_b + g in lanes layout (DecentralEst.cpp:871)."""
    return lanes.mv(R_sb, accel_b) + nc.gravity[:, None]
