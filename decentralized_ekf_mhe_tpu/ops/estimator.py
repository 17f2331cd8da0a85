"""Fused estimation drivers: scan the full decentralized pipeline over a log.

The reference splits EKF (500 Hz), MHE/KF (200 Hz) and VO (30 Hz) into three
OS processes wired by DDS topics (go1_launch.py:18-63); here each stage is a
pure function and one jitted `lax.scan` replays the entire log on-device —
the EKF→estimator handoff is an in-graph array, and rate mismatch becomes
per-tick sub-stepping (SURVEY.md §2 parallelism table).

This module currently provides the KF-path slice (est_type=1); the MHE path
plugs into the same scan via ops.mhe.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from decentralized_ekf_mhe_tpu.config import EstimatorParams
from decentralized_ekf_mhe_tpu.ops import assembly, kf
from decentralized_ekf_mhe_tpu.utils import quaternion as quat


class TickData(NamedTuple):
    """Per-MHE-tick aligned inputs (leading axis = time inside scan)."""

    accel_b: jnp.ndarray   # (3,)
    omega_b: jnp.ndarray   # (3,)
    R_sb: jnp.ndarray      # (3,3) orientation input (EKF output or GT)
    p_foot: jnp.ndarray    # (L,3)
    J_foot: jnp.ndarray    # (L,3,3)
    dq: jnp.ndarray        # (L,3)
    contact: jnp.ndarray   # (L,)


def tickdata_from_log(log, R_sb=None, dtype=jnp.float64) -> TickData:
    """Pack a SynthLog / replay log into scan-ready TickData (time-leading)."""
    R = log.R_sb_gt if R_sb is None else R_sb
    return TickData(
        accel_b=jnp.asarray(log.accel_b, dtype),
        omega_b=jnp.asarray(log.omega_b, dtype),
        R_sb=jnp.asarray(R, dtype),
        p_foot=jnp.asarray(log.p_foot, dtype),
        J_foot=jnp.asarray(log.J_foot, dtype),
        dq=jnp.asarray(log.dq, dtype),
        contact=jnp.asarray(log.contact, dtype),
    )


def run_kf(
    params: EstimatorParams,
    data: TickData,
    lever_arm=kf.DEFAULT_LEVER_ARM,
    dtype=jnp.float64,
):
    """Replay the KF baseline over a log (est_type=1 path, EstSub.cpp:58-91).

    Returns (x_seq (T,s), v_b_seq (T,3)); tick 0 performs InitializeKF, ticks
    1.. perform UpdateKF, exactly as timerCallback dispatches them.
    """
    nc = assembly.make_noise_consts(params, dtype)
    A_meas = assembly.a_meas(params, dtype)
    lever = jnp.asarray(lever_arm, dtype)

    d0 = jax.tree.map(lambda a: a[0], data)
    b0, C0, _ = assembly.build_measurement(
        params, nc, d0.R_sb, d0.omega_b, d0.p_foot, d0.J_foot, d0.dq, d0.contact
    )
    state = kf.init(params, nc, A_meas, b0, C0)
    x0 = state.x
    v0 = kf.body_velocity(state.x, d0.R_sb, d0.omega_b, lever)

    def step(state, d: TickData):
        accel_s = assembly.spatial_accel(d.R_sb, d.accel_b, nc)
        A_dyn, b_dyn, C_dyn, _ = assembly.build_dynamics(
            params, nc, d.R_sb, accel_s, d.contact
        )
        b_meas, C_meas, _ = assembly.build_measurement(
            params, nc, d.R_sb, d.omega_b, d.p_foot, d.J_foot, d.dq, d.contact
        )
        state = kf.update(state, A_dyn, b_dyn, C_dyn, A_meas, b_meas, C_meas)
        v_b = kf.body_velocity(state.x, d.R_sb, d.omega_b, lever)
        return state, (state.x, v_b)

    rest = jax.tree.map(lambda a: a[1:], data)
    _, (x_seq, v_seq) = jax.lax.scan(step, state, rest)
    x_seq = jnp.concatenate([x0[None], x_seq], axis=0)
    v_seq = jnp.concatenate([v0[None], v_seq], axis=0)
    return x_seq, v_seq


def ekf_orientation_sequence(params_ekf, log, dtype=jnp.float64):
    """Run the orientation EKF over the log's EKF-rate stream and sample the
    fused quaternion at each MHE tick (the imu/filter -> est_sub handoff,
    orien_ekf.cpp:90-105 -> EstSub.cpp:34-43), as rotation matrices (T,3,3)."""
    from decentralized_ekf_mhe_tpu.ops import ekf as ekf_ops

    c = ekf_ops.make_consts(params_ekf, dtype)
    state = ekf_ops.init_state(params_ekf, ring_len=64, dtype=dtype)
    _, q_seq = ekf_ops.run_sequence(
        state,
        jnp.asarray(log.ekf_gyro, dtype),
        jnp.asarray(log.ekf_accel, dtype),
        jnp.asarray(log.ekf_vo_active),
        jnp.asarray(log.ekf_vo_q, dtype),
        jnp.asarray(log.ekf_vo_steps_back, jnp.int32),
        c,
    )
    bounds = np.cumsum(np.asarray(log.ekf_substeps))
    idx = jnp.asarray(np.maximum(bounds - 1, 0), jnp.int32)
    q_mhe = q_seq[idx]
    return quat.to_rot(q_mhe), q_mhe
