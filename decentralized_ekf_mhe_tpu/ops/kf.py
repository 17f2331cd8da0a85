"""Baseline Kalman filter path (est_type=1) — the accuracy yardstick.

Mirrors DecentralizedEstimation::{InitializeKF,UpdateKF}
(DecentralEst.cpp:592-861): a per-tick EKF over the same time-varying linear
dynamics and leg-odometry measurement model the MHE uses, selectable via
``estimation.est_type`` (parameters_go1.yaml:35). Pure-functional; the carry
is (x, C); broadcasts over leading batch axes.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from decentralized_ekf_mhe_tpu.config import EstimatorParams
from decentralized_ekf_mhe_tpu.ops import assembly, smallmat


class KFState(NamedTuple):
    x: jnp.ndarray  # (..., s)
    C: jnp.ndarray  # (..., s, s)


def _correct(x, C, A_meas, b_meas, C_meas):
    """K = C Hᵀ (H C Hᵀ + R)⁻¹; x += K(b − Hx); C = (I − KH)C
    (DecentralEst.cpp:697-699, 858-860)."""
    s = x.shape[-1]
    S = A_meas @ C @ jnp.swapaxes(A_meas, -1, -2) + C_meas
    K = C @ jnp.swapaxes(A_meas, -1, -2) @ smallmat.gj_inv(S)
    innov = b_meas - jnp.einsum("...ij,...j->...i", A_meas, x)
    x_new = x + jnp.einsum("...ij,...j->...i", K, innov)
    C_new = (jnp.eye(s, dtype=x.dtype) - K @ A_meas) @ C
    return x_new, C_new


def init(
    p: EstimatorParams,
    nc: assembly.NoiseConsts,
    A_meas: jnp.ndarray,
    b_meas0: jnp.ndarray,
    C_meas0: jnp.ndarray,
) -> KFState:
    """Prior + measurement correction at t=0 (InitializeKF, DecentralEst.cpp:592-700)."""
    x0, _, C0 = assembly.prior_state(p, nc, b_meas0)
    x, C = _correct(x0, C0, A_meas, b_meas0, C_meas0)
    return KFState(x=x, C=C)


def update(
    state: KFState,
    A_dyn: jnp.ndarray,
    b_dyn: jnp.ndarray,
    C_dyn: jnp.ndarray,
    A_meas: jnp.ndarray,
    b_meas: jnp.ndarray,
    C_meas: jnp.ndarray,
) -> KFState:
    """Predict x = A x − b, C = A C Aᵀ + C_dyn; then correct
    (UpdateKF, DecentralEst.cpp:783-785, 858-860)."""
    x = jnp.einsum("...ij,...j->...i", A_dyn, state.x) - b_dyn
    C = A_dyn @ state.C @ jnp.swapaxes(A_dyn, -1, -2) + C_dyn
    x, C = _correct(x, C, A_meas, b_meas, C_meas)
    return KFState(x=x, C=C)


def body_velocity(x, R_sb, omega_b, lever_arm):
    """v_b = R_sb·(x_v + ω×r) — the reference's logging transform with the
    hardcoded IMU→mocap lever arm (DecentralEst.cpp:183-185, 192-194)."""
    return jnp.einsum(
        "...ij,...j->...i", R_sb, x[..., 3:6] + jnp.cross(omega_b, lever_arm)
    )


# DecentralEst.cpp:184/193 — p_imu_2_opti hardcoded in the reference
DEFAULT_LEVER_ARM = (0.016041, 0.089061, 0.0579875)
