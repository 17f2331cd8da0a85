"""Robot adaptation layer — the pluggable seam the reference expresses as a
robotSub subclass (go1Sub : robotSub, src/go1_example/include/go1Sub.hpp:32-50).

A RobotModel converts raw per-tick sensor channels into the estimator's
canonical measurement tensors (`robot_store` fields, DecentralEst.hpp:65-94):
IMU-frame foot positions `p_imu_2_foot` (L,3), per-leg 3x3 Jacobians
`J_imu_2_foot` (L,3,3), and contact flags (L,).

All methods are pure jnp functions broadcasting over leading batch axes.
"""

from __future__ import annotations

from typing import Protocol

import jax.numpy as jnp


class LegKinematics(Protocol):
    num_legs: int

    def fk(self, joints: jnp.ndarray) -> jnp.ndarray:
        """(..., L, 3) foot positions in the IMU/body frame from (..., L, 3) joints."""

    def jacobian(self, joints: jnp.ndarray) -> jnp.ndarray:
        """(..., L, 3, 3) ∂p_foot/∂(q1,q2,q3) from (..., L, 3) joints."""


class RobotModel:
    """Base robot adaptation: kinematics + contact detection + frame offsets."""

    name: str = "base"
    num_legs: int = 0

    def __init__(self, p_ib=(0.0, 0.0, 0.0), contact_threshold: float = 150.0):
        self.p_ib = jnp.asarray(p_ib)
        self.contact_threshold = contact_threshold

    def fk(self, joints: jnp.ndarray) -> jnp.ndarray:  # pragma: no cover
        raise NotImplementedError

    def jacobian(self, joints: jnp.ndarray) -> jnp.ndarray:  # pragma: no cover
        raise NotImplementedError

    def p_imu_2_foot(self, joints: jnp.ndarray) -> jnp.ndarray:
        """FK + imu-to-body offset, as assembled in go1Sub::lo_callback
        (go1Sub.cpp:88-126): p_imu_2_foot = fk(q) + p_ib."""
        return self.fk(joints) + self.p_ib.astype(joints.dtype)

    def contact_from_force(self, force: jnp.ndarray) -> jnp.ndarray:
        """Threshold contact detection (go1Sub.cpp:74): force >= thr -> 1.0."""
        return (force >= self.contact_threshold).astype(force.dtype)


class CartesianFeetModel(RobotModel):
    """Adapter for logs whose "joint state" already carries body-frame foot
    positions/velocities (fk = identity, J = I₃) — the J·dq ≡ ṗ_body
    reparameterization the estimator consumes (DecentralEst.cpp:515-516).
    Used by the synthetic-log RawLog path and by deployments that do their
    own kinematics upstream."""

    name = "cartesian-feet"

    def __init__(self, num_legs: int = 4, p_ib=(0.0, 0.0, 0.0),
                 contact_threshold: float = 150.0):
        super().__init__(p_ib=p_ib, contact_threshold=contact_threshold)
        self.num_legs = num_legs

    def fk(self, joints: jnp.ndarray) -> jnp.ndarray:
        return joints

    def jacobian(self, joints: jnp.ndarray) -> jnp.ndarray:
        eye = jnp.eye(3, dtype=joints.dtype)
        return jnp.broadcast_to(eye, joints.shape + (3,))
