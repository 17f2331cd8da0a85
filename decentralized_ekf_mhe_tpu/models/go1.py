"""Unitree Go1 analytic leg kinematics — closed-form, vectorized over legs/batch.

Replaces the reference's ~3.7k-line FROST/Mathematica scalar codegen
(src/go1_example/src/Expressions/{FR,FL,RR,RL}_foot.cc, J_*.cc; called from
go1Sub.cpp:88-126) with the underlying 3-DoF serial-chain model, recovered by
probing the compiled reference codegen (see tools/gen_frost_golden.py) and
validated against it to machine precision in tests/test_kinematics.py.

Model (body/"Unitree_URDF_center" frame, DecentralEst.hpp:111):
  leg layout  sx = +1 front / −1 rear,  sy = +1 left / −1 right
  hip offset   h = (sx·0.1881, sy·0.04675, 0)
  abad joint   q1 rolls about +x; thigh plane offset (0, sy·0.08, 0) after it
  thigh pitch  q2 and knee q3 rotate about +y; thigh = calf = 0.213 m
  p = h + Rx(q1) · (xp, sy·0.08, zp),  xp = −l·sin — see ``_leg_fk``.

Joint vector convention matches the hardware order (FR, FL, RR, RL) ×
(abad, thigh, calf) (go1Sub.cpp:85 comment).
"""

from __future__ import annotations

import jax.numpy as jnp

from decentralized_ekf_mhe_tpu.models.base import RobotModel

HIP_X = 0.1881
HIP_Y = 0.04675
THIGH_Y = 0.08
L_THIGH = 0.213
L_CALF = 0.213

# leg order FR, FL, RR, RL — signs (sx, sy)
_SX = jnp.asarray([1.0, 1.0, -1.0, -1.0])
_SY = jnp.asarray([-1.0, 1.0, -1.0, 1.0])


def _leg_fk(q: jnp.ndarray, sx: jnp.ndarray, sy: jnp.ndarray) -> jnp.ndarray:
    """(...,3) joints -> (...,3) foot position for one leg of signs (sx, sy)."""
    q1, q2, q3 = q[..., 0], q[..., 1], q[..., 2]
    s1, c1 = jnp.sin(q1), jnp.cos(q1)
    xp = -L_THIGH * jnp.sin(q2) - L_CALF * jnp.sin(q2 + q3)
    zp = -L_THIGH * jnp.cos(q2) - L_CALF * jnp.cos(q2 + q3)
    y0 = sy * THIGH_Y
    x = sx * HIP_X + xp
    y = sy * HIP_Y + c1 * y0 - s1 * zp
    z = s1 * y0 + c1 * zp
    return jnp.stack([x, y, z], axis=-1)


def _leg_jacobian(q: jnp.ndarray, sx: jnp.ndarray, sy: jnp.ndarray) -> jnp.ndarray:
    """(...,3) joints -> (...,3,3) ∂p/∂(q1,q2,q3) for one leg."""
    q1, q2, q3 = q[..., 0], q[..., 1], q[..., 2]
    s1, c1 = jnp.sin(q1), jnp.cos(q1)
    s2, c2 = jnp.sin(q2), jnp.cos(q2)
    s23, c23 = jnp.sin(q2 + q3), jnp.cos(q2 + q3)
    xp = -L_THIGH * s2 - L_CALF * s23
    zp = -L_THIGH * c2 - L_CALF * c23
    dxp_dq2 = -L_THIGH * c2 - L_CALF * c23
    dxp_dq3 = -L_CALF * c23
    dzp_dq2 = L_THIGH * s2 + L_CALF * s23
    dzp_dq3 = L_CALF * s23
    y0 = sy * THIGH_Y
    zero = jnp.zeros_like(q1)
    # rows: x, y, z; cols: q1, q2, q3
    J = jnp.stack(
        [
            zero, dxp_dq2, dxp_dq3,
            -s1 * y0 - c1 * zp, -s1 * dzp_dq2, -s1 * dzp_dq3,
            c1 * y0 - s1 * zp, c1 * dzp_dq2, c1 * dzp_dq3,
        ],
        axis=-1,
    )
    return J.reshape(q.shape[:-1] + (3, 3))


class Go1Model(RobotModel):
    name = "go1"
    num_legs = 4

    def __init__(self, p_ib=(0.01592, 0.06659, 0.00617), contact_threshold=150.0):
        # defaults from parameters_go1.yaml leg_odom.p_ib / contact_effort_theshold
        super().__init__(p_ib=p_ib, contact_threshold=contact_threshold)

    def fk(self, joints: jnp.ndarray) -> jnp.ndarray:
        """(..., 4, 3) joints -> (..., 4, 3) foot positions (body frame)."""
        sx = _SX.astype(joints.dtype)
        sy = _SY.astype(joints.dtype)
        return _leg_fk(joints, sx, sy)

    def jacobian(self, joints: jnp.ndarray) -> jnp.ndarray:
        """(..., 4, 3) joints -> (..., 4, 3, 3) per-leg Jacobians."""
        sx = _SX.astype(joints.dtype)
        sy = _SY.astype(joints.dtype)
        return _leg_jacobian(joints, sx, sy)
