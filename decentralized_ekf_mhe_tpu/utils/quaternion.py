"""Quaternion and small-rotation primitives, batch-polymorphic over leading axes.

Convention: quaternion = [w, x, y, z] (scalar first), matching the reference
(orien_ekf.cpp:216 comment, EigenUtils.hpp:99-123). All functions are pure jnp
and broadcast over arbitrary leading batch dimensions, so they vmap/jit freely.

Reference anchors (behavioral parity, not ported code):
- gyro_to_omega    <- orien_ekf::gyro_2_Ohm        (orien_ekf.cpp:214-228)
- quat_to_W        <- orien_ekf::quat_2_W          (orien_ekf.cpp:270-294)
- quat_to_rot      <- orien_ekf::quat_2_Rot        (orien_ekf.cpp:296-305)
- quat_to_H        <- orien_ekf::quat_2_H          (orien_ekf.cpp:307-329)
- quat_to_euler    <- orien_ekf::quaternionToEuler (orien_ekf.cpp:331-351)
- quat_mul/inv     <- orien_ekf.cpp:230-268 (Eigen Quaterniond semantics)
- skew             <- EigenUtils::vector3dSkew     (EigenUtils.hpp:91-97)
"""

from __future__ import annotations

import jax.numpy as jnp


def normalize(q: jnp.ndarray) -> jnp.ndarray:
    """q / ||q|| — orien_ekf::quat_norm (orien_ekf.cpp:353-357)."""
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def mul(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Hamilton product a ⊗ b, [w,x,y,z]; normalized like quat_mul (:262)."""
    aw, ax, ay, az = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bw, bx, by, bz = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    out = jnp.stack(
        [
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ],
        axis=-1,
    )
    return normalize(out)


def inv(q: jnp.ndarray) -> jnp.ndarray:
    """Inverse of a (normalized-first) quaternion — quat_inv (:230-244)."""
    qn = normalize(q)
    return qn * jnp.asarray([1.0, -1.0, -1.0, -1.0], dtype=qn.dtype)


def to_rot(q: jnp.ndarray) -> jnp.ndarray:
    """(...,4) -> (...,3,3) rotation matrix of the *normalized* quaternion.

    Matches Eigen's Quaterniond::toRotationMatrix after normalization
    (quat_2_Rot, orien_ekf.cpp:296-305). R maps body -> world when q = q_sb.
    """
    qn = normalize(q)
    w, x, y, z = qn[..., 0], qn[..., 1], qn[..., 2], qn[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    r = jnp.stack(
        [
            1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy),
            2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx),
            2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy),
        ],
        axis=-1,
    )
    return r.reshape(r.shape[:-1] + (3, 3))


def gyro_to_omega(w: jnp.ndarray) -> jnp.ndarray:
    """(...,3) gyro -> (...,4,4) Ω(ω) with q̇ = ½ Ω q (gyro_2_Ohm, :214-228)."""
    z = jnp.zeros_like(w[..., 0])
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    m = jnp.stack(
        [
            z, -wx, -wy, -wz,
            wx, z, wz, -wy,
            wy, -wz, z, wx,
            wz, wy, -wx, z,
        ],
        axis=-1,
    )
    return m.reshape(m.shape[:-1] + (4, 4))


def quat_to_W(q: jnp.ndarray, dt: float, quirk_compatible: bool = True) -> jnp.ndarray:
    """(...,4) -> (...,4,3) process-noise Jacobian W = ∂q⁺/∂ω · (dt/2 scaling).

    The textbook matrix (documented at orien_ekf.cpp:272-276) is
        (dt/2) [[-x,-y,-z],[w,-z,y],[z,w,-x],[-y,x,w]].
    The *implemented* reference (orien_ekf.cpp:277-293) assigns W(2,1)/W(2,2)
    twice (overwriting row 2 with x, w) and leaves W(3,1)/W(3,2) at zero:
        (dt/2) [[-x,-y,-z],[w,-z,y],[z,x,w],[-y,0,0]].
    ``quirk_compatible=True`` reproduces the shipped behavior bit-for-bit.
    """
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    zero = jnp.zeros_like(w)
    if quirk_compatible:
        rows = [-x, -y, -z, w, -z, y, z, x, w, -y, zero, zero]
    else:
        rows = [-x, -y, -z, w, -z, y, z, w, -x, -y, x, w]
    m = jnp.stack(rows, axis=-1).reshape(q.shape[:-1] + (4, 3))
    return (0.5 * dt) * m


def quat_to_H(q: jnp.ndarray, gravity: jnp.ndarray) -> jnp.ndarray:
    """(...,4) -> (...,3,4) Jacobian of h(q) = R(q)ᵀ g w.r.t. q (quat_2_H, :307-329)."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    gx, gy, gz = gravity[..., 0], gravity[..., 1], gravity[..., 2]
    m = jnp.stack(
        [
            gx * w + gy * z - gz * y,
            gx * x + gy * y + gz * z,
            -gx * y + gy * x - gz * w,
            -gx * z + gy * w + gz * x,
            -gx * z + gy * w + gz * x,
            gx * y - gy * x + gz * w,
            gx * x + gy * y + gz * z,
            -gx * w - gy * z + gz * y,
            gx * y - gy * x + gz * w,
            gx * z - gy * w - gz * x,
            gx * w + gy * z - gz * y,
            gx * x + gy * y + gz * z,
        ],
        axis=-1,
    )
    return 2.0 * m.reshape(q.shape[:-1] + (3, 4))


def to_euler(q: jnp.ndarray) -> jnp.ndarray:
    """(...,4) -> (...,3) [roll, pitch, yaw] (quaternionToEuler, :331-351)."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    sinr_cosp = 2 * (w * x + y * z)
    cosr_cosp = 1 - 2 * (x * x + y * y)
    roll = jnp.arctan2(sinr_cosp, cosr_cosp)
    sinp = 2 * (w * y - z * x)
    pitch = jnp.where(
        jnp.abs(sinp) >= 1.0,
        jnp.sign(sinp) * (jnp.pi / 2),
        jnp.arcsin(jnp.clip(sinp, -1.0, 1.0)),
    )
    siny_cosp = 2 * (w * z + x * y)
    cosy_cosp = 1 - 2 * (y * y + z * z)
    yaw = jnp.arctan2(siny_cosp, cosy_cosp)
    return jnp.stack([roll, pitch, yaw], axis=-1)


def skew(v: jnp.ndarray) -> jnp.ndarray:
    """(...,3) -> (...,3,3) skew-symmetric matrix (EigenUtils.hpp:91-97)."""
    z = jnp.zeros_like(v[..., 0])
    vx, vy, vz = v[..., 0], v[..., 1], v[..., 2]
    m = jnp.stack([z, -vz, vy, vz, z, -vx, -vy, vx, z], axis=-1)
    return m.reshape(v.shape[:-1] + (3, 3))
