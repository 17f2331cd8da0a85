import numpy as np
import jax.numpy as jnp
import pytest

from decentralized_ekf_mhe_tpu.utils import quaternion as quat
from tests.ref_impl import ekf_ref


def rand_q(rng, n=1):
    q = rng.standard_normal((n, 4))
    return q / np.linalg.norm(q, axis=-1, keepdims=True)


def test_mul_matches_rotation_composition():
    rng = np.random.default_rng(0)
    a, b = rand_q(rng)[0], rand_q(rng)[0]
    q_ab = np.asarray(quat.mul(jnp.asarray(a), jnp.asarray(b)))
    R_ab = ekf_ref.rot(q_ab)
    np.testing.assert_allclose(R_ab, ekf_ref.rot(a) @ ekf_ref.rot(b), atol=1e-12)


def test_inv():
    rng = np.random.default_rng(1)
    q = rand_q(rng)[0]
    qi = np.asarray(quat.inv(jnp.asarray(q)))
    ident = np.asarray(quat.mul(jnp.asarray(q), jnp.asarray(qi)))
    np.testing.assert_allclose(np.abs(ident[0]), 1.0, atol=1e-12)
    np.testing.assert_allclose(ident[1:], 0.0, atol=1e-12)


def test_to_rot_matches_oracle():
    rng = np.random.default_rng(2)
    for q in rand_q(rng, 5):
        np.testing.assert_allclose(
            np.asarray(quat.to_rot(jnp.asarray(q))), ekf_ref.rot(q), atol=1e-12
        )


def test_omega_matches_oracle():
    rng = np.random.default_rng(3)
    w = rng.standard_normal(3)
    np.testing.assert_allclose(
        np.asarray(quat.gyro_to_omega(jnp.asarray(w))), ekf_ref.omega(w), atol=1e-15
    )


@pytest.mark.parametrize("quirk", [True, False])
def test_W_matches_oracle(quirk):
    rng = np.random.default_rng(4)
    q = rand_q(rng)[0]
    np.testing.assert_allclose(
        np.asarray(quat.quat_to_W(jnp.asarray(q), 0.002, quirk_compatible=quirk)),
        ekf_ref.W_mat(q, 0.002, quirk),
        atol=1e-15,
    )


def test_H_matches_oracle_and_is_jacobian():
    rng = np.random.default_rng(5)
    q = rand_q(rng)[0]
    g = np.array([0.0, 0.0, 9.81])
    H = np.asarray(quat.quat_to_H(jnp.asarray(q), jnp.asarray(g)))
    np.testing.assert_allclose(H, ekf_ref.H_mat(q), atol=1e-12)
    # H is the analytic Jacobian of h(q) = R(q)ᵀ g for unnormalized q
    eps = 1e-7

    def h(qv):
        w, x, y, z = qv
        # R(q)ᵀ for raw (unnormalized) quaternion entries, matching the 2*H form
        R = np.array(
            [
                [w * w + x * x - y * y - z * z, 2 * (x * y + w * z), 2 * (x * z - w * y)],
                [2 * (x * y - w * z), w * w - x * x + y * y - z * z, 2 * (y * z + w * x)],
                [2 * (x * z + w * y), 2 * (y * z - w * x), w * w - x * x - y * y + z * z],
            ]
        )
        return R @ g

    J = np.zeros((3, 4))
    for i in range(4):
        dq = q.copy()
        dq[i] += eps
        J[:, i] = (h(dq) - h(q)) / eps
    np.testing.assert_allclose(H, J, atol=1e-5)


def test_euler_roundtrip():
    rng = np.random.default_rng(6)
    q = rand_q(rng)[0]
    e = np.asarray(quat.to_euler(jnp.asarray(q)))
    roll, pitch, yaw = e
    # rebuild quaternion from euler ZYX and compare rotations
    cr, sr = np.cos(roll / 2), np.sin(roll / 2)
    cp, sp = np.cos(pitch / 2), np.sin(pitch / 2)
    cy, sy = np.cos(yaw / 2), np.sin(yaw / 2)
    q2 = np.array(
        [
            cr * cp * cy + sr * sp * sy,
            sr * cp * cy - cr * sp * sy,
            cr * sp * cy + sr * cp * sy,
            cr * cp * sy - sr * sp * cy,
        ]
    )
    np.testing.assert_allclose(ekf_ref.rot(q2), ekf_ref.rot(q), atol=1e-9)


def test_skew():
    v = np.array([1.0, 2.0, 3.0])
    S = np.asarray(quat.skew(jnp.asarray(v)))
    u = np.array([0.5, -1.0, 2.0])
    np.testing.assert_allclose(S @ u, np.cross(v, u), atol=1e-14)


def test_batching():
    rng = np.random.default_rng(7)
    qs = rand_q(rng, 8)
    R_batch = np.asarray(quat.to_rot(jnp.asarray(qs)))
    for i in range(8):
        np.testing.assert_allclose(R_batch[i], ekf_ref.rot(qs[i]), atol=1e-12)
