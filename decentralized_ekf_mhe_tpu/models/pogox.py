"""PogoX hopping robot adaptation (single prismatic-ish pogo leg).

The reference demonstrates PogoX in the paper (README.md:5) but ships no
PogoX kinematics in-repo; as with Cassie, deployments feed foot kinematics
through the robotSub seam. This model provides a single-leg chain: leg roll
q1 (about x), leg pitch q2 (about y), and prismatic extension q3 along the
leg axis from nominal length L0 — matching a pogo-stick hopper whose
high-dynamic-range contact schedule drives the MHE constraint gating
(BASELINE.json config 3).
"""

from __future__ import annotations

import jax.numpy as jnp

from decentralized_ekf_mhe_tpu.models.base import RobotModel

L0 = 0.45  # nominal leg length (m)


class PogoXModel(RobotModel):
    name = "pogox"
    num_legs = 1

    def __init__(self, p_ib=(0.0, 0.0, 0.0), contact_threshold=40.0):
        super().__init__(p_ib=p_ib, contact_threshold=contact_threshold)

    def fk(self, joints: jnp.ndarray) -> jnp.ndarray:
        """(..., 1, 3) joints (roll, pitch, extension) -> (..., 1, 3) foot pos."""
        q1, q2, q3 = joints[..., 0], joints[..., 1], joints[..., 2]
        length = L0 + q3
        # leg axis: -z rotated by pitch about y then roll about x
        ax = -jnp.sin(q2) * jnp.cos(q1)
        ay = jnp.sin(q1)
        az = -jnp.cos(q2) * jnp.cos(q1)
        return jnp.stack([length * ax, length * ay, length * az], axis=-1)

    def jacobian(self, joints: jnp.ndarray) -> jnp.ndarray:
        q1, q2, q3 = joints[..., 0], joints[..., 1], joints[..., 2]
        s1, c1 = jnp.sin(q1), jnp.cos(q1)
        s2, c2 = jnp.sin(q2), jnp.cos(q2)
        length = L0 + q3
        zero = jnp.zeros_like(q1)
        J = jnp.stack(
            [
                length * s2 * s1, -length * c2 * c1, -s2 * c1,
                length * c1, zero, s1,
                length * c2 * s1, length * s2 * c1, -c2 * c1,
            ],
            axis=-1,
        )
        return J.reshape(joints.shape[:-1] + (3, 3))
