import numpy as np
import jax
import jax.numpy as jnp
import pytest

from decentralized_ekf_mhe_tpu.models import CassieModel, Go1Model, PogoXModel

GOLDEN = "tests/data/go1_frost_golden.npz"


@pytest.fixture(scope="module")
def golden():
    return np.load(GOLDEN)


def test_go1_fk_matches_frost(golden):
    model = Go1Model(p_ib=(0.0, 0.0, 0.0))
    joints = jnp.asarray(golden["joints"])  # (n, 4, 3)
    fk = np.asarray(model.fk(joints))
    np.testing.assert_allclose(fk, golden["fk"], atol=1e-12)


def test_go1_jacobian_matches_frost(golden):
    model = Go1Model()
    joints = jnp.asarray(golden["joints"])
    J = np.asarray(model.jacobian(joints))
    np.testing.assert_allclose(J, golden["jac"], atol=1e-12)


def test_go1_p_imu_2_foot_offset(golden):
    p_ib = (0.01592, 0.06659, 0.00617)  # parameters_go1.yaml leg_odom.p_ib
    model = Go1Model(p_ib=p_ib)
    joints = jnp.asarray(golden["joints"][:3])
    p = np.asarray(model.p_imu_2_foot(joints))
    np.testing.assert_allclose(p, golden["fk"][:3] + np.asarray(p_ib), atol=1e-12)


def test_go1_contact_threshold():
    model = Go1Model(contact_threshold=150.0)
    force = jnp.asarray([10.0, 150.0, 200.0, 0.0])
    np.testing.assert_array_equal(
        np.asarray(model.contact_from_force(force)), [0.0, 1.0, 1.0, 0.0]
    )


@pytest.mark.parametrize("model_cls,num_legs", [(Go1Model, 4), (CassieModel, 2), (PogoXModel, 1)])
def test_jacobian_is_fk_derivative(model_cls, num_legs):
    """Analytic Jacobian == autodiff Jacobian of fk for every model."""
    model = model_cls()
    rng = np.random.default_rng(7)
    joints = jnp.asarray(rng.uniform(-0.8, 0.8, (5, num_legs, 3)))

    J_analytic = np.asarray(model.jacobian(joints))
    # full (L,3,L,3) autodiff Jacobian; cross-leg blocks must be zero and the
    # per-leg diagonal must equal the analytic blocks
    J_full = np.asarray(jax.vmap(jax.jacfwd(model.fk))(joints))
    for b in range(joints.shape[0]):
        for i in range(num_legs):
            for j in range(num_legs):
                block = J_full[b, i, :, j, :]
                if i == j:
                    np.testing.assert_allclose(J_analytic[b, i], block, atol=1e-10)
                else:
                    np.testing.assert_allclose(block, 0.0, atol=1e-12)


def test_go1_vmap_over_batch(golden):
    model = Go1Model()
    joints = jnp.asarray(golden["joints"][:16])
    direct = np.asarray(model.fk(joints))
    vmapped = np.asarray(jax.vmap(model.fk)(joints))
    np.testing.assert_allclose(direct, vmapped, atol=0)
