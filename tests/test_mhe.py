"""MHE engine vs full-history dense-KKT oracle.

The oracle (tests/ref_impl/mhe_dense_ref.py) mirrors the reference's QP
registry semantics with NO marginalization and solves the KKT exactly. The
package's windowed engine (marginalization + block-tridiagonal solve) must
reproduce its x_T sequence to numerical precision — this simultaneously
validates slack elimination, window bookkeeping, VO activation, and the
arrival-cost Schur update against the reference formulation.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from decentralized_ekf_mhe_tpu.config import EstimatorParams
from decentralized_ekf_mhe_tpu.io import synth
from decentralized_ekf_mhe_tpu.ops import estimator, tridiag
from tests.ref_impl.mhe_dense_ref import run_oracle


@pytest.fixture(scope="module")
def go1_params():
    return EstimatorParams(
        num_legs=4, leg_odom_type=0, rate=200, N=20,
        p_process_std=[0.001] * 3, accel_input_std=[0.025, 0.025, 0.02],
        gyro_input_std=[0.03] * 3, accel_bias_std=[0.07, 0.02, 0.03],
        joint_position_std=[0.04] * 3, joint_velocity_std=[0.22] * 3,
        foot_slide_std=[0.003] * 3, foot_swing_std=[1e7] * 3,
        vo_p_std=[1.5e-5] * 3,
        p_init_std=[0.001] * 3, v_init_std=[0.001] * 3,
        accel_bias_init_std=[0.0001] * 3,
    )


@pytest.fixture(scope="module")
def log():
    return synth.generate(synth.SynthConfig(T=80, seed=4))


def test_tridiag_matches_dense():
    rng = np.random.default_rng(0)
    K, s = 12, 5
    D = np.zeros((K, s, s))
    U = rng.standard_normal((K - 1, s, s)) * 0.3
    for j in range(K):
        M = rng.standard_normal((s, s))
        D[j] = M @ M.T + 3 * np.eye(s)
    r = rng.standard_normal((K, s))
    x = np.asarray(tridiag.solve(jnp.asarray(D), jnp.asarray(U), jnp.asarray(r)))
    x_ref = np.asarray(
        tridiag.solve_dense_check(jnp.asarray(D), jnp.asarray(U), jnp.asarray(r))
    )
    np.testing.assert_allclose(x, x_ref, atol=1e-9)


def test_tridiag_masked_warmup():
    rng = np.random.default_rng(1)
    K, s, live = 8, 4, 5
    D = np.zeros((K, s, s))
    for j in range(K):
        M = rng.standard_normal((s, s))
        D[j] = M @ M.T + 2 * np.eye(s)
    U = rng.standard_normal((K - 1, s, s)) * 0.2
    r = rng.standard_normal((K, s))
    valid = np.arange(K) >= K - live
    x = np.asarray(
        tridiag.solve(jnp.asarray(D), jnp.asarray(U), jnp.asarray(r),
                      valid=jnp.asarray(valid))
    )
    # dead slots exactly zero
    np.testing.assert_allclose(x[: K - live], 0.0, atol=0)
    # live block equals the dense solve of the live subsystem
    Dl, Ul, rl = D[K - live:], U[K - live:], r[K - live:]
    x_ref = np.asarray(
        tridiag.solve_dense_check(jnp.asarray(Dl), jnp.asarray(Ul), jnp.asarray(rl))
    )
    np.testing.assert_allclose(x[K - live:], x_ref, atol=1e-10)


@pytest.mark.parametrize("with_vo", [False, True])
def test_mhe_matches_dense_oracle(go1_params, log, with_vo):
    """Windowed+marginalized engine == full-history exact solve, warmup
    through steady state, with and without VO fusion."""
    T = 80
    data = estimator.tickdata_from_log(log)
    vo = estimator.vodata_from_log(log) if with_vo else None
    x_seq, _ = estimator.run_mhe(go1_params, data, vo=vo)
    x_ref = run_oracle(go1_params, log, T, with_vo=with_vo)
    np.testing.assert_allclose(
        np.asarray(x_seq), x_ref, atol=5e-7,
        err_msg=f"with_vo={with_vo}",
    )


def test_mhe_cassie_position_form_matches_oracle():
    p = EstimatorParams(
        num_legs=2, leg_odom_type=1, rate=200, N=10,
        p_process_std=[0.001] * 3, accel_input_std=[0.025, 0.025, 0.02],
        joint_position_std=[0.02] * 3, foot_slide_std=[0.003] * 3,
        foot_swing_std=[1e4] * 3, vo_p_std=[1.5e-5] * 3,
    )
    log2 = synth.generate(synth.SynthConfig(T=40, num_legs=2, gait_hz=1.6, seed=5))
    data = estimator.tickdata_from_log(log2)
    vo = estimator.vodata_from_log(log2)
    x_seq, _ = estimator.run_mhe(p, data, vo=vo)
    x_ref = run_oracle(p, log2, 40, with_vo=True)
    np.testing.assert_allclose(np.asarray(x_seq), x_ref, atol=5e-7)


def test_mhe_tracks_velocity(go1_params):
    biglog = synth.generate(synth.SynthConfig(T=400, seed=6))
    data = estimator.tickdata_from_log(biglog)
    vo = estimator.vodata_from_log(biglog)
    x_seq, _ = estimator.run_mhe(go1_params, data, vo=vo)
    v_est = np.asarray(x_seq[:, 3:6])
    rmse = np.sqrt(((v_est[100:] - biglog.gt_v_s[100:]) ** 2).mean())
    assert rmse < 0.06, f"MHE velocity RMSE {rmse}"


def test_mhe_vs_kf_agreement(go1_params):
    """MHE and KF on the same log should broadly agree (same models)."""
    biglog = synth.generate(synth.SynthConfig(T=300, seed=7))
    data = estimator.tickdata_from_log(biglog)
    x_mhe, _ = estimator.run_mhe(go1_params, data)
    x_kf, _ = estimator.run_kf(go1_params, data)
    dv = np.abs(np.asarray(x_mhe[50:, 3:6]) - np.asarray(x_kf[50:, 3:6]))
    assert dv.mean() < 0.05, f"MHE/KF velocity disagreement {dv.mean()}"


def test_mhe_vmap_batch(go1_params, log):
    data = estimator.tickdata_from_log(log)
    single, _ = estimator.run_mhe(go1_params, data)
    B = 3
    datas = jax.tree.map(lambda a: jnp.stack([a] * B), data)
    batched, _ = jax.vmap(lambda d: estimator.run_mhe(go1_params, d))(datas)
    for b in range(B):
        np.testing.assert_allclose(np.asarray(batched[b]), np.asarray(single), atol=1e-9)
