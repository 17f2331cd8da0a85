"""End-to-end KF slice: assembly + KF scan vs numpy oracle + accuracy."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from decentralized_ekf_mhe_tpu.config import EKFParams, EstimatorParams
from decentralized_ekf_mhe_tpu.io import synth
from decentralized_ekf_mhe_tpu.ops import assembly, estimator
from tests.ref_impl.kf_ref import G_S, RefAssembly, RefKF


@pytest.fixture(scope="module")
def go1_log():
    cfg = synth.SynthConfig(T=400, seed=1)
    return synth.generate(cfg)


@pytest.fixture(scope="module")
def go1_params():
    return EstimatorParams(
        num_legs=4, leg_odom_type=0, rate=200, N=20,
        p_process_std=[0.001] * 3, accel_input_std=[0.025, 0.025, 0.02],
        gyro_input_std=[0.03] * 3, accel_bias_std=[0.07, 0.02, 0.03],
        joint_position_std=[0.04] * 3, joint_velocity_std=[0.22] * 3,
        foot_slide_std=[0.003] * 3, foot_swing_std=[1e7] * 3,
        vo_p_std=[1.5e-5] * 3,
    )


def test_assembly_matches_oracle(go1_log, go1_params):
    p = go1_params
    nc = assembly.make_noise_consts(p, jnp.float64)
    ref = RefAssembly(p)
    k = 37
    R = go1_log.R_sb_gt[k]
    accel_s = R @ go1_log.accel_b[k] + G_S

    A, b, C, Q = assembly.build_dynamics(
        p, nc, jnp.asarray(R), jnp.asarray(accel_s), jnp.asarray(go1_log.contact[k])
    )
    A_r, b_r, C_r, Q_r = ref.dynamics(R, accel_s, go1_log.contact[k])
    np.testing.assert_allclose(np.asarray(A), A_r, atol=1e-12)
    np.testing.assert_allclose(np.asarray(b), b_r, atol=1e-12)
    np.testing.assert_allclose(np.asarray(C), C_r, atol=1e-12)
    np.testing.assert_allclose(np.asarray(Q), Q_r, atol=1e-6)

    bm, Cm, Qm = assembly.build_measurement(
        p, nc, jnp.asarray(R), jnp.asarray(go1_log.omega_b[k]),
        jnp.asarray(go1_log.p_foot[k]), jnp.asarray(go1_log.J_foot[k]),
        jnp.asarray(go1_log.dq[k]), jnp.asarray(go1_log.contact[k]),
    )
    bm_r, Cm_r, Qm_r = ref.measurement(
        R, go1_log.omega_b[k], go1_log.p_foot[k], go1_log.J_foot[k],
        go1_log.dq[k], go1_log.contact[k],
    )
    np.testing.assert_allclose(np.asarray(bm), bm_r, atol=1e-12)
    np.testing.assert_allclose(np.asarray(Cm), Cm_r, atol=1e-12)
    np.testing.assert_allclose(np.asarray(Qm), Qm_r, atol=1e-7)

    np.testing.assert_allclose(
        np.asarray(assembly.a_meas(p, jnp.float64)), ref.a_meas(), atol=0
    )


def _run_oracle_kf(p, log, T):
    ref = RefKF(p)
    xs = []
    for k in range(T):
        R = log.R_sb_gt[k]
        if k == 0:
            ref.init(R, log.omega_b[k], log.p_foot[k], log.J_foot[k],
                     log.dq[k], log.contact[k])
            ref.push(R, log.accel_b[k], log.contact[k])
        else:
            ref.update(R, log.accel_b[k], log.omega_b[k], log.p_foot[k],
                       log.J_foot[k], log.dq[k], log.contact[k])
        xs.append(ref.x.copy())
    return np.stack(xs)


def test_kf_scan_matches_oracle(go1_log, go1_params):
    T = 150
    log = go1_log
    data = estimator.tickdata_from_log(log)
    data = jax.tree.map(lambda a: a[:T], data)
    x_seq, _ = estimator.run_kf(go1_params, data)
    x_ref = _run_oracle_kf(go1_params, log, T)
    np.testing.assert_allclose(np.asarray(x_seq), x_ref, atol=1e-8)


def test_kf_tracks_velocity(go1_log, go1_params):
    data = estimator.tickdata_from_log(go1_log)
    x_seq, _ = estimator.run_kf(go1_params, data)
    v_est = np.asarray(x_seq[:, 3:6])
    v_gt = go1_log.gt_v_s
    rmse = np.sqrt(((v_est[100:] - v_gt[100:]) ** 2).mean())
    assert rmse < 0.06, f"KF velocity RMSE {rmse}"


def test_kf_cassie_position_form():
    """leg_odom_type=1 (foot positions in state) end-to-end."""
    p = EstimatorParams(
        num_legs=2, leg_odom_type=1, rate=200, N=20,
        p_process_std=[0.001] * 3, accel_input_std=[0.025, 0.025, 0.02],
        joint_position_std=[0.02] * 3, foot_slide_std=[0.003] * 3,
        foot_swing_std=[1e4] * 3,
    )
    cfg = synth.SynthConfig(T=300, num_legs=2, gait_hz=1.6, seed=2)
    log = synth.generate(cfg)
    data = estimator.tickdata_from_log(log)
    x_seq, _ = estimator.run_kf(p, data)
    assert x_seq.shape == (300, 15)
    x_ref = _run_oracle_kf(p, log, 120)
    np.testing.assert_allclose(np.asarray(x_seq[:120]), x_ref, atol=1e-8)
    v_rmse = np.sqrt(((np.asarray(x_seq[:, 3:6])[100:] - log.gt_v_s[100:]) ** 2).mean())
    assert v_rmse < 0.12, f"Cassie KF velocity RMSE {v_rmse}"


def test_ekf_orientation_feed(go1_log):
    """EKF-fused orientation drives the KF instead of GT (full decentralized
    pipeline: orien_est -> est_sub handoff)."""
    ekf_params = EKFParams(
        process_std=[0.1] * 3, gravity_meas_std=[4.0] * 3,
        vo_meas_std=[1e-4] * 4,
    )
    R_seq, q_seq = estimator.ekf_orientation_sequence(ekf_params, go1_log)
    assert R_seq.shape == (go1_log.accel_b.shape[0], 3, 3)
    # fused orientation should stay close to GT (VO corrections bound drift)
    dots = np.abs(np.sum(np.asarray(q_seq) * go1_log.q_gt, axis=-1)).clip(max=1.0)
    ang = 2 * np.arccos(dots)
    assert np.median(ang) < 0.1, f"median attitude error {np.median(ang)}"
