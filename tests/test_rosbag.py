"""Real-data ingestion path: synth → RawLog → rosbag2/.npz round trips →
alignment pass → estimator, end to end.

Validates the C12 wire-format parity surface: CDR serialization of the
reference's topic set (sensor_msgs/Imu, JointState, VoRealtiveTransform with
dual stamps, PoseStamped, Mocap), the rosbag2 SQLite layout, the documented
RawLog npz schema, and that the alignment pass reproduces the synthetic VO
arrival schedule from raw timestamped streams (receive-time latency,
upper_bound sync, discard rules — DecentralEst.cpp:883-945)."""

import numpy as np
import pytest

from decentralized_ekf_mhe_tpu.io import replay as replay_io
from decentralized_ekf_mhe_tpu.io import rosbag as rosbag_io
from decentralized_ekf_mhe_tpu.io import synth
from decentralized_ekf_mhe_tpu.models.base import CartesianFeetModel

CFG = synth.SynthConfig(T=120, seed=3)


@pytest.fixture(scope="module")
def log():
    return synth.generate(CFG)


@pytest.fixture(scope="module")
def raw(log):
    return synth.rawlog_from_synth(log, CFG)


def test_align_reproduces_synth_schedule(log, raw):
    model = CartesianFeetModel(num_legs=CFG.num_legs)
    al = replay_io.align(raw, model, est_rate=CFG.rate, ekf_rate=CFG.ekf_rate,
                     t_end=CFG.T / CFG.rate)
    T = al.accel_b.shape[0]
    assert T == CFG.T

    # VO events: identical arrival ticks, sync indices and payloads
    np.testing.assert_array_equal(al.vo_active, log.vo_active)
    np.testing.assert_array_equal(al.vo_tick_pre, log.vo_tick_pre)
    np.testing.assert_array_equal(al.vo_tick_now, log.vo_tick_now)
    np.testing.assert_allclose(al.vo_dp_body, log.vo_dp_body, atol=1e-12)

    # leg odometry channels pass through the cartesian model exactly
    np.testing.assert_allclose(al.p_foot, log.p_foot, atol=1e-12)
    np.testing.assert_allclose(al.dq, log.dq, atol=1e-12)
    np.testing.assert_array_equal(al.contact, log.contact)
    np.testing.assert_allclose(al.J_foot, log.J_foot, atol=1e-12)

    # IMU channels are latest-value samples of the single EKF-rate stream
    bounds = np.concatenate([[0], np.cumsum(log.ekf_substeps)])
    idx = np.clip((np.arange(T) * CFG.ekf_rate) // CFG.rate, 0,
                  log.ekf_accel.shape[0] - 1)
    np.testing.assert_allclose(al.accel_b, log.ekf_accel[idx], atol=1e-12)
    np.testing.assert_allclose(al.ekf_gyro, log.ekf_gyro, atol=1e-12)

    # delayed EKF VO events survive with valid rewind distances
    assert al.ekf_vo_active.sum() == log.vo_active.sum()
    sb = al.ekf_vo_steps_back[al.ekf_vo_active]
    assert (sb >= 1).all() and (sb < 16).all()


def test_rosbag_roundtrip_exact(tmp_path, raw):
    # quantize stamps to the wire's nanosecond grid first: that is what any
    # real recording already is, and it makes the round trip bit-exact
    raw = rosbag_io.quantize_rawlog(raw)
    bag = str(tmp_path / "go1_bag")
    rosbag_io.write_rosbag(bag, raw)
    raw2 = rosbag_io.rawlog_from_rosbag(bag)
    np.testing.assert_array_equal(raw2.imu_t, raw.imu_t)
    np.testing.assert_allclose(raw2.accel_b, raw.accel_b, atol=0)
    np.testing.assert_allclose(raw2.gyro_b, raw.gyro_b, atol=0)
    np.testing.assert_allclose(raw2.joint_pos, raw.joint_pos, atol=0)
    np.testing.assert_allclose(raw2.joint_vel, raw.joint_vel, atol=0)
    np.testing.assert_allclose(raw2.foot_force, raw.foot_force, atol=0)
    np.testing.assert_array_equal(raw2.vo_t_pre, raw.vo_t_pre)
    np.testing.assert_array_equal(raw2.vo_t_now, raw.vo_t_now)
    np.testing.assert_allclose(raw2.vo_dp_body, raw.vo_dp_body, atol=0)
    np.testing.assert_array_equal(raw2.vo_t_recv, raw.vo_t_recv)
    np.testing.assert_allclose(raw2.vo_q_wb, raw.vo_q_wb, atol=1e-9)
    # mocap floats are float32 on the wire (Mocap.msg)
    np.testing.assert_allclose(raw2.mocap_p, raw.mocap_p, atol=1e-5)
    np.testing.assert_allclose(raw2.mocap_q, raw.mocap_q, atol=1e-6)

    # identical alignment output from the round-tripped bag
    model = CartesianFeetModel(num_legs=CFG.num_legs)
    a1 = replay_io.align(raw, model, est_rate=CFG.rate, ekf_rate=CFG.ekf_rate,
                     t_end=CFG.T / CFG.rate)
    a2 = replay_io.align(raw2, model, est_rate=CFG.rate, ekf_rate=CFG.ekf_rate,
                     t_end=CFG.T / CFG.rate)
    np.testing.assert_array_equal(a1.vo_active, a2.vo_active)
    np.testing.assert_array_equal(a1.vo_tick_pre, a2.vo_tick_pre)
    np.testing.assert_allclose(a1.accel_b, a2.accel_b, atol=0)
    np.testing.assert_allclose(a1.p_foot, a2.p_foot, atol=0)
    np.testing.assert_array_equal(a1.ekf_vo_active, a2.ekf_vo_active)
    np.testing.assert_array_equal(a1.ekf_vo_steps_back, a2.ekf_vo_steps_back)


def test_npz_roundtrip_exact(tmp_path, raw):
    p = str(tmp_path / "raw.npz")
    replay_io.save_rawlog(p, raw)
    raw2 = replay_io.load_rawlog(p)
    for f in raw.__dataclass_fields__:
        np.testing.assert_array_equal(
            np.asarray(getattr(raw, f)), np.asarray(getattr(raw2, f)),
            err_msg=f)


def test_estimator_on_raw_replay(log, raw):
    """Full chain: raw streams → align → EKF orientation → MHE; velocity
    RMSE vs the mocap ground truth must stay in the synthetic-log envelope."""
    import jax.numpy as jnp

    from decentralized_ekf_mhe_tpu.config import EKFParams, EstimatorParams
    from decentralized_ekf_mhe_tpu.ops import estimator

    model = CartesianFeetModel(num_legs=CFG.num_legs)
    al = replay_io.align(raw, model, est_rate=CFG.rate, ekf_rate=CFG.ekf_rate,
                     t_end=CFG.T / CFG.rate)
    p = EstimatorParams(
        num_legs=4, leg_odom_type=0, rate=200, N=10,
        p_process_std=[0.001] * 3, accel_input_std=[0.025, 0.025, 0.02],
        gyro_input_std=[0.03] * 3, accel_bias_std=[0.07, 0.02, 0.03],
        joint_position_std=[0.04] * 3, joint_velocity_std=[0.22] * 3,
        foot_slide_std=[0.003] * 3, foot_swing_std=[1e7] * 3,
        vo_p_std=[1.5e-5] * 3)
    R_seq, _ = estimator.ekf_orientation_sequence(EKFParams(), al)
    data = estimator.tickdata_from_log(al, R_sb=np.asarray(R_seq))
    vo = estimator.vodata_from_log(al)
    x, v = estimator.run_mhe(p, data, vo=vo)
    T = x.shape[0]
    err = np.asarray(x)[T // 2:, 3:6] - al.gt_v_s[T // 2:]
    rmse = float(np.sqrt((err ** 2).mean()))
    assert rmse < 0.15, rmse


def test_run_go1_raw_flag(tmp_path, raw):
    from conftest import run_example

    p = str(tmp_path / "raw.npz")
    replay_io.save_rawlog(p, raw)
    run_example("run_go1.py", "--raw", p, "--raw-model", "cartesian",
                "--ticks", "100", "--cpu", "--log-dir", str(tmp_path))
