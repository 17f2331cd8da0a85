"""IO subsystems: logger format, replay alignment, VO frontend geometry."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from decentralized_ekf_mhe_tpu.io import logger as log_io
from decentralized_ekf_mhe_tpu.io import replay, synth, vo_frontend
from decentralized_ekf_mhe_tpu.models import Go1Model


def test_logger_roundtrip(tmp_path):
    lg = log_io.DataLogger("unit", str(tmp_path))
    lg.add_channel("pose", "VectorXd", 3)
    lg.add_channel("tick", "int")
    lg.add_channel("quat", "Quaterniond")
    lg.add_channel("flags", "VectorXi", 2)
    rng = np.random.default_rng(0)
    poses = rng.standard_normal((5, 3))
    quats = rng.standard_normal((5, 4))
    for k in range(5):
        lg.log_tick({"pose": poses[k], "tick": np.array([k]),
                     "quat": quats[k], "flags": np.array([k, k + 1])})
    lg.close()
    out = log_io.read_log(str(tmp_path / "unit"))
    np.testing.assert_allclose(out["pose"], poses, atol=0)
    np.testing.assert_allclose(out["tick"][:, 0], np.arange(5), atol=0)
    np.testing.assert_allclose(out["quat"], quats, atol=0)
    np.testing.assert_allclose(out["flags"], [[k, k + 1] for k in range(5)], atol=0)


def test_logger_binary_layout(tmp_path):
    """Byte-level layout matches the reference: double->f8, int->f4 (the
    reference's int-as-float quirk), channels in registration order."""
    lg = log_io.DataLogger("layout", str(tmp_path))
    lg.add_channel("a", "double")
    lg.add_channel("b", "int")
    lg.add_channel("c", "VectorXd", 2)
    lg.log_tick({"a": np.array([1.5]), "b": np.array([7]),
                 "c": np.array([2.0, -3.0])})
    lg.close()
    raw = open(tmp_path / "layout_Data", "rb").read()
    assert len(raw) == 8 + 4 + 16
    assert np.frombuffer(raw[0:8], "<f8")[0] == 1.5
    assert np.frombuffer(raw[8:12], "<f4")[0] == 7.0
    np.testing.assert_array_equal(np.frombuffer(raw[12:28], "<f8"), [2.0, -3.0])
    schema = open(tmp_path / "layout_Name.csv").read()
    assert schema == "a,double,1,\nb,int,1,\nc,VectorXd,2,\n"


def test_logger_sequence(tmp_path):
    lg = log_io.DataLogger("seq", str(tmp_path))
    lg.add_channel("x", "VectorXd", 2)
    xs = np.arange(10.0).reshape(5, 2)
    lg.log_sequence({"x": xs})
    lg.close()
    out = log_io.read_log(str(tmp_path / "seq"))
    np.testing.assert_allclose(out["x"], xs, atol=0)


def _make_raw_from_synth(T=300, seed=3):
    """Build a RawLog with jittered timestamps from a synthetic trajectory;
    joint channels carry (dq-as-velocity, J=I) via a passthrough model."""
    cfg = synth.SynthConfig(T=T, seed=seed)
    log = synth.generate(cfg)
    dt = 1.0 / cfg.rate
    rng = np.random.default_rng(seed)
    t = np.arange(T) * dt + 1e-4 * rng.random(T)  # slight jitter, monotone
    ekf_t = np.arange(len(log.ekf_gyro)) / cfg.ekf_rate
    return log, replay.RawLog(
        imu_t=ekf_t, accel_b=log.ekf_accel, gyro_b=log.ekf_gyro,
        joint_t=t, joint_pos=np.zeros((T, 12)),
        joint_vel=log.dq.reshape(T, -1),
        foot_force=np.where(log.contact > 0, 200.0, 10.0),
        mocap_t=t, mocap_p=log.gt_p, mocap_v=log.gt_v_s, mocap_q=log.q_gt,
    )


def test_align_latest_value_and_contact():
    log, raw = _make_raw_from_synth()
    model = Go1Model(p_ib=(0.0, 0.0, 0.0))
    al = replay.align(raw, model, est_rate=200, ekf_rate=500)
    T = al.accel_b.shape[0]
    assert T > 250
    # contact recovered through the force threshold with latest-value
    # sampling of the jittered joint stream
    tick_t = raw.imu_t[0] + np.arange(T) / 200.0
    ji = replay.latest_index(raw.joint_t, tick_t)
    np.testing.assert_array_equal(al.contact, log.contact[ji])
    # IMU channels sampled latest-value from the 500 Hz stream
    k = 123
    tick_time = raw.imu_t[0] + k / 200.0
    imu_idx = np.searchsorted(raw.imu_t, tick_time, side="right") - 1
    np.testing.assert_allclose(al.accel_b[k], raw.accel_b[imu_idx], atol=0)
    # EKF substeps sum to the EKF stream length consumed
    assert al.ekf_substeps.sum() == len(al.ekf_gyro) or al.ekf_substeps.sum() <= len(raw.imu_t)


def test_upper_bound_sync_rules():
    ticks = np.array([0.0, 0.005, 0.010, 0.015])
    assert replay.upper_bound_sync(ticks, 0.007) == 1
    assert replay.upper_bound_sync(ticks, 0.005) == 1   # inclusive right side
    assert replay.upper_bound_sync(ticks, -0.1) == -1   # predates history
    assert replay.upper_bound_sync(ticks, 0.1) == 3


def test_align_vo_discard(recwarn):
    log, raw = _make_raw_from_synth()
    raw.vo_t_pre = np.array([-1.0, 0.05])
    raw.vo_t_now = np.array([0.03, 0.085])
    raw.vo_dp_body = np.array([[0.1, 0, 0], [0.2, 0, 0]])
    model = Go1Model(p_ib=(0.0, 0.0, 0.0))
    with pytest.warns(UserWarning, match="discarded 1 VO pairs"):
        al = replay.align(raw, model)
    assert al.vo_active.sum() == 1
    arrive = np.where(al.vo_active)[0][0]
    assert al.vo_tick_pre[arrive] == replay.upper_bound_sync(
        raw.imu_t[0] + np.arange(300) / 200.0, 0.05
    )


def test_vo_frontend_geometry():
    """Recovered relative body translation == ground-truth body motion."""
    rng = np.random.default_rng(5)
    # random smooth body trajectory
    n = 10
    from tests.ref_impl.ekf_ref import rot as quat_rot

    def rand_R(r):
        q = r.standard_normal(4)
        return quat_rot(q / np.linalg.norm(q))

    R_ic = rand_R(rng)
    p_ic = rng.standard_normal(3) * 0.1
    T_bc = np.eye(4)
    T_bc[:3, :3], T_bc[:3, 3] = R_ic, p_ic

    R_wb = [rand_R(rng) for _ in range(n)]
    p_wb = [rng.standard_normal(3) for _ in range(n)]
    R_cams, p_cams = [], []
    for R, p in zip(R_wb, p_wb):
        T_wb = np.eye(4)
        T_wb[:3, :3], T_wb[:3, 3] = R, p
        T_wc = T_wb @ T_bc
        # frontend expects the INVERSE camera pose (ORB-SLAM3 convention)
        T_inv = np.eye(4)
        T_inv[:3, :3] = T_wc[:3, :3].T
        T_inv[:3, 3] = -T_wc[:3, :3].T @ T_wc[:3, 3]
        R_cams.append(T_inv[:3, :3])
        p_cams.append(T_inv[:3, 3])

    fe = vo_frontend.StereoVOFrontend(R_ic, p_ic)
    t_pre, t_now, dps, qs, ps = fe.process_trajectory(
        R_cams, p_cams, np.arange(n) * 0.033
    )
    assert len(dps) == n - 1
    for k in range(n - 1):
        # ground truth: Δp in body_pre frame
        dp_gt = R_wb[k].T @ (p_wb[k + 1] - p_wb[k])
        np.testing.assert_allclose(dps[k], dp_gt, atol=1e-10)
        # world pose stream anchored at frame 0's body pose
        T0 = np.eye(4)
        T0[:3, :3], T0[:3, 3] = R_wb[0], p_wb[0]
        Tk = np.eye(4)
        Tk[:3, :3], Tk[:3, 3] = R_wb[k + 1], p_wb[k + 1]
        T_rel = np.linalg.inv(T0) @ Tk
        np.testing.assert_allclose(ps[k], T_rel[:3, 3], atol=1e-10)
        R_rec = quat_rot(qs[k])
        np.testing.assert_allclose(R_rec, T_rel[:3, :3], atol=1e-8)


def test_end_to_end_raw_pipeline():
    """RawLog → align → KF estimator: full replay path produces sane output."""
    from decentralized_ekf_mhe_tpu.config import EstimatorParams
    from decentralized_ekf_mhe_tpu.ops import estimator

    log, raw = _make_raw_from_synth(T=300, seed=9)
    model = Go1Model(p_ib=(0.0, 0.0, 0.0))
    al = replay.align(raw, model)
    # use the synthetic J=I / dq channels rather than FK on zero joints
    al.p_foot = log.p_foot[: al.accel_b.shape[0]]
    al.J_foot = log.J_foot[: al.accel_b.shape[0]]
    p = EstimatorParams(
        num_legs=4, leg_odom_type=0, rate=200, N=20,
        accel_input_std=[0.025, 0.025, 0.02], gyro_input_std=[0.03] * 3,
        joint_velocity_std=[0.22] * 3, foot_swing_std=[1e7] * 3,
    )
    data = estimator.tickdata_from_log(al)
    x, v = estimator.run_kf(p, data)
    Tn = al.accel_b.shape[0]
    rmse = np.sqrt(
        ((np.asarray(x[100:, 3:6]) - log.gt_v_s[100:Tn]) ** 2).mean()
    )
    assert rmse < 0.1, f"raw-pipeline KF RMSE {rmse}"


def test_vo_modalities_and_mono_scale():
    """RGBD frontend == stereo geometry; monocular applies metric scale."""
    rng = np.random.default_rng(11)
    from tests.ref_impl.ekf_ref import rot as quat_rot

    def rand_R(r):
        q = r.standard_normal(4)
        return quat_rot(q / np.linalg.norm(q))

    R_ic, p_ic = rand_R(rng), rng.standard_normal(3) * 0.05
    n = 6
    R_cams = [rand_R(rng) for _ in range(n)]
    p_cams = [rng.standard_normal(3) for _ in range(n)]
    stamps = np.arange(n) * 0.033

    st = vo_frontend.StereoVOFrontend(R_ic, p_ic).process_trajectory(
        R_cams, p_cams, stamps)
    rd = vo_frontend.RGBDVOFrontend(R_ic, p_ic).process_trajectory(
        R_cams, p_cams, stamps)
    for a, b in zip(st, rd):
        np.testing.assert_allclose(a, b, atol=1e-12)

    # monocular with up-to-scale input: scale=2 recovers the metric stream
    p_scaled = [p / 2.0 for p in p_cams]
    mono = vo_frontend.MonocularVOFrontend(R_ic, p_ic, scale=2.0)
    mo = mono.process_trajectory(R_cams, p_scaled, stamps)
    np.testing.assert_allclose(mo[2], st[2], atol=1e-10)   # dp_body metric
    np.testing.assert_allclose(mo[3], st[3], atol=1e-10)   # rotation scale-free


def test_approximate_time_sync():
    t_a = np.array([0.00, 0.10, 0.20, 0.30, 0.40])
    t_b = np.array([0.004, 0.102, 0.25, 0.399])
    ia, ib = vo_frontend.approximate_time_sync(t_a, t_b, max_dt=0.01)
    np.testing.assert_array_equal(ia, [0, 1, 4])   # 0.20/0.30 unmatched
    np.testing.assert_array_equal(ib, [0, 1, 3])
    # a B frame pairs with at most one A frame
    ia, ib = vo_frontend.approximate_time_sync(
        np.array([0.0, 0.001]), np.array([0.0005]), max_dt=0.01)
    assert len(ia) == 1 and len(ib) == 1


def test_sync_stereo_inertial_batches():
    """IMU batching matches the stereo-inertial queue-drain semantics."""
    t_imu = np.arange(0.0, 1.0, 0.002)          # 500 Hz
    t_left = np.array([0.10, 0.20, 0.30, 1.50])  # last frame outruns IMU
    t_right = t_left + 0.003                     # within maxTimeDiff
    il, ir, s, e = vo_frontend.sync_stereo_inertial(t_imu, t_left, t_right)
    np.testing.assert_array_equal(il, [0, 1, 2])
    np.testing.assert_array_equal(ir, [0, 1, 2])
    # every batched IMU stamp <= its frame's left stamp; slices contiguous
    assert s[0] == 0
    np.testing.assert_array_equal(s[1:], e[:-1])
    for k in range(3):
        assert (t_imu[s[k]:e[k]] <= t_left[il[k]] + 1e-12).all()
        if e[k] < len(t_imu):
            assert t_imu[e[k]] > t_left[il[k]]
