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


# ---------------------------------------------------------------- goldens
# Hand-authored CDR byte fixtures, written field by field from the XCDR1
# spec with struct.pack — NOT via this package's CDRWriter — so the reader
# is validated against bytes it demonstrably did not produce (a shared
# misreading of XCDR1 alignment would fail here, not round-trip silently).

import struct


def _enc_le():
    # encapsulation: representation_identifier=0x0001 (CDR_LE, big-endian
    # bytes on the wire: 0x00 0x01), options=0x0000
    return b"\x00\x01\x00\x00"


def _hdr(sec, nsec, frame_id):
    # std_msgs/Header: stamp.sec (int32) @4, stamp.nanosec (uint32) @4,
    # frame_id string (uint32 length incl NUL, bytes, NUL)
    fid = frame_id.encode() + b"\x00"
    return struct.pack("<iI", sec, nsec) + struct.pack("<I", len(fid)) + fid


def _pad_to(buf: bytes, align: int) -> bytes:
    # XCDR1 alignment is relative to the start of the serialized payload
    # (i.e. AFTER the 4-byte encapsulation header)
    off = len(buf) - 4
    return buf + b"\x00" * ((-off) % align)


def test_golden_imu_bytes():
    """sensor_msgs/Imu: header('i') forces 2 bytes of pre-double padding —
    a reader that aligns relative to the buffer start (not payload start)
    or skips the frame_id NUL decodes garbage here."""
    buf = _enc_le() + _hdr(7, 500_000_000, "i")     # payload offset now 14
    buf = _pad_to(buf, 8)                            # 2 pad bytes -> 16
    q_xyzw = (0.1, -0.2, 0.3, 0.9)
    buf += struct.pack("<4d", *q_xyzw)
    buf += struct.pack("<9d", *range(9))             # orientation_covariance
    gyro = (0.01, -0.02, 0.03)
    buf += struct.pack("<3d", *gyro)
    buf += struct.pack("<9d", *range(9))             # angular_velocity_cov
    accel = (0.5, -9.8, 0.25)
    buf += struct.pack("<3d", *accel)
    buf += struct.pack("<9d", *range(9))             # linear_acceleration_cov

    t, a, g, q_wxyz = rosbag_io.parse_imu(buf)
    assert t == 7.5
    np.testing.assert_allclose(a, accel, atol=0)
    np.testing.assert_allclose(g, gyro, atol=0)
    np.testing.assert_allclose(q_wxyz, [0.9, 0.1, -0.2, 0.3], atol=0)


def test_golden_joint_state_bytes():
    """sensor_msgs/JointState: string sequence + three double sequences,
    each u32-length-prefixed, with 4-byte pads before sequence lengths and
    8-byte pads before double data."""
    buf = _enc_le() + _hdr(2, 250_000_000, "go1")
    buf = _pad_to(buf, 4)
    names = ["FR_0", "FR_1"]
    buf += struct.pack("<I", len(names))
    for n in names:
        b = n.encode() + b"\x00"
        buf = _pad_to(buf, 4) + struct.pack("<I", len(b)) + b
    pos = (0.25, -0.5)
    buf = _pad_to(buf, 4) + struct.pack("<I", 2)
    buf = _pad_to(buf, 8) + struct.pack("<2d", *pos)
    vel = (1.5, -2.5)
    buf = _pad_to(buf, 4) + struct.pack("<I", 2)
    buf = _pad_to(buf, 8) + struct.pack("<2d", *vel)
    eff = (10.0, 20.0)
    buf = _pad_to(buf, 4) + struct.pack("<I", 2)
    buf = _pad_to(buf, 8) + struct.pack("<2d", *eff)

    t, nm, p, v, e = rosbag_io.parse_joint_state(buf)
    assert t == 2.25
    assert nm == names
    np.testing.assert_allclose(p, pos, atol=0)
    np.testing.assert_allclose(v, vel, atol=0)
    np.testing.assert_allclose(e, eff, atol=0)


def test_golden_vo_relative_transform_bytes():
    """custom_msgs/VoRealtiveTransform: TWO headers (current + previous
    image stamp — the dual-timestamp sync driver) then x/y/z doubles."""
    buf = _enc_le() + _hdr(5, 0, "cam")              # header = now
    buf = _pad_to(buf, 4) + _hdr(4, 966_666_667, "cam")  # header_pre
    dp = (0.004, -0.002, 0.001)
    buf = _pad_to(buf, 8) + struct.pack("<3d", *dp)

    t_pre, t_now, d = rosbag_io.parse_vo_relative_transform(buf)
    assert t_now == 5.0
    assert abs(t_pre - 4.966666667) < 1e-12
    np.testing.assert_allclose(d, dp, atol=0)


def test_golden_pose_stamped_bytes():
    buf = _enc_le() + _hdr(3, 125_000_000, "map")
    p = (1.0, 2.0, 3.0)
    buf = _pad_to(buf, 8) + struct.pack("<3d", *p)
    q_xyzw = (0.0, 0.0, 0.7071067811865476, 0.7071067811865476)
    buf += struct.pack("<4d", *q_xyzw)

    t, pp, q_wxyz = rosbag_io.parse_pose_stamped(buf)
    assert t == 3.125
    np.testing.assert_allclose(pp, p, atol=0)
    np.testing.assert_allclose(
        q_wxyz, [q_xyzw[3], q_xyzw[0], q_xyzw[1], q_xyzw[2]], atol=0)


def test_golden_mocap_bytes():
    """optitrack_broadcast/Mocap: float32 triplets + wxyz float32 quat."""
    buf = _enc_le() + _hdr(1, 0, "world")
    p = (0.5, 1.5, 0.25)
    v = (0.125, -0.375, 0.0625)
    w = (0.75, -0.125, 0.5)
    q = (1.0, 0.0, 0.0, 0.0)
    buf = _pad_to(buf, 4) + struct.pack("<3f", *p) + struct.pack("<3f", *v)
    buf += struct.pack("<3f", *w) + struct.pack("<4f", *q)

    t, pp, vv, qq = rosbag_io.parse_mocap(buf)
    assert t == 1.0
    np.testing.assert_allclose(pp, p, atol=0)
    np.testing.assert_allclose(vv, v, atol=0)
    np.testing.assert_allclose(qq, q, atol=0)


def test_multifile_bag_with_metadata(tmp_path, raw):
    """A split bag (max_messages_per_file) + metadata.yaml reads back
    identically to the single-file bag; the metadata's relative_file_paths
    ordering is consumed (a decoy .db3 that is NOT listed is ignored)."""
    import sqlite3

    single = tmp_path / "bag_single"
    split = tmp_path / "bag_split"
    rosbag_io.write_rosbag(str(single), raw)
    rosbag_io.write_rosbag(str(split), raw, max_messages_per_file=97)

    db3s = sorted(f.name for f in split.iterdir() if f.suffix == ".db3")
    assert len(db3s) > 2                              # genuinely split
    assert (split / "metadata.yaml").exists()

    # decoy: an unlisted junk .db3 must be ignored via metadata.yaml
    con = sqlite3.connect(split / "zz_unlisted.db3")
    con.execute("CREATE TABLE topics (id INTEGER PRIMARY KEY, name TEXT, "
                "type TEXT, serialization_format TEXT, "
                "offered_qos_profiles TEXT)")
    con.execute("CREATE TABLE messages (id INTEGER PRIMARY KEY, "
                "topic_id INTEGER, timestamp INTEGER, data BLOB)")
    con.execute("INSERT INTO topics VALUES (1, '/unitree/imu', "
                "'sensor_msgs/msg/Imu', 'cdr', '')")
    con.execute("INSERT INTO messages (topic_id, timestamp, data) "
                "VALUES (1, 0, x'00010000')")
    con.commit(); con.close()

    r1 = rosbag_io.rawlog_from_rosbag(str(single))
    r2 = rosbag_io.rawlog_from_rosbag(str(split))
    for f in ("imu_t", "accel_b", "gyro_b", "joint_t", "joint_pos",
              "foot_force", "vo_t_pre", "vo_t_now", "vo_dp_body", "mocap_t",
              "mocap_p"):
        np.testing.assert_array_equal(getattr(r1, f), getattr(r2, f),
                                      err_msg=f)

    # per-topic counts in metadata.yaml match the actual stream
    import yaml
    info = yaml.safe_load((split / "metadata.yaml").read_text())
    bi = info["rosbag2_bagfile_information"]
    assert bi["message_count"] == sum(
        t["message_count"] for t in bi["topics_with_message_count"])
    assert bi["relative_file_paths"] == db3s[:len(bi["relative_file_paths"])]
    assert "zz_unlisted.db3" not in bi["relative_file_paths"]
