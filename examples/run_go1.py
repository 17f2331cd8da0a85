"""Go1 pipeline driver — the `ros2 launch go1_example go1_launch.py` analog.

Loads the reference's parameters_go1.yaml unchanged, replays a log (synthetic
by default; a recorded RawLog npz via --raw), runs the decentralized pipeline
(orientation EKF feeding the MHE or the KF baseline per estimation.est_type),
and writes a Data_Logger-compatible binary log with the same channels the
reference registers (EstSub.cpp:93-121: pose, GT_v, v_body, x_MHE,
p_vo_accmulate_, filter_euler_, gt_euler_).

Usage:
    python examples/run_go1.py [--yaml PATH] [--ticks N] [--est-type {0,1}]
                               [--gt-orientation] [--log-dir DIR] [--cpu]
"""

import argparse
import os
import sys

# allow running the example without installing the package
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--yaml", default="/root/reference/src/go1_example/config/parameters_go1.yaml")
    ap.add_argument("--ticks", type=int, default=1000)
    ap.add_argument("--est-type", type=int, default=None,
                    help="override estimation.est_type (0=MHE, 1=KF)")
    ap.add_argument("--gt-orientation", action="store_true",
                    help="feed ground-truth orientation instead of the EKF")
    ap.add_argument("--log-dir", default=None)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--cpu", action="store_true", help="force the CPU backend")
    args = ap.parse_args(argv)

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    import decentralized_ekf_mhe_tpu as dem
    from decentralized_ekf_mhe_tpu.io import logger as log_io
    from decentralized_ekf_mhe_tpu.io import synth
    from decentralized_ekf_mhe_tpu.ops import estimator
    from decentralized_ekf_mhe_tpu.utils import quaternion as quat
    from decentralized_ekf_mhe_tpu.utils.timing import scoped_timer

    est_params, ekf_params = dem.load_yaml_params(args.yaml)
    if args.est_type is not None:
        est_params.est_type = args.est_type
    print(f"config: rate={est_params.rate} N={est_params.N} "
          f"est_type={est_params.est_type} legs={est_params.num_legs}")

    cfg = synth.SynthConfig(T=args.ticks, rate=est_params.rate, seed=args.seed)
    log = synth.generate(cfg)
    dtype = jnp.float32

    timings = {}
    if args.gt_orientation:
        R_seq = log.R_sb_gt
        q_seq = log.q_gt
    else:
        with scoped_timer("orientation EKF", timings):
            R_seq, q_seq = estimator.ekf_orientation_sequence(
                ekf_params, log, dtype=dtype
            )
            R_seq = np.asarray(R_seq)

    data = estimator.tickdata_from_log(log, R_sb=np.asarray(R_seq), dtype=dtype)
    vo = estimator.vodata_from_log(log, dtype=dtype)

    with scoped_timer("estimator replay", timings):
        if est_params.est_type == 0:
            x_seq, v_seq = estimator.run_mhe(est_params, data, vo=vo, dtype=dtype)
        else:
            x_seq, v_seq = estimator.run_kf(est_params, data, dtype=dtype)
        x_seq = np.asarray(x_seq)
        v_seq = np.asarray(v_seq)

    T = x_seq.shape[0]
    rmse = float(np.sqrt(((x_seq[100:, 3:6] - log.gt_v_s[100:T]) ** 2).mean()))
    cycle_us = timings["estimator replay"] / T * 1e6
    print(f"velocity RMSE vs GT: {rmse:.4f} m/s over {T} ticks")
    print(f"replay wall: {timings['estimator replay']:.2f}s "
          f"({cycle_us:.1f} us/tick amortized incl. compile; realtime budget 5000 us)")

    # Data_Logger-compatible output (channel set of EstSub.cpp:96-120)
    gt_q = np.asarray(log.q_gt[:T])
    filter_euler = np.asarray(quat.to_euler(jnp.asarray(q_seq[:T])))
    gt_euler = np.asarray(quat.to_euler(jnp.asarray(gt_q)))
    gt_v_b = np.einsum(
        "tij,tj->ti", np.asarray(quat.to_rot(jnp.asarray(gt_q))), log.gt_v_s[:T]
    )
    lg = log_io.DataLogger(est_params.log_name, args.log_dir)
    s = est_params.dim_state
    for name, ln in [("pose", 3), ("GT_v", 3), ("v_body", 3), ("x_MHE", s),
                     ("p_vo_accmulate_", 3), ("filter_euler_", 3), ("gt_euler_", 3)]:
        lg.add_channel(name, "VectorXd", ln)
    lg.log_sequence({
        "pose": log.gt_p[:T], "GT_v": gt_v_b, "v_body": v_seq,
        "x_MHE": x_seq, "p_vo_accmulate_": np.zeros((T, 3)),
        "filter_euler_": filter_euler, "gt_euler_": gt_euler,
    })
    lg.close()
    print(f"wrote {lg._data_path} (+ _Name.csv)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
