"""Headline benchmark: MHE solves/s/chip at the 20-step Go1 horizon.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} where
vs_baseline is value / 50_000 (the BASELINE.md north-star target for
solves/s/chip). Supplementary numbers go to stderr.

A "solve" is one full MHE tick: window shift/append, masked VO handling,
arrival-cost marginalization, and the exact block-tridiagonal QP solve at
N=20, dim_state=9, dim_meas=12 — the same unit of work as one OSQP cycle in
the reference's 200 Hz loop (EstSub.cpp:58-91). The fleet is a Monte-Carlo
batch (BASELINE.json config 4) scanned fully on-device in float32; wall time
is measured over whole scans with block_until_ready, so per-call dispatch
overhead (large over the axon tunnel) is amortized to nothing.
"""

import json
import sys
import time

import numpy as np


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_bench_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from decentralized_ekf_mhe_tpu.config import EstimatorParams
    from decentralized_ekf_mhe_tpu.io import synth
    from decentralized_ekf_mhe_tpu.ops import estimator
    from decentralized_ekf_mhe_tpu.parallel import batch as batch_lib

    dev = jax.devices()[0]
    print(f"device: {dev}", file=sys.stderr)
    dtype = jnp.float32

    params = EstimatorParams(
        num_legs=4, leg_odom_type=0, rate=200, N=20,
        p_process_std=[0.001] * 3, accel_input_std=[0.025, 0.025, 0.02],
        gyro_input_std=[0.03] * 3, accel_bias_std=[0.07, 0.02, 0.03],
        joint_position_std=[0.04] * 3, joint_velocity_std=[0.22] * 3,
        foot_slide_std=[0.003] * 3, foot_swing_std=[1e7] * 3,
        vo_p_std=[1.5e-5] * 3,
    )

    T = 200
    B = int(__import__("os").environ.get("BENCH_B", "1024"))
    log = synth.generate(synth.SynthConfig(T=T, seed=0))
    data = estimator.tickdata_from_log(log, dtype=dtype)
    vo = estimator.vodata_from_log(log, dtype=dtype)
    key = jax.random.PRNGKey(0)
    data_b = batch_lib.to_time_leading(
        batch_lib.perturb_log_batch(data, B, key, dtype=dtype)
    )

    runner = jax.jit(batch_lib.make_lanes_fleet_runner(params, dtype,
                                                       use_pallas=True))

    def sync(val):
        # block_until_ready returns before execution completes on the axon
        # tunnel backend; a device->host scalar copy is the reliable fence.
        return float(jnp.sum(val[-1]))

    t0 = time.time()
    x, v = runner(data_b, vo)
    sync(x)
    compile_wall = time.time() - t0
    print(f"compile+first run: {compile_wall:.1f}s", file=sys.stderr)

    walls = []
    for rep in range(3):
        db = data_b._replace(accel_b=data_b.accel_b + (rep + 1) * 1e-7)
        t0 = time.time()
        x, v = runner(db, vo)
        sync(x)
        walls.append(time.time() - t0)
    wall = min(walls)
    solves = B * (T - 1)  # tick 0 is initialization, not a windowed solve
    rate = solves / wall
    print(f"B={B} T={T} wall={wall:.3f}s walls={['%.3f' % w for w in walls]}",
          file=sys.stderr)

    # supplementary: per-cycle latency of a real-time-sized fleet (one full
    # EKF+MHE tick, amortized over an on-device scan)
    cyc = wall / (T - 1)
    print(f"fleet cycle time: {cyc*1e3:.3f} ms for {B} instances "
          f"({cyc*1e3/B:.4f} ms/instance; reference budget 5 ms/instance)",
          file=sys.stderr)

    # sanity: estimates finite and accurate vs ground truth (x is (T, B, s))
    v_est = np.asarray(x[..., 3:6]).astype(np.float64)
    assert np.isfinite(v_est).all(), "non-finite estimates"
    rmse = float(np.sqrt(((v_est[100:] - log.gt_v_s[100:, None]) ** 2).mean()))
    print(f"fleet velocity RMSE vs GT: {rmse:.4f} m/s", file=sys.stderr)
    assert rmse < 0.1, f"accuracy regression: RMSE {rmse}"

    print(json.dumps({
        "metric": "mhe_solves_per_s_per_chip",
        "value": round(rate, 1),
        "unit": "solves/s (N=20 window, Go1 config, incl. VO+marginalization; lanes-layout Pallas window solve)",
        "vs_baseline": round(rate / 50_000.0, 3),
    }))


if __name__ == "__main__":
    main()
