"""Compare fused standard-layout vs lanes-layout fleet runners on the chip.

Run from repo root: python tools/bench_lanes.py [B ...]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
jax.config.update("jax_compilation_cache_dir", "/root/.jax_bench_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np

from decentralized_ekf_mhe_tpu.config import EstimatorParams
from decentralized_ekf_mhe_tpu.io import synth
from decentralized_ekf_mhe_tpu.ops import estimator
from decentralized_ekf_mhe_tpu.parallel import batch as batch_lib


def main():
    dtype = jnp.float32
    params = EstimatorParams(num_legs=4, leg_odom_type=0, rate=200, N=20)
    T = 200
    log = synth.generate(synth.SynthConfig(T=T, seed=0))
    data = estimator.tickdata_from_log(log, dtype=dtype)
    vo = estimator.vodata_from_log(log, dtype=dtype)
    key = jax.random.PRNGKey(0)

    Bs = [int(a) for a in sys.argv[1:]] or [1024]
    for B in Bs:
        data_b = batch_lib.to_time_leading(
            batch_lib.perturb_log_batch(data, B, key, dtype=dtype))
        for name, maker in [
            ("lanes", batch_lib.make_lanes_fleet_runner),
            ("std  ", batch_lib.make_fused_batched_runner),
        ]:
            runner = jax.jit(maker(params, dtype, use_pallas=True))
            t0 = time.time()
            x, v = runner(data_b, vo)
            float(jnp.sum(x[-1]))
            tc = time.time() - t0
            walls = []
            for rep in range(3):
                db = data_b._replace(accel_b=data_b.accel_b + (rep + 1) * 1e-7)
                t0 = time.time()
                x, v = runner(db, vo)
                float(jnp.sum(x[-1]))
                walls.append(time.time() - t0)
            wall = min(walls)
            rate = B * (T - 1) / wall
            v_est = np.asarray(x[..., 3:6], np.float64)
            rmse = float(np.sqrt(((v_est[100:] - log.gt_v_s[100:, None]) ** 2).mean()))
            print(f"{name} B={B:6d} compile={tc:5.1f}s wall={wall:.3f}s "
                  f"rate={rate/1e3:9.1f}k/s rmse={rmse:.4f}")


if __name__ == "__main__":
    main()
