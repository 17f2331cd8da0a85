"""Component timing of the lanes-layout MHE tick on the chip."""
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
from decentralized_ekf_mhe_tpu.ops import estimator, mhe, mhe_lanes, assembly_lanes
from decentralized_ekf_mhe_tpu.parallel import batch as batch_lib

dtype = jnp.float32
params = EstimatorParams(num_legs=4, leg_odom_type=0, rate=200, N=20)
T, B = 40, 1024
log = synth.generate(synth.SynthConfig(T=T, seed=0))
data = estimator.tickdata_from_log(log, dtype=dtype)
key = jax.random.PRNGKey(0)
data_l = batch_lib.tickdata_to_lanes(batch_lib.to_time_leading(
    batch_lib.perturb_log_batch(data, B, key, dtype=dtype)))
c = mhe.make_consts(params, dtype, use_pallas=True)
R_seq = data_l.R_sb
p = mhe._params_view(c)

d0 = jax.tree.map(lambda a: a[0], data_l)
st0 = mhe_lanes.init(c, d0.R_sb, d0.accel_b, d0.omega_b, d0.p_foot,
                     d0.J_foot, d0.dq, d0.contact, dtype=dtype)

def full_step(st, d):
    st, (x, _) = mhe_lanes.step(c, st, d.R_sb, d.accel_b, d.omega_b, d.p_foot,
                                d.J_foot, d.dq, d.contact, False,
                                jnp.zeros(3, dtype), 0, 0, d.R_sb)
    return st, x

def scan_n(fn, st, n, skip=1):
    d_n = jax.tree.map(lambda a: a[skip:skip+n], data_l)
    return jax.lax.scan(fn, st, d_n)

warm = jax.jit(lambda s: scan_n(full_step, s, 25))
st25, _ = warm(st0)
jax.block_until_ready(st25)

def sync(o):
    leaf = jax.tree.leaves(o)[0]
    return float(jnp.sum(leaf.ravel()[0]))

def bench(name, fn, *args, reps=8):
    j = jax.jit(fn)
    out = j(*args); jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(reps):
        out = j(*args)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / reps
    print(f"{name:44s} {dt*1e3:8.3f} ms")
    return dt

n = 10
bench("full step x10 (scan), per-tick /10", lambda s: scan_n(full_step, s, n), st25)
bench("solve_window (pallas)", lambda s: mhe_lanes.solve_window(c, s), st25)
bench("assemble_normal_equations", lambda s: mhe_lanes.assemble_normal_equations(c, s), st25)
bench("_marginalize", lambda s: mhe_lanes._marginalize(c, s), st25)

# step without the solve
def step_nosolve(st, d):
    import decentralized_ekf_mhe_tpu.ops.mhe_lanes as M
    T_ = st.T + 1
    M_new, n_new = jax.lax.cond(T_ >= c.N, lambda: M._marginalize(c, st),
                                lambda: (st.M_p, st.n_p))
    A_d, b_d, Q_d = assembly_lanes.build_dynamics(p, c.nc, st.prev_R, st.prev_accel_s, st.prev_contact)
    from decentralized_ekf_mhe_tpu.ops import lanes as L
    Q_cam_new = L.mm_nt(L.mmc(st.prev_R, c.Q_vo_p), st.prev_R)
    y_T, Q_T = assembly_lanes.build_measurement(p, c.nc, d.R_sb, d.omega_b, d.p_foot, d.J_foot, d.dq, d.contact)
    N = c.N
    sh = M._shift_set
    st = st._replace(
        y_meas=sh(st.y_meas, {N-1: y_T}), Q_meas=sh(st.Q_meas, {N-1: Q_T}),
        A_dyn=sh(st.A_dyn, {N-2: A_d, N-1: jnp.zeros_like(A_d)}),
        b_dyn=sh(st.b_dyn, {N-2: b_d, N-1: jnp.zeros_like(b_d)}),
        Q_dyn=sh(st.Q_dyn, {N-2: Q_d, N-1: jnp.zeros_like(Q_d)}),
        Q_cam=sh(st.Q_cam, {N-2: Q_cam_new, N-1: jnp.zeros_like(Q_cam_new)}),
        M_p=M_new, n_p=n_new, T=T_,
        prev_R=d.R_sb, prev_accel_s=assembly_lanes.spatial_accel(d.R_sb, d.accel_b, c.nc),
        prev_contact=d.contact,
    )
    return st, st.T

bench("step-without-solve x10 (scan)", lambda s: scan_n(step_nosolve, s, n), st25)

# scan of solve only (state fixed)
def solve_only(st, d):
    x = mhe_lanes.solve_window(c, st)
    return st, x[0, 0]
bench("solve-only x10 (scan, fixed state)", lambda s: scan_n(solve_only, s, n), st25)

# assembly builders alone
bench("build_dynamics", lambda d: assembly_lanes.build_dynamics(p, c.nc, d.R_sb, d.accel_s if hasattr(d,'accel_s') else assembly_lanes.spatial_accel(d.R_sb, d.accel_b, c.nc), d.contact), d0)
bench("build_measurement", lambda d: assembly_lanes.build_measurement(p, c.nc, d.R_sb, d.omega_b, d.p_foot, d.J_foot, d.dq, d.contact), d0)
