"""Mega-kernel (pallas/mhe_replay_kernel.py) equivalence vs the scanned
lanes path, in Pallas interpret mode on CPU.

The kernel fuses the complete per-tick MHE pipeline (VO ingestion +
marginalization + assembly + window solve — the loop of MheSrb.cpp:351-713 /
DecentralEst.cpp:353-585) into one pallas_call per chunk of ticks; these
tests pin it to ops/mhe_lanes semantics:

- float64: exact agreement with estimator.run_mhe_lanes (<1e-8), VO on/off,
  leg_odom_type 0/1, warmup through steady state, across chunk boundaries
  (the Bezier scalar carry crosses pallas_call invocations).
- float32: op-reordering roundoff compounds through the recursive
  arrival-cost marginalization, so pointwise agreement with the scanned f32
  path is loose; what matters for production is that the kernel's f32 output
  stays as close to the float64 oracle as the scanned f32 path does — the
  velocity-RMSE-delta gate (<1e-3, the BASELINE.md accuracy north star).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from decentralized_ekf_mhe_tpu.config import EstimatorParams
from decentralized_ekf_mhe_tpu.io import synth
from decentralized_ekf_mhe_tpu.ops import estimator, mhe
from decentralized_ekf_mhe_tpu.parallel import batch as batch_lib
from decentralized_ekf_mhe_tpu.pallas import mhe_replay_kernel as mrk

B = 128  # one lane tile — the kernel's minimum fleet width


def _fleet(T, B, seed, dtype, log=None):
    log = log if log is not None else synth.generate(synth.SynthConfig(T=T, seed=seed))
    data = estimator.tickdata_from_log(log, dtype=dtype)
    vo = estimator.vodata_from_log(log, dtype=dtype)
    key = jax.random.PRNGKey(seed)
    data_b = batch_lib.to_time_leading(
        batch_lib.perturb_log_batch(data, B, key, dtype=dtype))
    return log, data_b, vo


@pytest.mark.parametrize("lot", [0, 1])
def test_megakernel_matches_lanes_f64(lot):
    """Exact f64 equivalence incl. VO, marginalization, and a chunk boundary
    (chunk=7 < T-1 so the Bezier carry crosses pallas_call invocations)."""
    dtype = jnp.float64
    p = EstimatorParams(num_legs=4, leg_odom_type=lot, rate=200, N=6)
    log, data_b, vo = _fleet(T=20, B=B, seed=7, dtype=dtype)
    c = mhe.make_consts(p, dtype)
    data_l = batch_lib.tickdata_to_lanes(data_b)

    x_ref, _ = estimator.run_mhe_lanes(p, data_l, vo=vo, dtype=dtype, consts=c)
    x_mk = mrk.replay(c, data_l, vo, dtype=dtype, chunk=7, interpret=True)
    x_mk = jnp.moveaxis(x_mk, -1, 1)  # (T,s,B) -> (T,B,s)
    np.testing.assert_allclose(np.asarray(x_mk), np.asarray(x_ref),
                               rtol=1e-8, atol=1e-8)


def test_megakernel_no_vo_f64():
    dtype = jnp.float64
    p = EstimatorParams(num_legs=4, leg_odom_type=0, rate=200, N=5)
    log, data_b, _ = _fleet(T=14, B=B, seed=3, dtype=dtype)
    c = mhe.make_consts(p, dtype)
    data_l = batch_lib.tickdata_to_lanes(data_b)
    T = data_l.accel_b.shape[0]
    vo_off = estimator.VOData(
        active=jnp.zeros(T, bool), dp_body=jnp.zeros((T, 3), dtype),
        tick_pre=jnp.zeros(T, jnp.int32), tick_now=jnp.zeros(T, jnp.int32))

    x_ref, _ = estimator.run_mhe_lanes(p, data_l, vo=vo_off, dtype=dtype, consts=c)
    x_mk = mrk.replay(c, data_l, vo_off, dtype=dtype, chunk=64, interpret=True)
    np.testing.assert_allclose(np.asarray(jnp.moveaxis(x_mk, -1, 1)),
                               np.asarray(x_ref), rtol=1e-8, atol=1e-8)


def test_megakernel_runner_wiring():
    """make_lanes_fleet_runner(use_megakernel=True) returns the same (x, v)
    layout as the scanned runner (f64 exact, interpret via monkeypatch-free
    direct call)."""
    dtype = jnp.float64
    p = EstimatorParams(num_legs=4, leg_odom_type=0, rate=200, N=6)
    log, data_b, vo = _fleet(T=16, B=B, seed=11, dtype=dtype)

    # scanned runner (no pallas on CPU)
    run_scan = batch_lib.make_lanes_fleet_runner(p, dtype, use_pallas=False)
    x_ref, v_ref = run_scan(data_b, vo)

    # megakernel runner body, interpret mode (the runner itself defaults to
    # compiled mode; replicate its v computation through the public helper)
    from decentralized_ekf_mhe_tpu.ops import kf as kf_ops, lanes
    c = mhe.make_consts(p, dtype)
    data_l = batch_lib.tickdata_to_lanes(data_b)
    x = mrk.replay(c, data_l, vo, dtype=dtype, chunk=64, interpret=True)
    lever = jnp.asarray(kf_ops.DEFAULT_LEVER_ARM, dtype)
    lever_l = jnp.broadcast_to(lever[:, None], (3, B))
    v = lanes.mv(data_l.R_sb, x[:, 3:6] + lanes.cross(data_l.omega_b, lever_l))
    np.testing.assert_allclose(np.asarray(jnp.moveaxis(x, -1, 1)),
                               np.asarray(x_ref), rtol=1e-8, atol=1e-8)
    np.testing.assert_allclose(np.asarray(jnp.moveaxis(v, -1, 1)),
                               np.asarray(v_ref), rtol=1e-8, atol=1e-8)


def test_megakernel_f32_accuracy_gate():
    """f32 kernel output vs the f64 oracle: the velocity-RMSE delta must stay
    under the 1e-3 north star (BASELINE.md), and the kernel must not be
    farther from the oracle than the scanned f32 path by more than the same
    budget. Documents the expected f32 behavior (ADVICE r2): pointwise drift
    vs the scanned f32 path is NOT asserted tight — roundoff compounds
    through the recursive marginalization."""
    T = 48
    p = EstimatorParams(num_legs=4, leg_odom_type=0, rate=200, N=6)
    log = synth.generate(synth.SynthConfig(T=T, seed=5))

    # single-trajectory fleet (all lanes identical) so the f64 oracle is
    # directly comparable lane-by-lane
    def fleet(dtype):
        data = estimator.tickdata_from_log(log, dtype=dtype)
        vo = estimator.vodata_from_log(log, dtype=dtype)
        data_b = jax.tree.map(
            lambda a: jnp.broadcast_to(a[:, None], (a.shape[0], B) + a.shape[1:]),
            data)
        return data_b, vo

    data64, vo64 = fleet(jnp.float64)
    x64, v64 = estimator.run_mhe(
        p, jax.tree.map(lambda a: a[:, 0], data64), vo=vo64, dtype=jnp.float64)

    data32, vo32 = fleet(jnp.float32)
    c32 = mhe.make_consts(p, jnp.float32)
    data_l32 = batch_lib.tickdata_to_lanes(data32)
    x_scan32, _ = estimator.run_mhe_lanes(p, data_l32, vo=vo32,
                                          dtype=jnp.float32, consts=c32)
    x_mk32 = jnp.moveaxis(
        mrk.replay(c32, data_l32, vo32, dtype=jnp.float32, chunk=16,
                   interpret=True), -1, 1)

    gt = log.gt_v_s
    skip = T // 3

    def vrmse(x):
        return float(np.sqrt(((np.asarray(x, np.float64)[skip:, 3:6]
                               - gt[skip:]) ** 2).mean()))

    r64 = vrmse(x64)
    r_scan = vrmse(x_scan32[:, 0])
    r_mk = vrmse(x_mk32[:, 0])
    dev_scan = float(np.abs(np.asarray(x_scan32[:, 0], np.float64)
                            - np.asarray(x64)).max())
    dev_mk = float(np.abs(np.asarray(x_mk32[:, 0], np.float64)
                          - np.asarray(x64)).max())
    # the production accuracy gate
    assert abs(r_scan - r64) < 1e-3, (r_scan, r64)
    assert abs(r_mk - r64) < 1e-3, (r_mk, r64)
    # and the f32 paths must remain pointwise sane vs the oracle
    assert dev_scan < 5e-2, dev_scan
    assert dev_mk < 5e-2, dev_mk


def test_megakernel_constrained_matches_lanes_f64():
    """CONSTRAINED mega-kernel (in-VMEM per-tick box-ADMM + ring-carried
    warm starts) reproduces the scanned constrained lanes path exactly at
    f64 across chunk boundaries (VERDICT r04 #1), and the box binds."""
    dtype = jnp.float64
    p = EstimatorParams(num_legs=4, leg_odom_type=0, rate=200, N=6,
                        foot_swing_std=[1e7] * 3)
    p.osqp.abs_tol = 1e-8
    p.osqp.relative_tol = 1e-8
    log, data_b, vo = _fleet(T=24, B=B, seed=9, dtype=dtype)
    s = p.dim_state
    vb = 0.08
    x_lb = np.full(s, -np.inf); x_lb[3:6] = -vb
    x_ub = np.full(s, np.inf); x_ub[3:6] = vb
    c = mhe.make_consts(p, dtype, x_lb=x_lb, x_ub=x_ub, admm_iters=40)
    data_l = batch_lib.tickdata_to_lanes(data_b)

    x_ref, _ = estimator.run_mhe_lanes(p, data_l, vo=vo, dtype=dtype,
                                       consts=c)
    x_mk = mrk.replay(c, data_l, vo, dtype=dtype, chunk=7, interpret=True)
    x_mk = jnp.moveaxis(x_mk, -1, 1)
    np.testing.assert_allclose(np.asarray(x_mk), np.asarray(x_ref),
                               rtol=1e-8, atol=1e-8)
    v = np.asarray(x_mk[..., 3:6])
    assert (np.abs(v) <= vb + 1e-6).all(), "box violated"
    assert (np.abs(v) >= vb - 1e-6).any(), "box never active"


def test_megakernel_constrained_per_lane_bounds_f64():
    """(s,B) per-lane bounds through the constrained mega-kernel: lane b's
    trajectory equals the shared-bounds kernel run with lane b's box
    (VERDICT r04 #5 — the fleet tuning-sweep story)."""
    dtype = jnp.float64
    p = EstimatorParams(num_legs=4, leg_odom_type=0, rate=200, N=5,
                        foot_swing_std=[1e7] * 3)
    p.osqp.abs_tol = 1e-8
    p.osqp.relative_tol = 1e-8
    T = 16
    log = synth.generate(synth.SynthConfig(T=T, seed=13))
    data = estimator.tickdata_from_log(log, dtype=dtype)
    vo = estimator.vodata_from_log(log, dtype=dtype)
    # identical trajectories across the fleet; only the box differs per lane
    data_b = jax.tree.map(
        lambda a: jnp.broadcast_to(a[:, None], (a.shape[0], B) + a.shape[1:]),
        data)
    data_l = batch_lib.tickdata_to_lanes(data_b)
    s = p.dim_state
    bnds = np.linspace(0.05, 0.12, B)
    lb_B = np.full((s, B), -np.inf); ub_B = np.full((s, B), np.inf)
    lb_B[3:6] = -bnds; ub_B[3:6] = bnds
    c_pl = mhe.make_consts(p, dtype, x_lb=lb_B, x_ub=ub_B, admm_iters=40)
    x_pl = jnp.moveaxis(
        mrk.replay(c_pl, data_l, vo, dtype=dtype, chunk=6, interpret=True),
        -1, 1)                                             # (T,B,s)
    for b in (0, B // 2, B - 1):
        lb1 = np.full(s, -np.inf); ub1 = np.full(s, np.inf)
        lb1[3:6] = -bnds[b]; ub1[3:6] = bnds[b]
        c1 = mhe.make_consts(p, dtype, x_lb=lb1, x_ub=ub1, admm_iters=40)
        x1 = jnp.moveaxis(
            mrk.replay(c1, data_l, vo, dtype=dtype, chunk=6,
                       interpret=True), -1, 1)
        np.testing.assert_allclose(np.asarray(x_pl[:, b]),
                                   np.asarray(x1[:, b]),
                                   rtol=1e-9, atol=1e-10)
        assert (np.abs(np.asarray(x_pl[:, b, 3:6])) <= bnds[b] + 1e-6).all()
    # tightest lane's box binds; loosest lane's solution exceeds it
    assert (np.abs(np.asarray(x_pl[:, 0, 3:6])) >= bnds[0] - 1e-6).any()
    assert (np.abs(np.asarray(x_pl[:, B - 1, 3:6])) > bnds[0]).any()


def test_megakernel_constrained_per_instance_vo_f64():
    """Constrained mega-kernel COMPOSED with fully per-instance VO clocks
    (each lane its own camera schedule AND the box-ADMM tail) equals the
    scanned per-instance constrained lanes path at f64."""
    dtype = jnp.float64
    p = EstimatorParams(num_legs=4, leg_odom_type=0, rate=200, N=5,
                        foot_swing_std=[1e7] * 3)
    p.osqp.abs_tol = 1e-8
    p.osqp.relative_tol = 1e-8
    log, data_b, vo = _fleet(T=18, B=B, seed=21, dtype=dtype)
    vo_pi = batch_lib.perturb_vo_batch(vo, B, jax.random.PRNGKey(3), p,
                                       dtype=dtype, per_instance_timing=True)
    s = p.dim_state
    vb = 0.08
    x_lb = np.full(s, -np.inf); x_lb[3:6] = -vb
    x_ub = np.full(s, np.inf); x_ub[3:6] = vb
    c = mhe.make_consts(p, dtype, x_lb=x_lb, x_ub=x_ub, admm_iters=30)
    data_l = batch_lib.tickdata_to_lanes(data_b)

    x_ref, _ = estimator.run_mhe_lanes(p, data_l, vo=vo_pi, dtype=dtype,
                                       consts=c)
    x_mk = jnp.moveaxis(
        mrk.replay(c, data_l, vo_pi, dtype=dtype, chunk=5, interpret=True),
        -1, 1)
    np.testing.assert_allclose(np.asarray(x_mk), np.asarray(x_ref),
                               rtol=1e-8, atol=1e-8)
    v = np.abs(np.asarray(x_mk[..., 3:6]))
    assert (v <= vb + 1e-6).all() and (v >= vb - 1e-6).any()


def test_megakernel_chol_solve_matches_gj_f64():
    """The mk_solve='chol' streaming-Schur variant (factor-and-substitute,
    kept selectable for future hardware) equals the default Gauss-Jordan
    chain at f64."""
    dtype = jnp.float64
    p = EstimatorParams(num_legs=4, leg_odom_type=0, rate=200, N=6)
    log, data_b, vo = _fleet(T=18, B=B, seed=23, dtype=dtype)
    c = mhe.make_consts(p, dtype)
    data_l = batch_lib.tickdata_to_lanes(data_b)
    x_gj = mrk.replay(c, data_l, vo, dtype=dtype, chunk=6, interpret=True,
                      mk_solve="gj")
    x_ch = mrk.replay(c, data_l, vo, dtype=dtype, chunk=6, interpret=True,
                      mk_solve="chol")
    np.testing.assert_allclose(np.asarray(x_ch), np.asarray(x_gj),
                               rtol=1e-9, atol=1e-10)
