"""Per-instance VO schedules on the lanes fast path: the fully masked
mhe_lanes.step_per_instance_vo must equal the vmapped standard runner
lane-by-lane at float64 — each lane gets a DIFFERENT VO schedule (shifted
timing, perturbed content, some lanes with no VO at all)."""

import jax
import jax.numpy as jnp
import numpy as np

from decentralized_ekf_mhe_tpu.config import EstimatorParams
from decentralized_ekf_mhe_tpu.io import synth
from decentralized_ekf_mhe_tpu.ops import estimator
from decentralized_ekf_mhe_tpu.parallel import batch as batch_lib

DT = jnp.float64


def _make_fleet(T, B, seed):
    """B perturbed instances with per-instance VO event streams."""
    rng = np.random.default_rng(seed)
    logs = [synth.generate(synth.SynthConfig(
        T=T, seed=seed, vo_every=5 + b % 3, vo_latency=1 + b % 2))
        for b in range(B)]
    base = logs[0]
    datas, vos = [], []
    for b, lg in enumerate(logs):
        d = estimator.tickdata_from_log(base, dtype=DT)
        d = d._replace(
            accel_b=d.accel_b + 0.01 * rng.standard_normal((T, 3)))
        v = estimator.vodata_from_log(lg, dtype=DT)
        if b == B - 1:  # one lane entirely VO-free
            v = v._replace(active=jnp.zeros(T, bool))
        else:
            v = v._replace(dp_body=v.dp_body + 1e-4 * b)
        datas.append(d)
        vos.append(v)
    data_b = jax.tree.map(lambda *a: jnp.stack(a), *datas)   # (B,T,...)
    vo_b = jax.tree.map(lambda *a: jnp.stack(a), *vos)       # (B,T,...)
    return data_b, vo_b


def test_per_instance_vo_matches_vmapped():
    T, B = 26, 4
    p = EstimatorParams(num_legs=4, leg_odom_type=0, rate=200, N=6)
    data_b, vo_b = _make_fleet(T, B, seed=11)

    # oracle: vmap the standard runner over (data, vo) pairs
    x_ref, v_ref = jax.vmap(
        lambda d, v: estimator.run_mhe(p, d, vo=v, dtype=DT)
    )(data_b, vo_b)                                          # (B,T,...)

    # lanes fast path with per-instance VO
    data_tb = batch_lib.to_time_leading(data_b)              # (T,B,...)
    data_l = batch_lib.tickdata_to_lanes(data_tb)
    vo_l = estimator.VOData(
        active=jnp.swapaxes(vo_b.active, 0, 1),              # (T,B)
        dp_body=jnp.moveaxis(vo_b.dp_body, 0, -1),           # (T,3,B)
        tick_pre=jnp.swapaxes(vo_b.tick_pre, 0, 1),
        tick_now=jnp.swapaxes(vo_b.tick_now, 0, 1),
    )
    x_l, v_l = estimator.run_mhe_lanes(p, data_l, vo=vo_l, dtype=DT)
    np.testing.assert_allclose(np.asarray(jnp.swapaxes(x_l, 0, 1)),
                               np.asarray(x_ref), rtol=1e-7, atol=1e-9)
    np.testing.assert_allclose(np.asarray(jnp.swapaxes(v_l, 0, 1)),
                               np.asarray(v_ref), rtol=1e-7, atol=1e-9)

    # the schedules genuinely differ across lanes (the test has teeth)
    assert not np.array_equal(np.asarray(vo_b.active[0]),
                              np.asarray(vo_b.active[1]))


def test_per_instance_vo_shared_schedule_consistency():
    """A per-instance stream where every lane carries the SAME schedule must
    reproduce the shared-schedule path exactly."""
    T, B = 22, 3
    p = EstimatorParams(num_legs=4, leg_odom_type=0, rate=200, N=5)
    log = synth.generate(synth.SynthConfig(T=T, seed=2))
    data = estimator.tickdata_from_log(log, dtype=DT)
    vo = estimator.vodata_from_log(log, dtype=DT)
    key = jax.random.PRNGKey(0)
    data_b = batch_lib.to_time_leading(
        batch_lib.perturb_log_batch(data, B, key, dtype=DT))
    data_l = batch_lib.tickdata_to_lanes(data_b)

    x_shared, _ = estimator.run_mhe_lanes(p, data_l, vo=vo, dtype=DT)
    vo_pi = estimator.VOData(
        active=jnp.broadcast_to(vo.active[:, None], (T, B)),
        dp_body=jnp.broadcast_to(vo.dp_body[:, :, None], (T, 3, B)),
        tick_pre=jnp.broadcast_to(vo.tick_pre[:, None], (T, B)),
        tick_now=jnp.broadcast_to(vo.tick_now[:, None], (T, B)),
    )
    x_pi, _ = estimator.run_mhe_lanes(p, data_l, vo=vo_pi, dtype=DT)
    np.testing.assert_allclose(np.asarray(x_pi), np.asarray(x_shared),
                               rtol=1e-9, atol=1e-11)
