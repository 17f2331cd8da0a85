"""Aux subsystems: checkpoint/resume, timing probes, example driver."""

import numpy as np
import jax
import jax.numpy as jnp

from decentralized_ekf_mhe_tpu.config import EstimatorParams
from decentralized_ekf_mhe_tpu.io import synth
from decentralized_ekf_mhe_tpu.ops import estimator, mhe
from decentralized_ekf_mhe_tpu.utils import checkpoint, timing


def test_checkpoint_resume_bit_exact(tmp_path):
    """Snapshot mid-run, resume, and get bit-identical estimates."""
    p = EstimatorParams(num_legs=4, leg_odom_type=0, rate=200, N=10,
                        foot_swing_std=[1e7] * 3)
    log = synth.generate(synth.SynthConfig(T=60, seed=2))
    data = estimator.tickdata_from_log(log)
    c = mhe.make_consts(p, jnp.float64)
    d0 = jax.tree.map(lambda a: a[0], data)
    st = mhe.init(c, d0.R_sb, d0.accel_b, d0.omega_b, d0.p_foot, d0.J_foot,
                  d0.dq, d0.contact, dtype=jnp.float64)

    def run(st, ks):
        outs = []
        for k in ks:
            d = jax.tree.map(lambda a: a[k], data)
            st, (xT, _) = mhe.step(c, st, d.R_sb, d.accel_b, d.omega_b,
                                   d.p_foot, d.J_foot, d.dq, d.contact,
                                   False, jnp.zeros(3), 0, 0, d.R_sb)
            outs.append(np.asarray(xT))
        return st, outs

    st_mid, _ = run(st, range(1, 30))
    path = str(tmp_path / "carry.npz")
    checkpoint.save_carry(path, st_mid)
    st_restored = checkpoint.load_carry(path, st_mid)
    _, out_a = run(st_mid, range(30, 50))
    _, out_b = run(st_restored, range(30, 50))
    np.testing.assert_array_equal(np.stack(out_a), np.stack(out_b))


def test_timing_probes(capsys):
    timing.tic("unit")
    dt = timing.toc("unit", quiet=True)
    assert dt >= 0
    res = {}
    with timing.scoped_timer("block", res):
        pass
    assert "block" in res
    w, out = timing.rate_probe(lambda x: x + 1, jnp.ones(4), reps=2)
    assert w > 0 and np.asarray(out).shape == (4,)


def test_example_driver(tmp_path):
    from conftest import run_example

    run_example("run_go1.py", "--ticks", "120", "--est-type", "1",
                "--gt-orientation", "--log-dir", str(tmp_path), "--cpu")
    from decentralized_ekf_mhe_tpu.io import logger as log_io

    out = log_io.read_log(str(tmp_path / "go1"))
    assert out["x_MHE"].shape == (120, 9)
    assert np.isfinite(out["v_body"]).all()
