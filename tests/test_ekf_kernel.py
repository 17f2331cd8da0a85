"""EKF-stage Pallas kernel (pallas/ekf_kernel.py) equivalence vs the scanned
ekf_lanes path, in interpret mode on CPU (float64 exact — the kernel
transcribes the same per-substep math, so agreement is to solver roundoff).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from decentralized_ekf_mhe_tpu.config import EKFParams
from decentralized_ekf_mhe_tpu.io import synth
from decentralized_ekf_mhe_tpu.ops import ekf_lanes, estimator
from decentralized_ekf_mhe_tpu.parallel import batch as batch_lib
from decentralized_ekf_mhe_tpu.pallas import ekf_kernel

B = 128


def _blocks(T, seed, dtype, B_=B, vo_noise=0.0):
    log = synth.generate(synth.SynthConfig(T=T, seed=seed))
    eb1 = estimator.ekfblocks_from_log(log, dtype=dtype)
    eb = batch_lib.perturb_ekf_blocks(eb1, B_, jax.random.PRNGKey(seed),
                                      dtype=dtype, noise_scale=1.0,
                                      vo_noise_scale=vo_noise)
    return log, eb


@pytest.mark.parametrize("vo_noise", [0.0, 1.0])
def test_ekf_kernel_matches_scan_f64(vo_noise):
    """Exact f64 equivalence over warmup + delayed-VO replays + chunk
    boundaries (chunk=13 < T), shared and per-lane measured vo_q."""
    dtype = jnp.float64
    T = 40
    log, eb = _blocks(T, 4, dtype, vo_noise=vo_noise)
    ekf_params = EKFParams()
    ec = ekf_lanes.make_consts(ekf_params, dtype)
    st = ekf_lanes.init_state(ekf_params, B, ring_len=16, dtype=dtype)

    _, q_ref = estimator.scan_ekf_blocks(st, eb, ec)
    q_mk, final = ekf_kernel.replay(ec, st, eb, chunk=13, interpret=True)
    np.testing.assert_allclose(np.asarray(q_mk), np.asarray(q_ref),
                               rtol=1e-10, atol=1e-12)
    # final carry matches the scanned state (q/P/t; rings too)
    st_ref, _ = estimator.scan_ekf_blocks(st, eb, ec)
    np.testing.assert_allclose(np.asarray(final.q), np.asarray(st_ref.q),
                               rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(np.asarray(final.P), np.asarray(st_ref.P),
                               rtol=1e-10, atol=1e-12)
    assert int(final.t) == int(st_ref.t)
    np.testing.assert_allclose(np.asarray(final.q_hist),
                               np.asarray(st_ref.q_hist),
                               rtol=1e-10, atol=1e-12)


def test_ekf_kernel_resume_across_calls():
    """Splitting a log across two replay() calls (carry handoff through the
    returned state) equals one call — the block-streaming/HIL seam."""
    dtype = jnp.float64
    T = 30
    log, eb = _blocks(T, 9, dtype)
    ekf_params = EKFParams()
    ec = ekf_lanes.make_consts(ekf_params, dtype)
    st = ekf_lanes.init_state(ekf_params, B, ring_len=16, dtype=dtype)

    q_all, _ = ekf_kernel.replay(ec, st, eb, chunk=64, interpret=True)
    ebA = jax.tree.map(lambda a: a[:12], eb)
    ebB = jax.tree.map(lambda a: a[12:], eb)
    qA, stA = ekf_kernel.replay(ec, st, ebA, chunk=64, interpret=True)
    qB, _ = ekf_kernel.replay(ec, stA, ebB, chunk=64, interpret=True)
    np.testing.assert_allclose(
        np.asarray(jnp.concatenate([qA, qB], axis=0)), np.asarray(q_all),
        rtol=1e-10, atol=1e-12)
