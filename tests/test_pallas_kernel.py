"""Pallas tridiag kernel (interpret mode on CPU) vs the XLA solver, and the
fused batched runner vs the vmapped runner."""

import numpy as np
import jax
import jax.numpy as jnp

from decentralized_ekf_mhe_tpu.config import EstimatorParams
from decentralized_ekf_mhe_tpu.io import synth
from decentralized_ekf_mhe_tpu.ops import estimator, tridiag
from decentralized_ekf_mhe_tpu.parallel import batch as batch_lib
from decentralized_ekf_mhe_tpu.pallas import tridiag_kernel as tk


def _rand_system(K, B, s, seed=0):
    rng = np.random.default_rng(seed)
    M = rng.standard_normal((K, B, s, s))
    D = (M @ np.swapaxes(M, -1, -2) + 5 * np.eye(s)).astype(np.float32)
    U = (0.3 * rng.standard_normal((K - 1, B, s, s))).astype(np.float32)
    r = rng.standard_normal((K, B, s)).astype(np.float32)
    return D, U, r


def test_kernel_matches_xla_solver():
    D, U, r = _rand_system(6, 8, 5)
    x_ref = np.asarray(tridiag.solve(*map(jnp.asarray, (D, U, r))))
    x_pal = np.asarray(
        tk.solve_batched(*map(jnp.asarray, (D, U, r)), interpret=True)
    )
    np.testing.assert_allclose(x_pal, x_ref, atol=5e-6)


def test_kernel_warmup_masking():
    D, U, r = _rand_system(6, 8, 5, seed=1)
    valid = np.ones((6, 8), bool)
    valid[:3] = False
    x_ref = np.asarray(
        tridiag.solve(*map(jnp.asarray, (D, U, r)), valid=jnp.asarray(valid))
    )
    x_pal = np.asarray(
        tk.solve_batched(*map(jnp.asarray, (D, U, r)), valid=jnp.asarray(valid),
                         interpret=True)
    )
    np.testing.assert_allclose(x_pal, x_ref, atol=5e-6)
    np.testing.assert_allclose(x_pal[:3], 0.0, atol=0)


def test_kernel_lane_padding():
    """B not a multiple of 128 pads internally and slices back."""
    D, U, r = _rand_system(4, 5, 4, seed=2)
    x_ref = np.asarray(tridiag.solve(*map(jnp.asarray, (D, U, r))))
    x_pal = np.asarray(
        tk.solve_batched(*map(jnp.asarray, (D, U, r)), interpret=True)
    )
    np.testing.assert_allclose(x_pal, x_ref, atol=5e-6)


def test_fused_batched_runner_matches_vmapped():
    """The no-vmap (T,B,...) fleet replay == the vmapped replay, bitwise."""
    p = EstimatorParams(num_legs=4, leg_odom_type=0, rate=200, N=8,
                        foot_swing_std=[1e7] * 3)
    log = synth.generate(synth.SynthConfig(T=40, seed=3))
    data = estimator.tickdata_from_log(log, dtype=jnp.float32)
    vo = estimator.vodata_from_log(log, dtype=jnp.float32)
    B = 3
    db = batch_lib.perturb_log_batch(data, B, jax.random.PRNGKey(0))
    xv, _ = jax.jit(batch_lib.make_batched_runner(p, jnp.float32))(db, vo)
    xf, _ = jax.jit(batch_lib.make_fused_batched_runner(
        p, jnp.float32, use_pallas=False))(batch_lib.to_time_leading(db), vo)
    np.testing.assert_array_equal(np.asarray(xv), np.asarray(jnp.swapaxes(xf, 0, 1)))
