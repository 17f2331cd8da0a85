"""Stateful estimator facade — API parity with `DecentralizedEstimation`.

The reference exposes the estimator to deployments as a three-method object:
``initialize(store, params)`` / ``update(T)`` / ``reset()``
(DecentralEst.hpp:101-103, driven from robotSub::timerCallback,
EstSub.cpp:58-91). This facade offers the same surface for online /
tick-at-a-time use (hardware-in-the-loop, notebooks), wrapping the pure
scan-oriented kernels with a cached jitted step. For offline replay and
fleets, prefer the functional drivers (ops/estimator.run_mhe / run_kf,
parallel.batch) — one fused scan is far faster than per-tick dispatch.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from decentralized_ekf_mhe_tpu.config import EstimatorParams
from decentralized_ekf_mhe_tpu.ops import assembly, kf, mhe


class DecentralizedEstimator:
    """Tick-at-a-time decentralized estimator (MHE or KF per est_type)."""

    def __init__(self, params: EstimatorParams, dtype=jnp.float32,
                 x_lb=None, x_ub=None, use_pallas: bool = False,
                 lever_arm=kf.DEFAULT_LEVER_ARM, history_ticks: int = 256):
        self.params = params
        self.dtype = dtype
        self.est_type = params.est_type
        self._c = mhe.make_consts(params, dtype, x_lb=x_lb, x_ub=x_ub,
                                  use_pallas=use_pallas)
        self._nc = assembly.make_noise_consts(params, dtype)
        self._A_meas = assembly.a_meas(params, dtype)
        self._lever = jnp.asarray(lever_arm, dtype)
        # Bounded host-side orientation ring for the VO R_pre lookup
        # (DecentralEst.cpp:915). Only the single (3,3) pre-frame rotation is
        # shipped to device per update; tick indices stay ABSOLUTE (no modular
        # aliasing past the ring length — the ring only has to cover the VO
        # pipeline latency, a handful of ticks).
        self._R_hist = np.zeros((history_ticks, 3, 3))
        self._state = None
        self._kf_prev = None
        self.T = 0
        self.x = None
        self.v_body = None
        self._mhe_step_jit = None

    # -- DecentralizedEstimation::initialize (DecentralEst.cpp:9-150) ------
    def initialize(self, R_sb, accel_b, omega_b, p_foot, J_foot, dq, contact):
        a = lambda v: jnp.asarray(v, self.dtype)
        args = tuple(map(a, (R_sb, accel_b, omega_b, p_foot, J_foot, dq, contact)))
        self._R_hist[0] = np.asarray(R_sb)
        if self.est_type == 0:
            self._state = mhe.init(self._c, *args, dtype=self.dtype)
            xw = mhe.solve_window(self._c, self._state)
            self.x = xw[..., self._c.N - 1, :]
        else:
            b0, C0, _ = assembly.build_measurement(
                self.params, self._nc, args[0], args[2], args[3], args[4],
                args[5], args[6],
            )
            self._state = kf.init(self.params, self._nc, self._A_meas, b0, C0)
            self._kf_prev = (
                args[0], assembly.spatial_accel(args[0], args[1], self._nc), args[6]
            )
            self.x = self._state.x
        self.v_body = kf.body_velocity(self.x, args[0], args[2], self._lever)
        self.T = 1
        return self.x

    # -- DecentralizedEstimation::update (DecentralEst.cpp:152-198) --------
    def update(self, R_sb, accel_b, omega_b, p_foot, J_foot, dq, contact,
               vo_active=False, vo_dp=None, vo_tick_pre=0, vo_tick_now=0):
        if self._state is None:
            raise RuntimeError("call initialize() before update()")
        a = lambda v: jnp.asarray(v, self.dtype)
        args = tuple(map(a, (R_sb, accel_b, omega_b, p_foot, J_foot, dq, contact)))
        self._R_hist[self.T % len(self._R_hist)] = np.asarray(R_sb)

        if self.est_type == 0:
            if self._mhe_step_jit is None:
                self._mhe_step_jit = jax.jit(
                    lambda st, *a_, : mhe.step(self._c, st, *a_)
                )
            vo_dp = a(vo_dp) if vo_dp is not None else jnp.zeros(3, self.dtype)
            if vo_active and self.T - int(vo_tick_pre) >= len(self._R_hist):
                raise ValueError(
                    f"VO previous frame (tick {int(vo_tick_pre)}) predates the "
                    f"{len(self._R_hist)}-tick orientation history at tick "
                    f"{self.T}; raise history_ticks"
                )
            R_pre = jnp.asarray(
                self._R_hist[int(vo_tick_pre) % len(self._R_hist)], self.dtype
            )
            self._state, (x_T, _) = self._mhe_step_jit(
                self._state, *args, bool(vo_active), vo_dp,
                jnp.asarray(int(vo_tick_pre), jnp.int32),
                jnp.asarray(int(vo_tick_now), jnp.int32), R_pre,
            )
            self.x = x_T
        else:
            R_prev, accel_s_prev, contact_prev = self._kf_prev
            A_dyn, b_dyn, C_dyn, _ = assembly.build_dynamics(
                self.params, self._nc, R_prev, accel_s_prev, contact_prev
            )
            b_meas, C_meas, _ = assembly.build_measurement(
                self.params, self._nc, args[0], args[2], args[3], args[4],
                args[5], args[6],
            )
            self._state = kf.update(self._state, A_dyn, b_dyn, C_dyn,
                                    self._A_meas, b_meas, C_meas)
            self._kf_prev = (
                args[0], assembly.spatial_accel(args[0], args[1], self._nc), args[6]
            )
            self.x = self._state.x
        self.v_body = kf.body_velocity(self.x, args[0], args[2], self._lever)
        self.T += 1
        return self.x

    # -- DecentralizedEstimation::reset -> MHEproblem::resetQP -------------
    def reset(self):
        """Full estimator reset (DecentralEst.cpp:1011-1015, MheSrb.cpp:734-760)."""
        self._state = None
        self._kf_prev = None
        self.T = 0
        self.x = None
        self.v_body = None
