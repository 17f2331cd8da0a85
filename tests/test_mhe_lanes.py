"""Lanes-layout MHE path (ops/mhe_lanes.py) vs the standard path — exact
semantic equivalence at float64, plus the lanes math helpers vs numpy."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from decentralized_ekf_mhe_tpu.config import EstimatorParams
from decentralized_ekf_mhe_tpu.io import synth
from decentralized_ekf_mhe_tpu.ops import assembly, assembly_lanes, estimator, lanes, mhe, mhe_lanes, tridiag
from decentralized_ekf_mhe_tpu.parallel import batch as batch_lib

DT = jnp.float64


def _params(leg_odom_type=0, num_legs=4, N=6):
    return EstimatorParams(num_legs=num_legs, leg_odom_type=leg_odom_type,
                           rate=200, N=N)


def _rand_rot(rng, B):
    """Random rotation matrices (B,3,3) via QR with det fix."""
    A = rng.standard_normal((B, 3, 3))
    Q, _ = np.linalg.qr(A)
    Q[np.linalg.det(Q) < 0, :, 0] *= -1
    return Q


class TestLanesMath:
    def test_matmuls(self):
        rng = np.random.default_rng(0)
        A = rng.standard_normal((5, 4, 6, 3))
        B = rng.standard_normal((5, 6, 7, 3))
        np.testing.assert_allclose(
            np.asarray(lanes.mm(jnp.asarray(A), jnp.asarray(B))),
            np.einsum("nikb,nkjb->nijb", A, B), atol=1e-12)
        At = np.swapaxes(A, 1, 2)
        np.testing.assert_allclose(
            np.asarray(lanes.mm_tn(jnp.asarray(At), jnp.asarray(B))),
            np.einsum("nikb,nkjb->nijb", A, B), atol=1e-12)
        v = rng.standard_normal((5, 7, 3))
        np.testing.assert_allclose(
            np.asarray(lanes.mv(jnp.asarray(B), jnp.asarray(v))),
            np.einsum("nikb,nkb->nib", B, v), atol=1e-12)
        w = rng.standard_normal((5, 6, 3))
        np.testing.assert_allclose(
            np.asarray(lanes.mv_t(jnp.asarray(B), jnp.asarray(w))),
            np.einsum("nikb,nib->nkb", B, w), atol=1e-12)

    def test_gj_inv_and_inv3(self):
        rng = np.random.default_rng(1)
        for n in (3, 9):
            M = rng.standard_normal((4, n, n))
            M = M @ np.swapaxes(M, -1, -2) + n * np.eye(n)
            Ml = jnp.asarray(np.moveaxis(M, 0, -1))
            inv_l = np.moveaxis(np.asarray(lanes.gj_inv(Ml)), -1, 0)
            np.testing.assert_allclose(inv_l, np.linalg.inv(M), atol=1e-9)
            if n == 3:
                inv_l3 = np.moveaxis(np.asarray(lanes.inv3(Ml)), -1, 0)
                np.testing.assert_allclose(inv_l3, np.linalg.inv(M), atol=1e-9)

    def test_skew_cross(self):
        rng = np.random.default_rng(2)
        a = rng.standard_normal((3, 5))
        b = rng.standard_normal((3, 5))
        np.testing.assert_allclose(
            np.asarray(lanes.cross(jnp.asarray(a), jnp.asarray(b))),
            np.cross(a.T, b.T).T, atol=1e-12)
        S = np.asarray(lanes.skew(jnp.asarray(a)))
        for k in range(5):
            np.testing.assert_allclose(S[:, :, k] @ b[:, k],
                                       np.cross(a[:, k], b[:, k]), atol=1e-12)

    def test_thomas_solve_matches_tridiag(self):
        rng = np.random.default_rng(3)
        N, s, B = 5, 4, 3
        D = rng.standard_normal((N, B, s, s))
        D = D @ np.swapaxes(D, -1, -2) + 4 * np.eye(s)
        U = 0.1 * rng.standard_normal((N - 1, B, s, s))
        r = rng.standard_normal((N, B, s))
        x_ref = tridiag.solve(jnp.asarray(D), jnp.asarray(U), jnp.asarray(r))
        x_l = lanes.thomas_solve(
            jnp.asarray(np.moveaxis(D, 1, -1)),
            jnp.asarray(np.moveaxis(U, 1, -1)),
            jnp.asarray(np.moveaxis(r, 1, -1)),
        )
        np.testing.assert_allclose(np.moveaxis(np.asarray(x_l), -1, 1),
                                   np.asarray(x_ref), atol=1e-9)


class TestAssemblyLanes:
    @pytest.mark.parametrize("lot", [0, 1])
    def test_builders_match_standard(self, lot):
        rng = np.random.default_rng(4)
        B, L = 5, 4
        p = _params(leg_odom_type=lot)
        nc = assembly.make_noise_consts(p, DT)
        R = jnp.asarray(_rand_rot(rng, B))
        accel_s = jnp.asarray(rng.standard_normal((B, 3)))
        omega = jnp.asarray(rng.standard_normal((B, 3)))
        p_foot = jnp.asarray(rng.standard_normal((B, L, 3)))
        J_foot = jnp.asarray(rng.standard_normal((B, L, 3, 3)) + 2 * np.eye(3))
        dq = jnp.asarray(rng.standard_normal((B, L, 3)))
        contact = jnp.asarray((rng.random((B, L)) > 0.4).astype(np.float64))

        A_s, b_s, _, Q_s = assembly.build_dynamics(p, nc, R, accel_s, contact)
        A_l, b_l, Q_l = assembly_lanes.build_dynamics(
            p, nc, lanes.to_lanes(R), lanes.to_lanes(accel_s),
            lanes.to_lanes(contact))
        np.testing.assert_allclose(np.asarray(lanes.from_lanes(A_l)),
                                   np.asarray(A_s), atol=1e-10)
        np.testing.assert_allclose(np.asarray(lanes.from_lanes(b_l)),
                                   np.asarray(b_s), atol=1e-10)
        # swing-gain blocks are O(4e8); off-diagonal entries are exact-zero
        # cancellations where summation order leaves O(1e-8) noise
        np.testing.assert_allclose(np.asarray(lanes.from_lanes(Q_l)),
                                   np.asarray(Q_s), rtol=1e-8, atol=1e-4)

        y_s, _, Qm_s = assembly.build_measurement(p, nc, R, omega, p_foot,
                                                  J_foot, dq, contact)
        y_l, Qm_l = assembly_lanes.build_measurement(
            p, nc, lanes.to_lanes(R), lanes.to_lanes(omega),
            lanes.to_lanes(p_foot), lanes.to_lanes(J_foot),
            lanes.to_lanes(dq), lanes.to_lanes(contact))
        np.testing.assert_allclose(np.asarray(lanes.from_lanes(y_l)),
                                   np.asarray(y_s), atol=1e-10)
        np.testing.assert_allclose(np.asarray(lanes.from_lanes(Qm_l)),
                                   np.asarray(Qm_s), rtol=1e-8, atol=1e-4)

        x0_s, Qp_s, _ = assembly.prior_state(p, nc, y_s)
        x0_l, Qp_l = assembly_lanes.prior_state(p, nc, y_l)
        np.testing.assert_allclose(np.asarray(lanes.from_lanes(x0_l)),
                                   np.asarray(x0_s), atol=1e-12)
        np.testing.assert_allclose(np.asarray(lanes.from_lanes(Qp_l)),
                                   np.asarray(Qp_s), atol=1e-12)


class TestMHELanesEquivalence:
    @pytest.mark.parametrize("lot", [0, 1])
    def test_full_replay_matches_standard(self, lot):
        """Lanes fleet replay == vmapless standard fleet replay, incl. VO and
        marginalization, at float64."""
        p = _params(leg_odom_type=lot, N=6)
        T, B = 18, 3
        log = synth.generate(synth.SynthConfig(T=T, seed=7))
        data = estimator.tickdata_from_log(log, dtype=DT)
        vo = estimator.vodata_from_log(log, dtype=DT)
        key = jax.random.PRNGKey(0)
        data_b = batch_lib.to_time_leading(
            batch_lib.perturb_log_batch(data, B, key, dtype=DT))

        x_ref, v_ref = estimator.run_mhe(p, data_b, vo=vo, dtype=DT)
        x_l, v_l = estimator.run_mhe_lanes(
            p, batch_lib.tickdata_to_lanes(data_b), vo=vo, dtype=DT)
        np.testing.assert_allclose(np.asarray(x_l), np.asarray(x_ref),
                                   rtol=1e-7, atol=1e-8)
        np.testing.assert_allclose(np.asarray(v_l), np.asarray(v_ref),
                                   rtol=1e-7, atol=1e-8)

    def test_no_vo_matches_standard(self):
        p = _params(N=5)
        T, B = 12, 2
        log = synth.generate(synth.SynthConfig(T=T, seed=3))
        data = estimator.tickdata_from_log(log, dtype=DT)
        key = jax.random.PRNGKey(1)
        data_b = batch_lib.to_time_leading(
            batch_lib.perturb_log_batch(data, B, key, dtype=DT))
        x_ref, _ = estimator.run_mhe(p, data_b, vo=None, dtype=DT)
        x_l, _ = estimator.run_mhe_lanes(
            p, batch_lib.tickdata_to_lanes(data_b), vo=None, dtype=DT)
        np.testing.assert_allclose(np.asarray(x_l), np.asarray(x_ref),
                                   rtol=1e-7, atol=1e-8)

    @pytest.mark.parametrize("adaptive,lot", [(True, 0), (False, 0),
                                              (True, 1)])
    def test_constrained_lanes_matches_standard(self, adaptive, lot):
        """Fleet-scale constrained path: the lanes OSQP-semantics ADMM
        (admm.solve_box_tridiag_lanes) reproduces the standard-layout solver
        tick-for-tick at float64, warm starts included, with the velocity box
        genuinely active."""
        p = _params(leg_odom_type=lot, N=6)   # lot=1 => s=21 (Cassie class)
        T, B = 16, 3
        log = synth.generate(synth.SynthConfig(T=T, seed=11))
        data = estimator.tickdata_from_log(log, dtype=DT)
        vo = estimator.vodata_from_log(log, dtype=DT)
        key = jax.random.PRNGKey(4)
        data_b = batch_lib.to_time_leading(
            batch_lib.perturb_log_batch(data, B, key, dtype=DT))

        s = p.dim_state
        x_lb = np.full(s, -np.inf); x_lb[3:6] = -0.05
        x_ub = np.full(s, np.inf); x_ub[3:6] = 0.05
        p.osqp.adapt_rho = adaptive
        c_con = mhe.make_consts(p, DT, x_lb=x_lb, x_ub=x_ub, admm_iters=60)

        x_ref, v_ref = estimator.run_mhe(p, data_b, vo=vo, dtype=DT,
                                         consts=c_con)
        x_l, v_l = estimator.run_mhe_lanes(
            p, batch_lib.tickdata_to_lanes(data_b), vo=vo, dtype=DT,
            consts=c_con)
        np.testing.assert_allclose(np.asarray(x_l), np.asarray(x_ref),
                                   rtol=1e-7, atol=1e-9)
        np.testing.assert_allclose(np.asarray(v_l), np.asarray(v_ref),
                                   rtol=1e-7, atol=1e-9)
        # the box must actually bind on this log (otherwise the test would
        # pass vacuously through the unconstrained algebra)
        vmax = np.abs(np.asarray(x_l[..., 3:6])).max()
        assert vmax >= 0.05 - 1e-6
        assert vmax <= 0.05 + 1e-3

    def test_constrained_solver_direct_equivalence(self):
        """solve_box_tridiag_lanes == solve_box_tridiag on a random SPD
        block-tridiagonal box QP (fresh + warm-started), f64."""
        from decentralized_ekf_mhe_tpu.ops import admm

        rng = np.random.default_rng(8)
        K, s, B = 5, 4, 6
        D = rng.standard_normal((K, B, s, s))
        D = D @ np.swapaxes(D, -1, -2) + 4 * np.eye(s)
        U = 0.1 * rng.standard_normal((K - 1, B, s, s))
        r = rng.standard_normal((K, B, s))
        lb = np.full(s, -0.3); lb[0] = -np.inf
        ub = np.full(s, 0.3); ub[-1] = np.inf
        st = admm.ADMMSettings(rho=0.5, sigma=1e-6, alpha=1.6, iters=50,
                               abs_tol=1e-8, rel_tol=1e-8)
        z0 = 0.1 * rng.standard_normal((K, B, s))
        y0 = 0.1 * rng.standard_normal((K, B, s))
        res_std = admm.solve_box_tridiag(
            jnp.asarray(D), jnp.asarray(U), jnp.asarray(r),
            jnp.asarray(lb), jnp.asarray(ub), st,
            z0=jnp.asarray(z0), y0=jnp.asarray(y0))
        res_l = admm.solve_box_tridiag_lanes(
            jnp.asarray(np.moveaxis(D, 1, -1)),
            jnp.asarray(np.moveaxis(U, 1, -1)),
            jnp.asarray(np.moveaxis(r, 1, -1)),
            jnp.asarray(lb), jnp.asarray(ub), st,
            z0=jnp.asarray(np.moveaxis(z0, 1, -1)),
            y0=jnp.asarray(np.moveaxis(y0, 1, -1)))
        np.testing.assert_allclose(np.moveaxis(np.asarray(res_l.x), -1, 1),
                                   np.asarray(res_std.x), rtol=1e-9,
                                   atol=1e-11)
        np.testing.assert_allclose(np.moveaxis(np.asarray(res_l.z), -1, 1),
                                   np.asarray(res_std.z), rtol=1e-9,
                                   atol=1e-11)
        np.testing.assert_allclose(np.asarray(res_l.iters),
                                   np.asarray(res_std.iters))
        # against the dense oracle: KKT residual of the polished solution
        x = np.moveaxis(np.asarray(res_l.x), -1, 1)
        assert np.all(x >= lb - 1e-6) and np.all(x <= ub + 1e-6)

    def test_state_converter_roundtrip(self):
        p = _params(N=4)
        log = synth.generate(synth.SynthConfig(T=5, seed=5))
        data = estimator.tickdata_from_log(log, dtype=DT)
        B = 2
        key = jax.random.PRNGKey(2)
        data_b = batch_lib.perturb_log_batch(data, B, key, dtype=DT)
        d0 = jax.tree.map(lambda a: a[:, 0], data_b)
        c = mhe.make_consts(p, DT)
        st = mhe.init(c, d0.R_sb, d0.accel_b, d0.omega_b, d0.p_foot,
                      d0.J_foot, d0.dq, d0.contact, dtype=DT)
        st_l = mhe_lanes.to_lanes_state(st)
        x_std = mhe.solve_window(c, st)           # (B,N,s)
        x_l = mhe_lanes.solve_window(c, st_l)     # (N,s,B)
        np.testing.assert_allclose(np.moveaxis(np.asarray(x_l), -1, 0),
                                   np.asarray(x_std), rtol=1e-8, atol=1e-9)
