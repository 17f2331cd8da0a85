"""Numpy float64 oracle of the KF path + model assembly (DecentralEst.cpp)."""

import numpy as np

G_S = np.array([0.0, 0.0, -9.81])


def skew(v):
    return np.array([[0, -v[2], v[1]], [v[2], 0, -v[0]], [-v[1], v[0], 0]])


def cov(std):
    return np.diag(np.asarray(std, float) ** 2)


def gain(std):
    return np.diag(1.0 / np.asarray(std, float) ** 2)


class RefAssembly:
    """A_dyn/b_dyn/C_dyn + A_meas/b_meas/C_meas/Q_meas builders (float64)."""

    def __init__(self, params):
        self.p = params
        self.s = params.dim_state
        self.m = params.dim_meas
        self.L = params.num_legs
        self.dt = params.dt
        self.C_p = cov(params.p_process_std)
        self.C_accel = cov(params.accel_input_std)
        self.C_bias = cov(params.accel_bias_std)
        self.C_enc_pos = cov(params.joint_position_std)
        self.C_enc_vel = cov(params.joint_velocity_std)
        self.C_gyro = cov(params.gyro_input_std)
        self.C_slide = cov(params.foot_slide_std)
        self.C_swing = cov(params.foot_swing_std)
        self.Q_swing = gain(params.foot_swing_std)
        self.Q_slide = gain(params.foot_slide_std)
        self.Q_bias = gain(params.accel_bias_std)

    def a_meas(self):
        A = np.zeros((self.m, self.s))
        for i in range(self.L):
            if self.p.leg_odom_type == 0:
                A[3 * i: 3 * i + 3, 3:6] = np.eye(3)
            else:
                A[3 * i: 3 * i + 3, 0:3] = -np.eye(3)
                A[3 * i: 3 * i + 3, 9 + 3 * i: 12 + 3 * i] = np.eye(3)
        return A

    def dynamics(self, R, accel_s, contact):
        dt, s = self.dt, self.s
        A = np.eye(s)
        A[0:3, 3:6] = dt * np.eye(3)
        A[0:3, 6:9] = -dt * dt / 2 * R
        A[3:6, 6:9] = -dt * R
        b = np.zeros(s)
        b[0:3] = -dt * dt / 2 * accel_s
        b[3:6] = -dt * accel_s
        G = np.zeros((s, s))
        G[0:3, 0:3] = R * dt
        G[0:3, 3:6] = -0.5 * R * dt * dt
        G[3:6, 3:6] = -R * dt
        G[6:9, 6:9] = np.eye(3) * dt
        Ci = np.zeros((s, s))
        Ci[0:3, 0:3] = self.C_p
        Ci[3:6, 3:6] = self.C_accel
        Ci[6:9, 6:9] = self.C_bias
        if self.p.leg_odom_type == 1:
            for i in range(self.L):
                G[9 + 3 * i: 12 + 3 * i, 9 + 3 * i: 12 + 3 * i] = R * dt
                Ci[9 + 3 * i: 12 + 3 * i, 9 + 3 * i: 12 + 3 * i] = (
                    self.C_slide if contact[i] else self.C_swing
                )
        C_dyn = G @ Ci @ G.T
        # MHE gains (blockwise inverse, DecentralEst.cpp:409-424, 434-450)
        Q = np.zeros((s, s))
        Gpv = np.zeros((6, 6))
        Gpv[0:3, 0:3] = R * dt
        Gpv[0:3, 3:6] = 0.5 * R * dt * dt
        Gpv[3:6, 3:6] = R * dt
        Cpv = np.zeros((6, 6))
        Cpv[0:3, 0:3] = self.C_p
        Cpv[3:6, 3:6] = self.C_accel
        Q[0:6, 0:6] = np.linalg.inv(Gpv @ Cpv @ Gpv.T)
        Q[6:9, 6:9] = self.Q_bias / dt**2
        if self.p.leg_odom_type == 1:
            for i in range(self.L):
                Qf = self.Q_slide if contact[i] else self.Q_swing
                Q[9 + 3 * i: 12 + 3 * i, 9 + 3 * i: 12 + 3 * i] = (R @ Qf @ R.T) / dt**2
        return A, b, C_dyn, Q

    def measurement(self, R, omega, p_foot, J_foot, dq, contact):
        m = self.m
        b = np.zeros(m)
        C = np.zeros((m, m))
        Q = np.zeros((m, m))
        for i in range(self.L):
            Ji, pi = J_foot[i], p_foot[i]
            sl = slice(3 * i, 3 * i + 3)
            if self.p.leg_odom_type == 0:
                b[sl] = -R @ Ji @ dq[i] - R @ np.cross(omega, pi)
                if contact[i] == 0.0:
                    C[sl, sl] = self.C_swing
                    Q[sl, sl] = self.Q_swing
                else:
                    G = np.hstack([-Ji, -skew(omega) @ Ji, skew(pi)])
                    Cb = np.zeros((9, 9))
                    Cb[0:3, 0:3] = self.C_enc_vel
                    Cb[3:6, 3:6] = self.C_enc_pos
                    Cb[6:9, 6:9] = self.C_gyro
                    Cm = R @ G @ Cb @ G.T @ R.T
                    C[sl, sl] = Cm
                    Q[sl, sl] = np.linalg.inv(Cm)
            else:
                b[sl] = R @ pi
                inner = Ji @ self.C_enc_pos @ Ji.T
                C[sl, sl] = R @ inner @ R.T
                Q[sl, sl] = R @ np.linalg.inv(inner) @ R.T
        return b, C, Q

    def prior(self, b_meas0):
        s = self.s
        x0 = np.zeros(s)
        C0 = np.zeros((s, s))
        C0[0:3, 0:3] = cov(self.p.p_init_std)
        C0[3:6, 3:6] = cov(self.p.v_init_std)
        C0[6:9, 6:9] = cov(self.p.accel_bias_init_std)
        Q0 = np.zeros((s, s))
        Q0[0:3, 0:3] = gain(self.p.p_init_std)
        Q0[3:6, 3:6] = gain(self.p.v_init_std)
        Q0[6:9, 6:9] = gain(self.p.accel_bias_init_std)
        if self.p.leg_odom_type == 1:
            for i in range(self.L):
                sl = slice(9 + 3 * i, 12 + 3 * i)
                x0[sl] = b_meas0[3 * i: 3 * i + 3]
                C0[sl, sl] = cov(self.p.foot_init_std)
                Q0[sl, sl] = gain(self.p.foot_init_std)
        return x0, C0, Q0


class RefKF:
    """InitializeKF + UpdateKF oracle (DecentralEst.cpp:592-861)."""

    def __init__(self, params):
        self.asm = RefAssembly(params)
        self.A_meas = self.asm.a_meas()
        self.x = None
        self.C = None

    def _correct(self, b_meas, C_meas):
        H = self.A_meas
        K = self.C @ H.T @ np.linalg.inv(H @ self.C @ H.T + C_meas)
        self.x = self.x + K @ (b_meas - H @ self.x)
        self.C = (np.eye(self.asm.s) - K @ H) @ self.C

    def init(self, R, omega, p_foot, J_foot, dq, contact):
        b0, C0m, _ = self.asm.measurement(R, omega, p_foot, J_foot, dq, contact)
        self.x, self.C, _ = self.asm.prior(b0)
        self._correct(b0, C0m)
        self.prev = (R, None, contact)

    def update(self, R, accel_b, omega, p_foot, J_foot, dq, contact):
        # prediction uses the PREVIOUS tick's R/accel_s/contact — UpdateKF
        # reads the stacks before GetMeasurement pushes the current tick
        # (DecentralEst.cpp:707-709, 766)
        R_prev, accel_s_prev, contact_prev = self.prev
        A, b, C_dyn, _ = self.asm.dynamics(R_prev, accel_s_prev, contact_prev)
        self.x = A @ self.x - b
        self.C = A @ self.C @ A.T + C_dyn
        bm, Cm, _ = self.asm.measurement(R, omega, p_foot, J_foot, dq, contact)
        self._correct(bm, Cm)
        self.push(R, accel_b, contact)

    def push(self, R, accel_b, contact):
        self.prev = (R, R @ accel_b + G_S, contact)
