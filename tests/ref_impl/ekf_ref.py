"""Numpy float64 oracle of the orien_est quaternion EKF (orien_ekf.cpp)."""

import numpy as np

G = np.array([0.0, 0.0, 9.81])


def q_norm(q):
    return q / np.linalg.norm(q)


def omega(w):
    wx, wy, wz = w
    return np.array(
        [
            [0, -wx, -wy, -wz],
            [wx, 0, wz, -wy],
            [wy, -wz, 0, wx],
            [wz, wy, -wx, 0],
        ],
        dtype=np.float64,
    )


def W_mat(q, dt, quirk=True):
    w, x, y, z = q
    if quirk:
        # as implemented: orien_ekf.cpp:277-293 (row 2 overwritten, row 3 partial)
        M = np.array([[-x, -y, -z], [w, -z, y], [z, x, w], [-y, 0.0, 0.0]])
    else:
        M = np.array([[-x, -y, -z], [w, -z, y], [z, w, -x], [-y, x, w]])
    return 0.5 * dt * M


def rot(q):
    w, x, y, z = q_norm(q)
    return np.array(
        [
            [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
            [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
            [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
        ]
    )


def H_mat(q, g=G):
    w, x, y, z = q
    gx, gy, gz = g
    H = np.array(
        [
            [gx * w + gy * z - gz * y, gx * x + gy * y + gz * z,
             -gx * y + gy * x - gz * w, -gx * z + gy * w + gz * x],
            [-gx * z + gy * w + gz * x, gx * y - gy * x + gz * w,
             gx * x + gy * y + gz * z, -gx * w - gy * z + gz * y],
            [gx * y - gy * x + gz * w, gx * z - gy * w - gz * x,
             gx * w + gy * z - gz * y, gx * x + gy * y + gz * z],
        ]
    )
    return 2 * H


def predict(q, P, gyro, C_gyro, dt, quirk=True):
    F = np.eye(4) + dt / 2 * omega(gyro)
    W = W_mat(q, dt, quirk)
    q_pred = q_norm(F @ q)
    P_pred = F @ P @ F.T + W @ C_gyro @ W.T
    return q_pred, P_pred


def accel_correct(q, P, accel, C_accel):
    R = rot(q)
    accel_hat = R.T @ G
    H = H_mat(q)
    rel = np.linalg.norm(accel) / np.linalg.norm(G)
    K = P @ H.T @ np.linalg.inv(H @ P @ H.T + rel * rel * C_accel)
    q_new = q_norm(q + K @ (accel - accel_hat))
    P_new = (np.eye(4) - K @ H) @ P
    return q_new, P_new


def vo_correct(q, P, q_vo, C_vo):
    K = P @ np.linalg.inv(P + C_vo)
    q_new = q_norm(q + K @ (q_vo - q))
    P_new = (np.eye(4) - K) @ P
    return q_new, P_new


class RefEKF:
    """Sequential oracle with VO rewind/replay (orien_ekf.cpp:77-212)."""

    def __init__(self, q0, P0, C_gyro, C_accel, C_vo, dt, quirk=True):
        self.q = np.array(q0, dtype=np.float64)
        self.P = np.array(P0, dtype=np.float64)
        self.C_gyro, self.C_accel, self.C_vo = C_gyro, C_accel, C_vo
        self.dt, self.quirk = dt, quirk
        self.gyro_stack, self.accel_stack = [], []
        self.q_stack, self.P_stack = [], []
        self.t = 0

    def tick(self, gyro, accel, vo_active=False, q_vo=None, vo_steps_back=0):
        # push history (get_measurement :158-163)
        self.gyro_stack.append(np.array(gyro))
        self.accel_stack.append(np.array(accel))
        self.q_stack.append(self.q.copy())
        self.P_stack.append(self.P.copy())
        # stack index == discrete time (one push per tick, starting at t=0)
        sync = self.t - vo_steps_back
        if vo_active and vo_steps_back >= 1 and sync >= 0:
            rel = vo_steps_back
            q, P = self.q_stack[sync].copy(), self.P_stack[sync].copy()
            for i in range(rel - 1):
                q, P = predict(q, P, self.gyro_stack[sync + i],
                               self.C_gyro, self.dt, self.quirk)
                q, P = accel_correct(q, P, self.accel_stack[sync + i], self.C_accel)
                if i == 0:
                    q, P = vo_correct(q, P, q_vo, self.C_vo)
            self.q, self.P = q, P

        q, P = predict(self.q, self.P, gyro, self.C_gyro, self.dt, self.quirk)
        q, P = accel_correct(q, P, accel, self.C_accel)
        self.q, self.P = q, P
        self.t += 1
        return self.q.copy()
