"""Numpy oracle of the MHE QP — full-history dense KKT solve.

Mirrors the reference's registry-style QP assembly semantics
(MheSrb.hpp/cpp: addVariable/addCost/addConstraints + dependencies, VO
equality-bound updates) and the estimator's formulation sequence
(DecentralEst.cpp:200-351 InitializeMHE, :353-585 UpdateMHE,
:987-1009 UpdateVOConstraints), but keeps the ENTIRE history (no
marginalization) and solves the equality-constrained QP exactly via its KKT
system — the unique optimum OSQP iterates toward. Marginalization in the
package under test must leave the last-window states bit-identical to this
full-history solution (Schur elimination of a convex quadratic is exact).
"""

import numpy as np

from tests.ref_impl.kf_ref import G_S, RefAssembly


class DenseQP:
    """String-keyed cost/constraint registry + exact KKT solve."""

    def __init__(self):
        self.var = {}        # name -> (start, size)
        self.nvar = 0
        self.costs = {}      # name -> dict(deps={var: A}, b, Q)
        self.cons = {}       # name -> dict(deps={var: A}, lb, ub, equality)
        self.con_order = []

    def add_variable(self, name, size):
        self.var[name] = (self.nvar, size)
        self.nvar += size

    def add_cost(self, name, b, Q):
        self.costs[name] = dict(deps={}, b=np.array(b, float), Q=np.array(Q, float))

    def add_cost_dep(self, name, var, A):
        self.costs[name]["deps"][var] = np.array(A, float)

    def add_constraint(self, name, lb, ub, equality=True):
        self.cons[name] = dict(
            deps={}, lb=np.array(lb, float), ub=np.array(ub, float), equality=equality
        )
        self.con_order.append(name)

    def add_con_dep(self, name, var, A):
        self.cons[name]["deps"][var] = np.array(A, float)

    def update_bound(self, name, lb, ub, equality):
        c = self.cons[name]
        c["lb"], c["ub"], c["equality"] = np.array(lb, float), np.array(ub, float), equality

    def solve(self):
        n = self.nvar
        H = np.zeros((n, n))
        g = np.zeros(n)
        for c in self.costs.values():
            for vi, Ai in c["deps"].items():
                si, zi = self.var[vi]
                for vj, Aj in c["deps"].items():
                    sj, zj = self.var[vj]
                    H[si:si + zi, sj:sj + zj] += Ai.T @ c["Q"] @ Aj
                g[si:si + zi] += -Ai.T @ c["Q"] @ c["b"]
        rows = []
        vals = []
        for name in self.con_order:
            c = self.cons[name]
            if not np.all(np.isfinite(c["lb"])):
                continue  # ±inf placeholder: inactive (VO before data arrives)
            A = np.zeros((len(c["lb"]), n))
            for vi, Ai in c["deps"].items():
                si, zi = self.var[vi]
                A[:, si:si + zi] += Ai
            rows.append(A)
            vals.append(c["lb"])
        if rows:
            A = np.vstack(rows)
            cvec = np.concatenate(vals)
            m = A.shape[0]
            KKT = np.block([[H, A.T], [A, np.zeros((m, m))]])
            rhs = np.concatenate([-g, cvec])
            sol = np.linalg.solve(KKT, rhs)
            return sol[:n]
        return np.linalg.solve(H, -g)


class RefBezier:
    """Oracle of Bezier_simple.cpp: 4-point cubic + per-dt increments."""

    def __init__(self):
        self.pts = []
        self.times = []

    def add_way_point(self, p, t_end):
        self.pts.append(np.array(p, float))
        self.times.append(float(t_end))
        if len(self.pts) > 4:
            self.pts.pop(0)
            self.times.pop(0)
        self.t_interval = self.times[-1] - self.times[0]

    def interpolate(self, u, P0, P1, P2, P3):
        return (
            u**3 * (-P0 + 3 * P1 - 3 * P2 + P3)
            + u**2 * (3 * P0 - 6 * P1 + 3 * P2)
            + u * (-3 * P0 + 3 * P1)
            + P0
        )

    def interpolate_waypoint(self, t_start, num, dt):
        """set_interval + interpolate_waypoint (Bezier_simple.cpp:29-71)."""
        P0, P1, P2, P3 = self.pts[-4], self.pts[-3], self.pts[-2], self.pts[-1]
        u0 = (t_start - self.times[0]) / self.t_interval
        du = dt / self.t_interval
        node_pre = np.zeros(3)
        dists, nodes = [], []
        for i in range(num):
            node = self.interpolate(u0 + du * i, P0, P1, P2, P3)
            dists.append(node - node_pre)
            node_pre = node
            nodes.append(node)
        return dists, nodes


class RefMHEDense:
    """Full-history MHE oracle following DecentralizedEstimation's sequence."""

    def __init__(self, params):
        self.p = params
        self.asm = RefAssembly(params)
        self.qp = DenseQP()
        self.N = params.N
        self.dt = params.dt
        self.s, self.m, self.c = params.dim_state, params.dim_meas, params.dim_cam
        self.A_meas = self.asm.a_meas()
        self.bez = RefBezier()
        self.p_vo_accum = np.zeros(3)
        self.R_hist = []
        self.Q_vo_p = np.diag(1.0 / np.asarray(params.vo_p_std, float) ** 2)
        self.prev = None  # (R, accel_s) of previous tick

    def initialize(self, R, omega, p_foot, J_foot, dq, contact):
        s, m = self.s, self.m
        b0, _, Q0 = self.asm.measurement(R, omega, p_foot, J_foot, dq, contact)
        x_prior, _, Q_prior = self.asm.prior(b0)
        self.qp.add_variable("x_0", s)
        self.qp.add_cost("Prior_0", x_prior, Q_prior)
        self.qp.add_cost_dep("Prior_0", "x_0", np.eye(s))
        self.qp.add_variable("v_0", m)
        self.qp.add_constraint("Measurement_0", b0, b0)
        self.qp.add_con_dep("Measurement_0", "x_0", self.A_meas)
        self.qp.add_con_dep("Measurement_0", "v_0", -np.eye(m))
        self.qp.add_cost("Measurement_0", np.zeros(m), Q0)
        self.qp.add_cost_dep("Measurement_0", "v_0", np.eye(m))
        self.R_hist.append(R)
        self.prev = (R, None)

    def update(self, T, R, accel_b, omega, p_foot, J_foot, dq, contact,
               vo=None):
        """One UpdateMHE(T) (+ optional VO event processed this tick).

        vo: None or (dp_body, tick_pre, tick_now) — pre-synchronized indices.
        """
        s, m, c = self.s, self.m, self.c
        qp = self.qp
        R_prev = self.R_hist[-1]
        accel_s_prev = self.accel_s_prev  # set by previous update's stack push

        qp.add_variable(f"w_{T-1}", s)
        qp.add_variable(f"vcam_{T-1}", c)
        qp.add_variable(f"x_{T}", s)
        qp.add_variable(f"v_{T}", m)

        # dynamics read the T−1 stacks (R, accel_s, AND contact — UpdateMHE's
        # contact_input_stack_.back() at DecentralEst.cpp:436 precedes the push)
        A_dyn, b_dyn, _, Q_dyn = self.asm.dynamics(
            R_prev, accel_s_prev, self.contact_prev
        )
        qp.add_constraint(f"Dynamic_{T-1}", b_dyn, b_dyn)
        qp.add_con_dep(f"Dynamic_{T-1}", f"w_{T-1}", -np.eye(s))
        qp.add_con_dep(f"Dynamic_{T-1}", f"x_{T}", -np.eye(s))
        qp.add_con_dep(f"Dynamic_{T-1}", f"x_{T-1}", A_dyn)
        qp.add_cost(f"Dynamic_{T-1}", np.zeros(s), Q_dyn)
        qp.add_cost_dep(f"Dynamic_{T-1}", f"w_{T-1}", np.eye(s))

        P = np.zeros((c, s))
        P[:, :3] = np.eye(3)
        Q_cam = R_prev @ self.Q_vo_p @ R_prev.T
        inf = np.full(c, np.inf)
        qp.add_constraint(f"VO_measurement_{T-1}", -inf, inf, equality=False)
        qp.add_con_dep(f"VO_measurement_{T-1}", f"x_{T-1}", P)
        qp.add_con_dep(f"VO_measurement_{T-1}", f"x_{T}", -P)
        qp.add_con_dep(f"VO_measurement_{T-1}", f"vcam_{T-1}", -np.eye(c))
        qp.add_cost(f"VO_measurement_{T-1}", np.zeros(c), Q_cam)
        qp.add_cost_dep(f"VO_measurement_{T-1}", f"vcam_{T-1}", np.eye(c))

        # GetMeasurement(T): push current R, process VO sync (DecentralEst.cpp:863-985)
        self.R_hist.append(R)
        if vo is not None:
            self._process_vo(T, *vo)

        bm, _, Qm = self.asm.measurement(R, omega, p_foot, J_foot, dq, contact)
        qp.add_constraint(f"Measurement_{T}", bm, bm)
        qp.add_con_dep(f"Measurement_{T}", f"x_{T}", self.A_meas)
        qp.add_con_dep(f"Measurement_{T}", f"v_{T}", -np.eye(m))
        qp.add_cost(f"Measurement_{T}", np.zeros(m), Qm)
        qp.add_cost_dep(f"Measurement_{T}", f"v_{T}", np.eye(m))

        if self.vo_pending:
            self._apply_vo_bounds(T)
            self.vo_pending = False

    # -- measurement-side state kept across calls
    accel_s_prev = None
    contact_prev = None
    vo_pending = False
    _vo_insert = None

    def push_inputs(self, R, accel_b, contact):
        """Record accel_s/R/contact for the *next* tick's dynamics (stack
        semantics: UpdateMHE reads .back() before GetMeasurement pushes)."""
        self.accel_s_prev = R @ accel_b + G_S
        self.contact_prev = np.array(contact)

    def _process_vo(self, T, dp_body, tick_pre, tick_now):
        """GetMeasurement's VO sync + Bezier block (DecentralEst.cpp:883-945)."""
        R_pre = self.R_hist[tick_pre]
        self.p_vo_accum = self.p_vo_accum + R_pre @ dp_body
        window_start = T - min(self.N, T)
        start = max(window_start, tick_pre)
        self.bez.add_way_point(self.p_vo_accum, tick_now * self.dt)
        if tick_now > window_start and len(self.bez.pts) >= 4:
            num = tick_now - start + 1
            dists, _ = self.bez.interpolate_waypoint(start * self.dt, num, self.dt)
            self._vo_insert = (start, dists)
            self.vo_pending = True

    def _apply_vo_bounds(self, T):
        """UpdateVOConstraints (DecentralEst.cpp:987-1009): equality bound
        -diff on VO_measurement_{start+i} for i in 0..num-2, using dists[i+1]."""
        start, dists = self._vo_insert
        for i in range(len(dists) - 1):
            name = f"VO_measurement_{start + i}"
            if name in self.qp.cons:
                d = dists[i + 1]
                self.qp.update_bound(name, -d, -d, True)

    def solve_x(self, T):
        sol = self.qp.solve()
        st, sz = self.qp.var[f"x_{T}"]
        return sol[st:st + sz]

    def solve_all_x(self, T_list):
        sol = self.qp.solve()
        return {t: sol[self.qp.var[f"x_{t}"][0]: self.qp.var[f"x_{t}"][0] + self.s]
                for t in T_list}


def run_oracle(params, log, T_end, use_gt_R=True, with_vo=True):
    """Drive the oracle over a SynthLog for T_end ticks; returns x_T sequence."""
    ref = RefMHEDense(params)
    xs = []
    for k in range(T_end):
        R = log.R_sb_gt[k]
        vo = None
        if with_vo and log.vo_active[k] and k > 0:
            vo = (log.vo_dp_body[k], int(log.vo_tick_pre[k]), int(log.vo_tick_now[k]))
        if k == 0:
            ref.initialize(R, log.omega_b[k], log.p_foot[k], log.J_foot[k],
                           log.dq[k], log.contact[k])
        else:
            ref.update(k, R, log.accel_b[k], log.omega_b[k], log.p_foot[k],
                       log.J_foot[k], log.dq[k], log.contact[k], vo=vo)
        ref.push_inputs(R, log.accel_b[k], log.contact[k])
        xs.append(ref.solve_x(k))
    return np.stack(xs)
