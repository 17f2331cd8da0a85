"""Pallas TPU kernel: the whole box-constrained ADMM solve in VMEM.

The fleet-scale constrained MHE path (MheSrb.cpp:272-349 inequality
capability; parameters_go1.yaml:37-50 OSQP settings) runs OSQP-semantics
ADMM over the block-tridiagonal normal equations. The XLA lanes
implementation (ops/admm.solve_box_tridiag_lanes) is correct and fast at
runtime, but its iteration scan inside the tick scan costs minutes of cold
TPU compile (the backend's loop passes scale badly with nesting). This
kernel runs the ENTIRE solve — ρ-epoch factorizations, α-relaxed
projection iterations, converged-freeze, adaptive-ρ updates, and the
active-set polish — inside one `pl.pallas_call` with every operand resident
in VMEM: the ~50-iteration loop never touches HBM, and Mosaic compiles it
in seconds.

Semantics are identical to ``solve_box_tridiag_lanes`` (same iterate
sequence; equivalence asserted at float64 in interpret mode and at f32
round-off on hardware — tests/test_qp_admm.py). Restrictions: A = I box
constraints (the MHE specialization), bounds shared across the fleet,
per-lane-tile reductions for the OSQP §3.4 residual checks.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from decentralized_ekf_mhe_tpu.pallas.tridiag_kernel import (
    LANE_TILE,
    _gj_inv,
    _matmul,
    _matmul_tn,
    _matvec,
    _matvec_t,
)


def _const_rows(vals: np.ndarray, like):
    """Materialize a constant (n,) vector as (n, Bt) rows (Pallas kernels
    may not capture array constants)."""
    return jnp.stack([jnp.full_like(like, float(v)) for v in vals], axis=0)


class ADMMKernelStatic(NamedTuple):
    """Trace-time constants baked into the kernel."""

    N: int
    s: int
    lb: tuple
    ub: tuple
    rho0: float
    sigma: float
    alpha: float
    iters: int
    E: int                 # rho_update_every
    adaptive: bool
    abs_tol: float
    rel_tol: float
    polish: bool
    polish_penalty: float


def _make_kernel(ks: ADMMKernelStatic, dtype):
    N, s = ks.N, ks.s
    sigma = dtype.type(ks.sigma)
    alpha = dtype.type(ks.alpha)
    one = dtype.type(1.0)
    lb = np.asarray(ks.lb, np.float64)
    ub = np.asarray(ks.ub, np.float64)
    eye_np = np.eye(s)
    check = ks.abs_tol > 0.0 or ks.rel_tol > 0.0

    def kernel(D_ref, U_ref, r_ref, z0_ref, y0_ref,
               x_ref, z_ref, y_ref, it_ref,
               Sinv_ref, rho_ref, done_ref):
        Bt = r_ref.shape[-1]
        lane = r_ref[0, 0]                       # (Bt,) template
        lb_c = _const_rows(lb, lane)             # (s,Bt)
        ub_c = _const_rows(ub, lane)
        rho_ref[0] = jnp.full_like(lane, float(ks.rho0))
        done_ref[0] = jnp.zeros_like(lane)
        it_ref[0] = jnp.zeros_like(lane, dtype=jnp.int32)

        r_all = r_ref[...]                       # (N,s,Bt) — VMEM resident
        z = z0_ref[...]
        y = y0_ref[...]
        x = z                                    # OSQP warm start incl. x

    # -- ρ-epoch factorization: block-Thomas chain into Sinv_ref ----------
        def eye_rows(scale):
            # (s,s,Bt) = scale[Bt] * I, from scalar constants
            rows = []
            for i in range(s):
                rows.append(jnp.stack(
                    [scale if eye_np[i, j] else jnp.zeros_like(scale)
                     for j in range(s)], axis=0))
            return jnp.stack(rows, axis=0)

        def factor():
            sr = sigma + rho_ref[0]              # (Bt,)
            aug0 = D_ref[0] + eye_rows(sr)
            Sinv = _gj_inv(aug0)
            Sinv_ref[0] = Sinv
            for j in range(1, N):
                Up = U_ref[j - 1]
                S_j = (D_ref[j] + eye_rows(sr)
                       - _matmul_tn(Up, _matmul(Sinv, Up)))
                Sinv = _gj_inv(S_j)
                Sinv_ref[j] = Sinv

        def sweep(rhs):
            """Substitution-only block-Thomas solve with the Sinv_ref chain."""
            ys = [rhs[0]]
            for j in range(1, N):
                ys.append(rhs[j] - _matvec_t(
                    U_ref[j - 1], _matvec(Sinv_ref[j - 1], ys[j - 1])))
            xs = [None] * N
            xs[N - 1] = _matvec(Sinv_ref[N - 1], ys[N - 1])
            for j in range(N - 2, -1, -1):
                xs[j] = _matvec(Sinv_ref[j],
                                ys[j] - _matvec(U_ref[j], xs[j + 1]))
            return jnp.stack(xs, axis=0)

        def T_apply(xv):
            outs = []
            for j in range(N):
                o = _matvec(D_ref[j], xv[j])
                if j < N - 1:
                    o = o + _matvec(U_ref[j], xv[j + 1])
                if j > 0:
                    o = o + _matvec_t(U_ref[j - 1], xv[j - 1])
                outs.append(o)
            return jnp.stack(outs, axis=0)

        factor()

        def body(it, carry):
            x, z, y = carry
            if ks.adaptive:
                @pl.when((it > 1) & (jax.lax.rem(it - 1, ks.E) == 0))
                def _():
                    factor()
            rho = rho_ref[0]                     # (Bt,)
            nd = one - done_ref[0]               # 1 where still iterating
            rhs = r_all + sigma * x + rho * z - y
            x_t = sweep(rhs)
            x_n = x + nd * (alpha * x_t + (one - alpha) * x - x)
            z_r = alpha * x_t + (one - alpha) * z
            z_c = jnp.minimum(jnp.maximum(z_r + y / rho, lb_c), ub_c)
            z_n = z + nd * (z_c - z)
            y_n = y + nd * (rho * (z_r - z_n))
            it_ref[0] = it_ref[0] + nd.astype(jnp.int32)

            if check or ks.adaptive:
                @pl.when(jax.lax.rem(it, ks.E) == 0)
                def _():
                    # OSQP §3.4 epoch-boundary residuals per lane
                    prim = jnp.max(jnp.abs(x_n - z_n), axis=(0, 1))
                    Tx = T_apply(x_n)
                    dual = jnp.max(jnp.abs(Tx - r_all + y_n), axis=(0, 1))
                    ps = jnp.maximum(jnp.max(jnp.abs(x_n), axis=(0, 1)),
                                     jnp.max(jnp.abs(z_n), axis=(0, 1)))
                    ds = jnp.maximum(
                        jnp.maximum(jnp.max(jnp.abs(Tx), axis=(0, 1)),
                                    jnp.max(jnp.abs(y_n), axis=(0, 1))),
                        jnp.max(jnp.abs(r_all), axis=(0, 1)))
                    done = done_ref[0]
                    if check:
                        conv = (
                            (prim <= ks.abs_tol + ks.rel_tol * ps)
                            & (dual <= ks.abs_tol + ks.rel_tol * ds))
                        done = jnp.maximum(done, conv.astype(done.dtype))
                        done_ref[0] = done
                    if ks.adaptive:
                        ratio = jnp.sqrt(
                            (prim / jnp.maximum(ps, 1e-12))
                            / jnp.maximum(dual / jnp.maximum(ds, 1e-12),
                                          1e-12))
                        rho_new = jnp.clip(rho_ref[0] * ratio, 1e-6, 1e6)
                        rho_ref[0] = jnp.where(done > 0, rho_ref[0], rho_new)

            return x_n, z_n, y_n

        x, z, y = jax.lax.fori_loop(1, ks.iters + 1, body, (x, z, y))

        if ks.polish:
            # active-set polish: pin detected bound-active dims by penalty
            # and re-solve exactly (OsqpEigen setPolish semantics)
            act_lo = (z <= lb_c).astype(z.dtype)
            act_hi = (z >= ub_c).astype(z.dtype)
            act = jnp.minimum(act_lo + act_hi, one)
            fin_lo = _const_rows(np.isfinite(lb).astype(np.float64), lane)
            fin_hi = _const_rows(np.isfinite(ub).astype(np.float64), lane)
            lb_fin = _const_rows(np.where(np.isfinite(lb), lb, 0.0), lane)
            ub_fin = _const_rows(np.where(np.isfinite(ub), ub, 0.0), lane)
            target = act_lo * fin_lo * lb_fin + (one - act_lo) * (
                act_hi * fin_hi * ub_fin)
            diag = jnp.stack(
                [jnp.stack([jnp.abs(D_ref[j][i, i]) for i in range(s)],
                           axis=0) for j in range(N)], axis=0)  # (N,s,Bt)
            pen = dtype.type(ks.polish_penalty) * (
                jnp.max(diag, axis=1, keepdims=True) + diag)
            ap = act * pen                        # (N,s,Bt)

            def factor_polish():
                def Dp(j):
                    add = jnp.stack(
                        [jnp.stack(
                            [ap[j, i] if eye_np[i, k] else
                             jnp.zeros_like(lane) for k in range(s)],
                            axis=0) for i in range(s)], axis=0)
                    return D_ref[j] + add

                Sinv = _gj_inv(Dp(0))
                Sinv_ref[0] = Sinv
                for j in range(1, N):
                    Up = U_ref[j - 1]
                    S_j = Dp(j) - _matmul_tn(Up, _matmul(Sinv, Up))
                    Sinv = _gj_inv(S_j)
                    Sinv_ref[j] = Sinv

            factor_polish()
            x = sweep(r_all + ap * target)

        x_ref[...] = x
        z_ref[...] = z
        y_ref[...] = y

    return kernel


@functools.partial(jax.jit, static_argnames=("static", "interpret"))
def _solve_padded(D, U, r, z0, y0, static: ADMMKernelStatic,
                  interpret=False):
    N, s, _, B = D.shape
    dtype = D.dtype
    grid = (B // LANE_TILE,)

    def spec(shape):
        nd = len(shape)
        return pl.BlockSpec(shape + (LANE_TILE,),
                            lambda i, nd=nd: (0,) * nd + (i,),
                            memory_space=pltpu.VMEM)

    kernel = _make_kernel(static, jnp.dtype(dtype))
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[spec((N, s, s)), spec((N - 1, s, s)), spec((N, s)),
                  spec((N, s)), spec((N, s))],
        out_specs=[spec((N, s)), spec((N, s)), spec((N, s)), spec((1,))],
        out_shape=[jax.ShapeDtypeStruct((N, s, B), dtype)] * 3
        + [jax.ShapeDtypeStruct((1, B), jnp.int32)],
        scratch_shapes=[
            pltpu.VMEM((N, s, s, LANE_TILE), dtype),   # Sinv chain
            pltpu.VMEM((1, LANE_TILE), dtype),         # rho
            pltpu.VMEM((1, LANE_TILE), dtype),         # done mask
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(D, U, r, z0, y0)
    return outs


def solve_box_lanes(D, U, r, lb, ub, settings, valid=None, z0=None, y0=None,
                    interpret=False):
    """Drop-in for ops.admm.solve_box_tridiag_lanes via the Pallas kernel.

    Same operands/semantics (lanes layout, shared (s,) bounds, optional
    shared (K,) warmup mask, warm-start iterates); returns an
    ops.admm.ADMMResult with per-instance final residuals computed outside
    the kernel. Pads the lane axis to a whole 128-lane tile.
    """
    from decentralized_ekf_mhe_tpu.ops import lanes as lanes_ops
    from decentralized_ekf_mhe_tpu.ops.admm import ADMMResult

    K, s = D.shape[0], D.shape[1]
    B = r.shape[-1]
    dtype = D.dtype
    eye_l = jnp.eye(s, dtype=dtype)[:, :, None]
    if valid is not None:
        v = valid[:, None, None, None].astype(dtype)
        D = D * v + eye_l[None] * (1.0 - v)
        r = r * valid[:, None, None].astype(dtype)
        vU = (valid[:-1] & valid[1:])[:, None, None, None].astype(dtype)
        U = U * vU

    z0 = jnp.zeros_like(r) if z0 is None else z0
    y0 = jnp.zeros_like(r) if y0 is None else y0

    pad = (-B) % LANE_TILE
    if pad:
        def pad_lane(a, diag=False):
            padded = jnp.concatenate(
                [a, jnp.zeros(a.shape[:-1] + (pad,), a.dtype)], axis=-1)
            if diag:
                mask = (jnp.arange(B + pad) >= B)
                padded = jnp.where(mask, eye_l[None], padded)
            return padded

        D_p, U_p = pad_lane(D, diag=True), pad_lane(U)
        r_p, z_p, y_p = pad_lane(r), pad_lane(z0), pad_lane(y0)
    else:
        D_p, U_p, r_p, z_p, y_p = D, U, r, z0, y0

    static = ADMMKernelStatic(
        N=K, s=s,
        lb=tuple(float(v) for v in np.asarray(lb)),
        ub=tuple(float(v) for v in np.asarray(ub)),
        rho0=float(settings.rho), sigma=float(settings.sigma),
        alpha=float(settings.alpha), iters=int(settings.iters),
        E=max(1, int(settings.rho_update_every)),
        adaptive=bool(settings.adaptive_rho),
        abs_tol=float(settings.abs_tol), rel_tol=float(settings.rel_tol),
        polish=bool(settings.polish),
        polish_penalty=float(settings.polish_penalty),
    )
    x, z, y, iters = _solve_padded(D_p, U_p, r_p, z_p, y_p, static,
                                   interpret=interpret)
    x, z, y, iters = x[..., :B], z[..., :B], y[..., :B], iters[0, :B]

    def T_apply(xv):
        out = lanes_ops.mv(D, xv)
        out = out.at[:-1].add(lanes_ops.mv(U, xv[1:]))
        out = out.at[1:].add(lanes_ops.mv_t(U, xv[:-1]))
        return out

    prim = jnp.max(jnp.abs(x - z), axis=(0, 1))
    dual = jnp.max(jnp.abs(T_apply(x) - r + y), axis=(0, 1))
    return ADMMResult(x, z, y, prim, dual, iters)
