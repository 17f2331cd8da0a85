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
in seconds. The iteration math lives in pallas/admm_core.py, shared with
the constrained mega-kernel (pallas/mhe_replay_kernel.py).

Semantics are identical to ``solve_box_tridiag_lanes`` (same iterate
sequence; equivalence asserted at float64 in interpret mode and at f32
round-off on hardware — tests/test_qp_admm.py). Restrictions: A = I box
constraints (the MHE specialization), per-lane-tile reductions for the
OSQP §3.4 residual checks. Bounds are PER-LANE (s,B) operands (a shared
(s,) box broadcasts) so Monte-Carlo fleets can sweep the box per instance
(the reference's per-run YAML bound construction, DecentralEst.cpp:222-348,
lifted to a fleet axis).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from decentralized_ekf_mhe_tpu.pallas.admm_core import (
    ADMMCoreStatic,
    admm_box_solve,
)
from decentralized_ekf_mhe_tpu.pallas.tridiag_kernel import LANE_TILE

# re-export for backward compatibility (pre-r05 name)
ADMMKernelStatic = ADMMCoreStatic


def _make_kernel(ks: ADMMCoreStatic, dtype):
    def kernel(D_ref, U_ref, r_ref, z0_ref, y0_ref, lb_ref, ub_ref,
               x_ref, z_ref, y_ref, it_ref):
        x, z, y, iters = admm_box_solve(
            D_ref[...], U_ref[...], r_ref[...], z0_ref[...], y0_ref[...],
            lb_ref[...], ub_ref[...], ks, dtype,
        )
        x_ref[...] = x
        z_ref[...] = z
        y_ref[...] = y
        it_ref[0] = iters

    return kernel


@functools.partial(jax.jit, static_argnames=("static", "interpret"))
def _solve_padded(D, U, r, z0, y0, lb, ub, static: ADMMCoreStatic,
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
                  spec((N, s)), spec((N, s)), spec((s,)), spec((s,))],
        out_specs=[spec((N, s)), spec((N, s)), spec((N, s)), spec((1,))],
        out_shape=[jax.ShapeDtypeStruct((N, s, B), dtype)] * 3
        + [jax.ShapeDtypeStruct((1, B), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(D, U, r, z0, y0, lb, ub)
    return outs


def broadcast_bounds(lb, ub, s, B, dtype):
    """Normalize (s,) shared or (s,B) per-lane bounds to (s,B) arrays."""
    lb = jnp.asarray(lb, dtype)
    ub = jnp.asarray(ub, dtype)
    if lb.ndim == 1:
        lb = jnp.broadcast_to(lb[:, None], (s, B))
    if ub.ndim == 1:
        ub = jnp.broadcast_to(ub[:, None], (s, B))
    return lb, ub


def solve_box_lanes(D, U, r, lb, ub, settings, valid=None, z0=None, y0=None,
                    interpret=False):
    """Drop-in for ops.admm.solve_box_tridiag_lanes via the Pallas kernel.

    Same operands/semantics (lanes layout, (s,) shared or (s,B) per-lane
    bounds, optional shared (K,) warmup mask, warm-start iterates); returns
    an ops.admm.ADMMResult with per-instance final residuals computed
    outside the kernel. Pads the lane axis to a whole 128-lane tile.
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
        r = r * valid[:, None, None].astype(r.dtype)
        vU = (valid[:-1] & valid[1:])[:, None, None, None].astype(dtype)
        U = U * vU

    z0 = jnp.zeros_like(r) if z0 is None else z0
    y0 = jnp.zeros_like(r) if y0 is None else y0
    lb_l, ub_l = broadcast_bounds(lb, ub, s, B, dtype)

    pad = (-B) % LANE_TILE
    if pad:
        def pad_lane(a, diag=False, fill=0.0):
            padded = jnp.concatenate(
                [a, jnp.full(a.shape[:-1] + (pad,), fill, a.dtype)], axis=-1)
            if diag:
                mask = (jnp.arange(B + pad) >= B)
                padded = jnp.where(mask, eye_l[None], padded)
            return padded

        D_p, U_p = pad_lane(D, diag=True), pad_lane(U)
        r_p, z_p, y_p = pad_lane(r), pad_lane(z0), pad_lane(y0)
        # padded lanes are unconstrained (±inf box): their identity systems
        # solve to zero and never trip NaNs in the projection
        lb_p = pad_lane(lb_l, fill=-np.inf)
        ub_p = pad_lane(ub_l, fill=np.inf)
    else:
        D_p, U_p, r_p, z_p, y_p = D, U, r, z0, y0
        lb_p, ub_p = lb_l, ub_l

    static = ADMMCoreStatic.from_settings(settings, N=K, s=s)
    x, z, y, iters = _solve_padded(D_p, U_p, r_p, z_p, y_p, lb_p, ub_p,
                                   static, interpret=interpret)
    x, z, y, iters = x[..., :B], z[..., :B], y[..., :B], iters[0, :B]

    def T_apply(xv):
        out = lanes_ops.mv(D, xv)
        out = out.at[:-1].add(lanes_ops.mv(U, xv[1:]))
        out = out.at[1:].add(lanes_ops.mv_t(U, xv[:-1]))
        return out

    prim = jnp.max(jnp.abs(x - z), axis=(0, 1))
    dual = jnp.max(jnp.abs(T_apply(x) - r + y), axis=(0, 1))
    return ADMMResult(x, z, y, prim, dual, iters)
