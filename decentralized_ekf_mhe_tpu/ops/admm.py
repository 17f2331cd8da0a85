"""OSQP-semantics ADMM solvers — the inequality-constrained QP path.

The reference delegates every MHE solve to OSQP (MheSrb.cpp:340-349) with the
settings surface of parameters_go1.yaml:37-50. The framework's default path
replaces that with an exact solve (ops/tridiag.py) because the Go1/Cassie
formulations are equality-only; this module supplies the genuinely
inequality-constrained path (state box constraints — the capability the
paper's MHE carries, README.md:5) with the same ρ/σ/α semantics and a fixed
iteration budget standing in for OSQP's wall-clock timeLimit
(parameters_go1.yaml:50).

Two entry points:
- ``solve_box_qp``: dense batched ADMM for min ½xᵀPx + qᵀx s.t. l ≤ Ax ≤ u.
- ``solve_box_tridiag``: the MHE specialization — P block-tridiagonal (D, U)
  and box constraints directly on states (A = I), so the ADMM x-update stays
  a banded solve: (D + (σ+ρ)I) x̃ = rhs via one block-Thomas sweep per
  iteration. Per-iteration cost identical to one unconstrained solve.

Both are jit/vmap/scan-safe with static iteration counts; they return primal
and dual residual norms for OSQP-style convergence diagnostics.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from decentralized_ekf_mhe_tpu.config import OSQPParams
from decentralized_ekf_mhe_tpu.ops import smallmat, tridiag


class ADMMSettings(NamedTuple):
    rho: float = 0.1
    sigma: float = 1e-5
    alpha: float = 1.6
    iters: int = 50
    adaptive_rho: bool = True       # OSQP adaptRho (parameters_go1.yaml:43)
    rho_update_every: int = 10
    # OSQP-style solution polish: after the ADMM loop, re-solve exactly with
    # the detected active bounds pinned (penalty form, scale-aware), which
    # removes the first-order method's tail error when the active set has
    # been identified (OsqpEigen setPolish; parameters_go1.yaml:44).
    polish: bool = True
    polish_penalty: float = 1e6

    @classmethod
    def from_osqp(cls, p: OSQPParams, iters=None):
        return cls(rho=p.rho, sigma=p.sigma, alpha=p.alpha,
                   iters=iters if iters is not None else min(p.max_iter, 200),
                   adaptive_rho=p.adapt_rho, polish=p.polish)


def _active_targets(z, lb, ub):
    """Detect bound-active dims of the (clipped, hence exactly-on-bound)
    z iterate; returns (act mask float, pinned target values)."""
    act_lo = z <= lb
    act_hi = z >= ub
    act = (act_lo | act_hi).astype(z.dtype)
    target = jnp.where(act_lo, lb, jnp.where(act_hi, ub, jnp.zeros_like(z)))
    target = jnp.where(jnp.isfinite(target), target, jnp.zeros_like(target))
    return act, target


def _rho_update(rho, prim, dual, prim_scale, dual_scale):
    """OSQP adaptive-rho rule: ρ ← ρ·sqrt(r_prim_rel / r_dual_rel), clamped."""
    ratio = jnp.sqrt(
        (prim / jnp.maximum(prim_scale, 1e-12))
        / jnp.maximum(dual / jnp.maximum(dual_scale, 1e-12), 1e-12)
    )
    return jnp.clip(rho * ratio, 1e-6, 1e6)


def solve_box_qp(P, q, A, l, u, settings: ADMMSettings, x0=None, z0=None, y0=None):
    """Dense batched ADMM for min ½xᵀPx + qᵀx s.t. l ≤ Ax ≤ u.

    OSQP iteration (operator-splitting form, α-relaxed):
        (P + σI + ρAᵀA) x̃ = σx − q + Aᵀ(ρz − y)
        x⁺ = αx̃ + (1−α)x
        z̃ = Ax̃;  z⁺ = clip(αz̃ + (1−α)z + y/ρ, l, u)
        y⁺ = y + ρ(αz̃ + (1−α)z − z⁺)
    Returns (x, z, y, prim_res, dual_res).
    """
    n = P.shape[-1]
    sigma, alpha = settings.sigma, settings.alpha
    At = jnp.swapaxes(A, -1, -2)
    AtA = At @ A
    eye = jnp.eye(n, dtype=P.dtype)

    x = jnp.zeros_like(q) if x0 is None else x0
    z = jnp.einsum("...ij,...j->...i", A, x) if z0 is None else z0
    y = jnp.zeros_like(z) if y0 is None else y0
    rho0 = jnp.asarray(settings.rho, P.dtype)

    def body(carry, it):
        x, z, y, rho = carry
        Kinv = smallmat.gj_inv(P + sigma * eye + rho * AtA)
        rhs = sigma * x - q + jnp.einsum("...ij,...j->...i", At, rho * z - y)
        x_t = jnp.einsum("...ij,...j->...i", Kinv, rhs)
        x_n = alpha * x_t + (1 - alpha) * x
        z_t = jnp.einsum("...ij,...j->...i", A, x_t)
        z_r = alpha * z_t + (1 - alpha) * z
        z_n = jnp.clip(z_r + y / rho, l, u)
        y_n = y + rho * (z_r - z_n)
        if settings.adaptive_rho:
            Ax = jnp.einsum("...ij,...j->...i", A, x_n)
            prim = jnp.max(jnp.abs(Ax - z_n), axis=-1)
            dual_v = (jnp.einsum("...ij,...j->...i", P, x_n) + q
                      + jnp.einsum("...ij,...j->...i", At, y_n))
            dual = jnp.max(jnp.abs(dual_v), axis=-1)
            ps = jnp.maximum(jnp.max(jnp.abs(Ax), axis=-1),
                             jnp.max(jnp.abs(z_n), axis=-1))
            ds = jnp.maximum(
                jnp.max(jnp.abs(jnp.einsum("...ij,...j->...i", P, x_n)), axis=-1),
                jnp.max(jnp.abs(q), axis=-1),
            )
            rho_new = _rho_update(rho, prim, dual, ps, ds)
            rho = jnp.where(it % settings.rho_update_every == 0, rho_new, rho)
        return (x_n, z_n, y_n, rho), None

    (x, z, y, _), _ = jax.lax.scan(
        body, (x, z, y, rho0), jnp.arange(1, settings.iters + 1)
    )
    if settings.polish:
        act, target = _active_targets(z, l, u)
        diagP = jnp.abs(jnp.diagonal(P, axis1=-2, axis2=-1))
        # per-constraint penalty scaled by the objective's magnitude
        pen = settings.polish_penalty * jnp.max(diagP, axis=-1, keepdims=True)
        P_p = P + At @ (((act * pen)[..., :, None]) * A)
        q_p = q - jnp.einsum("...ij,...j->...i", At, act * pen * target)
        x = jnp.einsum("...ij,...j->...i", smallmat.gj_inv(P_p), -q_p)
    Ax = jnp.einsum("...ij,...j->...i", A, x)
    prim = jnp.max(jnp.abs(Ax - z), axis=-1)
    dual = jnp.max(
        jnp.abs(
            jnp.einsum("...ij,...j->...i", P, x)
            + q
            + jnp.einsum("...ij,...j->...i", At, y)
        ),
        axis=-1,
    )
    return x, z, y, prim, dual


def solve_box_tridiag(D, U, r, lb, ub, settings: ADMMSettings,
                      valid=None, z0=None, y0=None):
    """Box-constrained block-tridiagonal QP: min ½xᵀTx − rᵀx s.t. lb ≤ x ≤ ub,
    with T given by diagonal blocks D (K,...,s,s) and couplings U.

    A = I, so the x-update matrix is T + (σ+ρ)I — still block tridiagonal —
    and each ADMM iteration costs one block-Thomas sweep. ±inf bounds make a
    dimension unconstrained (the reference's placeholder-bound idiom).

    Returns (x (K,...,s), z, y, prim_res, dual_res).
    """
    K, s = D.shape[0], D.shape[-1]
    sigma, alpha = settings.sigma, settings.alpha
    eye = jnp.eye(s, dtype=D.dtype)

    def T_apply_(xv):
        out = jnp.einsum("k...ij,k...j->k...i", D, xv)
        out = out.at[:-1].add(jnp.einsum("k...ij,k...j->k...i", U, xv[1:]))
        out = out.at[1:].add(jnp.einsum("k...ji,k...j->k...i", U, xv[:-1]))
        return out

    x = jnp.zeros_like(r)
    z = x if z0 is None else z0
    y = jnp.zeros_like(r) if y0 is None else y0
    rho0 = jnp.asarray(settings.rho, D.dtype)

    def body(carry, it):
        x, z, y, rho = carry
        D_aug = D + (sigma + rho) * eye
        rhs = r + sigma * x + rho * z - y
        x_t = tridiag.solve(D_aug, U, rhs, valid=valid)
        x_n = alpha * x_t + (1 - alpha) * x
        z_r = alpha * x_t + (1 - alpha) * z
        z_n = jnp.clip(z_r + y / rho, lb, ub)
        y_n = y + rho * (z_r - z_n)
        if settings.adaptive_rho:
            prim = jnp.max(jnp.abs(x_n - z_n), axis=(0, -1))
            Tx = T_apply_(x_n)
            dual = jnp.max(jnp.abs(Tx - r + y_n), axis=(0, -1))
            ps = jnp.maximum(jnp.max(jnp.abs(x_n), axis=(0, -1)),
                             jnp.max(jnp.abs(z_n), axis=(0, -1)))
            ds = jnp.maximum(jnp.max(jnp.abs(Tx), axis=(0, -1)),
                             jnp.max(jnp.abs(r), axis=(0, -1)))
            rho_new = _rho_update(rho, prim, dual, ps, ds)
            rho = jnp.where(it % settings.rho_update_every == 0, rho_new, rho)
        return (x_n, z_n, y_n, rho), None

    (x, z, y, _), _ = jax.lax.scan(
        body, (x, z, y, rho0), jnp.arange(1, settings.iters + 1)
    )

    if settings.polish:
        act, target = _active_targets(z, jnp.broadcast_to(lb, z.shape),
                                      jnp.broadcast_to(ub, z.shape))
        diagD = jnp.abs(jnp.diagonal(D, axis1=-2, axis2=-1))
        pen = settings.polish_penalty * (
            jnp.max(diagD, axis=-1, keepdims=True) + diagD
        )
        D_p = D + ((act * pen)[..., :, None]) * eye
        r_p = r + act * pen * target
        x = tridiag.solve(D_p, U, r_p, valid=valid)

    # residuals: prim = ‖x − z‖∞; dual = ‖Tx − r + y‖∞ (station. of x-block)
    def T_apply(xv):
        out = jnp.einsum("k...ij,k...j->k...i", D, xv)
        out = out.at[:-1].add(jnp.einsum("k...ij,k...j->k...i", U, xv[1:]))
        out = out.at[1:].add(
            jnp.einsum("k...ji,k...j->k...i", U, xv[:-1])
        )
        return out

    prim = jnp.max(jnp.abs(x - z), axis=(0, -1))
    dual = jnp.max(jnp.abs(T_apply(x) - r + y), axis=(0, -1))
    return x, z, y, prim, dual
