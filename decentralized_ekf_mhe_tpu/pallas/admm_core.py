"""Value-based box-ADMM core shared by the Pallas kernels.

The OSQP-semantics ADMM iteration (MheSrb.cpp:272-349 solver surface;
settings from parameters_go1.yaml:37-50) over the block-tridiagonal MHE
normal equations, written as pure functions of in-kernel VALUES in
instance-on-lanes layout ((N, s, s, Bt) / (N, s, Bt) with the lane tile Bt
minor). Two consumers:

- ``pallas/admm_kernel.py`` — the standalone whole-solve kernel (one solve
  per pallas_call, operands from HBM once).
- ``pallas/mhe_replay_kernel.py`` — the constrained mega-kernel variant,
  which calls ``admm_box_solve`` once per tick with the freshly assembled
  window system and the ring-carried warm-start iterates, all VMEM-resident.

Iterate semantics are IDENTICAL to ops/admm.solve_box_tridiag_lanes (same
ρ-epoch factorizations, α-relaxed projections, converged-freeze, adaptive-ρ
updates, active-set polish) — equivalence asserted at float64 in interpret
mode in tests/test_qp_admm.py. Bounds are per-lane (s, Bt) values (±inf ⇒
unconstrained dim), so Monte-Carlo fleets can sweep the box per instance
(the reference's per-run YAML bound construction, DecentralEst.cpp:222-348,
lifted to a fleet axis).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from decentralized_ekf_mhe_tpu.pallas.tridiag_kernel import (
    _gj_inv,
    _matmul,
    _matmul_tn,
    _matvec,
    _matvec_t,
)


class ADMMCoreStatic(NamedTuple):
    """Trace-time ADMM constants (ops/admm.ADMMSettings minus the bounds,
    which are runtime per-lane operands)."""

    N: int
    s: int
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

    @classmethod
    def from_settings(cls, st, N: int, s: int) -> "ADMMCoreStatic":
        """Build from an ops.admm.ADMMSettings."""
        return cls(
            N=int(N), s=int(s), rho0=float(st.rho), sigma=float(st.sigma),
            alpha=float(st.alpha), iters=int(st.iters),
            E=max(1, int(st.rho_update_every)),
            adaptive=bool(st.adaptive_rho),
            abs_tol=float(st.abs_tol), rel_tol=float(st.rel_tol),
            polish=bool(st.polish),
            polish_penalty=float(st.polish_penalty),
        )


def _eye_like(s, like):
    """(s,s,Bt) identity from a (Bt,) template."""
    return jnp.broadcast_to(
        jnp.eye(s, dtype=like.dtype)[:, :, None], (s, s) + like.shape
    )


def add_scalar_diag(D, sr):
    """D (N,s,s,Bt) + sr (Bt,)·I per block."""
    s = D.shape[1]
    eye = _eye_like(s, sr)          # (s,s,Bt)
    return D + eye[None] * sr[None, None, None, :]


def add_diag(D, ap):
    """D (N,s,s,Bt) + diag_embed(ap) for ap (N,s,Bt)."""
    s = D.shape[1]
    eye = jnp.eye(s, dtype=D.dtype)[None, :, :, None]
    return D + eye * ap[:, :, None, :]


def factor_chain(D_aug, U):
    """Block-Thomas factorization chain of the (already augmented) system:
    Sinv[j] = (D_aug[j] − U[j−1]ᵀ Sinv[j−1] U[j−1])⁻¹, stacked (N,s,s,Bt)."""
    N = D_aug.shape[0]
    Sinv = _gj_inv(D_aug[0])
    chain = [Sinv]
    for j in range(1, N):
        Up = U[j - 1]
        S_j = D_aug[j] - _matmul_tn(Up, _matmul(Sinv, Up))
        Sinv = _gj_inv(S_j)
        chain.append(Sinv)
    return jnp.stack(chain, axis=0)


def sweep_factored(Sinv, U, rhs):
    """Substitution-only block-Thomas solve with a factor_chain result."""
    N = Sinv.shape[0]
    ys = [rhs[0]]
    for j in range(1, N):
        ys.append(rhs[j] - _matvec_t(U[j - 1], _matvec(Sinv[j - 1], ys[j - 1])))
    xs = [None] * N
    xs[N - 1] = _matvec(Sinv[N - 1], ys[N - 1])
    for j in range(N - 2, -1, -1):
        xs[j] = _matvec(Sinv[j], ys[j] - _matvec(U[j], xs[j + 1]))
    return jnp.stack(xs, axis=0)


def t_apply(D, U, x):
    """Block-tridiagonal operator application (N,s,Bt)."""
    N = D.shape[0]
    outs = []
    for j in range(N):
        o = _matvec(D[j], x[j])
        if j < N - 1:
            o = o + _matvec(U[j], x[j + 1])
        if j > 0:
            o = o + _matvec_t(U[j - 1], x[j - 1])
        outs.append(o)
    return jnp.stack(outs, axis=0)


def admm_box_solve(D, U, r, z0, y0, lb, ub, ks: ADMMCoreStatic, dtype):
    """Run the full OSQP-semantics box-ADMM on in-kernel values.

    Args:
      D: (N,s,s,Bt) diagonal blocks (warmup-masked by the caller).
      U: (N-1,s,s,Bt) couplings.
      r: (N,s,Bt) rhs (solve is min ½xᵀTx − rᵀx s.t. lb ≤ x ≤ ub).
      z0, y0: (N,s,Bt) warm-start iterates (OSQP setWarmStart(true),
        DecentralEst.cpp:204); x warm-starts from z0.
      lb, ub: (s,Bt) per-lane bounds (±inf ⇒ unconstrained dim).
    Returns (x, z, y, iters) with iters (Bt,) int32 — iterations actually
    run per lane under the converged-freeze.
    """
    sigma = dtype.type(ks.sigma)
    alpha = dtype.type(ks.alpha)
    one = dtype.type(1.0)
    check = ks.abs_tol > 0.0 or ks.rel_tol > 0.0
    Bt = r.shape[-1]
    lb_b = lb[None]                  # (1,s,Bt) over the window axis
    ub_b = ub[None]

    # Seed the loop-carried vectors from kernel DATA (not splat constants):
    # Mosaic assigns splats a replicated layout, which cannot round-trip a
    # fori_loop carry whose body produces ordinary vectors ("Invalid
    # relayout ... replicated in destination but not in source").
    zero_lane = dtype.type(0.0) * r[0, 0]          # (Bt,) concrete zeros
    rho = dtype.type(ks.rho0) + zero_lane
    done = zero_lane
    itc = zero_lane                  # float iteration count, cast on return
    z = z0
    y = y0
    x = z                            # OSQP warm start incl. x

    def run_epoch(x, z, y, rho, done, itc, Sinv, length):
        """``length`` substitution-only iterations at a FIXED factorization
        (ρ only changes at epoch ends, so Sinv is loop-invariant — closed
        over by the fori body, not carried)."""

        def body(_, carry):
            x, z, y, itc = carry
            nd = one - done          # 1 where still iterating
            rhs = r + sigma * x + rho * z - y
            x_t = sweep_factored(Sinv, U, rhs)
            x_n = x + nd * (alpha * x_t + (one - alpha) * x - x)
            z_r = alpha * x_t + (one - alpha) * z
            z_c = jnp.minimum(jnp.maximum(z_r + y / rho, lb_b), ub_b)
            z_n = z + nd * (z_c - z)
            y_n = y + nd * (rho * (z_r - z_n))
            return x_n, z_n, y_n, itc + nd

        return jax.lax.fori_loop(0, length, body, (x, z, y, itc))

    def epoch_end(x, z, y, rho, done):
        # OSQP §3.4 epoch-boundary residuals per lane
        prim = jnp.max(jnp.abs(x - z), axis=(0, 1))
        Tx = t_apply(D, U, x)
        dual = jnp.max(jnp.abs(Tx - r + y), axis=(0, 1))
        ps = jnp.maximum(jnp.max(jnp.abs(x), axis=(0, 1)),
                         jnp.max(jnp.abs(z), axis=(0, 1)))
        ds = jnp.maximum(
            jnp.maximum(jnp.max(jnp.abs(Tx), axis=(0, 1)),
                        jnp.max(jnp.abs(y), axis=(0, 1))),
            jnp.max(jnp.abs(r), axis=(0, 1)))
        if check:
            conv = (
                (prim <= ks.abs_tol + ks.rel_tol * ps)
                & (dual <= ks.abs_tol + ks.rel_tol * ds))
            done = jnp.maximum(done, conv.astype(done.dtype))
        if ks.adaptive:
            ratio = jnp.sqrt(
                (prim / jnp.maximum(ps, 1e-12))
                / jnp.maximum(dual / jnp.maximum(ds, 1e-12), 1e-12))
            rho_new = jnp.clip(rho * ratio, 1e-6, 1e6)
            rho = jnp.where(done > 0, rho, rho_new)
        return rho, done

    # Trace-time epoch structure (identical iterate sequence to the flat
    # loop: refactorization at it = kE+1 with the ρ from the k-th epoch end,
    # residual check + ρ update at it = kE; no check after a partial final
    # epoch). The factorization lives OUTSIDE the iteration loop, so the
    # fori carry is just (x, z, y, itc).
    n_full, rem = divmod(int(ks.iters), max(1, ks.E))
    for e in range(n_full):
        Sinv = factor_chain(add_scalar_diag(D, sigma + rho), U)
        x, z, y, itc = run_epoch(x, z, y, rho, done, itc, Sinv, ks.E)
        if check or ks.adaptive:
            rho, done = epoch_end(x, z, y, rho, done)
        if not ks.adaptive and e == 0:
            break                    # fixed ρ: one factorization suffices
    if not ks.adaptive and n_full > 1:
        # remaining full epochs at the fixed factorization
        for e in range(1, n_full):
            x, z, y, itc = run_epoch(x, z, y, rho, done, itc, Sinv, ks.E)
            if check:
                rho, done = epoch_end(x, z, y, rho, done)
    if rem:
        Sinv = (factor_chain(add_scalar_diag(D, sigma + rho), U)
                if (ks.adaptive or n_full == 0) else Sinv)
        x, z, y, itc = run_epoch(x, z, y, rho, done, itc, Sinv, rem)
    iters = itc.astype(jnp.int32)

    if ks.polish:
        # active-set polish: pin detected bound-active dims by penalty and
        # re-solve exactly (OsqpEigen setPolish; ops/admm._active_targets)
        act_lo = (z <= lb_b).astype(z.dtype)
        act_hi = (z >= ub_b).astype(z.dtype)
        act = jnp.minimum(act_lo + act_hi, one)
        # zero non-finite bounds BEFORE forming the target: 0·∞ is NaN
        lb_fin = jnp.where(jnp.isfinite(lb_b), lb_b, jnp.zeros_like(lb_b))
        ub_fin = jnp.where(jnp.isfinite(ub_b), ub_b, jnp.zeros_like(ub_b))
        target = act_lo * lb_fin + (one - act_lo) * act_hi * ub_fin
        N, s = ks.N, ks.s
        diag = jnp.stack(
            [jnp.stack([D[j, i, i] for i in range(s)], axis=0)
             for j in range(N)], axis=0)        # (N,s,Bt)
        pen = dtype.type(ks.polish_penalty) * (
            jnp.max(diag, axis=1, keepdims=True) + diag)
        ap = act * pen
        Sinv_p = factor_chain(add_diag(D, ap), U)
        x = sweep_factored(Sinv_p, U, r + ap * target)

    return x, z, y, iters
