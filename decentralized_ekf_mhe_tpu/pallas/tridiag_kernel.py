"""Pallas TPU kernel for the batched block-tridiagonal solve — the hot op.

Why a kernel: XLA lays the batched small matrices out as (B, s, s) with the
(s, s) dims on the (sublane, lane) tiles — at s ∈ {9..21} that pads 9→16
sublanes and 9→128 lanes, wasting ~93% of VPU width and HBM bandwidth, and
the per-step scan slices stream those padded tiles from HBM every iteration
(measured ≈ 11 ms/tick at B=1024 on v5e — the dominant cost of the MHE tick).

This kernel transposes to instance-on-lanes layout (N, s, s, B_tile): every
matrix entry is a (B_tile,)-vector across the minor axis, the whole window
lives in VMEM (~2.7 MB at N=20, s=9, B_tile=128), and the block-Thomas
forward/backward sweeps run as fully unrolled vector arithmetic:

    forward:  S_j = D_j − U_{j-1}ᵀ S_{j-1}⁻¹ U_{j-1},  y_j = r_j − U_{j-1}ᵀ S⁻¹y
    backward: x_j = S_j⁻¹ (y_j − U_j x_{j+1})

with the s×s inverses as unrolled pivot-free Gauss-Jordan (SPD blocks). The
math is identical to ops/tridiag.solve — tests assert equality to f32
round-off; warmup masking is applied by the caller before invoking.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Lanes per grid step. 128 = one physical VPU lane tile; larger multiples
# interleave independent per-lane chains in one instruction stream (more ILP
# for the serial-dependency-bound Schur chains) at the cost of VMEM.
# MEASURED (v5e, mega-kernel, T=2000/B=1024, 2026-08-21): 256 runs 8.74M
# ticks/s vs 128's 10.2M — the doubled live-temporary footprint forces
# spills that outweigh the ILP gain; 128 is the validated default.
# Overridable for experiments (DEM_LANE_TILE); read once at import.
LANE_TILE = int(os.environ.get("DEM_LANE_TILE", "128"))


def _matmul(A, B):
    """C[i,l,b] = Σ_k A[i,k,b]·B[k,l,b] for (s,s,Bt) operands, unrolled."""
    s = A.shape[0]
    C = A[:, 0, :][:, None, :] * B[0, :, :][None, :, :]
    for k in range(1, s):
        C = C + A[:, k, :][:, None, :] * B[k, :, :][None, :, :]
    return C


def _matmul_tn(A, B):
    """C[i,l,b] = Σ_k A[k,i,b]·B[k,l,b] (Aᵀ @ B), unrolled."""
    s = A.shape[0]
    C = A[0, :, :][:, None, :] * B[0, :, :][None, :, :]
    for k in range(1, s):
        C = C + A[k, :, :][:, None, :] * B[k, :, :][None, :, :]
    return C


def _matvec(A, v):
    """w[i,b] = Σ_k A[i,k,b]·v[k,b], unrolled."""
    s = A.shape[0]
    w = A[:, 0, :] * v[0, :][None, :]
    for k in range(1, s):
        w = w + A[:, k, :] * v[k, :][None, :]
    return w


def _matvec_t(A, v):
    """w[i,b] = Σ_k A[k,i,b]·v[k,b] (Aᵀ v), unrolled."""
    s = A.shape[0]
    w = A[0, :, :] * v[0, :][None, :]
    for k in range(1, s):
        w = w + A[k, :, :] * v[k, :][None, :]
    return w


def _gj_inv(A):
    """Pivot-free Gauss-Jordan inverse of (s,s,Bt), unrolled (SPD input)."""
    s, Bt = A.shape[0], A.shape[-1]
    eye = jnp.broadcast_to(
        jnp.eye(s, dtype=A.dtype)[:, :, None], (s, s, Bt)
    )
    aug = jnp.concatenate([A, eye], axis=1)  # (s, 2s, Bt)
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (s, 1, 1), 0)
    for i in range(s):
        # NOTE: an explicit reciprocal-then-multiply (1/piv * row) was
        # A/B-tested on v5e and measured ~2% SLOWER than the plain row
        # divide — Mosaic already strength-reduces the divide
        piv = aug[i, i, :][None, :]
        row = aug[i, :, :] / piv
        col = aug[:, i, :][:, None, :]
        # eliminating row i against itself zeroes it; re-insert `row` by mask
        # (value-level .at[].set lowers to scatter, unsupported by Mosaic)
        aug = jnp.where(row_ids == i, row[None, :, :], aug - col * row[None, :, :])
    return aug[:, s:, :]


def _chol(A):
    """Unrolled Cholesky of SPD (s,s,Bt): returns (L rows list-of-lists with
    None above the diagonal, rd) where rd[i] = 1/L[i][i] (reciprocals reused
    by the triangular solves — ~s³/3 mults vs the ~2s³ of _gj_inv)."""
    s = A.shape[0]
    L = [[None] * s for _ in range(s)]
    rd = [None] * s
    for k in range(s):
        d = A[k, k]
        for mth in range(k):
            d = d - L[k][mth] * L[k][mth]
        # clamp: Schur blocks are SPD in exact arithmetic; f32 roundoff on
        # ill-conditioned blocks must not reach sqrt of a negative
        d = jnp.sqrt(jnp.maximum(d, jnp.asarray(1e-30, A.dtype)))
        L[k][k] = d
        rd[k] = 1.0 / d
        for i in range(k + 1, s):
            e = A[i, k]
            for mth in range(k):
                e = e - L[i][mth] * L[k][mth]
            L[i][k] = e * rd[k]
    return L, rd


def _trsm_l(L, rd, B):
    """Solve L X = B for (s,n,Bt) B with L from _chol; returns rows list."""
    s = len(rd)
    X = [None] * s
    for i in range(s):
        acc = B[i]
        for mth in range(i):
            acc = acc - L[i][mth][None, :] * X[mth]
        X[i] = acc * rd[i][None, :]
    return X


def _trsv_l(L, rd, b):
    """Solve L z = b for (s,Bt) b; returns rows list."""
    s = len(rd)
    z = [None] * s
    for i in range(s):
        acc = b[i]
        for mth in range(i):
            acc = acc - L[i][mth] * z[mth]
        z[i] = acc * rd[i]
    return z


def _trsv_lt(L, rd, z):
    """Solve Lᵀ x = z for rows-list z; returns (s,Bt)."""
    s = len(rd)
    x = [None] * s
    for i in range(s - 1, -1, -1):
        acc = z[i]
        for mth in range(i + 1, s):
            acc = acc - L[mth][i] * x[mth]
        x[i] = acc * rd[i]
    return jnp.stack(x, axis=0)


def _kernel(D_ref, U_ref, r_ref, x_ref, Sinv_ref, y_ref):
    N = D_ref.shape[0]

    Sinv = _gj_inv(D_ref[0])
    Sinv_ref[0] = Sinv
    y = r_ref[0]
    y_ref[0] = y
    for j in range(1, N):
        U_prev = U_ref[j - 1]
        W = _matmul(Sinv, U_prev)
        S_j = D_ref[j] - _matmul_tn(U_prev, W)
        y = r_ref[j] - _matvec_t(U_prev, _matvec(Sinv, y))
        Sinv = _gj_inv(S_j)
        Sinv_ref[j] = Sinv
        y_ref[j] = y

    x = _matvec(Sinv, y)
    x_ref[N - 1] = x
    for j in range(N - 2, -1, -1):
        rhs = y_ref[j] - _matvec(U_ref[j], x)
        x = _matvec(Sinv_ref[j], rhs)
        x_ref[j] = x


def solve_lanes(D, U, r, interpret=False):
    """Solve with instance-on-lanes operands.

    Args:
      D: (N, s, s, B) diagonal blocks (already warmup-masked).
      U: (N-1, s, s, B) couplings.
      r: (N, s, B) right-hand side.
    Returns x: (N, s, B).
    """
    N, s, _, B = D.shape
    if B % LANE_TILE != 0:
        pad = LANE_TILE - B % LANE_TILE
        D = jnp.pad(D, ((0, 0),) * 3 + ((0, pad),),
                    constant_values=0.0)
        # keep padded diagonals identity so the inverse stays finite
        eye = jnp.eye(s, dtype=D.dtype)[None, :, :, None]
        mask = (jnp.arange(B + pad) >= B)[None, None, None, :]
        D = jnp.where(mask, eye, D)
        U = jnp.pad(U, ((0, 0),) * 3 + ((0, pad),))
        r = jnp.pad(r, ((0, 0),) * 2 + ((0, pad),))
        out = solve_lanes(D, U, r, interpret=interpret)
        return out[..., :B]

    grid = (B // LANE_TILE,)
    spec3 = pl.BlockSpec((N, s, s, LANE_TILE), lambda i: (0, 0, 0, i),
                         memory_space=pltpu.ANY if False else pltpu.VMEM)
    spec2 = pl.BlockSpec((N, s, LANE_TILE), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM)
    specU = pl.BlockSpec((N - 1, s, s, LANE_TILE), lambda i: (0, 0, 0, i),
                         memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[spec3, specU, spec2],
        out_specs=spec2,
        out_shape=jax.ShapeDtypeStruct((N, s, B), D.dtype),
        scratch_shapes=[
            pltpu.VMEM((N, s, s, LANE_TILE), D.dtype),
            pltpu.VMEM((N, s, LANE_TILE), D.dtype),
        ],
        interpret=interpret,
    )(D, U, r)


def solve_batched(D, U, r, valid=None, interpret=False):
    """Drop-in for ops.tridiag.solve on (K, B, s, s)/(K, B, s) operands.

    Applies warmup masking, transposes to lanes layout, runs the kernel, and
    transposes back. Requires a single leading batch axis.
    """
    K, s = D.shape[0], D.shape[-1]
    eye = jnp.eye(s, dtype=D.dtype)
    if valid is not None:
        v = valid[..., None, None].astype(D.dtype)
        D = D * v + eye * (1.0 - v)
        r = r * valid[..., None].astype(r.dtype)
        vU = (valid[:-1] & valid[1:])[..., None, None].astype(U.dtype)
        U = U * vU
    Dl = jnp.moveaxis(D, 1, -1)   # (K, s, s, B)
    Ul = jnp.moveaxis(U, 1, -1)
    rl = jnp.moveaxis(r, 1, -1)   # (K, s, B)
    x = solve_lanes(Dl, Ul, rl, interpret=interpret)
    return jnp.moveaxis(x, -1, 1)
