"""Matmul-precision control for TPU correctness.

TPU matmuls default to bfloat16 inputs, whose 8-bit mantissa destroys the
SPD structure of the estimator's information matrices (observed: NaN
Cholesky/elimination pivots in the window solve). Every public kernel entry
point is wrapped in ``full_precision`` so the traced computation always uses
full float32 multiply accumulation regardless of global config. These are
(B, s≤21, s≤21) contractions — VPU-bound, so the highest-precision path
costs nothing measurable.
"""

from __future__ import annotations

import functools

import jax


def full_precision(fn):
    """Trace ``fn`` under jax.default_matmul_precision('highest')."""

    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        with jax.default_matmul_precision("highest"):
            return fn(*args, **kwargs)

    return wrapped
