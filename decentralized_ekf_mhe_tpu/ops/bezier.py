"""Cubic-Bezier VO interpolation carry — fixed-shape JAX port of C5.

The reference turns sparse ~30 Hz VO frames into per-tick equality-constraint
increments by fitting a cubic Bezier over the last 4 accumulated VO waypoints
and sampling it at the estimator rate (Bezier_simple.cpp:12-82, driven from
DecentralEst.cpp:915-933). Here the waypoint list is a fixed (4,3) buffer and
interpolation emits a fixed-length masked node array.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class BezierCarry(NamedTuple):
    pts: jnp.ndarray     # (4,3) control points, oldest..newest
    times: jnp.ndarray   # (4,)
    count: jnp.ndarray   # int32 number of points ever added (saturating view)
    p_accum: jnp.ndarray  # (3,) accumulated world-frame VO path (p_vo_accmulate_)


def init(dtype=jnp.float32) -> BezierCarry:
    return BezierCarry(
        pts=jnp.zeros((4, 3), dtype),
        times=jnp.zeros((4,), dtype),
        count=jnp.asarray(0, jnp.int32),
        p_accum=jnp.zeros((3,), dtype),
    )


def add_way_point(c: BezierCarry, p: jnp.ndarray, t_end) -> BezierCarry:
    """Push (p, t); keep the last 4 (Bezier_simple.cpp:12-27)."""
    full = c.count >= 4
    pts_roll = jnp.roll(c.pts, -1, axis=0).at[3].set(p)
    t_roll = jnp.roll(c.times, -1).at[3].set(t_end)
    idx = jnp.clip(c.count, 0, 3)
    pts_ins = c.pts.at[idx].set(p)
    t_ins = c.times.at[idx].set(t_end)
    return BezierCarry(
        pts=jnp.where(full, pts_roll, pts_ins),
        times=jnp.where(full, t_roll, t_ins),
        count=c.count + 1,
        p_accum=c.p_accum,
    )


def _bezier(u, P0, P1, P2, P3):
    """Cubic blend (Bezier_simple.cpp:73-82); u broadcasts over nodes."""
    u = u[..., None]
    return (
        u**3 * (-P0 + 3 * P1 - 3 * P2 + P3)
        + u**2 * (3 * P0 - 6 * P1 + 3 * P2)
        + u * (-3 * P0 + 3 * P1)
        + P0
    )


def interpolate_increments(c: BezierCarry, t_start, num, dt, max_nodes: int):
    """Sample ``num`` nodes from t_start at spacing dt; return per-node
    increments (diffs) of fixed length ``max_nodes`` plus a validity mask.

    diffs[0] = node_0 − 0 (node_pre seeded to zero, Bezier_simple.cpp:70) —
    the consumer skips it exactly as UpdateVOConstraints does
    (DecentralEst.cpp:993-999 uses _distances[i+1]).
    """
    t_interval = c.times[3] - c.times[0]
    u0 = (t_start - c.times[0]) / t_interval
    du = dt / t_interval
    i = jnp.arange(max_nodes, dtype=c.pts.dtype)
    u = u0 + du * i
    nodes = _bezier(u, c.pts[0], c.pts[1], c.pts[2], c.pts[3])
    node_prev = jnp.concatenate([jnp.zeros((1, 3), nodes.dtype), nodes[:-1]], axis=0)
    diffs = nodes - node_prev
    mask = i < num
    return diffs, nodes, mask
