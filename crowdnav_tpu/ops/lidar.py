"""Batched 360-beam lidar raycast against circle pedestrians + room walls.

TPU-native equivalent of the `libgazebo_ros_laser` plugin as configured in
`turtlebot3_description/urdf/turtlebot3_burger.gazebo.xacro:150-177`:
360 beams over [0, 2pi), range [0.08, 0.6] m, zero noise. The observation
drops the duplicated last beam and reverses scan order
(`utils.get_scan_ranges:375-392`); combined with the world-coordinate
conversion `utils.convert_laserscan_to_coordinate:110-126`
(``x + s*cos(th_i - yaw)``, ``y - s*sin(th_i - yaw)``), beam ``i`` of the
*observation* points at world angle ``yaw - i * 1deg`` — i.e. index 0 is the
robot heading and indices sweep clockwise. We generate the observation-order
scan directly.

This is the hottest op of the engine (N_env x 359 beams x (P circles + box)).
Two TPU layout rules shape the code:

- the beam axis (359 -> 3 lane tiles) is kept minor-most everywhere; packing
  xy into a trailing dim of 2, or circles into a trailing dim of P=14, would
  leave the 128-lane VPU registers ~90% empty. Hence component-wise (x, y)
  scalars-of-vectors instead of ``(..., 2)`` arrays, and the circle axis on
  the sublane (second-minor) dimension.
- ``cos/sin(yaw - i deg)`` is expanded via the angle-addition identity
  against compile-time-constant per-beam tables, so each env spends 2
  transcendentals instead of ``2 * n_scans``.

A Pallas-tiled variant lives in `crowdnav_tpu.ops.lidar_pallas` (documented
fallback: XLA's fusion of this path into the surrounding step wins on chip,
`results/r4/README.md`).
"""
from __future__ import annotations

import jax.numpy as jnp


def _beam_trig(yaw, n_scans: int):
    """Per-beam world-frame direction components ``(dx, dy)``, each
    ``(n_scans,)`` with the beam axis minor-most."""
    idx = jnp.arange(n_scans, dtype=jnp.float32)
    a = idx * (jnp.pi / 180.0)
    ca, sa = jnp.cos(a), jnp.sin(a)   # constant-folded by XLA
    cy, sy = jnp.cos(yaw), jnp.sin(yaw)
    return cy * ca + sy * sa, sy * ca - cy * sa


def beam_directions(yaw, n_scans: int):
    """(n_scans, 2) world-frame unit directions for the observation beams."""
    dx, dy = _beam_trig(yaw, n_scans)
    return jnp.stack([dx, dy], axis=-1)


def _box_inside(px, py, dx, dy, half):
    """Component-wise wall distance; see :func:`raycast_box_inside`."""
    eps = 1e-12
    fx = jnp.where(jnp.abs(dx) < eps, eps, dx)
    fy = jnp.where(jnp.abs(dy) < eps, eps, dy)
    tx = (jnp.sign(fx) * half - px) / fx
    ty = (jnp.sign(fy) * half - py) / fy
    tx = jnp.where(jnp.abs(dx) < eps, jnp.inf, tx)
    ty = jnp.where(jnp.abs(dy) < eps, jnp.inf, ty)
    return jnp.minimum(tx, ty)


def _circles(px, py, dx, dy, centers, radius):
    """Component-wise circle raycast: min hit distance per beam, (B,).

    Layout: ``(P, B)`` intermediates — circles on sublanes, beams on lanes.
    """
    relx = centers[:, 0] - px                           # (P,)
    rely = centers[:, 1] - py
    b = relx[:, None] * dx[None, :] + rely[:, None] * dy[None, :]   # (P, B)
    rel2 = (relx * relx + rely * rely)[:, None]         # (P, 1)
    d2 = rel2 - b * b
    disc = radius * radius - d2
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    t = b - sq
    hit = (disc >= 0.0) & (t >= 0.0)
    t = jnp.where(hit, t, jnp.inf)
    return jnp.min(t, axis=0)


def raycast_box_inside(pos, dirs, half):
    """Distance to the inner wall faces of the axis-aligned square room
    [-half, half]^2, for a single ray origin ``pos: (2,)`` strictly inside
    (batch via ``vmap``, as all in-repo callers do). Exact: the exit
    distance along each axis is ``(half*sign(d) - p) / d``; the wall hit is
    the smaller of the two."""
    return _box_inside(pos[0], pos[1], dirs[..., 0], dirs[..., 1], half)


def raycast_circles(pos, dirs, centers, radius):
    """Min distance per beam to any of the circles.

    ``pos`` (2,) single origin (batch via ``vmap``), ``dirs`` (B, 2),
    ``centers`` (P, 2) -> (B,). Misses are +inf.
    """
    return _circles(pos[0], pos[1], dirs[..., 0], dirs[..., 1],
                    centers, radius)


def scan(pos, yaw, ped_pos, ped_radius, room_half_inner,
         max_range, min_range, n_scans: int):
    """Full observation-order lidar scan: (n_scans,) float32 in
    [min_range, max_range], exactly ``max_range`` on free beams."""
    dx, dy = _beam_trig(yaw, n_scans)
    t = _box_inside(pos[0], pos[1], dx, dy, room_half_inner)
    if ped_pos.shape[0] > 0:
        t = jnp.minimum(t, _circles(pos[0], pos[1], dx, dy,
                                    ped_pos, ped_radius))
    return jnp.clip(t, min_range, max_range).astype(jnp.float32)


def scan_points(pos, yaw, scans, n_scans: int):
    """World-frame cartesian endpoint of every observation beam.

    Matches `utils.convert_laserscan_to_coordinate:110-126` with
    ``global_coord="gazebo"`` (robot-pose offset, 3-decimal rounding), given
    that our scans are already in observation order:
    ``p_i = pos + s_i * (cos(th_i - yaw), -sin(th_i - yaw))`` with
    ``th_i = i deg``; trig identity makes that equal to our beam directions.
    """
    dirs = beam_directions(yaw, n_scans)
    pts = pos[None, :] + scans[:, None] * dirs
    return jnp.round(pts, 3)
