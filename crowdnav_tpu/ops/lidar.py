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
The XLA path below broadcasts it into one fused reduction; a Pallas-tiled
variant lives in `crowdnav_tpu.ops.lidar_pallas`.
"""
from __future__ import annotations

import jax.numpy as jnp


def beam_directions(yaw, n_scans: int):
    """(n_scans, 2) world-frame unit directions for the observation beams."""
    idx = jnp.arange(n_scans, dtype=jnp.float32)
    ang = yaw - idx * (jnp.pi / 180.0)
    return jnp.stack([jnp.cos(ang), jnp.sin(ang)], axis=-1)


def raycast_box_inside(pos, dirs, half):
    """Distance to the inner wall faces of the axis-aligned square room
    [-half, half]^2, for a ray origin strictly inside. Exact: the exit
    distance along each axis is ``(half*sign(d) - p) / d``; the wall hit is
    the smaller of the two."""
    safe = jnp.where(jnp.abs(dirs) < 1e-12, 1e-12, dirs)
    t_axis = (jnp.sign(safe) * half - pos) / safe
    t_axis = jnp.where(jnp.abs(dirs) < 1e-12, jnp.inf, t_axis)
    return jnp.min(t_axis, axis=-1)


def raycast_circles(pos, dirs, centers, radius):
    """Min distance per beam to any of the circles.

    ``dirs`` (B, 2), ``centers`` (P, 2) -> (B,). Misses are +inf.
    """
    rel = centers - pos                                 # (P, 2)
    b = dirs @ rel.T                                    # (B, P)
    rel2 = jnp.sum(rel * rel, axis=-1)[None, :]         # (1, P)
    d2 = rel2 - b * b
    disc = radius * radius - d2
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    t = b - sq
    hit = (disc >= 0.0) & (t >= 0.0)
    t = jnp.where(hit, t, jnp.inf)
    return jnp.min(t, axis=-1)


def scan(pos, yaw, ped_pos, ped_radius, room_half_inner,
         max_range, min_range, n_scans: int):
    """Full observation-order lidar scan: (n_scans,) float32 in
    [min_range, max_range], exactly ``max_range`` on free beams."""
    dirs = beam_directions(yaw, n_scans)
    t_wall = raycast_box_inside(pos, dirs, room_half_inner)
    if ped_pos.shape[0] > 0:
        t_ped = raycast_circles(pos, dirs, ped_pos, ped_radius)
        t = jnp.minimum(t_wall, t_ped)
    else:
        t = t_wall
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
