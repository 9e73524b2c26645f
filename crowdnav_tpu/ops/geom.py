"""Closed-form 2D geometry kernels for the crowd-navigation engine.

Shapely-free, fixed-shape replacements for the reference's geometry helpers
(`turtlebot3_rl_sim/src/utils.py`): line-circle intersection
(`utils.get_collision_point:251-293`), waypoint-on-circle
(`utils.get_local_goal_waypoints:296-314`), collision probabilities
(`utils.compute_collision_prob:317-323`,
`utils.compute_general_collision_prob:326-345`), axis-aligned bounding-box
IOU association (`utils._get_bounding_box:422-431`,
`utils.is_associated:435-448`, `utils.get_iou:451-460`), and social-region
classification (`utils.get_obstacle_region:146-215`).

All functions are elementwise/broadcast-friendly pure JAX so they vmap over
environment and beam axes and fuse into the surrounding step program.
"""
from __future__ import annotations

import jax.numpy as jnp

TWO_PI = 2.0 * jnp.pi


def wrap_angle(theta):
    """Wrap angle(s) to (-pi, pi]."""
    return theta - TWO_PI * jnp.round(theta / TWO_PI)


def heading_to(target_xy, pos_xy, yaw):
    """Heading error from robot yaw to the bearing of ``target_xy``.

    Matches `environment_stage_1_nobonus.get_heading_to_goal:222-237`:
    ``atan2(goal - pos) - yaw`` wrapped to (-pi, pi].
    """
    bearing = jnp.arctan2(target_xy[..., 1] - pos_xy[..., 1],
                          target_xy[..., 0] - pos_xy[..., 0])
    return wrap_angle(bearing - yaw)


def distance(a_xy, b_xy):
    """Euclidean distance along the last axis."""
    return jnp.linalg.norm(a_xy - b_xy, axis=-1)


def ray_circle_distance(origin, direction, center, radius):
    """Distance from ``origin`` along unit ``direction`` to a circle's nearer
    intersection. Returns +inf when the ray misses (or the hit is behind).

    Broadcasting: ``origin``/``direction`` (..., 2), ``center`` (..., 2).
    This is the closed-form core of the lidar raycast and the collision-cone
    test (`utils.get_collision_point:251-293` minus its discretized search).
    """
    rel = center - origin
    b = jnp.sum(rel * direction, axis=-1)          # projection of center
    d2 = jnp.sum(rel * rel, axis=-1) - b * b       # perpendicular dist^2
    disc = radius * radius - d2
    hit = disc >= 0.0
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    t_near = b - sq
    t_far = b + sq
    # nearest non-negative intersection
    t = jnp.where(t_near >= 0.0, t_near, t_far)
    return jnp.where(hit & (t >= 0.0), t, jnp.inf)


def line_circle_min_distance(origin, direction, center, radius):
    """Distance from ``origin`` to the closest intersection of the *unoriented*
    line through ``origin`` with direction ``direction`` and a circle.

    The reference sweeps line segments in both directions and keeps the first
    (nearest) hit (`utils.get_collision_point:271-293`), so backward hits
    count too; distances are unsigned. Returns +inf on a miss.
    """
    rel = center - origin
    b = jnp.sum(rel * direction, axis=-1)
    d2 = jnp.sum(rel * rel, axis=-1) - b * b
    disc = radius * radius - d2
    hit = disc >= 0.0
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    dist = jnp.minimum(jnp.abs(b - sq), jnp.abs(b + sq))
    return jnp.where(hit, dist, jnp.inf)


def waypoint_on_circle(agent_xy, goal_xy, radius):
    """Local waypoint: intersection of segment agent->goal with the circle of
    ``radius`` around the agent; the goal itself once inside the circle.

    Mirrors `utils.get_local_goal_waypoints:296-314`. The shapely version
    returns empty when the goal is inside the circle (segment shorter than
    the radius); the reference then falls back to a mirrored goal point — a
    quirk that only triggers next to the goal where the waypoint is
    immediately snapped to the true goal by the env
    (`environment_stage_1_nobonus.py:1121-1125`). We use the intended
    semantics: inside the circle -> the goal itself.
    """
    rel = goal_xy - agent_xy
    d = jnp.linalg.norm(rel, axis=-1, keepdims=True)
    unit = rel / jnp.maximum(d, 1e-9)
    on_circle = agent_xy + unit * radius
    return jnp.where(d <= radius, goal_xy, on_circle)


def collision_prob_ttc(time_to_collision, valid):
    """CP from time-to-collision: ``min(1, 0.15 / ttc)``, 0 when invalid.

    `utils.compute_collision_prob:317-323`. ``ttc`` may be negative (obstacle
    outrunning the robot); the reference lets the negative value through,
    which we reproduce (callers clamp downstream if needed).
    """
    cp = jnp.minimum(1.0, 0.15 / jnp.where(time_to_collision == 0.0, jnp.inf,
                                           time_to_collision))
    return jnp.where(valid, cp, 0.0)


def collision_prob_distance(dist, max_range, min_range):
    """Linear distance-based CP: ``(max - d) / (max - min)``, 0 beyond max.

    `utils.compute_general_collision_prob:326-345`. Not clamped above by the
    reference; values > 1 occur for d < min_range and are kept.
    """
    gcp = (max_range - dist) / jnp.maximum(max_range - min_range, 1e-9)
    return jnp.where(dist > max_range, 0.0, gcp)


def box_iou(a_xy, b_xy, half_size):
    """IOU of two axis-aligned squares of half-side ``half_size`` centred on
    ``a_xy`` / ``b_xy`` (broadcasts over leading axes).

    Closed form of `utils.get_iou:451-460` (shapely polygons): boxes have
    side ``2*half_size``; intersection = prod(max(0, side - |delta|)).
    Rounded to 3 decimals like the reference.
    """
    side = 2.0 * half_size
    dx = jnp.abs(a_xy[..., 0] - b_xy[..., 0])
    dy = jnp.abs(a_xy[..., 1] - b_xy[..., 1])
    inter = jnp.maximum(side - dx, 0.0) * jnp.maximum(side - dy, 0.0)
    union = 2.0 * side * side - inter
    return jnp.round(inter / union, 3)


def boxes_associated(a_xy, b_xy, half_size, rounded: bool = False):
    """Box-association predicate (`utils.is_associated:435-448`).

    ``rounded=False`` (default): the intended geometric semantics — the
    two squares overlap (IOU > 0). ``rounded=True``: the reference's
    LITERAL behavior — ``round(IOU, 3) > 0``, i.e. sliver overlaps with
    IOU <= 5e-4 do NOT associate (its code rounds before the check;
    established by the direct parity test against the reference source).
    Closed form without the division:
    ``inter/union > 5e-4  <=>  inter * 1.0005 > 1e-3 * side^2`` with
    ``union = 2*side^2 - inter``.

    Why the literal form is a strict_quirks behavior and not the default:
    the two differ on only ~0.1% of consecutive-beam pairs in real scenes
    (sliver wall-graze splits), but that perturbation measurably shifts
    the TD3 flagship-recipe training bifurcation — A/B'd on hardware in
    round 5 (`results/r5/README.md`, bisect chain S): with the rounded
    form 5 of 7 flagship-recipe runs locked into the 0%-success attractor
    vs ~1 of 13 with the raw form, and reverting ONLY this predicate
    recovered the same collapsed seed to 98.1%."""
    side = 2.0 * half_size
    dx = jnp.abs(a_xy[..., 0] - b_xy[..., 0])
    dy = jnp.abs(a_xy[..., 1] - b_xy[..., 1])
    if rounded:
        inter = jnp.maximum(side - dx, 0.0) * jnp.maximum(side - dy, 0.0)
        return inter * 1.0005 > 1e-3 * side * side
    return (dx < side) & (dy < side)


def _in_parallelogram(px, py, quad):
    """Strict point-in-convex-quad: every edge cross product shares a sign
    (boundary excluded — shapely's ``Polygon.contains`` semantics)."""
    (ax_, ay), (bx, by), (cx, cy), (dx_, dy) = quad

    def cross(x1, y1, x2, y2):
        return (x2 - x1) * (py - y1) - (y2 - y1) * (px - x1)

    c1 = cross(ax_, ay, bx, by)
    c2 = cross(bx, by, cx, cy)
    c3 = cross(cx, cy, dx_, dy)
    c4 = cross(dx_, dy, ax_, ay)
    pos = (c1 > 0) & (c2 > 0) & (c3 > 0) & (c4 > 0)
    neg = (c1 < 0) & (c2 < 0) & (c3 < 0) & (c4 < 0)
    return pos | neg


def social_region(robot_xy, yaw, pts_xy, scans):
    """Social-region code per obstacle point — the EXACT rectangle geometry
    of `utils.get_obstacle_region:146-215` in closed form.

    The reference converts yaw via `convert_yaw_to_360deg:356-364`
    (``|deg(yaw) - 180|``), builds two r=0.16 m-wide parallelograms
    extending 0.6 m from the robot along the ``-cos/+sin`` heading axis
    (the gazebo axis-swap convention used throughout its geometry), and
    tests shapely ``Polygon.contains`` per point, bucketing by the SCAN
    range (0.3 < s < 0.6 far, s < 0.3 close). Front-left is checked after
    front-right and overwrites it, reproduced here by the where-order.

      0 = OTHER, 1 = FRF (front-right far),  2 = FLF (front-left far),
      3 = FRC (front-right close), 4 = FLC (front-left close)

    ``robot_xy`` (2,), ``yaw`` (), ``pts_xy`` (..., 2), ``scans`` (...).
    """
    heading = jnp.abs(jnp.degrees(yaw) - 180.0)    # convert_yaw_to_360deg
    hr = jnp.radians(heading)
    rx, ry = robot_xy[0], robot_xy[1]
    fx = rx - 0.6 * jnp.cos(hr)                    # far_center (:158-159)
    fy = ry + 0.6 * jnp.sin(hr)
    # right-side offset (:162-163); the left offset is its negation
    ox = -0.16 * jnp.cos(hr + jnp.pi / 2.0)
    oy = 0.16 * jnp.sin(hr + jnp.pi / 2.0)
    px, py = pts_xy[..., 0], pts_xy[..., 1]
    # front_right_polygon (:176-178): close_right, far_right, far_center,
    # robot; front_left_polygon (:179-181): robot, far_center, far_left,
    # close_left — both parallelograms
    in_fr = _in_parallelogram(px, py, ((rx + ox, ry + oy),
                                       (fx + ox, fy + oy), (fx, fy),
                                       (rx, ry)))
    in_fl = _in_parallelogram(px, py, ((rx, ry), (fx, fy),
                                       (fx - ox, fy - oy),
                                       (rx - ox, ry - oy)))
    far = (scans > 0.3) & (scans < 0.6)            # (:195-197)
    close = scans < 0.3
    code = jnp.zeros_like(px, dtype=jnp.int32)
    code = jnp.where(far & in_fr, 1, code)
    code = jnp.where(far & in_fl, 2, code)
    code = jnp.where(close & in_fr, 3, code)
    code = jnp.where(close & in_fl, 4, code)
    return code


def estimate_num_obs_scans(dist, max_range, min_range):
    """Expected number of lidar returns on a cylinder at ``dist``.

    `utils.estimate_num_obs_scans:395-402`: 32 scans at max range down to 3
    at min range, linear.
    """
    frac = (max_range - dist) / jnp.maximum(max_range - min_range, 1e-9)
    return 3.0 + jnp.floor(29.0 * frac)
