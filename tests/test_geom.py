"""Unit tests for the geometry kernels against hand-computed values
(SURVEY.md §4: the test pyramid the reference lacks)."""
import math

import jax.numpy as jnp
import numpy as np
import pytest

from crowdnav_tpu.ops import geom


def test_wrap_angle():
    np.testing.assert_allclose(geom.wrap_angle(jnp.array(3.5)),
                               3.5 - 2 * math.pi, atol=1e-6)
    np.testing.assert_allclose(geom.wrap_angle(jnp.array(-3.5)),
                               -3.5 + 2 * math.pi, atol=1e-6)
    np.testing.assert_allclose(geom.wrap_angle(jnp.array(1.0)), 1.0, atol=1e-7)


def test_heading_to_matches_reference_formula():
    # reference: atan2(gy-py, gx-px) - yaw wrapped (:222-237)
    pos = jnp.array([0.75, -0.75])
    goal = jnp.array([-1.0, 1.0])
    yaw = jnp.array(math.pi)
    expected = math.atan2(1.75, -1.75) - math.pi
    if expected <= -math.pi:
        expected += 2 * math.pi
    np.testing.assert_allclose(geom.heading_to(goal, pos, yaw), expected,
                               atol=1e-6)


def test_ray_circle_hit_and_miss():
    origin = jnp.zeros(2)
    d = jnp.array([1.0, 0.0])
    c = jnp.array([2.0, 0.0])
    np.testing.assert_allclose(
        geom.ray_circle_distance(origin, d, c, 0.5), 1.5, atol=1e-6)
    # miss: circle off to the side
    assert jnp.isinf(geom.ray_circle_distance(
        origin, d, jnp.array([2.0, 1.0]), 0.5))
    # behind: hit is at negative t
    assert jnp.isinf(geom.ray_circle_distance(
        origin, d, jnp.array([-2.0, 0.0]), 0.5))


def test_line_circle_min_distance_counts_backward_hits():
    origin = jnp.zeros(2)
    d = jnp.array([1.0, 0.0])
    np.testing.assert_allclose(geom.line_circle_min_distance(
        origin, d, jnp.array([-2.0, 0.0]), 0.5), 1.5, atol=1e-6)


def test_waypoint_on_circle():
    agent = jnp.array([0.0, 0.0])
    goal = jnp.array([3.0, 4.0])  # dist 5
    wp = geom.waypoint_on_circle(agent, goal, 0.3)
    np.testing.assert_allclose(jnp.linalg.norm(wp - agent), 0.3, atol=1e-6)
    np.testing.assert_allclose(wp, jnp.array([0.18, 0.24]), atol=1e-6)
    # goal inside the circle -> waypoint is the goal
    near = jnp.array([0.1, 0.1])
    np.testing.assert_allclose(geom.waypoint_on_circle(agent, near, 0.3),
                               near, atol=1e-6)


def test_collision_probs():
    # min(1, 0.15/ttc) (:317-323)
    np.testing.assert_allclose(
        geom.collision_prob_ttc(jnp.array(0.3), True), 0.5, atol=1e-6)
    np.testing.assert_allclose(
        geom.collision_prob_ttc(jnp.array(0.05), True), 1.0, atol=1e-6)
    np.testing.assert_allclose(
        geom.collision_prob_ttc(jnp.array(0.3), False), 0.0, atol=1e-6)
    # (max-d)/(max-min) (:326-345)
    np.testing.assert_allclose(
        geom.collision_prob_distance(jnp.array(0.36), 0.6, 0.12), 0.5,
        atol=1e-6)
    np.testing.assert_allclose(
        geom.collision_prob_distance(jnp.array(0.7), 0.6, 0.12), 0.0,
        atol=1e-6)


def test_box_iou_closed_form_matches_polygon_math():
    # identical boxes -> IOU 1
    a = jnp.array([1.0, 1.0])
    np.testing.assert_allclose(geom.box_iou(a, a, 0.1), 1.0, atol=1e-6)
    # half-side 0.1 (side .2), offset 0.1 in x: inter = .1*.2=.02,
    # union = 2*.04-.02=.06 -> 1/3
    b = jnp.array([1.1, 1.0])
    np.testing.assert_allclose(geom.box_iou(a, b, 0.1), round(0.02 / 0.06, 3),
                               atol=1e-6)
    assert bool(geom.boxes_associated(a, b, 0.1))
    assert not bool(geom.boxes_associated(a, jnp.array([1.5, 1.0]), 0.1))


def test_social_region_codes():
    # exact rectangle geometry (utils.get_obstacle_region:146-215): robot at
    # the origin facing -x (yaw=pi => converted heading 0), so the front
    # region spans x in (-0.6, 0) with the right half-band y in (0, 0.16)
    # and the left half-band y in (-0.16, 0)
    robot = jnp.zeros(2)
    yaw = jnp.array(math.pi)

    def region(pt, scan):
        return int(geom.social_region(robot, yaw, jnp.array(pt),
                                      jnp.array(scan)))

    assert region([-0.4, 0.08], 0.4) == 1    # front-right far
    assert region([-0.4, -0.08], 0.4) == 2   # front-left far
    assert region([-0.2, 0.08], 0.2) == 3    # front-right close
    assert region([-0.2, -0.08], 0.2) == 4   # front-left close
    assert region([0.3, 0.08], 0.3) == 0     # behind -> OTHER
    assert region([-0.4, 0.3], 0.4) == 0     # outside the 0.16 band
    assert region([-0.4, 0.08], 0.65) == 0   # beyond far proximity
    # batched points broadcast
    codes = geom.social_region(
        robot, yaw, jnp.array([[-0.4, 0.08], [-0.2, -0.08]]),
        jnp.array([0.4, 0.2]))
    assert codes.tolist() == [1, 4]


def test_estimate_num_obs_scans():
    # 32 at max range ... 3 at min (utils.py:395-402)
    assert float(geom.estimate_num_obs_scans(
        jnp.array(0.136), 0.6, 0.136)) == 32.0
    assert float(geom.estimate_num_obs_scans(
        jnp.array(0.6), 0.6, 0.136)) == 3.0
