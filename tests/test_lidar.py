"""Lidar raycast tests against hand geometry."""
import math

import jax
import jax.numpy as jnp
import numpy as np

from crowdnav_tpu.ops import lidar


def test_beam_zero_points_along_heading():
    dirs = lidar.beam_directions(jnp.float32(0.7), 359)
    np.testing.assert_allclose(dirs[0], [math.cos(0.7), math.sin(0.7)],
                               atol=1e-6)
    # clockwise sweep: beam 90 at yaw - 90deg
    np.testing.assert_allclose(
        dirs[90], [math.cos(0.7 - math.pi / 2), math.sin(0.7 - math.pi / 2)],
        atol=1e-5)


def test_box_raycast_center():
    # from the center, beam along +x hits the wall at `half`
    d = lidar.raycast_box_inside(jnp.zeros(2), jnp.array([[1.0, 0.0]]), 1.45)
    np.testing.assert_allclose(d, [1.45], atol=1e-6)
    # diagonal hits at half*sqrt(2)
    diag = jnp.array([[1.0, 1.0]]) / math.sqrt(2)
    d = lidar.raycast_box_inside(jnp.zeros(2), diag, 1.45)
    np.testing.assert_allclose(d, [1.45 * math.sqrt(2)], atol=1e-5)


def test_circle_raycast():
    dirs = jnp.array([[1.0, 0.0], [0.0, 1.0]])
    centers = jnp.array([[0.3, 0.0]])
    d = lidar.raycast_circles(jnp.zeros(2), dirs, centers, 0.0505)
    np.testing.assert_allclose(d[0], 0.3 - 0.0505, atol=1e-6)
    assert jnp.isinf(d[1])


def test_full_scan_free_is_max_range():
    # empty 5x5 room from the center: every wall > 0.6 away -> all free
    scans = lidar.scan(jnp.zeros(2), jnp.float32(0.0),
                       jnp.zeros((0, 2)), 0.0505, 2.45, 0.6, 0.08, 359)
    assert scans.shape == (359,)
    np.testing.assert_allclose(scans, 0.6, atol=1e-6)


def test_full_scan_sees_obstacle_at_correct_beam():
    # obstacle 0.4 m straight ahead of a robot at yaw 0
    ped = jnp.array([[0.4, 0.0]])
    scans = lidar.scan(jnp.zeros(2), jnp.float32(0.0), ped, 0.0505,
                       2.45, 0.6, 0.08, 359)
    np.testing.assert_allclose(scans[0], 0.4 - 0.0505, atol=1e-4)
    # far-side beams are free
    assert float(scans[180]) == np.float32(0.6)
    # the obstacle subtends ~atan(r/d) degrees each side
    half_width_deg = math.degrees(math.asin(0.0505 / 0.4))
    assert float(scans[int(half_width_deg) + 2]) == np.float32(0.6)
    assert float(scans[359 - int(half_width_deg) - 2]) == np.float32(0.6)
    # symmetric: beam i and 359-i both see it near the edges
    assert float(scans[3]) < 0.6 - 1e-4 and float(scans[356]) < 0.6 - 1e-4


def test_scan_points_roundtrip():
    # endpoints must land on the obstacle surface / wall
    pos = jnp.array([0.2, -0.1])
    yaw = jnp.float32(1.1)
    ped = jnp.array([[0.5, 0.3]])
    scans = lidar.scan(pos, yaw, ped, 0.0505, 1.45, 0.6, 0.08, 359)
    pts = lidar.scan_points(pos, yaw, scans, 359)
    assert pts.shape == (359, 2)
    hit = scans < 0.6
    # every hit endpoint is on a circle or a wall
    on_circle = jnp.abs(jnp.linalg.norm(pts - ped[0], axis=-1) - 0.0505) < 5e-3
    on_wall = jnp.max(jnp.abs(pts), axis=-1) > 1.45 - 5e-3
    assert bool(jnp.all(~hit | on_circle | on_wall))


def test_scan_batches_under_vmap():
    f = jax.vmap(lambda p, y, peds: lidar.scan(p, y, peds, 0.0505, 1.45,
                                               0.6, 0.08, 359))
    pos = jnp.zeros((4, 2))
    yaw = jnp.zeros(4)
    peds = jnp.tile(jnp.array([[[0.4, 0.0]]]), (4, 1, 1))
    out = f(pos, yaw, peds)
    assert out.shape == (4, 359)
