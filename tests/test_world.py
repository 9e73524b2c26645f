"""Tests for the world model: diff-drive kinematics vs the reference C++
math, crowd behavior tables, config presets."""
import math

import jax
import jax.numpy as jnp
import numpy as np

from crowdnav_tpu.envs import CrowdBehavior, EnvConfig, make_config
from crowdnav_tpu.envs.world import (classify_action, crowd_step, init_state,
                                     integrate_robot, world_step)


def reference_fake_odometry(x, y, yaw, v, w, dt,
                            sep=0.160, radius=0.033):
    """Literal transcription of turtlebot3_fake.cpp:109-179 in NumPy."""
    wl_cmd = v - (w * sep / 2)
    wr_cmd = v + (w * sep / 2)
    wheel_l = (wl_cmd / radius) * dt
    wheel_r = (wr_cmd / radius) * dt
    delta_s = radius * (wheel_r + wheel_l) / 2.0
    delta_theta = radius * (wheel_r - wheel_l) / sep
    x += delta_s * math.cos(yaw + delta_theta / 2.0)
    y += delta_s * math.sin(yaw + delta_theta / 2.0)
    return x, y, yaw + delta_theta


def test_diff_drive_matches_reference_cpp_math():
    rng = np.random.default_rng(0)
    for _ in range(20):
        x, y, yaw = rng.uniform(-1, 1, 3)
        v = rng.uniform(0, 0.22)
        w = rng.uniform(-2, 2)
        ex, ey, eyaw = reference_fake_odometry(x, y, yaw, v, w, 0.15)
        pos, nyaw = integrate_robot(jnp.array([x, y], jnp.float32),
                                    jnp.float32(yaw), jnp.float32(v),
                                    jnp.float32(w), 0.15, 0.160, 0.033)
        np.testing.assert_allclose(pos, [ex, ey], atol=1e-5)
        np.testing.assert_allclose(nyaw, eyaw, atol=1e-5)


def test_straight_and_pure_rotation():
    pos, yaw = integrate_robot(jnp.zeros(2), jnp.float32(0.0),
                               jnp.float32(0.22), jnp.float32(0.0),
                               0.15, 0.160, 0.033)
    np.testing.assert_allclose(pos, [0.033, 0.0], atol=1e-6)
    pos, yaw = integrate_robot(jnp.zeros(2), jnp.float32(0.0),
                               jnp.float32(0.0), jnp.float32(2.0),
                               0.15, 0.160, 0.033)
    np.testing.assert_allclose(pos, [0.0, 0.0], atol=1e-6)
    np.testing.assert_allclose(yaw, 0.3, atol=1e-6)


def test_classify_action_bands():
    # (environment_stage_1_nobonus.py:1178-1193)
    assert int(classify_action(jnp.float32(0.2), jnp.float32(0.0))) == 0
    assert int(classify_action(jnp.float32(0.2), jnp.float32(0.1))) == 0
    assert int(classify_action(jnp.float32(0.2), jnp.float32(0.5))) == 1
    assert int(classify_action(jnp.float32(0.2), jnp.float32(-0.5))) == 2
    assert int(classify_action(jnp.float32(0.0), jnp.float32(0.0))) == 3


def test_crowd_fixed_pattern_and_walls():
    cfg = make_config("test_4", "crossing")
    key = jax.random.PRNGKey(0)
    st = init_state(cfg, key)
    pos, vel = crowd_step(cfg, key, jnp.int32(0), st.ped_pos, st.ped_vel,
                          st.pos)
    table = np.array(cfg.direction_table()) * cfg.crowd_speed
    np.testing.assert_allclose(vel, table, atol=1e-6)
    np.testing.assert_allclose(pos, np.array(cfg.ped_init) + table * cfg.dt,
                               atol=1e-5)
    # clamp: a pedestrian pushed far outside stays at the inner wall
    far = st.ped_pos.at[0].set(jnp.array([100.0, 100.0]))
    pos2, _ = crowd_step(cfg, key, jnp.int32(0), far, st.ped_vel, st.pos)
    lim = cfg.room_half_inner - cfg.ped_radius
    assert float(pos2[0, 0]) <= lim + 1e-6


def test_crowd_random_redraw_window():
    cfg = make_config("crowd_dense", "random_20")
    assert cfg.redraw_window_steps == 75  # 11.25 s / 0.15 s
    key = jax.random.PRNGKey(1)
    st = init_state(cfg, key)
    _, v0 = crowd_step(cfg, key, jnp.int32(0), st.ped_pos, st.ped_vel, st.pos)
    assert float(jnp.max(jnp.abs(v0))) <= cfg.crowd_speed
    # off-window: velocity carried
    _, v1 = crowd_step(cfg, key, jnp.int32(1), st.ped_pos, v0, st.pos)
    np.testing.assert_allclose(v0, v1)


def test_world_step_advances_and_respects_walls():
    cfg = make_config("crowd_dense")
    st = init_state(cfg, jax.random.PRNGKey(0))
    st2 = world_step(cfg, st, jnp.array([0.22, 0.0], jnp.float32))
    assert int(st2.step) == 1
    # spawned at yaw pi moving forward -> x decreases
    assert float(st2.pos[0]) < float(st.pos[0])
    np.testing.assert_allclose(st2.prev_pos, st.pos)


def test_config_presets():
    c = make_config("test_20", "crossing_20")
    assert c.n_peds == 20 and c.room_size == 5.0
    assert c.min_scan_range == 0.0
    assert c.state_dim_risk == 398 and c.state_dim_simple == 363
    assert len(c.direction_table()) == 20
    c2 = EnvConfig()
    assert c2.n_scans == 359 and abs(c2.room_half_inner - 1.45) < 1e-9
    hash(c)  # must stay hashable for jit closure
