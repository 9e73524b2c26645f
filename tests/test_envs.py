"""End-to-end environment tests: jitted reset/step, vmap batching,
termination/reward semantics, risk-pipeline behavior checks."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from crowdnav_tpu.envs import CrowdEnv, SimpleEnv, make_config


@pytest.fixture(scope="module")
def dense_env():
    return CrowdEnv(make_config("crowd_dense", max_steps=50))


def test_crowd_reset_shapes(dense_env):
    state, obs = jax.jit(dense_env.reset)(jax.random.PRNGKey(0))
    assert obs.shape == (398,)
    # scans first, then htg/dtg, pose, yaw, vel, top-K
    assert float(obs[360]) > 0  # dtg positive
    # top-K slots hold the robot-pose padding on reset (CP block skipped)
    k = dense_env.cfg.k_obstacles
    tail = np.asarray(obs[-4 * k:]).reshape(k, 4)
    np.testing.assert_allclose(tail[:, :2],
                               np.asarray(state.pos)[None, :].repeat(k, 0),
                               atol=2e-3)
    np.testing.assert_allclose(tail[:, 2:], 0.0, atol=1e-6)


def test_crowd_step_runs_and_rewards(dense_env):
    env = dense_env
    step = jax.jit(env.step)
    state, obs = jax.jit(env.reset)(jax.random.PRNGKey(1))
    total = 0.0
    for _ in range(5):
        out = step(state, jnp.array([0.22, 0.0], jnp.float32))
        state, obs = out.state, out.obs
        total += float(out.reward)
    assert obs.shape == (398,)
    # per-step reward is step_penalty + [0,2] + possible waypoint bonus
    assert -2.0 * 5 <= total <= 5 * 200.0
    assert int(state.step) == 5


def test_crowd_vmap_batch(dense_env):
    env = dense_env
    keys = jax.random.split(jax.random.PRNGKey(2), 8)
    states, obs = jax.jit(jax.vmap(env.reset))(keys)
    assert obs.shape == (8, 398)
    acts = jnp.tile(jnp.array([[0.15, 0.3]], jnp.float32), (8, 1))
    out = jax.jit(jax.vmap(env.step))(states, acts)
    assert out.obs.shape == (8, 398)
    assert out.reward.shape == (8,)
    # envs diverge: different RNG -> different crowd velocity draws
    assert float(jnp.std(out.state.ped_pos, axis=0).max()) > 0


def test_goal_reach_gives_positive_terminal():
    # put the goal right in front of the start: facing pi, goal 0.25 m at -x
    cfg = make_config("crowd_none", goal=(0.45, -0.75), max_steps=50)
    env = CrowdEnv(cfg)
    state, _ = env.reset(jax.random.PRNGKey(0))
    step = jax.jit(env.step)
    r_total, done = 0.0, False
    for _ in range(20):
        out = step(state, jnp.array([0.22, 0.0], jnp.float32))
        state = out.state
        if bool(out.done):
            done = True
            assert bool(state.episode_success)
            assert float(out.reward) > 100.0
            break
    assert done


def test_timeout_termination():
    cfg = make_config("crowd_none", max_steps=3)
    env = CrowdEnv(cfg)
    state, _ = env.reset(jax.random.PRNGKey(0))
    step = jax.jit(env.step)
    for i in range(3):
        out = step(state, jnp.array([0.0, 0.5], jnp.float32))
        state = out.state
    assert bool(out.done)
    assert not bool(state.episode_success)


def test_auto_reset_after_done():
    cfg = make_config("crowd_none", max_steps=2)
    env = CrowdEnv(cfg)
    state, _ = env.reset(jax.random.PRNGKey(0))
    step = jax.jit(env.step)
    out = step(state, jnp.array([0.1, 0.0], jnp.float32))
    out = step(out.state, jnp.array([0.1, 0.0], jnp.float32))
    assert bool(out.done)
    out2 = step(out.state, jnp.array([0.1, 0.0], jnp.float32))
    # auto-reset: fresh episode, zero reward, step counter back at 0
    assert not bool(out2.done)
    assert float(out2.reward) == 0.0
    assert int(out2.state.step) == 0


def test_risk_pipeline_tracks_obstacle_ahead():
    # one pedestrian dead ahead within range -> it must appear in the top-K
    cfg = make_config("crowd_none", "static", n_peds=1,
                      ped_init=((0.30, -0.75),), max_steps=50)
    env = CrowdEnv(cfg)
    state, obs = env.reset(jax.random.PRNGKey(0))
    step = jax.jit(env.step)
    out = step(state, jnp.array([0.1, 0.0], jnp.float32))
    out = step(out.state, jnp.array([0.1, 0.0], jnp.float32))
    k = cfg.k_obstacles
    tail = np.asarray(out.obs[-4 * k:]).reshape(k, 4)
    # at least one top-K slot is near the pedestrian's true position
    d = np.linalg.norm(tail[:, :2] - np.array([0.30, -0.75]), axis=-1)
    assert d.min() < 0.1, tail
    # tracker has a live track
    assert bool(jnp.any(out.state.tracks.valid))
    # an obstacle was seen -> obstacle_present_steps advanced
    assert int(out.state.obstacle_present_steps) >= 1


def test_simple_env_shapes_and_discrete():
    cfg = make_config("crowd_sparse", max_steps=50)
    env = SimpleEnv(cfg)
    state, obs = jax.jit(env.reset)(jax.random.PRNGKey(0))
    assert obs.shape == (363,)
    out = jax.jit(env.step_discrete)(state, jnp.int32(0))
    assert out.obs.shape == (363,)
    # discrete FORWARD moves along -x from yaw pi
    assert float(out.state.pos[0]) < float(state.pos[0])


def test_safety_scores_bounded(dense_env):
    env = dense_env
    state, _ = env.reset(jax.random.PRNGKey(3))
    step = jax.jit(env.step)
    for _ in range(10):
        out = step(state, jnp.array([0.22, 0.0], jnp.float32))
        state = out.state
    ego, social = env.safety_scores(state)
    assert float(ego) <= 1.0 and float(social) <= 1.0


def test_robot_presets_waffle():
    """ROBOT_PRESETS: waffle swaps kinematics + the UNMODIFIED LDS-01
    lidar (min 0.120 / max 3.5, turtlebot3_waffle.gazebo.xacro:130-131)
    for the reference's modified burger (0.08 / 0.6); the env builds,
    steps finite, and free space reads 3.5 instead of 0.6."""
    from crowdnav_tpu.envs import ROBOT_PRESETS

    assert set(ROBOT_PRESETS) == {"burger", "burger2", "waffle",
                                  "waffle_naked"}
    cfg_b = make_config("crowd_none", robot="burger", max_steps=50)
    cfg_w = make_config("crowd_none", robot="waffle", max_steps=50)
    assert cfg_b == make_config("crowd_none", max_steps=50)  # burger=default
    assert cfg_w.wheel_separation == 0.287
    assert cfg_w.max_scan_range == 3.5
    env = CrowdEnv(cfg_w)
    state, obs = jax.jit(env.reset)(jax.random.PRNGKey(0))
    assert np.isfinite(np.asarray(obs)).all()
    # empty 3x3 room, every wall within 3.5 m: scans strictly between
    # lidar_min and the free-space value, never the burger 0.6 clip
    scans = np.asarray(obs[:359])
    assert scans.max() <= 3.5 and scans.max() > 0.6
    out = jax.jit(env.step)(state, jnp.array([0.22, 0.0], jnp.float32))
    assert np.isfinite(np.asarray(out.obs)).all()


def test_turtlebot3_world_pillars_preset():
    """The classic turtlebot3_world 9-pillar course (static r=0.15
    cylinders on the {-1.1,0,1.1}^2 grid) as zero-speed peds in a square
    stand-in boundary: pillars never move, and a beam aimed at a pillar
    returns its surface distance."""
    cfg = make_config("turtlebot3_world_pillars", max_steps=50)
    assert cfg.n_peds == 9 and cfg.ped_radius == 0.15
    env = CrowdEnv(cfg)
    state, obs = jax.jit(env.reset)(jax.random.PRNGKey(0))
    assert np.isfinite(np.asarray(obs)).all()
    step = jax.jit(env.step)
    p0 = np.asarray(state.ped_pos)
    for _ in range(5):
        out = step(state, jnp.array([0.0, 0.0], jnp.float32))
        state = out.state
    np.testing.assert_allclose(np.asarray(state.ped_pos), p0, atol=1e-6)
    # probe from (0.55, 0) facing the center pillar at (0,0): the forward
    # beam hits its surface at 0.55 - 0.15 = 0.40 (walls are > 0.6 away)
    cfg2 = make_config("turtlebot3_world_pillars", max_steps=50,
                       start_pose=(0.55, 0.0, np.pi))
    _, obs2 = jax.jit(CrowdEnv(cfg2).reset)(jax.random.PRNGKey(0))
    assert abs(float(obs2[0]) - 0.40) < 0.02
