"""Baseline policies + realworld variant tests."""
import jax
import jax.numpy as jnp
import numpy as np

from crowdnav_tpu.baselines import (FsmState, fsm_init, fsm_obstacle_avoider,
                                    goal_seeker)
from crowdnav_tpu.envs import CrowdEnv, make_config


def test_fsm_drives_forward_when_clear():
    obs = jnp.full((359,), 0.6)
    action, st = fsm_obstacle_avoider(obs, fsm_init())
    np.testing.assert_allclose(action, [0.22, 0.0], atol=1e-6)


def test_fsm_turns_right_when_front_blocked():
    obs = jnp.full((359,), 0.6).at[0].set(0.2)
    action, st = fsm_obstacle_avoider(obs, fsm_init())
    assert float(action[1]) < 0  # right turn
    # keeps turning for the commanded ticks
    action2, st = fsm_obstacle_avoider(obs, st)
    assert float(action2[1]) < 0


def test_fsm_batched():
    obs = jnp.tile(jnp.full((359,), 0.6), (5, 1))
    action, st = fsm_obstacle_avoider(obs, fsm_init((5,)))
    assert action.shape == (5, 2)


def test_goal_seeker_reaches_goal():
    cfg = make_config("crowd_none", "static", goal=(0.0, -0.75),
                      max_steps=120)
    env = CrowdEnv(cfg)
    state, obs = env.reset(jax.random.PRNGKey(0))
    step = jax.jit(env.step)
    for _ in range(120):
        out = step(state, goal_seeker(obs))
        state, obs = out.state, out.obs
        if bool(out.done):
            break
    assert bool(state.episode_success), "goal seeker should reach a clear goal"


def test_realworld_env_370_dim():
    cfg = make_config("realworld")
    env = CrowdEnv(cfg)
    assert env.obs_dim == 370
    state, obs = env.reset(jax.random.PRNGKey(0))
    assert obs.shape == (370,)
    out = jax.jit(env.step)(state, jnp.array([0.1, 0.0], jnp.float32))
    assert out.obs.shape == (370,)
    # dtg is to the true goal (no waypointing)
    d = float(jnp.linalg.norm(jnp.array(cfg.goal) - out.state.pos))
    np.testing.assert_allclose(float(out.obs[360]), round(d, 2), atol=0.02)


def test_observe_external_pipeline():
    cfg = make_config("realworld")
    env = CrowdEnv(cfg)
    state, _ = env.reset(jax.random.PRNGKey(0))
    scans = jnp.full((359,), 0.6).at[5].set(0.3)
    st2, obs = env.observe_external(state, scans, state.pos, state.yaw)
    assert obs.shape == (370,)
    np.testing.assert_allclose(obs[5], 0.3, atol=1e-6)
