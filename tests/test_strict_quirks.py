"""The advertised bit-parity switches (``strict_quirks=True``), verified.

Each test pins one committed reference quirk against the intended-semantics
default (VERDICT round-1 weakness 3: the switches previously had zero
tests):

- first-track closing speed shared by all tracks
  (`environment_stage_1_nobonus.py:793`);
- ``sorted(desc)[-K:]`` keeping the LOWEST-CP K tracks on overflow
  (`:882-883`);
- waypoint-arrival via the +-eps box (`is_in_desired_position:1285-1301`)
  instead of the Euclidean test (the round-1 reward-farm fix);
- a full trajectory through the jitted step in strict mode stays finite
  and runs the same termination logic.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from crowdnav_tpu.envs import CrowdEnv, make_config
from crowdnav_tpu.envs.world import TrackState
from crowdnav_tpu.ops import risk


def _tracks(n_valid, speeds, max_tracks=24):
    valid = np.zeros(max_tracks, bool)
    valid[:n_valid] = True
    pos = np.zeros((max_tracks, 2), np.float32)
    # place valid tracks straight ahead at increasing range on the x axis
    pos[:n_valid, 0] = 0.3 + 0.05 * np.arange(n_valid)
    prev = pos.copy()
    prev[:n_valid, 0] += 0.01   # previous position: slight approach
    speed = np.zeros(max_tracks, np.float32)
    speed[:n_valid] = speeds
    return TrackState(
        valid=jnp.asarray(valid), pos=jnp.asarray(pos),
        prev_pos=jnp.asarray(prev),
        has_prev=jnp.asarray(valid),
        dist=jnp.asarray(np.linalg.norm(pos, axis=-1).astype(np.float32)),
        speed=jnp.asarray(speed),
        vel=jnp.asarray((prev - pos)),
    )


def test_strict_first_track_closing_speed():
    """Strict mode: every TTC divides by the FIRST track's closing speed
    (:793). With very different per-track speeds the CP vectors must
    disagree between modes."""
    cfg = make_config("crowd_none")
    strict = dataclasses.replace(cfg, strict_quirks=True)
    tr = _tracks(3, speeds=[0.5, 0.05, 0.01])
    robot_pos = jnp.asarray(np.array([0.02, 0.0], np.float32))
    robot_prev = jnp.zeros(2, jnp.float32)
    cp_def, _ = risk.collision_probabilities(cfg, tr, robot_pos, robot_prev)
    cp_str, _ = risk.collision_probabilities(strict, tr, robot_pos,
                                             robot_prev)
    cp_def, cp_str = np.asarray(cp_def)[:3], np.asarray(cp_str)[:3]
    assert np.all(np.isfinite(cp_def)) and np.all(np.isfinite(cp_str))
    # track 0 agrees (it IS the first track); later tracks differ because
    # strict mode substitutes track 0's speed into their closing speed
    np.testing.assert_allclose(cp_str[0], cp_def[0], atol=1e-6)
    assert np.abs(cp_str[1:] - cp_def[1:]).max() > 1e-4, (cp_def, cp_str)


def test_strict_topk_keeps_lowest_on_overflow():
    """More than K valid tracks: strict mode reproduces the reference's
    ``sorted(desc)[-K:]`` slice, i.e. the K LOWEST-CP tracks (:882-883);
    default keeps the K highest."""
    cfg = make_config("crowd_none", k_obstacles=2)
    strict = dataclasses.replace(cfg, strict_quirks=True)
    tr = _tracks(4, speeds=[0.02, 0.02, 0.02, 0.02])
    robot_pos = jnp.asarray(np.array([0.03, 0.0], np.float32))
    robot_prev = jnp.zeros(2, jnp.float32)
    cp_jax, _ = risk.collision_probabilities(cfg, tr, robot_pos, robot_prev)
    cp_all = np.asarray(cp_jax)[:4]
    assert len(np.unique(cp_all)) >= 3   # distinct CPs so the slice matters

    live = jnp.ones((), bool)
    top_def, _ = risk.select_top_k(cfg, tr, cp_jax, live, robot_pos)
    top_str, _ = risk.select_top_k(strict, tr, cp_jax, live, robot_pos)
    exp_hi = np.sort(cp_all)[-2:]
    exp_lo = np.sort(cp_all)[:2]
    np.testing.assert_allclose(np.sort(np.asarray(top_def)), exp_hi,
                               atol=1e-5)
    np.testing.assert_allclose(np.sort(np.asarray(top_str)), exp_lo,
                               atol=1e-5)


def test_strict_waypoint_box_vs_euclid():
    """The waypoint-arrival test: strict mode keeps the reference's +-eps
    box, which passes at 0.267 m on a diagonal (the round-1 reward farm);
    the default Euclidean test does not."""
    from crowdnav_tpu.envs.crowd_env import _reward

    cfg = make_config("crowd_none")
    strict = dataclasses.replace(cfg, strict_quirks=True)
    env = CrowdEnv(cfg)
    state, _ = env.reset(jax.random.PRNGKey(0))
    # robot at diagonal 0.267 m from its waypoint; best_goal_dist pinned to
    # the current goal distance so the default milestone test stays quiet
    d = 0.267 / np.sqrt(2)
    pos = np.array([0.0, 0.0], np.float32)
    state = state.replace(
        pos=jnp.asarray(pos),
        waypoint=jnp.asarray(np.array([d, d], np.float32)),
        best_goal_dist=jnp.asarray(
            np.linalg.norm(pos - np.asarray(cfg.goal)).astype(np.float32)))
    args = (state, jnp.asarray(0.5), jnp.asarray(0.1),
            jnp.zeros((), bool), jnp.zeros((), bool))
    r_def, _ = _reward(cfg, *args)
    r_str, _ = _reward(strict, *args)
    assert float(r_str) - float(r_def) == cfg.waypoint_reward


def test_strict_trajectory_runs_and_terminates():
    """Full jitted rollout in strict mode: finite observations, eventual
    wall-collision termination (same done logic both modes)."""
    cfg = make_config("crowd_none", "static", max_steps=200,
                      strict_quirks=True, n_peds=2,
                      ped_init=((0.2, -0.4), (-0.3, 0.1)))
    env = CrowdEnv(cfg)
    state, obs = env.reset(jax.random.PRNGKey(0))
    step = jax.jit(env.step)
    for t in range(200):
        out = step(state, jnp.asarray((0.22, 0.1), jnp.float32))
        state, obs = out.state, out.obs
        assert np.all(np.isfinite(np.asarray(obs))), f"non-finite obs at {t}"
        if bool(out.done):
            break
    assert bool(out.done)
