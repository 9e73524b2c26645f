"""Simple (non-risk) environment: 363-dim state, ±1 shaping reward.

Batched re-design of `turtlebot3_rl_sim/src/environment_stage_1_original.py`
(used by the SAC/DQN/Q-Learning/SARSA drivers and the TD3 "basic" ablation
arm): state = 359 scans + [htg, dtg] + [x, y] (:315-320), reward =
dtg/htg progress ±1 with ±200 terminals (:324-410), collision cut at
min(scan) < 0.105 (:282,303), no waypoints, no tracker.

Reference quirk (documented, not reproduced): the committed
``compute_reward`` reads ``state[-1]``/``state[-2]`` — the agent position —
as distance/heading (:325-326). We compute shaping from the actual
heading/distance; ``strict_quirks=True`` reproduces the committed indices.

Supports both action modes of `environment_stage_1_original.step:412-435`:
continuous (lin, ang) and discrete {FORWARD, LEFT, RIGHT} at 0.22 m/s,
±2.0 rad/s.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from crowdnav_tpu.envs.config import EnvConfig
from crowdnav_tpu.envs.crowd_env import StepOutput, _goal_box, _htg_reward
from crowdnav_tpu.envs.world import EnvState, init_state, world_step
from crowdnav_tpu.ops import geom, lidar

# (lin, ang) rows; kept a plain tuple so importing this module does not
# initialize the JAX backend (a module-level jnp.array pins the platform
# before drivers can apply --platform overrides)
DISCRETE_ACTIONS_TABLE = (
    (0.22, 0.0),    # FORWARD   (:414-417)
    (0.22, 2.0),    # TURN_LEFT (:418-421)
    (0.22, -2.0),   # TURN_RIGHT (:422-425)
)

SIMPLE_MIN_RANGE = 0.105  # (:282)


class SimpleEnv:
    """363-dim env; pure reset/step, vmap at the call site."""

    def __init__(self, cfg: EnvConfig):
        self.cfg = cfg
        self.obs_dim = cfg.state_dim_simple
        self.action_dim = 2
        self.n_discrete_actions = 3
        # deterministic reset template (see CrowdEnv.__init__); jitted —
        # eager resets are hundreds of dispatches on remote backends
        # per-leaf np.asarray, NOT jax.device_get (deadlocks on tunneled
        # TPU relays — see CrowdEnv.__init__)
        import numpy as _np
        st, obs = jax.jit(self.reset)(jax.random.PRNGKey(0))
        self._template = jax.tree.map(_np.asarray, (st, obs))

    def _observe(self, state: EnvState):
        cfg = self.cfg
        scans = lidar.scan(state.pos, state.yaw, state.ped_pos,
                           cfg.ped_radius, cfg.room_half_inner,
                           cfg.max_scan_range, cfg.lidar_min_range,
                           cfg.n_scans)
        if cfg.lidar_noise > 0.0:
            # hit-beam Gaussian noise (see crowd_env._observe)
            k_lidar = jax.random.fold_in(state.key, 7)
            hit = scans < cfg.max_scan_range
            noisy = scans + jax.random.normal(k_lidar, scans.shape) \
                * cfg.lidar_noise
            scans = jnp.where(hit, jnp.clip(noisy, cfg.lidar_min_range,
                                            cfg.max_scan_range), scans)
        scans = jnp.round(scans, 3)
        goal = jnp.array(cfg.goal, jnp.float32)
        dtg = jnp.round(jnp.linalg.norm(goal - state.pos), 2)
        htg = jnp.round(geom.heading_to(goal, state.pos, state.yaw), 2)
        collided = jnp.min(scans) < SIMPLE_MIN_RANGE
        at_goal = _goal_box(state.pos, goal, cfg.goal_eps)
        timeout = state.step >= cfg.max_steps
        done = state.done | collided | at_goal | timeout
        obs = jnp.concatenate([
            scans, jnp.stack([htg, dtg]), jnp.round(state.pos, 3)])
        return obs, (dtg, htg), done, at_goal

    def reset(self, key: jax.Array):
        state = init_state(self.cfg, key)
        obs, (dtg, htg), _, _ = self._observe(state)
        state = state.replace(prev_distance=dtg, prev_heading=htg)
        return state, obs

    def step(self, state: EnvState, action: jax.Array) -> StepOutput:
        """Continuous-mode step; use :meth:`step_discrete` for index actions."""
        cfg = self.cfg
        was_done = state.done

        s = world_step(cfg, state, action)
        obs, (dtg, htg), done, at_goal = self._observe(s)
        if cfg.strict_quirks:
            # committed shaping reads agent y/x as distance/heading (:325)
            cur_d, cur_h = obs[-1], obs[-2]
        else:
            cur_d, cur_h = dtg, htg
        dd = cur_d - s.prev_distance
        dtg_r = jnp.where(dd < 0, 1.0, 0.0)
        htg_r = _htg_reward(cur_h, s.prev_heading)
        non_term = dtg_r + htg_r  # step_reward is 0 here (:335)
        terminal = jnp.where(at_goal, cfg.goal_reward, cfg.collision_reward)
        reward = non_term + jnp.where(done, terminal, 0.0)
        s = s.replace(prev_distance=cur_d, prev_heading=cur_h, done=done,
                      episode_success=at_goal,
                      episode_failure=done & ~at_goal)

        tmpl_state, tmpl_obs = self._template
        key = jax.random.fold_in(state.key, 1)
        reset_state = jax.tree.map(jnp.asarray, tmpl_state).replace(key=key)
        sel = lambda a, b: jnp.where(was_done, a, b)
        new_state = jax.tree.map(sel, reset_state, s)
        return StepOutput(new_state, sel(jnp.asarray(tmpl_obs), obs),
                          sel(0.0, reward).astype(jnp.float32),
                          sel(False, done))

    def step_discrete(self, state: EnvState, action_idx) -> StepOutput:
        table = jnp.array(DISCRETE_ACTIONS_TABLE, dtype=jnp.float32)
        return self.step(state, table[action_idx])
