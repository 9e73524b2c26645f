"""Perceived-risk crowd-navigation environment (the centerpiece MDP).

Pure-functional, batched re-design of
`turtlebot3_rl_sim/src/environment_stage_1_nobonus.py` (SURVEY.md §2.1):
366 + 4K dim state (359 scans, heading/distance-to-waypoint, pose, yaw,
velocity, top-K obstacle pose/vel by collision probability), waypointed
goal, the -2/+1/+1/±200 reward, lidar termination, and the ego/social
safety accounting.

``reset`` / ``step`` are pure (state in, state out), jit- and vmap-able;
``CrowdEnv`` is a thin namespace over them bound to an ``EnvConfig``.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from crowdnav_tpu.envs.config import EnvConfig
from crowdnav_tpu.envs.world import EnvState, init_state, world_step
from crowdnav_tpu.ops import geom, lidar, risk


class StepOutput(NamedTuple):
    state: EnvState
    obs: jax.Array
    reward: jax.Array
    done: jax.Array


def _goal_box(pos, center, eps):
    """Axis-aligned desired-position box test
    (`environment_stage_1_nobonus.is_in_desired_position:1285-1301`; the
    reference's boundary is half-open ``(c-eps, c+eps]`` — we use the
    symmetric closed box, a measure-zero difference)."""
    return jnp.all(jnp.abs(pos - center) <= eps, axis=-1)


def _htg_reward(curr, prev):
    """Heading-progress reward table, transcribed from
    `compute_reward:1080-1106`: +1 when the heading error moved toward zero
    (or crossed sign), 0 when it drifted further on the same side."""
    hd = curr - prev
    pos_case = jnp.where((curr > 0) & (prev > 0), 0.0,
                         jnp.where((curr > 0) & (prev < 0), 1.0,
                                   jnp.where((curr < 0) & (prev < 0), 1.0,
                                             jnp.where((curr < 0) & (prev > 0),
                                                       1.0, 0.0))))
    neg_case = jnp.where((curr < 0) & (prev < 0), 0.0,
                         jnp.where((curr < 0) & (prev > 0), 1.0,
                                   jnp.where((curr > 0) & (prev > 0), 1.0,
                                             jnp.where((curr > 0) & (prev < 0),
                                                       1.0, 0.0))))
    return jnp.where(hd > 0, pos_case, jnp.where(hd < 0, neg_case, 0.0))


def _sense(cfg: EnvConfig, state: EnvState, scans=None):
    """Lidar half of the observation: simulated raycast (or external
    ``scans`` — the hardware-deployment path of
    `environment_stage_1_nobonus_realworld.py`), optional per-step sensor
    noise, 3-decimal rounding, world-frame points."""
    if scans is None:
        scans = lidar.scan(state.pos, state.yaw, state.ped_pos,
                           cfg.ped_radius, cfg.room_half_inner,
                           cfg.max_scan_range, cfg.lidar_min_range,
                           cfg.n_scans)
    if cfg.lidar_noise > 0.0:
        # the lidar plugin's Gaussian noise field (shipped 0.0,
        # turtlebot3_burger.gazebo.xacro:150-177): perturb HIT beams only
        # (no-hit beams return the clamped max range in Gazebo too) and
        # re-clip to the sensor band, so noise degrades ranges/segmentation
        # without manufacturing phantom obstacles out of free space
        k_lidar = jax.random.fold_in(state.key, 7)
        hit = scans < cfg.max_scan_range
        noisy = scans + jax.random.normal(k_lidar, scans.shape) \
            * cfg.lidar_noise
        scans = jnp.where(hit, jnp.clip(noisy, cfg.lidar_min_range,
                                        cfg.max_scan_range), scans)
    scans = jnp.round(scans, 3)
    points = lidar.scan_points(state.pos, state.yaw, scans, cfg.n_scans)
    return scans, points


def _goal_features(cfg: EnvConfig, state: EnvState):
    """Waypoint refresh + distance/heading-to-goal features."""
    goal = jnp.array(cfg.goal, jnp.float32)
    if cfg.use_waypoints:
        # waypoint refresh on the FOV circle: at step 1, every 5 steps, or
        # when the agent got closer to the current waypoint (:246-265)
        wp_first = geom.waypoint_on_circle(state.pos, goal,
                                           cfg.waypoint_radius)
        waypoint = jnp.where(state.step == 1, wp_first, state.waypoint)
        dtg = jnp.round(jnp.linalg.norm(waypoint - state.pos), 2)
        htg = jnp.round(geom.heading_to(waypoint, state.pos, state.yaw), 2)
        refresh = ((state.step % 5) == 0) | (dtg < state.prev_distance)
        waypoint = jnp.where(refresh, wp_first, waypoint)
    else:
        # realworld variant: no waypointing, goal features are to the true
        # goal (environment_stage_1_nobonus_realworld.py)
        waypoint = goal
        dtg = jnp.round(jnp.linalg.norm(goal - state.pos), 2)
        htg = jnp.round(geom.heading_to(goal, state.pos, state.yaw), 2)
    return waypoint, dtg, htg


def _finish_observe(cfg: EnvConfig, state: EnvState, scans,
                    out: "risk.RiskOutput", waypoint, dtg, htg, compute_cp):
    """Post-perception half: goal-reaching probability, termination flags,
    observation assembly, state bookkeeping."""
    goal = jnp.array(cfg.goal, jnp.float32)
    # goal-reaching probability (:968-988; computed-but-unused in the main
    # arm — "(NOT USED)" — and the +grp block of the ablation arms):
    # collision-cone TTC of the robot's motion line against an r=0.2 circle
    # at the true goal (goal velocity 0), CP weights 1.0*TTC + 0.0*distance.
    motion = state.pos - state.prev_pos
    agent_speed = jnp.linalg.norm(motion) / cfg.dt
    u_motion = motion / jnp.maximum(jnp.linalg.norm(motion), 1e-9)
    d_goal = geom.line_circle_min_distance(state.prev_pos, u_motion, goal, 0.2)
    hit_goal = jnp.isfinite(d_goal) & (agent_speed != 0.0)
    ttg = d_goal / jnp.where(agent_speed == 0.0, 1.0, agent_speed)
    grp = geom.collision_prob_ttc(ttg, hit_goal & compute_cp)

    # agent velocity features, as the reference computes them from the Twist
    # message — note it uses the *angular rate* as the angle (:773-774); kept
    # verbatim: the nets only see these as features
    vx = -state.lin_vel * jnp.cos(state.ang_vel)
    vy = state.lin_vel * jnp.sin(state.ang_vel)

    # termination (:1011-1023); min_scan_range = 0 disables the collision cut
    collided = (jnp.min(scans) < cfg.min_scan_range) if cfg.min_scan_range > 0 \
        else jnp.zeros((), bool)
    at_goal = _goal_box(state.pos, goal, cfg.goal_eps)
    timeout = state.step >= cfg.max_steps
    done = state.done | collided | at_goal | timeout

    if cfg.state_variant == "basic":
        # ablation_study/basic: the simple-env composition
        # (environment_stage_1_original.py:315-320) on this env
        obs = jnp.concatenate([
            scans, jnp.stack([htg, dtg]), jnp.round(state.pos, 3)])
    elif cfg.state_variant == "basic_grp":
        obs = jnp.concatenate([
            scans, jnp.stack([htg, dtg]), jnp.round(state.pos, 3),
            grp[None]])
    else:
        topk = out.top_k_pose_vel
        if cfg.state_variant == "no_cp":
            # the "no CP" toggle: the CP-selected block replaced by the
            # robot-pose padding [x, y, 0, 0] * K (:1032-1033)
            pad = jnp.concatenate([state.pos, jnp.zeros(2, state.pos.dtype)])
            topk = jnp.broadcast_to(pad[None, :], topk.shape)
        obs = jnp.concatenate([
            scans,
            jnp.stack([htg, dtg]),
            jnp.round(state.pos, 3),
            jnp.round(state.yaw, 3)[None],
            jnp.round(jnp.stack([vx, vy]), 3),
            topk.reshape(-1),
        ])
    obs = jnp.round(obs, 3)  # (:1042)

    new_state = state.replace(
        waypoint=waypoint,
        tracks=out.tracks,
        done=done,
        episode_success=at_goal,
        episode_failure=done & ~at_goal,
        ego_cp=out.ego_cp,
        obstacle_present_steps=state.obstacle_present_steps
        + out.obstacle_seen.astype(jnp.int32),
        ego_violations=state.ego_violations
        + out.ego_violation.astype(jnp.int32),
        social_violations=state.social_violations
        + (out.ego_cp > cfg.social_cp_threshold).astype(jnp.int32),
    )
    return new_state, obs, (dtg, htg), done, at_goal


def _observe(cfg: EnvConfig, state: EnvState, compute_cp, scans=None):
    """Sensor + perception half of ``Env.step``: lidar, waypoint refresh,
    risk pipeline, observation vector, termination flags (single env;
    the batched/kernel variant is ``_observe_batch``)."""
    scans, points = _sense(cfg, state, scans)
    waypoint, dtg, htg = _goal_features(cfg, state)
    out = risk.perceive(cfg, scans, points, state.tracks, state.pos,
                        state.prev_pos, compute_cp=compute_cp,
                        yaw=state.yaw if cfg.compute_regions else None)
    return _finish_observe(cfg, state, scans, out, waypoint, dtg, htg,
                           compute_cp)


def _observe_batch(cfg: EnvConfig, states: EnvState, compute_cp,
                   scans=None):
    """Batched observation with the fused Pallas risk kernel
    (``cfg.risk_backend == "pallas"``): segmentation stays vmapped XLA
    (it is beam-ring math that XLA already fuses well), then the
    tracker+CP+topK chain runs as one VMEM kernel over 128-env tiles
    (`ops/risk_pallas.py`). ``compute_cp`` is (N,) bool."""
    from crowdnav_tpu.ops.risk_pallas import track_cp_topk_batch

    if scans is None:
        scans, points = jax.vmap(lambda st: _sense(cfg, st))(states)
    else:
        scans, points = jax.vmap(
            lambda st, sc: _sense(cfg, st, sc))(states, scans)
    waypoint, dtg, htg = jax.vmap(
        lambda st: _goal_features(cfg, st))(states)
    segs = jax.vmap(
        lambda sc, pt: risk.segment_scans(cfg, sc, pt))(scans, points)
    new_tracks, top_cp, top_pv, cp_max, ego_cp = track_cp_topk_batch(
        cfg, segs, states.tracks, states.pos, states.prev_pos, compute_cp)
    out = risk.RiskOutput(
        tracks=new_tracks, top_k_pose_vel=top_pv, top_k_cp=top_cp,
        cp_max=cp_max, ego_cp=ego_cp,
        obstacle_seen=jnp.any(segs.is_obstacle, axis=-1),
        ego_violation=jnp.any(
            segs.is_obstacle
            & (segs.center_dist < cfg.ego_distance_threshold), axis=-1),
        segments=segs,
        segment_regions=jax.vmap(
            lambda st, sg: jnp.where(
                sg.valid, geom.social_region(st.pos, st.yaw, sg.center_pos,
                                             sg.center_dist), 0)
        )(states, segs) if cfg.compute_regions else None)
    return jax.vmap(
        lambda st, sc, o, wp, d, h, cc: _finish_observe(
            cfg, st, sc, o, wp, d, h, cc)
    )(states, scans, out, waypoint, dtg, htg, compute_cp)


def _reward(cfg: EnvConfig, state: EnvState, dtg, htg, done, at_goal):
    """`compute_reward:1046-1162` with the waypoint bonus and re-waypointing.

    Waypoint-bonus semantics. The reference's literal mechanic — +-0.2 box
    arrival test (`is_in_desired_position:1285-1301`) against a waypoint
    that re-projects to exactly 0.3 m ahead on progress (`:259-265`) — is
    numerically degenerate in deterministic kinematics: along a diagonal
    approach (this task's start->goal bearing is exactly 135 deg) the box
    passes at 0.267 m while the rounded-distance refresh ties, so the +200
    fires on ~4 of 5 steps forever — an infinite farm that taught the
    round-1 agent to *avoid* the goal (+1,100/ep, 0 successes). With any
    arrival test the progress-triggered re-projection also means the bonus
    essentially never fires on clean numerics (the waypoint stays 0.3 m
    ahead), deleting the breadcrumb +200 trail whose occasional firing
    under Gazebo jitter is what seeds the reference critic's goal signal.

    Default (intended) semantics — a farm-proof *milestone* trail with the
    same economics: +200 ("Reached waypoint position!!", `:1110-1127`) each
    time the robot's true-goal distance improves past its previous best by
    one waypoint radius (0.3 m), i.e. each time the next local waypoint on
    the trail is genuinely consumed. Oscillating or retreating re-covers
    old ground (distance > best) and pays nothing. ``strict_quirks=True``
    restores the reference's literal box test."""
    goal = jnp.array(cfg.goal, jnp.float32)
    dd = dtg - state.prev_distance
    dtg_r = jnp.where(dd < 0, cfg.dtg_reward, 0.0)
    htg_r = _htg_reward(htg, state.prev_heading) * cfg.htg_reward

    best = state.best_goal_dist
    if cfg.use_waypoints:
        new_wp = geom.waypoint_on_circle(state.pos, goal,
                                         cfg.waypoint_radius)
        new_wp = jnp.where(_goal_box(new_wp, goal, cfg.goal_eps), goal,
                           new_wp)
        if cfg.strict_quirks:
            at_waypoint = _goal_box(state.pos, state.waypoint, cfg.goal_eps)
        else:
            goal_dist = jnp.linalg.norm(state.pos - goal)
            at_waypoint = goal_dist <= best - cfg.waypoint_radius
            best = jnp.where(at_waypoint, goal_dist, best)
        wp_r = jnp.where(at_waypoint, cfg.waypoint_reward, 0.0)
        waypoint = jnp.where(at_waypoint, new_wp, state.waypoint)
    else:
        wp_r = 0.0
        at_waypoint = jnp.zeros((), bool)
        waypoint = state.waypoint

    non_term = cfg.step_penalty + dtg_r + htg_r + wp_r
    terminal = jnp.where(at_goal, cfg.goal_reward, cfg.collision_reward)
    reward = non_term + jnp.where(done, terminal, 0.0)

    return reward, state.replace(
        waypoint=waypoint, prev_distance=dtg, prev_heading=htg,
        best_goal_dist=best,
        dtg_reward_count=state.dtg_reward_count + (dd < 0).astype(jnp.int32),
        htg_reward_count=state.htg_reward_count + (htg_r > 0).astype(jnp.int32),
        wp_bonus_count=state.wp_bonus_count + at_waypoint.astype(jnp.int32))


class CrowdEnv:
    """Perceived-risk environment bound to a config. All methods are pure;
    wrap in ``jax.jit`` / ``jax.vmap`` at the call site (the runtime does)."""

    def __init__(self, cfg: EnvConfig):
        self.cfg = cfg
        self.obs_dim = cfg.state_dim_risk
        self.action_dim = 2
        if cfg.risk_backend == "pallas" and cfg.strict_quirks:
            raise ValueError(
                "risk_backend='pallas' implements the default quirks "
                "policy only; strict_quirks requires the xla backend")
        # The initial world is deterministic given the config (fixed start
        # pose, fixed pedestrian spawns) — only the RNG key varies across
        # resets. Precomputing the reset (state, obs) once lets the batched
        # auto-reset be a cheap select instead of a second full perception
        # pass in the vmapped cond (which lowers to select = both branches).
        import numpy as _np
        # jitted: the eager reset is hundreds of tiny dispatches, which is
        # minutes of latency on remote/tunneled backends
        # per-leaf np.asarray, NOT jax.device_get: device_get's batched
        # copy_to_host_async deadlocks through tunneled TPU relays
        st, obs = jax.jit(self.reset)(jax.random.PRNGKey(0))
        self._template = jax.tree.map(_np.asarray, (st, obs))

    def reset(self, key: jax.Array) -> tuple[EnvState, jax.Array]:
        """Fresh episode. The CP block is skipped on the reset observation
        (single-entry agent pose deque, :769), so the top-K slots hold the
        robot-pose padding — as in the reference's first state."""
        cfg = self.cfg
        state = init_state(cfg, key)
        state, obs, (dtg, htg), _, _ = _observe(
            cfg, state, compute_cp=jnp.zeros((), bool))
        state = state.replace(prev_distance=dtg, prev_heading=htg,
                              done=jnp.zeros((), bool),
                              episode_success=jnp.zeros((), bool),
                              episode_failure=jnp.zeros((), bool))
        return state, obs

    def step(self, state: EnvState, action: jax.Array) -> StepOutput:
        """One MDP transition: physics + perception + reward.

        Auto-resets when the episode ended on the previous step, so batched
        rollouts never stall (the reference's driver breaks the episode loop
        and calls ``reset`` — `start_td3_training.py:106-166`)."""
        cfg = self.cfg
        was_done = state.done

        s = world_step(cfg, state, action)
        s, obs, (dtg, htg), done, at_goal = _observe(
            cfg, s, compute_cp=jnp.ones((), bool))
        reward, s = _reward(cfg, s, dtg, htg, done, at_goal)

        tmpl_state, tmpl_obs = self._template
        key = jax.random.fold_in(state.key, 1)
        reset_state = jax.tree.map(jnp.asarray, tmpl_state).replace(key=key)
        if cfg.persist_tracks_across_reset:
            # reference reset keeps the tracker dict + waypoint
            # (environment_stage_1_nobonus.py:1227-1263) — carry the
            # terminal episode's into the fresh one
            reset_state = reset_state.replace(tracks=state.tracks,
                                              waypoint=state.waypoint)
        sel = lambda a, b: jnp.where(was_done, a, b)
        new_state = jax.tree.map(sel, reset_state, s)
        return StepOutput(new_state,
                          sel(jnp.asarray(tmpl_obs), obs),
                          sel(0.0, reward).astype(jnp.float32),
                          sel(False, done))

    def step_batch(self, states: EnvState, actions: jax.Array) -> StepOutput:
        """Batched step over a leading env axis so batch-level kernels can
        own their tiles: the Pallas lidar (`ops/lidar_pallas.py`, a
        documented fallback) and/or the fused Pallas risk kernel
        (`ops/risk_pallas.py` — tracker+CP+topK in one VMEM program).
        With both backends "xla" this is the plain vmapped ``step``
        (identical numerics across all paths — `tests/test_lidar_pallas`,
        `tests/test_risk_pallas`). The runtime uses this path when
        present."""
        cfg = self.cfg
        if cfg.lidar_backend != "pallas" and cfg.risk_backend != "pallas":
            return jax.vmap(self.step)(states, actions)

        was_done = states.done
        s = jax.vmap(lambda st, a: world_step(cfg, st, a))(states, actions)
        scans = None
        if cfg.lidar_backend == "pallas":
            from crowdnav_tpu.ops.lidar_pallas import scan_batch_pallas
            scans = scan_batch_pallas(
                s.pos, s.yaw, s.ped_pos, cfg.ped_radius,
                cfg.room_half_inner, cfg.max_scan_range,
                cfg.lidar_min_range, cfg.n_scans)

        if cfg.risk_backend == "pallas":
            n = was_done.shape[0]
            s2, obs, (dtg, htg), done, at_goal = _observe_batch(
                cfg, s, jnp.ones((n,), bool), scans)
            reward, s2 = jax.vmap(
                lambda st, d, h, dn, ag: _reward(cfg, st, d, h, dn, ag)
            )(s2, dtg, htg, done, at_goal)
        else:
            def one(st, sc):
                st2, obs, (dtg, htg), done, at_goal = _observe(
                    cfg, st, compute_cp=jnp.ones((), bool), scans=sc)
                reward, st2 = _reward(cfg, st2, dtg, htg, done, at_goal)
                return st2, obs, reward, done

            s2, obs, reward, done = jax.vmap(one)(s, scans)

        tmpl_state, tmpl_obs = self._template
        keys = jax.vmap(lambda k: jax.random.fold_in(k, 1))(states.key)
        n = was_done.shape[0]
        reset_state = jax.tree.map(
            lambda a: jnp.broadcast_to(jnp.asarray(a), (n,) + jnp.shape(a)),
            tmpl_state).replace(key=keys)
        if cfg.persist_tracks_across_reset:
            reset_state = reset_state.replace(tracks=states.tracks,
                                              waypoint=states.waypoint)

        def sel(a, b):
            m = was_done.reshape(was_done.shape + (1,) * (a.ndim - 1))
            return jnp.where(m, a, b)

        new_state = jax.tree.map(sel, reset_state, s2)
        obs = sel(jnp.broadcast_to(jnp.asarray(tmpl_obs),
                                   (n,) + jnp.shape(tmpl_obs)), obs)
        return StepOutput(new_state, obs,
                          jnp.where(was_done, 0.0, reward).astype(jnp.float32),
                          jnp.where(was_done, False, done))

    def observe_external(self, state: EnvState, scans: jax.Array,
                         pos: jax.Array, yaw: jax.Array):
        """Hardware-deployment observation: run the perception pipeline on a
        real sensor scan + odometry instead of the simulated world — the
        role of `environment_stage_1_nobonus_realworld.get_state` (scan
        topic + odom in, 366+4K state out). Returns (state, obs)."""
        state = state.replace(prev_pos=state.pos, pos=pos, yaw=yaw,
                              step=state.step + 1)
        state, obs, (dtg, htg), _, _ = _observe(
            self.cfg, state, compute_cp=jnp.ones((), bool), scans=scans)
        return state.replace(prev_distance=dtg, prev_heading=htg), obs

    # Episode metrics (`get_social_safety_violation_status:1269-1283`)
    def safety_scores(self, state: EnvState):
        denom = jnp.maximum(state.obstacle_present_steps, 1).astype(jnp.float32)
        ego = 1.0 - state.ego_violations.astype(jnp.float32) / denom
        social = 1.0 - state.social_violations.astype(jnp.float32) / denom
        return ego, social
