"""World model: per-env state pytree, robot kinematics, crowd dynamics.

Replaces Gazebo physics + the `turtlebot3_fake` C++ node + the 34 crowd
driver scripts with one pure-functional, fixed-shape step that vmaps over
thousands of environments:

- Differential-drive integration is the exact math of
  `turtlebot3_fake.cpp:109-179` (cmd_vel -> wheel speeds -> midpoint-heading
  Euler odometry) at a fixed dt, replacing the wall-clock 0.15 s sleep in
  `environment_stage_1_nobonus.py:1198-1205`.
- Pedestrians are kinematic cylinders driven by behavior tables
  (`crowd_behaviors/simulate_*.py`), clamped at the walls (Gazebo gives them
  zero friction so wall contact just stops them —
  `worlds/turtlebot3_crowd_dense.world:108-119`).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from crowdnav_tpu.envs.config import CrowdBehavior, EnvConfig


@struct.dataclass
class TrackState:
    """Fixed-slot obstacle tracker (replaces the uuid dict at
    `environment_stage_1_nobonus.py:120-124,656-743`)."""

    valid: jax.Array      # (T,) bool
    pos: jax.Array        # (T, 2) latest matched position (world frame)
    prev_pos: jax.Array   # (T, 2) previous position (the 2-deque :665)
    has_prev: jax.Array   # (T,) bool — deque length > 1
    dist: jax.Array       # (T,) latest scan distance of the segment center
    speed: jax.Array      # (T,) |v| estimate (:745-761)
    vel: jax.Array        # (T, 2) (prev - curr)/dt, the reference's stored
                          #        sign convention (:806-810)


@struct.dataclass
class EnvState:
    """Complete per-environment MDP state (one pytree; vmapped over envs)."""

    # robot
    pos: jax.Array          # (2,)
    yaw: jax.Array          # ()
    lin_vel: jax.Array      # () commanded linear vel (held through the step)
    ang_vel: jax.Array      # ()
    prev_pos: jax.Array     # (2,) robot position one step ago
                            # (agent_pose_deque :104)
    # crowd
    ped_pos: jax.Array      # (P, 2)
    ped_vel: jax.Array      # (P, 2) current velocity draw
    ped_dirs: jax.Array     # (P, 2) per-env direction table (fixed-pattern
                            #        behaviors; possibly permuted at reset)
    ped_phase: jax.Array    # () int32 redraw-window phase offset
    # task
    waypoint: jax.Array     # (2,) local goal (:80-83)
    prev_distance: jax.Array  # () distance-to-waypoint at previous step
    prev_heading: jax.Array   # () heading-to-waypoint at previous step
    best_goal_dist: jax.Array  # () closest true-goal distance paid out so
                               # far (waypoint milestone accounting)
    # tracker
    tracks: TrackState
    # bookkeeping
    step: jax.Array           # () int32 in-episode step counter
    done: jax.Array           # () bool
    episode_success: jax.Array  # () bool
    episode_failure: jax.Array  # () bool
    ego_cp: jax.Array           # () max TTC-collision-prob this step (:879)
    social_violations: jax.Array    # () int32 (:1004-1005)
    ego_violations: jax.Array       # () int32 (:999-1002)
    obstacle_present_steps: jax.Array  # () int32 (:653-654)
    last_action_type: jax.Array  # () int32: 0=FWD 1=LEFT 2=RIGHT 3=STOP
    # per-episode reward-component counters (the reference's end-of-episode
    # terminal dump, environment_stage_1_nobonus.py:1136-1147)
    dtg_reward_count: jax.Array  # () int32
    htg_reward_count: jax.Array  # () int32
    wp_bonus_count: jax.Array    # () int32 waypoint +200 fires
    key: jax.Array               # PRNG key


def init_state(cfg: EnvConfig, key: jax.Array) -> EnvState:
    """Fresh episode state (the `reset` world half: Gazebo reset_simulation
    restores the world poses — `environment_stage_1_nobonus.py:1227-1263`).

    With any of the ``*_jitter`` / ``ped_shuffle`` config fields set, the
    spawn is randomized from ``key`` — the batched-engine stand-in for the
    episode diversity the reference gets for free from Gazebo physics noise
    (without it, fixed-pattern worlds make every env in a batch
    bit-identical). All-zero jitter reproduces the deterministic template
    spawn exactly (same RNG stream as before)."""
    f32 = jnp.float32
    n_p = max(cfg.n_peds, 1)
    # The n_peds == 0 placeholder slot must sit far outside lidar range:
    # a zeros placeholder is a phantom obstacle at the room center that the
    # raycaster sees and the env "collides" with.
    ped_init = jnp.array(cfg.ped_init, dtype=f32).reshape(-1, 2) \
        if cfg.n_peds else jnp.full((1, 2), 1e3, f32)
    dirs = jnp.array(cfg.direction_table(), dtype=f32).reshape(-1, 2) \
        if cfg.n_peds else jnp.zeros((1, 2), f32)
    phase = jnp.zeros((), jnp.int32)
    pos0 = jnp.array(cfg.start_pose[:2], f32)
    yaw0 = jnp.array(cfg.start_pose[2], f32)
    randomized = (cfg.start_pos_jitter > 0 or cfg.start_yaw_jitter > 0
                  or cfg.ped_pos_jitter > 0 or cfg.ped_shuffle
                  or cfg.ped_phase_jitter)
    if randomized:
        k_pos, k_yaw, k_ped, k_perm, k_phase, key = jax.random.split(key, 6)
        if cfg.start_pos_jitter > 0:
            pos0 = pos0 + jax.random.uniform(
                k_pos, (2,), f32, -cfg.start_pos_jitter, cfg.start_pos_jitter)
            pos0 = jnp.clip(pos0, -(cfg.room_half_inner - cfg.robot_radius),
                            cfg.room_half_inner - cfg.robot_radius)
        if cfg.start_yaw_jitter > 0:
            yaw0 = yaw0 + jax.random.uniform(
                k_yaw, (), f32, -cfg.start_yaw_jitter, cfg.start_yaw_jitter)
            yaw0 = (yaw0 + jnp.pi) % (2 * jnp.pi) - jnp.pi
        if cfg.ped_pos_jitter > 0 and cfg.n_peds:
            ped_init = ped_init + jax.random.uniform(
                k_ped, ped_init.shape, f32,
                -cfg.ped_pos_jitter, cfg.ped_pos_jitter)
            ped_init = jnp.clip(ped_init,
                                -(cfg.room_half_inner - cfg.ped_radius),
                                cfg.room_half_inner - cfg.ped_radius)
        if cfg.ped_shuffle and cfg.n_peds:
            dirs = jax.random.permutation(k_perm, dirs, axis=0)
        if cfg.ped_phase_jitter:
            phase = jax.random.randint(
                k_phase, (), 0, max(cfg.redraw_window_steps, 1), jnp.int32)
    tr = TrackState(
        valid=jnp.zeros(cfg.max_tracks, bool),
        pos=jnp.zeros((cfg.max_tracks, 2), f32),
        prev_pos=jnp.zeros((cfg.max_tracks, 2), f32),
        has_prev=jnp.zeros(cfg.max_tracks, bool),
        dist=jnp.full(cfg.max_tracks, cfg.max_scan_range, f32),
        speed=jnp.zeros(cfg.max_tracks, f32),
        vel=jnp.zeros((cfg.max_tracks, 2), f32),
    )
    pos = pos0
    goal = jnp.array(cfg.goal, f32)
    d0 = jnp.linalg.norm(goal - pos)
    bearing = jnp.arctan2(goal[1] - pos[1], goal[0] - pos[0])
    h0 = bearing - yaw0
    h0 = (h0 + jnp.pi) % (2 * jnp.pi) - jnp.pi
    return EnvState(
        pos=pos,
        yaw=yaw0,
        lin_vel=jnp.zeros((), f32),
        ang_vel=jnp.zeros((), f32),
        prev_pos=pos,
        best_goal_dist=d0.astype(f32),
        ped_pos=ped_init,
        ped_vel=jnp.zeros((n_p, 2), f32),
        ped_dirs=dirs,
        ped_phase=phase,
        waypoint=goal,   # refreshed to the FOV circle on the first step (:246)
        prev_distance=d0.astype(f32),
        prev_heading=h0.astype(f32),
        tracks=tr,
        step=jnp.zeros((), jnp.int32),
        done=jnp.zeros((), bool),
        episode_success=jnp.zeros((), bool),
        episode_failure=jnp.zeros((), bool),
        ego_cp=jnp.zeros((), f32),
        social_violations=jnp.zeros((), jnp.int32),
        ego_violations=jnp.zeros((), jnp.int32),
        obstacle_present_steps=jnp.zeros((), jnp.int32),
        last_action_type=jnp.zeros((), jnp.int32),
        dtg_reward_count=jnp.zeros((), jnp.int32),
        htg_reward_count=jnp.zeros((), jnp.int32),
        wp_bonus_count=jnp.zeros((), jnp.int32),
        key=key,
    )


def integrate_robot(pos, yaw, lin_vel, ang_vel, dt, wheel_separation,
                    wheel_radius):
    """One differential-drive kinematics step, bit-matching
    `turtlebot3_fake.cpp` (`commandVelocityCallback:109-118` +
    `updateOdometry:123-179`):

      wheel_speed_l/r = v -/+ w * sep / 2
      delta_s     = R * (wr + wl) / 2        (wheel angles w = v/R * dt)
      delta_theta = R * (wr - wl) / sep
      x += delta_s * cos(yaw + delta_theta/2)   (midpoint heading)
      y += delta_s * sin(yaw + delta_theta/2)
    """
    v_l = lin_vel - ang_vel * wheel_separation / 2.0
    v_r = lin_vel + ang_vel * wheel_separation / 2.0
    wheel_l = (v_l / wheel_radius) * dt
    wheel_r = (v_r / wheel_radius) * dt
    delta_s = wheel_radius * (wheel_r + wheel_l) / 2.0
    delta_theta = wheel_radius * (wheel_r - wheel_l) / wheel_separation
    mid = yaw + delta_theta / 2.0
    new_pos = pos + delta_s * jnp.stack([jnp.cos(mid), jnp.sin(mid)], -1)
    return new_pos, yaw + delta_theta


def crowd_step(cfg: EnvConfig, key, step, ped_pos, ped_vel, robot_pos,
               ped_dirs=None, ped_phase=0, dt=None):
    """Advance pedestrians one dt.

    Velocity redraw every ``redraw_window_steps`` (the scripts' re-issue
    windows, e.g. `simulate_random_20.py:111-118`); fixed-pattern families use
    the transcribed direction tables. TOWARDS velocities in the reference are
    aimed at the robot's side of the room via fixed (+x biased) patterns —
    kept as the fixed table (the robot starts on +x).

    Wall interaction: positions clamp to the inner walls (zero-friction
    cylinders stop at contact).
    """
    if cfg.n_peds == 0:
        return ped_pos, ped_vel
    redraw = ((step + ped_phase) % cfg.redraw_window_steps) == 0
    if cfg.behavior == CrowdBehavior.RANDOM:
        new_vel = jax.random.uniform(
            key, ped_pos.shape, minval=-cfg.crowd_speed,
            maxval=cfg.crowd_speed, dtype=ped_pos.dtype)
    elif cfg.behavior == CrowdBehavior.STATIC:
        new_vel = jnp.zeros_like(ped_vel)
    else:
        table = jnp.array(cfg.direction_table(), dtype=ped_pos.dtype) \
            if ped_dirs is None else ped_dirs
        new_vel = table * cfg.crowd_speed
    vel = jnp.where(redraw, new_vel, ped_vel)
    pos = ped_pos + vel * (cfg.dt if dt is None else dt)
    lim = cfg.room_half_inner - cfg.ped_radius
    pos = jnp.clip(pos, -lim, lim)
    return pos, vel


def classify_action(lin_vel, ang_vel, mode_discrete: bool = False):
    """Action-type code for reward accounting
    (`environment_stage_1_nobonus.step:1178-1193`):
    FORWARD if |w| <= 2/16, else TURN_LEFT / TURN_RIGHT; STOP if both 0."""
    fwd_band = (ang_vel >= -2.0 / 16.0) & (ang_vel <= 2.0 / 16.0)
    code = jnp.where(fwd_band, 0, jnp.where(ang_vel > 0, 1, 2))
    stop = (lin_vel == 0.0) & (ang_vel == 0.0)
    return jnp.where(stop, 3, code).astype(jnp.int32)


def world_step(cfg: EnvConfig, state: EnvState, action) -> EnvState:
    """Physics half of ``Env.step``: apply cmd_vel, integrate robot + crowd.

    ``action`` is (lin_vel, ang_vel) — already squashed/clipped by the agent
    (td3.py:103-104, 214-215).
    """
    lin_vel, ang_vel = action[0], action[1]
    key, k_crowd, k_act, k_dt = jax.random.split(state.key, 4)
    # per-step stochasticity (EnvConfig docs): noise on the EXECUTED
    # command and the TRUE elapsed dt; the recorded lin/ang_vel and the
    # risk tracker's nominal-dt division stay noise-blind, as in Gazebo
    # where the agent commands one thing and contact physics + scheduler
    # timing deliver another
    exec_lin, exec_ang = lin_vel, ang_vel
    if cfg.actuation_noise > 0.0:
        nz = jax.random.normal(k_act, (2,)) * cfg.actuation_noise
        exec_lin = exec_lin + nz[0] * cfg.max_lin_vel
        exec_ang = exec_ang + nz[1] * cfg.max_ang_vel
    dt = cfg.dt
    if cfg.dt_jitter > 0.0:
        dt = dt * (1.0 + jax.random.uniform(
            k_dt, (), minval=-cfg.dt_jitter, maxval=cfg.dt_jitter))
    pos, yaw = integrate_robot(state.pos, state.yaw, exec_lin, exec_ang,
                               dt, cfg.wheel_separation, cfg.wheel_radius)
    # keep the robot inside the room (Gazebo wall contact)
    lim = cfg.room_half_inner - cfg.robot_radius
    pos = jnp.clip(pos, -lim, lim)
    yaw = (yaw + jnp.pi) % (2 * jnp.pi) - jnp.pi
    ped_pos, ped_vel = crowd_step(cfg, k_crowd, state.step, state.ped_pos,
                                  state.ped_vel, pos,
                                  ped_dirs=state.ped_dirs,
                                  ped_phase=state.ped_phase, dt=dt)
    return state.replace(
        pos=pos, yaw=yaw, lin_vel=lin_vel, ang_vel=ang_vel,
        prev_pos=state.pos,
        ped_pos=ped_pos, ped_vel=ped_vel,
        step=state.step + 1,
        last_action_type=classify_action(lin_vel, ang_vel),
        key=key,
    )
