"""Non-learned baseline policies (smoke-test + comparison anchors).

``fsm_obstacle_avoider``: batched JAX port of the scripted reactive
controller in `turtlebot3_gazebo/src/gazebo_ros_turtlebot3.cpp:111-186` —
sample 3 beams (0 deg, 30 deg, 330 deg), drive forward while the front is
clear, turn right when the front/left is blocked, left when the right is
blocked, and keep turning until the commanded wheel rotation completes.
The per-robot FSM state is a two-int carry, so the policy vmaps over envs.

``goal_seeker``: proportional heading controller toward the goal — a
sanity baseline the learned agents must beat in crowded worlds.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

# gazebo_ros_turtlebot3.h constants (LINEAR/ANGULAR_VELOCITY, limits).
# The C++ node's 0.7/0.4 m limits assume the stock 3.5 m lidar; this stack
# uses the paper's 0.6 m-capped sensor (turtlebot3_burger.gazebo.xacro:
# 163-167), so the thresholds scale down proportionally to stay inside the
# observable range.
FSM_LINEAR_VEL = 0.3
FSM_ANGULAR_VEL = 1.5
FRONT_LIMIT = 0.45
SIDE_LIMIT = 0.25
# scan_angle = {0, 30, 330} (gazebo_ros_turtlebot3.cpp:83)
_BEAMS = (0, 30, 330)

# FSM states (:56-58 of the header)
GET_DIRECTION, DRIVE_FORWARD, RIGHT_TURN, LEFT_TURN = 0, 1, 2, 3


class FsmState(NamedTuple):
    mode: jax.Array        # () int32
    turn_left: jax.Array   # () int32 remaining turn ticks (encoder stand-in)


def fsm_init(batch_shape=()) -> FsmState:
    return FsmState(mode=jnp.zeros(batch_shape, jnp.int32),
                    turn_left=jnp.zeros(batch_shape, jnp.int32))


def _fsm_single(scans, st: FsmState, turn_ticks: int = 6):
    """One control decision from a (359,) observation-order scan.

    Observation beams are clockwise from the heading, so the C++ node's
    counter-clockwise 30 deg / 330 deg sensors map to beams 329 / 30.
    The wheel-encoder turn target becomes a fixed tick count (the node
    turns ~`rotate_angle` at 125 Hz; at our 0.15 s step, `turn_ticks`
    steps of 1.5 rad/s ≈ the same 45-90 deg sweep).
    """
    center = scans[0]
    left = scans[329]    # +30 deg CCW
    right = scans[30]    # -30 deg CCW (a.k.a. 330 deg)

    def decide(_):
        blocked_front = (center < FRONT_LIMIT) | (left < SIDE_LIMIT)
        blocked_right = right < SIDE_LIMIT
        mode = jnp.where(blocked_front, RIGHT_TURN,
                         jnp.where(blocked_right, LEFT_TURN, DRIVE_FORWARD))
        ticks = jnp.where(mode == DRIVE_FORWARD, 0, turn_ticks)
        return FsmState(mode=mode, turn_left=ticks)

    def turning(st):
        ticks = st.turn_left - 1
        mode = jnp.where(ticks <= 0, GET_DIRECTION, st.mode)
        return FsmState(mode=mode, turn_left=jnp.maximum(ticks, 0))

    st = jax.lax.cond((st.mode == GET_DIRECTION) | (st.mode == DRIVE_FORWARD),
                      decide, turning, st)
    lin = jnp.where(st.mode == DRIVE_FORWARD, FSM_LINEAR_VEL, 0.0)
    ang = jnp.where(st.mode == RIGHT_TURN, -FSM_ANGULAR_VEL,
                    jnp.where(st.mode == LEFT_TURN, FSM_ANGULAR_VEL, 0.0))
    # clamp to the burger's envelope used everywhere else
    action = jnp.stack([jnp.minimum(lin, 0.22), ang])
    return action, st


def fsm_obstacle_avoider(obs, st: FsmState):
    """Batched policy: obs (..., >=359) -> actions (..., 2) + next state."""
    scans = obs[..., :359]
    if obs.ndim == 1:
        return _fsm_single(scans, st)
    return jax.vmap(_fsm_single)(scans, st)


def goal_seeker(obs, max_lin=0.22, max_ang=2.0, k_ang=2.0):
    """Proportional controller on the state's (htg, dtg) features
    (indices 359/360 in both env layouts)."""
    htg = obs[..., 359]
    ang = jnp.clip(k_ang * htg, -max_ang, max_ang)
    lin = jnp.where(jnp.abs(htg) < 1.0, max_lin, 0.05)
    return jnp.stack([lin, ang], axis=-1)
