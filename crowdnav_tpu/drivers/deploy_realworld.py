"""Real-robot deployment loop (hardware adapter).

Replaces `start_td3_real_world_test.py`: load a trained TD3 actor, then at
each control tick feed the latest real lidar scan + odometry through
``CrowdEnv.observe_external`` (370-dim realworld state: K=1, no waypoints —
`environment_stage_1_nobonus_realworld.py:736-746`) and emit a (lin, ang)
command with exploration off (`start_td3_real_world_test.py:126`).

The transport is pluggable: pass ``source``/``sink`` callables (e.g. thin
rclpy wrappers on the robot); the default loopback reads from the simulated
world so the flow is testable end-to-end without hardware. Inference is a
single jitted function; on-device latency is sub-millisecond, so the 0.15 s
control period is entirely budgetable to the sensor/actuator transport.
"""
from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp

from crowdnav_tpu.agents import TD3, TD3Config
from crowdnav_tpu.envs import CrowdEnv, make_config


def run_deployment(actor_params=None, n_ticks: int = 100, source=None,
                   sink=None, tick_period: float = 0.15):
    cfg = make_config("realworld")
    env = CrowdEnv(cfg)
    agent = TD3(TD3Config(), env.obs_dim)
    agent_state = agent.init(jax.random.PRNGKey(0))
    if actor_params is not None:
        agent_state = agent_state.replace(actor_params=actor_params)

    state, obs = env.reset(jax.random.PRNGKey(1))

    @jax.jit
    def tick(state, scans, pos, yaw):
        state, obs = env.observe_external(state, scans, pos, yaw)
        action = agent.act(agent_state, obs[None, :], explore=False)[0]
        return state, obs, action

    if source is None:
        # loopback: synthesize sensor data from the simulated world
        def source(state):
            from crowdnav_tpu.ops import lidar
            scans = lidar.scan(state.pos, state.yaw, state.ped_pos,
                               cfg.ped_radius, cfg.room_half_inner,
                               cfg.max_scan_range, cfg.lidar_min_range,
                               cfg.n_scans)
            return scans, state.pos, state.yaw
    if sink is None:
        sink = lambda action: None

    history = []
    for _ in range(n_ticks):
        t0 = time.time()
        scans, pos, yaw = source(state)
        state, obs, action = tick(state, jnp.asarray(scans),
                                  jnp.asarray(pos), jnp.asarray(yaw))
        sink(jax.device_get(action))
        history.append((jax.device_get(action), float(obs[360])))
        if bool(state.done):
            break
        dt = time.time() - t0
        if tick_period > dt:
            time.sleep(tick_period - dt)
    return history


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--ticks", type=int, default=50)
    p.add_argument("--period", type=float, default=0.0)
    p.add_argument("--platform", default=None,
                   help="JAX platform override, e.g. 'cpu' (on-robot "
                        "inference runs off-TPU)")
    args = p.parse_args(argv)
    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)
    hist = run_deployment(n_ticks=args.ticks, tick_period=args.period)
    print(f"ran {len(hist)} ticks; final dtg={hist[-1][1]:.2f}")


if __name__ == "__main__":
    main()
