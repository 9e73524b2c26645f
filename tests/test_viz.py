"""Visualizer (RViz stand-in) + trajectory audit.

The reference renders tracked obstacles / goal / waypoint as live RViz
markers (`environment_stage_1_nobonus.py:909-966`, `utils.py:472-594`) and
audits paths via a per-step trajectory CSV
(`environment_stage_1_original.py:284-286`).
"""
import csv
import math
import os

import jax
import jax.numpy as jnp
import numpy as np

from crowdnav_tpu import viz
from crowdnav_tpu.envs import CrowdEnv, make_config


def _mk_env(max_steps=32):
    cfg = make_config("crowd_dense", max_steps=max_steps)
    return cfg, CrowdEnv(cfg)


def test_cp_color_ramp():
    g = viz.cp_color(0.0)
    r = viz.cp_color(1.0)
    assert g[1] > g[0]       # low CP: green-dominant
    assert r[0] > r[1]       # high CP: red-dominant
    assert viz.cp_color(2.0) == r    # clamped


def test_render_frame_and_save(tmp_path):
    cfg, env = _mk_env()
    state, obs = env.reset(jax.random.PRNGKey(0))
    step = jax.jit(env.step)
    for _ in range(4):
        state, obs, _, _ = step(state, jnp.array([0.22, 0.1]))
    scans = obs[: cfg.n_scans]
    cp = np.zeros(cfg.max_tracks, np.float32)
    cp[:] = 0.7
    ax = viz.render_frame(cfg, state, scans=scans, cp=cp)
    out = str(tmp_path / "frame.png")
    viz.save_figure(ax, out)
    assert os.path.getsize(out) > 5000


def test_trace_rollout_and_trajectory(tmp_path):
    cfg, env = _mk_env(max_steps=16)
    policy = lambda obs: jnp.array([0.22, 0.0], jnp.float32)
    states, scans, traj, rewards, dones = jax.jit(
        lambda k: viz.trace_rollout(env, policy, k, 10)
    )(jax.random.PRNGKey(1))
    assert traj.shape == (10, 3)
    assert scans.shape == (10, cfg.n_scans)
    assert rewards.shape == (10,)
    # the robot actually moves forward
    assert float(jnp.linalg.norm(traj[-1, :2] - traj[0, :2])) > 0.05

    w = viz.TrajectoryWriter(str(tmp_path), "traj")
    w.record_rollout(jax.device_get(traj))
    with open(w.path) as fp:
        rows = list(csv.reader(fp))
    assert len(rows) == 10
    # schema: [step, x, y, yaw_degrees]
    assert int(rows[0][0]) == 0
    assert abs(float(rows[3][3]) - math.degrees(float(traj[3, 2]))) < 0.01

    ax = viz.render_trajectory(cfg, jax.device_get(traj), label="test")
    out = str(tmp_path / "traj.png")
    viz.save_figure(ax, out)
    assert os.path.getsize(out) > 5000


def test_save_gif(tmp_path):
    cfg, env = _mk_env(max_steps=8)
    policy = lambda obs: jnp.array([0.22, 0.3], jnp.float32)
    states, scans, traj, _, _ = jax.jit(
        lambda k: viz.trace_rollout(env, policy, k, 6)
    )(jax.random.PRNGKey(2))
    out = str(tmp_path / "roll.gif")
    viz.save_gif(cfg, jax.device_get(states), jax.device_get(scans), out,
                 every=2, fps=4)
    assert os.path.getsize(out) > 5000
