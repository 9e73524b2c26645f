"""Visualization + trajectory audit: the RViz stand-in.

The reference publishes live RViz markers per step — tracked obstacles as
cylinders colored by collision probability with CP text labels, plus goal
and waypoint markers (`environment_stage_1_nobonus.py:909-966`,
`utils.py:472-594`, display config
`rviz_config/rl_crowd_navigation_rviz.rviz`) — and the simple environment
writes a per-step trajectory CSV ``[step, x, y, yaw_deg]`` for offline path
plotting (`environment_stage_1_original.py:284-286`).

Here the env state is an array pytree, so visualization is pure host-side
rendering: ``render_frame`` draws one environment's world state (room,
robot, pedestrians, lidar returns, CP-colored tracks, goal, waypoint),
``render_trajectory`` plots a path, ``save_gif`` animates a rollout, and
``TrajectoryWriter`` reproduces the reference's trajectory CSV schema.
Matplotlib is imported lazily with the Agg backend (headless TPU hosts).
"""
from __future__ import annotations

import csv
import math
import os

import jax.numpy as jnp
import numpy as np

from crowdnav_tpu.ops import geom


def _mpl():
    import matplotlib
    matplotlib.use("Agg", force=False)
    import matplotlib.pyplot as plt
    return plt


def _host(tree):
    import jax
    return jax.tree.map(np.asarray, tree)


def cp_color(cp: float):
    """Collision-probability color: green (0) -> red (1), the reference's
    HSV ramp intent (`utils.py:496-500`: hue scaled by CP, red = highest)."""
    import colorsys
    cp = float(min(max(cp, 0.0), 1.0))
    return colorsys.hsv_to_rgb((1.0 - cp) * (1.0 / 3.0), 0.9, 0.9)


def render_frame(cfg, state, scans=None, cp=None, ax=None, title=None):
    """Draw one environment's state; returns the matplotlib Axes.

    ``state``: a single-env ``EnvState`` (index one env out of a batch with
    ``jax.tree.map(lambda x: x[i], states)``). ``scans``: optional (n_scans,)
    lidar ranges to draw endpoint returns. ``cp``: optional (max_tracks,)
    per-track collision probabilities for the color ramp; tracks render
    gray without it.
    """
    plt = _mpl()
    state = _host(state)
    if ax is None:
        _, ax = plt.subplots(figsize=(6, 6))

    half = cfg.room_half_inner
    # room walls (worlds/turtlebot3_crowd_dense.world:932)
    ax.add_patch(plt.Rectangle((-half, -half), 2 * half, 2 * half,
                               fill=False, edgecolor="black", linewidth=2))

    # goal: the 0.4 x 0.4 visual-only goal_box model
    # (models/goal_box/model.sdf:1-25) == the +-goal_eps desired box
    gx, gy = cfg.goal
    e = cfg.goal_eps
    ax.add_patch(plt.Rectangle((gx - e, gy - e), 2 * e, 2 * e,
                               facecolor="#2ca02c", alpha=0.35,
                               edgecolor="#2ca02c", label="goal"))
    # waypoint marker (:941-966)
    wx, wy = np.asarray(state.waypoint)
    ax.plot([wx], [wy], marker="x", color="#1f77b4", markersize=10,
            markeredgewidth=2.5, linestyle="none", label="waypoint")

    # pedestrians (ground truth)
    for px, py in np.atleast_2d(np.asarray(state.ped_pos))[: cfg.n_peds]:
        ax.add_patch(plt.Circle((px, py), cfg.ped_radius,
                                facecolor="#bbbbbb", edgecolor="#777777"))

    # lidar returns
    if scans is not None:
        from crowdnav_tpu.ops import lidar
        pts = np.asarray(lidar.scan_points(state.pos, state.yaw,
                                           np.asarray(scans), cfg.n_scans))
        hit = np.asarray(scans) < cfg.max_scan_range
        ax.plot(pts[hit, 0], pts[hit, 1], ".", color="#ff7f0e",
                markersize=2, linestyle="none", label="lidar")

    # tracked obstacles, CP-colored with CP text labels (:909-940)
    valid = np.asarray(state.tracks.valid)
    tpos = np.asarray(state.tracks.pos)
    tvel = np.asarray(state.tracks.vel)
    for i in range(valid.shape[0]):
        if not valid[i]:
            continue
        c = cp_color(cp[i]) if cp is not None else (0.5, 0.5, 0.5)
        ax.add_patch(plt.Circle(tuple(tpos[i]), 0.0505, fill=False,
                                edgecolor=c, linewidth=2))
        # stored track velocity is (prev - curr)/dt; draw the motion arrow
        vx, vy = -tvel[i]
        if abs(vx) + abs(vy) > 1e-6:
            ax.arrow(tpos[i, 0], tpos[i, 1], vx * 0.3, vy * 0.3,
                     head_width=0.03, color=c, length_includes_head=True)
        if cp is not None:
            ax.text(tpos[i, 0] + 0.06, tpos[i, 1] + 0.06,
                    f"CP={float(cp[i]):.2f}", fontsize=7, color=c)
        # social-region tag (`utils.get_obstacle_region:146-215` — the
        # reference computes FRF/FLF/FRC/FLC per obstacle for its social-
        # navigation debugging; here it annotates the same debug view
        # with the exact rectangle-polygon geometry)
        rel = tpos[i] - np.asarray(state.pos)
        region = int(geom.social_region(
            jnp.asarray(state.pos), jnp.asarray(state.yaw),
            jnp.asarray(tpos[i]), jnp.asarray(np.linalg.norm(rel))))
        tag = ("", "FRF", "FLF", "FRC", "FLC")[region]
        if tag:
            ax.text(tpos[i, 0] + 0.06, tpos[i, 1] - 0.06, tag,
                    fontsize=6, color="#555555")

    # robot: body circle + heading arrow
    x, y = np.asarray(state.pos)
    yaw = float(state.yaw)
    ax.add_patch(plt.Circle((x, y), cfg.robot_radius, facecolor="#1f77b4",
                            alpha=0.8, edgecolor="black", label="robot"))
    ax.arrow(x, y, 0.18 * math.cos(yaw), 0.18 * math.sin(yaw),
             head_width=0.05, color="black", length_includes_head=True)

    m = half + 0.2
    ax.set_xlim(-m, m)
    ax.set_ylim(-m, m)
    ax.set_aspect("equal")
    ax.set_title(title or f"step {int(state.step)}")
    return ax


def render_trajectory(cfg, traj, ax=None, title=None, label=None):
    """Path plot from an (T, >=2) array of [x, y(, yaw...)] rows — the
    offline counterpart of the reference's trajectory CSV audit."""
    plt = _mpl()
    traj = np.asarray(traj)
    if ax is None:
        _, ax = plt.subplots(figsize=(6, 6))
        half = cfg.room_half_inner
        ax.add_patch(plt.Rectangle((-half, -half), 2 * half, 2 * half,
                                   fill=False, edgecolor="black",
                                   linewidth=2))
        gx, gy = cfg.goal
        e = cfg.goal_eps
        ax.add_patch(plt.Rectangle((gx - e, gy - e), 2 * e, 2 * e,
                                   facecolor="#2ca02c", alpha=0.35))
        m = half + 0.2
        ax.set_xlim(-m, m)
        ax.set_ylim(-m, m)
        ax.set_aspect("equal")
    ax.plot(traj[:, 0], traj[:, 1], "-", linewidth=1.5, label=label)
    ax.plot(traj[0, 0], traj[0, 1], "o", color="black", markersize=5)
    if title:
        ax.set_title(title)
    if label:
        ax.legend(loc="upper right", fontsize=8)
    return ax


def save_figure(ax, path: str):
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    ax.figure.savefig(path, dpi=110, bbox_inches="tight")
    _mpl().close(ax.figure)


def save_gif(cfg, states, scans_seq, path: str, every: int = 1,
             fps: int = 8):
    """Animate a rollout: ``states`` a batched-over-time EnvState pytree
    (leading axis T), ``scans_seq`` (T, n_scans). Writes a GIF via Pillow."""
    import jax
    from matplotlib.animation import PillowWriter

    plt = _mpl()
    fig, ax = plt.subplots(figsize=(6, 6))
    writer = PillowWriter(fps=fps)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    T = int(np.asarray(scans_seq).shape[0])
    with writer.saving(fig, path, dpi=80):
        for t in range(0, T, every):
            ax.clear()
            st = jax.tree.map(lambda x: x[t], states)
            render_frame(cfg, st, scans=np.asarray(scans_seq)[t], ax=ax)
            writer.grab_frame()
    plt.close(fig)


class TrajectoryWriter:
    """Per-step trajectory CSV in the reference's schema
    ``[step, x, y, yaw_degrees]`` (`environment_stage_1_original.py:284-286`
    via `utils.record_data:53-64` — no header row for trajectory files)."""

    def __init__(self, outdir: str, filename: str):
        os.makedirs(outdir, exist_ok=True)
        self.path = os.path.join(outdir, filename + ".csv")

    def record(self, step: int, x: float, y: float, yaw_rad: float):
        with open(self.path, "a", newline="") as fp:
            csv.writer(fp).writerow(
                [step, round(float(x), 4), round(float(y), 4),
                 round(math.degrees(float(yaw_rad)), 3)])

    def record_rollout(self, traj):
        """traj: (T, 3) [x, y, yaw]; steps are row indices."""
        traj = np.asarray(traj)
        with open(self.path, "a", newline="") as fp:
            w = csv.writer(fp)
            for t, row in enumerate(traj):
                w.writerow([t, round(float(row[0]), 4),
                            round(float(row[1]), 4),
                            round(math.degrees(float(row[2])), 3)])


def trace_rollout(env, policy_fn, key, n_steps: int):
    """Jitted single-env rollout that records the full state sequence for
    rendering/audit: returns (states_over_time, scans (T, n_scans),
    traj (T, 3) of [x, y, yaw], rewards (T,), dones (T,)).

    ``policy_fn(obs) -> action`` must be jittable (e.g. a greedy actor
    forward, or a `crowdnav_tpu.baselines` policy).
    """
    import jax
    import jax.numpy as jnp

    state, obs = env.reset(key)

    def step(carry, _):
        state, obs = carry
        action = policy_fn(obs)
        out = env.step(state, action)
        scans = out.obs[: env.cfg.n_scans]
        pose = jnp.concatenate([out.state.pos, out.state.yaw[None]])
        return (out.state, out.obs), (out.state, scans, pose, out.reward,
                                      out.done)

    (_, _), (states, scans, traj, rewards, dones) = jax.lax.scan(
        step, (state, obs), None, length=n_steps)
    return states, scans, traj, rewards, dones
