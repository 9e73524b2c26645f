"""Native fastsim (C++) vs JAX engine parity."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from crowdnav_tpu.envs import make_config
from crowdnav_tpu.envs.world import init_state, integrate_robot
from crowdnav_tpu.ops import lidar


@pytest.fixture(scope="module")
def sim():
    from crowdnav_tpu.native import FastSim
    return FastSim(make_config("crowd_dense", "static", max_steps=100))


def test_native_builds_and_scans(sim):
    scan = sim.scan()
    assert scan.shape == (359,)
    assert 0.08 <= scan.min() and scan.max() <= 0.6 + 1e-6


def test_native_kinematics_matches_jax(sim):
    cfg = sim.cfg
    sim.reset()
    rng = np.random.default_rng(0)
    pos = jnp.array(cfg.start_pose[:2], jnp.float32)
    yaw = jnp.float32(cfg.start_pose[2])
    for _ in range(25):
        v = float(rng.uniform(0, 0.22))
        w = float(rng.uniform(-2, 2))
        sim.step(v, w)
        pos, yaw = integrate_robot(pos, yaw, jnp.float32(v), jnp.float32(w),
                                   cfg.dt, cfg.wheel_separation,
                                   cfg.wheel_radius)
        lim = cfg.room_half_inner - cfg.robot_radius
        pos = jnp.clip(pos, -lim, lim)
        yaw = (yaw + jnp.pi) % (2 * jnp.pi) - jnp.pi
    np.testing.assert_allclose(sim.pose[:2], np.asarray(pos), atol=1e-4)
    dyaw = abs(float(sim.pose[2]) - float(yaw))
    assert min(dyaw, 2 * np.pi - dyaw) < 1e-4


def test_native_scan_matches_jax(sim):
    cfg = sim.cfg
    sim.reset()
    sim.step(0.2, 0.5)
    native = sim.scan()
    st = init_state(cfg, jax.random.PRNGKey(0))
    jscan = lidar.scan(jnp.asarray(sim.pose[:2]), jnp.float32(sim.pose[2]),
                       st.ped_pos, cfg.ped_radius, cfg.room_half_inner,
                       cfg.max_scan_range, cfg.lidar_min_range, cfg.n_scans)
    np.testing.assert_allclose(native, np.asarray(jscan), atol=2e-3)


def test_native_rollout_terminates(sim):
    sim.reset()
    acts = np.tile(np.array([[0.22, 0.0]], np.float32), (300, 1))
    traj = sim.rollout(acts)
    # driving straight from yaw=pi must hit the -x wall and stop (collision)
    assert sim.done in (2, 3)
    assert traj.shape[1] == 3 and len(traj) <= 300
