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


def test_batch_matches_single_env():
    """FastSimBatch with zero jitter + static crowd must reproduce the
    single-env FastSim trajectory for every env in the batch."""
    import numpy as np

    from crowdnav_tpu.envs.config import make_config
    from crowdnav_tpu.native import FastSim, FastSimBatch

    cfg = make_config("crowd_none", "static", n_peds=3,
                      ped_init=((0.3, -0.75), (0.0, -0.3), (-0.5, 0.2)),
                      max_steps=60)
    single = FastSim(cfg)
    batch = FastSimBatch(cfg, n_envs=4)
    rng = np.random.default_rng(0)
    for t in range(30):
        lin = float(rng.uniform(0, 0.22))
        ang = float(rng.uniform(-2, 2))
        scan_s, done_s = single.step(lin, ang,
                                     np.zeros((cfg.n_peds, 2), np.float32))
        scans_b = batch.step(np.tile([[lin, ang]], (4, 1)))
        np.testing.assert_allclose(batch.x, single.pose[0], atol=1e-6)
        np.testing.assert_allclose(batch.yaw, single.pose[2], atol=1e-6)
        np.testing.assert_allclose(scans_b[0], scan_s, atol=1e-6)
        np.testing.assert_allclose(scans_b[1], scans_b[0], atol=0)
        assert (batch.done == done_s).all()
        if done_s:
            break


def test_batch_jittered_resets_and_autoreset():
    import numpy as np

    from crowdnav_tpu.envs.config import make_config
    from crowdnav_tpu.native import FastSimBatch

    cfg = make_config("crowd_dense", "crowd", jitter=1.0, max_steps=5)
    batch = FastSimBatch(cfg, n_envs=16, seed=3)
    # jittered spawns distinct
    assert len(np.unique(batch.x)) > 8
    x0 = batch.x.copy()
    acts = np.tile([[0.22, 0.0]], (16, 1))
    for _ in range(6):
        batch.step(acts)
    assert (batch.done > 0).any() or (batch.step_count <= 5).all()
    # run past max_steps: all envs must have auto-reset at least once and
    # landed on NEW jittered spawns (not the original ones)
    for _ in range(6):
        batch.step(acts)
    assert not np.allclose(np.sort(batch.x), np.sort(x0))


def test_batch_crowd_moves_and_robot_collides():
    import numpy as np

    from crowdnav_tpu.envs.config import make_config
    from crowdnav_tpu.native import FastSimBatch

    cfg = make_config("crowd_dense", "crossing", max_steps=400)
    batch = FastSimBatch(cfg, n_envs=2)
    p0 = batch.peds.copy()
    acts = np.tile([[0.22, 0.0]], (2, 1))
    for _ in range(10):
        batch.step(acts)
    assert not np.allclose(batch.peds, p0)   # crowd moved (direction table)
