"""Fixed-seed trajectory parity: JAX engine vs the sequential NumPy oracle.

Both implementations are driven with identical actions and crowd velocities;
states, rewards and termination must agree step by step (SURVEY.md §7.10:
behavior-equivalence is the test target, not line-equivalence).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from crowdnav_tpu.envs import CrowdEnv, make_config
from crowdnav_tpu.parity import NumpyCrowdEnv


def _run_pair(cfg, actions):
    jenv = CrowdEnv(cfg)
    nenv = NumpyCrowdEnv(cfg)
    jstate, jobs = jenv.reset(jax.random.PRNGKey(0))
    nobs = nenv.reset()
    step = jax.jit(jenv.step)
    traj = [(np.asarray(jobs), nobs, 0.0, 0.0, False, False)]
    for a in actions:
        out = step(jstate, jnp.asarray(a, jnp.float32))
        jstate = out.state
        nobs, nrew, ndone = nenv.step(a, ped_vel=np.zeros_like(nenv.ped))
        traj.append((np.asarray(out.obs), nobs, float(out.reward), nrew,
                     bool(out.done), ndone))
        if bool(out.done) or ndone:
            break
    return traj


def _check(traj, scan_atol=2.5e-3, pose_atol=2e-3):
    n = 359
    for t, (jo, no, jr, nr, jd, nd) in enumerate(traj):
        np.testing.assert_allclose(jo[:n], no[:n], atol=scan_atol,
                                   err_msg=f"scans differ at step {t}")
        # htg/dtg rounded to 2dp in both: allow one rounding ulp
        np.testing.assert_allclose(jo[n:n + 2], no[n:n + 2], atol=0.011,
                                   err_msg=f"goal feats step {t}")
        np.testing.assert_allclose(jo[n + 2:n + 4], no[n + 2:n + 4],
                                   atol=pose_atol,
                                   err_msg=f"pose differs at step {t}")
        dyaw = abs(float(jo[n + 4]) - float(no[n + 4]))
        dyaw = min(dyaw, 2 * np.pi - dyaw)  # +pi == -pi
        assert dyaw < pose_atol + 1e-3, f"yaw differs at step {t}: {dyaw}"
        assert jd == nd, f"done mismatch at step {t}"
        if t > 0:
            assert abs(jr - nr) < 1e-3, \
                f"reward mismatch at step {t}: jax={jr} np={nr}"


def test_parity_empty_room_straight():
    cfg = make_config("crowd_none", "static", max_steps=60)
    actions = [(0.22, 0.0)] * 40
    _check(_run_pair(cfg, actions))


def test_parity_empty_room_arcs():
    cfg = make_config("crowd_none", "static", max_steps=80)
    rng = np.random.default_rng(3)
    actions = [(float(rng.uniform(0, 0.22)), float(rng.uniform(-2, 2)))
               for _ in range(60)]
    _check(_run_pair(cfg, actions))


def test_parity_static_obstacle_course():
    cfg = make_config("crowd_none", "static", n_peds=3,
                      ped_init=((0.3, -0.75), (0.0, -0.3), (-0.5, 0.2)),
                      max_steps=80)
    actions = [(0.15, 0.3)] * 30 + [(0.22, -0.5)] * 20
    traj = _run_pair(cfg, actions)
    _check(traj)


def test_parity_topk_positions_static_scene():
    """With an obstacle in view, both pipelines must report it in the top-K
    block at matching positions."""
    cfg = make_config("crowd_none", "static", n_peds=1,
                      ped_init=((0.30, -0.75),), max_steps=40)
    traj = _run_pair(cfg, [(0.05, 0.0)] * 6)
    k = cfg.k_obstacles
    jo, no = traj[-1][0], traj[-1][1]
    jtail = jo[-4 * k:].reshape(k, 4)
    ntail = no[-4 * k:].reshape(k, 4)
    target = np.array([0.30, -0.75])
    jd = np.linalg.norm(jtail[:, :2] - target, axis=-1).min()
    nd = np.linalg.norm(ntail[:, :2] - target, axis=-1).min()
    assert jd < 0.1 and nd < 0.1, (jtail[:2], ntail[:2])


def test_parity_collision_termination():
    """Driving straight at a wall must terminate both at the same step."""
    cfg = make_config("crowd_none", "static", max_steps=200)
    actions = [(0.22, 0.0)] * 200
    traj = _run_pair(cfg, actions)
    assert traj[-1][4] and traj[-1][5]
    # failure (wall), not success
    assert traj[-1][2] < -100 and traj[-1][3] < -100
