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


def _run_pair(cfg, actions, ped_vel=None):
    """Drive both engines with identical actions. ``ped_vel``: None = static
    crowd; an (P, 2) array = constant crowd velocity fed to the oracle while
    the JAX env derives the *same* velocity from its behavior table (the
    shared schedule of SURVEY.md §7 hard-part 2)."""
    jenv = CrowdEnv(cfg)
    nenv = NumpyCrowdEnv(cfg)
    jstate, jobs = jenv.reset(jax.random.PRNGKey(0))
    nobs = nenv.reset()
    step = jax.jit(jenv.step)
    vel = np.zeros_like(nenv.ped) if ped_vel is None else np.asarray(ped_vel)
    traj = [(np.asarray(jobs), nobs, 0.0, 0.0, False, False)]
    for a in actions:
        out = step(jstate, jnp.asarray(a, jnp.float32))
        jstate = out.state
        nobs, nrew, ndone = nenv.step(a, ped_vel=vel)
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


def test_parity_moving_crowd_scans():
    """Full-trajectory parity in a MOVING scene: the crossing direction
    table drives the JAX crowd; the oracle gets the identical constant
    velocities (`simulate_crossing_4.py:88-92` pattern). Scans, pose, goal
    features, rewards and termination must track step-by-step while the
    obstacles translate through the field of view
    (`environment_stage_1_nobonus.py:745-860` moving-obstacle semantics)."""
    cfg = make_config("crowd_none", "crossing", n_peds=4,
                      ped_init=((0.30, -0.75), (0.35, -0.40),
                                (-0.20, -0.90), (0.10, -1.10)),
                      max_steps=60)
    table = np.array(cfg.direction_table(), float) * cfg.crowd_speed
    actions = [(0.05, 0.0)] * 25
    traj = _run_pair(cfg, actions, ped_vel=table)
    assert len(traj) > 10
    _check(traj)


def test_parity_moving_crowd_velocity_estimation():
    """Track-velocity cross-check under motion: both engines must estimate
    the moving obstacle's velocity in the top-K block (reference velocity
    estimation `:745-761`, stored as (prev-curr)/dt `:806-810`). The
    stationary-scene suite leaves these terms trivially zero; this pins the
    moving half of the pipeline against the oracle."""
    cfg = make_config("crowd_none", "crossing", n_peds=1,
                      ped_init=((0.30, -0.60),), max_steps=60)
    table = np.array(cfg.direction_table(), float) * cfg.crowd_speed
    # crossing table slot 0 = (1, 1) * 0.1 m/s
    assert np.linalg.norm(table[0]) > 0
    traj = _run_pair(cfg, [(0.03, 0.0)] * 14, ped_vel=table)
    _check(traj)
    k = cfg.k_obstacles
    jo, no = traj[-1][0], traj[-1][1]
    jtail = jo[-4 * k:].reshape(k, 4)
    ntail = no[-4 * k:].reshape(k, 4)
    # the tracked obstacle slot: nearest to the true ped end position
    end = np.array([0.30, -0.60]) + table[0] * cfg.dt * (len(traj) - 1)
    ji = np.linalg.norm(jtail[:, :2] - end, axis=-1).argmin()
    ni = np.linalg.norm(ntail[:, :2] - end, axis=-1).argmin()
    assert np.linalg.norm(jtail[ji, :2] - end) < 0.12
    # velocity features: nonzero in both, matching each other (the sign
    # convention is (prev-curr)/dt so the stored velocity is the negated
    # motion; what matters is both engines agree)
    assert np.linalg.norm(jtail[ji, 2:]) > 0.02, jtail[ji]
    np.testing.assert_allclose(jtail[ji, 2:], ntail[ni, 2:], atol=0.06)
    # magnitude in the ballpark of the true 0.1*sqrt(2) speed
    assert 0.04 < np.linalg.norm(jtail[ji, 2:]) < 0.35


def test_parity_moving_crowd_nonzero_cp():
    """An obstacle crossing the robot's motion line must produce a nonzero
    ego collision probability (TTC term with nonzero closing speed,
    `utils.compute_collision_prob:317-323`) in the JAX engine, and the
    ego-CP fed social-safety accounting must move."""
    cfg = make_config("crowd_none", "towards", n_peds=1,
                      ped_init=((-0.20, -0.75),), max_steps=60)
    jenv = CrowdEnv(cfg)
    state, obs = jenv.reset(jax.random.PRNGKey(0))
    step = jax.jit(jenv.step)
    max_cp = 0.0
    for _ in range(20):
        out = step(state, jnp.asarray((0.10, 0.0), jnp.float32))
        state = out.state
        max_cp = max(max_cp, float(state.ego_cp))
        if bool(out.done):
            break
    assert max_cp > 0.0, "ego CP never fired in a head-on moving scene"


def test_parity_collision_termination():
    """Driving straight at a wall must terminate both at the same step."""
    cfg = make_config("crowd_none", "static", max_steps=200)
    actions = [(0.22, 0.0)] * 200
    traj = _run_pair(cfg, actions)
    assert traj[-1][4] and traj[-1][5]
    # failure (wall), not success
    assert traj[-1][2] < -100 and traj[-1][3] < -100


def _steering_actions(cfg, n):
    """Open-loop goal-steering action sequence from a dead-reckoned rollout
    of the same diff-drive integrator (no env involved): heading-P control
    at full speed — the profile under which the reference's literal
    waypoint box demonstrably fires (see crowd_env._reward docstring)."""
    import math
    x, y, yaw = cfg.start_pose
    gx, gy = cfg.goal
    acts = []
    for _ in range(n):
        hd = (math.atan2(gy - y, gx - x) - yaw + math.pi) % (2 * math.pi) \
            - math.pi
        v, w = 0.22, float(np.clip(2.0 * hd, -2.0, 2.0))
        acts.append((v, w))
        vl = v - w * cfg.wheel_separation / 2.0
        vr = v + w * cfg.wheel_separation / 2.0
        wl = vl / cfg.wheel_radius * cfg.dt
        wr = vr / cfg.wheel_radius * cfg.dt
        ds = cfg.wheel_radius * (wr + wl) / 2.0
        dth = cfg.wheel_radius * (wr - wl) / cfg.wheel_separation
        x += ds * math.cos(yaw + dth / 2.0)
        y += ds * math.sin(yaw + dth / 2.0)
        yaw = (yaw + dth + math.pi) % (2 * math.pi) - math.pi
    return acts


def test_parity_strict_quirks_trajectory():
    """Full-trajectory cross-check of ``strict_quirks=True``: the oracle
    independently re-implements the reference's literal committed behaviors
    (first-track closing speed :793, lowest-K slice of the descending CP
    sort :882-883, literal waypoint arrival box :1110-1127) and both
    engines must agree step-by-step — scans, pose, rewards (incl. the +200
    box-waypoint fires), termination, AND the top-K obstacle block (where
    the lowest-K slice and the first-track speed are observable).

    k_obstacles=2 with 3 pedestrians near the path forces the overflow
    branch; the crossing crowd gives distinct per-track speeds so the
    first-track divisor matters; the goal-steering profile makes the
    literal box fire (the farm dynamic the milestone semantics fix)."""
    cfg = make_config("crowd_none", "crossing", n_peds=3,
                      ped_init=((0.45, 0.10), (-0.10, 0.50), (0.10, -0.60)),
                      crowd_speed=0.04,
                      k_obstacles=2, strict_quirks=True, max_steps=120)
    table = np.array(cfg.direction_table(), float) * cfg.crowd_speed
    actions = _steering_actions(cfg, 40)
    traj = _run_pair(cfg, actions, ped_vel=table)
    assert len(traj) > 10
    _check(traj)
    # top-K block parity at several steps (skip early steps where tracks
    # are still appearing)
    k = cfg.k_obstacles
    for t in (8, 12, len(traj) - 1):
        jo, no = traj[t][0], traj[t][1]
        jtail = jo[-4 * k:].reshape(k, 4)
        ntail = no[-4 * k:].reshape(k, 4)
        np.testing.assert_allclose(jtail, ntail, atol=0.08,
                                   err_msg=f"strict top-K block step {t}")
    # the strict waypoint box must actually fire somewhere in the run
    # (reward spike: +200 bonus on top of the -2/+1 shaping terms)
    rewards = [r[2] for r in traj[1:]]
    assert max(rewards) > 150, rewards


def test_parity_segment_regions_static_scene():
    """Social-region codes (FRF/FLF/FRC/FLC, the exact rectangle geometry of
    `utils.get_obstacle_region:146-215`) agree JAX <-> oracle per confirmed
    segment along a static-scene trajectory. The oracle classifies with
    matplotlib's crossing-number point-in-polygon over the reference's
    literal degree-based polygon construction; the JAX side uses the
    closed-form parallelogram cross products (`geom.social_region`) wired
    through `RiskOutput.segment_regions`."""
    from crowdnav_tpu.envs import crowd_env as ce
    from crowdnav_tpu.ops import risk

    cfg = make_config("crowd_none", "static", n_peds=3,
                      ped_init=((0.3, -0.75), (0.0, -0.3), (-0.5, 0.2)),
                      max_steps=80)
    jenv = CrowdEnv(cfg)
    nenv = NumpyCrowdEnv(cfg)
    jstate, _ = jenv.reset(jax.random.PRNGKey(0))
    nenv.reset()
    step = jax.jit(jenv.step)
    actions = [(0.15, 0.3)] * 12 + [(0.22, -0.5)] * 8
    compared, nonzero = 0, 0
    for a in actions:
        prev_tracks = jstate.tracks
        out = step(jstate, jnp.asarray(a, jnp.float32))
        jstate = out.state
        _, _, ndone = nenv.step(a, ped_vel=np.zeros_like(nenv.ped))
        if bool(out.done) or ndone:
            break
        # recompute this transition's perception from the post-step pose +
        # pre-step tracks (exactly what step() consumed internally)
        st = jstate.replace(tracks=prev_tracks)
        scans, points = ce._sense(cfg, st)
        pout = risk.perceive(cfg, scans, points, prev_tracks, st.pos,
                             st.prev_pos, yaw=st.yaw)
        mask = np.asarray(pout.segments.valid & pout.segments.confirmed)
        jrows = [
            (float(x), float(y), bool(o), int(r))
            for (x, y), o, r, m in zip(
                np.asarray(pout.segments.center_pos),
                np.asarray(pout.segments.is_obstacle),
                np.asarray(pout.segment_regions), mask) if m]
        nrows = [(float(p[0]), float(p[1]), bool(o), int(r))
                 for o, p, r in nenv.last_regions]
        assert len(jrows) == len(nrows), (jrows, nrows)
        # match rows by nearest segment center (scan f32<->f64 tolerance,
        # same as _check's 2.5e-3), then flags + region must agree exactly
        for jx, jy, jo_, jr in jrows:
            d = [abs(jx - nx) + abs(jy - ny) for nx, ny, _, _ in nrows]
            i = int(np.argmin(d))
            assert d[i] < 0.02, (jrows, nrows)
            assert (jo_, jr) == (nrows[i][2], nrows[i][3]), (jrows, nrows)
        compared += len(jrows)
        nonzero += sum(1 for r in jrows if r[3] != 0)
    assert compared > 10          # the scene kept segments in view
    assert nonzero > 0            # and some fell inside the front regions
