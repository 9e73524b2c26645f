"""Reset randomization, waypoint-farm regression, phantom-obstacle fix.

The reference gets episode diversity from Gazebo physics noise; the batched
engine injects it explicitly via seeded reset jitter (VERDICT round-1 items
3/1). These tests pin:

- jittered resets give distinct episodes across a batch (no lockstep);
- zero jitter reproduces the deterministic template bit-for-bit;
- the waypoint +200 is not farmable (the round-1 reward hack: the box
  test passed at 0.267 m on diagonal approach while the refresh tied —
  `environment_stage_1_nobonus.py:1285-1301` vs `:259-265`);
- a scripted goal-seeker actually reaches the goal in an empty room (the
  n_peds=0 placeholder slot used to be a phantom obstacle at the origin);
- the runtime reset bank de-duplicates auto-resets.
"""
import jax
import jax.numpy as jnp
import numpy as np

from crowdnav_tpu.baselines import goal_seeker
from crowdnav_tpu.envs import CrowdEnv, make_config
from crowdnav_tpu.parallel import Trainer, TrainerConfig


class GoalSeekerAgent:
    """Minimal agent-contract wrapper around the scripted baseline."""

    class _Cfg:
        buffer_size = 4096
        batch_size = 8

    cfg = _Cfg()

    def init(self, key):
        return jnp.zeros(())

    def act(self, state, obs, key=None, explore=True):
        return goal_seeker(obs)


def test_jittered_resets_are_distinct():
    env = CrowdEnv(make_config("crowd_dense", "crossing", jitter=1.0))
    keys = jax.random.split(jax.random.PRNGKey(0), 16)
    states, obs = jax.vmap(env.reset)(keys)
    # all 16 spawns distinct (start pose, ped spawns) and obs distinct
    assert len(np.unique(np.asarray(states.pos), axis=0)) == 16
    assert len(np.unique(np.asarray(obs), axis=0)) == 16
    # direction tables are permutations of the same multiset
    dirs = np.asarray(states.ped_dirs)
    assert not np.all(dirs == dirs[0])   # at least one permuted differently
    base = np.sort(dirs[0].view([('x', 'f4'), ('y', 'f4')]).ravel())
    for d in dirs:
        np.testing.assert_array_equal(
            np.sort(d.view([('x', 'f4'), ('y', 'f4')]).ravel()), base)


def test_zero_jitter_is_deterministic_template():
    env = CrowdEnv(make_config("crowd_dense"))
    s1, o1 = jax.jit(env.reset)(jax.random.PRNGKey(1))
    s2, o2 = jax.jit(env.reset)(jax.random.PRNGKey(2))
    np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))
    np.testing.assert_array_equal(np.asarray(s1.pos), np.asarray(s2.pos))


def test_goal_seeker_succeeds_in_empty_room():
    env = CrowdEnv(make_config("crowd_none", max_steps=200))
    step = jax.jit(env.step)
    state, obs = env.reset(jax.random.PRNGKey(0))
    total = 0.0
    for _ in range(200):
        out = step(state, goal_seeker(obs))
        state, obs = out.state, out.obs
        total += float(out.reward)
        if bool(out.done):
            break
    assert bool(state.episode_success), "goal never reached in empty room"
    # milestone semantics: one +200 per 0.3 m of NET progress toward the
    # goal — ~7 breadcrumbs over the 2.47 m start->goal distance, plus the
    # terminal +200. Bounded by the trail length, not farmable per-step
    # (the round-1 hack collected 4 bonuses per 5 steps indefinitely).
    assert 4 <= int(state.wp_bonus_count) <= 10
    expected_max = 200 * (int(state.wp_bonus_count) + 1) + 200
    assert 0 < total <= expected_max


def test_waypoint_milestones_not_farmable_by_oscillation():
    """Driving back and forth re-covers old ground: the milestone bonus
    pays only on NET best-distance improvement, so an oscillating policy
    collects nothing extra (the round-1 reward hack)."""
    env = CrowdEnv(make_config("crowd_none", max_steps=400))
    step = jax.jit(env.step)
    state, obs = env.reset(jax.random.PRNGKey(0))
    # drive toward the goal for 12 steps (collect up to 1 milestone)...
    for _ in range(12):
        out = step(state, goal_seeker(obs))
        state, obs = out.state, out.obs
    collected = int(state.wp_bonus_count)
    # ...then oscillate forward/backward-ish: alternate heading 180 deg by
    # spinning half-turns between short advances, for many steps
    for t in range(120):
        a = (0.22, 0.0) if (t // 6) % 2 == 0 else (0.0, 2.0)
        out = step(state, jnp.asarray(a, jnp.float32))
        state, obs = out.state, out.obs
        if bool(out.done):
            break
    # the oscillation may creep net-forward slightly; allow at most the
    # milestones its NET progress actually covers (far below 1-per-cycle)
    assert int(state.wp_bonus_count) - collected <= 3


def test_reward_component_counters():
    env = CrowdEnv(make_config("crowd_none", max_steps=50))
    step = jax.jit(env.step)
    state, obs = env.reset(jax.random.PRNGKey(0))
    for _ in range(10):
        out = step(state, goal_seeker(obs))
        state, obs = out.state, out.obs
    assert int(state.dtg_reward_count) > 0
    assert int(state.htg_reward_count) > 0


def test_reset_bank_dedegenerates_autoresets():
    env = CrowdEnv(make_config("crowd_dense", "crossing", jitter=1.0,
                               max_steps=8))
    tcfg = TrainerConfig(n_envs=8, rollout_chunk=20, learning=False,
                         reset_bank=32)
    trainer = Trainer(env, GoalSeekerAgent(), tcfg)
    state = trainer.init(jax.random.PRNGKey(0))
    state = trainer.make_jitted()(state)
    # after >=1 auto-reset per env (max_steps=8, chunk=20), the batch still
    # holds distinct spawn positions (the template reset would collapse all
    # reset envs onto one point)
    pos = np.asarray(jax.device_get(state.env_states.pos))
    assert len(np.unique(pos, axis=0)) >= 6


def test_persist_tracks_across_reset_flag():
    """`persist_tracks_across_reset=True` carries the tracker + waypoint
    through an auto-reset (the reference's reset-statefulness quirk,
    `environment_stage_1_nobonus.py:1227-1263`); the default reset-cleans."""
    import dataclasses

    base = make_config("crowd_none", "static", n_peds=1,
                       ped_init=((0.30, -0.75),), max_steps=3)
    for persist in (False, True):
        cfg = dataclasses.replace(base, persist_tracks_across_reset=persist)
        env = CrowdEnv(cfg)
        step = jax.jit(env.step)
        state, obs = env.reset(jax.random.PRNGKey(0))
        # run past max_steps to force done, then one more step = auto-reset
        done_state = None
        for _ in range(4):
            out = step(state, jnp.asarray((0.05, 0.0), jnp.float32))
            state = out.state
            if bool(out.done):
                done_state = state
        assert done_state is not None and bool(done_state.done)
        tmpl_state, _ = env._template
        # terminal waypoint/tracker differ from the template's (the robot
        # moved), so carry-vs-clean is observable on the post-reset state
        assert not np.allclose(np.asarray(done_state.waypoint),
                               np.asarray(tmpl_state.waypoint))
        out = step(done_state, jnp.asarray((0.0, 0.0), jnp.float32))
        post = out.state
        assert int(post.step) <= 1  # fresh episode
        if persist:
            np.testing.assert_allclose(np.asarray(post.waypoint),
                                       np.asarray(done_state.waypoint))
            np.testing.assert_allclose(np.asarray(post.tracks.pos),
                                       np.asarray(done_state.tracks.pos))
        else:
            np.testing.assert_allclose(np.asarray(post.waypoint),
                                       np.asarray(tmpl_state.waypoint))


def test_per_step_stochasticity_knobs():
    """Per-step noise knobs (VERDICT r3 missing item 2): with actuation/
    dt/lidar noise on, two envs with different keys diverge DURING an
    episode even from identical spawns and actions; with all knobs zero
    the trajectory is bit-deterministic given the key."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from crowdnav_tpu.envs import CrowdEnv, make_config

    def roll(cfg, seed, n=8):
        env = CrowdEnv(cfg)
        state, obs = env.reset(jax.random.PRNGKey(seed))
        # fix the noise stream key so only the noise knobs differ
        state = state.replace(key=jax.random.PRNGKey(100 + seed))
        action = jnp.array([0.15, 0.3])
        poses, scans0 = [], []
        for _ in range(n):
            out = env.step(state, action)
            state = out.state
            poses.append(np.asarray(state.pos))
            scans0.append(float(out.obs[0]))
        return np.array(poses), np.array(scans0)

    noisy = make_config("crowd_none", "static", actuation_noise=0.05,
                        dt_jitter=0.2, lidar_noise=0.01)
    p1, s1 = roll(noisy, 0)
    p2, s2 = roll(noisy, 1)     # different noise stream
    assert np.abs(p1 - p2).max() > 1e-4, "noise knobs had no effect"

    clean = make_config("crowd_none", "static")
    q1, t1 = roll(clean, 0)
    q2, t2 = roll(clean, 1)     # keys differ but nothing consumes them
    np.testing.assert_array_equal(q1, q2)
    np.testing.assert_array_equal(t1, t2)

    # noisy lidar perturbs hit beams but never free space beyond max range
    lid = make_config("crowd_none", "static", lidar_noise=0.02)
    env = CrowdEnv(lid)
    state, obs = env.reset(jax.random.PRNGKey(0))
    out = env.step(state, jnp.array([0.1, 0.0]))
    scans = np.asarray(out.obs[: env.cfg.n_scans])
    assert scans.max() <= lid.max_scan_range + 1e-6
