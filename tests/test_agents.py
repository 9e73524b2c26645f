"""Agent unit tests: shapes, action bounds, learning signal, replay ring."""
import jax
import jax.numpy as jnp
import numpy as np

from crowdnav_tpu.agents import (DDPG, DDPGConfig, DQN, DQNConfig, QLearning,
                                 ReplayBuffer, SAC, SACConfig, Sarsa,
                                 TabularConfig, TD3, TD3Config, Transition,
                                 discretize_state)

OBS = 12


def _fake_batch(key, n=32, obs_dim=OBS, act_dim=2):
    ks = jax.random.split(key, 5)
    return Transition(
        obs=jax.random.normal(ks[0], (n, obs_dim)),
        action=jax.random.uniform(ks[1], (n, act_dim)),
        reward=jax.random.normal(ks[2], (n,)),
        next_obs=jax.random.normal(ks[3], (n, obs_dim)),
        done=(jax.random.uniform(ks[4], (n,)) < 0.1).astype(jnp.float32),
    )


def test_replay_ring_and_mask():
    buf = ReplayBuffer(capacity=8, obs_dim=3, act_dim=2, block=4)
    st = buf.init()
    tr = Transition(obs=jnp.ones((4, 3)), action=jnp.ones((4, 2)),
                    reward=jnp.arange(4.0), next_obs=jnp.ones((4, 3)),
                    done=jnp.zeros(4, bool))
    st = buf.add_batch(st, tr)
    assert int(st.size) == 4 and int(st.head) == 1
    # masked add: rows 0 and 2 dropped -> kept rows first, tail duplicates
    st = buf.add_batch(st, tr, mask=jnp.array([False, True, False, True]))
    assert int(st.size) == 8 and int(st.head) == 0
    np.testing.assert_allclose(buf.read_block(st, 1).reward,
                               [1.0, 3.0, 1.0, 3.0])
    # wraps around, overwriting block 0
    st = buf.add_batch(st, tr)
    assert int(st.head) == 1 and int(st.size) == 8
    # an all-masked batch is skipped entirely
    st2 = buf.add_batch(st, tr, mask=jnp.zeros(4, bool))
    assert int(st2.head) == int(st.head)
    batch = buf.sample(st, jax.random.PRNGKey(0), 16)
    assert batch.obs.shape == (16, 3)


def test_replay_packed_record_bit_exact():
    """bf16 ring: the 32-bit fields are BITCAST into storage lanes — the
    round trip must be bit-exact (not merely close), for continuous and
    discrete action layouts; obs degrade only by the bf16 convert."""
    for act_dim in (2, None):
        buf = ReplayBuffer(capacity=8, obs_dim=5, act_dim=act_dim, block=4,
                           obs_dtype=jnp.bfloat16)
        ks = jax.random.split(jax.random.PRNGKey(0), 5)
        action = (jax.random.normal(ks[1], (4, 2)) if act_dim
                  else jax.random.randint(ks[1], (4,), 0, 3))
        tr = Transition(
            obs=jax.random.normal(ks[0], (4, 5)),
            action=action,
            reward=jax.random.normal(ks[2], (4,)) * 200.0,
            next_obs=jax.random.normal(ks[3], (4, 5)),
            done=(jax.random.uniform(ks[4], (4,)) < 0.5).astype(
                jnp.float32))
        st = buf.add_batch(buf.init(), tr)
        out = buf.read_block(st, 0)
        np.testing.assert_array_equal(np.asarray(out.action),
                                      np.asarray(action))
        np.testing.assert_array_equal(np.asarray(out.reward),
                                      np.asarray(tr.reward))
        np.testing.assert_array_equal(np.asarray(out.done),
                                      np.asarray(tr.done))
        assert out.obs.dtype == jnp.bfloat16
        np.testing.assert_allclose(np.asarray(out.obs, np.float32),
                                   np.asarray(tr.obs), rtol=8e-3, atol=1e-2)


def test_td3_update_moves_critic_toward_target():
    agent = TD3(TD3Config(hidden=32, batch_size=32), OBS)
    st = agent.init(jax.random.PRNGKey(0))
    batch = _fake_batch(jax.random.PRNGKey(1))
    st2, m = jax.jit(agent.update)(st, batch, jax.random.PRNGKey(2))
    assert np.isfinite(float(m["critic_loss"]))
    # params changed
    diff = jax.tree.map(lambda a, b: float(jnp.max(jnp.abs(a - b))),
                        st.critic_params, st2.critic_params)
    assert max(jax.tree.leaves(diff)) > 0
    # delayed policy: update 0 applies (count%2==0), update 1 does not
    a_diff0 = max(jax.tree.leaves(jax.tree.map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))),
        st.actor_params, st2.actor_params)))
    assert a_diff0 > 0
    st3, _ = jax.jit(agent.update)(st2, batch, jax.random.PRNGKey(3))
    a_diff1 = max(jax.tree.leaves(jax.tree.map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))),
        st2.actor_params, st3.actor_params)))
    # Adam still applies zero-grads -> tiny drift; must be far smaller
    assert a_diff1 < a_diff0


def test_td3_action_bounds():
    agent = TD3(TD3Config(hidden=32), OBS)
    st = agent.init(jax.random.PRNGKey(0))
    obs = jax.random.normal(jax.random.PRNGKey(1), (64, OBS))
    a = agent.act(st, obs, jax.random.PRNGKey(2), explore=True)
    assert a.shape == (64, 2)
    assert float(a[:, 0].min()) >= 0.0 and float(a[:, 0].max()) <= 0.22
    assert float(jnp.abs(a[:, 1]).max()) <= 2.0
    a_greedy = agent.act(st, obs, explore=False)
    assert float(a_greedy[:, 0].min()) >= 0.0


def test_ddpg_update_and_ou_noise():
    agent = DDPG(DDPGConfig(hidden=32, batch_size=32), OBS, n_envs=4)
    st = agent.init(jax.random.PRNGKey(0))
    obs = jnp.zeros((4, OBS))
    a, st_after = agent.act(st, obs, jax.random.PRNGKey(1))
    assert a.shape == (4, 2)
    # OU state advanced
    assert float(jnp.abs(st_after.ou_state).max()) > 0
    st2, m = jax.jit(agent.update)(st, _fake_batch(jax.random.PRNGKey(2)))
    assert np.isfinite(float(m["critic_loss"]))


def test_sac_update():
    agent = SAC(SACConfig(hidden=32, value_hidden=32, batch_size=32), OBS)
    st = agent.init(jax.random.PRNGKey(0))
    a = agent.act(st, jnp.zeros((4, OBS)), jax.random.PRNGKey(1))
    assert a.shape == (4, 2)
    assert float(a[:, 0].min()) >= 0.0 and float(a[:, 0].max()) <= 0.22
    st2, m = jax.jit(agent.update)(st, _fake_batch(jax.random.PRNGKey(2)),
                                   jax.random.PRNGKey(3))
    for v in m.values():
        assert np.isfinite(float(v))


def test_dqn_update_and_epsilon():
    agent = DQN(DQNConfig(hidden=(32, 32), batch_size=32), OBS)
    st = agent.init(jax.random.PRNGKey(0))
    obs = jax.random.normal(jax.random.PRNGKey(1), (16, OBS))
    acts = agent.act(st, obs, jax.random.PRNGKey(2))
    assert acts.shape == (16,) and acts.dtype == jnp.int32
    assert int(acts.max()) < 3
    batch = _fake_batch(jax.random.PRNGKey(3))
    batch = batch._replace(action=jnp.zeros(32, jnp.int32))
    st2, m = jax.jit(agent.update)(st, batch)
    assert np.isfinite(float(m["loss"]))
    st3 = agent.decay_epsilon(st2)
    assert float(st3.epsilon) < float(st2.epsilon)


def test_tabular_qlearning_and_sarsa():
    cfg = TabularConfig()
    ql = QLearning(cfg)
    st = ql.init()
    s = discretize_state(jnp.float32(1.0), jnp.float32(0.5))
    s2 = discretize_state(jnp.float32(0.9), jnp.float32(0.4))
    a = ql.act(st, s, jax.random.PRNGKey(0))
    assert int(a) in (0, 1, 2)
    # first visit stores raw reward (qlearn.py:40-42)
    st = ql.update(st, s, jnp.int32(1), jnp.float32(5.0), s2)
    assert float(st.q[s, 1]) == 5.0
    # second visit blends toward the bootstrapped value:
    # q = 5 + alpha*(3 + gamma*0 - 5) = 5 - 0.2*2 = 4.6
    st = ql.update(st, s, jnp.int32(1), jnp.float32(3.0), s2)
    np.testing.assert_allclose(float(st.q[s, 1]), 4.6, atol=1e-6)

    sa = Sarsa(cfg)
    st2 = sa.init()
    st2 = sa.update(st2, s, jnp.int32(0), jnp.float32(1.0), s2, jnp.int32(2))
    assert float(st2.q[s, 0]) == 1.0


def test_discretize_matches_numpy_digitize():
    dist_bins = np.round(np.arange(0, 3, 0.1), 2)
    rad_bins = np.round(np.arange(-3.14, 3.14, 0.19625), 2)
    for d, h in [(0.0, -3.14), (1.23, 0.5), (2.95, 3.1), (3.5, -0.01)]:
        di = int(np.digitize([d], dist_bins)[0])
        hi = int(np.digitize([h], rad_bins)[0])
        expected = di * (len(rad_bins) + 1) + hi
        got = int(discretize_state(jnp.float32(d), jnp.float32(h)))
        assert got == expected, (d, h, got, expected)


def test_qtable_save_load_roundtrip(tmp_path):
    """Q-table persistence (reference pickles Q-dicts, utils.py:20-35)."""
    import numpy as np
    from crowdnav_tpu.agents import QLearning, TabularConfig
    from crowdnav_tpu.agents.tabular import load_table, save_table

    algo = QLearning(TabularConfig())
    tab = algo.init()
    tab = tab.replace(q=tab.q.at[5, 1].set(3.25),
                      visited=tab.visited.at[5, 1].set(True))
    save_table(str(tmp_path / "qt"), tab)
    back = load_table(str(tmp_path / "qt"))
    assert float(back.q[5, 1]) == 3.25
    assert bool(back.visited[5, 1])
    np.testing.assert_allclose(np.asarray(back.q), np.asarray(tab.q))


def test_td3_bfloat16_compute_dtype():
    """compute_dtype='bfloat16' must keep params/opt-state float32, emit
    float32 actions/Q values, and run an update without NaNs."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from crowdnav_tpu.agents import TD3, TD3Config
    from crowdnav_tpu.agents.replay import Transition

    agent = TD3(TD3Config(hidden=32, batch_size=8,
                          compute_dtype="bfloat16"), obs_dim=12)
    state = jax.jit(agent.init)(jax.random.PRNGKey(0))
    assert all(p.dtype == jnp.float32
               for p in jax.tree.leaves(state.actor_params))
    obs = jnp.ones((8, 12))
    act = agent.act(state, obs, jax.random.PRNGKey(1))
    assert act.dtype == jnp.float32
    batch = Transition(obs=obs, action=act, reward=jnp.ones(8),
                       next_obs=obs, done=jnp.zeros(8))
    new_state, metrics = jax.jit(agent.update)(state, batch,
                                               jax.random.PRNGKey(2))
    assert np.isfinite(float(metrics["critic_loss"]))
    assert all(p.dtype == jnp.float32
               for p in jax.tree.leaves(new_state.critic_params))
