"""Trainer integration tests: fused rollout+learn chunks, stats draining,
and the sharded (8-virtual-device) path."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from crowdnav_tpu.agents import TD3, TD3Config
from crowdnav_tpu.envs import CrowdEnv, SimpleEnv, make_config
from crowdnav_tpu.parallel import (ShardedTrainer, Trainer, TrainerConfig,
                                   make_mesh)


def _small_agent(obs_dim):
    return TD3(TD3Config(hidden=32, batch_size=16, buffer_size=4096,
                         explore_sigma=0.5), obs_dim)


def test_trainer_simple_env_learns_chunk():
    cfg = make_config("crowd_sparse", max_steps=40)
    env = SimpleEnv(cfg)
    tcfg = TrainerConfig(n_envs=8, rollout_chunk=16, learn_start=32)
    trainer = Trainer(env, _small_agent(env.obs_dim), tcfg)
    state = trainer.init(jax.random.PRNGKey(0))
    run = trainer.make_jitted()
    state = run(state)
    assert int(state.replay.size) == 8 * 16  # all transitions kept
    assert int(state.agent_state.update_count) > 0  # learning kicked in
    # second chunk continues
    state = run(state)
    assert int(state.replay.size) == 8 * 32


def test_trainer_crowd_env_and_stats():
    cfg = make_config("crowd_dense", max_steps=10)  # force quick episodes
    env = CrowdEnv(cfg)
    tcfg = TrainerConfig(n_envs=4, rollout_chunk=25, learn_start=1000000,
                         learning=False)
    trainer = Trainer(env, _small_agent(env.obs_dim), tcfg)
    state = trainer.init(jax.random.PRNGKey(0))
    run = trainer.make_jitted()
    state = run(state)
    summary, state = trainer.drain_stats(state)
    # 25 steps with 10-step episodes: every env completed >= 2 episodes
    assert summary["episodes"] >= 8
    assert summary["episodes"] == summary["successes"] + summary["failures"]
    assert summary["mean_steps"] <= 10.5
    # counters were drained
    assert int(state.stats.episodes) == 0


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 virtual devices")
def test_sharded_trainer_8dev():
    cfg = make_config("crowd_sparse", max_steps=20)
    env = SimpleEnv(cfg)
    tcfg = TrainerConfig(n_envs=16, rollout_chunk=4, learn_start=32)
    mesh = make_mesh(8)
    trainer = ShardedTrainer(env, _small_agent(env.obs_dim), tcfg, mesh)
    state = trainer.init(jax.random.PRNGKey(0))
    # env states sharded over the mesh
    shardings = {str(s.sharding.spec) for s in
                 jax.tree.leaves(state.env_states)
                 if hasattr(s, "sharding")}
    assert any("env" in s for s in shardings)
    run = trainer.make_jitted()
    state = run(state)
    state = run(state)
    assert int(state.replay.size) == 16 * 8
    assert np.isfinite(float(jnp.sum(state.obs)))


def test_greedy_env_mask_matches_act_spectrum():
    """The stratified-metric cohort mask must mirror the per-env epsilon
    formula in TD3.act's spectrum branch (same hi/lo/log-spacing)."""
    from crowdnav_tpu.parallel.runtime import greedy_env_mask

    n = 64
    agent = TD3(TD3Config(explore_uniform_eps=1.0,
                          explore_uniform_eps_min=0.05,
                          explore_eps_spectrum=True), obs_dim=8)
    mask = np.asarray(greedy_env_mask(agent, n))
    hi, lo = 1.0, 0.05
    eps = hi * (lo / hi) ** (np.arange(n) / (n - 1))
    np.testing.assert_array_equal(mask, eps <= 0.1)
    assert 0 < mask.sum() < n            # a real split
    # no spectrum -> every env is in the cohort (metric == overall)
    agent2 = TD3(TD3Config(), obs_dim=8)
    assert np.asarray(greedy_env_mask(agent2, n)).all()


def test_replay_obs_dtype_bfloat16():
    """bf16 replay-obs storage: ring dtype, write-cast, sampled batch dtype,
    and a full trainer chunk with learning (losses finite)."""
    import jax.numpy as jnp

    cfg = make_config("crowd_none", max_steps=8)
    env = CrowdEnv(cfg)
    agent = TD3(TD3Config(hidden=16, batch_size=4, buffer_size=64),
                env.obs_dim)
    trainer = Trainer(env, agent,
                      TrainerConfig(n_envs=4, rollout_chunk=4,
                                    learn_start=4,
                                    replay_obs_dtype="bfloat16"))
    state = trainer.init(jax.random.PRNGKey(0))
    assert state.replay.data.dtype == jnp.bfloat16
    # bitcast lanes, not converted values: sampled rewards come back f32
    batch0 = trainer.buffer.sample(state.replay, jax.random.PRNGKey(9), 4)
    assert batch0.reward.dtype == jnp.float32
    state = trainer.make_jitted()(state)
    state = trainer.make_jitted()(state)      # second chunk hits the learner
    batch = trainer.buffer.sample(state.replay, jax.random.PRNGKey(1), 4)
    assert batch.obs.dtype == jnp.bfloat16
    summary, _ = trainer.drain_stats(state)
    assert np.isfinite(summary["critic_loss"])
    # stored rows match the env obs to bf16 resolution
    row = np.asarray(batch.obs, np.float32)
    assert np.all(np.abs(row) <= 10.0)
