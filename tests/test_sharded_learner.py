"""DP-sharded learner semantics (VERDICT r3 missing item 1 / task 1).

The ShardedTrainer learner runs under ``shard_map``: each device samples
batch_size/n_dev rows from its own columns of the block-sharded replay
ring, computes gradients on that shard, and ``pmean``s them before the
optimizer step. These tests prove the decomposition: at the SAME global
batch (and, for TD3, the same injected smoothing noise), the sharded
update equals the single-device update — so weak-scaling the converging
configuration keeps per-chip learner work constant without changing the
optimization trajectory.
"""
import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from crowdnav_tpu.agents import DDPG, DDPGConfig, TD3, TD3Config
from crowdnav_tpu.parallel import make_mesh

OBS_DIM = 24
BATCH = 64


def _batch(key, obs_dim=OBS_DIM, n=BATCH, act_dim=2):
    ks = jax.random.split(key, 5)
    from crowdnav_tpu.agents.replay import Transition
    return Transition(
        obs=jax.random.normal(ks[0], (n, obs_dim)),
        action=jax.random.uniform(ks[1], (n, act_dim)),
        reward=jax.random.normal(ks[2], (n,)),
        next_obs=jax.random.normal(ks[3], (n, obs_dim)),
        done=(jax.random.uniform(ks[4], (n,)) < 0.1).astype(jnp.float32),
    )


def _assert_tree_close(a, b, rtol=2e-5, atol=1e-6):
    for pa, pb in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
        np.testing.assert_allclose(np.asarray(pa), np.asarray(pb),
                                   rtol=rtol, atol=atol)


def test_td3_sharded_update_equals_single_device():
    mesh = make_mesh(8)
    agent = TD3(TD3Config(hidden=32, batch_size=BATCH), OBS_DIM)
    state = agent.init(jax.random.PRNGKey(0))
    key = jax.random.PRNGKey(3)
    # warm up Adam's second-moment state with two identical single-device
    # updates first: Adam's step FROM ZERO is lr*sign(g) — infinitely
    # sensitive to f32 summation-order noise at g~0, so step-1 params can
    # differ by 2*lr on near-zero-gradient coords without any bug. From a
    # warmed state the update is smooth in g and the comparison is tight.
    # (Two warmups also set update_count=2 => do_policy fires in the
    # compared step, covering the actor/target path.)
    warm = jax.jit(lambda s, b, n: agent.update(s, b, key,
                                                smoothing_noise=n))
    for i in (10, 11):
        state, _ = warm(state, _batch(jax.random.PRNGKey(i)),
                        jax.random.normal(jax.random.PRNGKey(100 + i),
                                          (BATCH, 2)))
    batch = _batch(jax.random.PRNGKey(1))
    noise = jax.random.normal(jax.random.PRNGKey(2), (BATCH, 2))

    single, m_single = warm(state, batch, noise)

    def upd(s, b, n):
        return agent.update(s, b, key, axis_name="env", smoothing_noise=n)

    sharded_fn = jax.jit(jax.shard_map(
        upd, mesh=mesh, in_specs=(P(), P("env"), P("env")),
        out_specs=(P(), P())))
    sharded, m_sharded = sharded_fn(state, batch, noise)

    _assert_tree_close((single.actor_params, single.critic_params,
                        single.actor_target, single.critic_target),
                       (sharded.actor_params, sharded.critic_params,
                        sharded.actor_target, sharded.critic_target))
    _assert_tree_close(single.actor_opt, sharded.actor_opt)
    _assert_tree_close(single.critic_opt, sharded.critic_opt)
    np.testing.assert_allclose(float(m_single["critic_loss"]),
                               float(m_sharded["critic_loss"]), rtol=2e-5)


def test_ddpg_sharded_update_equals_single_device():
    # DDPG's update is deterministic given the batch (no smoothing noise),
    # so the equality is direct
    mesh = make_mesh(8)
    agent = DDPG(DDPGConfig(hidden=32, batch_size=BATCH), OBS_DIM, n_envs=8)
    state = agent.init(jax.random.PRNGKey(0))
    warm = jax.jit(lambda s, b: agent.update(s, b))
    for i in (10, 11):   # warm Adam state (see TD3 test comment)
        state, _ = warm(state, _batch(jax.random.PRNGKey(i)))
    batch = _batch(jax.random.PRNGKey(1))

    single, _ = warm(state, batch)
    sharded_fn = jax.jit(jax.shard_map(
        lambda s, b: agent.update(s, b, axis_name="env"),
        mesh=mesh, in_specs=(P(), P("env")), out_specs=(P(), P())))
    sharded, _ = sharded_fn(state, batch)

    _assert_tree_close((single.actor_params, single.critic_params),
                       (sharded.actor_params, sharded.critic_params))


def test_sharded_trainer_learner_trains_on_mesh():
    """Full ShardedTrainer chunk on the 8-device mesh: the shard_map
    learner branch compiles, runs, and actually moves the (replicated)
    agent parameters."""
    from crowdnav_tpu.envs import CrowdEnv, make_config
    from crowdnav_tpu.parallel import ShardedTrainer, TrainerConfig

    mesh = make_mesh(8)
    cfg = make_config("crowd_dense", max_steps=16, jitter=1.0)
    env = CrowdEnv(cfg)
    agent = TD3(TD3Config(hidden=32, batch_size=16, buffer_size=1024),
                env.obs_dim)
    tcfg = TrainerConfig(n_envs=16, rollout_chunk=4, learn_start=16,
                         updates_per_step=2, reset_bank=8)
    trainer = ShardedTrainer(env, agent, tcfg, mesh)
    state = trainer.init(jax.random.PRNGKey(0))
    p0 = jax.tree.map(np.asarray, state.agent_state.actor_params)
    run = trainer.make_jitted()
    state = run(state)
    state = run(state)
    jax.block_until_ready(state.obs)
    p1 = jax.tree.map(np.asarray, state.agent_state.actor_params)
    deltas = [float(np.abs(a - b).max())
              for a, b in zip(jax.tree.leaves(p0), jax.tree.leaves(p1))]
    assert max(deltas) > 0.0, "learner branch never fired on the mesh"
    # agent state must come back replicated (every device applied the
    # identical pmean'd update)
    leaf = jax.tree.leaves(state.agent_state.actor_params)[0]
    assert leaf.sharding.is_fully_replicated
