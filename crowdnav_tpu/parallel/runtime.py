"""Single-program actor-learner runtime.

Replaces the reference's wall-clock episode loop
(`start_td3_training.py:104-168`: act -> 0.15 s ROS step -> replay.add ->
torch update) with one jitted program: N lockstep envs step together, the
transition batch lands in the HBM replay ring, and the learner takes its
gradient step — all fused by XLA, scanned over rollout chunks so the host
only sees one dispatch per chunk.

Episode accounting (success/failure/reward/steps, ego/social safety —
`utils.record_data` schema `utils.py:56-57`) is accumulated on-device and
drained per chunk.
"""
from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
from flax import struct

from crowdnav_tpu.agents.replay import ReplayBuffer, Transition


@dataclasses.dataclass(frozen=True)
class TrainerConfig:
    n_envs: int = 1024
    updates_per_step: int = 1     # learner steps per env-step (reference: 1)
    rollout_chunk: int = 64       # env-steps per jitted scan
    learn_start: int = 256        # min replay rows before learning
    learning: bool = True         # False = pure evaluation rollouts


@struct.dataclass
class EpisodeStats:
    """On-device accumulators, drained per chunk (CSV schema parity)."""

    ep_reward: jax.Array       # (N,) running episode reward
    ep_steps: jax.Array        # (N,) running episode length
    episodes: jax.Array        # () completed episodes
    successes: jax.Array       # () completed successful episodes
    failures: jax.Array        # ()
    total_reward: jax.Array    # () sum of completed-episode rewards
    total_steps: jax.Array     # () sum of completed-episode lengths
    ego_sum: jax.Array         # () sum of per-episode ego safety scores
    social_sum: jax.Array      # () sum of per-episode social safety scores


def init_stats(n_envs: int) -> EpisodeStats:
    z = lambda: jnp.zeros((), jnp.float32)
    return EpisodeStats(
        ep_reward=jnp.zeros(n_envs, jnp.float32),
        ep_steps=jnp.zeros(n_envs, jnp.int32),
        episodes=jnp.zeros((), jnp.int32),
        successes=jnp.zeros((), jnp.int32),
        failures=jnp.zeros((), jnp.int32),
        total_reward=z(), total_steps=z(), ego_sum=z(), social_sum=z(),
    )


@struct.dataclass
class TrainerState:
    env_states: Any        # batched EnvState (leading axis n_envs)
    obs: jax.Array         # (N, obs_dim) current observations
    agent_state: Any
    replay: Any
    stats: EpisodeStats
    key: jax.Array


class Trainer:
    """Binds (env, agent, buffer) into jitted reset/rollout functions.

    ``env`` must expose pure ``reset(key) -> (state, obs)`` and
    ``step(state, action) -> StepOutput``; ``agent`` exposes
    ``init/act/update`` (the contract all `crowdnav_tpu.agents` satisfy).
    """

    def __init__(self, env, agent, tcfg: TrainerConfig,
                 discrete: bool = False):
        self.env = env
        self.agent = agent
        self.tcfg = tcfg
        self.discrete = discrete
        act_dim = None if discrete else env.action_dim
        self.buffer = ReplayBuffer(agent.cfg.buffer_size, env.obs_dim,
                                   act_dim, block=tcfg.n_envs)

    # ---- init ----
    def init(self, key: jax.Array) -> TrainerState:
        k_env, k_agent, k_loop = jax.random.split(key, 3)
        env_keys = jax.random.split(k_env, self.tcfg.n_envs)
        env_states, obs = jax.vmap(self.env.reset)(env_keys)
        return TrainerState(
            env_states=env_states,
            obs=obs,
            agent_state=self.agent.init(k_agent),
            replay=self.buffer.init(),
            stats=init_stats(self.tcfg.n_envs),
            key=k_loop,
        )

    # ---- one fused env+learn step ----
    def _train_step(self, state: TrainerState, _):
        tcfg = self.tcfg
        key, k_act, k_sample, k_update = jax.random.split(state.key, 4)

        # act (batched policy forward + exploration)
        acted = self.agent.act(state.agent_state, state.obs, k_act,
                               explore=tcfg.learning)
        if isinstance(acted, tuple):      # DDPG returns (action, state)
            actions, agent_state = acted
        else:
            actions, agent_state = acted, state.agent_state

        was_done = state.env_states.done  # (N,) -> next step is a reset step
        if self.discrete:
            out = jax.vmap(self.env.step_discrete)(state.env_states, actions)
        else:
            out = jax.vmap(self.env.step)(state.env_states, actions)

        # replay: drop terminal->reset rows
        tr = Transition(obs=state.obs, action=actions, reward=out.reward,
                        next_obs=out.obs, done=out.done)
        replay = self.buffer.add_batch(state.replay, tr, mask=~was_done)

        # episode stats: completed episodes are rows where out.done is set
        st = state.stats
        ep_reward = st.ep_reward + jnp.where(was_done, 0.0, out.reward)
        ep_steps = st.ep_steps + jnp.where(was_done, 0, 1)
        done_now = out.done
        n_done = jnp.sum(done_now.astype(jnp.int32))
        succ = out.state.episode_success & done_now
        ego, social = self._safety(out.state)
        stats = EpisodeStats(
            ep_reward=jnp.where(done_now, 0.0, ep_reward),
            ep_steps=jnp.where(done_now, 0, ep_steps),
            episodes=st.episodes + n_done,
            successes=st.successes + jnp.sum(succ.astype(jnp.int32)),
            failures=st.failures + n_done - jnp.sum(succ.astype(jnp.int32)),
            total_reward=st.total_reward + jnp.sum(
                jnp.where(done_now, ep_reward, 0.0)),
            total_steps=st.total_steps + jnp.sum(
                jnp.where(done_now, ep_steps, 0)).astype(jnp.float32),
            ego_sum=st.ego_sum + jnp.sum(jnp.where(done_now, ego, 0.0)),
            social_sum=st.social_sum + jnp.sum(
                jnp.where(done_now, social, 0.0)),
        )

        # learn
        metrics = {}
        if tcfg.learning:
            def do_learn(carry):
                agent_state, key = carry

                def one(carry, k):
                    a_state = carry
                    ks, ku = jax.random.split(k)
                    batch = self.buffer.sample(replay, ks,
                                               self.agent.cfg.batch_size)
                    a_state, m = self.agent.update(a_state, batch, ku)
                    return a_state, m

                keys = jax.random.split(key, tcfg.updates_per_step)
                agent_state, ms = jax.lax.scan(one, agent_state, keys)
                return agent_state

            can_learn = replay.size >= tcfg.learn_start
            agent_state = jax.lax.cond(
                can_learn, do_learn, lambda c: c[0],
                (agent_state, k_update))

        new_state = TrainerState(env_states=out.state, obs=out.obs,
                                 agent_state=agent_state, replay=replay,
                                 stats=stats, key=key)
        return new_state, metrics

    def _safety(self, env_states):
        if hasattr(self.env, "safety_scores"):
            return jax.vmap(self.env.safety_scores)(env_states)
        z = jnp.zeros_like(env_states.done, dtype=jnp.float32)
        return z, z

    # ---- public: one jitted chunk of env-steps ----
    def rollout_chunk(self, state: TrainerState) -> TrainerState:
        state, _ = jax.lax.scan(self._train_step, state, None,
                                length=self.tcfg.rollout_chunk)
        return state

    def make_jitted(self):
        """donate_argnums keeps the multi-GB replay ring in place."""
        return jax.jit(self.rollout_chunk, donate_argnums=(0,))

    def drain_stats(self, state: TrainerState):
        """Host-side episode summary; zero the completed-episode counters."""
        s = state.stats
        host = jax.device_get(
            (s.episodes, s.successes, s.failures, s.total_reward,
             s.total_steps, s.ego_sum, s.social_sum))
        episodes = int(host[0])
        summary = {
            "episodes": episodes,
            "successes": int(host[1]),
            "failures": int(host[2]),
            "success_rate": float(host[1]) / max(episodes, 1),
            "mean_reward": float(host[3]) / max(episodes, 1),
            "mean_steps": float(host[4]) / max(episodes, 1),
            "mean_ego_safety": float(host[5]) / max(episodes, 1),
            "mean_social_safety": float(host[6]) / max(episodes, 1),
        }
        fresh = init_stats(self.tcfg.n_envs).replace(
            ep_reward=s.ep_reward, ep_steps=s.ep_steps)
        return summary, state.replace(stats=fresh)
