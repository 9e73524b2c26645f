"""DQN over the 3-action discrete policy.

Re-design of `turtlebot3_rl_sim/src/deepq.py` (DeepQ :19-266) + its driver
(`start_dqn_training.py`): [300, 300] relu MLP, RMSprop, MSE to the target
``r + gamma * max Q_target(s')`` (terminal -> r), hard target-network copy
every ``target_update_period`` steps (10000 — `start_dqn_training.py:67`),
epsilon-greedy with multiplicative decay (`:66,125-127`).

The Keras original regresses full Q rows with only the taken action's entry
replaced (`deepq.py:240-266`); the equivalent gradient touches only the
taken action — implemented directly with a gather.
"""
from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import optax
from flax import struct

from crowdnav_tpu.models.networks import QNetwork


@dataclasses.dataclass(frozen=True)
class DQNConfig:
    hidden: tuple = (300, 300)        # start_dqn_training.py:57
    lr: float = 0.00025               # configs/dqn.yaml alpha
    gamma: float = 0.99
    batch_size: int = 64
    buffer_size: int = 1_000_000
    n_actions: int = 3
    target_update_period: int = 10_000
    epsilon_start: float = 1.0
    epsilon_min: float = 0.05
    epsilon_decay: float = 0.995      # per-episode multiplicative (:125-127)
    learn_start: int = 64


@struct.dataclass
class DQNState:
    params: Any
    target_params: Any
    opt: Any
    step: jax.Array
    epsilon: jax.Array


class DQN:
    def __init__(self, cfg: DQNConfig, obs_dim: int):
        self.cfg = cfg
        self.obs_dim = obs_dim
        self.net = QNetwork(cfg.n_actions, cfg.hidden)
        self.tx = optax.rmsprop(cfg.lr, decay=0.9, eps=1e-6)  # deepq.py:124

    def init(self, key: jax.Array) -> DQNState:
        params = self.net.init(key, jnp.zeros((1, self.obs_dim)))
        return DQNState(
            params=params,
            target_params=jax.tree.map(jnp.copy, params),
            opt=self.tx.init(params),
            step=jnp.zeros((), jnp.int32),
            epsilon=jnp.asarray(self.cfg.epsilon_start, jnp.float32),
        )

    def act(self, state: DQNState, obs, key, explore: bool = True):
        """Epsilon-greedy action indices (`deepq.py:178-184`)."""
        q = self.net.apply(state.params, obs)
        greedy = jnp.argmax(q, axis=-1).astype(jnp.int32)
        if not explore:
            return greedy
        k1, k2 = jax.random.split(key)
        rand = jax.random.randint(k1, greedy.shape, 0, self.cfg.n_actions)
        take_rand = jax.random.uniform(k2, greedy.shape) < state.epsilon
        return jnp.where(take_rand, rand, greedy).astype(jnp.int32)

    def decay_epsilon(self, state: DQNState) -> DQNState:
        eps = jnp.maximum(state.epsilon * self.cfg.epsilon_decay,
                          self.cfg.epsilon_min)
        return state.replace(epsilon=eps)

    def update(self, state: DQNState, batch, key=None,
               axis_name: str | None = None):
        """One DQN step (`deepq.py:219-266`). ``axis_name``: DP-sharded
        learner inside a vma-checked shard_map — grads arrive auto-psummed
        by the AD transpose and are divided by the axis size; metrics
        pmean (see TD3.update for the full semantics)."""
        cfg = self.cfg
        if axis_name:
            n_shards = jax.lax.psum(1, axis_name)
            gnorm = lambda g: jax.tree.map(lambda x: x / n_shards, g)
            pmean = lambda t: jax.lax.pmean(t, axis_name)
        else:
            gnorm = pmean = lambda t: t
        obs, action, reward, next_obs, done = (
            batch.obs, batch.action, batch.reward, batch.next_obs, batch.done)
        next_q = self.net.apply(state.target_params, next_obs)
        target = reward + (1.0 - done) * cfg.gamma * jnp.max(next_q, axis=-1)
        target = jax.lax.stop_gradient(target)

        def loss_fn(params):
            q = self.net.apply(params, obs)
            q_taken = jnp.take_along_axis(q, action[:, None], axis=-1)[:, 0]
            return jnp.mean((q_taken - target) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        grads = gnorm(grads)
        updates, opt = self.tx.update(grads, state.opt, state.params)
        params = optax.apply_updates(state.params, updates)
        step = state.step + 1
        copy_now = (step % cfg.target_update_period) == 0
        target_params = jax.tree.map(
            lambda t, o: jnp.where(copy_now, o, t), state.target_params,
            params)
        return state.replace(params=params, target_params=target_params,
                             opt=opt, step=step), pmean({"loss": loss})
