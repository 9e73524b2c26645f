"""SAC (2018 value-network variant), matching the reference's formulation.

Re-design of `turtlebot3_rl_sim/src/sac.py` (Agent :146-307): Gaussian
policy with tanh squash + the action-head squashing, one soft-Q network,
a state-value network with target, and the mean/std/z regularizers
(`mean_lambda`, `std_lambda`, `z_lambda` — `sac.py:268-272`). The policy
loss is the reference's score-function form
``(log_prob * (log_prob - (Q - V)).detach()).mean()`` (`sac.py:265-266`),
not the modern reparameterized objective — kept for behavioral parity.

Quirk (documented in `models.networks.ValueNetwork`): the reference's value
net is accidentally 2-wide; the default here is the intended 256. Set
``value_hidden=2`` to reproduce.
"""
from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import optax
from flax import struct

from crowdnav_tpu.models.networks import GaussianActor, QCritic, ValueNetwork


@dataclasses.dataclass(frozen=True)
class SACConfig:
    hidden: int = 256
    value_hidden: int = 256       # 2 reproduces the reference quirk
    actor_lr: float = 3e-4        # configs/sac.yaml
    value_lr: float = 3e-4
    soft_q_lr: float = 3e-4
    gamma: float = 0.99
    tau: float = 5e-3
    batch_size: int = 64          # start_sac_training.py
    buffer_size: int = 1_000_000
    max_lin_vel: float = 0.22
    max_ang_vel: float = 2.0
    mean_lambda: float = 1e-3     # start_sac_training.py regularizers
    std_lambda: float = 1e-3
    z_lambda: float = 0.0


@struct.dataclass
class SACState:
    actor_params: Any
    value_params: Any
    value_target: Any
    soft_q_params: Any
    actor_opt: Any
    value_opt: Any
    soft_q_opt: Any


class SAC:
    def __init__(self, cfg: SACConfig, obs_dim: int, action_dim: int = 2):
        self.cfg = cfg
        self.obs_dim = obs_dim
        self.action_dim = action_dim
        self.actor = GaussianActor(action_dim, cfg.hidden,
                                   max_lin_vel=cfg.max_lin_vel,
                                   max_ang_vel=cfg.max_ang_vel)
        self.soft_q = QCritic(cfg.hidden)
        self.value = ValueNetwork(cfg.value_hidden)
        self.actor_tx = optax.adam(cfg.actor_lr)
        self.value_tx = optax.adam(cfg.value_lr)
        self.soft_q_tx = optax.adam(cfg.soft_q_lr)

    def init(self, key: jax.Array) -> SACState:
        k1, k2, k3 = jax.random.split(key, 3)
        obs = jnp.zeros((1, self.obs_dim))
        act = jnp.zeros((1, self.action_dim))
        actor_params = self.actor.init(k1, obs)
        value_params = self.value.init(k2, obs)
        soft_q_params = self.soft_q.init(k3, obs, act)
        return SACState(
            actor_params=actor_params,
            value_params=value_params,
            value_target=jax.tree.map(jnp.copy, value_params),
            soft_q_params=soft_q_params,
            actor_opt=self.actor_tx.init(actor_params),
            value_opt=self.value_tx.init(value_params),
            soft_q_opt=self.soft_q_tx.init(soft_q_params),
        )

    def _sample(self, params, obs, key):
        mean, log_std = self.actor.apply(params, obs)
        std = jnp.exp(log_std)
        z = mean + std * jax.random.normal(key, mean.shape)
        a_tanh = jnp.tanh(z)
        eps = 1e-6
        log_prob = (-0.5 * ((z - mean) / std) ** 2
                    - jnp.log(std) - 0.5 * jnp.log(2 * jnp.pi)
                    - jnp.log(1 - a_tanh ** 2 + eps))
        log_prob = jnp.sum(log_prob, axis=-1, keepdims=True)
        action = self.actor.squash(z)
        return action, log_prob, z, mean, log_std

    def act(self, state: SACState, obs, key, explore: bool = True):
        """Stochastic policy sample + clip (`sac.py:206-229`)."""
        action, _, _, mean, log_std = self._sample(state.actor_params, obs,
                                                   key)
        if not explore:
            action = self.actor.squash(mean)
        lo = jnp.array([0.0, -self.cfg.max_ang_vel])
        hi = jnp.array([self.cfg.max_lin_vel, self.cfg.max_ang_vel])
        return jnp.clip(action, lo, hi)

    def update(self, state: SACState, batch, key: jax.Array,
               axis_name: str | None = None):
        """One SAC step (`sac.py:231-290`). ``axis_name``: DP-sharded
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

        # soft-Q target from value target net
        tv = self.value.apply(state.value_target, next_obs)
        next_q = reward[:, None] + (1.0 - done[:, None]) * cfg.gamma * tv
        next_q = jax.lax.stop_gradient(next_q)

        def q_loss(params):
            q = self.soft_q.apply(params, obs, action)
            return jnp.mean((q - next_q) ** 2)

        ql, q_grads = jax.value_and_grad(q_loss)(state.soft_q_params)
        q_grads = gnorm(q_grads)
        q_up, soft_q_opt = self.soft_q_tx.update(q_grads, state.soft_q_opt,
                                                 state.soft_q_params)
        soft_q_params = optax.apply_updates(state.soft_q_params, q_up)

        new_action, log_prob, z, mean, log_std = self._sample(
            state.actor_params, obs, key)
        expected_new_q = self.soft_q.apply(soft_q_params, obs, new_action)
        next_value = jax.lax.stop_gradient(expected_new_q - log_prob)

        def v_loss(params):
            v = self.value.apply(params, obs)
            return jnp.mean((v - next_value) ** 2)

        vl, v_grads = jax.value_and_grad(v_loss)(state.value_params)
        v_grads = gnorm(v_grads)
        v_up, value_opt = self.value_tx.update(v_grads, state.value_opt,
                                               state.value_params)
        value_params = optax.apply_updates(state.value_params, v_up)

        expected_value = self.value.apply(value_params, obs)
        log_prob_target = expected_new_q - expected_value

        def policy_loss(params):
            a, lp, zz, mu, ls = self._sample(params, obs, key)
            adv = jax.lax.stop_gradient(lp - log_prob_target)
            loss = jnp.mean(lp * adv)
            loss += cfg.mean_lambda * jnp.mean(mu ** 2)
            loss += cfg.std_lambda * jnp.mean(ls ** 2)
            loss += cfg.z_lambda * jnp.mean(jnp.sum(zz ** 2, axis=-1))
            return loss

        pl, p_grads = jax.value_and_grad(policy_loss)(state.actor_params)
        p_grads = gnorm(p_grads)
        p_up, actor_opt = self.actor_tx.update(p_grads, state.actor_opt,
                                               state.actor_params)
        actor_params = optax.apply_updates(state.actor_params, p_up)

        soft = lambda t, o: jax.tree.map(
            lambda a, b: (1.0 - cfg.tau) * a + cfg.tau * b, t, o)
        new_state = SACState(
            actor_params=actor_params,
            value_params=value_params,
            value_target=soft(state.value_target, value_params),
            soft_q_params=soft_q_params,
            actor_opt=actor_opt,
            value_opt=value_opt,
            soft_q_opt=soft_q_opt,
        )
        return new_state, pmean({"q_loss": ql, "value_loss": vl,
                                 "policy_loss": pl})
