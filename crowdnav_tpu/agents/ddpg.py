"""DDPG: single-critic deterministic policy gradient with OU exploration.

Re-design of `turtlebot3_rl_sim/src/ddpg.py` (Agent, single Critic + OU
noise `:42-62,94-110,198-243`): same actor squashing as TD3, one critic,
soft target updates every step. The OU process is carried as explicit state
(mean-reverting noise, theta=0.15, sigma=0.2 — `ddpg.py:44` defaults).
"""
from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import optax
from flax import struct

from crowdnav_tpu.models.networks import DeterministicActor, QCritic


@dataclasses.dataclass(frozen=True)
class DDPGConfig:
    hidden: int = 256
    actor_lr: float = 3e-4
    critic_lr: float = 3e-4
    gamma: float = 0.99
    tau: float = 0.005
    batch_size: int = 64              # start_ddpg_training.py
    buffer_size: int = 1_000_000
    max_lin_vel: float = 0.22
    max_ang_vel: float = 2.0
    ou_theta: float = 0.15            # ddpg.py:43 (OUNoise defaults)
    ou_sigma: float = 0.2
    # epsilon-uniform action mixing (not in the reference; same coverage
    # guarantee as TD3Config.explore_uniform_eps — OU noise alone loses
    # goal discovery at batch scale exactly like the reference's DDPG run,
    # which collapsed to 0% success, BASELINE.md). When
    # ``explore_eps_spectrum`` is set, env i of a batch of N explores with
    # the log-spaced constant eps_i in [eps_min, eps] (Ape-X style).
    explore_uniform_eps: float = 0.0
    explore_uniform_eps_min: float = 0.01
    explore_eps_spectrum: bool = False


@struct.dataclass
class DDPGState:
    actor_params: Any
    actor_target: Any
    critic_params: Any
    critic_target: Any
    actor_opt: Any
    critic_opt: Any
    ou_state: jax.Array   # (N_env, action_dim) mean-reverting noise carry


class DDPG:
    def __init__(self, cfg: DDPGConfig, obs_dim: int, action_dim: int = 2,
                 n_envs: int = 1):
        self.cfg = cfg
        self.obs_dim = obs_dim
        self.action_dim = action_dim
        self.n_envs = n_envs
        self.actor = DeterministicActor(action_dim, cfg.hidden,
                                        cfg.max_lin_vel, cfg.max_ang_vel)
        self.critic = QCritic(cfg.hidden)
        self.actor_tx = optax.adam(cfg.actor_lr)
        self.critic_tx = optax.adam(cfg.critic_lr)

    def init(self, key: jax.Array) -> DDPGState:
        k1, k2 = jax.random.split(key)
        obs = jnp.zeros((1, self.obs_dim))
        act = jnp.zeros((1, self.action_dim))
        actor_params = self.actor.init(k1, obs)
        critic_params = self.critic.init(k2, obs, act)
        return DDPGState(
            actor_params=actor_params,
            actor_target=jax.tree.map(jnp.copy, actor_params),
            critic_params=critic_params,
            critic_target=jax.tree.map(jnp.copy, critic_params),
            actor_opt=self.actor_tx.init(actor_params),
            critic_opt=self.critic_tx.init(critic_params),
            ou_state=jnp.zeros((self.n_envs, self.action_dim)),
        )

    def act(self, state: DDPGState, obs, key=None, explore: bool = True):
        """Policy + OU noise (`ddpg.py:53-62`: dx = theta*(mu - x) +
        sigma*U[0,1); note the reference draws *uniform* perturbations)."""
        cfg = self.cfg
        action = self.actor.apply(state.actor_params, obs)
        ou = state.ou_state
        lo = jnp.array([0.0, -cfg.max_ang_vel])
        hi = jnp.array([cfg.max_lin_vel, cfg.max_ang_vel])
        if explore and key is not None:
            k_ou, k_eps, k_unif = jax.random.split(key, 3)
            u = jax.random.uniform(k_ou, ou.shape)
            ou = ou + cfg.ou_theta * (0.0 - ou) + cfg.ou_sigma * u
            action = action + ou
            # scalar-eps mixing applies at any rank (matches TD3, td3.py);
            # only the per-env spectrum needs a batch axis to index envs
            if cfg.explore_uniform_eps > 0.0:
                unif = jax.random.uniform(k_unif, action.shape,
                                          minval=lo, maxval=hi)
                if cfg.explore_eps_spectrum and action.ndim > 1:
                    n = action.shape[0]
                    # same lo resolution as TD3.act and
                    # runtime.greedy_env_mask (0.0 counts as unset) so the
                    # stratified cohort mask matches the behavior policy
                    hi_e = cfg.explore_uniform_eps
                    lo_e = cfg.explore_uniform_eps_min or 0.01
                    frac = jnp.arange(n, dtype=jnp.float32) / max(n - 1, 1)
                    eps = hi_e * (lo_e / hi_e) ** frac
                    eps = eps.reshape((n,) + (1,) * (action.ndim - 1))
                else:
                    eps = cfg.explore_uniform_eps
                pick = jax.random.bernoulli(k_eps, eps,
                                            action.shape[:-1] + (1,))
                action = jnp.where(pick, unif, action)
        return jnp.clip(action, lo, hi), state.replace(ou_state=ou)

    def update(self, state: DDPGState, batch, key=None,
               axis_name: str | None = None):
        """One DDPG step (`ddpg.py:198-243`): critic MSE to the target
        bootstrap, actor ascent on Q, soft target updates every step.
        ``axis_name``: DP-sharded learner inside a vma-checked shard_map —
        grads arrive auto-psummed by the AD transpose and are divided by
        the axis size; metrics pmean (see TD3.update for the full
        semantics)."""
        cfg = self.cfg
        if axis_name:
            n_shards = jax.lax.psum(1, axis_name)
            gnorm = lambda g: jax.tree.map(lambda x: x / n_shards, g)
            pmean = lambda t: jax.lax.pmean(t, axis_name)
        else:
            gnorm = pmean = lambda t: t
        obs, action, reward, next_obs, done = (
            batch.obs, batch.action, batch.reward, batch.next_obs, batch.done)
        next_action = self.actor.apply(state.actor_target, next_obs)
        tq = self.critic.apply(state.critic_target, next_obs, next_action)
        y = reward[:, None] + (1.0 - done[:, None]) * cfg.gamma * tq
        y = jax.lax.stop_gradient(y)

        def critic_loss(params):
            q = self.critic.apply(params, obs, action)
            return jnp.mean((q - y) ** 2)

        c_loss, c_grads = jax.value_and_grad(critic_loss)(state.critic_params)
        c_grads = gnorm(c_grads)
        c_up, critic_opt = self.critic_tx.update(c_grads, state.critic_opt,
                                                 state.critic_params)
        critic_params = optax.apply_updates(state.critic_params, c_up)

        def actor_loss(params):
            pi = self.actor.apply(params, obs)
            return -jnp.mean(self.critic.apply(critic_params, obs, pi))

        a_loss, a_grads = jax.value_and_grad(actor_loss)(state.actor_params)
        a_grads = gnorm(a_grads)
        a_up, actor_opt = self.actor_tx.update(a_grads, state.actor_opt,
                                               state.actor_params)
        actor_params = optax.apply_updates(state.actor_params, a_up)

        soft = lambda t, o: jax.tree.map(
            lambda a, b: (1.0 - cfg.tau) * a + cfg.tau * b, t, o)
        new_state = state.replace(
            actor_params=actor_params,
            actor_target=soft(state.actor_target, actor_params),
            critic_params=critic_params,
            critic_target=soft(state.critic_target, critic_params),
            actor_opt=actor_opt,
            critic_opt=critic_opt,
        )
        return new_state, pmean({"critic_loss": c_loss,
                                 "actor_loss": a_loss})
