"""TD3: twin delayed deep deterministic policy gradient, on-device.

Re-design of `turtlebot3_rl_sim/src/td3.py` (Agent :129-319): twin critics
with clipped double-Q targets, target-policy smoothing noise (std 0.2, clip
0.5), delayed policy/target updates (every 2), Gaussian exploration, soft
(tau) target updates. Differences by design:

- everything is a pure function over an explicit ``TD3State`` pytree; the
  whole update jits and vmaps/shard_maps;
- the two critics train under one optimizer on a fused twin-critic module
  (the reference runs two separate Adam instances with identical hyper-
  parameters — same math, two kernels);
- exploration noise is drawn from an explicit PRNG key per actor batch.

The reference's exploration sigma is constant 1.0
(`GaussianExploration:67-78` with max_sigma=min_sigma=1.0) — huge relative
to the [0, 0.22] velocity range, so behavior is near-bang-bang early on;
``explore_sigma`` defaults to that value for parity and can be annealed.
"""
from __future__ import annotations

import dataclasses
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from crowdnav_tpu.models.networks import DeterministicActor, DoubleCritic


@dataclasses.dataclass(frozen=True)
class TD3Config:
    hidden: int = 256                 # start_td3_training.py:65
    actor_lr: float = 3e-4            # configs/td3.yaml
    critic_lr: float = 3e-4
    gamma: float = 0.99
    tau: float = 0.005
    batch_size: int = 128             # start_td3_training.py:62
    buffer_size: int = 1_000_000
    max_lin_vel: float = 0.22
    max_ang_vel: float = 2.0
    policy_noise: float = 0.2         # target smoothing std (:70)
    noise_clip: float = 0.5           # (:71)
    policy_update: int = 2            # delayed update period (:72)
    # GaussianExploration (td3.py:67-78): sigma = max - (max-min) *
    # min(1, step/decay_period). The reference configures max == min == 1.0
    # (constant, never actually decays); set explore_sigma_min lower to use
    # the decay machinery it shipped but never enabled.
    explore_sigma: float = 1.0
    explore_sigma_min: float = 1.0
    explore_decay_steps: int = 1_000_000
    # epsilon-uniform action mixing (not in the reference): with this
    # probability per env-step the behavior action is drawn uniformly from
    # the action box. Off-policy TD3 tolerates it, and it guarantees state
    # coverage (goal discovery) that pure policy+Gaussian exploration can
    # lose when the actor saturates (e.g. the stop-and-spin collapse).
    # Anneals explore_uniform_eps -> explore_uniform_eps_min over
    # explore_decay_steps (same schedule knob as sigma); start near 1.0 so
    # the early buffer is a pure random walk (whose per-episode goal-hit
    # rate seeds the critic's +200 signal), then hand over to the policy.
    explore_uniform_eps: float = 0.0
    explore_uniform_eps_min: float | None = None  # None = constant
    # Per-env epsilon spectrum (Ape-X style): instead of one annealed
    # scalar, env i of a batch of N uses the log-spaced constant
    #   eps_i = eps * (eps_min / eps)^(i / (N-1))
    # so a fixed fraction of envs explore near-uniformly FOREVER (a
    # permanent stream of goal-reaching transitions into the replay ring)
    # while the rest exploit. Overrides the anneal when set.
    explore_eps_spectrum: bool = False
    # Compute dtype for the MLP matmuls ("float32" | "bfloat16"). Params,
    # optimizer state, TD targets and losses stay float32; bfloat16 runs
    # the forward/backward matmuls at the MXU's native rate (the learner
    # is the dominant cost of the converging configuration).
    compute_dtype: str = "float32"


@struct.dataclass
class TD3State:
    actor_params: Any
    actor_target: Any
    critic_params: Any
    critic_target: Any
    actor_opt: Any
    critic_opt: Any
    update_count: jax.Array
    explore_sigma: jax.Array  # () current exploration noise scale
    explore_eps: jax.Array    # () current epsilon-uniform mixing prob


class TD3:
    def __init__(self, cfg: TD3Config, obs_dim: int, action_dim: int = 2):
        self.cfg = cfg
        self.obs_dim = obs_dim
        self.action_dim = action_dim
        dtype = jnp.dtype(cfg.compute_dtype)
        self.actor = DeterministicActor(action_dim, cfg.hidden,
                                        cfg.max_lin_vel, cfg.max_ang_vel,
                                        dtype=dtype)
        self.critic = DoubleCritic(cfg.hidden, dtype=dtype)
        self.actor_tx = optax.adam(cfg.actor_lr)
        self.critic_tx = optax.adam(cfg.critic_lr)

    def init(self, key: jax.Array) -> TD3State:
        k1, k2 = jax.random.split(key)
        obs = jnp.zeros((1, self.obs_dim))
        act = jnp.zeros((1, self.action_dim))
        actor_params = self.actor.init(k1, obs)
        critic_params = self.critic.init(k2, obs, act)
        return TD3State(
            actor_params=actor_params,
            actor_target=jax.tree.map(jnp.copy, actor_params),
            critic_params=critic_params,
            critic_target=jax.tree.map(jnp.copy, critic_params),
            actor_opt=self.actor_tx.init(actor_params),
            critic_opt=self.critic_tx.init(critic_params),
            update_count=jnp.zeros((), jnp.int32),
            explore_sigma=jnp.asarray(self.cfg.explore_sigma, jnp.float32),
            explore_eps=jnp.asarray(self.cfg.explore_uniform_eps,
                                    jnp.float32),
        )

    def decay_sigma(self, state: TD3State, env_steps) -> TD3State:
        """Linear exploration anneal over ``explore_decay_steps`` env-steps:
        Gaussian sigma (`GaussianExploration.sample:73-77` machinery — the
        reference ships max == min so it never moves) and the epsilon-
        uniform mixing probability."""
        cfg = self.cfg
        frac = jnp.minimum(1.0, env_steps / cfg.explore_decay_steps)
        sigma = cfg.explore_sigma - (cfg.explore_sigma
                                     - cfg.explore_sigma_min) * frac
        state = state.replace(explore_sigma=sigma.astype(jnp.float32))
        if cfg.explore_uniform_eps_min is not None:
            eps = cfg.explore_uniform_eps - (
                cfg.explore_uniform_eps - cfg.explore_uniform_eps_min) * frac
            state = state.replace(explore_eps=eps.astype(jnp.float32))
        return state

    def act(self, state: TD3State, obs, key=None, explore: bool = True):
        """Batched policy (+ exploration noise, clipped to the action box —
        `td3.py:196-223`)."""
        action = self.actor.apply(state.actor_params, obs)
        lo = jnp.array([0.0, -self.cfg.max_ang_vel])
        hi = jnp.array([self.cfg.max_lin_vel, self.cfg.max_ang_vel])
        if explore and key is not None:
            k_noise, k_eps, k_unif = jax.random.split(key, 3)
            noise = jax.random.normal(k_noise,
                                      action.shape) * state.explore_sigma
            action = action + noise
            if self.cfg.explore_uniform_eps > 0.0:
                unif = jax.random.uniform(k_unif, action.shape,
                                          minval=lo, maxval=hi)
                if self.cfg.explore_eps_spectrum and action.ndim > 1:
                    n = action.shape[0]
                    hi_e = self.cfg.explore_uniform_eps
                    lo_e = self.cfg.explore_uniform_eps_min or 0.01
                    frac = jnp.arange(n, dtype=jnp.float32) / max(n - 1, 1)
                    eps = hi_e * (lo_e / hi_e) ** frac
                    eps = eps.reshape((n,) + (1,) * (action.ndim - 1))
                else:
                    eps = jnp.clip(state.explore_eps, 0.0, 1.0)
                pick = jax.random.bernoulli(k_eps, eps,
                                            action.shape[:-1] + (1,))
                action = jnp.where(pick, unif, action)
        return jnp.clip(action, lo, hi)

    def update(self, state: TD3State, batch, key: jax.Array,
               axis_name: str | None = None, smoothing_noise=None):
        """One TD3 gradient step (`td3.py:225-285`).

        The actor/target update runs every ``policy_update`` calls via a
        zero-mask (identical FLOPs each call — keeps the jitted program
        branch-free and shard-uniform).

        ``axis_name``: data-parallel learner inside a vma-checked
        ``shard_map`` — the batch is this device's shard of the global
        batch. Under jax's varying-manual-axes AD, differentiating the
        (device-varying) local loss w.r.t. the REPLICATED params already
        inserts the gradient ``psum`` in the transpose, so the grads
        arrive as the SUM of per-device local-mean grads; dividing by the
        axis size recovers the exact global-batch mean gradient, every
        device applies the identical optimizer step, and the agent state
        stays replicated (SURVEY.md §2.7 sharded-learner row; the
        NCCL-allreduce equivalent). Scalar metrics are still varying and
        are ``pmean``-ed explicitly.
        ``smoothing_noise``: optional pre-drawn standard-normal noise for
        target-policy smoothing (shape of next_action); used by the
        sharded-vs-single equality test to make "same RNG" literal."""
        cfg = self.cfg
        if axis_name:
            n_shards = jax.lax.psum(1, axis_name)
            gnorm = lambda g: jax.tree.map(lambda x: x / n_shards, g)
            pmean = lambda t: jax.lax.pmean(t, axis_name)
        else:
            gnorm = pmean = lambda t: t
        obs, action, reward, next_obs, done = (
            batch.obs, batch.action, batch.reward, batch.next_obs, batch.done)

        # --- critic update ---
        next_action = self.actor.apply(state.actor_target, next_obs)
        raw = smoothing_noise if smoothing_noise is not None \
            else jax.random.normal(key, next_action.shape)
        noise = raw * cfg.policy_noise
        noise = jnp.clip(noise, -cfg.noise_clip, cfg.noise_clip)
        # the reference does NOT re-clip the smoothed action to the action
        # box (td3.py:242-246); reproduced
        next_action = next_action + noise
        tq1, tq2 = self.critic.apply(state.critic_target, next_obs,
                                     next_action)
        target_q = jnp.minimum(tq1, tq2)
        y = reward[:, None] + (1.0 - done[:, None]) * cfg.gamma * target_q
        y = jax.lax.stop_gradient(y)

        def critic_loss(params):
            q1, q2 = self.critic.apply(params, obs, action)
            return jnp.mean((q1 - y) ** 2) + jnp.mean((q2 - y) ** 2)

        c_loss, c_grads = jax.value_and_grad(critic_loss)(state.critic_params)
        c_grads = gnorm(c_grads)
        c_updates, critic_opt = self.critic_tx.update(
            c_grads, state.critic_opt, state.critic_params)
        critic_params = optax.apply_updates(state.critic_params, c_updates)

        # --- delayed actor + target updates ---
        do_policy = (state.update_count % cfg.policy_update) == 0

        def actor_loss(params):
            pi = self.actor.apply(params, obs)
            q1, _ = self.critic.apply(critic_params, obs, pi)
            return -jnp.mean(q1)

        a_loss, a_grads = jax.value_and_grad(actor_loss)(state.actor_params)
        a_grads = gnorm(a_grads)
        a_grads = jax.tree.map(lambda g: g * do_policy, a_grads)
        a_updates, actor_opt = self.actor_tx.update(
            a_grads, state.actor_opt, state.actor_params)
        actor_params = optax.apply_updates(state.actor_params, a_updates)

        def soft(target, online):
            return jax.tree.map(
                lambda t, o: jnp.where(do_policy,
                                       (1.0 - cfg.tau) * t + cfg.tau * o, t),
                target, online)

        new_state = TD3State(
            actor_params=actor_params,
            actor_target=soft(state.actor_target, actor_params),
            critic_params=critic_params,
            critic_target=soft(state.critic_target, critic_params),
            actor_opt=actor_opt,
            critic_opt=critic_opt,
            update_count=state.update_count + 1,
            explore_sigma=state.explore_sigma,
            explore_eps=state.explore_eps,
        )
        metrics = pmean({"critic_loss": c_loss, "actor_loss": a_loss,
                         "q_target_mean": jnp.mean(y)})
        return new_state, metrics
