"""Network definitions (flax.linen), mirroring the reference architectures.

All policies/critics are 2-hidden-layer MLPs (256 wide for the actor-critic
family — `td3.py:81-126`, `ddpg.py:67-110`, `sac.py:43-143`; 300 wide for
DQN — `start_dqn_training.py:57`). States are 361-398 dim flat vectors, so
the MXU work is small per sample; throughput comes from batch size. We keep
parameters in float32 and let XLA pick bf16-friendly fusions; batch dims are
what get sharded, so these modules stay shard-agnostic.
"""
from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp


class DeterministicActor(nn.Module):
    """TD3/DDPG actor with the reference's action-head squashing
    (`td3.py:96-106`): sigmoid -> [0, v_max] linear vel, tanh ->
    [-w_max, w_max] angular vel.

    ``dtype`` is the COMPUTE dtype (params always float32): bfloat16 runs
    the matmuls at the MXU's native rate; the output is cast back to
    float32 so env math and action clipping stay full-precision."""

    action_dim: int
    hidden: int = 256
    max_lin_vel: float = 0.22
    max_ang_vel: float = 2.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, obs):
        x = nn.relu(nn.Dense(self.hidden, dtype=self.dtype)(obs))
        x = nn.relu(nn.Dense(self.hidden, dtype=self.dtype)(x))
        raw = nn.Dense(self.action_dim, dtype=self.dtype)(x)
        raw = raw.astype(jnp.float32)
        lin = nn.sigmoid(raw[..., :1]) * self.max_lin_vel
        ang = nn.tanh(raw[..., 1:2]) * self.max_ang_vel
        return jnp.concatenate([lin, ang], axis=-1)


class QCritic(nn.Module):
    """State-action critic (`td3.py:109-126`). ``dtype`` as in
    ``DeterministicActor``; the Q output is cast to float32 so TD targets
    and losses accumulate full-precision."""

    hidden: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, obs, action):
        x = jnp.concatenate([obs, action], axis=-1)
        x = nn.relu(nn.Dense(self.hidden, dtype=self.dtype)(x))
        x = nn.relu(nn.Dense(self.hidden, dtype=self.dtype)(x))
        return nn.Dense(1, dtype=self.dtype)(x).astype(jnp.float32)


class DoubleCritic(nn.Module):
    """Twin critics evaluated in one fused forward (TD3's clipped double-Q,
    `td3.py:159-165,248-250`) — one module so both share a single matmul
    schedule on the MXU."""

    hidden: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, obs, action):
        q1 = QCritic(self.hidden, self.dtype, name="q1")(obs, action)
        q2 = QCritic(self.hidden, self.dtype, name="q2")(obs, action)
        return q1, q2


class GaussianActor(nn.Module):
    """SAC actor: mean/log_std heads with tanh squashing (`sac.py:43-106`).

    The reference then additionally squashes the tanh output with
    sigmoid/tanh action heads (`sac.py:89-91,102-104`) — reproduced.
    """

    action_dim: int
    hidden: int = 256
    log_std_min: float = -20.0
    log_std_max: float = 2.0
    max_lin_vel: float = 0.22
    max_ang_vel: float = 2.0

    @nn.compact
    def __call__(self, obs):
        x = nn.relu(nn.Dense(self.hidden)(obs))
        x = nn.relu(nn.Dense(self.hidden)(x))
        init = nn.initializers.uniform(scale=3e-3)
        mean = nn.Dense(self.action_dim, kernel_init=init, bias_init=init)(x)
        log_std = nn.Dense(self.action_dim, kernel_init=init,
                           bias_init=init)(x)
        log_std = jnp.clip(log_std, self.log_std_min, self.log_std_max)
        return mean, log_std

    def squash(self, z):
        a = nn.tanh(z)
        lin = nn.sigmoid(a[..., :1]) * self.max_lin_vel
        ang = nn.tanh(a[..., 1:2]) * self.max_ang_vel
        return jnp.concatenate([lin, ang], axis=-1)


class ValueNetwork(nn.Module):
    """SAC state-value net. The reference constructs it as
    ``ValueNetwork(state_size, action_size, hidden_size)`` against a
    ``(state_dim, hidden_dim, init_w)`` signature (`sac.py:128-129,175-176`),
    silently making the hidden width 2 and init scale 256 — the committed
    quirk. Default here is the intended 256-wide net; pass ``hidden=2`` to
    reproduce the quirk for parity studies."""

    hidden: int = 256

    @nn.compact
    def __call__(self, obs):
        init = nn.initializers.uniform(scale=3e-3)
        x = nn.relu(nn.Dense(self.hidden)(obs))
        x = nn.relu(nn.Dense(self.hidden)(x))
        return nn.Dense(1, kernel_init=init, bias_init=init)(x)


class QNetwork(nn.Module):
    """DQN value head: configurable hidden stack, linear output
    (`deepq.py:102-127`: [300, 300], relu, lecun_uniform)."""

    n_actions: int
    hidden: Sequence[int] = (300, 300)

    @nn.compact
    def __call__(self, obs):
        x = obs
        for h in self.hidden:
            x = nn.relu(nn.Dense(h,
                                 kernel_init=nn.initializers.lecun_uniform())(x))
        return nn.Dense(self.n_actions,
                        kernel_init=nn.initializers.lecun_uniform())(x)
