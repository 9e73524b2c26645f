"""On-device (HBM) experience replay.

Replaces the Python list ring buffers duplicated across `td3.py:19-37`,
`ddpg.py:21-39`, `sac.py:22-40` and the dict-based `memory.Memory:5-53`:
preallocated HBM arrays, `at[...].set` ring writes, `jax.random` uniform
sampling — all inside the jitted train step, so experience never leaves the
device. One buffer lives per env-shard; there is no cross-shard mixing
(each shard learns on its own slice and gradients are psum'd).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from flax import struct


class Transition(NamedTuple):
    obs: jax.Array
    action: jax.Array
    reward: jax.Array
    next_obs: jax.Array
    done: jax.Array


@struct.dataclass
class ReplayState:
    obs: jax.Array        # (cap, obs_dim)
    action: jax.Array     # (cap, act_dim)  (or (cap,) int32 for discrete)
    reward: jax.Array     # (cap,)
    next_obs: jax.Array   # (cap, obs_dim)
    done: jax.Array       # (cap,) float32
    pos: jax.Array        # () int32 next write index
    size: jax.Array       # () int32 number of valid rows


class ReplayBuffer:
    """Fixed-capacity uniform replay bound to shapes, pure add/sample."""

    def __init__(self, capacity: int, obs_dim: int, act_dim: int | None):
        self.capacity = capacity
        self.obs_dim = obs_dim
        self.act_dim = act_dim  # None => discrete int32 actions

    def init(self) -> ReplayState:
        cap = self.capacity
        act = (jnp.zeros(cap, jnp.int32) if self.act_dim is None
               else jnp.zeros((cap, self.act_dim), jnp.float32))
        return ReplayState(
            obs=jnp.zeros((cap, self.obs_dim), jnp.float32),
            action=act,
            reward=jnp.zeros(cap, jnp.float32),
            next_obs=jnp.zeros((cap, self.obs_dim), jnp.float32),
            done=jnp.zeros(cap, jnp.float32),
            pos=jnp.zeros((), jnp.int32),
            size=jnp.zeros((), jnp.int32),
        )

    def add_batch(self, state: ReplayState, tr: Transition,
                  mask: jax.Array | None = None) -> ReplayState:
        """Insert N transitions (one per env) at the ring head.

        ``mask`` drops rows (e.g. the bogus terminal->reset transition an
        auto-resetting env emits): masked-out rows get an out-of-range index
        and ``mode='drop'`` discards them; the write pointer advances by the
        number of kept rows (kept rows pack to the front via a stable sort).
        """
        n = tr.reward.shape[0]
        if mask is None:
            idx = (state.pos + jnp.arange(n, dtype=jnp.int32)) % self.capacity
            n_kept = jnp.asarray(n, jnp.int32)
        else:
            # rank kept rows 0..k-1, dropped rows -> capacity (dropped)
            rank = jnp.cumsum(mask.astype(jnp.int32)) - 1
            idx = jnp.where(mask, (state.pos + rank) % self.capacity,
                            self.capacity)
            n_kept = jnp.sum(mask.astype(jnp.int32))
        return self._write(state, tr, idx, n_kept)

    def _write(self, state: ReplayState, tr: Transition, idx, n_kept):
        return state.replace(
            obs=state.obs.at[idx].set(tr.obs, mode="drop"),
            action=state.action.at[idx].set(tr.action, mode="drop"),
            reward=state.reward.at[idx].set(tr.reward, mode="drop"),
            next_obs=state.next_obs.at[idx].set(tr.next_obs, mode="drop"),
            done=state.done.at[idx].set(tr.done.astype(jnp.float32),
                                        mode="drop"),
            pos=(state.pos + n_kept) % self.capacity,
            size=jnp.minimum(state.size + n_kept, self.capacity),
        )

    def sample(self, state: ReplayState, key: jax.Array,
               batch_size: int) -> Transition:
        """Uniform with-replacement sample (`td3.py:31-34` samples without
        replacement from a Python list; at production buffer sizes the
        distinction is immaterial and with-replacement keeps the kernel a
        single gather)."""
        idx = jax.random.randint(key, (batch_size,), 0,
                                 jnp.maximum(state.size, 1))
        return Transition(
            obs=state.obs[idx],
            action=state.action[idx],
            reward=state.reward[idx],
            next_obs=state.next_obs[idx],
            done=state.done[idx],
        )
