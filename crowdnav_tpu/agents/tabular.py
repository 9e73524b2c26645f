"""Tabular Q-Learning and SARSA over the digitized (dtg, htg) state grid.

Re-design of `turtlebot3_rl_sim/src/qlearn.py` / `sarsa.py` + their drivers
(`start_qlearn_training.py:41-46,63-75`): the reference digitizes distance
into 30 bins of 0.1 m over [0, 3) and heading into 32 bins of 0.19625 rad
over [-3.14, 3.14), keys a Python dict with the digitized string, and does
Q-Learning / SARSA updates with epsilon-greedy exploration (with the
magnitude-scaled random tie-break trick, `qlearn.py:47-72`).

Here the Q-table is a dense array ``(n_dist_bins+1, n_rad_bins+1, 3)`` so
lookup/update are scatter/gather ops, vmappable over env batches. The
unvisited default of 0.0 matches ``dict.get(..., 0.0)`` (`qlearn.py:31-35`).
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
from flax import struct

N_DIST_BINS = 30   # np.arange(0, 3, 0.1) -> 30 edges -> 31 buckets
N_RAD_BINS = 32    # np.arange(-3.14, 3.14, 0.19625) -> 32 edges -> 33 buckets

# build edges in float64 (as the reference's np.arange does) before casting,
# so float32 edge equality matches np.digitize at exact bin boundaries
import numpy as _np  # noqa: E402

# kept as numpy so importing this module does not initialize the JAX
# backend (drivers must be able to pin --platform after import)
_DIST_EDGES = _np.round(_np.arange(0.0, 3.0, 0.1), 2).astype(_np.float32)
_RAD_EDGES = _np.round(_np.arange(-3.14, 3.14, 0.19625), 2).astype(
    _np.float32)


def discretize_state(dtg, htg):
    """(dtg, htg) -> flat table index; mirrors np.digitize on the reference's
    rounded bin edges (`start_qlearn_training.py:42-46,67-69`)."""
    di = jnp.searchsorted(jnp.asarray(_DIST_EDGES), dtg, side="right")
    hi = jnp.searchsorted(jnp.asarray(_RAD_EDGES), htg, side="right")
    return di * (N_RAD_BINS + 1) + hi


@dataclasses.dataclass(frozen=True)
class TabularConfig:
    alpha: float = 0.2     # configs/qlearn.yaml
    gamma: float = 0.9
    epsilon_start: float = 0.9
    epsilon_min: float = 0.05
    epsilon_decay: float = 0.9986
    n_actions: int = 3


@struct.dataclass
class TabularState:
    q: jax.Array          # (n_states, n_actions)
    epsilon: jax.Array
    visited: jax.Array    # (n_states, n_actions) bool — dict-membership


N_STATES = (N_DIST_BINS + 1) * (N_RAD_BINS + 1)


def save_table(path: str, state: TabularState) -> None:
    """Persist a Q-table (the reference pickles its Q-dict,
    `utils.py:20-35`, saved at `qlearn.py:82-91`)."""
    _np.savez(path, q=_np.asarray(state.q),
              epsilon=_np.asarray(state.epsilon),
              visited=_np.asarray(state.visited))


def load_table(path: str) -> TabularState:
    """Restore a Q-table (the reference loads one at construction,
    `qlearn.py:23`)."""
    if not path.endswith(".npz"):
        path += ".npz"
    d = _np.load(path)
    return TabularState(q=jnp.asarray(d["q"]),
                        epsilon=jnp.asarray(d["epsilon"]),
                        visited=jnp.asarray(d["visited"]))


class _TabularBase:
    def __init__(self, cfg: TabularConfig):
        self.cfg = cfg

    def init(self) -> TabularState:
        return TabularState(
            q=jnp.zeros((N_STATES, self.cfg.n_actions), jnp.float32),
            epsilon=jnp.asarray(self.cfg.epsilon_start, jnp.float32),
            visited=jnp.zeros((N_STATES, self.cfg.n_actions), bool),
        )

    def act(self, state: TabularState, s_idx, key, explore: bool = True):
        """Epsilon-greedy with the reference's magnitude-noise tie-break
        (`qlearn.py:47-72`): with prob epsilon, add U[-mag/2, mag/2) noise
        scaled by the largest |Q| before the argmax."""
        q = state.q[s_idx]                       # (..., A)
        if not explore:
            return jnp.argmax(q, axis=-1).astype(jnp.int32)
        k1, k2 = jax.random.split(key)
        mag = jnp.max(jnp.abs(q), axis=-1, keepdims=True)
        noise = (jax.random.uniform(k1, q.shape) - 0.5) * mag
        jitter = jax.random.uniform(k2, q.shape[:-1]) < state.epsilon
        q_expl = jnp.where(jitter[..., None], q + noise, q)
        return jnp.argmax(q_expl, axis=-1).astype(jnp.int32)

    def decay_epsilon(self, state: TabularState) -> TabularState:
        eps = jnp.maximum(state.epsilon * self.cfg.epsilon_decay,
                          self.cfg.epsilon_min)
        return state.replace(epsilon=eps)

    def _learn_q(self, state: TabularState, s, a, reward, value):
        """`learnQ` (`qlearn.py:34-45`): first visit stores the raw reward,
        later visits blend toward ``value`` with alpha."""
        old = state.q[s, a]
        seen = state.visited[s, a]
        new = jnp.where(seen, old + self.cfg.alpha * (value - old), reward)
        return state.replace(q=state.q.at[s, a].set(new),
                             visited=state.visited.at[s, a].set(True))


class QLearning(_TabularBase):
    def update(self, state: TabularState, s, a, reward, s2):
        """Off-policy: target = r + gamma * max_a' Q(s',a')
        (`qlearn.py:74-76` — note the reference passes
        ``reward + gamma*maxqnew`` as ``value``)."""
        maxq = jnp.max(state.q[s2], axis=-1)
        return self._learn_q(state, s, a, reward,
                             reward + self.cfg.gamma * maxq)


class Sarsa(_TabularBase):
    def update(self, state: TabularState, s, a, reward, s2, a2):
        """On-policy: target uses the actually-chosen next action
        (`sarsa.py:57-59`)."""
        qnext = state.q[s2, a2]
        return self._learn_q(state, s, a, reward,
                             reward + self.cfg.gamma * qnext)
