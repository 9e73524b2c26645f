"""On-device (HBM) experience replay with block-aligned ring writes.

Replaces the Python list ring buffers duplicated across `td3.py:19-37`,
`ddpg.py:21-39`, `sac.py:22-40` and the dict-based `memory.Memory:5-53`.

TPU-native design notes:

- **Block writes.** Row scatters (``at[idx].set`` with 4k dynamic indices
  into a 10^6-row buffer) serialize on TPU and dominated the train step.
  The buffer is laid out as ``(n_blocks, block, record)`` and every add
  writes one full, aligned block via ``dynamic_update_slice`` — a single
  contiguous HBM store. Consequences, both documented and benign: the
  block size is fixed to the env batch size N (capacity is rounded up to
  a multiple of N); masked-out rows (the bogus terminal->reset transitions
  of auto-resetting envs) are replaced inside the block by duplicates of
  kept rows from the same batch rather than skipped. At episode-boundary
  rates (<2% of rows for 50+-step episodes) the uniform-sampling bias is
  negligible; an all-masked batch rewrites the head block with its own
  current contents and advances nothing (observably a no-op).

- **One packed record per transition.** The round-4 xprof trace of the
  converging config showed the learner's five per-field sample gathers
  (obs, action, reward, next_obs, done) costing ~220 us/update — and the
  cost is per-ROW, not per-byte (a 16 KB f32[4096] reward gather cost as
  much as the 3 MB obs gather), i.e. pure gather/DMA row overhead
  replicated five times. All fields therefore live in ONE
  ``(n_blocks, block, record_width)`` ring in the obs storage dtype, with
  the non-obs 32-bit fields BITCAST (not converted — bit-exact) into
  storage-dtype lanes, so sampling is a single row gather. This removed
  ~2/3 of the replay-sampling time (results/r4/README.md).

- **Storage dtype.** ``obs_dtype=bfloat16`` halves the ring's HBM
  footprint AND removes a measured pathology: with f32 storage, XLA
  hoists the learner matmuls' bf16 input conversion ABOVE the sample
  gather, converting the entire multi-GB ring every scan step (~39% of
  step time at 4,096 envs — the `convert.162/165` ops in the round-3
  xprof trace). bf16 rows gather straight into native-rate MXU matmuls;
  observations are 3-decimal-rounded scans and poses in [-3, 3], so
  bf16's ~0.4% relative error is below the env's own rounding. Validated
  to converge (results/r3, td3_bf16replay run). Actions/rewards/dones are
  bit-exact f32 regardless of storage dtype (bitcast, never converted).
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
    data: jax.Array       # (n_blocks, block, record) in storage dtype
    head: jax.Array       # () int32 next block index
    size: jax.Array       # () int32 valid rows


class ReplayBuffer:
    """Fixed-capacity uniform replay; block size = env batch size."""

    def __init__(self, capacity: int, obs_dim: int, act_dim: int | None,
                 block: int = 1, obs_dtype=jnp.float32):
        self.block = block
        self.n_blocks = max(1, -(-capacity // block))
        self.capacity = self.n_blocks * block
        self.obs_dim = obs_dim
        self.act_dim = act_dim  # None => discrete int32 actions
        self.obs_dtype = jnp.dtype(obs_dtype)
        # record layout: [obs | next_obs | action | reward | done], the
        # 32-bit fields bitcast into `ratio` storage-dtype lanes each
        self._ratio = 4 // self.obs_dtype.itemsize
        self._a_raw = 1 if act_dim is None else act_dim
        self._a_cols = self._a_raw * self._ratio
        self._off_a = 2 * obs_dim
        self._off_r = self._off_a + self._a_cols
        self._off_d = self._off_r + self._ratio
        self.record = self._off_d + self._ratio

    # -- bit-exact 32-bit <-> storage-dtype lane packing --

    def _store32(self, x):
        """(..., k) 32-bit -> (..., k*ratio) storage dtype, bitcast."""
        y = jax.lax.bitcast_convert_type(x, self.obs_dtype)
        if self._ratio > 1:                    # (..., k, ratio)
            y = y.reshape(*y.shape[:-2], -1)
        return y

    def _load32(self, x, dtype):
        """(..., k*ratio) storage -> (..., k) 32-bit, inverse of _store32."""
        if self._ratio > 1:
            x = x.reshape(*x.shape[:-1], -1, self._ratio)
        return jax.lax.bitcast_convert_type(x, dtype)

    def _pack(self, tr: Transition):
        """One (block, record) row batch from a Transition of f32/int32."""
        st = self.obs_dtype
        action = tr.action.astype(jnp.float32) if self.act_dim is not None \
            else tr.action.astype(jnp.int32)[:, None]
        return jnp.concatenate([
            tr.obs.astype(st),
            tr.next_obs.astype(st),
            self._store32(action),
            self._store32(tr.reward.astype(jnp.float32)[:, None]),
            self._store32(tr.done.astype(jnp.float32)[:, None]),
        ], axis=-1)

    def _unpack(self, rows) -> Transition:
        """Inverse of ``_pack``; obs/next_obs stay in storage dtype."""
        D = self.obs_dim
        action = self._load32(rows[..., self._off_a:self._off_r],
                              jnp.int32 if self.act_dim is None
                              else jnp.float32)
        if self.act_dim is None:
            action = action[..., 0]
        return Transition(
            obs=rows[..., :D],
            action=action,
            reward=self._load32(rows[..., self._off_r:self._off_d],
                                jnp.float32)[..., 0],
            next_obs=rows[..., D:2 * D],
            done=self._load32(rows[..., self._off_d:self.record],
                              jnp.float32)[..., 0],
        )

    def init(self) -> ReplayState:
        return ReplayState(
            data=jnp.zeros((self.n_blocks, self.block, self.record),
                           self.obs_dtype),
            head=jnp.zeros((), jnp.int32),
            size=jnp.zeros((), jnp.int32),
        )

    def add_batch(self, state: ReplayState, tr: Transition,
                  mask: jax.Array | None = None) -> ReplayState:
        """Insert one block of N transitions at the ring head."""
        n = tr.reward.shape[0]
        assert n == self.block, (
            f"add_batch block size {n} != buffer block {self.block}")
        if mask is not None:
            n_kept = jnp.sum(mask.astype(jnp.int32))
            # stable partition: kept rows first, then fill the tail with
            # duplicates of kept rows (see module docstring)
            order = jnp.argsort(jnp.where(mask, 0, 1), stable=True)
            pos = jnp.arange(n, dtype=jnp.int32)
            src = jnp.where(pos < n_kept, pos,
                            pos % jnp.maximum(n_kept, 1))
            perm = order[src]
            tr = jax.tree.map(lambda x: x[perm], tr)
            write = n_kept > 0
        else:
            write = jnp.ones((), bool)

        # unconditional write: wrapping the ring store in `lax.cond` cost
        # ~0.7 ms/step on chip (conditional.18 in the r4 xprof trace —
        # conditionals break XLA's pipelining around the 1.6 GB ring); a
        # skipped batch (write=False, astronomically rare: EVERY env
        # terminal in the same step) instead rewrites the head block with
        # its own current contents — a ~26 MB read, bit-identical result —
        # and leaves head/size untouched.
        rows = self._pack(tr)[None]            # (1, block, record)
        cur = jax.lax.dynamic_slice_in_dim(state.data, state.head, 1,
                                           axis=0)
        rows = jnp.where(write, rows, cur)
        return state.replace(
            data=jax.lax.dynamic_update_slice_in_dim(
                state.data, rows, state.head, axis=0),
            head=jnp.where(write, (state.head + 1) % self.n_blocks,
                           state.head),
            size=jnp.where(write,
                           jnp.minimum(state.size + n, self.capacity),
                           state.size),
        )

    def sample(self, state: ReplayState, key: jax.Array,
               batch_size: int) -> Transition:
        """Uniform with-replacement sample (`td3.py:31-34` samples without
        replacement from a Python list; at production buffer sizes the
        distinction is immaterial and with-replacement keeps the kernel a
        single gather).

        Shard-aware: the block width is read off the array shape, so inside
        ``shard_map`` (ring sharded ``P(None, "env")`` over the block axis)
        each device samples from its OWN envs' columns only — no cross-
        device replay gather, the whole point of the DP-sharded learner.
        Writes are block-aligned (``size`` is always a whole number of
        blocks), so the filled-row count scales exactly per shard, and
        every shard's columns fill at the same rate — the local sample
        stays uniform over the device's partition of the global ring."""
        block = state.data.shape[1]
        filled = state.size // self.block      # whole blocks written
        local_rows = filled * block
        idx = jax.random.randint(key, (batch_size,), 0,
                                 jnp.maximum(local_rows, 1))
        bi = idx // block
        ri = idx % block
        return self._unpack(state.data[bi, ri])

    def read_block(self, state: ReplayState, block_index) -> Transition:
        """Unpacked view of one stored block (tests/debugging)."""
        return self._unpack(state.data[block_index])

    def pspecs(self, axis: str = "env") -> ReplayState:
        """PartitionSpec pytree for shard_map: the ring shards the block
        (=env) axis, ring-position scalars replicate."""
        from jax.sharding import PartitionSpec as P
        return ReplayState(data=P(None, axis), head=P(), size=P())
