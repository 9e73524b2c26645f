"""Device-mesh sharding for the actor-learner (pjit/GSPMD path).

The reference has no parallelism at all (SURVEY.md §2.7: one env, one
learner, ROS pub/sub between 3-5 local processes). Here the environment
batch axis is the scaling axis: env states, observations, per-env stats and
the replay ring are sharded over a 1-D ``env`` mesh; agent parameters and
optimizer state are replicated. Rollouts are GSPMD-partitioned from the
placed inputs (the scaling-book recipe: pick a mesh, annotate, let the
compiler place collectives).

The LEARNER is DP-sharded explicitly via ``shard_map`` (SURVEY.md §2.7
"gradients/params synced with psum" — the NCCL-allreduce layer): each
device samples its local batch_size/n_dev rows from ITS OWN columns of the
block-sharded replay ring (no cross-device replay gather), computes
gradients on that shard, and ``pmean``s them over ICI before the optimizer
applies the identical global-batch step everywhere. Per-chip learner work
is therefore constant in device count at fixed GLOBAL batch — the
converging configuration's 8:1 sample-reuse ratio survives weak scaling,
at ~700 KB of gradient all-reduce per update (TD3 256-wide, f32).

Multi-host: the same program runs under `jax.distributed` with the env axis
spanning all hosts' devices; nothing here is host-count-specific.
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from crowdnav_tpu.parallel.runtime import Trainer, TrainerConfig, TrainerState


def make_mesh(n_devices: int | None = None, axis: str = "env") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def _trainer_shardings(trainer_state: TrainerState, mesh: Mesh,
                       n_envs: int):
    """Sharding pytree, assigned by *field role* (not by whichever leading
    dim happens to divide the mesh): env states / observations / per-env
    stat rows shard over ``env`` exactly when their leading axis is the env
    batch; the replay ring shards over its block axis (block == env batch);
    agent params, scalars and the reset bank replicate (the bank is small
    and every shard gathers random rows from it)."""
    sharded = NamedSharding(mesh, P("env"))
    replicated = NamedSharding(mesh, P())

    def per_env(leaf):
        if hasattr(leaf, "ndim") and leaf.ndim >= 1 \
                and leaf.shape[0] == n_envs:
            return sharded
        return replicated

    def replay_spec(leaf):
        # ReplayState arrays are (n_blocks, block=n_envs, ...): shard the
        # block axis so each device holds its own envs' transition columns
        if hasattr(leaf, "ndim") and leaf.ndim >= 2 \
                and leaf.shape[1] == n_envs:
            return NamedSharding(mesh, P(None, "env"))
        return replicated

    return TrainerState(
        env_states=jax.tree.map(per_env, trainer_state.env_states),
        obs=per_env(trainer_state.obs),
        agent_state=jax.tree.map(lambda _: replicated,
                                 trainer_state.agent_state),
        replay=jax.tree.map(replay_spec, trainer_state.replay),
        stats=jax.tree.map(per_env, trainer_state.stats),
        key=replicated,
        reset_bank=None if trainer_state.reset_bank is None
        else jax.tree.map(lambda _: replicated, trainer_state.reset_bank),
        learn_metrics=None if trainer_state.learn_metrics is None
        else jax.tree.map(lambda _: replicated, trainer_state.learn_metrics),
    )


class ShardedTrainer(Trainer):
    """Trainer whose jitted rollout runs sharded over a device mesh."""

    def __init__(self, env, agent, tcfg: TrainerConfig, mesh: Mesh,
                 discrete: bool = False):
        super().__init__(env, agent, tcfg, discrete=discrete)
        ndev = mesh.shape["env"]
        if tcfg.n_envs % ndev != 0:
            raise ValueError(
                f"n_envs={tcfg.n_envs} must divide the env mesh axis "
                f"({ndev})")
        if tcfg.learning and agent.cfg.batch_size % ndev != 0:
            raise ValueError(
                f"batch_size={agent.cfg.batch_size} must divide the env "
                f"mesh axis ({ndev}) for the DP-sharded learner")
        self.mesh = mesh

    def _learn(self, agent_state, replay, key):
        """DP-sharded learner (module docstring): shard_map over the env
        axis; per-device local sampling, per-device gradients, pmean inside
        ``agent.update`` — the agent state stays replicated because every
        device applies the identical averaged update."""
        ndev = self.mesh.shape["env"]
        local_bsz = self.agent.cfg.batch_size // ndev

        def upd(agent_state, replay_shard, key):
            dev = jax.lax.axis_index("env")

            def one(a_state, k):
                # per-device RNG stream: distinct sample rows and smoothing
                # noise per shard (the global batch is the union)
                ks, ku = jax.random.split(jax.random.fold_in(k, dev))
                batch = self.buffer.sample(replay_shard, ks, local_bsz)
                return self.agent.update(a_state, batch, ku,
                                         axis_name="env")

            keys = jax.random.split(key, self.tcfg.updates_per_step)
            agent_state, ms = jax.lax.scan(one, agent_state, keys)
            return agent_state, jax.tree.map(lambda x: x[-1], ms)

        f = jax.shard_map(upd, mesh=self.mesh,
                          in_specs=(P(), self.buffer.pspecs("env"), P()),
                          out_specs=(P(), P()))
        return f(agent_state, replay, key)

    def init(self, key: jax.Array) -> TrainerState:
        state = super().init(key)
        shardings = _trainer_shardings(state, self.mesh, self.tcfg.n_envs)
        if jax.process_count() > 1:
            # multi-controller: every process built the same host-local
            # state (same seed); materialize only the addressable shards
            from crowdnav_tpu.parallel.distributed import distribute
            return distribute(state, shardings)
        return jax.device_put(state, shardings)

    def make_jitted(self):
        # shardings propagate from the placed inputs; donate the big state
        return jax.jit(self.rollout_chunk, donate_argnums=(0,))
