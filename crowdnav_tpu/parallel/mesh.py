"""Device-mesh sharding for the actor-learner (pjit/GSPMD path).

The reference has no parallelism at all (SURVEY.md §2.7: one env, one
learner, ROS pub/sub between 3-5 local processes). Here the environment
batch axis is the scaling axis: env states, observations, per-env stats and
the replay ring are sharded over a 1-D ``env`` mesh; agent parameters and
optimizer state are replicated. We annotate shardings on the trainer-state
pytree and let GSPMD partition the jitted rollout — the learner's gradient
all-reduce and any replay gather/scatter become XLA collectives over ICI
(the scaling-book recipe: pick a mesh, annotate, let the compiler place
collectives).

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
        if tcfg.n_envs % mesh.shape["env"] != 0:
            raise ValueError(
                f"n_envs={tcfg.n_envs} must divide the env mesh axis "
                f"({mesh.shape['env']})")
        self.mesh = mesh

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
